"""ctypes bindings for the native helper library (native/tfplus_native.cc).

Auto-builds with the in-repo Makefile on first use when a compiler is
available (mirrors the reference's `_load_library` dlopen pattern,
common/__init__.py:29-63 — including the TFPLUS_DATAPATH-style override via
``TFPLUS_TPU_NATIVE_PATH``); every entry point has a pure-Python fallback so
the framework works without the .so.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import zlib
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = os.environ.get("TFPLUS_TPU_NATIVE_PATH")
        if not path:
            path = os.path.abspath(os.path.join(_NATIVE_DIR, "libtfplus_native.so"))
            src = os.path.abspath(os.path.join(_NATIVE_DIR, "tfplus_native.cc"))
            stale = (not os.path.exists(path)
                     or (os.path.exists(src)
                         and os.path.getmtime(src) > os.path.getmtime(path)))
            if stale:  # (re)build BEFORE first dlopen — dlopen caches handles
                try:
                    subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                                   check=True, capture_output=True, timeout=120)
                except Exception:
                    if not os.path.exists(path):
                        return None
        if not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.tfp_fnv1a64.restype = ctypes.c_uint64
        lib.tfp_fnv1a64.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tfp_farmhash64.restype = ctypes.c_uint64
        lib.tfp_farmhash64.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tfp_farmhash64_batch.restype = None
        lib.tfp_farmhash64_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64)]
        lib.tfp_crc32.restype = ctypes.c_uint32
        lib.tfp_crc32.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_uint32]
        lib.tfp_parse_criteo.restype = ctypes.c_int64
        lib.tfp_parse_criteo.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
        lib.tfp_fnv1a64_batch.restype = None
        lib.tfp_fnv1a64_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64)]
        lib.tfp_loader_open.restype = ctypes.c_void_p
        lib.tfp_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.c_int64]
        lib.tfp_loader_next.restype = ctypes.c_int64
        lib.tfp_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float)]
        lib.tfp_loader_close.restype = None
        lib.tfp_loader_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# FarmHash Fingerprint64 — pure-Python twin of the native implementation
# (reference string-key routing: utility.h:96-112 ModKeyImpl via
# farmhash::Fingerprint64; golden-tested against tf.fingerprint).
# ---------------------------------------------------------------------------

_M = 0xFFFFFFFFFFFFFFFF
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F


def _rot(v, s):
    return v if s == 0 else ((v >> s) | (v << (64 - s))) & _M


def _smix(v):
    return v ^ (v >> 47)


def _h16(u, v, mul):
    a = ((u ^ v) * mul) & _M
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M
    b ^= b >> 47
    return (b * mul) & _M


def _f64(s, i):
    return int.from_bytes(s[i:i + 8], "little")


def _f32(s, i):
    return int.from_bytes(s[i:i + 4], "little")


def _weak32(s, i, a, b):
    w, x, y, z = _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24)
    a = (a + w) & _M
    b = _rot((b + a + z) & _M, 21)
    c = a
    a = (a + x + y) & _M
    b = (b + _rot(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def _farmhash64_py(s: bytes) -> int:
    n = len(s)
    if n <= 16:
        if n >= 8:
            mul = (_K2 + n * 2) & _M
            a = (_f64(s, 0) + _K2) & _M
            b = _f64(s, n - 8)
            c = (_rot(b, 37) * mul + a) & _M
            d = ((_rot(a, 25) + b) * mul) & _M
            return _h16(c, d, mul)
        if n >= 4:
            mul = (_K2 + n * 2) & _M
            a = _f32(s, 0)
            return _h16((n + (a << 3)) & _M, _f32(s, n - 4), mul)
        if n > 0:
            a, b, c = s[0], s[n >> 1], s[n - 1]
            y = (a + (b << 8)) & _M
            z = (n + (c << 2)) & _M
            return (_smix((y * _K2 ^ z * _K0) & _M) * _K2) & _M
        return _K2
    if n <= 32:
        mul = (_K2 + n * 2) & _M
        a = (_f64(s, 0) * _K1) & _M
        b = _f64(s, 8)
        c = (_f64(s, n - 8) * mul) & _M
        d = (_f64(s, n - 16) * _K2) & _M
        return _h16((_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M,
                    (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)
    if n <= 64:
        mul = (_K2 + n * 2) & _M
        a = (_f64(s, 0) * _K2) & _M
        b = _f64(s, 8)
        c = (_f64(s, n - 8) * mul) & _M
        d = (_f64(s, n - 16) * _K2) & _M
        y = (_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M
        z = _h16(y, (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)
        e = (_f64(s, 16) * mul) & _M
        f = _f64(s, 24)
        g = ((y + _f64(s, n - 32)) * mul) & _M
        h = ((z + _f64(s, n - 24)) * mul) & _M
        return _h16((_rot((e + f) & _M, 43) + _rot(g, 30) + h) & _M,
                    (e + _rot((f + a) & _M, 18) + g) & _M, mul)
    seed = 81
    x = seed
    y = (seed * _K1 + 113) & _M
    z = (_smix((y * _K2 + 113) & _M) * _K2) & _M
    v1 = v2 = w1 = w2 = 0
    x = (x * _K2 + _f64(s, 0)) & _M
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v1 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
        y = (_rot((y + v2 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
        x ^= w2
        y = (y + v1 + _f64(s, i + 40)) & _M
        z = (_rot((z + w1) & _M, 33) * _K1) & _M
        v1, v2 = _weak32(s, i, (v2 * _K1) & _M, (x + w1) & _M)
        w1, w2 = _weak32(s, i + 32, (z + w2) & _M,
                         (y + _f64(s, i + 16)) & _M)
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (_K1 + ((z & 0xFF) << 1)) & _M
    i = last64
    w1 = (w1 + ((n - 1) & 63)) & _M
    v1 = (v1 + w1) & _M
    w1 = (w1 + v1) & _M
    x = (_rot((x + y + v1 + _f64(s, i + 8)) & _M, 37) * mul) & _M
    y = (_rot((y + v2 + _f64(s, i + 48)) & _M, 42) * mul) & _M
    x ^= (w2 * 9) & _M
    y = (y + v1 * 9 + _f64(s, i + 40)) & _M
    z = (_rot((z + w1) & _M, 33) * mul) & _M
    v1, v2 = _weak32(s, i, (v2 * mul) & _M, (x + w1) & _M)
    w1, w2 = _weak32(s, i + 32, (z + w2) & _M, (y + _f64(s, i + 16)) & _M)
    z, x = x, z
    return _h16((_h16(v1, w1, mul) + _smix(y) * _K0 + z) & _M,
                (_h16(v2, w2, mul) + x) & _M, mul)


def fingerprint64(s: bytes, algo: str = "farmhash") -> int:
    """String feature key → uint64 id.

    ``algo="farmhash"`` (default) is the reference's routing function
    (utility.h:96-112 ModKeyImpl via farmhash::Fingerprint64) — string ids
    match reference-produced checkpoints bit-for-bit. ``algo="fnv"`` keeps
    the legacy FNV-1a ids of round-1 checkpoints and the Criteo loader's
    internal column tagging."""
    lib = _load()
    if algo == "fnv":
        if lib is not None:
            return int(lib.tfp_fnv1a64(s, len(s)))
        h = 0xCBF29CE484222325
        for b in s:
            h = ((h ^ b) * 0x100000001B3) & _M
        return h
    if lib is not None:
        return int(lib.tfp_farmhash64(s, len(s)))
    return _farmhash64_py(s)


def fingerprint64_batch(strings, algo: str = "farmhash") -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.array([fingerprint64(s if isinstance(s, bytes)
                                       else str(s).encode(), algo)
                         for s in strings], np.uint64)
    bufs = [s if isinstance(s, bytes) else str(s).encode() for s in strings]
    blob = b"".join(bufs)
    offsets = np.zeros(len(bufs) + 1, np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    out = np.zeros(len(bufs), np.uint64)
    fn = lib.tfp_farmhash64_batch if algo == "farmhash" \
        else lib.tfp_fnv1a64_batch
    fn(blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       len(bufs), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def crc32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is not None:
        return int(lib.tfp_crc32(data, len(data), seed))
    return zlib.crc32(data, seed) & 0xFFFFFFFF


def parse_criteo_batch(buf: bytes, max_rows: int):
    """Parse up to ``max_rows`` Criteo TSV lines from ``buf``.

    Returns ``(numeric f32[rows,13], cats int64[rows,26], labels f32[rows],
    consumed_bytes)`` — identical semantics to the Python parser in
    tfplus_tpu/data/criteo.py, ~50× faster.
    """
    lib = _load()
    if lib is None:
        return None  # caller falls back to the python parser
    numeric = np.zeros((max_rows, 13), np.float32)
    cats = np.zeros((max_rows, 26), np.int64)
    labels = np.zeros((max_rows,), np.float32)
    consumed = ctypes.c_int64(0)
    rows = lib.tfp_parse_criteo(
        buf, len(buf), max_rows,
        numeric.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(consumed))
    rows = int(rows)
    return numeric[:rows], cats[:rows], labels[:rows], int(consumed.value)


class CriteoLoader:
    """Multithreaded prefetching Criteo TSV loader (native runtime).

    A C++ reader thread streams the file in line-aligned ~4 MB chunks; a
    parser-thread pool converts them to row blocks behind a bounded queue
    (tfp_loader_* in native/tfplus_native.cc). Replaces the reference's
    tf.data C++ input pipeline (example/dcn/train.py TextLineDataset).

    Row order across chunks is NOT preserved for ``threads > 1`` — use
    ``threads=1`` for deterministic order. Iterate or call :meth:`next`;
    the final batch may be short; ``None`` marks end-of-stream.
    """

    def __init__(self, path: str, batch_size: int, *, threads: int = 4,
                 queue_cap: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable — use the "
                               "python reader in tfplus_tpu.data.criteo")
        self._lib = lib
        self._batch = int(batch_size)
        self._h = lib.tfp_loader_open(path.encode(), int(threads),
                                      int(queue_cap))
        if not self._h:
            raise FileNotFoundError(path)

    def next(self):
        numeric = np.zeros((self._batch, 13), np.float32)
        cats = np.zeros((self._batch, 26), np.int64)
        labels = np.zeros((self._batch,), np.float32)
        got = self._lib.tfp_loader_next(
            self._h, self._batch,
            numeric.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if got <= 0:
            return None
        return numeric[:got], cats[:got], labels[:got]

    def __iter__(self):
        while True:
            b = self.next()
            if b is None:
                return
            yield b

    def close(self):
        if getattr(self, "_h", None):
            self._lib.tfp_loader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
