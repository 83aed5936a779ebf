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
            if not os.path.exists(path):
                try:
                    subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                                   check=True, capture_output=True, timeout=120)
                except Exception:
                    return None
        if not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.tfp_fnv1a64.restype = ctypes.c_uint64
        lib.tfp_fnv1a64.argtypes = [ctypes.c_char_p, ctypes.c_int64]
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


def fingerprint64(s: bytes) -> int:
    """String feature key → uint64 id (reference: utility.h ModKeyImpl)."""
    lib = _load()
    if lib is not None:
        return int(lib.tfp_fnv1a64(s, len(s)))
    h = 0xCBF29CE484222325
    for b in s:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fingerprint64_batch(strings) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.array([fingerprint64(s if isinstance(s, bytes)
                                       else str(s).encode())
                         for s in strings], np.uint64)
    bufs = [s if isinstance(s, bytes) else str(s).encode() for s in strings]
    blob = b"".join(bufs)
    offsets = np.zeros(len(bufs) + 1, np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    out = np.zeros(len(bufs), np.uint64)
    lib.tfp_fnv1a64_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
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
