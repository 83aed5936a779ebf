"""Criteo-Kaggle TSV reader (used when the real dataset is on disk).

Format (example/dcn/README.md + train.py:40-44): label, 13 integer columns
I1..I13, 26 categorical hex-string columns C1..C26, tab-separated. Strings
are hashed to 64-bit ids (the reference uses tf.strings.to_hash_bucket_fast,
train.py:219-220 — here FNV-1a into the full 64-bit space, then per-column
tag bits keep tables disjoint)."""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

NUM_NUMERIC = 13
NUM_CATEGORICAL = 26


def _fnv1a64(s: bytes) -> np.uint64:
    h = np.uint64(0xCBF29CE484222325)
    for b in s:
        h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
    return h


def available(path: Optional[str] = None) -> Optional[str]:
    for cand in ([path] if path else []) + [
            os.environ.get("CRITEO_PATH", ""),
            "/data/criteo/train.txt", "/root/data/criteo/train.txt"]:
        if cand and os.path.exists(cand):
            return cand
    return None


def batches(path: str, batch_size: int,
            max_batches: Optional[int] = None, *,
            threads: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Stream batches.

    ``threads > 1`` uses the native multithreaded prefetching loader
    (io.native.CriteoLoader — reader thread + parser pool + bounded queue,
    ~1.1 M rows/s at 8 threads on this host; row order not preserved).
    ``threads in (0, 1)`` keeps deterministic order via the one-shot native
    parser (~0.35 M rows/s), falling back to pure Python without the .so."""
    from ..io import native as _native
    if threads > 1 and _native.available():
        n_out = 0
        with _native.CriteoLoader(path, batch_size, threads=threads) as ld:
            for numeric, cats, labels in ld:
                if len(labels) < batch_size:
                    break  # fixed shapes for jit; drop the short tail
                yield {"numeric": numeric, "categorical": cats,
                       "label": labels}
                n_out += 1
                if max_batches and n_out >= max_batches:
                    return
        return
    if _native.available():
        yield from _batches_native(path, batch_size, max_batches)
        return
    n_out = 0
    numeric = np.zeros((batch_size, NUM_NUMERIC), np.float32)
    cats = np.zeros((batch_size, NUM_CATEGORICAL), np.int64)
    labels = np.zeros((batch_size,), np.float32)
    i = 0
    tag = (np.arange(NUM_CATEGORICAL, dtype=np.uint64) << np.uint64(40))
    with open(path, "rb") as f:
        for line in f:
            parts = line.rstrip(b"\n").split(b"\t")
            if len(parts) != 1 + NUM_NUMERIC + NUM_CATEGORICAL:
                continue
            labels[i] = float(parts[0] or b"0")
            for j in range(NUM_NUMERIC):
                v = parts[1 + j]
                numeric[i, j] = np.log1p(max(float(v), 0.0)) if v else 0.0
            for j in range(NUM_CATEGORICAL):
                v = parts[1 + NUM_NUMERIC + j]
                h = _fnv1a64(v) if v else np.uint64(0)
                cats[i, j] = np.int64((h & np.uint64((1 << 40) - 1)) | tag[j])
            i += 1
            if i == batch_size:
                yield {"numeric": numeric.copy(), "categorical": cats.copy(),
                       "label": labels.copy()}
                i = 0
                n_out += 1
                if max_batches and n_out >= max_batches:
                    return


def _batches_native(path: str, batch_size: int,
                    max_batches: Optional[int],
                    chunk_bytes: Optional[int] = None
                    ) -> Iterator[Dict[str, np.ndarray]]:
    from ..io import native as _native
    n_out = 0
    buf = b""
    chunk_bytes = chunk_bytes or max(batch_size * 512, 1 << 20)
    with open(path, "rb") as f:
        eof = False
        while True:
            if not eof and len(buf) < chunk_bytes:
                data = f.read(chunk_bytes)
                if data:
                    buf += data
                else:
                    eof = True
            numeric, cats, labels, consumed = _native.parse_criteo_batch(
                buf, batch_size)
            if len(labels) == batch_size:
                buf = buf[consumed:]
                yield {"numeric": numeric, "categorical": cats,
                       "label": labels}
                n_out += 1
                if max_batches and n_out >= max_batches:
                    return
            elif eof:
                return  # incomplete trailing batch dropped (matches py path)
            else:
                # short parse with input left: a chunk_bytes-sized buffer held
                # fewer than batch_size complete lines (long lines). Keep
                # reading PAST chunk_bytes or the loop would spin forever
                # re-parsing the same buffer without consuming anything.
                data = f.read(chunk_bytes)
                if data:
                    buf += data
                else:
                    eof = True


# ---------------------------------------------------------------------------
# Pre-tokenized binary cache
#
# The reference feeds training from a tf.data TSV pipeline re-parsed every
# epoch (/root/reference/example/dcn/train.py:447-470). TSV parsing is the
# input-pipeline ceiling on this class of host (~0.35 M rows/s/thread, ~1.1 M
# rows/s with a parser pool — PERF.md "Native data loader"), which is BELOW
# the corrected DCN step rate (1.56-1.88 M ex/s/chip). The fix is the
# standard production one (tfrecord-style): parse + hash ONCE into a packed
# binary cache; steady-state epochs then read memmapped slices at memcpy
# speed with zero parse/hash work, so the loader can never starve the chip.
#
# Layout: a directory holding numeric.npy f32[N,13], categorical.npy
# int64[N,26] (post-hash ids incl. per-column tag bits — identical to what
# the TSV parsers emit), label.npy f32[N], and meta.json {"rows": N}.
# ---------------------------------------------------------------------------

_CACHE_META = "meta.json"
_CACHE_VERSION = 1


def _count_lines(path: str, chunk: int = 1 << 23) -> int:
    """Upper bound on row count (malformed lines are skipped at parse time
    and the true count lands in meta.json)."""
    n = 0
    last = b"\n"
    with open(path, "rb") as f:
        while True:
            data = f.read(chunk)
            if not data:
                break
            n += data.count(b"\n")
            last = data[-1:]
    if last != b"\n":
        n += 1  # final line without trailing newline
    return n


def _stream_parse_blocks(path: str, block_rows: int):
    """Yield (numeric, cats, labels) blocks INCLUDING the short tail block
    (unlike the training iterators, a cache build must not drop rows)."""
    from ..io import native as _native
    if not _native.available():
        # pure-python fallback: batch the row-level python parser
        for b in batches(path, 1, max_batches=None):
            yield b["numeric"], b["categorical"], b["label"]
        return
    buf = b""
    chunk_bytes = max(block_rows * 512, 1 << 22)
    with open(path, "rb") as f:
        eof = False
        while True:
            if not eof and len(buf) < chunk_bytes:
                data = f.read(chunk_bytes)
                if data:
                    buf += data
                else:
                    eof = True
                    if buf and not buf.endswith(b"\n"):
                        buf += b"\n"   # let the parser take the last line
            numeric, cats, labels, consumed = _native.parse_criteo_batch(
                buf, block_rows)
            if len(labels):
                buf = buf[consumed:]
                yield numeric, cats, labels
            elif eof:
                return
            else:
                data = f.read(chunk_bytes)
                if data:
                    buf += data
                else:
                    eof = True
                    if buf and not buf.endswith(b"\n"):
                        buf += b"\n"


def build_binary_cache(tsv_path: str, cache_dir: str, *,
                       block_rows: int = 1 << 16) -> str:
    """One-time TSV → binary cache conversion (parse + hash once).

    Returns ``cache_dir``. Idempotent: an existing cache built from the
    same source size is reused. Deterministic row order (single-threaded
    parse — conversion is off the training path)."""
    import json
    meta_path = os.path.join(cache_dir, _CACHE_META)
    src_bytes = os.path.getsize(tsv_path)
    if os.path.exists(meta_path):
        try:
            meta = json.load(open(meta_path))
            if (meta.get("version") == _CACHE_VERSION
                    and meta.get("source_bytes") == src_bytes):
                return cache_dir
        except Exception:
            pass
    os.makedirs(cache_dir, exist_ok=True)
    n_max = _count_lines(tsv_path)
    num_mm = np.lib.format.open_memmap(
        os.path.join(cache_dir, "numeric.npy"), mode="w+",
        dtype=np.float32, shape=(n_max, NUM_NUMERIC))
    cat_mm = np.lib.format.open_memmap(
        os.path.join(cache_dir, "categorical.npy"), mode="w+",
        dtype=np.int64, shape=(n_max, NUM_CATEGORICAL))
    lab_mm = np.lib.format.open_memmap(
        os.path.join(cache_dir, "label.npy"), mode="w+",
        dtype=np.float32, shape=(n_max,))
    i = 0
    for numeric, cats, labels in _stream_parse_blocks(tsv_path, block_rows):
        n = len(labels)
        num_mm[i:i + n] = numeric
        cat_mm[i:i + n] = cats
        lab_mm[i:i + n] = labels
        i += n
    for mm in (num_mm, cat_mm, lab_mm):
        mm.flush()
    with open(meta_path, "w") as f:
        json.dump({"version": _CACHE_VERSION, "rows": i,
                   "source": os.path.abspath(tsv_path),
                   "source_bytes": src_bytes}, f)
    return cache_dir


class BinaryCriteoCache:
    """Reader over a :func:`build_binary_cache` directory.

    ``batches`` yields zero-copy memmap slice VIEWS (callers must copy if
    they mutate); rows/s is memcpy-bound — measured >>10 M rows/s on this
    host vs ~1.1 M for live TSV parsing, so the input pipeline stays ahead
    of any measured train-step rate (VERDICT round-4 item 1)."""

    def __init__(self, cache_dir: str):
        import json
        meta = json.load(open(os.path.join(cache_dir, _CACHE_META)))
        if meta.get("version") != _CACHE_VERSION:
            raise ValueError(f"unsupported cache version: {meta}")
        self.rows = int(meta["rows"])
        self.numeric = np.load(os.path.join(cache_dir, "numeric.npy"),
                               mmap_mode="r")
        self.categorical = np.load(
            os.path.join(cache_dir, "categorical.npy"), mmap_mode="r")
        self.label = np.load(os.path.join(cache_dir, "label.npy"),
                             mmap_mode="r")

    def batches(self, batch_size: int,
                max_batches: Optional[int] = None, *,
                loop: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        """Sequential fixed-size batches (short tail dropped, as the
        training iterators do). ``loop=True`` restarts at the beginning
        forever (epoch wraparound) — pair with ``max_batches``."""
        n_out = 0
        while True:
            for i in range(0, self.rows - batch_size + 1, batch_size):
                yield {"numeric": self.numeric[i:i + batch_size],
                       "categorical": self.categorical[i:i + batch_size],
                       "label": self.label[i:i + batch_size]}
                n_out += 1
                if max_batches and n_out >= max_batches:
                    return
            if not loop:
                return
