"""Packed single-buffer batch feed.

The reference feeds batches through tf.data's prefetching iterator
(example/dcn/train.py:447-470), where the host→device hop is one DMA per
tensor on a locally attached accelerator. On TPU-over-fabric rigs
(disaggregated serving, this repo's tunnel) every `device_put` array is
its own transfer RPC, so a DCN batch — 6 id tables + numeric features +
labels — pays ~8 round trips per step and the feed, not the chip, caps
end-to-end throughput.

`make_packed_feed` collapses the whole batch pytree into ONE int32 host
buffer (one transfer) and returns a jittable unpack that slices/bitcasts
the original arrays back device-side — zero-copy on the host (views), and
XLA fuses the unpacking slices into the step's consumers. Shapes are
static per (batch-size) compile class, preserving jit cache behavior.

Works for any pytree of 4-byte-itemsize arrays (f32 features/labels,
int32 encoded id pairs, uint32 meta). Measured on the tunnel rig:
one upload RPC instead of 8 per DCN batch (bench.py
`dcn_end_to_end_packed_examples_per_s`).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_packed_feed(example_batch: Any) -> Tuple[
        Callable[[Any], np.ndarray], Callable[[jnp.ndarray], Any]]:
    """Build ``(pack, unpack)`` for batches shaped like ``example_batch``.

    ``pack(batch) -> np.int32[total_words]`` runs on the host (one
    concatenate of 4-byte views). ``unpack(flat) -> batch`` is traceable;
    call it INSIDE the jitted step so the slices fuse with their
    consumers. Every leaf must keep the example's shape/dtype, and every
    dtype must have itemsize 4 (f32 / i32 / u32 — the id-pair encoding
    and feed dtypes used throughout this framework).
    """
    leaves, treedef = jax.tree_util.tree_flatten(example_batch)
    specs = []
    off = 0
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype.itemsize != 4:
            raise ValueError(
                f"packed feed requires 4-byte dtypes, got {a.dtype} "
                f"(encode ids to int32 pairs first)")
        n = int(a.size)
        specs.append((a.shape, a.dtype, off, n))
        off += n
    total = off

    def pack(batch: Any) -> np.ndarray:
        ls, td = jax.tree_util.tree_flatten(batch)
        if td != treedef:
            raise ValueError("batch structure differs from the example")
        parts = []
        for leaf, (shape, dtype, _, _) in zip(ls, specs):
            a = np.asarray(leaf)
            if a.shape != shape or a.dtype != dtype:
                raise ValueError(
                    f"leaf {a.shape}/{a.dtype} != example {shape}/{dtype}")
            parts.append(np.ascontiguousarray(a).view(np.int32).ravel())
        return np.concatenate(parts) if len(parts) > 1 else parts[0]

    def unpack(flat: jnp.ndarray) -> Any:
        if flat.shape != (total,):
            raise ValueError(f"packed buffer must be [{total}], "
                             f"got {flat.shape}")
        out = []
        for shape, dtype, o, n in specs:
            seg = flat[o:o + n]
            if dtype != np.int32:
                seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dtype))
            out.append(seg.reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack
