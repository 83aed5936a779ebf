"""Monotonic-run Pallas compactor (round-3 verdict #4) — interpret-mode
correctness vs the XLA permute-gather oracle. Hardware perf is measured by
scripts/prof_compactor.py; the decision record lives in PERF.md."""
import numpy as np
import jax.numpy as jnp
import pytest

from tfplus_tpu.ops import compactor


def _case(M, W, R, live_frac, seed):
    rng = np.random.RandomState(seed)
    arena = rng.randn(M, W).astype(np.float32)
    live = rng.rand(M) < live_frac
    packed, new_loc = compactor.compact(
        jnp.asarray(arena), jnp.asarray(live), block_rows=R, interpret=True)
    want, want_loc = compactor.compact_reference(
        jnp.asarray(arena), jnp.asarray(live))
    n = int(live.sum())
    np.testing.assert_array_equal(np.asarray(packed)[:n],
                                  np.asarray(want)[:n])
    np.testing.assert_array_equal(np.asarray(new_loc)[live],
                                  np.asarray(want_loc)[live])
    # order preserved: packed rows are the live arena rows in index order
    np.testing.assert_array_equal(np.asarray(packed)[:n], arena[live])


@pytest.mark.parametrize("live_frac", [0.0, 0.3, 2 / 3, 0.97, 1.0])
def test_matches_oracle(live_frac):
    _case(M=512, W=128, R=32, live_frac=live_frac, seed=1)


def test_clustered_dead_runs():
    """Worst-case clustering: long dead runs (whole blocks empty) and long
    live runs — exercises output blocks skipped / revisited many times."""
    M, W, R = 512, 128, 32
    rng = np.random.RandomState(2)
    arena = rng.randn(M, W).astype(np.float32)
    live = np.zeros(M, bool)
    live[:64] = True          # solid live run
    live[200:208] = True      # tiny island
    live[320:512] = True      # tail run
    packed, _ = compactor.compact(jnp.asarray(arena), jnp.asarray(live),
                                  block_rows=R, interpret=True)
    n = int(live.sum())
    np.testing.assert_array_equal(np.asarray(packed)[:n], arena[live])


def test_single_block_and_crossing():
    for pattern in ([1] * 16, [0] * 16, [1, 0] * 8):
        M, W, R = 64, 128, 16
        rng = np.random.RandomState(3)
        arena = rng.randn(M, W).astype(np.float32)
        live = np.array((pattern * 4)[:M], bool)
        packed, _ = compactor.compact(jnp.asarray(arena),
                                      jnp.asarray(live),
                                      block_rows=R, interpret=True)
        n = int(live.sum())
        np.testing.assert_array_equal(np.asarray(packed)[:n], arena[live])
