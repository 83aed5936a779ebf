"""Synthetic dataset generators with learnable structure.

The reference's examples train on MovieLens-100k and Criteo-Kaggle; this
zero-egress environment can't download them, so these generators produce
statistically similar data with a planted ground-truth model, making
loss-decrease and AUC targets meaningful (a real Criteo TSV is supported via
tfplus_tpu.data.criteo when present on disk).
"""
from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def movielens_like(n_examples: int = 100_000, n_users: int = 943,
                   n_movies: int = 1682, latent: int = 8, seed: int = 0):
    """MovieLens-100k-shaped ratings: rating = <u, m> latent structure + noise,
    clipped to [1, 5] (100k ratings / 943 users / 1682 movies)."""
    rng = np.random.RandomState(seed)
    u_emb = rng.randn(n_users, latent) * 0.7
    m_emb = rng.randn(n_movies, latent) * 0.7
    users = rng.randint(0, n_users, n_examples).astype(np.int64)
    movies = rng.randint(0, n_movies, n_examples).astype(np.int64)
    raw = 3.0 + (u_emb[users] * m_emb[movies]).sum(1) + rng.randn(n_examples) * 0.3
    ratings = np.clip(raw, 1.0, 5.0).astype(np.float32)
    return {"user_id": users, "movie_id": movies, "rating": ratings}


class CriteoLike:
    """Criteo-Kaggle-shaped stream: 13 numeric + 26 categorical columns with
    zipf-distributed hashed ids and a planted logistic ground truth."""

    def __init__(self, seed: int = 0, num_numeric: int = 13,
                 num_categorical: int = 26,
                 vocab_sizes=None, zipf: float = 1.2):
        rng = np.random.RandomState(seed)
        self.num_numeric = num_numeric
        self.num_categorical = num_categorical
        self.vocab_sizes = (vocab_sizes if vocab_sizes is not None
                            else rng.choice([1000, 5000, 20000, 100000],
                                            num_categorical))
        self.zipf = zipf
        # planted truth: per-column per-id weight + numeric weights
        self._id_w = [rng.randn(v) * 1.2 for v in self.vocab_sizes]
        self._num_w = rng.randn(num_numeric) * 0.4
        self._rng = rng

    def batches(self, batch_size: int, num_batches: int
                ) -> Iterator[Dict[str, np.ndarray]]:
        rng = self._rng
        for _ in range(num_batches):
            numeric = rng.lognormal(0.0, 1.0,
                                    (batch_size, self.num_numeric)).astype(np.float32)
            numeric = np.log1p(numeric)   # standard criteo transform
            cats = np.zeros((batch_size, self.num_categorical), np.int64)
            logit = numeric @ self._num_w
            for c, v in enumerate(self.vocab_sizes):
                ids = rng.zipf(self.zipf, batch_size) % v
                cats[:, c] = ids
                logit = logit + self._id_w[c][ids]
            logit = (logit - logit.mean()) / (logit.std() + 1e-6) * 2.0
            p = 1.0 / (1.0 + np.exp(-logit))
            labels = (rng.rand(batch_size) < p).astype(np.float32)
            # globally-unique id space per column (column tag in high bits)
            cats = cats + (np.arange(self.num_categorical, dtype=np.int64)
                           << 40)[None, :]
            yield {"numeric": numeric, "categorical": cats, "label": labels}


def dlrm_batches(batch_size: int, num_batches: int, num_tables: int = 8,
                 num_numeric: int = 13, vocab: int = 50_000, seed: int = 0
                 ) -> Iterator[Dict[str, np.ndarray]]:
    gen = CriteoLike(seed=seed, num_numeric=num_numeric,
                     num_categorical=num_tables,
                     vocab_sizes=[vocab] * num_tables)
    yield from gen.batches(batch_size, num_batches)
