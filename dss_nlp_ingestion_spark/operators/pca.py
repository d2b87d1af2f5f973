"""Distributed PCA front end: fixed-point scatter matrix + driver-side
power iteration.

The distributed (and expensive) half — accumulating G = sum(v v^T)
over the corpus — lives in plans/series_queries.py:
embedding_scatter_matrix as an oracle-checked query; this module
eigensolves the COLLECTED matrix, which is model-parameter-sized
(d^2 entries, d = embedding dim) no matter how many vectors the
corpus holds — the same "collect only model parameters" boundary the
IVF centroids and Bloom bitmaps observe (no data-sized collect).

Reference parity note: the reference pipeline ships raw API
embeddings (src/utils/tencent_api.py) with no decorrelation step;
PCA/whitening is part of the extra LLM-data surface (feeds PQ/OPQ
and semantic dedup preprocessing)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def scatter_to_matrix(scatter: DataFrame, dim: int) -> np.ndarray:
    """Collect an upper-triangle (i, j, g_fixed) scatter DataFrame
    (2^-20 fixed point, as produced by embedding_scatter_matrix) into
    the full symmetric float64 d x d matrix.  d^2 rows — model
    parameters, not data."""
    g = np.zeros((dim, dim), dtype=np.float64)
    scale = float(1 << 20) ** 2
    for r in scatter.collect():
        v = r.g_fixed / scale
        g[r.i, r.j] = v
        g[r.j, r.i] = v
    return g


def power_iteration_top1(
    g: np.ndarray, iters: int = 2000, tol: float = 1e-12
) -> tuple[np.ndarray, float]:
    """Leading eigenpair of a symmetric PSD matrix by deterministic
    power iteration: fixed all-ones start, bounded iteration count
    with an early exit on VECTOR convergence (the Rayleigh quotient
    converges quadratically and exits long before the eigenvector has
    settled when the spectral gap is small), sign fixed so the
    largest-|.| component is positive.  Returns (unit eigenvector,
    eigenvalue)."""
    d = g.shape[0]
    v = np.ones(d, dtype=np.float64) / np.sqrt(d)
    for _ in range(iters):
        w = g @ v
        n = np.linalg.norm(w)
        if n == 0.0:
            break
        w = w / n
        delta = float(np.abs(w - v).max())
        v = w
        if delta <= tol:
            break
    lam = float(v @ g @ v)
    pivot = int(np.argmax(np.abs(v)))
    if v[pivot] < 0:
        v = -v
    return v, lam
