"""Series/linear-algebra surface: EWMA weights, scatter matrix + PCA
power iteration, Markov transitions."""

from __future__ import annotations

import numpy as np

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_ewma_single_hour_equals_count(spark):
    # A burst hour with an empty 24-hour lookback smooths to itself.
    rows = QUERIES["ewma_hourly_counts"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_lags == 1:
            assert abs(r.ewma - r.c) < 1e-9
        assert r.n_lags <= 24


def test_pca_power_iteration_matches_eigh(spark):
    from dss_nlp_ingestion_spark.operators.pca import (
        power_iteration_top1,
        scatter_to_matrix,
    )

    g = scatter_to_matrix(
        QUERIES["embedding_scatter_matrix"](spark, SF_DIR), 64
    )
    assert np.allclose(g, g.T)
    v, lam = power_iteration_top1(g)
    evals, evecs = np.linalg.eigh(g)
    top = evecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    assert abs(lam - evals[-1]) <= 1e-6 * max(1.0, abs(evals[-1]))
    assert np.allclose(v, top, atol=1e-5)


def test_transition_probs_rowsum_one(spark):
    rows = QUERIES["event_transition_probs"](spark, SF_DIR).collect()
    assert rows
    by_cur: dict[str, float] = {}
    for r in rows:
        by_cur[r.cur_type] = by_cur.get(r.cur_type, 0.0) + r.p
    for cur, s in by_cur.items():
        assert abs(s - 1.0) < 1e-3, (cur, s)
