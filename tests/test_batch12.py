"""Batch-12 tests: rendezvous sharding, embedding dim stats."""

from __future__ import annotations

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_hrw_moves_only_into_new_shard(spark):
    rows = QUERIES["rendezvous_shard_moves"](spark, SF_DIR).collect()
    assert {r.shard for r in rows} <= set(range(9))
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved_in for r in rows)
    # minimal movement: every moved doc landed on the NEW shard 8
    for r in rows:
        if r.shard != 8:
            assert r.n_moved_in == 0
        else:
            assert r.n_moved_in == r.n_docs  # the new shard is all-new
    # expected ~1/9 of the corpus; allow generous sampling slack
    assert moved < total / 3


def test_embedding_dim_stats_sane(spark):
    rows = QUERIES["embedding_dim_stats"](spark, SF_DIR).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.var >= 0.0
        assert r.n > 0
