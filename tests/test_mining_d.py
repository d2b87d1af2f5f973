"""Behavioral tests for batch D: lateness audit, incremental
fulltext index matview, triangle edge derivation."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.operators.relational import lateness_audit
from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_lateness_audit_crafted(spark):
    base = datetime.datetime(2024, 1, 1)

    def t(s):
        return base + datetime.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            # user 1 arrival order (seq): ts 0, 10, 5, 20 -> one late
            # event 5s behind the hwm of 10
            (1, 1, t(0)), (1, 2, t(10)), (1, 3, t(5)), (1, 4, t(20)),
            # user 2: perfectly ordered -> zero lateness
            (2, 1, t(0)), (2, 2, t(1)),
        ],
        "user_id long, seq long, ts timestamp",
    )
    got = {r.user_id: r for r in lateness_audit(ev, "user_id", "seq", "ts").collect()}
    assert got[1].n_events == 4 and got[1].n_late == 1
    assert got[1].max_lateness_ms == 5000
    assert got[1].total_lateness_ms == 5000
    assert got[2].n_late == 0 and got[2].total_lateness_ms == 0


def test_fulltext_index_invariants(spark):
    out = QUERIES["fulltext_index_incremental"](spark, SF_DIR).collect()
    assert len(out) > 0
    from dss_nlp_ingestion_spark.catalog import table

    live_docs = (
        table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 17 != 0).count()
    )
    for r in out:
        assert 1 <= r.df <= live_docs


def test_triangle_edges_basket_local():
    # The edge derivation must be basket-local pair generation (one
    # shuffle on the order key), not a fact-table self-join. The
    # registered query collects a literal row, which hides the
    # lineage from plan introspection — pin the construction at
    # source level on the split-out lazy plan builder instead
    # (correctness is pinned by the oracle gate).
    import inspect

    from dss_nlp_ingestion_spark.plans.analytics_queries import _triangle_out

    src = inspect.getsource(_triangle_out)
    assert 'groupBy("l_orderkey")' in src and "collect_set" in src
    assert 'li.alias("x")' not in src


def test_scene_change_batch_crafted():
    import numpy as np
    import pandas as pd

    from dss_nlp_ingestion_spark.operators.multimodal import (
        video_scene_change_batch,
    )
    from dss_nlp_ingestion_spark.operators.video import encode_avi_mjpeg

    same = np.full((8, 16), 40, dtype=np.uint8)
    jump = np.full((8, 16), 200, dtype=np.uint8)
    avi = encode_avi_mjpeg([same, same.copy(), jump])
    pdf = pd.DataFrame({"doc_id": pd.Series([7], dtype="int64"),
                        "payload": [avi]})
    out = pd.concat(list(video_scene_change_batch(iter([pdf]))))
    rows = {int(r.from_frame): r for r in out.itertuples()}
    assert rows[0].abs_diff == 0 and rows[0].is_cut == 0
    assert rows[1].abs_diff == 160 * 8 * 16 and rows[1].is_cut == 1


def test_streaming_cusum_equals_batch(spark):
    got = {
        (r.hour, r.c, r.s_scaled)
        for r in QUERIES["streaming_cusum_changepoints"](spark, SF_DIR).collect()
    }
    want = {
        (r.hour, r.c, r.s_scaled)
        for r in QUERIES["cusum_changepoints"](spark, SF_DIR).collect()
    }
    assert got == want


def test_exact_rank_values_crafted(spark):
    import random

    from dss_nlp_ingestion_spark.operators.relational import exact_rank_values

    rnd = random.Random(7)
    vals = [rnd.uniform(0, 50) for _ in range(1000)] + [3.25] * 17  # hot bucket
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(5)
    n = len(vals)
    ranks = spark.createDataFrame(
        [(i, (i * n + 3) // 4) for i in (1, 2, 3, 4)],
        "rank_idx int, rank_pos long",
    )
    got = {r.rank_idx: r.value for r in exact_rank_values(df, "v", ranks).collect()}
    want = {}
    sv = sorted(vals)
    for i in (1, 2, 3, 4):
        want[i] = sv[(i * n + 3) // 4 - 1]
    assert got == want
