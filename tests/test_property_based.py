"""Property-based tests (hypothesis) — the test class the reference
lacks entirely (SURVEY.md §5): operators are checked against pure-
python reference implementations on generated inputs, not just
hand-picked examples. Examples are kept small because each runs a
Spark job."""

from __future__ import annotations

import collections
import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.operators.relational import majority_vote, ttl_dedup

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

votes_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(["A", "B", "C"])),
    min_size=1,
    max_size=30,
)


@given(votes=votes_strategy)
@settings(**_SETTINGS)
def test_majority_vote_matches_python_reference(spark, votes):
    df = spark.createDataFrame(votes, ["g", "v"])
    got = {r.g: r.m for r in majority_vote(df, ["g"], "v", 0.666, "m").collect()}

    expected = {}
    by_group = collections.defaultdict(list)
    for g, v in votes:
        by_group[g].append(v)
    for g, vs in by_group.items():
        counts = collections.Counter(vs)
        # deterministic tie-break: max count, then smallest value
        winner, cnt = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expected[g] = winner if cnt / len(vs) > 0.666 else None
    assert got == expected


events_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 10_000)),  # (key, offset_seconds)
    min_size=1,
    max_size=25,
    unique=True,
)


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_ttl_dedup_matches_python_reference(spark, events):
    base = datetime.datetime(2024, 1, 1)
    ttl = 1800  # 30 min
    rows = [
        (i, k, base + datetime.timedelta(seconds=off))
        for i, (k, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["id", "k", "ts"])
    got = sorted(
        r.id for r in ttl_dedup(df, ["k"], "ts", ttl_seconds=ttl, order_tiebreak="id").collect()
    )

    # Renewal semantics: accept iff previous sighting of the key (any,
    # accepted or not) is absent or >= ttl older.
    expected = []
    last_seen: dict[int, datetime.datetime] = {}
    for rid, k, ts in sorted(rows, key=lambda r: (r[2], r[0])):
        prev = last_seen.get(k)
        if prev is None or (ts - prev).total_seconds() >= ttl:
            expected.append(rid)
        last_seen[k] = ts
    assert got == sorted(expected)


texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("ab ！？，　ＡＢ!?,"),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=texts_strategy)
@settings(**_SETTINGS)
def test_fullwidth_fold_collapse_idempotent(spark, texts):
    from dss_nlp_ingestion_spark.functions.text import (
        collapse_punct_runs,
        fold_fullwidth,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    once = df.select(
        collapse_punct_runs(fold_fullwidth(F.col("t")), "!?,").alias("c")
    )
    twice = once.select(
        collapse_punct_runs(fold_fullwidth(F.col("c")), "!?,").alias("c")
    )
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]
