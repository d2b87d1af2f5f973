"""Behavioral tests for the mining operators: Bloom prefilter,
two-pass exact heavy hitters, AllPairs prefix-filter Jaccard join."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.operators.bloom import bloom_build, bloom_prefilter
from dss_nlp_ingestion_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from dss_nlp_ingestion_spark.operators.heavyhitters import heavy_hitters_exact


# --- Bloom ----------------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", m_bits=1 << 14, n_hashes=3)
    kept = bloom_prefilter(probe, "k", bloom, m_bits=1 << 14, n_hashes=3)
    kept_keys = {r.k for r in kept.collect()}
    true_keys = {r.k for r in build.collect()} & {r.k for r in probe.collect()}
    # One-sided: every true member survives the prefilter.
    assert true_keys <= kept_keys


def test_bloom_prunes_most_non_members(spark):
    build = spark.range(0, 100).select((F.col("id") + 100_000).alias("k"))
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))  # no overlap
    bloom = bloom_build(build, "k", m_bits=1 << 16, n_hashes=3)
    kept = bloom_prefilter(probe, "k", bloom, m_bits=1 << 16, n_hashes=3)
    # 100 keys in 2^16 bits -> fp rate well under 1%; allow 10x slack.
    assert kept.count() < 2_000


def test_bloom_schema_passthrough(spark):
    build = spark.range(0, 10).select(F.col("id").alias("k"))
    probe = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    bloom = bloom_build(build, "k")
    out = bloom_prefilter(probe, "k", bloom)
    assert out.columns == ["k", "v"]


def test_bloom_rejects_bad_m():
    try:
        bloom_build(None, "k", m_bits=100)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --- heavy hitters --------------------------------------------------------

def test_heavy_hitters_exact_matches_groupby(spark):
    # Zipf-ish synthetic skew: key i appears ~N/(i+1) times.
    rows = [(k,) for k in itertools.chain.from_iterable(
        [i] * (2000 // (i + 1)) for i in range(200)
    )]
    df = spark.createDataFrame(rows, "user_id long").repartition(7)
    k = 50
    got = {(r.user_id, r.cnt) for r in
           heavy_hitters_exact(df, "user_id", k).collect()}
    n = len(rows)
    truth = {
        (r.user_id, r.cnt)
        for r in df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n).collect()
    }
    assert got == truth and len(truth) > 0


def test_heavy_hitters_counter_floor():
    try:
        heavy_hitters_exact(None, "k", k=100, counters=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --- prefix-filter Jaccard ------------------------------------------------

def _pairs_set(df):
    return {
        (r.id_a, r.id_b, r.shared, r.union_sz) for r in df.collect()
    }


def test_prefix_filter_matches_bruteforce(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tonight"),                # near-dup of 1
            (3, base.replace("quick", "slow")),    # near-dup of 1
            (4, "completely different text about spark query engines at scale"),
            (5, "completely different text about spark query engines at scale"),
            (6, "short doc"),                      # < 3 words of shingles
        ],
        "doc_id long, text string",
    )
    fast = prefix_filter_jaccard_pairs(docs, "doc_id", "text", k=3)
    # brute force at the same 3/5 threshold from the quadratic verifier
    brute = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.0).filter(
        F.col("shared") * 5 >= F.col("union_sz") * 3
    ).select("id_a", "id_b", "shared", "union_sz")
    assert _pairs_set(fast) == _pairs_set(brute)
    assert (4, 5) in {(a, b) for a, b, *_ in _pairs_set(fast)}


def test_prefix_filter_integer_ceil_boundary(spark):
    # 5-shingle docs: float ceil(0.6*5)=ceil(3.0000000000000004)=4 would
    # shrink the prefix to 2 and can miss pairs; integer ceil keeps 3.
    words = "a1 b2 c3 d4 e5 f6 g7".split()  # 7 words -> 5 trigram shingles
    d1 = " ".join(words)
    d2 = " ".join(words[:6] + ["zz"])  # shares 4 of its 5 shingles? (suffix differs)
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    fast = _pairs_set(prefix_filter_jaccard_pairs(docs, "doc_id", "text", k=3))
    brute = _pairs_set(
        ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.0)
        .filter(F.col("shared") * 5 >= F.col("union_sz") * 3)
        .select("id_a", "id_b", "shared", "union_sz")
    )
    assert fast == brute


def test_heavy_hitters_string_keys_native(spark):
    """r5 advisor: string keys used to be silently cast to long (all
    NULL -> silently empty result). Now served natively."""
    rows = [(f"u{k}",) for k in itertools.chain.from_iterable(
        [i] * (800 // (i + 1)) for i in range(80)
    )]
    df = spark.createDataFrame(rows, "user string").repartition(5)
    k = 30
    got = {(r.user, r.cnt) for r in
           heavy_hitters_exact(df, "user", k).collect()}
    n = len(rows)
    truth = {
        (r.user, r.cnt)
        for r in df.groupBy("user").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n).collect()
    }
    assert got == truth and len(truth) > 0


def test_heavy_hitters_rejects_unsupported_key_type(spark):
    df = spark.createDataFrame([(1.5,)], "x double")
    try:
        heavy_hitters_exact(df, "x", k=10)
        raise AssertionError("expected TypeError")
    except TypeError:
        pass


def test_heavy_hitters_survives_empty_partitions(spark):
    """r6 review finding: an empty input partition sees no Arrow
    batch, so the candidate dtype must come from the declared key
    type, not be sniffed from batches (string keys used to crash
    with ArrowTypeError)."""
    rows = [("hot",)] * 8 + [("a",), ("b",)]
    df = spark.createDataFrame(rows, "user string").repartition(40)
    got = {(r.user, r.cnt) for r in heavy_hitters_exact(df, "user", 3).collect()}
    assert got == {("hot", 8)}
    dfl = spark.createDataFrame([(7,)] * 8 + [(1,), (2,)], "k long").repartition(40)
    gotl = {(r.k, r.cnt) for r in heavy_hitters_exact(dfl, "k", 3).collect()}
    assert gotl == {(7, 8)}


def test_heavy_hitters_null_keys_count_but_never_report(spark):
    """r6 advisor (medium): integral keys with NULLs reach mapInPandas
    as float64-with-NaN; the candidate stage must drop them or the
    int64 summary build crashes. Documented semantics: NULLs count
    toward n, are never reported as hitters."""
    rows = [(7,)] * 30 + [(None,)] * 60 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "user_id long").repartition(5)
    got = heavy_hitters_exact(df, "user_id", k=4).collect()
    assert {(r.user_id, r.cnt, r.n) for r in got} == {(7, 30, 100)}
    # string keys: same contract
    srows = [("hot",)] * 30 + [(None,)] * 60 + [(f"u{i}",) for i in range(10)]
    sdf = spark.createDataFrame(srows, "user string").repartition(5)
    sgot = heavy_hitters_exact(sdf, "user", k=4).collect()
    assert {(r.user, r.cnt, r.n) for r in sgot} == {("hot", 30, 100)}
