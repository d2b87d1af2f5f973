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


# --- sampling family ------------------------------------------------------

weights_strategy = st.lists(st.integers(1, 500), min_size=1, max_size=60)


@given(ws=weights_strategy, budget=st.integers(10, 2000), rng=st.integers(2, 16))
@settings(**_SETTINGS)
def test_pack_shards_equals_python_prefix_sum(spark, ws, budget, rng):
    from dss_nlp_ingestion_spark.operators.sampling import pack_shards

    rows = list(enumerate(ws))
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r.id: r.shard_id
        for r in pack_shards(df, "id", "w", budget=budget, range_size=rng).collect()
    }
    cum = 0
    for i, w in rows:
        assert got[i] == cum // budget
        cum += w


@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=80, unique=True),
       rate=st.floats(0.05, 0.95))
@settings(**_SETTINGS)
def test_sample_is_subset_and_split_total(spark, keys, rate):
    from dss_nlp_ingestion_spark.operators.sampling import (
        assign_split,
        deterministic_sample,
    )

    df = spark.createDataFrame([(k,) for k in keys], "id long")
    kept = {r.id for r in deterministic_sample(df, "id", rate).collect()}
    assert kept <= set(keys)
    # Higher rate keeps a superset.
    kept2 = {r.id for r in deterministic_sample(df, "id", min(rate + 0.04, 1.0)).collect()}
    assert kept <= kept2
    # Split covers every row exactly once.
    out = assign_split(df, "id", {"a": 0.5, "b": 0.25, "c": 0.25}).collect()
    assert len(out) == len(keys) and {r["split"] for r in out} <= {"a", "b", "c"}


@given(nkeys=st.integers(1, 120), k=st.integers(2, 32))
@settings(**_SETTINGS)
def test_kmv_exact_below_k(spark, nkeys, k):
    from dss_nlp_ingestion_spark.operators.sampling import kmv_distinct

    df = spark.createDataFrame([(0, f"v{i}") for i in range(nkeys)], "g long, k string")
    row = kmv_distinct(df, ["g"], "k", k=k).collect()[0]
    assert row.n_exact == nkeys
    if nkeys < k:
        assert row.n_est == float(nkeys)
    else:
        assert row.n_est > 0


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_png_codec_roundtrip_property(w, h, seed):
    """Any 8-bit RGB image round-trips bit-exactly through the PNG
    codec — every width (exercising stride math) and height
    (exercising the filter-type cycle) and arbitrary pixel content."""
    import numpy as np

    from dss_nlp_ingestion_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(seed % (2**31))
    pixels = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    got_w, got_h, back = decode_png(encode_png(pixels))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(back, pixels)


@given(
    n=st.integers(0, 2000),
    rate=st.sampled_from([8000, 11025, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_wav_codec_roundtrip_property(n, rate, seed):
    import numpy as np

    from dss_nlp_ingestion_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(seed % (2**31))
    samples = rng.randint(-32768, 32768, size=n).astype(np.int16)
    got_rate, ch, back = decode_wav(encode_wav(samples, rate))
    assert (got_rate, ch) == (rate, 1)
    assert np.array_equal(back, samples)


@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=40), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_bigram_lm_total_and_bounds(spark, texts):
    """LM scores exist iff a doc has >= 2 tokens; every score is a
    negative log-probability (add-one smoothing: P < 1 whenever the
    vocabulary has > 1 entry, P <= 1 always)."""
    import re

    from dss_nlp_ingestion_spark.operators.lm import bigram_logprob_scores

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_logprob_scores(df).collect()}
    for i, t in enumerate(texts):
        toks = re.findall("[a-z0-9]+", t.lower())
        if len(toks) >= 2:
            assert i in out
            assert out[i].n_bigrams == len(toks) - 1
            assert out[i].avg_logprob <= 1e-9  # log P <= 0
        else:
            assert i not in out


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("Ll", "Lu", "Nd", "Po", "Zs")
            ),
            max_size=12,
        ),
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_ngram_bow_affine_fold_matches_literal(tokens):
    """The serving-path O(1) bigram assembly in _ngram_bow_counts
    (per-token (h, B, P) parts + the affine identity
    fold(7, a+[sep]+b) = ((h_a*131+sep)*P_b + B_b) mod p) must be
    bit-identical to folding the literal concatenated code list —
    for any text, with and without the per-batch memo."""
    import numpy as np

    from dss_nlp_ingestion_spark.functions import nlp as N

    text = " ".join(tokens)
    dim = 64

    def literal(t):
        counts = np.zeros(dim, dtype=np.int64)
        stoks = [
            s
            for s in (N._STRIP_EDGE.sub("", x) for x in t.strip().lower().split())
            if s
        ]
        for s in stoks:
            counts[N._poly_bucket(s, dim)] += 1
        for a, b in zip(stoks, stoks[1:]):
            h = 7
            for ch in a:
                h = (h * 131 + ord(ch)) % 2147483647
            h = (h * 131 + N.BIGRAM_SEP_CODE) % 2147483647
            for ch in b:
                h = (h * 131 + ord(ch)) % 2147483647
            counts[h % dim] += 1
        return counts, len(stoks)

    c_ref, n_ref = literal(text)
    memo: dict = {}
    for m in (None, memo):
        c, n = N._ngram_bow_counts(text, dim, m)
        assert n == n_ref
        assert np.array_equal(c, c_ref)
    # memo reuse across calls must not change results
    c2, n2 = N._ngram_bow_counts(text, dim, memo)
    assert n2 == n_ref and np.array_equal(c2, c_ref)
