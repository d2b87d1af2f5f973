"""Behavioral tests for the corpus-curation queries (plans/
curation_queries.py) on planted fixture corpora — the oracle parity
test checks cross-engine equality; these check the semantics are the
INTENDED ones (gate thresholds bite, first occurrence wins, target-
like documents outscore off-target ones)."""

from __future__ import annotations

import pytest

from dss_nlp_ingestion_spark.plans.curation_queries import (
    chunk_dedup_docs,
    dsir_importance_weights,
    gopher_quality_gate,
)

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _write_docs(spark, tmp_path, rows):
    rows = [(i, t, lang, "srcT", len(t)) for i, (t, lang) in enumerate(rows, 1)]
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_gopher_gate_thresholds(spark, tmp_path):
    good = " ".join(
        ["the", "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota"] * 6
    )
    too_short = "tiny doc here"
    no_stopwords = " ".join(["zzz%d" % i for i in range(60)])
    degenerate = " ".join(["spam"] * 60)  # unique_frac = 1/60 < 0.10
    sf = _write_docs(
        spark,
        tmp_path,
        [(good, "en"), (too_short, "en"), (no_stopwords, "en"), (degenerate, "en")],
    )
    out = {r["doc_id"]: r for r in gopher_quality_gate(spark, sf).collect()}
    assert out[1]["passes"] == 1
    assert out[2]["passes"] == 0  # n_words < 50
    assert out[3]["passes"] == 0  # stop_frac = 0
    assert out[4]["passes"] == 0  # lexical diversity floor
    assert out[1]["n_words"] == 60
    assert out[4]["unique_frac"] == pytest.approx(1 / 60, abs=1e-6)


def test_chunk_dedup_first_occurrence_wins(spark, tmp_path):
    w20 = " ".join(f"w{i}" for i in range(20))  # 2 full chunks
    half_shared = " ".join(f"w{i}" for i in range(10)) + " " + " ".join(
        f"x{i}" for i in range(10)
    )
    sf = _write_docs(
        spark, tmp_path, [(w20, "en"), (w20, "en"), (half_shared, "en")]
    )
    out = {r["doc_id"]: r for r in chunk_dedup_docs(spark, sf).collect()}
    assert out[1]["total_chunks"] == 2 and out[1]["kept_chunks"] == 2
    # exact duplicate document: every chunk already seen at doc 1
    assert out[2]["total_chunks"] == 2 and out[2]["kept_chunks"] == 0
    # first half duplicated, second half novel
    assert out[3]["total_chunks"] == 2 and out[3]["kept_chunks"] == 1
    import hashlib

    assert out[2]["rebuilt_sha"] == hashlib.sha256(b"").hexdigest()
    assert (
        out[3]["rebuilt_sha"]
        == hashlib.sha256(" ".join(f"x{i}" for i in range(10)).encode()).hexdigest()
    )


def test_dsir_target_like_scores_higher(spark, tmp_path):
    en = "data model train eval data model train eval"
    fr = "chat noir lune mer chat noir lune mer"
    # one fr-labelled doc written in the en (target) vocabulary: DSIR
    # should rank it above the genuinely off-target fr docs.
    sf = _write_docs(
        spark,
        tmp_path,
        [(en, "en"), (en, "en"), (fr, "fr"), (fr, "fr"), (en, "fr")],
    )
    out = {r["doc_id"]: r for r in dsir_importance_weights(spark, sf).collect()}
    assert out[5]["imp_score"] > out[3]["imp_score"]
    assert out[1]["imp_score"] > out[3]["imp_score"]
    assert out[3]["imp_score"] < 0  # off-target mass dominates
    assert out[1]["n_grams"] == 7


def test_gopher_repetition_gate_flags_planted_repeats(spark, tmp_path):
    from dss_nlp_ingestion_spark.plans.curation_queries import (
        gopher_repetition_gate,
    )

    varied = " ".join("w%02d" % (i % 97) for i in range(100))
    # one dominant bigram: "spam ham" repeated -> top2_frac blows the cap
    bigram_spam = " ".join(["spam ham"] * 30 + ["x%02d" % i for i in range(40)])
    # a repeated 5-gram phrase (appears 8x among filler) -> dup5_frac
    phrase = "lorem ipsum dolor sit amet"
    dup5 = " ".join([phrase] * 8 + ["y%02d" % i for i in range(60)])
    tiny = "one"  # shorter than every n: no n-grams, all fractions 0
    sf = _write_docs(
        spark,
        tmp_path,
        [(varied, "en"), (bigram_spam, "en"), (dup5, "en"), (tiny, "en")],
    )
    out = {r["doc_id"]: r for r in gopher_repetition_gate(spark, sf).collect()}
    assert out[1]["passes"] == 1 and out[1]["top2_frac"] < 0.1
    assert out[2]["passes"] == 0 and out[2]["top2_frac"] > 0.20
    assert out[3]["passes"] == 0 and out[3]["dup5_frac"] > 0.15
    assert out[4]["passes"] == 1
    assert out[4]["top2_frac"] == 0.0 and out[4]["dup5_frac"] == 0.0
    # fractions are capped at 1.0 even with the per-occurrence proxy
    assert all(r["dup5_frac"] <= 1.0 for r in out.values())


def test_gopher_repetition_short_doc_passes_not_autofails(spark, tmp_path):
    """Review regression: least() skips NULLs, so a doc with 2-4
    words used to get top4/dup5 pinned to 1.0 and auto-fail."""
    from dss_nlp_ingestion_spark.plans.curation_queries import (
        gopher_repetition_gate,
    )

    sf = _write_docs(spark, tmp_path, [("alpha beta gamma", "en")])
    row = gopher_repetition_gate(spark, sf).collect()[0]
    # the phantom 1.0s are gone: absent n-gram streams report 0.0
    assert row["top4_frac"] == 0.0 and row["dup5_frac"] == 0.0
    # a 3-word doc still fails, but for the RIGHT reason: its single
    # trigram genuinely covers all characters (top2/top3), not a
    # NULL-pinned top4/dup5
    assert row["top3_frac"] == 1.0 and row["top2_frac"] > 0.2
