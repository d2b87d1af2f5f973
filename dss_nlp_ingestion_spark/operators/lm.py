"""Statistical language-model scoring (LLM-pipeline extension).

Perplexity-style quality filtering is a standard training-data gate
(cf. CCNet/Gopher-style pipelines): score each document by how
probable its token stream is under a language model trained on the
corpus itself, then drop the tails (gibberish scores low, boilerplate
scores suspiciously high). The reference has no such operator — its
quality signals are API sentiment/keywords — so this is part of the
engine's training-data surface, built corpus-in/corpus-out with no
external model.

The model here is an add-one-smoothed BIGRAM model estimated from the
corpus in the same job that applies it:

    P(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V)

and a document's score is its mean bigram log-probability.

Scale shape (100 TB story):
- Bigram extraction is SCAN-SIDE: the token array is sliced and
  zipped against itself (no window, no shuffle) and exploded.
- Count tables shuffle on (w1, w2) / w1 — distinct-bigram-sized, far
  smaller than the occurrence stream; the vocabulary size V is a
  one-row aggregate, broadcast.
- The occurrence stream joins the stats table on (w1, w2) — the one
  corpus-sized shuffle — then partial-aggregates per doc.
- Cross-engine determinism: each bigram's log-contribution is
  floor-rounded to 6 decimals and summed as DECIMAL(18,6) (the BM25
  trick), so per-doc totals are independent of addition order and of
  either engine's libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import ensure_parallelism

#: Shared analyzer with the full-text surface — byte-wise identical
#: in Spark and DuckDB.
LM_TOKEN_PATTERN = "[a-z0-9]+"


def bigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean add-one-smoothed bigram log-probability under
    the corpus's own bigram model. Returns (id, n_bigrams,
    avg_logprob) for documents with >= 2 tokens; ``avg_logprob`` is
    floor-rounded to 6 decimals (cross-engine exact)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), 0)
    base = (
        ensure_parallelism(docs)
        .select(F.col(id_col).alias("_id"), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
    )
    # Scan-side bigrams: zip the array against its own 1-shift.
    pairs = F.zip_with(
        F.slice(F.col("_t"), F.lit(1), F.size("_t") - 1),
        F.slice(F.col("_t"), F.lit(2), F.size("_t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = base.select("_id", F.explode(pairs).alias("_b")).select(
        "_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2")
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    # Left-context totals derive from the bigram table (c1 = Σ_w2 c12),
    # so numerator and denominator are estimated from the same stream.
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    vocab = base.select(F.explode("_t").alias("tok")).agg(
        F.countDistinct("tok").cast("long").alias("v")
    )
    raw = F.log((F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v")))
    contrib = (F.floor(raw * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast(
        "decimal(18,6)"
    )
    stats = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", contrib.alias("_contrib"))
    )
    per_doc = (
        bi.join(stats, ["w1", "w2"])
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("_contrib").alias("_total"),
        )
    )
    avg = F.col("_total").cast("double") / F.col("n_bigrams")
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        (F.floor(avg * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .cast("double")
        .alias("avg_logprob"),
    )


def common_ngram_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    min_df: int = 5,
) -> DataFrame:
    """Corpus-common n-gram coverage — the boilerplate signal C4/
    Gopher-class pipelines gate on: the fraction of a document's word
    ``k``-grams that occur in >= ``min_df`` DISTINCT documents. High
    coverage marks template/boilerplate text (navigation chrome,
    licence blocks, mirrored articles) that exact- and near-dup
    passes miss because the surrounding document differs.

    Returns (id_col, n_ngrams, n_common) — n_common counts the doc's
    n-gram OCCURRENCES whose gram is corpus-common; callers derive
    the ratio. Docs with < k tokens emit no n-grams and are absent.

    Scale shape: n-gram extraction is scan-side (compiled-regex
    shingler, no shuffle); the doc-frequency table shuffles on the
    gram key and is DISTINCT-GRAM-sized; the corpus rejoins it by
    gram — a plain hash join, deliberately NOT a broadcast, since the
    common-gram table grows with the corpus (the r3 Jaccard lesson).
    Per-doc totals then partial-aggregate before their shuffle."""
    from dss_nlp_ingestion_spark.functions.text import shingles

    grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("_g")
    )
    dfreq = (
        grams.groupBy("_g", id_col)
        .agg(F.lit(1))
        .groupBy("_g")
        .agg(F.count("*").cast("long").alias("_df"))
    )
    common = dfreq.filter(F.col("_df") >= F.lit(int(min_df))).select("_g")
    per_doc = grams.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_ngrams")
    )
    hits = (
        grams.join(common, "_g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return per_doc.join(hits, id_col, "left").select(
        F.col(id_col),
        F.col("n_ngrams"),
        F.coalesce(F.col("n_common"), F.lit(0).cast("long")).alias("n_common"),
    )
