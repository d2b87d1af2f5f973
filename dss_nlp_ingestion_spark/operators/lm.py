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
