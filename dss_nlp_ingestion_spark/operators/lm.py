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


def stupid_backoff_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_mod: int = 2,
    alpha: float = 0.4,
) -> DataFrame:
    """Held-out trigram scoring with Stupid Backoff (Brants et al.
    2007, the web-scale LM smoothing): the model is estimated on the
    ``id % train_mod == 0`` half of the corpus and scores EVERY
    document — the realistic CCNet-style setup (scoring with a model
    trained elsewhere), and the one where backoff actually fires:

        S(w3 | w1 w2) = c123/c12                  (trigram seen)
                      = alpha * c23/c2            (bigram backoff)
                      = alpha^2 * (c3+1)/(N+V)    (unigram, add-one)

    Per-(n-gram) contributions ``ln S`` are floor-rounded to 6
    decimals and decimal-summed (the bigram gate's determinism
    recipe). Returns (id, n_trigrams, n_backoff, avg_logscore).

    Scale shape: all count tables are distinct-n-gram-sized and built
    once from the train half; contributions are PRE-COMPUTED per
    distinct n-gram, so the corpus-sized work is three hash joins of
    the trigram occurrence stream against those tables plus one
    per-doc partial aggregation — no broadcast of anything that grows
    with the corpus."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), 0
    )
    base = (
        ensure_parallelism(docs)
        .select(F.col(id_col).alias("_id"), toks.alias("_t"))
        .filter(F.size("_t") >= 3)
    )
    shift = lambda k, n: F.slice(F.col("_t"), F.lit(k), F.size("_t") - n)  # noqa: E731
    tri_structs = F.zip_with(
        F.zip_with(
            shift(1, 2), shift(2, 2), lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        ),
        shift(3, 2),
        lambda ab, c: F.struct(
            ab["w1"].alias("w1"), ab["w2"].alias("w2"), c.alias("w3")
        ),
    )
    tri = base.select("_id", F.explode(tri_structs).alias("_g")).select(
        "_id",
        F.col("_g.w1").alias("w1"),
        F.col("_g.w2").alias("w2"),
        F.col("_g.w3").alias("w3"),
    )
    train = tri.filter(F.col("_id") % train_mod == 0)
    c123 = train.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c123")
    )
    c12 = c123.groupBy("w1", "w2").agg(F.sum("c123").cast("long").alias("c12"))
    # c23 = Σ_w1 c123 EXACTLY (both count train trigram occurrences),
    # so it folds from the distinct-trigram table instead of
    # re-tokenizing the train half and shuffling every trigram
    # OCCURRENCE a second time (r11, guide §1.2/§2.3: aggregate the
    # aggregated) — one corpus-sized map pass + exchange removed.
    c23 = c123.groupBy("w2", "w3").agg(F.sum("c123").cast("long").alias("c23"))
    c2 = c23.groupBy("w2").agg(F.sum("c23").cast("long").alias("c2"))
    train_toks = base.filter(F.col("_id") % train_mod == 0).select(
        F.explode("_t").alias("tok")
    )
    c3 = train_toks.groupBy(F.col("tok").alias("w3")).agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    )
    # (n_tok, v) fold from the unigram table — n_tok = Σ c3, v = its
    # row count — rather than a second tokenize+explode of the train
    # half just for two scalars (same r11 pass).
    nv = c3.agg(
        F.sum("c3").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )

    def _q(raw: Column) -> Column:
        return (F.floor(raw * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast(
            "decimal(18,6)"
        )

    s123 = c123.join(c12, ["w1", "w2"]).select(
        "w1", "w2", "w3",
        _q(F.log(F.col("c123").cast("double") / F.col("c12"))).alias("k123"),
    )
    s23 = c23.join(c2, "w2").select(
        "w2", "w3",
        _q(F.log(F.lit(alpha) * F.col("c23").cast("double") / F.col("c2"))).alias("k23"),
    )
    s3 = c3.crossJoin(F.broadcast(nv)).select(
        "w3",
        _q(
            F.log(
                F.lit(alpha * alpha)
                * (F.col("c3") + 1).cast("double")
                / (F.col("n_tok") + F.col("v"))
            )
        ).alias("k3"),
    )
    oov = _q(
        F.log(
            F.lit(alpha * alpha)
            * F.lit(1.0)
            / (F.col("n_tok") + F.col("v"))
        )
    )
    scored = (
        tri.join(s123, ["w1", "w2", "w3"], "left")
        .join(s23, ["w2", "w3"], "left")
        .join(s3, "w3", "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "_id",
            F.coalesce(F.col("k123"), F.col("k23"), F.col("k3"), oov).alias("_k"),
            F.when(F.col("k123").isNull(), 1).otherwise(0).alias("_bo"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("_bo").cast("long").alias("n_backoff"),
        F.sum("_k").alias("_total"),
    )
    avg = F.col("_total").cast("double") / F.col("n_trigrams")
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_trigrams",
        "n_backoff",
        (F.floor(avg * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .cast("double")
        .alias("avg_logscore"),
    )
