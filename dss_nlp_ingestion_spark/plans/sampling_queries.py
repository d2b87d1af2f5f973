"""Corpus-assembly queries: deterministic sampling, train/valid/test
splits, stratified domain-mix rebalancing, KMV distinct sketch, and
token-budget shard packing (operators.sampling), each oracle-checked.

These are the post-dedup steps that turn the cleaned document store
the reference pipeline ends at into reproducible training corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.text import token_count, ws_tokens
from dss_nlp_ingestion_spark.operators.sampling import (
    HASH_DENOM,
    assign_split,
    deterministic_sample,
    hash_fraction,
    kmv_distinct,
    pack_shards,
    stratified_sample,
)
from dss_nlp_ingestion_spark.plans.registry import fround, fround_sql, register


def _hfrac_sql(expr: str, salt: str) -> str:
    """DuckDB twin of operators.sampling.hash_fraction: first 52 bits
    of sha256('salt:' || key) as an exact double fraction."""
    return (
        f"(('0x' || substr(sha256('{salt}:' || CAST({expr} AS VARCHAR)), 1, 13))"
        f"::BIGINT / {HASH_DENOM!r})"
    )


# ---------------------------------------------------------------------------
# Reproducible Bernoulli sample
# ---------------------------------------------------------------------------

_SAMPLE_RATE = 0.2

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang,
       {fround_sql(_hfrac_sql('doc_id', 'sample'), 6)} AS frac
FROM documents
WHERE {_hfrac_sql('doc_id', 'sample')} < {_SAMPLE_RATE}
"""


@register("hash_sample_docs", _SAMPLE_ORACLE)
def hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% document sample keyed on doc_id — membership
    is a pure function of the key (reruns, engine changes, and
    repartitions keep the same rows; nested under any higher rate).
    Scan-side filter: zero shuffle at any scale."""
    docs = deterministic_sample(
        table(spark, sf_dir, "documents"), "doc_id", _SAMPLE_RATE, salt="sample"
    )
    return docs.select(
        "doc_id",
        "lang",
        fround(hash_fraction(F.col("doc_id"), "sample"), 6).alias("frac"),
    )


# ---------------------------------------------------------------------------
# Train/valid/test split (leak-free across reruns)
# ---------------------------------------------------------------------------

# Exact binary fractions: the cumulative thresholds (0.75, 0.875) are
# exactly representable, so Spark's accumulated sum and the oracle's
# literals are the identical double.
_SPLIT_WEIGHTS = {"train": 0.75, "valid": 0.125, "test": 0.125}

_SPLIT_ORACLE = f"""
WITH s AS (
  SELECT lang,
         CASE WHEN {_hfrac_sql('doc_id', 'split')} < 0.75 THEN 'train'
              WHEN {_hfrac_sql('doc_id', 'split')} < 0.875 THEN 'valid'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs
FROM s GROUP BY split, lang
"""


@register("train_valid_test_counts", _SPLIT_ORACLE)
def train_valid_test_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """75/12.5/12.5 train/valid/test assignment hashed on doc_id,
    counted per (split, lang). A document's split never changes when
    the corpus grows — the invariant that keeps eval sets leak-free.
    The split itself is a projection; the count is one shuffle."""
    docs = assign_split(
        table(spark, sf_dir, "documents"), "doc_id", _SPLIT_WEIGHTS, salt="split"
    )
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# Stratified (domain-mix) sampling
# ---------------------------------------------------------------------------

_LANG_RATES = {"en": 0.3, "zh": 0.6, "de": 0.8, "es": 0.2}
_DEFAULT_RATE = 0.05

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{v}' THEN {r}" for v, r in _LANG_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)

_STRATA_ORACLE = f"""
WITH kept AS (
  SELECT lang FROM documents
  WHERE {_hfrac_sql('doc_id', 'strata')} < {_RATE_CASE}
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
FROM kept GROUP BY lang
"""


@register("stratified_lang_sample", _STRATA_ORACLE)
def stratified_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing: per-language keep rates (upsample
    low-resource langs, downsample dominant ones), counted per lang.
    The rate map folds into a CASE expression, so the sample is still
    a shuffle-free scan-side filter."""
    docs = stratified_sample(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        _LANG_RATES,
        default_rate=_DEFAULT_RATE,
        salt="strata",
    )
    return docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))


# ---------------------------------------------------------------------------
# KMV distinct-cardinality sketch (vocabulary size per language)
# ---------------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
WITH t AS (
  SELECT DISTINCT lang, tok FROM (
    SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
  )
), f AS (
  SELECT lang, {_hfrac_sql('tok', 'kmv')} AS frac FROM t
), r AS (
  SELECT lang, frac, row_number() OVER (PARTITION BY lang ORDER BY frac ASC) AS rn
  FROM f
), a AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_exact,
         max(CASE WHEN rn = {_KMV_K} THEN frac END) AS kth
  FROM r GROUP BY lang
)
SELECT lang, n_exact,
       {fround_sql(f"CASE WHEN kth IS NOT NULL THEN {float(_KMV_K - 1)!r} / kth ELSE CAST(n_exact AS DOUBLE) END", 4)} AS n_est
FROM a
"""


@register("kmv_vocab_by_lang", _KMV_ORACLE)
def kmv_vocab_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary-size estimate via the K-Minimum-Values
    sketch (k=64) next to the exact distinct count — the reproducible
    (cross-engine, unlike HLL) approximate-distinct operator. One
    shuffle on lang; the rank pass is WindowGroupLimit-prunable and
    each group retains <= k values after it."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(ws_tokens(F.col("text"))).alias("tok"))
    out = kmv_distinct(toks, ["lang"], "tok", k=_KMV_K, salt="kmv")
    return out.select("lang", "n_exact", fround(F.col("n_est"), 4).alias("n_est"))


# ---------------------------------------------------------------------------
# Token-budget shard packing (distributed prefix sum)
# ---------------------------------------------------------------------------

_SHARD_BUDGET = 5_000
_RANGE_SIZE = 100

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w
  FROM documents
), s AS (
  SELECT doc_id, w,
         COALESCE(sum(w) OVER (ORDER BY doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, w AS n_tokens,
       CAST(floor(cum_before / CAST({_SHARD_BUDGET} AS DOUBLE)) AS BIGINT) AS shard_id
FROM s
"""


@register("pack_training_shards", _PACK_ORACLE)
def pack_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (in doc_id order) into ~5k-token training
    shards: shard_id = floor(tokens_before_this_doc / budget). The
    oracle is the naive global running sum; the Spark plan is the
    two-level distributed prefix sum (per-range windows in parallel +
    a tiny per-range-totals global pass) that produces bit-identical
    longs without a single-partition window over the corpus."""
    docs = table(spark, sf_dir, "documents")
    weighted = docs.select("doc_id", token_count(F.col("text")).alias("w"))
    return pack_shards(
        weighted, "doc_id", "w", budget=_SHARD_BUDGET, range_size=_RANGE_SIZE
    )


# ---------------------------------------------------------------------------
# Fixed-size deterministic sample (exactly n rows, order by key hash)
# ---------------------------------------------------------------------------

_FIXED_N = 200

_FIXED_ORACLE = f"""
SELECT doc_id, lang, {fround_sql(_hfrac_sql('doc_id', 'fixed'), 6)} AS frac
FROM documents
ORDER BY {_hfrac_sql('doc_id', 'fixed')} ASC
LIMIT {_FIXED_N}
"""


@register("fixed_size_sample", _FIXED_ORACLE)
def fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n deterministic sample: the n smallest key-hash
    fractions (a uniform sample without a rate guess). Compiles to
    TakeOrderedAndProject — per-partition top-n then a merge of n-row
    heads, never a global sort of the corpus; membership is again a
    pure function of the key set."""
    docs = table(spark, sf_dir, "documents")
    frac = hash_fraction(F.col("doc_id"), "fixed")
    return (
        docs.select("doc_id", "lang", fround(frac, 6).alias("frac"), frac.alias("_o"))
        .orderBy(F.col("_o").asc())
        .limit(_FIXED_N)
        .drop("_o")
    )


# ---------------------------------------------------------------------------
# Quality curriculum bins (distributed histogram-CDF, no global sort)
# ---------------------------------------------------------------------------

_N_BINS = 4

# Rounded-quality histogram -> cumulative docs-above -> bin. Binning at
# VALUE granularity (all docs with equal rounded quality share a bin)
# keeps the result deterministic without per-doc tie-breaks.
_TOKS_SQL = r"len(string_split_regex(trim(text), '\s+'))"
_UNIQ_SQL = r"len(list_distinct(string_split_regex(trim(text), '\s+')))"
_QUALITY_SQL = fround_sql(
    "0.4 * (CASE WHEN n_chars >= 100 AND n_chars <= 2000 THEN 1.0 ELSE 0.0 END)"
    f" + 0.3 * (CAST({_UNIQ_SQL} AS DOUBLE) / {_TOKS_SQL})"
    " + 0.3 * (1.0 - least(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)"
    f" / {_TOKS_SQL}, 1.0))",
    6,
)

_CURRICULUM_ORACLE = f"""
WITH q AS (
  SELECT doc_id, {_QUALITY_SQL} AS quality
  FROM documents
), counts AS (
  SELECT quality, count(*) AS n FROM q GROUP BY quality
), cdf AS (
  SELECT quality,
         COALESCE(sum(n) OVER (ORDER BY quality DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above,
         sum(n) OVER () AS total
  FROM counts
)
SELECT q.doc_id, q.quality,
       CAST(floor({_N_BINS}.0 * cdf.above / cdf.total) AS BIGINT) AS bin
FROM q JOIN cdf USING (quality)
"""


@register("quality_curriculum_bins", _CURRICULUM_ORACLE)
def quality_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: quartile bins over the quality score
    (bin 0 = best) WITHOUT a global sort — one shuffle builds the
    per-quality-value histogram, the cumulative pass runs over the
    tiny distinct-values table, and bins broadcast-join back onto the
    corpus (the same two-level shape as shard packing; ntile() would
    be a single-partition window over every row)."""
    from dss_nlp_ingestion_spark.functions.text import quality_score

    docs = table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        fround(quality_score(F.col("text"), F.col("n_chars")), 6).alias("quality"),
    )
    counts = q.groupBy("quality").agg(F.count(F.lit(1)).alias("_n"))
    w_above = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cdf = counts.select(
        "quality",
        F.coalesce(F.sum("_n").over(w_above), F.lit(0)).alias("_above"),
        F.sum("_n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    return q.join(F.broadcast(cdf), "quality").select(
        "doc_id",
        "quality",
        F.floor(F.lit(float(_N_BINS)) * F.col("_above") / F.col("_total"))
        .cast("long")
        .alias("bin"),
    )


# ---------------------------------------------------------------------------
# End-to-end corpus build: dedup -> decontaminate -> gate -> split
# ---------------------------------------------------------------------------

_E2E_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh
  FROM w WHERE len(ws) >= 3
), dedup AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id ASC) AS rn
    FROM documents
  ) WHERE rn = 1
), bench AS (
  SELECT DISTINCT s FROM (SELECT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0)
), probe AS (
  SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 97 <> 0
), bad AS (
  SELECT DISTINCT p.doc_id FROM probe p JOIN bench b USING (s)
), clean AS (
  SELECT d.doc_id, d.lang,
         CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS toks
  FROM dedup d
  WHERE d.doc_id % 97 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM bad)
    AND len(string_split_regex(trim(d.text), '\\s+')) > 5
), labeled AS (
  SELECT lang, toks,
         CASE WHEN (('0x' || substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                    / 4503599627370496.0) < 0.75 THEN 'train'
              WHEN (('0x' || substr(sha256('split:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                    / 4503599627370496.0) < 0.875 THEN 'valid'
              ELSE 'test' END AS split
  FROM clean
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_tokens
FROM labeled GROUP BY split, lang
"""


@register("corpus_build_e2e", _E2E_ORACLE)
def corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus build as ONE composed plan: exact
    dedup (keep lowest id per content digest) -> eval-set
    decontamination (3-gram overlap vs the doc_id%97 benchmark) ->
    quality gate (> 5 tokens) -> leak-free hash split -> per
    (split, lang) document and token accounting. Every stage is one
    of the registered operators; Catalyst fuses the filters into the
    scan side of each join, and nothing in the chain introduces a
    shuffle beyond the dedup window, the two dedup/decontamination
    joins, and the final aggregate."""
    from dss_nlp_ingestion_spark.operators.dedup import decontaminate, exact_dedup

    docs = table(spark, sf_dir, "documents")
    deduped = exact_dedup(docs, ["text"], "doc_id")
    corpus = deduped.filter(F.col("doc_id") % 97 != 0)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    clean = decontaminate(corpus, benchmark, "doc_id", "text", k=3).withColumn(
        "_toks", token_count(F.col("text"))
    ).filter(F.col("_toks") > 5)
    labeled = assign_split(clean, "doc_id", _SPLIT_WEIGHTS, salt="split")
    return labeled.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_toks").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Deterministic contrastive negatives (hash-indexed negative sampling)
# ---------------------------------------------------------------------------

_NEG_K = 4

_NEG_ORACLE = f"""
WITH tot AS (
  SELECT count(*) AS c FROM documents
), anchors AS (
  SELECT d.doc_id, j,
         ('0x' || substr(sha256('neg:' || CAST(d.doc_id AS VARCHAR) || ':'
                                 || CAST(j AS VARCHAR)), 1, 13))::BIGINT % tot.c AS neg_id
  FROM documents d
  CROSS JOIN tot
  CROSS JOIN (SELECT unnest(generate_series(1, {_NEG_K})) AS j)
  WHERE d.doc_id < 20
)
SELECT a.doc_id, CAST(a.j AS BIGINT) AS j, a.neg_id, n.lang AS neg_lang
FROM anchors a JOIN documents n ON n.doc_id = a.neg_id
WHERE a.neg_id <> a.doc_id
"""


@register("contrastive_negatives", _NEG_ORACLE)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor document draws k=4 pseudo-random partners via
    sha256('neg:'||id||':'||j) mod corpus size — reproducible across
    runs/engines (no rand()), uniform over the corpus, and realized
    by an equi-join on the computed id (shuffle on doc_id; anchors
    broadcast when the anchor set is small). Accidental self-pairs
    are filtered, identically in both engines."""
    docs = table(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("_c"))
    h = F.sha2(
        F.concat_ws(
            ":", F.lit("neg"), F.col("doc_id").cast("string"), F.col("j").cast("string")
        ),
        256,
    )
    anchors = (
        docs.filter(F.col("doc_id") < 20)
        .select("doc_id", F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias("j"))
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("j").cast("long").alias("j"),
            (F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % F.col("_c")).alias(
                "neg_id"
            ),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    neg = docs.select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    return anchors.join(neg, "neg_id").select("doc_id", "j", "neg_id", "neg_lang")


# ---------------------------------------------------------------------------
# Quality-weighted sampling (keep probability = quality score)
# ---------------------------------------------------------------------------

_QW_ORACLE = f"""
WITH q AS (
  SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM documents
)
SELECT doc_id, lang, quality FROM q
WHERE {_hfrac_sql('doc_id', 'qw')} < quality
"""


@register("quality_weighted_sample", _QW_ORACLE)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by document quality: each document is kept
    with probability equal to its quality score (high-quality data
    oversampled exactly as mid-training recipes weight it). Still a
    pure scan-side filter — the keep threshold is itself a column,
    no shuffle, reproducible via the keyed hash."""
    from dss_nlp_ingestion_spark.functions.text import quality_score

    docs = table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "lang",
        fround(quality_score(F.col("text"), F.col("n_chars")), 6).alias("quality"),
    )
    return q.filter(hash_fraction(F.col("doc_id"), "qw") < F.col("quality"))


# ---------------------------------------------------------------------------
# Temperature-scaled language rebalancing (p_l ∝ n_l^alpha)
# ---------------------------------------------------------------------------

_ALPHA = 0.7

# rate_l = fround6( n_l^(alpha-1) / max_l n_l^(alpha-1) ): the rarest
# language samples at rate 1.0 and larger ones are downsampled toward
# the n^alpha multinomial mix (the published low-resource upsampling
# formula). Rates are floor-rounded to 6 dp in BOTH engines before the
# hash comparison so libm pow() ulp differences cannot flip a row.
_TEMP_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_orig FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n_orig,
         {fround_sql(f"pow(n_orig, {_ALPHA} - 1.0) / max(pow(n_orig, {_ALPHA} - 1.0)) OVER ()", 6)}
           AS rate
  FROM counts
), kept AS (
  SELECT d.lang FROM documents d JOIN rates r USING (lang)
  WHERE {_hfrac_sql('d.doc_id', 'temp')} < r.rate
)
SELECT r.lang, r.n_orig, r.rate,
       CAST(count(k.lang) AS BIGINT) AS n_sampled
FROM rates r LEFT JOIN kept k ON k.lang = r.lang
GROUP BY r.lang, r.n_orig, r.rate
"""


@register("temperature_lang_rebalance", _TEMP_ORACLE)
def temperature_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multinomial language rebalancing
    (rate_l ∝ n_l^(α-1), α=0.7): the standard multilingual-pretraining
    recipe for upsampling low-resource languages, derived FROM the
    corpus itself — counts aggregate once, the tiny per-language rate
    table broadcasts back, and the sample is the usual shuffle-free
    keyed-hash filter. Rates floor-rounded to 6 dp in both engines so
    libm pow() differences cannot flip membership."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_orig"))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pw = F.pow(F.col("n_orig").cast("double"), F.lit(_ALPHA - 1.0))
    rates = counts.select(
        "lang", "n_orig", fround(pw / F.max(pw).over(w_all), 6).alias("rate")
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(hash_fraction(F.col("doc_id"), "temp") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_orig",
        "rate",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("long")).alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# Fixed-length sequence packing manifest (LLM pretrain data prep)
# ---------------------------------------------------------------------------

_SEQ_LEN = 256

_SEQPACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w
  FROM documents
),
offs AS (
  SELECT doc_id, w,
         CAST(coalesce(sum(w) OVER (ORDER BY doc_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start
  FROM t
),
spans AS (
  SELECT doc_id, w, start,
         unnest(generate_series(start // {_SEQ_LEN},
                                (start + w - 1) // {_SEQ_LEN})) AS seq_id
  FROM offs WHERE w > 0
)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(start + w, (seq_id + 1) * {_SEQ_LEN})
                - greatest(start, seq_id * {_SEQ_LEN})) AS BIGINT) AS tok_filled
FROM spans GROUP BY seq_id
"""


@register("pack_fixed_sequences_manifest", _SEQPACK_ORACLE)
def pack_fixed_sequences_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: the corpus concatenated (doc_id
    order) and cut into back-to-back {seq}-token sequences; one row
    per sequence with how many documents feed it and how many tokens
    it holds (= seq_len everywhere except the ragged tail — which the
    hash gate verifies exactly). The Spark side uses the TWO-LEVEL
    distributed prefix sum (operators/sampling.py:
    global_start_offsets — no single-partition global window); the
    oracle uses DuckDB's plain cumulative window, proving the
    distributed decomposition bit-equals the sequential scan. This is
    the packing DECISION layer of pretraining prep: shard writers
    then materialize tokens per sequence independently.""".replace(
        "{seq}", str(_SEQ_LEN)
    )
    from dss_nlp_ingestion_spark.operators.sampling import pack_fixed_sequences

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("w")
    )
    manifest = pack_fixed_sequences(docs, "doc_id", "w", _SEQ_LEN, 4096)
    return manifest.groupBy("seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tok_in_seq").cast("long").alias("tok_filled"),
    )


_FIXED_N_GROUP_ORACLE = """
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY sha256('fixn|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS rn
  FROM documents
)
SELECT lang, doc_id FROM ranked WHERE rn <= 20
"""


@register("fixed_n_per_group_sample", _FIXED_N_GROUP_ORACLE)
def fixed_n_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-stratum sampling (the per-group twin of
    fixed_size_sample): rank rows inside each group by a deterministic
    hash of the key and keep the first 20 — a seeded shuffle-order
    without an RNG, reproducible in any engine. The rank-limit plan
    is WindowGroupLimit-pushed (each map task ships at most n rows
    per group before the exchange), so per-group sampling costs far
    less than a group shuffle at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.concat(F.lit("fixn|"), F.col("doc_id").cast("string")), 256).asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.select("lang", "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .select("lang", "doc_id")
    )


_WSYS_N = 500

_WSYS_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         ('0x' || substr(sha256('wsys:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS okey
  FROM documents
),
pref AS (
  SELECT doc_id, w,
         CAST(coalesce(sum(w) OVER (
           ORDER BY okey ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s,
         CAST(sum(w) OVER () AS BIGINT) AS total
  FROM keyed
)
SELECT doc_id, w AS weight,
       CAST((s + w) * {_WSYS_N} // total - (s * {_WSYS_N}) // total AS BIGINT) AS n_picks
FROM pref
WHERE (s + w) * {_WSYS_N} // total - (s * {_WSYS_N}) // total > 0
"""


@register("weighted_systematic_sample", _WSYS_ORACLE)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic resampling of documents by n_chars
    (operators.sampling.weighted_systematic_picks): 500 picks whose
    per-document expectation is exactly proportional to length —
    the deterministic, variance-free form of the weighted draw
    corpus temperature-mixing needs (heavy docs get multiple picks
    = epochs). No RNG anywhere: hash-ordered weight axis + an
    integer comb; the oracle replays the identical BIGINT
    arithmetic over a single global window while the Spark side
    uses the two-level distributed prefix sum — the hash match
    proves the distributed decomposition equals the sequential
    cumsum."""
    from dss_nlp_ingestion_spark.operators.sampling import (
        weighted_systematic_picks,
    )

    docs = table(spark, sf_dir, "documents")
    return weighted_systematic_picks(docs, "doc_id", "n_chars", _WSYS_N, salt="wsys")
