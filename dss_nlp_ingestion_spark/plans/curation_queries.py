"""Corpus-curation queries: the document-gating / reweighting layer a
training-data pipeline runs between raw ingest and shard packing.

Three standard stages, each scan-side and oracle-gated:

- ``gopher_quality_gate`` — the Gopher/C4 heuristic rule battery
  (word-count bounds, mean word length, stopword presence, lexical
  diversity) as one pure-projection pass (Rae et al. 2021 §A1.1).
- ``chunk_dedup_docs`` — corpus-level exact dedup at sub-document
  granularity (fixed word-window chunks), keep-first-occurrence, and
  in-engine document reassembly — the line/paragraph dedup step of
  C4/Dolma-style pipelines, generalized to windows because the
  synthetic corpus has no newlines.
- ``dsir_importance_weights`` — hashed-n-gram importance weighting
  (Xie et al. 2023, DSIR): score every raw document by how target-like
  its bigram distribution is. The classic form sums log-probability
  ratios; ln() is not bit-reproducible across engines, so the score
  here is the exact-integer difference-of-probabilities form
  mean_g(p_target(g) - p_raw(g)), computed entirely in int64/decimal
  arithmetic and divided once at the end — hash-stable by
  construction, same ordering behavior for ranking/resampling.

Reference scope note: the reference pipeline gates documents with
hand rules at parse time (e.g. src/utils/newsfilter_utils.py form-type
drops); these queries are the corpus-scale generalization of that
gating stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions import text as T
from dss_nlp_ingestion_spark.plans.registry import fround, fround_sql, register

# ---------------------------------------------------------------------------
# Gopher-style quality rule battery
# ---------------------------------------------------------------------------

#: closed-class words of the synthetic vocabulary (stopword-presence
#: rule; real deployments plug in a language-specific list).
_STOPWORDS = ("the", "a")

_MIN_WORDS, _MAX_WORDS = 50, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MIN_STOP_FRAC = 0.005
_MIN_UNIQUE_FRAC = 0.10

_STOP_IN = ", ".join(f"'{w}'" for w in _STOPWORDS)

_GOPHER_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT) AS n_word_chars,
         CAST(list_max(list_transform(ws, x -> len(x))) AS BIGINT) AS max_word_len,
         CAST(len(list_filter(ws, x -> x IN ({_STOP_IN}))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique
  FROM w
)
SELECT doc_id, n_words, max_word_len,
       {fround_sql('CAST(n_word_chars AS DOUBLE) / n_words', 6)} AS mean_word_len,
       {fround_sql('CAST(n_stop AS DOUBLE) / n_words', 6)} AS stop_frac,
       {fround_sql('CAST(n_unique AS DOUBLE) / n_words', 6)} AS unique_frac,
       CAST(CASE WHEN n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
                  AND CAST(n_word_chars AS DOUBLE) / n_words >= {_MIN_MWL}
                  AND CAST(n_word_chars AS DOUBLE) / n_words <= {_MAX_MWL}
                  AND CAST(n_stop AS DOUBLE) / n_words >= {_MIN_STOP_FRAC}
                  AND CAST(n_unique AS DOUBLE) / n_words >= {_MIN_UNIQUE_FRAC}
             THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM m
"""


@register("gopher_quality_gate", _GOPHER_ORACLE)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery as ONE whole-stage-codegen projection: all
    five per-document statistics come from a single tokenization
    (higher-order array ops over the split array — no explode, no
    shuffle, no Python), so at 100 TB this is a pure map pass whose
    cost is the scan itself. Ratios are int/int divisions rounded
    with the cross-engine floor formula; the verdict is re-derived
    from the same raw integers on both sides."""
    docs = table(spark, sf_dir, "documents")
    ws = T.ws_tokens(F.col("text"))
    lens = F.transform(ws, F.length)
    n_words = F.size(ws).cast("long")
    n_chars = F.aggregate(
        lens, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
    )
    n_stop = F.size(
        F.filter(ws, lambda x: x.isin(*_STOPWORDS))
    ).cast("long")
    n_unique = F.size(F.array_distinct(ws)).cast("long")
    mwl = n_chars.cast("double") / n_words
    stop_frac = n_stop.cast("double") / n_words
    uniq_frac = n_unique.cast("double") / n_words
    passes = (
        n_words.between(_MIN_WORDS, _MAX_WORDS)
        & (mwl >= _MIN_MWL)
        & (mwl <= _MAX_MWL)
        & (stop_frac >= _MIN_STOP_FRAC)
        & (uniq_frac >= _MIN_UNIQUE_FRAC)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.array_max(lens).cast("long").alias("max_word_len"),
        fround(mwl, 6).alias("mean_word_len"),
        fround(stop_frac, 6).alias("stop_frac"),
        fround(uniq_frac, 6).alias("unique_frac"),
        F.when(passes, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("passes"),
    )


# ---------------------------------------------------------------------------
# Corpus-level chunk dedup + in-engine document reassembly
# ---------------------------------------------------------------------------

_CHUNK_W = 10  # words per chunk

_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), ch AS (
  SELECT doc_id, k,
         array_to_string(list_slice(ws, k * {_CHUNK_W} + 1, k * {_CHUNK_W} + {_CHUNK_W}), ' ') AS chunk
  FROM w, UNNEST(range(CAST(ceil(len(ws) / {_CHUNK_W}.0) AS BIGINT))) AS t(k)
), r AS (
  SELECT doc_id, k, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, k) AS rn
  FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS total_chunks,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS kept_chunks,
       sha256(coalesce(string_agg(chunk, ' ' ORDER BY k) FILTER (WHERE rn = 1), '')) AS rebuilt_sha
FROM r GROUP BY doc_id
"""


@register("chunk_dedup_docs", _CHUNK_ORACLE)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (the C4/Dolma line-dedup stage over
    {_CHUNK_W}-word windows): every chunk keeps only its FIRST corpus
    occurrence (ordered by doc_id, then position), and documents are
    reassembled in-engine from their surviving chunks — the output is
    per-doc retention plus the sha256 of the rebuilt text, so the
    reassembly itself sits under the hash gate.

    Two shuffles total, both key-uniform: one on the chunk text for
    the keep-first window (crypto-grade spread; duplicate-heavy
    chunks are exactly the ones the window truncates to rank 1), one
    on doc_id to reassemble. Chunking is a higher-order transform
    over the split array — no Python, no per-row UDF."""
    docs = table(spark, sf_dir, "documents")
    ws = T.ws_tokens(F.col("text"))
    n_chunks = F.floor((F.size(ws) + (_CHUNK_W - 1)) / _CHUNK_W).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.array_join(F.slice(ws, k * _CHUNK_W + 1, _CHUNK_W), " "),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("k", "chunk")
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "k")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("k", "chunk"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("total_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("kept_chunks"),
        F.sha2(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            ),
            256,
        ).alias("rebuilt_sha"),
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed-n-gram importance weights
# ---------------------------------------------------------------------------

_DSIR_B = 4096  # hash buckets
_DSIR_SALT = "dsir"
_TARGET_LANG = "en"


def _bucket_sql(gram_expr: str) -> str:
    return (
        f"(('0x' || substr(sha256('{_DSIR_SALT}:' || {gram_expr}), 1, 13))::BIGINT"
        f" % {_DSIR_B})"
    )


_DSIR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS gram
  FROM w
), b AS (
  SELECT doc_id, lang, {_bucket_sql('gram')} AS bucket FROM g
), stats AS (
  SELECT bucket,
         CAST(count(*) FILTER (WHERE lang = '{_TARGET_LANG}') AS BIGINT) AS tc,
         CAST(count(*) AS BIGINT) AS rc
  FROM b GROUP BY bucket
), tot AS (
  SELECT CAST(sum(tc) AS BIGINT) AS t_total, CAST(sum(rc) AS BIGINT) AS r_total
  FROM stats
), terms AS (
  SELECT b.doc_id, s.tc, s.rc FROM b JOIN stats s USING (bucket)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       {fround_sql(
           'CAST(sum(CAST(tc * r_total - rc * t_total AS DECIMAL(38,0))) AS DOUBLE)'
           ' / (CAST(count(*) AS DOUBLE) * CAST(t_total AS DOUBLE)'
           ' * CAST(r_total AS DOUBLE))', 10)} AS imp_score
FROM terms CROSS JOIN tot
GROUP BY doc_id, t_total, r_total
"""


@register("dsir_importance_weights", _DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: hash every word bigram into
    {_DSIR_B} buckets (sha-derived — cross-engine identical), build
    target (lang='{_TARGET_LANG}') vs raw bucket frequency tables,
    and score each document by mean_g(p_target(g) - p_raw(g)) — the
    exact-arithmetic surrogate of the DSIR log-likelihood ratio (ln
    is not bit-stable across engines; the difference form preserves
    the ranking signal and is int64/decimal-exact end to end,
    divided once at the end).

    Scale shape: the bucket table is MODEL-SIZED ({_DSIR_B} rows) and
    broadcast to the per-gram join; corpus-side work is one explode +
    one groupBy(doc_id) — the same one-shuffle profile as token
    counting. At 100 TB the int64 products move to DECIMAL(38,0),
    already the sum type here."""
    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(T.shingles(F.col("text"), 2)).alias("gram"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(_DSIR_SALT + ":"), F.col("gram")), 256), 1, 13
            ),
            16,
            10,
        ).cast("long")
        % _DSIR_B
    )
    b = grams.select("doc_id", "lang", bucket.alias("bucket"))
    # r12 (guide §2.3/§2.4): pre-aggregate the gram stream to per-
    # (doc, lang, bucket) COUNTS once. The old shape consumed the raw
    # per-gram stream twice — once under the broadcast stats build and
    # once on the probe side of the join — so the corpus explode +
    # sha256 pipeline (the expensive part: one crypto hash per gram)
    # ran 2x per query. Both consumers below share ``db``'s exchange
    # (the subtrees are canonically identical: every column is a group
    # key, so per-branch pruning cannot differentiate them), and AQE
    # stage reuse materializes the gram pipeline ONCE. The shuffle
    # also shrinks from one row per gram to one row per distinct
    # (doc, bucket) — map-side partial aggregation does the folding.
    # Exact-arithmetic equivalence: sum_g f(bucket_g) per doc
    # == sum_{(doc,bucket)} _c * f(bucket); products are cast to
    # DECIMAL(38,0) BEFORE the _c multiply so the widened form cannot
    # overflow anywhere the old per-gram LONG diff did not.
    db = b.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    stats = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == _TARGET_LANG, F.col("_c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tc"),
        F.sum("_c").cast("long").alias("rc"),
    )
    tot = stats.agg(
        F.sum("tc").cast("long").alias("t_total"),
        F.sum("rc").cast("long").alias("r_total"),
    )
    terms = (
        db.join(F.broadcast(stats), "bucket")
        .crossJoin(F.broadcast(tot))
    )
    num = F.sum(
        (F.col("tc") * F.col("r_total") - F.col("rc") * F.col("t_total")).cast(
            "decimal(38,0)"
        )
        * F.col("_c")
    ).cast("double")
    den = (
        F.sum("_c").cast("double")
        * F.first("t_total").cast("double")
        * F.first("r_total").cast("double")
    )
    return terms.groupBy("doc_id").agg(
        F.sum("_c").cast("long").alias("n_grams"),
        fround(num / den, 10).alias("imp_score"),
    )


# ---------------------------------------------------------------------------
# DSIR selection: pick the top-k most target-like documents
# ---------------------------------------------------------------------------

_DSIR_PICK_K = 100

_DSIR_PICK_ORACLE = f"""
WITH s AS ({_DSIR_ORACLE})
SELECT doc_id, imp_score,
       CAST(row_number() OVER (ORDER BY imp_score DESC, doc_id ASC) AS BIGINT) AS pick_rank
FROM s ORDER BY imp_score DESC, doc_id ASC LIMIT {_DSIR_PICK_K}
"""


@register("dsir_top_selection", _DSIR_PICK_ORACLE)
def dsir_top_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR SELECTION step: keep the {_DSIR_PICK_K} most
    target-like documents by importance weight (deterministic
    tie-break on doc_id) — the fixed-budget draw the paper performs
    after weighting. Global top-k is TakeOrderedAndProject (k rows
    per task ship to the driver-side heap, never a full sort); the
    rank window then runs over the k-row result only."""
    scores = dsir_importance_weights(spark, sf_dir)
    top = scores.orderBy(
        F.col("imp_score").desc(), F.col("doc_id").asc()
    ).limit(_DSIR_PICK_K)
    w = Window.orderBy(F.col("imp_score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id",
        "imp_score",
        F.row_number().over(w).cast("long").alias("pick_rank"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition-rule battery (Rae et al. 2021 §A1.1, second half)
# ---------------------------------------------------------------------------

#: Gopher Table A1 thresholds: a document fails when the most frequent
#: n-gram covers too much of it (boilerplate/template spam) or when too
#: many of its 5-grams repeat (loops, listicles, scraped nav).
_REP_TOP_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
_REP_DUP5_MAX = 0.15

_REP_NS = (2, 3, 4, 5)

_REP_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\\s+') AS ws,
         CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                      x -> len(x))) AS BIGINT) AS nch
  FROM documents
), legs AS (
  SELECT doc_id, nch, n,
         unnest(list_transform(range(0, greatest(len(ws) - n + 1, 0)),
                               i -> array_to_string(ws[i+1:i+n], ' '))) AS g
  FROM m, (VALUES (2), (3), (4), (5)) t(n)
), counts AS (
  SELECT doc_id, n, g,
         CAST(any_value(nch) AS BIGINT) AS nch,
         CAST(count(*) AS BIGINT) AS cnt
  FROM legs GROUP BY doc_id, n, g
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id, n ORDER BY cnt DESC, g DESC) AS rn
  FROM counts
), stats AS (
  SELECT doc_id, n, any_value(nch) AS nch,
         max(CASE WHEN rn = 1 THEN cnt * (len(g) - (n - 1)) END) AS topchars,
         sum(CASE WHEN cnt > 1 THEN cnt * (len(g) - (n - 1)) ELSE 0 END) AS dupchars
  FROM ranked GROUP BY doc_id, n
), piv AS (
  SELECT doc_id,
    least(1.0, CAST(coalesce(max(CASE WHEN n = 2 THEN topchars END), 0) AS DOUBLE)
               / greatest(any_value(nch), 1)) AS f2,
    least(1.0, CAST(coalesce(max(CASE WHEN n = 3 THEN topchars END), 0) AS DOUBLE)
               / greatest(any_value(nch), 1)) AS f3,
    least(1.0, CAST(coalesce(max(CASE WHEN n = 4 THEN topchars END), 0) AS DOUBLE)
               / greatest(any_value(nch), 1)) AS f4,
    least(1.0, CAST(coalesce(max(CASE WHEN n = 5 THEN dupchars END), 0) AS DOUBLE)
               / greatest(any_value(nch), 1)) AS d5
  FROM stats GROUP BY doc_id
)
SELECT d.doc_id,
       {fround_sql('coalesce(p.f2, 0.0)', 6)} AS top2_frac,
       {fround_sql('coalesce(p.f3, 0.0)', 6)} AS top3_frac,
       {fround_sql('coalesce(p.f4, 0.0)', 6)} AS top4_frac,
       {fround_sql('coalesce(p.d5, 0.0)', 6)} AS dup5_frac,
       CAST(CASE WHEN coalesce(p.f2, 0.0) <= {_REP_TOP_MAX[2]}
                  AND coalesce(p.f3, 0.0) <= {_REP_TOP_MAX[3]}
                  AND coalesce(p.f4, 0.0) <= {_REP_TOP_MAX[4]}
                  AND coalesce(p.d5, 0.0) <= {_REP_DUP5_MAX}
             THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM documents d LEFT JOIN piv p USING (doc_id)
"""


@register("gopher_repetition_gate", _REP_ORACLE)
def gopher_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules: per document, the character fraction
    covered by the single most frequent n-gram (n=2,3,4) and by all
    repeated 5-grams, gated at the paper's Table A1 thresholds. The
    char accounting is the cnt*len(gram-chars) proxy (overlaps counted
    per occurrence, capped at 1.0) — defined identically on both
    engines, so the gate is hash-exact.

    Scale shape: ONE generate pass builds all four n-gram streams
    scan-side (HOF transform over the split array, no Python), then a
    single partial-agg shuffle keyed (doc_id, n, gram) — the only
    wide stage and it is count-combinable map-side. The per-(doc, n)
    top-1 is a WindowGroupLimit-size window over the already-reduced
    counts. No stage is O(corpus^2); the explode factor is ~4x the
    token stream, the same cost C4/Gopher's own filters pay."""
    docs = table(spark, sf_dir, "documents")
    ws = T.ws_tokens(F.col("text"))
    nch = F.aggregate(
        F.transform(ws, F.length),
        F.lit(0).cast("long"),
        lambda a, x: a + x.cast("long"),
    )
    base = docs.select("doc_id", ws.alias("ws"), nch.alias("nch"))

    def leg(n: int) -> DataFrame:
        grams = F.when(
            F.size("ws") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - n),
                lambda i: F.concat_ws(" ", F.slice("ws", i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return base.select(
            "doc_id", "nch", F.lit(n).cast("long").alias("n"),
            F.explode(grams).alias("g"),
        )

    legs = leg(2).unionByName(leg(3)).unionByName(leg(4)).unionByName(leg(5))
    counts = legs.groupBy("doc_id", "n", "g").agg(
        F.any_value("nch").alias("nch"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    w = Window.partitionBy("doc_id", "n").orderBy(
        F.col("cnt").desc(), F.col("g").desc()
    )
    gram_chars = (F.length("g") - (F.col("n") - 1)).cast("long")
    stats = (
        counts.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id", "n")
        .agg(
            F.any_value("nch").alias("nch"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt") * gram_chars)).alias(
                "topchars"
            ),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * gram_chars).otherwise(
                    F.lit(0)
                )
            ).alias("dupchars"),
        )
    )
    denom = F.greatest(F.any_value("nch"), F.lit(1))

    def frac(src: Column, n: int) -> Column:
        # coalesce BEFORE least: Spark/DuckDB least() skip NULLs, so a
        # missing n-gram stream (doc shorter than n words) would pin
        # the fraction to 1.0 and wrongly fail every 2-4-word document
        return F.least(
            F.lit(1.0),
            F.coalesce(
                F.max(F.when(F.col("n") == n, src)), F.lit(0)
            ).cast("double")
            / denom,
        )

    piv = stats.groupBy("doc_id").agg(
        frac(F.col("topchars"), 2).alias("f2"),
        frac(F.col("topchars"), 3).alias("f3"),
        frac(F.col("topchars"), 4).alias("f4"),
        frac(F.col("dupchars"), 5).alias("d5"),
    )
    f2 = F.coalesce(F.col("f2"), F.lit(0.0))
    f3 = F.coalesce(F.col("f3"), F.lit(0.0))
    f4 = F.coalesce(F.col("f4"), F.lit(0.0))
    d5 = F.coalesce(F.col("d5"), F.lit(0.0))
    passes = (
        (f2 <= _REP_TOP_MAX[2])
        & (f3 <= _REP_TOP_MAX[3])
        & (f4 <= _REP_TOP_MAX[4])
        & (d5 <= _REP_DUP5_MAX)
    )
    return (
        docs.select("doc_id")
        .join(piv, "doc_id", "left")
        .select(
            "doc_id",
            fround(f2, 6).alias("top2_frac"),
            fround(f3, 6).alias("top3_frac"),
            fround(f4, 6).alias("top4_frac"),
            fround(d5, 6).alias("dup5_frac"),
            F.when(passes, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("passes"),
        )
    )


# ---------------------------------------------------------------------------
# Soft dedup: duplicate-DOWNWEIGHTED token budget (SoftDeDup / D4-style
# alternative to dropping: each exact-dup cluster contributes its token
# mass once, spread 1/cluster_size per member)
# ---------------------------------------------------------------------------

_SOFTDEDUP_ORACLE = """
WITH t AS (
  SELECT doc_id, source, lang, sha256(text) AS sha,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), sz AS (
  SELECT sha, CAST(count(*) AS BIGINT) AS cl_size FROM t GROUP BY sha
), j AS (
  SELECT t.source, t.lang, t.sha, t.n_tokens, sz.cl_size,
         (t.n_tokens * 1000000) // sz.cl_size AS eff_micro
  FROM t JOIN sz USING (sha)
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT sha) AS BIGINT) AS n_unique,
       CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
       CAST(sum(eff_micro) AS BIGINT) AS eff_tokens_micro
FROM j GROUP BY source, lang
"""


@register("softdedup_token_budget", _SOFTDEDUP_ORACLE)
def softdedup_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-DOWNWEIGHTED corpus budget (the SoftDeDup / D4-style
    alternative to hard dropping): every exact-duplicate cluster
    (sha256 of text) contributes its token mass once, spread
    1/cluster_size across members — the per-(source, lang) effective
    token count a mixture planner would feed its sampling weights.
    All-integer arithmetic (micro-token units, integer division) so
    the budget is bit-exact cross-engine: a DOUBLE sum of 1/k weights
    would be partial-agg-order dependent. Scale shape: one
    crypto-uniform shuffle on the digest (sizes), one digest-keyed
    join, one partial-aggregated group-by — no skew risk, no window
    over the corpus."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        "lang",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    sizes = t.groupBy("sha").agg(F.count(F.lit(1)).cast("long").alias("cl_size"))
    j = t.join(sizes, "sha").withColumn(
        "eff_micro", F.expr("(n_tokens * 1000000) div cl_size")
    )
    return j.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("sha").cast("long").alias("n_unique"),
        F.sum("n_tokens").cast("long").alias("raw_tokens"),
        F.sum("eff_micro").cast("long").alias("eff_tokens_micro"),
    )


# ---------------------------------------------------------------------------
# Sequence-length histogram (the packing-planner input: choose
# max_seq_len / packing factor from the length distribution)
# ---------------------------------------------------------------------------

_SEQLEN_ORACLE = """
WITH t AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(length(printf('%b', n_tokens)) - 1 AS INT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens,
       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens
FROM t GROUP BY lang, log2_bucket
"""


@register("seqlen_histogram", _SEQLEN_ORACLE)
def seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sequence-length histogram in log2 buckets
    (integer binary-length log, no libm) with per-bucket token mass —
    the distribution a packing planner reads to pick max_seq_len and
    predict padding/packing efficiency (pack_training_shards consumes
    the lengths this summarizes). One partial-aggregated shuffle of
    (lang, bucket) rows; token counting stays scan-side."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    return t.groupBy(
        "lang",
        (F.length(F.conv(F.col("n_tokens"), 10, 2)) - 1)
        .cast("int")
        .alias("log2_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bucket_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )
