"""Full-text relevance search queries (BM25 top-k), oracle-checked.

The reference's downstream consumers query an Elasticsearch index with
analyzed ``text`` multifields (src/utils/elasticsearch_settings.md:
78-116) — a tokenized ``match`` with relevance ranking.  These queries
exercise the Spark-side re-expression in
:mod:`dss_nlp_ingestion_spark.operators.fulltext` against a literal
query set over the documents corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.operators.fulltext import (
    BM25_B,
    BM25_K1,
    TOKEN_PATTERN,
    bm25_topk,
)
from dss_nlp_ingestion_spark.plans.registry import register, register_split

#: Literal query set: (query_id, query text) — terms drawn from the
#: synthetic corpus vocabulary so every query matches documents.
FT_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark window agg"),
    (2, "customer query fast"),
    (3, "hash join merge"),
    (4, "stream batch sort"),
    (5, "slow table scan"),
    (6, "vector column data"),
    # Repeated term: its contribution counts TWICE (once per
    # occurrence) in both engines — the repeated-term parity case.
    (7, "join join filter"),
)

_TOP_K = 10

# Constants rendered via repr() so both engines parse the exact same
# doubles (1.2 + 1.0 in binary is NOT the nearest double to 2.2).
_K1 = repr(BM25_K1)
_K1P1 = repr(BM25_K1 + 1.0)
_1MB = repr(1.0 - BM25_B)
_B = repr(BM25_B)

_qvalues = ", ".join(f"({qid}, '{qtext}')" for qid, qtext in FT_QUERIES)
_vocab = sorted({t for _, qtext in FT_QUERIES for t in qtext.lower().split()})
_vocab_sql = ", ".join(f"'{t}'" for t in _vocab)

_FULLTEXT_ORACLE = f"""
WITH q(query_id, qtext) AS (VALUES {_qvalues}),
qt AS (
  SELECT query_id, unnest(string_split(qtext, ' ')) AS tok FROM q
), base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(toks)) AS avgdl FROM base
), tokrows AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, unnest(toks) AS tok FROM base
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
  FROM tokrows WHERE tok IN ({_vocab_sql})
  GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT query_id, doc_id,
    sum(CAST(floor(
      (ln(CAST(1.0 AS DOUBLE) + (n_docs - df + 0.5) / (df + 0.5))
       * ((tf * CAST('{_K1P1}' AS DOUBLE))
          / (tf + CAST('{_K1}' AS DOUBLE)
               * (CAST('{_1MB}' AS DOUBLE)
                  + CAST('{_B}' AS DOUBLE) * dl / avgdl)))
      ) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))) AS score_d
  FROM tf
  JOIN dfreq USING (tok)
  JOIN qt USING (tok)
  CROSS JOIN stats
  GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id, score_d,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_d DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(score_d AS DOUBLE) AS score
FROM ranked WHERE rnk <= {_TOP_K}
"""


@register("fulltext_topk", _FULLTEXT_ORACLE)
def fulltext_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for each of 6 literal multi-term queries
    — the ES ``match``-with-ranking shape.  Query vocabulary is pushed
    into the scan; term stats broadcast; score summed as exact
    decimals of floor-rounded contributions (cross-engine libm
    safety)."""
    docs = table(spark, sf_dir, "documents")
    return bm25_topk(docs, FT_QUERIES, "doc_id", "text", k=_TOP_K)


# ---------------------------------------------------------------------------
# CJK full-text: BM25 over unsegmented Chinese text via cjk_bigram
# tokens (three of the reference's five sources are zh and its ES
# mapping analyzes them, src/utils/elasticsearch_settings.md:78-116 +
# src/lurkers/etnet.py:183-289 — a [a-z0-9]+ analyzer returns ZERO
# hits for those corpora).  Same synthetic-zh construction as the CJK
# dedup family: letter->ideograph translate() with space deleted
# yields real boundary-free text deterministically in both engines.
# ---------------------------------------------------------------------------

from dss_nlp_ingestion_spark.operators.fulltext import (  # noqa: E402
    CJK_RUN_PATTERN,
    analyze_query_cjk,
    text_token_count_cjk,
    text_tokens_cjk,
)
from dss_nlp_ingestion_spark.plans.dedup_queries import _CJK26  # noqa: E402

_A2C = str.maketrans("abcdefghijklmnopqrstuvwxyz", _CJK26, " ")


def _zh(q: str) -> str:
    """A zh query string: the same translate() the corpus CTE applies,
    so query bigrams land in the corpus vocabulary."""
    return q.lower().translate(_A2C)


FT_CJK_QUERIES: tuple[tuple[int, str], ...] = (
    (1, _zh("spark window")),
    (2, _zh("customer query")),
    (3, _zh("hash join")),
    (4, _zh("stream batch")),
    # Mixed-script query: ASCII token + CJK bigrams in one query.
    (5, "2024 " + _zh("vector data")),
)

# Query terms are analyzed ONCE driver-side and inlined as literals in
# BOTH engines — only document tokenization needs a SQL twin.
_cjk_qterms = sorted(
    (qid, t) for qid, qtext in FT_CJK_QUERIES for t in analyze_query_cjk(qtext)
)
_cjk_qvalues = ", ".join(f"({qid}, '{t}')" for qid, t in _cjk_qterms)
_cjk_vocab_sql = ", ".join(f"'{t}'" for t in sorted({t for _, t in _cjk_qterms}))

_CJK_FULLTEXT_ORACLE = f"""
WITH qt(query_id, tok) AS (VALUES {_cjk_qvalues}),
zh AS (
  SELECT doc_id,
         translate(lower(text), 'abcdefghijklmnopqrstuvwxyz ', '{_CJK26}') AS ct
  FROM documents WHERE lang = 'zh'
), runs AS (
  SELECT doc_id, unnest(regexp_extract_all(ct, '{CJK_RUN_PATTERN}')) AS run FROM zh
), tokrows0 AS (
  SELECT doc_id, substr(run, i, 2) AS tok
  FROM (SELECT doc_id, run, unnest(generate_series(1, length(run) - 1)) AS i
        FROM runs WHERE length(run) >= 2)
  UNION ALL
  SELECT doc_id, run AS tok FROM runs WHERE length(run) = 1
  UNION ALL
  SELECT doc_id, unnest(regexp_extract_all(lower(ct), '{TOKEN_PATTERN}')) AS tok
  FROM zh
), dls AS (
  SELECT z.doc_id, CAST(count(t.tok) AS DOUBLE) AS dl
  FROM zh z LEFT JOIN tokrows0 t ON z.doc_id = t.doc_id
  GROUP BY z.doc_id
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dls
), tf AS (
  SELECT t.doc_id, t.tok, CAST(count(*) AS DOUBLE) AS tf, max(d.dl) AS dl
  FROM tokrows0 t JOIN dls d ON t.doc_id = d.doc_id
  WHERE t.tok IN ({_cjk_vocab_sql})
  GROUP BY t.doc_id, t.tok
), dfreq AS (
  SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT query_id, doc_id,
    sum(CAST(floor(
      (ln(CAST(1.0 AS DOUBLE) + (n_docs - df + 0.5) / (df + 0.5))
       * ((tf * CAST('{_K1P1}' AS DOUBLE))
          / (tf + CAST('{_K1}' AS DOUBLE)
               * (CAST('{_1MB}' AS DOUBLE)
                  + CAST('{_B}' AS DOUBLE) * dl / avgdl)))
      ) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))) AS score_d
  FROM tf
  JOIN dfreq USING (tok)
  JOIN qt USING (tok)
  CROSS JOIN stats
  GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id, score_d,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_d DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(score_d AS DOUBLE) AS score
FROM ranked WHERE rnk <= {_TOP_K}
"""


@register("fulltext_topk_cjk", _CJK_FULLTEXT_ORACLE)
def fulltext_topk_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over the unsegmented zh corpus with CJK-bigram
    analysis — same posting pipeline as :func:`fulltext_topk`, only
    the analyzer pair changes (``text_tokens_cjk`` scan-side,
    ``analyze_query_cjk`` for the literal query set). One query mixes
    an ASCII year token with CJK bigrams to cover the multi-script
    path."""
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "zh")
    zh = docs.select(
        "doc_id",
        F.translate(
            F.lower(F.col("text")), "abcdefghijklmnopqrstuvwxyz ", _CJK26
        ).alias("ct"),
    )
    return bm25_topk(
        zh,
        FT_CJK_QUERIES,
        "doc_id",
        "ct",
        k=_TOP_K,
        tokenizer=text_tokens_cjk,
        query_tokenizer=analyze_query_cjk,
        token_counter=text_token_count_cjk,
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + vector ANN fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60        # standard RRF damping constant
_RRF_TOP = 10
_VEC_K = 10

from dss_nlp_ingestion_spark.plans.similarity_queries import _dot_sql  # noqa: E402

_HY_QIDS = ", ".join(str(qid) for qid, _ in FT_QUERIES)

_VEC_LEG_SQL = f"""
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_dot_sql('q.embedding', 'c.embedding')}
                      / (sqrt({_dot_sql('q.embedding', 'q.embedding')})
                         * sqrt({_dot_sql('c.embedding', 'c.embedding')})) DESC,
                      c.vec_id ASC) AS rank
    FROM embeddings c
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id IN ({_HY_QIDS})) q
    WHERE c.vec_id <> q.vec_id
  ) WHERE rank <= {_VEC_K}
"""

_HYBRID_ORACLE = f"""
WITH text_leg AS ({_FULLTEXT_ORACLE}),
vec_leg AS ({_VEC_LEG_SQL}),
fused AS (
  SELECT coalesce(t.query_id, v.query_id) AS query_id,
         coalesce(t.doc_id, v.neighbor_id) AS doc_id,
         coalesce(1.0 / ({_RRF_K} + t.rank), 0.0)
           + coalesce(1.0 / ({_RRF_K} + v.rank), 0.0) AS rrf
  FROM text_leg t
  FULL OUTER JOIN vec_leg v
    ON v.query_id = t.query_id AND v.neighbor_id = t.doc_id
), ranked AS (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(floor(rrf * 100000000.0 + 0.5) / 100000000.0 AS DOUBLE) AS rrf
FROM ranked WHERE rank <= {_RRF_TOP}
"""


@register("hybrid_rrf_retrieval", _HYBRID_ORACLE)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern hybrid retrieval, end to end IN the engine: a lexical
    leg (BM25 top-10, the ES match shape) and a dense leg (cosine
    top-10 over the embeddings of the same query ids) fused with
    reciprocal-rank fusion 1/(60+rank) — the standard zero-tuning
    hybrid ranker (Cormack et al. 2009; what ES/Vespa/Weaviate call
    RRF). Fusion consumes only the INTEGER ranks of two k-bounded
    lists, so the fused score is deterministic by construction and
    the whole pipeline hash-checks. Per-query cost: two k-row lists,
    one full-outer join on (query, doc), one window over <= 2k rows —
    at 100 TB the corpus-sized work stays inside the two legs (term-
    pushdown scan; scan-side dense scoring), never in the fusion."""
    from dss_nlp_ingestion_spark.operators.similarity import brute_force_topk
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    qids = [qid for qid, _ in FT_QUERIES]

    text_leg = bm25_topk(docs, FT_QUERIES, "doc_id", "text", k=_TOP_K).select(
        F.col("query_id").alias("t_q"),
        F.col("doc_id").alias("t_d"),
        F.col("rank").alias("t_rank"),
    )
    vec_leg = brute_force_topk(
        emb, emb.filter(F.col("vec_id").isin(qids)), "vec_id", "embedding", k=_VEC_K
    ).select(
        F.col("query_id").alias("v_q"),
        F.col("neighbor_id").alias("v_d"),
        F.col("rank").alias("v_rank"),
    )
    fused = text_leg.join(
        vec_leg,
        (F.col("v_q") == F.col("t_q")) & (F.col("v_d") == F.col("t_d")),
        "full_outer",
    ).select(
        F.coalesce(F.col("t_q"), F.col("v_q")).alias("query_id"),
        F.coalesce(F.col("t_d"), F.col("v_d")).alias("doc_id"),
        (
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("t_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("v_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _RRF_TOP)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.floor(F.col("rrf") * 1e8 + F.lit(0.5)) / 1e8)
            .cast("double")
            .alias("rrf"),
        )
    )


# ---------------------------------------------------------------------------
# Positional-index phrase query
# ---------------------------------------------------------------------------

from dss_nlp_ingestion_spark.operators.fulltext import phrase_occurrences  # noqa: E402

_PHRASE = ("slow", "hash", "batch")

_PHRASE_ORACLE = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
), occ AS (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(ws) - 1),
              i -> ws[i] = 'slow' AND ws[i+1] = 'hash' AND ws[i+2] = 'batch'))
           AS BIGINT) AS n_occurrences
  FROM w WHERE len(ws) >= 3
)
SELECT doc_id, n_occurrences FROM occ WHERE n_occurrences > 0
"""


@register("phrase_match_positional", _PHRASE_ORACLE)
def phrase_match_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query ("slow hash batch") through the positional
    inverted index (operators/fulltext.py:phrase_occurrences) — the
    ES match_phrase shape of the reference's consumer query surface.
    Postings are term-filtered before any join, so only
    index-entry-sized streams shuffle; the oracle replays the
    position arithmetic with list HOFs."""
    docs = table(spark, sf_dir, "documents")
    return phrase_occurrences(docs, "doc_id", "text", _PHRASE)


# ---------------------------------------------------------------------------
# Inverted-index term stats as an incrementally-maintained matview
# ---------------------------------------------------------------------------

_FT_IVM_ORACLE = r"""
WITH live AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
), toks AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM live
)
SELECT token, CAST(count(*) AS BIGINT) AS df
FROM toks GROUP BY token
"""


def _ftivm_setup(spark: SparkSession, sf_dir: str):
    """SETUP: the postings ACID table (80% of the corpus), the
    term-df matview's initial build, and the churn (APPEND the
    remaining 20%, DELETE doc_id % 17 = 0) the refresh folds."""
    import tempfile

    from dss_nlp_ingestion_spark.sources import matview, txlog

    docs = table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("token"),
    )
    base = tempfile.mkdtemp(prefix="dss_ftivm_")
    src, view = base + "/postings", base + "/term_df"
    txlog.create_table(
        postings.filter(F.col("doc_id") % 10 < 8).repartition(4, "token"),
        src,
        stats_cols=["doc_id"],
    )
    matview.create_matview(spark, src, view, ["token"], {"df": ("count", None)})
    txlog.append(postings.filter(F.col("doc_id") % 10 >= 8), src)
    txlog.delete_from_table(spark, src, "doc_id % 17 = 0", stats_cols=["doc_id"])
    return src, view


def _ftivm_probe(spark: SparkSession, ctx) -> DataFrame:
    """PROBE — an inverted-index TERM-STATS table maintained
    INCREMENTALLY as a materialized view over an ACID postings table:
    ONE refresh folds the net changes (CDF delta fold, join against
    touched terms only, file-pruned merge, watermarked exactly-once;
    sources/matview.py) instead of recomputing the corpus. The
    oracle recomputes df from the FINAL live doc set, so the hash
    match proves delta-maintained == recomputed through appends AND
    deletes — the search-index-refresh story."""
    from dss_nlp_ingestion_spark.sources import matview, txlog

    src, view = ctx
    matview.refresh_matview(spark, src, view, ["token"], {"df": ("count", None)})
    return txlog.read(spark, view).select("token", "df")


register_split(
    "fulltext_index_incremental", _ftivm_setup, _ftivm_probe, _FT_IVM_ORACLE
)
