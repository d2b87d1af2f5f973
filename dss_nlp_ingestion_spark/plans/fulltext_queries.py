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

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.operators.fulltext import (
    BM25_B,
    BM25_K1,
    TOKEN_PATTERN,
    bm25_topk,
)
from dss_nlp_ingestion_spark.plans.registry import register

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
