"""Substring-level exact deduplication — the distributed analogue of
suffix-array training-data dedup (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022): find every k-token
span that occurs verbatim in more than one document and report, per
document, how much of it is duplicated text.

Why not a suffix array: the published single-node algorithm builds a
suffix array over the concatenated corpus — O(corpus) memory on one
machine, a non-starter at 100 TB. The distributed re-expression is a
POSTING-LIST shuffle, the same shape Spark already executes well:

1. tokenize each document (scan-side, codegen'd split/filter);
2. emit every k-token shingle with its start position
   (``transform(sequence(...))`` + ``explode`` — one pass, no UDF);
3. key shingles by ``sha2(shingle, 256)`` — a fixed 64-byte shuffle
   key instead of arbitrary-length text (DuckDB computes the
   identical digest, so the oracle can replay the exact pipeline);
4. one groupBy finds hashes seen in >= 2 distinct documents
   (map-side partial counts first, so singleton shingles — the vast
   majority — never cross the wire at full fan-out);
5. join survivors back (broadcast when small), explode each
   duplicated span into its covered token positions, and count
   DISTINCT covered positions per document — overlapping spans are
   not double-counted, exactly the interval-union the suffix-array
   method computes.

Reference parity: the reference dedups whole articles by one exact
hash (src/base.py:210-218, sha224 of the unique identifier); this
operator extends that to WITHIN-document granularity, which whole-doc
MinHash/SimHash cannot see (a 95%-unique page quoting one viral
paragraph).

Scale notes: the only super-linear risk is a shingle shared by a huge
number of documents (boilerplate). ``max_df`` caps the posting list —
beyond-cap shingles are STILL flagged duplicated (their per-doc cover
contribution is what matters, and every occurrence is covered), but
the pair fan-out join is bounded because step 5 joins on the hash,
never doc x doc. Memory per task is O(one document's shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default duplicated-span length in tokens. The paper uses 50-token
#: spans on BPE tokens; the synthetic corpus' documents are short, so
#: tests/queries use a smaller k — the pipeline is k-agnostic.
DEFAULT_K = 7

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercase, split on non-alphanumeric runs, drop empties —
    pure codegen expressions, replayable verbatim in the oracle via
    ``regexp_split_to_array``/``list_filter``."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda x: x != ""
    )
    return df.withColumn("_toks", toks).withColumn(
        "n_tokens", F.size("_toks").cast("long")
    )


def shingle_postings(
    df: DataFrame, id_col: str = "doc_id", k: int = DEFAULT_K
) -> DataFrame:
    """(id, pos, h): every k-token shingle start position with its
    sha256 key. One scan, one explode; no shuffle yet."""
    # Spark's sequence(1, 0) yields a DESCENDING [1, 0] rather than an
    # empty array, so documents shorter than k need an explicit guard.
    starts = F.when(
        F.size("_toks") >= k, F.sequence(F.lit(1), F.size("_toks") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("pos"),
            F.sha2(F.array_join(F.slice("_toks", i, k), " "), 256).alias("h"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(spans).alias("s"))
        .select("id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )


def duplicated_span_fractions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_docs: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Per-document duplicated-substring report:
    ``(doc_id, n_tokens, dup_tokens, dup_fraction)`` where
    ``dup_tokens`` is the size of the union of all k-token spans whose
    content appears in at least ``min_docs`` distinct documents.

    Plan: tokenize -> shingle postings -> one hash-keyed aggregate
    (distinct-doc count per shingle, map-side partials) -> join
    survivors -> positional explode -> distinct-position count per
    doc -> left join back onto the full doc list (documents shorter
    than k tokens report 0). Three shuffles total, all on bounded
    keys; nothing is ever collected to the driver.
    """
    toks = tokenize(docs, text_col).select(
        F.col(id_col).alias("id"), "n_tokens", "_toks"
    )
    sh = shingle_postings(toks, "id", k)
    df_counts = sh.groupBy("h").agg(
        F.countDistinct("id").alias("_ndocs"), F.count("*").alias("_df")
    )
    dup = df_counts.filter(F.col("_ndocs") >= min_docs)
    if max_df is not None:
        dup = dup.filter(F.col("_df") <= max_df)
    covered = (
        sh.join(dup.select("h"), "h")
        .select("id", F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("p"))
        .groupBy("id")
        .agg(F.countDistinct("p").alias("dup_tokens"))
    )
    return (
        toks.drop("_toks")
        .join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(F.col("n_tokens") > 0, F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"))
            .otherwise(F.lit(0.0))
            .alias("_frac"),
        )
    )
