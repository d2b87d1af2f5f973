"""Byte-pair-encoding tokenizer training — distributed pair counts.

The LLM-pipeline step the reference has no analog for: learning a
subword vocabulary from a corpus (Sennrich et al. 2016). The
expensive part of BPE training is counting adjacent symbol pairs
over the whole corpus — here that is a Spark aggregation per merge
step (explode pairs -> groupBy -> sum, weighted by word frequency),
so training scales with the cluster while the merge DECISION (a
1-row argmax) is driver-side, like the IVF centroid parameters.

Corpus-size note: pair counting runs over the DISTINCT-WORD table
(word, n) — at 100 TB the distinct vocabulary is orders of magnitude
smaller than the corpus, and that first groupBy(word) is the only
full-corpus shuffle; every merge iteration after it touches only the
vocabulary table (cached).

Merge application inside a word is inherently sequential (symbols
merge left-to-right), so it runs as an Arrow-batched pandas stage —
the documented slow path, bounded per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

#: end-of-word marker (classic BPE: lets merges distinguish suffixes).
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) vocabulary table — the ONE full-corpus shuffle."""
    words = df.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n"))


def _merge_word(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """Apply one merge to a symbol sequence, left-to-right."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


_SYMS_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("n", LongType()),
        StructField("syms", ArrayType(StringType())),
    ]
)


def _apply_merges_batch(merges: list[tuple[str, str]]):
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            syms_col = []
            for w in pdf["word"]:
                syms = list(w) + [EOW]
                for pair in merges:
                    syms = _merge_word(syms, pair)
                syms_col.append(syms)
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": syms_col}
            )

    return _run


def symbolize(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, n, syms): each word's symbol sequence after ``merges``
    (chars + end-of-word marker, merged in learned order) — Arrow
    stage over the vocabulary table only."""
    return vocab.mapInPandas(_apply_merges_batch(merges), schema=_SYMS_SCHEMA)


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: the
    distributed heart of a BPE step. Pure higher-order array ops
    before the groupBy — no Python in the counting path."""
    pairs = symbolized.select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("n").alias("total")
    )


def train_bpe(df: DataFrame, text_col: str = "text", n_merges: int = 10) -> list:
    """Learn ``n_merges`` BPE merges: per step, count pairs
    distributed, pick the (count desc, pair asc) argmax — the
    deterministic tie-break makes training reproducible across
    cluster layouts. Returns the ordered merge list."""
    vocab = word_counts(df, text_col).cache()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                pair_counts(symbolize(vocab, merges))
                .orderBy(F.col("total").desc(), F.col("a"), F.col("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["total"] < 2:
                break
            merges.append((top[0]["a"], top[0]["b"]))
    finally:
        vocab.unpersist()
    return merges


def tokenize(df: DataFrame, merges: list, text_col: str = "text") -> DataFrame:
    """Apply a learned merge table to full documents: per-word symbol
    merge in an Arrow stage, tokens joined back in word order."""
    vocabish = df.select(
        F.col("doc_id"),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = []
            for w in pdf["word"]:
                syms = list(w) + [EOW]
                for pair in merges:
                    syms = _merge_word(syms, pair)
                toks.append(syms)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "pos": pdf["pos"].astype("int64"),
                    "toks": toks,
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", LongType()),
            StructField("toks", ArrayType(StringType())),
        ]
    )
    return vocabish.mapInPandas(_run, schema=schema)
