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


# ---------------------------------------------------------------------------
# Committed merge artifact + pure-expression (codegen) merge application
# ---------------------------------------------------------------------------

#: committed default merge table (trained by :func:`train_merges_local`
#: on the deterministic corpus below; provenance pinned by tests).
DEFAULT_MERGES_ARTIFACT = __file__.replace("bpe.py", "bpe_merges_v1.json")

#: deterministic training corpus for the committed artifact — chosen,
#: like the PQ codebook sample, to be independent of any test table so
#: the artifact never goes stale. English-ish high-frequency word mix.
SYNTH_WORDS: list[tuple[str, int]] = [
    ("the", 60), ("then", 12), ("they", 10), ("there", 8),
    ("data", 30), ("date", 9), ("day", 14),
    ("merge", 22), ("merges", 8), ("merged", 7),
    ("join", 25), ("joins", 9), ("joined", 6),
    ("stream", 18), ("streams", 5),
    ("batch", 17), ("batches", 4),
    ("spark", 21), ("sparks", 3),
    ("order", 16), ("orders", 11),
    ("filter", 15), ("filters", 5),
]


def train_merges_local(
    word_freqs: list[tuple[str, int]], n_merges: int = 24
) -> list[list[str]]:
    """Driver-side twin of :func:`train_bpe` over an explicit
    (word, freq) list — same pair counting, same (count desc, pair
    asc) deterministic argmax, no RNG, no Spark. Used to produce the
    committed artifact; a retrain-equality test pins it."""
    vocab = {w: (list(w) + [EOW], n) for w, n in word_freqs}
    merges: list[list[str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        vocab = {
            w: (_merge_word(syms, pair), n) for w, (syms, n) in vocab.items()
        }
        merges.append([pair[0], pair[1]])
    return merges


def load_merges(path: str = DEFAULT_MERGES_ARTIFACT) -> list[list[str]]:
    import json

    with open(path) as fh:
        return json.load(fh)


def _sep_seq(word_col):
    """Word -> double-space-delimited symbol string
    ``"␣␣c1␣␣c2␣␣...␣␣</w>␣␣"``. The DOUBLE delimiter is what makes
    literal ``replace()`` equal left-to-right BPE merging: the
    replacement re-establishes one delimiter on each side, so
    adjacent merge sites stay matchable (single-space delimiters
    would be consumed by the previous match — the classic
    non-overlapping-replace pitfall)."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit("  "),
        F.regexp_replace(word_col, "(.)", "$1  "),
        F.lit(EOW + "  "),
    )


def merge_replace_chain(seq_col, merges: list) -> "Column":
    """Apply the merge table as a chain of literal replaces — pure
    whole-stage-codegen string ops, the scan-side fast path for
    APPLYING a learned tokenizer (training stays in train_bpe /
    train_merges_local). Each merge (a, b) rewrites
    ``"␣a␣␣b␣"`` -> ``"␣ab␣"``; literal replace scans left-to-right
    without overlap, which is exactly `_merge_word`'s semantics."""
    from pyspark.sql import functions as F

    out = seq_col
    for a, b in merges:
        out = F.replace(
            out, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
        )
    return out


def merge_replace_chain_sql(seq_sql: str, merges: list) -> str:
    """DuckDB twin of :func:`merge_replace_chain` (same literal
    chain, same non-overlapping left-to-right replace semantics)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    out = seq_sql
    for a, b in merges:
        out = f"replace({out}, ' {q(a)}  {q(b)} ', ' {q(a)}{q(b)} ')"
    return out
