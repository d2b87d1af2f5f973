"""Exact heavy hitters at scale: per-partition Misra-Gries candidate
generation, then one exact counting pass restricted to the candidates.

Why not just ``groupBy(key).count()`` + HAVING? That works, but the
shuffle carries one row per DISTINCT key — at 100 TB with billions of
distinct keys the aggregate itself is the bottleneck when all you
want is the handful of keys above a frequency threshold. The classic
two-pass scheme bounds the shuffle by the candidate set instead:

1. **Candidates** (mapInPandas, one scan, zero shuffle): each
   partition keeps a Misra-Gries summary of ``counters`` entries.
   MG guarantees any item with local count > n_p/(counters+1)
   survives; by pigeonhole, an item with GLOBAL count > n/k has
   local count > n_p/k on at least one partition, so with
   ``counters >= k`` the union of partition candidates is a SUPERSET
   of the true heavy hitters. The union is at most
   ``counters * n_partitions`` keys — driver-independent, tiny.
2. **Exact verify** (one scan + one candidate-sized shuffle): semi
   join the input on the broadcast candidates, count exactly, keep
   ``cnt * k > n``. False candidates die here, so the output is
   EXACT and deterministic regardless of partitioning.

Reference parity: frequency gating appears in the reference as the
per-source scrape budget (src/base.py task batching); the operator
generalizes it to data-driven hot-key discovery (skew diagnosis,
vocabulary capping, boilerplate detection).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(key: str, counters: int, dtype: str):
    """Partition-wise Misra-Gries summary over Arrow batches.

    ``dtype`` is the pandas dtype of the key as DECIDED by the
    caller's type check — it must not be sniffed from observed
    batches, because an EMPTY partition sees no batch at all and a
    wrong empty-Series dtype fails Arrow conversion against the
    declared schema (r6 review finding, reproduced on string keys
    with any empty input partition)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            # NULL keys must never become candidates (documented
            # semantics: they count toward n, are never reported).
            # Arrow hands integral-with-NULL columns over as float64
            # with NaN; value_counts() drops NaN by default, and the
            # explicit dropna() pins that contract against a future
            # dropna=False default or dtype change rather than
            # fixing a live bug.
            for v, c in pdf[key].dropna().value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > counters:
                # Standard MG summary merge: subtract the
                # (counters+1)-th largest count from everyone and
                # drop the non-positive — keeps the additive-error
                # guarantee (error <= n_p/(counters+1)).
                vals = sorted(counts.values(), reverse=True)
                thresh = vals[counters]
                counts = {v: c - thresh for v, c in counts.items() if c > thresh}
        yield pd.DataFrame({key: pd.Series(list(counts), dtype=dtype)})

    return gen


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int, counters: int | None = None
) -> DataFrame:
    """All ``key_col`` values with frequency strictly above n/k, with
    their EXACT counts: (key, cnt BIGINT, n BIGINT).

    ``counters`` (default ``2 * k``) is the per-partition summary
    size; any value >= k preserves the no-false-negative guarantee,
    and the margin keeps candidate counts low even under adversarial
    batch boundaries. Integer threshold arithmetic (``cnt * k > n``)
    so the cut is bit-exact across engines.

    Supported key types: integral (served as BIGINT) and STRING
    (served natively). Anything else raises ``TypeError`` up front —
    the old behavior silently cast to long, so string keys became
    NULL and the result was silently empty (r5 advisor finding).
    NULL keys count toward ``n`` but are never reported as hitters
    (SQL GROUP BY would report them; callers needing that should
    fill NULLs with a sentinel first).
    """
    from pyspark.sql import types as T

    m = counters if counters is not None else 2 * k
    if m < k:
        raise ValueError(f"counters ({m}) must be >= k ({k})")
    kind = df.schema[key_col].dataType
    if isinstance(kind, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        keyed = df.select(F.col(key_col).cast("long").alias(key_col))
        key_ddl, pd_dtype = f"{key_col} long", "int64"
    elif isinstance(kind, T.StringType):
        keyed = df.select(key_col)
        key_ddl, pd_dtype = f"{key_col} string", "object"
    else:
        raise TypeError(
            f"heavy_hitters_exact: unsupported key type {kind.simpleString()} "
            f"for {key_col!r} (integral or string required)"
        )
    candidates = (
        keyed.mapInPandas(_mg_candidates(key_col, m, pd_dtype), schema=key_ddl)
        .distinct()
    )
    totals = keyed.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        keyed.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(key_col, "cnt", "n")
    )
