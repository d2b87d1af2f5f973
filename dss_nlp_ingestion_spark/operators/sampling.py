"""Deterministic sampling, dataset splitting, distinct-count sketching,
and training-shard packing — the corpus-assembly operators a
large-scale training-data pipeline runs after cleaning/dedup.

The reference pipeline ends at an indexed document store; assembling a
training corpus from it additionally needs (a) reproducible sampling
(rate changes must not reshuffle previously-sampled membership), (b)
train/valid/test splits that are a pure function of the document key,
(c) cheap distinct-cardinality estimates (vocabulary size, unique
users) without a full distinct shuffle of the raw keys, and (d)
packing documents into fixed-token-budget shards.

Determinism contract: every operator here derives randomness from
``sha2(salt || ':' || key)`` — a pure column function, so membership
is reproducible across runs, engines, partitionings, and scale
factors (no ``rand()``, no partition-dependent RNG seeds, unlike
``DataFrame.sample`` whose output depends on the physical split).

Scale notes per operator are on the docstrings; the common theme is
that sampling/splitting are scan-side filters (no shuffle at all),
the KMV sketch shuffles once on the group key, and shard packing is a
two-level distributed prefix sum whose only global step is over the
tiny per-range totals table.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 13 hex chars = 52 bits — the largest hash prefix that converts to
#: an EXACT double (IEEE mantissa is 53 bits), so the derived uniform
#: fraction is bit-identical in any engine that parses the same hex.
HASH_HEX_CHARS = 13
HASH_DENOM = float(1 << (4 * HASH_HEX_CHARS))


def hash_fraction(key: Column, salt: str) -> Column:
    """Uniform-[0,1) fraction derived deterministically from ``key``:
    first 52 bits of ``sha2(salt || ':' || key)`` over 2^52.

    The salt namespaces independent decisions (sample membership vs
    split assignment must be uncorrelated). Pure projection — stays
    inside whole-stage codegen, no shuffle, no state."""
    h = F.sha2(F.concat_ws(":", F.lit(salt), key.cast("string")), 256)
    n = F.conv(F.substring(h, 1, HASH_HEX_CHARS), 16, 10).cast("long")
    return (n / F.lit(HASH_DENOM)).cast("double")


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose hash fraction of ``key_col`` is below ``rate``.

    Reproducible Bernoulli sampling: membership is a function of the
    key alone, so raising the rate strictly grows the sample (nested
    samples — the property curriculum/ablation reruns rely on).
    Scan-side filter: the predicate is a plain column expression, so
    at 100 TB this is a full scan but ZERO shuffle, and Catalyst
    prunes to just the key column when downstream allows."""
    return df.filter(hash_fraction(F.col(key_col), salt) < F.lit(float(rate)))


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label each row train/valid/test (any names) by cumulative
    weight thresholds over the key's hash fraction.

    A row's split never changes when data is added or repartitioned —
    the invariant that keeps eval sets leak-free across pipeline
    reruns. Pure projection, no shuffle."""
    total = float(sum(weights.values()))
    frac = hash_fraction(F.col(key_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += float(weights[name]) / total
        branch = F.when(frac < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(frac < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum Bernoulli rates — the domain-mix rebalancing step
    (e.g. upsample low-resource languages, downsample boilerplate
    sources). ``rates`` maps stratum value -> keep probability;
    unlisted strata fall back to ``default_rate``.

    The rate table is folded into a CASE expression (strata maps are
    config-sized), so like :func:`deterministic_sample` this is a
    shuffle-free scan-side filter at any scale."""
    rate: Column = F.lit(float(default_rate))
    expr = None
    for value, r in rates.items():
        branch_cond = F.col(strata_col) == F.lit(value)
        if expr is None:
            expr = F.when(branch_cond, F.lit(float(r)))
        else:
            expr = expr.when(branch_cond, F.lit(float(r)))
    if expr is not None:
        rate = expr.otherwise(rate)
    return df.filter(hash_fraction(F.col(key_col), salt) < rate)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group distinct-count estimate via the K-Minimum-Values
    sketch: with the k-th smallest of the distinct keys' hash
    fractions ``h_k``, estimate ``(k-1) / h_k``; groups with fewer
    than ``k`` distinct keys report the exact count.

    Unlike ``approx_count_distinct`` (HLL — engine-specific register
    layout, not reproducible cross-engine), KMV over a deterministic
    hash gives the SAME estimate in any engine, so it is oracle-
    checkable while keeping the sketch property that matters at
    100 TB: after the initial distinct, each group contributes at most
    ``k`` surviving values, and the bottom-k pass is rank-limit
    pushdown-able (WindowGroupLimit) instead of a full sort. Output:
    (*group_cols, n_exact BIGINT, n_est DOUBLE).

    ``n_exact`` counts distinct hash fractions (= distinct keys up to
    52-bit hash collision, identically in every engine)."""
    groups = [F.col(c) for c in group_cols]
    fracs = (
        df.select(*groups, F.col(key_col).alias("_k"))
        .distinct()
        .select(*group_cols, hash_fraction(F.col("_k"), salt).alias("_frac"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_frac").asc())
    ranked = fracs.withColumn("_rn", F.row_number().over(w))
    # groupBy on the window's partition keys: the exchange introduced
    # by the window is reused, so the sketch costs one shuffle total.
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.max(F.when(F.col("_rn") == k, F.col("_frac"))).alias("_kth"),
    )
    est = F.when(
        F.col("_kth").isNotNull(), F.lit(float(k - 1)) / F.col("_kth")
    ).otherwise(F.col("n_exact").cast("double"))
    return agg.select(*group_cols, "n_exact", est.alias("n_est"))


def pack_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    range_size: int,
) -> DataFrame:
    """Assign each row a training-shard id so that consecutive rows
    (in ``order_col`` order) accumulate into shards of ~``budget``
    total ``weight_col`` (token budget packing): shard id =
    floor(prefix_sum_before_row / budget).

    A naive global running sum is a single-partition window — the
    classic scale trap. This is the two-level distributed prefix sum
    instead: rows are bucketed into key ranges of ``range_size``
    (range id = order_col / range_size), each range computes its local
    running sum in parallel (window partitioned BY range), and only
    the per-range TOTALS — one row per range, millions of times
    smaller than the data — go through the small global cumulative
    window, then broadcast-join back as offsets. Weights must be
    integral (exact longs) so the two-level sum is bit-equal to the
    global one."""
    rng = (F.floor(F.col(order_col) / F.lit(range_size))).cast("long").alias("_rng")
    rows = df.select(
        F.col(order_col), F.col(weight_col).cast("long").alias("_w"), rng
    )
    in_range = Window.partitionBy("_rng").orderBy(F.col(order_col).asc())
    local = rows.withColumn(
        "_before",
        F.coalesce(
            F.sum("_w").over(in_range.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    )
    totals = rows.groupBy("_rng").agg(F.sum("_w").alias("_tot"))
    # Global scan over per-range totals only: one row per range — a
    # catalog-sized table, so the unpartitioned window is safe.
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy(F.col("_rng").asc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_rng", "_off")
    packed = local.join(F.broadcast(offsets), "_rng")
    return packed.select(
        F.col(order_col),
        F.col("_w").alias("n_tokens"),
        F.floor((F.col("_off") + F.col("_before")) / F.lit(budget))
        .cast("long")
        .alias("shard_id"),
    )


def global_start_offsets(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    range_size: int,
) -> DataFrame:
    """(order_col, _w, _start): each row's exclusive global prefix sum
    of ``weight_col`` in ``order_col`` order — the same two-level
    distributed prefix sum as :func:`pack_shards` (local in-range
    running sums in parallel; only per-range totals cross the global
    window), exposed for other packers."""
    rng = (F.floor(F.col(order_col) / F.lit(range_size))).cast("long").alias("_rng")
    rows = df.select(
        F.col(order_col), F.col(weight_col).cast("long").alias("_w"), rng
    )
    in_range = Window.partitionBy("_rng").orderBy(F.col(order_col).asc())
    local = rows.withColumn(
        "_before",
        F.coalesce(
            F.sum("_w").over(in_range.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    )
    totals = rows.groupBy("_rng").agg(F.sum("_w").alias("_tot"))
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy(F.col("_rng").asc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_rng", "_off")
    return local.join(F.broadcast(offsets), "_rng").select(
        F.col(order_col),
        F.col("_w"),
        (F.col("_off") + F.col("_before")).alias("_start"),
    )


def pack_fixed_sequences(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    seq_len: int,
    range_size: int,
) -> DataFrame:
    """Fixed-length sequence packing manifest — the LLM-pretraining
    data-prep step: documents are concatenated into one token stream
    (in ``order_col`` order) and cut into back-to-back sequences of
    exactly ``seq_len`` tokens; each output row maps a document to
    one sequence it overlaps, with the overlap size:
    ``(order_col, n_tokens, seq_id, tok_in_seq)``.

    Built on the two-level prefix sum (no global single-partition
    window); the per-document explode spans
    ``ceil(n_tokens / seq_len) + 1`` sequences — bounded fan-out, so
    the manifest is O(tokens / seq_len + docs) rows. Zero-token
    documents contribute nothing. With the manifest, shard writers
    read only their sequences' documents — the packing DECISION is
    decoupled from the (heavy) token materialization."""
    offs = global_start_offsets(df, order_col, weight_col, range_size)
    first = F.floor(F.col("_start") / F.lit(seq_len)).cast("long")
    last = F.floor((F.col("_start") + F.col("_w") - 1) / F.lit(seq_len)).cast(
        "long"
    )
    spans = offs.filter(F.col("_w") > 0).select(
        F.col(order_col),
        F.col("_w"),
        F.col("_start"),
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    lo = F.greatest(F.col("_start"), F.col("seq_id") * F.lit(seq_len))
    hi = F.least(
        F.col("_start") + F.col("_w"), (F.col("seq_id") + 1) * F.lit(seq_len)
    )
    return spans.select(
        F.col(order_col),
        F.col("_w").alias("n_tokens"),
        "seq_id",
        (hi - lo).cast("long").alias("tok_in_seq"),
    )


def hash_order_key(key: Column, salt: str) -> Column:
    """52-bit integer from ``sha2(salt || ':' || key)`` — the same
    bits :func:`hash_fraction` uses, kept as an exact BIGINT for
    deterministic ORDERING (a reproducible global pseudo-shuffle
    without an RNG: sorting by this key is an engine-independent
    random permutation of the rows)."""
    h = F.sha2(F.concat_ws(":", F.lit(salt), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, HASH_HEX_CHARS), 16, 10).cast("long")


def weighted_systematic_picks(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsys",
    range_size: int = 1 << 44,
) -> DataFrame:
    """Weighted systematic resampling: draw ``n`` picks where each
    row's expected pick count is exactly ``n * w / total`` — the
    corpus-mixing primitive behind temperature/domain re-weighting
    (rows heavier than one stride get MULTIPLE picks, i.e. epochs).

    Deterministic construction instead of an RNG: rows are laid on a
    weight axis in :func:`hash_order_key` order (a reproducible
    pseudo-shuffle, tie-broken by the key) and a comb of ``n``
    equally-spaced teeth — tooth i at ``floor(i * total / n)`` — is
    dropped on it; a row's picks = teeth landing in its interval
    ``[start, start + w)``, computed as
    ``(start+w)*n div total - start*n div total`` in pure BIGINT
    arithmetic (exact in any engine; variance-free: systematic
    sampling's pick counts never deviate from the expectation by
    more than 1).

    Scale: the exclusive prefix sum is the same two-level
    decomposition as :func:`pack_shards` — per-range local windows in
    parallel, only the per-range totals (data-size-independent) cross
    the global window — and the grand total joins back as a broadcast
    scalar, so nothing single-partition ever sees the data. Weights
    must be integral; at scales where ``total * n`` would overflow 63
    bits, pre-scale ``n`` down or widen to DECIMAL(38,0) on both
    engines."""
    keyed = df.select(
        F.col(key_col),
        F.col(weight_col).cast("long").alias("_w"),
        hash_order_key(F.col(key_col), salt).alias("_okey"),
    ).withColumn("_rng", (F.floor(F.col("_okey") / F.lit(range_size))).cast("long"))
    in_range = Window.partitionBy("_rng").orderBy(
        F.col("_okey").asc(), F.col(key_col).asc()
    )
    local = keyed.withColumn(
        "_before",
        F.coalesce(
            F.sum("_w").over(in_range.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    )
    totals = keyed.groupBy("_rng").agg(F.sum("_w").alias("_tot"))
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy(F.col("_rng").asc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_rng", "_off")
    grand = keyed.agg(F.sum("_w").cast("long").alias("_total"))
    placed = (
        local.join(F.broadcast(offsets), "_rng")
        .withColumn("_start", F.col("_off") + F.col("_before"))
        .crossJoin(F.broadcast(grand))
    )
    n_picks = F.expr(
        f"((_start + _w) * CAST({int(n)} AS BIGINT)) div _total"
        f" - (_start * CAST({int(n)} AS BIGINT)) div _total"
    ).cast("long")
    return (
        placed.withColumn("_np", n_picks)
        .filter(F.col("_np") > 0)
        .select(
            F.col(key_col),
            F.col("_w").alias("weight"),
            F.col("_np").alias("n_picks"),
        )
    )
