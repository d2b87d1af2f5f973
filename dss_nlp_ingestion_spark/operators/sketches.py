"""Distributed sketches — HyperLogLog cardinality estimation.

``approx_count_distinct`` exists in both Spark and DuckDB but their
sketches differ (different hashes, different bias tables), so the
built-ins can never hash-match across engines. This module builds
HLL **deterministically from sha256**, which both engines compute
identically, so the ENTIRE sketch — registers and estimate — sits
under the oracle gate like any exact query:

- hash: first 16 hex chars of sha256(key); bucket = first ``p_hex``
  nibbles, rho = leading-zero bits of the remaining nibble stream
  + 1 (computed by nibble scan — pure string/integer ops, identical
  in ANSI SQL);
- registers: ``groupBy(bucket).max(rho)`` — ONE shuffle of at most
  m rows regardless of input size, the whole point of a sketch at
  100 TB (the exact count's shuffle is O(distinct keys));
- estimate: the standard HLL-with-corrections formula. Register
  values are capped at 28 so the harmonic-mean terms 2^-M are exact
  DECIMAL(38,28) values — the register sum is order-independent and
  bit-identical cross-engine; only the final constant multiply /
  log correction are float (same IEEE expression tree both sides).

Flajolet et al.'s constants (alpha_m, the 2.5m linear-counting
threshold) are the published ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: nibble -> number of leading zero bits within the 4-bit nibble.
_NIBBLE_LZ = {0: 4, 1: 3, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1, 7: 1}
_HEX = "0123456789abcdef"


def _nibble_val(ch: Column) -> Column:
    """hex char -> 0..15 via position arithmetic (portable: DuckDB
    strpos == Spark instr)."""
    return F.instr(F.lit(_HEX), ch) - 1


def hll_register_rho(hexpart: Column, n_nibbles: int) -> Column:
    """rho = (leading zero bits of the nibble stream) + 1, capped at
    4*n_nibbles + 1 (all-zero stream). Nibble-scan form: find the
    first nonzero nibble, add its in-nibble leading zeros."""
    # index of first nonzero nibble (1-based); 0 if none
    expr = F.lit(0)
    # build right-to-left: if nibble i nonzero -> i, else recurse
    for i in range(n_nibbles, 0, -1):
        nib = _nibble_val(F.substring(hexpart, i, 1))
        expr = F.when(nib > 0, F.lit(i)).otherwise(expr)
    first_nz = expr
    nib_at = _nibble_val(F.substring(hexpart, first_nz, 1))
    in_nibble_lz = (
        F.when(nib_at >= 8, 0)
        .when(nib_at >= 4, 1)
        .when(nib_at >= 2, 2)
        .otherwise(3)
    )
    return F.when(first_nz == 0, F.lit(4 * n_nibbles + 1)).otherwise(
        (first_nz - 1) * 4 + in_nibble_lz + 1
    )


def hll_estimate(
    df: DataFrame, key: Column, p_hex: int = 2, rho_nibbles: int = 6
) -> DataFrame:
    """1-row DataFrame (hll_estimate, n_zero_registers): HLL over
    ``key`` with m = 16^p_hex buckets. rho caps at 4*rho_nibbles+1
    <= 28 so every 2^-M harmonic term is exact DECIMAL(38,28)."""
    m = 16**p_hex
    h = F.sha2(key.cast("string"), 256)
    bucket = sum(
        (_nibble_val(F.substring(h, i + 1, 1)) * (16 ** (p_hex - 1 - i)))
        for i in range(p_hex)
    ).alias("bucket")
    rho = hll_register_rho(
        F.substring(h, p_hex + 1, rho_nibbles), rho_nibbles
    ).alias("rho")
    regs = (
        df.select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    # harmonic sum: exact decimal terms 2^-M (M <= 25 by the nibble
    # cap, well inside scale 28); absent buckets contribute 2^0 = 1.
    term = (
        F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), m_reg)")
    ).cast("decimal(38,28)")
    agg = regs.agg(
        F.sum(term).alias("_s"),
        F.count("*").cast("long").alias("_present"),
        F.sum(F.when(F.col("m_reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("_zero_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_total = F.col("_s").cast("double") + (m - F.col("_present")).cast("double")
    raw = F.lit(alpha * m * m) / s_total
    n_zero = (m - F.col("_present") + F.col("_zero_present")).cast("long")
    # linear-counting correction for the low range (raw <= 2.5m, any
    # empty register): m * ln(m / V)
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        corrected.alias("hll_raw"),
        n_zero.alias("n_zero_registers"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_cell(key: Column, row: Column) -> Column:
    """Column index of ``key`` in sketch row ``row``: first 2 nibbles
    of sha256(row || ':' || key) — an independent hash per row, pure
    integer arithmetic, identical in ANSI SQL."""
    h = F.sha2(F.concat(row.cast("string"), F.lit(":"), key.cast("string")), 256)
    return (
        (_nibble_val(F.substring(h, 1, 1)) * 16 + _nibble_val(F.substring(h, 2, 1)))
        % CMS_WIDTH
    )


def cms_build(df: DataFrame, key: Column) -> DataFrame:
    """Build the sketch: (row, col, n) counters. The shuffle carries
    at most DEPTH*WIDTH = 1024 rows no matter how many TB stream in
    (map-side partial aggregation collapses everything first) — the
    count-min contract. All-integer, so the sketch is bit-exact
    cross-engine, unlike a sampled frequency table."""
    rows = df.select(
        key.alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r"),
    )
    cells = rows.select("r", cms_cell(F.col("k"), F.col("r")).alias("c"))
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).cast("long").alias("n"))


def cms_point_query(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Estimate each key's frequency: min over the DEPTH counters the
    key hashes to. Overestimates only (collisions add, never
    subtract) — the classic CMS guarantee, asserted in tests. The
    sketch side is bounded (<= 1024 rows) so the join broadcasts."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r"),
    ).select(key_col, "r", cms_cell(F.col(key_col), F.col("r")).alias("c"))
    joined = probes.join(F.broadcast(sketch), ["r", "c"], "left").fillna(
        {"n": 0}
    )
    return joined.groupBy(key_col).agg(F.min("n").cast("long").alias("cms_estimate"))


def hll_estimate_grouped(
    df: DataFrame,
    group_col: str,
    key: Column,
    p_hex: int = 2,
    rho_nibbles: int = 6,
) -> DataFrame:
    """Per-group HLL: (group_col, hll_raw, n_zero_registers) — the
    GROUP BY form of :func:`hll_estimate` (distinct users per
    segment, vocabulary per language, ...). Identical register
    arithmetic; the sketch fold shuffles at most ``groups * m`` rows
    (map-side max-combined), so per-group distinct counts cost a
    bounded exchange instead of the exact count's O(groups *
    distinct) one."""
    m = 16**p_hex
    h = F.sha2(key.cast("string"), 256)
    bucket = sum(
        (_nibble_val(F.substring(h, i + 1, 1)) * (16 ** (p_hex - 1 - i)))
        for i in range(p_hex)
    ).alias("bucket")
    rho = hll_register_rho(
        F.substring(h, p_hex + 1, rho_nibbles), rho_nibbles
    ).alias("rho")
    regs = (
        df.select(F.col(group_col), bucket, rho)
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    term = (
        F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), m_reg)")
    ).cast("decimal(38,28)")
    agg = regs.groupBy(group_col).agg(
        F.sum(term).alias("_s"),
        F.count("*").cast("long").alias("_present"),
        F.sum(F.when(F.col("m_reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("_zero_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_total = F.col("_s").cast("double") + (m - F.col("_present")).cast("double")
    raw = F.lit(alpha * m * m) / s_total
    n_zero = (m - F.col("_present") + F.col("_zero_present")).cast("long")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col(group_col),
        corrected.alias("hll_raw"),
        n_zero.alias("n_zero_registers"),
    )
