"""Property tests for the cross-engine determinism primitives every
registered oracle leans on (plans/registry.py rules 1-2): `fround`
(floor-based rounding) must produce bit-identical doubles in Spark and
DuckDB — including the halfway values where the engines' native
round() implementations disagree — and `dsum` (decimal-cast exact sum)
must be invariant to partitioning, i.e. to the partial-aggregation
order that changes under AQE / at cluster scale.

One Spark action per property (values batched into a single
DataFrame), so 500+ cases cost two jobs, not 500.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans.registry import (
    dsum,
    dsum_sql,
    fround,
    fround_sql,
)


def _cases() -> list[float]:
    rng = random.Random(0xF0D)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(400)]
    vals += [rng.uniform(-1, 1) * 10**rng.randint(-8, 8) for _ in range(80)]
    # the adversarial set: exact halfway points at every target scale,
    # where HALF_UP (Spark round) and round-half-even (DuckDB round)
    # diverge — fround must agree with itself across engines anyway
    vals += [2.675, -2.675, 0.5, -0.5, 1.0005, -1.0005, 123.45645,
             0.00005, -0.00005, 99999.99995]
    return vals


def test_fround_bit_identical_across_engines(spark):
    vals = _cases()
    for n in (0, 2, 4, 6):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                   "i long, x double")
        got = {
            r["i"]: r["y"]
            for r in df.select("i", fround(F.col("x"), n).alias("y")).collect()
        }
        duck = duckdb.connect()
        duck.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
        duck.executemany("INSERT INTO t VALUES (?, ?)",
                         [(i, v) for i, v in enumerate(vals)])
        want = dict(duck.execute(
            f"SELECT i, {fround_sql('x', n)} FROM t").fetchall())
        diffs = [(i, got[i], want[i]) for i in want
                 if repr(got[i]) != repr(want[i])]
        assert not diffs, f"n={n}: {diffs[:5]}"


def test_dsum_partition_invariant_and_matches_duckdb(spark):
    rng = random.Random(0xD5)
    vals = [round(rng.uniform(-1e4, 1e4), 2) for _ in range(2000)]

    def total(parts: int) -> float:
        df = spark.createDataFrame(
            [(v,) for v in vals], "x double"
        ).repartition(parts)
        return df.agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]

    one, many = total(1), total(32)
    # partial-agg order must not change the result by even one ulp
    assert repr(one) == repr(many)
    duck = duckdb.connect()
    duck.execute("CREATE TABLE t (x DOUBLE)")
    duck.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = duck.execute(f"SELECT {dsum_sql('x')} FROM t").fetchall()[0][0]
    assert repr(one) == repr(want)
