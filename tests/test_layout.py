"""Z-order layout: files must cover compact regions of BOTH clustered
dimensions (the file-skipping property), unlike a single-column sort
which gives one dimension perfect locality and the other none."""

from __future__ import annotations

import glob


def test_zorder_files_cluster_both_dimensions(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.sources.layout import zorder_write

    n = 20_000
    rng = np.random.RandomState(7)
    rows = [(int(a), int(b)) for a, b in zip(
        rng.randint(0, 1_000_000, n), rng.randint(0, 1_000_000, n)
    )]
    df = spark.createDataFrame(rows, ["a", "b"])

    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "asort")
    zorder_write(df, z_path, ["a", "b"], n_files=16)
    (
        df.repartitionByRange(16, "a").sortWithinPartitions("a")
        .write.mode("overwrite").parquet(s_path)
    )

    def ranges(path):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            pdf = spark.read.parquet(f).select("a", "b").toPandas()
            if len(pdf):
                out.append(
                    ((pdf.a.max() - pdf.a.min()) / 1_000_000,
                     (pdf.b.max() - pdf.b.min()) / 1_000_000)
                )
        return out

    z = ranges(z_path)
    s = ranges(s_path)
    assert len(z) >= 8 and len(s) >= 8

    def avg(xs):
        xs = list(xs)
        return sum(xs) / len(xs)

    # Single-column sort: 'a' ranges are tiny but 'b' is UNPRUNABLE —
    # a predicate on b alone must scan every file.
    assert max(ra for ra, _ in s) < 0.15
    assert avg(rb for _, rb in s) > 0.9

    # Z-order: the typical file covers a bounded fraction of BOTH
    # dimensions, so selective predicates on either column (or both)
    # skip most files on min/max stats. (A file straddling a high-
    # order curve boundary may span one dimension — inherent to
    # Z-curves — so the property is about the average, not the worst
    # file; observed: avg_ra ≈ 0.41, avg_rb ≈ 0.30 with this seed.)
    assert avg(ra for ra, _ in z) < 0.55, z
    assert avg(rb for _, rb in z) < 0.45, z
    # The b-only scan fraction improves >2x over the 1-d sort.
    assert avg(rb for _, rb in z) < avg(rb for _, rb in s) / 2

    # Layout must not change content.
    assert spark.read.parquet(z_path).count() == n
    za = spark.read.parquet(z_path).agg(F.sum("a"), F.sum("b")).collect()[0]
    oa = df.agg(F.sum("a"), F.sum("b")).collect()[0]
    assert tuple(za) == tuple(oa)


def test_morton_interleave_known_values(spark):
    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.sources.layout import morton_interleave

    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    # bit i of x -> position 2i; bit i of y -> position 2i+1.
    # x=101, y=011 -> z = 1(0) 1(1) 0(2) 1(3) 1(4) 0(5) = 0b011011 = 27
    out = df.select(
        morton_interleave([F.col("x").cast("long"), F.col("y").cast("long")], bits=3)
        .alias("z")
    ).collect()[0].z
    assert out == 27


def test_zonemap_prunes_files_and_loses_nothing(spark, tmp_path):
    """Z-ordered layout + zone map: a selective range read opens a
    strict subset of files, and returns exactly the full-scan-filter
    rows."""
    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.sources.layout import (
        build_zonemap,
        zonemap_pruned_read,
        zorder_write,
    )

    df = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    path = str(tmp_path / "zm")
    zorder_write(df, path, ["k", "v"], n_files=8)
    zm = build_zonemap(spark, path, ["k"])
    assert zm.count() == 8

    lo, hi = 2000, 2999
    overlapping = zm.filter(
        (F.col("max_k") >= lo) & (F.col("min_k") <= hi)
    ).count()
    assert 0 < overlapping < 8  # pruning actually happened

    got = sorted(r["k"] for r in zonemap_pruned_read(spark, path, zm, "k", lo, hi).collect())
    assert got == list(range(lo, hi + 1))

    # empty overlap -> empty result, no files opened
    assert zonemap_pruned_read(spark, path, zm, "k", 10**9, 2 * 10**9).count() == 0


def test_bloom_index_prunes_files_and_loses_nothing(spark, tmp_path):
    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.sources.layout import (
        bloom_pruned_read,
        build_bloom_index,
    )

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    path = str(tmp_path / "bloomed")
    # Hash-distributed: every file's k min/max spans ~the full range,
    # so a zone map would prune NOTHING here.
    df.repartition(16, "k").write.mode("overwrite").parquet(path)

    idx = build_bloom_index(spark, path, "k")
    assert idx.count() == 16

    keys = [3, 4111, 9777, 19_402]
    got = bloom_pruned_read(spark, path, idx, "k", keys)
    want = spark.read.parquet(path).filter(F.col("k").isin(keys))
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )

    # The pruning effect: 4 point keys live in <= 4 files; Bloom false
    # positives can add a few opens but must not approach "all files".
    opened = got.select(F.input_file_name()).distinct().count()
    assert opened <= 8, f"bloom pruning opened {opened}/16 files"


def test_bloom_misses_return_empty(spark, tmp_path):
    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.sources.layout import (
        bloom_pruned_read,
        build_bloom_index,
    )

    df = spark.range(1000).select(F.col("id").alias("k"))
    path = str(tmp_path / "bloomed2")
    df.repartition(4, "k").write.mode("overwrite").parquet(path)
    idx = build_bloom_index(spark, path, "k")
    got = bloom_pruned_read(spark, path, idx, "k", [10_000_001, 10_000_002])
    assert got.count() == 0
