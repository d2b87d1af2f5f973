"""Round-12 paired A/B harness: alternating old/new timed runs in ONE
session (min-of-N), per the r11 host-noise methodology. "Old" forms
are reconstructed in-process: the r11 cosine / hyperplane-bucket
kernels are injected into operators.similarity's UDF caches, and the
r11 query bodies (dsir, edit_distance) are copied inline.

Usage:
    python tools/r12_ab.py <case> [pairs] [sf_dir]
cases: cosine_topk | near_dups | near_dups_guarded | dsir | dsir_top |
       edit_distance | semdedup | ivf
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dss_nlp_ingestion_spark.operators import similarity as S
from dss_nlp_ingestion_spark.plans import QUERIES
from dss_nlp_ingestion_spark.session import get_spark, release_cached

CASE = sys.argv[1]
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# --- r11 kernel reconstructions -------------------------------------------

def old_cos_udf():
    def _cos_fn(va, vb):
        n = len(va)
        if n == 0:
            return pd.Series([], dtype="float64")
        out = np.empty(n, dtype=np.float64)
        null = np.zeros(n, dtype=bool)
        A, B = [], []
        for i in range(n):
            x, y = va.iloc[i], vb.iloc[i]
            if x is None or y is None:
                null[i] = True
                A.append(None)
                B.append(None)
            else:
                A.append(np.asarray(x, dtype=np.float64))
                B.append(np.asarray(y, dtype=np.float64))
        if null.all():
            return pd.Series([None] * n)
        idx = np.where(~null)[0]
        Am = np.stack([A[i] for i in idx])
        Bm = np.stack([B[i] for i in idx])
        dim = Am.shape[1]
        dots = aa = bb = None
        for j in range(dim):
            pj = Am[:, j] * Bm[:, j]
            dots = pj if dots is None else dots + pj
            sa = Am[:, j] * Am[:, j]
            aa = sa if aa is None else aa + sa
            sb = Bm[:, j] * Bm[:, j]
            bb = sb if bb is None else bb + sb
        with np.errstate(all="ignore"):
            vals = dots / (np.sqrt(aa) * np.sqrt(bb))
        out[idx] = vals
        if null.any():
            res = out.astype(object)
            res[null] = None
            return pd.Series(res)
        return pd.Series(out)

    return pandas_udf(_cos_fn, "double")  # deterministic, like r11


def old_bucket_udf(n_planes, dim=64):
    w = np.array(
        [
            [float(S.plane_weight(p, i)) for i in range(dim)]
            for p in range(n_planes)
        ]
    )

    def _bucket_fn(vs):
        n = len(vs)
        if n == 0:
            return pd.Series([], dtype="int64")
        mat = np.array([[float(x) for x in v] for v in vs], dtype=np.float64)
        bucket = np.zeros(n, dtype=np.int64)
        for p in range(n_planes):
            proj = None
            for j in range(dim):
                t = mat[:, j] * w[p, j]
                proj = t if proj is None else proj + t
            bucket += (proj > 0).astype(np.int64) << p
        return pd.Series(bucket)

    return pandas_udf(_bucket_fn, "long")  # deterministic, like r11


def old_topk_udf(cent_rows, n_best):
    import math

    cent_ids = np.array([int(r["cent_id"]) for r in cent_rows], dtype=np.int64)
    cent_mat = np.array(
        [[float(x) for x in r["_cvec"]] for r in cent_rows], dtype=np.float64
    )

    def _seq_norm(row):
        acc = 0.0
        for x in row:
            acc += float(x) * float(x)
        return acc and math.sqrt(acc)

    cnorms = np.array([_seq_norm(row) for row in cent_mat], dtype=np.float64)
    dim = cent_mat.shape[1]

    def _topk_fn(vs):
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([[float(x) for x in v] for v in vs], dtype=np.float64)
        dots = None
        qq = None
        for j in range(dim):
            xj = mat[:, j]
            pj = xj[:, None] * cent_mat[None, :, j]
            dots = pj if dots is None else dots + pj
            sq = xj * xj
            qq = sq if qq is None else qq + sq
        scores = dots / (np.sqrt(qq)[:, None] * cnorms[None, :])
        return pd.Series(
            [
                cent_ids[np.lexsort((cent_ids, -scores[i]))[:n_best]].tolist()
                for i in range(len(mat))
            ]
        )

    return pandas_udf(_topk_fn, "array<long>")


_NEW_TOPK = S.centroid_topk_exact_udf


def install_old() -> None:
    S._COSINE_ARROW_UDF = old_cos_udf()
    for planes in (8, 9, 10, 11, 12, 13, 14):
        S._HYPERPLANE_UDFS[(planes, 64)] = old_bucket_udf(planes)
    S.centroid_topk_exact_udf = old_topk_udf


def install_new() -> None:
    S._COSINE_ARROW_UDF = None  # lazy rebuild with the r12 kernel
    S._HYPERPLANE_UDFS.clear()
    S.centroid_topk_exact_udf = _NEW_TOPK


# --- r11 query-body reconstructions ---------------------------------------

def old_dsir(spark, sf_dir):
    from dss_nlp_ingestion_spark.functions import text as T
    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.plans.curation_queries import (
        _DSIR_B,
        _DSIR_SALT,
        _TARGET_LANG,
    )
    from dss_nlp_ingestion_spark.plans.registry import fround

    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "lang", F.explode(T.shingles(F.col("text"), 2)).alias("gram")
    )
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(_DSIR_SALT + ":"), F.col("gram")), 256), 1, 13
            ),
            16,
            10,
        ).cast("long")
        % _DSIR_B
    )
    b = grams.select("doc_id", "lang", bucket.alias("bucket"))
    stats = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == _TARGET_LANG, 1).otherwise(0))
        .cast("long")
        .alias("tc"),
        F.count(F.lit(1)).cast("long").alias("rc"),
    )
    tot = stats.agg(
        F.sum("tc").cast("long").alias("t_total"),
        F.sum("rc").cast("long").alias("r_total"),
    )
    terms = b.join(F.broadcast(stats), "bucket").crossJoin(F.broadcast(tot))
    num = F.sum(
        (F.col("tc") * F.col("r_total") - F.col("rc") * F.col("t_total")).cast(
            "decimal(38,0)"
        )
    ).cast("double")
    den = (
        F.count(F.lit(1)).cast("double")
        * F.first("t_total").cast("double")
        * F.first("r_total").cast("double")
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        fround(num / den, 10).alias("imp_score"),
    )


def old_edit_distance(spark, sf_dir):
    from dss_nlp_ingestion_spark.catalog import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, 12).alias("blk")
    )
    n = spark.sparkContext.defaultParallelism
    a = (
        docs.repartition(n, "blk")
        if docs.rdd.getNumPartitions() < n
        else docs
    ).alias("a")
    b = docs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"))
    return pairs.filter(dist <= 20).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        dist.cast("long").alias("dist"),
    )


CASES = {
    "cosine_topk": ("cosine_topk_bruteforce", None),
    "near_dups": ("embedding_near_dups", None),
    "near_dups_guarded": ("embedding_near_dups_guarded", None),
    "semdedup": ("semdedup_prune", None),
    "ivf": ("ivf_topk", None),
    "dsir": ("dsir_importance_weights", old_dsir),
    "dsir_top": ("dsir_top_selection", None),
    "edit_distance": ("edit_distance_dups", old_edit_distance),
}


def main() -> None:
    qname, old_body = CASES[CASE]
    spark = get_spark(
        app_name=f"r12-ab-{CASE}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1000, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def run(form: str) -> float:
        if form == "old":
            install_old()
        else:
            install_new()
        spark.sparkContext.setJobDescription(f"{CASE}:{form}")
        builder = old_body if (form == "old" and old_body) else QUERIES[qname]
        t0 = time.perf_counter()
        n = builder(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        release_cached(spark)
        print(f"{form}\t{dt:.3f}\trows={n}", flush=True)
        return dt

    # warmup both forms once (codegen/compile), then alternate pairs
    run("old")
    run("new")
    olds, news = [], []
    for _ in range(PAIRS):
        olds.append(run("old"))
        news.append(run("new"))
    print(
        f"RESULT {CASE} sf={SF_DIR} old_min={min(olds):.3f} "
        f"old_med={sorted(olds)[len(olds)//2]:.3f} "
        f"new_min={min(news):.3f} "
        f"new_med={sorted(news)[len(news)//2]:.3f} "
        f"pairs_won={sum(1 for o, x in zip(olds, news) if x < o)}/{PAIRS}",
        flush=True,
    )
    install_new()
    spark.stop()


if __name__ == "__main__":
    main()
