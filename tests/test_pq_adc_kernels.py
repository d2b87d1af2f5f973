"""Bit-equality of the two implementations of each IVFADC kernel.

The ADC search path ships every kernel in two forms: a Catalyst
expression form (documentation of the exact IEEE fold the oracle SQL
mirrors — interpreted higher-order functions, slow) and the Arrow
pandas-UDF form the queries actually run (component-sequential numpy
folds, 10-100x faster). The hash gate only stays sound if the two are
bit-identical: numpy must not fuse or reassociate the folds. Pin it
per element over the real embeddings fixture.

Also pins the centroid top-k exact-fold UDF against the literal
scan-side assignment operator (same scores, same DESC/cent_id ASC
tie-break) — the probe's list SELECTION is part of the hashed output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pq_code_udf_matches_expression_form(spark):
    from dss_nlp_ingestion_spark.operators.pq import (
        DEFAULT_PQ_ARTIFACT,
        load_pq_artifact,
        pq_code_array_column,
        pq_code_array_udf,
    )

    model = load_pq_artifact(DEFAULT_PQ_ARTIFACT)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select(
        "vec_id",
        pq_code_array_column(model).alias("expr"),
        pq_code_array_udf(model)(F.col("embedding")).alias("udf"),
    ).collect()
    assert rows
    for r in rows:
        assert list(r["expr"]) == list(r["udf"]), r["vec_id"]


def test_pq_lut_udf_matches_expression_form_bitwise(spark):
    from dss_nlp_ingestion_spark.operators.pq import (
        DEFAULT_PQ_ARTIFACT,
        load_pq_artifact,
        pq_query_lut_column,
        pq_query_lut_udf,
    )

    model = load_pq_artifact(DEFAULT_PQ_ARTIFACT)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    rows = emb.select(
        "vec_id",
        pq_query_lut_column(model).alias("expr"),
        pq_query_lut_udf(model)(F.col("embedding")).alias("udf"),
    ).collect()
    assert rows
    for r in rows:
        # repr-level equality == bit equality for finite doubles
        assert [repr(x) for x in r["expr"]] == [repr(x) for x in r["udf"]], (
            r["vec_id"]
        )


def test_centroid_topk_exact_udf_matches_literal_assignment(spark):
    from dss_nlp_ingestion_spark.operators.similarity import (
        assign_nearest_centroid,
        centroid_topk_exact_udf,
        load_ivf_centroids,
    )

    cents = [
        {"cent_id": int(c), "_cvec": [float(x) for x in v]}
        for c, v in load_ivf_centroids()
    ]
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_best = 4
    # The explode emits each id's cells contiguously in rank order
    # within its scan partition and collect() preserves partition
    # order — group consecutively driver-side (a groupBy/collect_list
    # would scramble the order across the shuffle).
    lit_rows = assign_nearest_centroid(
        emb, "vec_id", "embedding", cents, n_best=n_best, impl="expr"
    ).select("id", "cent_id").collect()
    lits: dict[int, list[int]] = {}
    for r in lit_rows:
        lits.setdefault(r["id"], []).append(r["cent_id"])
    uds = {
        r["id"]: list(r["uds"])
        for r in emb.select(
            F.col("vec_id").alias("id"),
            centroid_topk_exact_udf(cents, n_best)(F.col("embedding")).alias(
                "uds"
            ),
        ).collect()
    }
    assert lits and set(lits) == set(uds)
    for vid, ordered in lits.items():
        assert ordered == uds[vid], vid


def test_cosine_arrow_matches_expression_form_bitwise(spark):
    from dss_nlp_ingestion_spark.operators.similarity import cosine, cosine_expr

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") % 13 == F.col("ib") % 13).limit(4000)
    rows = pairs.select(
        "ia",
        "ib",
        cosine(F.col("va"), F.col("vb")).alias("arrow"),
        cosine_expr(F.col("va"), F.col("vb")).alias("expr"),
    ).collect()
    assert rows
    for r in rows:
        assert repr(r["arrow"]) == repr(r["expr"]), (r["ia"], r["ib"])


def test_hyperplane_bucket_arrow_matches_expression_form(spark):
    from dss_nlp_ingestion_spark.operators.similarity import (
        hyperplane_bucket,
        hyperplane_bucket_expr,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select(
        "vec_id",
        hyperplane_bucket(F.col("embedding")).alias("arrow"),
        hyperplane_bucket_expr(F.col("embedding")).alias("expr"),
    ).collect()
    assert rows
    for r in rows:
        assert r["arrow"] == r["expr"], r["vec_id"]
