"""Bucketed co-located join (SURVEY.md §7.1 / instructions: "bucketing
for co-located joins"): two tables bucketed by the join key join with
ZERO exchanges — at 100 TB this turns the recurring
documents⋈history / fact⋈fact joins into shuffle-free map joins."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_key"), (F.col("id") % 7).alias("v")
    )
    hist = spark.range(0, 500).select(
        F.col("id").alias("doc_key"), F.lit("seen").alias("status")
    )
    for name, df in (("b_docs", docs), ("b_hist", hist)):
        df.write.mode("overwrite").bucketBy(8, "doc_key").sortBy("doc_key").saveAsTable(name)

    a = spark.table("b_docs")
    # hint("merge") pins sort-merge (the at-scale strategy, where
    # neither side broadcasts) so the bucketed no-shuffle path shows.
    b = spark.table("b_hist").hint("merge")
    joined = a.join(b, "doc_key")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # Both sides read pre-bucketed: the join needs no Exchange.
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert joined.count() == 500

    # Bucketed anti-join (the D1 history check) is shuffle-free too.
    fresh = a.join(spark.table("b_hist").hint("merge"), "doc_key", "left_anti")
    plan2 = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2
    assert fresh.count() == 500
