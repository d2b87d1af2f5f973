"""Batch-8 tests: multi-table txn atomicity, SLO burn."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_multitxn_head_read_is_torn_but_txn_read_is_not(spark):
    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.sources import multitxn, txlog

    orders = table(spark, SF_DIR, "orders").select("o_orderkey")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey")
    root = tempfile.mkdtemp(prefix="dss_multitxn_t_")
    txlog.create_table(
        orders.filter(F.col("o_orderkey") % 3 != 0),
        os.path.join(root, "orders"),
    )
    txlog.create_table(
        li.filter(F.col("l_orderkey") % 3 != 0),
        os.path.join(root, "lineitem"),
    )
    txn0 = multitxn.commit_txn(root, {"orders": 0, "lineitem": 0})
    txlog.append(
        orders.filter(F.col("o_orderkey") % 3 == 0),
        os.path.join(root, "orders"),
    )

    # ground truth: orders in batch 1 that genuinely have no lines
    baseline = (
        orders.filter(F.col("o_orderkey") % 3 != 0)
        .join(
            li.filter(F.col("l_orderkey") % 3 != 0),
            li["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        )
        .count()
    )

    # torn: head orders sees batch 2, lineitem doesn't -> extra
    # unmatched orders beyond the genuine line-less ones
    torn_orders = txlog.read(spark, os.path.join(root, "orders"))
    li0 = txlog.read(spark, os.path.join(root, "lineitem"))
    unmatched = torn_orders.join(
        li0, li0["l_orderkey"] == torn_orders["o_orderkey"], "left_anti"
    ).count()
    assert unmatched > baseline

    # consistent: the txn0 vector shows exactly the batch-1 reality
    snap = multitxn.read_consistent(spark, root, txn0)
    assert (
        snap["orders"]
        .join(
            snap["lineitem"],
            snap["lineitem"]["l_orderkey"] == snap["orders"]["o_orderkey"],
            "left_anti",
        )
        .count()
        == baseline
    )


def test_multitxn_rejects_unknown_version(spark):
    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.sources import multitxn, txlog

    root = tempfile.mkdtemp(prefix="dss_multitxn_v_")
    txlog.create_table(
        table(spark, SF_DIR, "nation"), os.path.join(root, "nation")
    )
    with pytest.raises(multitxn.TornCommitError):
        multitxn.commit_txn(root, {"nation": 5})


def test_slo_burn_alert_is_consistent(spark):
    for r in QUERIES["slo_burn_rate"](spark, SF_DIR).collect():
        assert r.burn_alert == (1 if r.errs * 5 > r.total else 0)
        assert 0 <= r.err_rate <= 1.0
