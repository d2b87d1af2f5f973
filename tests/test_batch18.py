"""Batch-18 tests: masking view, reco fallback."""

from __future__ import annotations

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_masked_view_leaks_nothing(spark):
    from dss_nlp_ingestion_spark.catalog import table

    rows = QUERIES["masked_customer_view"](spark, SF_DIR).collect()
    names = {
        r.c_name for r in table(spark, SF_DIR, "customer").select("c_name").collect()
    }
    for r in rows[:100]:
        assert r.masked_name.startswith("cust_") and len(r.masked_name) == 13
        assert r.masked_name[5:] not in names
        assert 0 <= r.geo_bucket <= 4
        assert r.acctbal_bucket % 1000 == 0


def test_masking_is_stable_join_key(spark):
    a = {r.c_custkey: r.masked_name for r in QUERIES["masked_customer_view"](spark, SF_DIR).collect()}
    b = {r.c_custkey: r.masked_name for r in QUERIES["masked_customer_view"](spark, SF_DIR).collect()}
    assert a == b


def test_reco_covers_every_customer(spark):
    from dss_nlp_ingestion_spark.catalog import table

    rows = QUERIES["reco_fallback_parts"](spark, SF_DIR).collect()
    n_cust = table(spark, SF_DIR, "customer").count()
    assert len(rows) == n_cust
    assert all(r.reco_part is not None for r in rows)
    assert any(r.personalized == 1 for r in rows)
    assert any(r.personalized == 0 for r in rows)
