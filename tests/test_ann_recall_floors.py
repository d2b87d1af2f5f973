"""Regression FLOORS for the ANN quality artifacts (r7 verdict #4):
a future codebook/centroid retrain must not silently regress recall.
The committed numbers these floors protect (NLP_EVAL/SCALE context):

- ADC + exact-refine: recall 1.0 at every SF (the refine stage makes
  the compressed-domain shortlist loss recoverable);
- trained spherical-k-means IVF: 0.84 at sf0.1 / 1.0 at sf1 — the
  sf0.001 corpus (500 vectors) under-fills the 32 lists, so its
  absolute recall is lower (0.46 measured); the sf0.001 floors are
  gross-regression guards (the %71-rule defect this artifact replaced
  measured 0.36 at sf0.1 and an off-distribution codebook measured
  0.05), while the 0.8 claim is asserted where it holds, at sf0.1.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR

SF01_DIR = "/root/testdata/sf0.1"


def _mean_recall(spark, name: str, sf_dir: str) -> float:
    df = QUERIES[name](spark, sf_dir)
    col = [c for c in df.columns if c.startswith("recall")][0]
    return df.agg(F.avg(col)).collect()[0][0]


def test_adc_refine_recall_is_exact(spark):
    # The refine stage re-ranks the ADC shortlist with exact cosine —
    # recall@k must be 1.0, not approximately 1.0.
    assert _mean_recall(spark, "pq_adc_refine_recall_eval", SF_DIR) == 1.0


def test_trained_ivf_recall_floor_small_sf(spark):
    # Gross-regression guard at sf0.001 (measured 0.46): a retrain
    # that lands an off-distribution centroid set (the 0.36-at-sf0.1
    # class of defect) drops well below this.
    assert _mean_recall(spark, "ann_recall_trained_eval", SF_DIR) >= 0.4


def test_trained_ivf_incremental_recall_floor_small_sf(spark):
    # The trained IVFADC incremental index (r8 probe geometry: 16/32
    # lists compressed-domain pre-scored, top-100 exact-refined)
    # measured 0.80 at sf0.001 (was 0.54 with the n_probe=4
    # full-precision probe); guard well below it.
    assert _mean_recall(spark, "ivf_inc_recall_trained_eval", SF_DIR) >= 0.7


@pytest.mark.skipif(
    not os.path.isdir(SF01_DIR), reason="sf0.1 fixtures not present"
)
def test_trained_ivf_incremental_recall_claim_sf01(spark):
    # The r8 verdict-#5 claim itself: >= 0.8 at sf0.1 (measured 0.90
    # with the IVFADC probe vs 0.68 for n_probe=4 full-precision).
    assert _mean_recall(spark, "ivf_inc_recall_trained_eval", SF01_DIR) >= 0.8


@pytest.mark.skipif(
    not os.path.isdir(SF01_DIR), reason="sf0.1 fixtures not present"
)
def test_trained_ivf_recall_claim_sf01(spark):
    # The committed claim itself: >= 0.8 where the artifact was
    # evaluated (sf0.1, n_probe=4, 10 queries).
    assert _mean_recall(spark, "ann_recall_trained_eval", SF01_DIR) >= 0.8
