"""Train the SCALE-TIER IVF centroid artifact (r10 verdict #5).

nlist must scale ~sqrt(n): at a fixed k the average inverted-list
length — and with it per-query probe cost at fixed n_probe — grows
linearly with the corpus. This trains the k=448 ~ sqrt(200k) tier
`operators/similarity.py::SCALE_IVF_CENTROIDS` from the sf10 fixture
(`python tools/make_sf.py 100 /root/testdata/sf0.1 /tmp/dss_sf10`).

Deterministic end-to-end: the generator is key-shifted replication of
the committed sf0.1 parquet, the sample is the first 10*k vectors BY
vec_id (order-stable however the parquet files landed), and
`train_spherical_kmeans` is the exact-fold, RNG-free trainer every
committed centroid artifact uses — re-running this script on a
regenerated fixture reproduces the artifact bit-for-bit.

Usage: python tools/train_ivf_scale.py [SRC_DIR] [K]
Defaults: /tmp/dss_sf10 448
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dss_nlp_ingestion_spark.operators.similarity import (  # noqa: E402
    SCALE_IVF_CENTROIDS,
    save_ivf_centroids,
    train_spherical_kmeans,
)
from dss_nlp_ingestion_spark.session import get_spark  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dss_sf10"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    spark = get_spark(app_name="dss-train-ivf-scale", master="local[32]")
    spark.sparkContext.setLogLevel("WARN")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    sample = [
        r.embedding
        for r in emb.orderBy("vec_id").limit(10 * k).collect()
    ]
    if len(sample) < k:
        raise SystemExit(f"sample too small for k={k}: {len(sample)} rows")
    cents = train_spherical_kmeans(sample, k=k, iters=10)
    save_ivf_centroids(cents, SCALE_IVF_CENTROIDS)
    print(f"wrote {SCALE_IVF_CENTROIDS}: k={k} from {len(sample)} sample rows")
    spark.stop()


if __name__ == "__main__":
    main()
