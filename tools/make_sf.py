"""Scale-up generator: synthesize sf1-shaped data by key-shifted
replication of the driver's sf0.1 tables.

The driver's testdata is read-only and tops out at sf0.1; the r5
verdict (#3) asks for committed sf1 evidence (DECIMAL(38) second-order
sums, overflow-safe cubing, no super-linear headline query). This tool
replicates the fact tables K times (default 10) with disjoint key
ranges so snapshot/merge/dedup semantics stay well-defined:

- customer / orders / lineitem: primary and foreign keys shift
  together by replica * (max_key + 1), so referential integrity holds
  within every replica and key spaces never collide.
- events: event_id shifts; user_id is kept, so per-user activity
  densifies 10x (the realistic direction for a stream at scale).
- documents: doc_id shifts; replicas > 0 append a per-replica token to
  the text (n_chars updated) so near-dup structure stays ~constant per
  document instead of every doc acquiring 9 exact clones (which would
  scale LSH candidate PAIRS quadratically and misrepresent linear
  corpus growth).
- embeddings: vec_id shifts, vectors kept (ANN work scales with rows).
- region/nation/supplier/part: copied as-is — catalog-sized dims stay
  catalog-sized at any scale factor (catalog.BROADCAST_DIMS).

Usage: python tools/make_sf.py [K] [SRC_DIR] [DST_DIR]
Defaults: 10 /root/testdata/sf0.1 /tmp/dss_sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dss_nlp_ingestion_spark.session import get_spark  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dss_sf1"
    spark = get_spark(app_name="dss-make-sf", master="local[32]")
    spark.sparkContext.setLogLevel("WARN")
    os.makedirs(dst, exist_ok=True)

    def load(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def save(df, name, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )

    for dim in ("region", "nation", "supplier", "part"):
        save(load(dim), dim, 1)

    def shift_unit(df, col):
        return int(df.agg(F.max(col)).collect()[0][0]) + 1

    cust, orders, li, ev, docs, emb = (
        load("customer"), load("orders"), load("lineitem"),
        load("events"), load("documents"), load("embeddings"),
    )
    cu, ou, eu, du, vu = (
        shift_unit(cust, "c_custkey"), shift_unit(orders, "o_orderkey"),
        shift_unit(ev, "event_id"), shift_unit(docs, "doc_id"),
        shift_unit(emb, "vec_id"),
    )

    def replicate(df, shifts: dict, extra=None):
        reps = []
        for i in range(k):
            r = df
            for col, unit in shifts.items():
                r = r.withColumn(col, F.col(col) + F.lit(i * unit))
            if extra is not None:
                r = extra(r, i)
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out

    save(replicate(cust, {"c_custkey": cu}), "customer", 4)
    save(
        replicate(orders, {"o_orderkey": ou, "o_custkey": cu}), "orders", 8
    )
    save(replicate(li, {"l_orderkey": ou}), "lineitem", 16)
    save(replicate(ev, {"event_id": eu}), "events", 8)

    def doc_text(r, i):
        if i == 0:
            return r
        sfx = F.lit(f" r{i}")
        return r.withColumn("text", F.concat(F.col("text"), sfx)).withColumn(
            "n_chars", F.col("n_chars") + F.length(sfx)
        )

    save(replicate(docs, {"doc_id": du}, doc_text), "documents", 4)
    save(replicate(emb, {"vec_id": vu}), "embeddings", 4)
    print(f"wrote {k}x of {src} to {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
