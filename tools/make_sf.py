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
- documents: doc_id shifts; replicas > 0 get a per-replica TOKEN-LEVEL
  perturbation — every 3rd token is suffixed with the replica tag (plus
  the appended tail token; n_chars recomputed) — so replicas of the
  same document are NOT near-duplicates of each other: with word
  3-shingles nearly every shingle spans a perturbed position, so
  cross-replica Jaccard collapses while WITHIN-replica near-dup
  structure (both members of an original near-dup pair perturb
  identically) is preserved. Duplicate-CLUSTER size therefore stays
  ~constant as the corpus grows — how real corpora scale — and every
  pair-emitting dedup operator's OUTPUT grows linearly with K. (The
  r9-era generator only appended a tail token, which left replicas
  ~99% shingle-identical: at K=100 every doc acquired 99 near-clones,
  so exact pair emitters' outputs grew QUADRATICALLY in K and the
  sweep measured that data artifact, not operator scaling — the r10
  sf10 probe caught it as an embedding_near_dups "cliff".)
- embeddings: vec_id shifts; replica i's vector is CYCLICALLY SHIFTED
  by i mod 64 positions and Walsh-sign-flipped by pattern i // 64
  (same reasoning: identical copies made every LSH bucket hold K
  exact clones — quadratic in-bucket pair growth BY DATA; a
  signed-permuted copy is ~uncorrelated with the original, while
  within-replica cosine structure is exactly preserved since signed
  permutations are orthogonal). Clone-free for K <= 4096.
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
        # Suffix every 3rd token with the replica tag, then append a
        # tail token: kills cross-replica shingle overlap (see module
        # docstring) deterministically and entirely JVM-side.
        tag = F.lit(f"_r{i}")
        perturbed = F.array_join(
            F.zip_with(
                F.split(F.col("text"), " "),
                F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
                lambda tok, j: F.when(j % 3 == 2, F.concat(tok, tag)).otherwise(tok),
            ),
            " ",
        )
        return r.withColumn(
            "text", F.concat(perturbed, F.lit(f" r{i}"))
        ).withColumn("n_chars", F.length(F.col("text")))

    def emb_shift(r, i):
        if i == 0:
            return r
        # Cyclic shift by i mod dim: slice+concat, JVM-side, exact.
        dim = F.size(F.col("embedding"))
        kk = F.lit(i) % dim
        shifted = F.when(kk == 0, F.col("embedding")).otherwise(
            F.concat(
                F.slice(F.col("embedding"), kk + 1, dim - kk),
                F.slice(F.col("embedding"), 1, kk),
            )
        )
        # The shift cycle alone has period dim (=64): replicas i and
        # i+64 were EXACT clones, so for K > 64 duplicate-cluster size
        # grew as ceil(K/64) (r10 advisor). Mix the cycle with a
        # WALSH SIGN PATTERN keyed on j = i // 64: negate component p
        # iff popcount(p AND j) is odd — distinct orthogonal patterns
        # for every j in 0..63 (cross-j patterns differ in exactly
        # half the positions, so cross-cycle replicas decorrelate to
        # cosine ~0) while within-replica cosine structure is EXACTLY
        # preserved (a signed permutation is orthogonal, and sign
        # flips are exact in IEEE). 64 shifts x 64 patterns = the
        # generator is clone-free for K <= 4096; K <= 64 output is
        # bit-identical to the r10 generator (j = 0 => identity).
        j = (i // 64) % 64
        if j > 0:
            mask = F.lit(j)
            shifted = F.transform(
                shifted,
                lambda x, p: F.when(
                    F.bit_count(p.bitwiseAND(mask)) % 2 == 1, -x
                ).otherwise(x),
            )
        return r.withColumn("embedding", shifted)

    save(replicate(docs, {"doc_id": du}, doc_text), "documents", 4)
    save(replicate(emb, {"vec_id": vu}, emb_shift), "embeddings", 4)
    print(f"wrote {k}x of {src} to {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
