"""Connected components over near-duplicate candidate pairs — the
clustering step between pair discovery (MinHash/SimHash/Jaccard) and
canonical-document selection in a training-data dedup pipeline.

The reference dedups by exact key only (src/base.py:210-218); at
100 TB, near-dup PAIRS must be folded into CLUSTERS so each group
keeps one canonical document.  This is small-diameter graph work
(duplicate clusters are near-cliques), so iterative min-label
propagation converges in a handful of supersteps.

Scale design: each iteration is one join + one aggregate, both
shuffled on the node id — the classic large-star/small-star shape
without an external graph library.  The driver-side loop inspects
only a changed-count aggregate (never row data), and iterations are
capped: k supersteps propagate labels across any component of
diameter <= k, and near-dup clusters are denser than chains by
construction.  On pathological chain graphs, raise ``max_iter`` or
alternate with a star-contraction step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum
    node id of its component.  Returns (node, label).

    Min-label propagation: start with label(v) = v; each superstep
    sets label(v) = min(label(v), min over neighbors' labels); stop
    when no label changes (checked via a count aggregate, not a
    collect).  Deterministic for any edge order.
    """
    # The edge list is read once per superstep and the upstream
    # lineage may be an expensive pipeline (LSH candidate generation)
    # — persist it, or every iteration re-runs the whole producer.
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    # Superstep 0 for free: with identity labels the neighbor-min is
    # just min(v) per u, so the first round needs no label join —
    # one aggregate seeds label(v) = min(v, min neighbor), saving a
    # full join+shuffle round (most near-clique clusters then
    # converge in a single checked superstep).
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nmin0"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("_nmin0")).alias("label"),
        )
        .persist()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("_nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                "label",
                F.least(F.col("label"), F.coalesce(F.col("_nmin"), F.col("label"))).alias(
                    "_new"
                ),
            )
        )
        changed = updated.filter(F.col("_new") < F.col("label")).count()
        prev = labels
        # localCheckpoint truncates the per-iteration lineage (plans
        # otherwise grow superlinearly) and materializes the new
        # labels so `prev` can be released.
        labels = updated.select("node", F.col("_new").alias("label")).localCheckpoint()
        prev.unpersist()
        if changed == 0:
            break
    sym.unpersist()
    return labels


def canonical_filter(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Keep one canonical row per duplicate cluster (the minimum id —
    which IS the component label) plus every row that belongs to no
    cluster.  The components table is near-dup-pair-sized, far
    smaller than the corpus: broadcast when small, shuffle on id
    otherwise — the corpus is filtered, never expanded."""
    comp = components.select(
        F.col("node").alias(id_col), F.col("label").alias("_label")
    )
    joined = df.join(comp, id_col, "left")
    return joined.filter(
        F.col("_label").isNull() | (F.col(id_col) == F.col("_label"))
    ).drop("_label")


def connected_components_pj(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Connected components with POINTER JUMPING: each superstep does
    one hop of neighbor-min propagation followed by a label-chase
    (label(v) <- label(label(v))), so the frontier distance covered
    DOUBLES per round instead of growing by one. Same output contract
    as :func:`connected_components` — (node, label = component min id).

    Why it exists: plain min-label propagation needs diameter-many
    supersteps, fine for near-clique duplicate clusters but O(n)
    rounds on chain-shaped components (url redirect chains, quote
    chains). With the jump, convergence is O(log diameter) — ~40
    rounds cover any graph that fits on Earth — which is the
    shape you want when each superstep is a full shuffle at 100 TB.

    The jump is valid because labels always point at real nodes
    (a label is the min of some reachable node set and every node is
    in the labels table) and label(v) is non-increasing, so chasing
    one level composes reachability information already paid for —
    two extra hash joins on the (node,label) table per round, far
    cheaper than the supersteps they eliminate.
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    # Free superstep 0 (same trick as connected_components): identity
    # labels make the first neighbor-min a plain min(v) aggregate.
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nmin0"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("_nmin0")).alias("label"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # Hop: min over neighbors' current labels.
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("_nmin"))
        )
        hopped = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("_nmin"), F.col("label"))
                ).alias("_hop"),
            )
        )
        # Jump: chase one level of indirection through the labels
        # table itself (label is non-increasing, so this only ever
        # tightens). Rename-per-side: shared-lineage aliases are
        # unsafe for self-joins.
        chase = hopped.select(
            F.col("node").alias("_cn"), F.col("_hop").alias("_cl")
        )
        jumped = (
            hopped.join(chase, hopped["_hop"] == chase["_cn"], "left")
            .select(
                "node",
                "_old",
                F.least(
                    F.col("_hop"), F.coalesce(F.col("_cl"), F.col("_hop"))
                ).alias("_new"),
            )
        )
        changed = jumped.filter(F.col("_new") < F.col("_old")).count()
        labels = jumped.select("node", F.col("_new").alias("label")).localCheckpoint()
        if changed == 0:
            break
    sym.unpersist()
    return labels
