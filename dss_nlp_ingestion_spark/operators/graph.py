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
capped.  NON-CONVERGENCE IS NEVER SILENT: plain propagation that
exhausts its cap switches to pointer-jumping rounds (distance covered
doubles per round), and if even those exhaust, a RuntimeError is
raised — wrong cluster labels (and therefore wrong canonical-document
choices) must not leak out quietly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym_edges(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Symmetrized, deduped (u, v) edge list. Persisted by callers:
    the upstream lineage may be an expensive pipeline (LSH candidate
    generation) re-read every superstep.

    Symmetrization is an EXPLODE of both orientations from each input
    row, not a union of two selects: a union evaluates the upstream
    edge pipeline once per branch — for CC over LSH candidates that
    re-ran the whole shingle/minhash/band join a second time inside
    the very first superstep (r11 measurement: the pair pass is half
    the query) — while the explode reads each input row once.

    The result is hash-partitioned on ``v`` AT NO EXTRA EXCHANGE
    (r11, guide §2.4): the dedup shuffles on v alone —
    hash-partitioning by v co-locates every copy of a (u, v) row, so
    the dropDuplicates aggregate runs partition-locally on top of it
    (HashPartitioning(v) satisfies ClusteredDistribution(u, v)) —
    where ``.distinct()`` would shuffle the same rows keyed on (u, v).
    Why v: every superstep's propagation join keys on ``sym.v ==
    labels.node``. At toy scale the labels side broadcasts and the
    cache partitioning is moot (measured: neutral at sf0.1); at scale
    labels outgrow broadcast, the join falls back to sort-merge, and
    a (u, v)-partitioned cache would re-shuffle the FULL edge table
    every superstep while the v-partitioned one leaves only the
    neighbor-min groupBy(u) — the message shuffle the algorithm is
    made of — plus the |V|-sized labels exchange."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
                    ),
                    F.struct(
                        F.col(dst_col).alias("u"), F.col(src_col).alias("v")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .repartition(F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _seed_labels(sym: DataFrame) -> DataFrame:
    """Superstep 0 for free: with identity labels the neighbor-min is
    just min(v) per u, so the first round needs no label join — one
    aggregate seeds label(v) = min(v, min neighbor), saving a full
    join+shuffle round (most near-clique clusters then converge in a
    single checked superstep)."""
    return (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nmin0"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("_nmin0")).alias("label"),
        )
    )


def _hop(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One propagation superstep: (node, _old, _hop) where _hop =
    min(label, min over neighbors' labels)."""
    neighbor_min = (
        sym.join(labels, sym["v"] == labels["node"])
        .groupBy("u")
        .agg(F.min("label").alias("_nmin"))
    )
    return (
        labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
        .select(
            "node",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("_nmin"), F.col("label"))
            ).alias("_hop"),
        )
    )


def _jump(hopped: DataFrame) -> DataFrame:
    """Pointer-jump: chase one level of indirection through the labels
    table itself (label(v) <- label(label(v))). Valid because labels
    always point at real nodes and are non-increasing, so the chase
    only tightens. Rename-per-side: shared-lineage aliases are unsafe
    for self-joins. Returns (node, _old, _new)."""
    chase = hopped.select(F.col("node").alias("_cn"), F.col("_hop").alias("_cl"))
    return (
        hopped.join(chase, hopped["_hop"] == chase["_cn"], "left")
        .select(
            "node",
            "_old",
            F.least(F.col("_hop"), F.coalesce(F.col("_cl"), F.col("_hop"))).alias(
                "_new"
            ),
        )
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 15,
    jump_iter: int = 20,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum
    node id of its component.  Returns (node, label).

    Min-label propagation: start with label(v) = v; each superstep
    sets label(v) = min(label(v), min over neighbors' labels); stop
    when no label changes (checked via a count aggregate, not a
    collect).  Deterministic for any edge order.

    Convergence contract: plain propagation needs diameter-many
    supersteps — ample for near-clique duplicate clusters.  If
    ``max_iter`` rounds exhaust without converging (a chain-shaped
    component wider than ``max_iter``), the loop SWITCHES STRATEGY to
    pointer-jumping rounds (covered distance doubles per round, so
    ``jump_iter`` = 20 covers diameter ~2^20) rather than returning
    wrong labels; if even those exhaust, it raises.
    """
    sym = _sym_edges(edges, src_col, dst_col).persist()
    labels = _seed_labels(sym).persist()
    changed = -1
    for _ in range(max_iter):
        # Checkpoint FIRST (one execution, lineage truncated, result
        # materialized), then derive both the convergence count and
        # the next labels from the materialized blocks — the earlier
        # order (count, then eager checkpoint) ran every superstep's
        # join twice.
        ck = _hop(sym, labels).localCheckpoint()
        changed = ck.filter(F.col("_hop") < F.col("_old")).count()
        prev = labels
        labels = ck.select("node", F.col("_hop").alias("label"))
        prev.unpersist()
        if changed == 0:
            break
    if changed != 0:
        # Strategy switch: the component is wider than max_iter hops
        # (chain-shaped, not near-clique) — continue with pointer
        # jumping instead of silently returning wrong labels.
        for _ in range(jump_iter):
            ck = _jump(_hop(sym, labels)).localCheckpoint()
            changed = ck.filter(F.col("_new") < F.col("_old")).count()
            labels = ck.select("node", F.col("_new").alias("label"))
            if changed == 0:
                break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"propagation + {jump_iter} pointer-jump supersteps "
            f"({changed} labels still changing) — raise the caps"
        )
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
    chains). With the jump, convergence is O(log diameter) — the
    default ``max_iter`` = 10 covers diameter ~2^10; raising it to 40
    covers any graph that fits on Earth — which is the shape you want
    when each superstep is a full shuffle at 100 TB.

    The jump is valid because labels always point at real nodes
    (a label is the min of some reachable node set and every node is
    in the labels table) and label(v) is non-increasing, so chasing
    one level composes reachability information already paid for —
    two extra hash joins on the (node,label) table per round, far
    cheaper than the supersteps they eliminate.

    Raises RuntimeError when ``max_iter`` exhausts with labels still
    changing — non-convergence is never silent.
    """
    sym = _sym_edges(edges, src_col, dst_col).persist()
    labels = _seed_labels(sym).localCheckpoint()
    changed = -1
    for _ in range(max_iter):
        # Checkpoint first, then count + relabel off the materialized
        # blocks (one execution per superstep, not two).
        ck = _jump(_hop(sym, labels)).localCheckpoint()
        changed = ck.filter(F.col("_new") < F.col("_old")).count()
        labels = ck.select("node", F.col("_new").alias("label"))
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components_pj did not converge within {max_iter} "
            f"pointer-jump supersteps ({changed} labels still changing) "
            f"— raise max_iter (each round doubles covered diameter)"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 10**9,
) -> DataFrame:
    """Fixed-iteration weighted PageRank as a chain of join+aggregate
    supersteps — (node, rank) with ranks in INTEGER mass units of
    ``1/scale`` so the result is bit-identical across engines.

    Why integer mass: float PageRank sums incoming contributions, and
    float addition is order-dependent — partial-agg order would make
    the low bits engine- and partitioning-dependent. Here every
    contribution is ``floor(rank * w / wout)`` (one IEEE division +
    floor, identical everywhere), summed EXACTLY as BIGINT; the
    damping step is again a single deterministic expression. The
    floor drops at most 1 mass unit (1e-9) per edge per step —
    irrelevant to ranking, decisive for reproducibility. Requires
    ``rank * w < 2**53`` (holds for graphs up to ~millions of nodes
    at the default scale; lower ``scale`` for bigger graphs).

    Scale design: each iteration is one shuffle on src (contribution
    join) + one on dst (the sum) over an edge list persisted WITH its
    out-weight — the same superstep shape as connected_components,
    no graph library. ``iterations`` is a fixed unroll (lineage
    depth ~3 joins per step), appropriate for the handful of steps
    ranking needs; dangling-node mass is dropped (standard
    simplification), so ranks are comparative, not a distribution.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    # Persist the projected edge list itself (r11): ``nodes`` (via
    # the endpoint explode), ``out`` and the ``ew`` join all consume
    # it — unpersisted, the upstream edge pipeline (often an
    # expensive multi-join) executed once per consumer just to BUILD
    # the two cached frames.
    # NOTE (r11): an explicit repartition("src") on this cache was
    # tried and REVERTED — in the at-scale (no-broadcast) regime the
    # `ew` build join is itself a sort-merge on src, so the cached ew
    # is already src-partitioned AND sorted for the iteration joins
    # (verified: plans/r11/pagerank_superstep_smj_{before,after}.txt
    # show the identical exchange-free superstep either way), and at
    # toy scale ranks broadcast so partitioning is moot (A/B neutral).
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    ).persist()
    # Both frames are referenced every superstep; without persist the
    # edge lineage re-executes 2x per iteration. They stay cached for
    # the loop's lifetime — node+edge sized, the working set of the
    # algorithm — and are released before return (every superstep is
    # materialized by its localCheckpoint, so nothing downstream can
    # still need them).
    nodes = (
        e.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        .distinct()
        .persist()
    )
    out = e.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = e.join(out, "src").persist()
    base = int((1.0 - damping) * scale)
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = ew.join(ranks, ew.src == ranks.node).select(
            "dst",
            F.floor(F.col("rank") * F.col("w") / F.col("wout"))
            .cast("long")
            .alias("c"),
        )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("insum"))
        ranks = (
            nodes.join(insum, nodes.node == insum.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(F.lit(damping) * F.coalesce("insum", F.lit(0)))
                )
                .cast("long")
                .alias("rank"),
            )
            # Materialize each superstep (node-table-sized) so the
            # final plan is ONE superstep deep, not iterations-deep —
            # unbounded lineage is what kills iterative DataFrame
            # algorithms long before data size does.
            .localCheckpoint()
        )
    # The final ranks are materialized (localCheckpoint above); the
    # working-set caches are dead weight from here on.
    for cached in (ew, nodes, e):
        cached.unpersist()
    return ranks
