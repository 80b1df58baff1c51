"""Iterative graph analytics beyond connected components.

The reference has no graph surface (its single join is the
legacy/tick merge, `/root/reference/src/hybrid_merger.py:175`);
connected components (``operators/dedup.py``) covers the dedup
clustering need. This module adds the other canonical iterative
pattern — PageRank-style score propagation — expressed the way an
iterative algorithm should be on Spark: a FIXED number of unrolled
join+aggregate rounds (the loop count is part of the contract, so the
plan is a static DAG Catalyst can see end-to-end, checkpoint-free at
small k).

Cross-engine exactness: floating-point PageRank sums are
order-dependent, so scores stay in SCALED INTEGER space end to end —
contributions use integer division ``r div deg``, the damping step is
``(85 · Σ) div 100 + 150000``, and every oracle mirrors the same
truncating arithmetic. Mass lost to truncation is deterministic and
identical on both engines; ranks are exact BIGINTs, no float
comparison anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Every node present as a source or destination starts at
    ``scale`` (i.e. 1.0 scaled); each round every node sends
    ``r div out_degree`` along each out-edge and collects
    ``teleport + (damping_pct · Σ incoming) div 100`` where
    ``teleport = ((100 - damping_pct) · scale) div 100``. Nodes with
    no in-edges keep the bare teleport term (left join + coalesce);
    dangling nodes (no out-edges) simply do not contribute — the
    standard simplification, deterministic here.

    Plan shape: ``iterations`` rounds of (hash join on src →
    re-aggregate on dst), all shuffles on the node key — the scale
    path is the same edge-partitioned propagation as the CC loop,
    with a static unrolled DAG instead of a convergence loop.

    Output: ``node``, ``pr_scaled`` (exact BIGINT, ``scale`` = 1.0).
    """
    from pyspark.storagelevel import StorageLevel

    # Each unrolled round re-consumes the edge list, the out-degrees
    # and the node set; persisting them (ids-only rows, DISK_ONLY)
    # keeps the caller's upstream DAG from being re-derived
    # ``iterations`` times (the dedup_clusters pairs lesson).
    e = edges.selectExpr(
        f"{src_col} AS src", f"{dst_col} AS dst"
    ).persist(StorageLevel.DISK_ONLY)
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist(StorageLevel.DISK_ONLY)
    )
    nodes = (
        e.selectExpr("src AS node")
        .union(e.selectExpr("dst AS node"))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    teleport = ((100 - damping_pct) * scale) // 100
    ranks = nodes.withColumn("pr", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.selectExpr("node AS src", "pr"), "src")
            .join(deg, "src")
            .selectExpr("dst AS node", "pr div deg AS c")
            .groupBy("node")
            .agg(F.sum("c").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .selectExpr(
                "node",
                f"{teleport}L + ({damping_pct}L * coalesce(__in, 0L))"
                " div 100 AS pr",
            )
        )
    return ranks.selectExpr("node", "pr AS pr_scaled")


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact global triangle census over an undirected graph, via the
    canonical two-join ordered-wedge plan: edges canonicalize to
    ``a < b`` (self-loops dropped, duplicates collapsed), wedges are
    ``(a<b) ⋈ (b<c)`` on the middle node, and a second join closes
    them against the edge set on ``(a, c)``. The ``a<b<c`` total order
    means each triangle is generated and counted exactly once — no
    division by 3/6, no double counting.

    Scale shape: two hash-partitioned shuffles (on the wedge pivot,
    then on the closing pair); wedge fan-out is Σ deg(b)², so at
    100 TB the standard mitigation is degree-based edge orientation
    before this operator (point high-degree endpoints at low-degree
    ones); id-orientation here keeps the contract deterministic.
    Everything is integer arithmetic except the final clustering
    coefficient, one double division mirrored in the oracle.

    Output (single row): n_edges, n_wedges, n_triangles,
    global_clustering (= 3·T/W, round 6, NULL when W=0).
    """
    from pyspark.storagelevel import StorageLevel

    e = (
        edges.selectExpr(
            f"least({src_col}, {dst_col}) AS a",
            f"greatest({src_col}, {dst_col}) AS b",
        )
        .filter("a < b")
        .distinct()
    )
    # The edge set feeds FIVE consumers (edge count, both degree
    # legs, both sides of the wedge join, the closing join) — without
    # persistence Catalyst re-derives the caller's whole upstream DAG
    # for each leg (the dedup_clusters pairs lesson, ROADMAP §23).
    # Ids-only rows, so DISK_ONLY is cheap at any scale.
    e = e.persist(StorageLevel.DISK_ONLY)
    deg = (
        e.selectExpr("a AS node")
        .union(e.selectExpr("b AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    w = e.alias("e1").join(
        e.selectExpr("a AS b", "b AS c").alias("e2"), "b"
    ).select("a", "c")
    tri = w.join(e.selectExpr("a", "b AS c"), ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        n_edges.crossJoin(wedges)
        .crossJoin(tri)
        .selectExpr(
            "n_edges",
            "n_wedges",
            "n_triangles",
            "round(3.0D * n_triangles / n_wedges, 6)"
            " AS global_clustering",
        )
    )
