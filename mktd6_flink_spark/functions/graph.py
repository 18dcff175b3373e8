"""Distributed graph primitives shared by the graph_* plan entries.

Reference parity note: the reference workshop repo has no graph
operators; this module is part of the large-scale-pipeline extension
surface (alongside dedup/similarity/text), built on the classic
published formulations (Raghavan 2007 label propagation; the
connected-components core lives in functions/dedup.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def lpa_labels(edges: DataFrame, iters: int) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert, Kumara 2007)
    over a DIRECTED edge list ``(src, dst)`` — pass both directions
    for an undirected graph. Every node starts labeled with itself;
    each iteration a node adopts the most frequent label among its
    in-neighbors PLUS its own current label (the self-vote damps the
    oscillation synchronous LPA exhibits on bipartite graphs), ties
    broken by the SMALLEST label. Fixed iteration count + total tie
    order make the result fully deterministic, so an external oracle
    can replay it exactly.

    Scale shape per iteration: one equi-join of the edge table
    against the (node, label) table on the same key every round (a
    real cluster co-locates them after the first shuffle), one
    partial-aggregated groupBy(node, label) vote count — a hub's
    million identical votes combine map-side before they travel —
    and a min_by argmax per node (no sort, no window over data).
    Labels are node ids and never grow; the vote table is bounded by
    the edge count. Returns (node, lbl).

    Each generation's label table is persisted: an iteration consumes
    the PREVIOUS labels twice (the vote join + the self-vote union),
    so unpersisted lineage doubles per round — 2^iters re-executions
    of the seed by the last generation (persist_audit; the per-level
    pattern shared with the k-hop BFS and the BPE trainer). Released
    at the caller's entry boundary like every two-phase cache.
    """
    from ..operators import cache

    labels = cache.maybe_persist(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("lbl")))
    for _ in range(iters):
        votes = (edges
                 .join(labels.select(F.col("node").alias("_sn"), "lbl"),
                       F.col("src") == F.col("_sn"))
                 .select(F.col("dst").alias("node"), "lbl")
                 .groupBy("node", "lbl")
                 .agg(F.count(F.lit(1)).alias("c"))
                 .unionByName(labels.select(
                     "node", "lbl", F.lit(1).cast("long").alias("c")))
                 .groupBy("node", "lbl").agg(F.sum("c").alias("cnt")))
        # argmax by (cnt DESC, lbl ASC) == min over the (-cnt, lbl) key
        labels = cache.maybe_persist(votes.groupBy("node").agg(
            F.min_by("lbl", F.struct((-F.col("cnt")).alias("a"),
                                     F.col("lbl").alias("b"))).alias("lbl")))
    return labels
