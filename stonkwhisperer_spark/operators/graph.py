"""Iterative graph operators (beyond connected components, which lives
in operators/dedup.py next to its dedup consumers).

``pagerank`` is the Pregel-shaped iteration expressed as DataFrame
joins: per round, every node's rank flows along its out-edges and
re-aggregates — one equi-join + one partial-aggregated groupBy per
iteration, the standard Spark respec of message passing. Arithmetic is
INTEGER fixed point end to end, so the result is deterministic across
engines and partitionings (the usual double PageRank cannot be
hash-gated: partial-agg order drifts the low bits):

  * damping d = num/den (default 17/20 = 0.85) as an exact fraction;
  * ranks carry ``scale`` fixed-point units; the initial rank is
    scale DIV n_nodes;
  * each edge contributes (num * r_src) DIV (den * outdeg_src) —
    integer floor division per edge, then an EXACT integer sum;
  * the teleport term is ((den - num) * scale) DIV (den * n_nodes).

The floor per edge leaks O(1) units of mass per (edge, iteration) —
bounded by |E| * iters / scale relative error, ~1e-6 at the default
scale — a deterministic quantization, not a numerical drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list. Returns
    (node, rank_scaled) for every node that appears as a src or dst.

    Nodes without out-edges (dangling) keep only the teleport term —
    their mass is dropped rather than redistributed (the
    sparse-friendly variant; the caller can add a dangling-mass term
    if the graph needs it). Scale: per iteration ONE equi-join of the
    edge list against the current ranks (both sides keyed on node ids,
    hash-uniform) and one partial-aggregated sum keyed on dst; the
    edge list with out-degrees attached is materialized once
    (eager localCheckpoint) so the per-iteration plan re-reads a
    compact relation instead of replaying edge derivation — the same
    discipline as connected_components' closure checkpoint."""
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    outdeg = e.groupBy("_src").agg(F.count("*").alias("_outd"))
    ew = e.join(outdeg, "_src").localCheckpoint(eager=True)
    nodes = (
        ew.select(F.col("_src").alias("node"))
        .unionByName(ew.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one driver scalar, like the CC convergence sums
    base = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)
    # bigint from the start: a Python int below 2^31 would otherwise
    # land as int32 and the 17*r products overflow 32-bit under ANSI.
    ranks = nodes.withColumn(
        "rank_scaled", F.lit(scale // n_nodes).cast("bigint")
    )
    contrib_expr = F.expr(
        f"CAST(({damping_num} * rank_scaled) DIV "
        f"({damping_den} * _outd) AS BIGINT)"
    )
    for i in range(iterations):
        inflow = (
            ew.join(ranks, ew["_src"] == ranks["node"])
            .select(F.col("_dst").alias("node"), contrib_expr.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.coalesce(F.col("_in"), F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("rank_scaled"),
        )
        if (i + 1) % 4 == 0 and i + 1 < iterations:
            # Truncate the growing join lineage every few rounds; the
            # relation is n_nodes rows, so the materialization is cheap.
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
