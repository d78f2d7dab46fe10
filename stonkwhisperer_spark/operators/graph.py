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
    broadcast_max_nodes: int = 2_000_000,
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
    discipline as connected_components' closure checkpoint.

    Join strategy (optimization r15, guide §3.1): the rank relation is
    one row per node — when ``n_nodes`` (already counted for the
    teleport term) is at most ``broadcast_max_nodes``, the
    per-iteration edge×ranks join BROADCASTS the rank side, removing
    the edge list's shuffle+sort from every round (the initial plan
    was 8 SortMergeJoins each re-exchanging the full edge relation;
    checkpointed inputs carry no size stats, so neither auto-broadcast
    nor AQE could make this pick). The 2M-row default is ~50 MB
    broadcast; above it the shuffle join is the right plan and nothing
    changes. Join strategy never affects the integer fixed-point
    values."""
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
    bcast_ranks = n_nodes <= broadcast_max_nodes
    for i in range(iterations):
        rank_side = F.broadcast(ranks) if bcast_ranks else ranks
        inflow = (
            ew.join(rank_side, ew["_src"] == rank_side["node"])
            .select(F.col("_dst").alias("node"), contrib_expr.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # inflow is likewise <= n_nodes rows (one per dst) — hint it
        # too: after the rank-side broadcast above, Catalyst's size
        # estimate for inflow's subtree inflates past the auto
        # threshold and this left join would fall back to a
        # sort-merge of the node relation every round.
        inflow_side = F.broadcast(inflow) if bcast_ranks else inflow
        ranks = nodes.join(inflow_side, "node", "left").select(
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
