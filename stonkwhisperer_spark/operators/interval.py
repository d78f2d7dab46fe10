"""Interval joins at scale: grid decomposition.

``events_in_promo_windows`` handles the small-window-set case by
broadcasting the interval side (range predicate evaluated inside a
broadcast join). When BOTH sides are large that degenerates into a
broadcast/cartesian nested loop — the classic interval-join failure
mode. The standard fix (used by every range-join-capable engine, e.g.
Spark's own storage-partitioned range join work and DuckDB's IEJoin
alternatives) is to bucketize time into fixed grid cells:

  * each interval [s, e) is exploded to every cell it overlaps —
    ceil(len/cell)+1 rows, constant for bounded interval lengths;
  * each point maps to exactly ONE cell;
  * join becomes an EQUI join on (keys..., cell) — hash shuffle both
    sides, no nested loop — followed by the exact range filter.

Each (interval, point) pair meets in exactly one cell (the point's),
so no dedup is needed. Pick ``cell_seconds`` ≈ the typical interval
length: smaller cells → more interval replication; larger cells → more
false candidates for the residual filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_grid(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    cell_seconds: int = 300,
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``start <= ts < end`` (and equal ``keys``), as a pure equi-join on
    (keys..., grid cell) plus a residual range filter — never a nested
    loop, regardless of either side's size.

    Non-key column names must be disjoint between the two inputs (the
    join would otherwise be ambiguous); alias before calling.

    Scale: one hash shuffle per side on (keys, cell). Interval rows
    replicate by their cell span (2 rows for intervals shorter than a
    cell); points never replicate. Skewed cells (a hot key×time bucket)
    respond to the same salting as any hash join."""
    cell_us = int(cell_seconds) * 1_000_000
    p_cell = F.expr(f"unix_micros(cast({point_ts} as timestamp)) div {cell_us}")
    i_first = F.expr(f"unix_micros(cast({start_col} as timestamp)) div {cell_us}")
    # end is exclusive: the last overlapped cell is the one holding end-1µs
    i_last = F.expr(f"(unix_micros(cast({end_col} as timestamp)) - 1) div {cell_us}")

    pts = points.withColumn("_cell", p_cell)
    cells = intervals.withColumn("_cell", F.explode(F.sequence(i_first, i_last)))
    return (
        pts.join(cells, [*keys, "_cell"])
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("_cell")
    )
