"""As-of (backward) join — the time-series join the reference's
bars↔sentiment analysis needs (SURVEY §2.4 note, §7.2 M5): for each
left row, the latest right row with right.ts <= left.ts on the same key.

Spark has no native as-of join; the scalable construction is the
union + window trick:

  1. tag both sides and union them on (key, ts, side, payload);
  2. one window per key ordered by (ts, side) — right rows sort BEFORE
    left rows at equal ts, making the join inclusive;
  3. ``last(value, ignorenulls)`` carries the latest right payload
    forward; rows tagged left emit it.

Cost: ONE shuffle + per-key sort over |L|+|R| rows — no range-explosion
join, no per-row lookups, no broadcast requirement. This is the plan
you want at 100 TB (compare: an inequality join would be a cross-ish
range join; a per-left subquery would be quadratic).

``zip_join`` is the positional join J1 (reference extraction.py:178-179
zips fetched articles back onto posts by list position). The exact
emulation needs a GLOBAL row_number — a single-partition sort, fine for
reference-parity tests, an anti-pattern at scale; production code uses
the url-equi respec (posts_link_articles query) instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join. ``right`` must be unique per
    (on..., right_ts) — pre-dedup it (row_number) otherwise; the pick
    among equal timestamps would be nondeterministic.

    ``direction``: 'backward' (latest right at/before left_ts — the
    default) or 'forward' (earliest right at/after left_ts). Forward is
    the same union+window plan over time reversed: the window orders by
    (ts DESC) so the running ``last`` carries the NEXT right payload —
    still one shuffle, no range explosion.

    ``tolerance``: optional max lookback/lookahead (an INTERVAL literal
    string, e.g. '15 minutes') — matches farther than it become null,
    mirroring pandas.merge_asof(tolerance=...).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lpay"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lpay"].dataType).alias("_lpay"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"),
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        W.partitionBy(*on)
        .orderBy(ts_order, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *on,
        "_ts",
        "_side",
        "_lpay",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
        F.last("_rts", ignorenulls=True).over(w).alias("_rts"),
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        if direction == "backward":
            within = F.col("_rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            within = F.col("_rts") <= F.col("_ts") + F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *on,
            "_ts",
            "_lpay",
            *[F.when(within, F.col(f"_r_{c}")).alias(f"_r_{c}") for c in value_cols],
        )
    sel = [*on, F.col("_ts").alias(left_ts)]
    sel += [F.col("_lpay").getField(c).alias(c) for c in lcols]
    sel += [F.col(f"_r_{c}").alias(c) for c in value_cols]
    return out.select(*sel)


def zip_join(left: DataFrame, right: DataFrame, order_left, order_right) -> DataFrame:
    """J1 exact emulation: pair the i-th left row with the i-th right
    row under the given orderings. Global row_number ⇒ single-partition
    sort — parity/testing only; respec to a key-equi join at scale, or
    use :func:`dist_zip_join` when positional semantics must stay."""
    wl = W.orderBy(*([order_left] if not isinstance(order_left, list) else order_left))
    wr = W.orderBy(*([order_right] if not isinstance(order_right, list) else order_right))
    ln = left.withColumn("_zip_rn", F.row_number().over(wl))
    rn = right.withColumn("_zip_rn", F.row_number().over(wr))
    return ln.join(rn, "_zip_rn", "inner").drop("_zip_rn")


def _global_rank(df: DataFrame, order_cols: list, nparts: int) -> DataFrame:
    """Global 1-based rank under ``order_cols`` WITHOUT a global sort:
    range-partition on the order keys, materialize ONCE (the partition
    assignment must be identical for the count pass and the rank pass —
    range boundaries come from sampling, so two executions of the same
    exchange could disagree; the checkpoint pins one assignment), then
    rank = per-partition row_number + broadcast cumulative offsets of
    the actual partition sizes. The offsets window is unpartitioned but
    runs over ≤ nparts rows — bounded by construction. The DataFrame
    form of RDD.zipWithIndex."""
    part = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offs = (
        part.groupBy("_pid")
        .count()
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("count").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    local = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn("_lrn", F.row_number().over(local))
        .join(F.broadcast(offs), "_pid")
        # bigint, NOT int: at the advertised scale a side can exceed
        # 2^31 rows and a 32-bit rank would wrap (colliding join keys).
        .withColumn("_zip_rn", (F.col("_lrn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def dist_zip_join(
    left: DataFrame,
    right: DataFrame,
    order_left,
    order_right,
    nparts: int = 32,
) -> DataFrame:
    """The SCALE path for :func:`zip_join` — the same J1 positional
    relation with no single-partition sort anywhere: each side earns a
    global rank from range-partitioned local row_numbers plus broadcast
    cumulative partition-size offsets (``_global_rank``), then the pair
    is one hash equi-join on the dense rank. Cost at 100 TB, per side:
    one range shuffle, one uniform hash shuffle on _pid for the local
    rank window (Spark cannot prove the checkpoint layout already
    satisfies the window's clustering), and a ≤ nparts-row offsets
    broadcast; then one uniform join shuffle on the rank. Every stage
    is full-width — vs zip_join's two single-partition sorts.
    Result-identical to zip_join (pytest + shared oracle)."""
    ol = [order_left] if not isinstance(order_left, (list, tuple)) else list(order_left)
    orr = [order_right] if not isinstance(order_right, (list, tuple)) else list(order_right)
    ln = _global_rank(left, ol, nparts)
    rn = _global_rank(right, orr, nparts)
    return ln.join(rn, "_zip_rn", "inner").drop("_zip_rn")
