"""Stock-bars transform pipeline (reference data_pipeline/tasks/
transformation.py:184-231 — transform_alpaca_data).

Step order follows the reference: numeric coercion with null-on-error
(:198-202) → sort + per-symbol gap-fill (:206-215) → volume 0-fill
(:214) → drop still-null prices (:217-218) → rename symbol→ticker
(:226).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.gapfill import gap_fill

PRICE_COLS = ("open", "high", "low", "close", "vwap")
VOLUME_COLS = ("volume", "trade_count")
_PRICE_TYPE = "decimal(12,4)"  # NUMERIC(12,4), reference models/stock_bar.py:42-57


def clean_bars(raw: DataFrame, tiebreak_col: str = "_arrival_id") -> DataFrame:
    """RAW_BARS_SCHEMA (+ tie-break column for duplicate timestamps) →
    clean stock_bars frame.

    * C9 ``try_cast`` coercion: malformed price/volume strings → null
      (reference pd.to_numeric(errors='coerce'), :198-202). Explicit
      try_cast keeps behavior identical under ANSI mode.
    * W1–W3 per-symbol ffill/bfill of price columns ordered by
      (timestamp, tie-break) (:206-215).
    * W4 constant 0-fill of volume columns (:214).
    * F10 drop rows whose prices are still null (:217-218).
    * F5 rename symbol→ticker (:226).

    Scale: one shuffle on symbol for the gap-fill windows; coercion and
    filters are map-side. Symbol is the reference's natural partition
    key (15 tickers in the reference; thousands in production — pair
    with date bucketing at 100 TB, see sinks).
    """
    ts = F.col("timestamp")
    if dict(raw.dtypes).get("timestamp") == "string":
        ts = F.col("timestamp").cast("timestamp_ntz")  # C5
    coerced = raw.select(
        F.col("symbol"),
        ts.alias("bar_ts"),
        F.col(tiebreak_col),
        *[F.col(c).try_cast(_PRICE_TYPE).alias(c) for c in PRICE_COLS],
        *[F.col(c).try_cast("int").alias(c) for c in VOLUME_COLS],
    )
    filled = gap_fill(
        coerced,
        keys=["symbol"],
        order=["bar_ts", tiebreak_col],
        fill_cols=list(PRICE_COLS),
        const_fill=dict.fromkeys(VOLUME_COLS, 0),
    )
    return (
        filled.na.drop("any", subset=list(PRICE_COLS))
        .withColumnRenamed("symbol", "ticker")
        .drop(tiebreak_col)
    )
