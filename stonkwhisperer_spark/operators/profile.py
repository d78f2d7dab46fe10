"""Data-profiling operators (SURVEY.md §2.5 A6–A8).

Reference: ``data_analysis`` (data_pipeline/tasks/transformation.py:
240-260) prints null-percentage per column (:259-260), duplicated-row
counts (:250-251) and dtypes (:240-257) after each transform. Here the
profile is a single DataFrame you can assert on, join, or write.

Scale: one aggregate pass. Exact ``count(distinct)`` per column compiles
to an Expand (input replicated once per distinct-aggregate) — fine for a
profiler run on a sample or partition; pass ``approx=True`` at 100 TB to
use HLL sketches (approx_count_distinct) with no Expand.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None, approx: bool = False) -> DataFrame:
    """Long-format profile: one row per column with
    (col_name, dtype, null_pct, n_distinct), plus a ``__row__`` row
    whose n_distinct is the count of distinct full rows (A7 — dup rows
    = total - distinct).
    """
    cols = list(cols or df.columns)
    dtypes = dict(df.dtypes)
    nd = F.approx_count_distinct if approx else F.countDistinct

    aggs = [
        F.count(F.lit(1)).alias("_total"),
        nd(F.struct(*cols)).alias("_distinct_rows"),
    ]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(nd(F.col(c)).alias(f"_nd_{c}"))
    one = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(dtypes[c]).alias("dtype"),
            ((F.col(f"_null_{c}") * 100.0) / F.col("_total")).alias("null_pct"),
            F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
        )
        for c in cols
    ]
    entries.append(
        F.struct(
            F.lit("__row__").alias("col_name"),
            F.lit("row").alias("dtype"),
            F.lit(None).cast("double").alias("null_pct"),
            F.col("_distinct_rows").cast("long").alias("n_distinct"),
        )
    )
    return one.select(F.explode(F.array(*entries)).alias("p")).select("p.*")
