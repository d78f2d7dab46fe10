"""Data-quality constraint checks (SURVEY §4: the reference enforces
NUMERIC(12,4)/NOT NULL/VARCHAR(n)/unique at the Postgres layer — e.g.
models/article.py:64-69 url VARCHAR(2048) UNIQUE, models/stock_bar.py:
20-22 composite unique, :42-57 NOT NULL money columns).

Parquet/Delta-parquet has no constraint engine, so the engine-side
equivalent is a declarative check pass you run before (or after) a
write: one scan computing all row-level violations + one aggregate per
uniqueness key. On Delta these map to CHECK / NOT NULL constraints and
MERGE keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    not_null: Sequence[str] = (),
    max_length: dict[str, int] | None = None,
    unique: Sequence[Sequence[str]] = (),
) -> DataFrame:
    """Long-format constraint report: (constraint, n_violations).

    Row-level checks (not_null, max_length) run in ONE aggregate pass
    over the data; each uniqueness key adds one groupBy (duplicates =
    rows beyond the first per key). Empty report rows are kept so a
    clean run is distinguishable from a skipped check.
    """
    max_length = max_length or {}
    aggs = []
    names = []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)))
    for c, n in max_length.items():
        names.append(f"max_length:{c}<={n}")
        aggs.append(F.count(F.when(F.length(c) > n, 1)))
    parts = []
    if aggs:
        row = df.agg(*[a.alias(f"_c{i}") for i, a in enumerate(aggs)])
        entries = [
            F.struct(
                F.lit(name).alias("constraint"),
                F.col(f"_c{i}").cast("long").alias("n_violations"),
            )
            for i, name in enumerate(names)
        ]
        parts.append(row.select(F.explode(F.array(*entries)).alias("p")).select("p.*"))
    for keys in unique:
        keys = list(keys)
        dup = (
            df.groupBy(*keys)
            .agg((F.count("*") - 1).alias("_extra"))
            .agg(F.coalesce(F.sum("_extra"), F.lit(0)).cast("long").alias("n_violations"))
            .select(
                F.lit(f"unique:({','.join(keys)})").alias("constraint"), "n_violations"
            )
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
