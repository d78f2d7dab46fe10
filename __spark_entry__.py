"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over stonkwhisperer_spark.plans.registry: every implemented
operator from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame
callable plus (when SQL-expressible) DuckDB oracle SQL.

Session side effect (explicit driver contract): the first query run on
a hosting session pins two runtime confs globally —
``spark.sql.session.timeZone=UTC`` (oracle timestamps are naive-UTC)
and ``spark.sql.legacy.parquet.nanosAsLong=true`` (events.parquet
carries TIMESTAMP(NANOS); later parquet reads in the same session see
ns columns as int64). Both are guarded set-once in
stonkwhisperer_spark/sources/tables.py::_pin_session_confs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stonkwhisperer_spark.plans.registry import oracle_map, query_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_map()["ohlcv_1min"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return oracle_map()
