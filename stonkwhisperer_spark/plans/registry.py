"""Query registry backing __spark_entry__.py.

Every operator in SURVEY.md §2 that we claim as implemented registers a
(spark, sf_dir) -> DataFrame callable here, plus — whenever the operator
is SQL-expressible — the equivalent DuckDB oracle SQL. The driver runs
both sides at sf0.01 and compares row count + schema + order-insensitive
value hash, so:

* every computed column is aliased identically on both sides;
* double aggregations are computed exactly (sum over DECIMAL, cast to
  double at the end) so the hash cannot drift with partial-agg order;
* nondeterministic picks (dedup victims, arg_min ties) are made
  deterministic with explicit tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    _load()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _load()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def _load() -> None:
    # Import for side effect: module-level @register calls populate QUERIES.
    from stonkwhisperer_spark.plans import (  # noqa: F401
        queries,
        queries_agg,
        queries_extensions,
        queries_flows,
        queries_joins,
        queries_llm,
        queries_pipelines,
        queries_sessions,
        queries_text,
        queries_timeseries,
        queries_tpch,
    )
