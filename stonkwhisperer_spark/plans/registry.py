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


# ---------------------------------------------------------------------------
# Gate-window ordering. The external driver's correctness gate checks the
# FIRST 50 queries in registration order, so the registry is explicitly
# reordered after module import: queries that have never had a recorded
# correctness row, were added or changed this round, or re-confirm an
# archived-green family representative go first; everything after position
# 50 is archived-green from rounds 2-3 with unchanged code. Rotate this
# list each round so every oracle-bearing query accumulates a recorded
# green row.
# ---------------------------------------------------------------------------
_GATE_ORDER: list[str] = [
    # -- never had a correctness row in any round (r4 rotation targets) --
    "quality_filter",
    "pack_documents",
    "mixture_sample",
    "doc_split_assign",
    "source_capped_sample",
    "token_stats",
    "media_headers",
    "revenue_cube",
    "cust_order_dist",
    "idle_rich_customers",
    "part_value_share",
    "priority_order_counts",
    "promo_revenue_share",
    "steel_part_suppliers",
    "top_customer_per_nation",
    # -- new or changed in round 4 --
    "streaming_join",
    "streaming_sessions",
    "streaming_dedup",
    "sql_top_brands_by_region",
    "purchase_funnel",
    "weekly_cohort_retention",
    "nation_trade_volume",
    "top_supplier_revenue",
    "disjunctive_promo_revenue",
    "event_type_enrich_salted",
    "kmv_distinct_estimate",
    "media_pixel_stats",
    "user_event_runs",
    "doc_token_positions_udtf",
    "txlog_e2e",
    "benchmark_contamination",
    "pii_scrub",
    "big_order_customers",
    "sole_return_suppliers",
    "small_order_part_revenue",
    "price_qty_correlation",
    "flows_e2e",
    "streaming_ohlcv",
    "sentiment_scores",
    # -- operator code changed this round (dedup.py convergence guard) --
    "dup_clusters",
    # -- green in r02 but never re-confirmed since --
    "event_sessions",
    "text_quality",
    "doc_constraints",
    "media_manifest",
    "gapfill_events",
    "forecast_revenue",
    "shipping_priority",
    "revenue_rollup",
    "customer_order_ranks",
    "large_orders",
]


def _load() -> None:
    # Import for side effect: module-level @register calls populate QUERIES.
    from stonkwhisperer_spark.plans import (  # noqa: F401
        queries,
        queries_agg,
        queries_curation,
        queries_extensions,
        queries_flows,
        queries_joins,
        queries_llm,
        queries_pipelines,
        queries_python,
        queries_sessions,
        queries_text,
        queries_timeseries,
        queries_tpch,
        queries_tpch2,
    )

    missing = [n for n in _GATE_ORDER if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_GATE_ORDER names unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in _GATE_ORDER}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
