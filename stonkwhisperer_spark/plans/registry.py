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
        if name in QUERIES:
            # Last-wins would silently shadow the earlier query — the
            # driver's archived-green rows would then refer to dead
            # code. Fail at import instead.
            raise ValueError(
                f"duplicate query registration: '{name}' "
                f"(first: {QUERIES[name].fn.__module__}, "
                f"second: {fn.__module__})"
            )
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
# 50 is archived-green with code either unchanged since its recorded row
# or changed only through a mechanically-shared edit (e.g. the r12
# bounded_collect helper) whose family representative IS gated inside the
# window. Rotate this list each round so every oracle-bearing query
# accumulates a recorded green row.
# ---------------------------------------------------------------------------
_GATE_ORDER: list[str] = [
    # ======================= ROUND-16 WINDOW =======================
    # -- 8 leads: one representative per engine path round 16 changed
    #    (VERDICT r15 task 6: "lead with whatever r16 touches — merge
    #    engine and stream-source families first"). The merge engine's
    #    touched-slice materialization + observe-counted CDC staging
    #    sit under every one of these; the CDC stream source's
    #    log-size split packing under the three stream consumers. --
    "txlog_stream_upsert",       # CDC-consumer drain (source + pin dedup)
    "txlog_stream_cdc",          # raw change-feed subscription
    "txlog_stream_sink",         # feed → txn append sink
    "bm25_index_upsert",         # merge engine, batch-shaped MERGE
    "txlog_merge_sync_replay",   # WHEN NOT MATCHED BY SOURCE branch
    "txlog_dv_replay",           # DV writers (counted CDC staging)
    "txlog_cdc_update_replay",   # update_where path
    "txlog_replace_where",       # overwrite_where path
    # -- the full r12-stale cohort (42 queries; newest recorded green
    #    row round 12 for all, computed from CORRECTNESS_r*.json).
    #    After this window closes the newest-green floor moves to r13
    #    (r13=48, r14=50, r15=50 remain). --
    "benchmark_contamination",
    "big_order_customers",
    "click_surplus_multiset",
    "clickers_and_buyers",
    "cust_order_dist",
    "customer_order_ranks",
    "disjunctive_promo_revenue",
    "doc_constraints",
    "doc_split_assign",
    "doc_token_positions_udtf",
    "event_prop_keys",
    "event_sessions",
    "gapfill_events",
    "kmv_distinct_estimate",
    "media_manifest",
    "minhash_index_forget",
    "minhash_index_upsert",
    "mixture_sample",
    "order_deciles",
    "order_price_quantiles",
    "order_relative_ranks",
    "orders_monthly",
    "pii_scrub",
    "price_qty_correlation",
    "purchase_funnel",
    "quality_filter",
    "region_revenue",
    "simhash_signatures",
    "streaming_dedup",
    "streaming_join",
    "streaming_ohlcv",
    "streaming_sessions",
    "streaming_sketch",
    "text_quality",
    "token_stats",
    "trailing_30d_spend",
    "txlog_bloom_lookup",
    "txlog_clone_replay",
    "txlog_e2e_state",
    "txlog_merge_evolve",
    "vwap_1min",
    "weekly_cohort_retention",
    # (distribution going INTO this round, from the artifacts:
    #  r15=50, r14=50, r13=48, r12=42, floor r12. This window = 8
    #  r16-touched leads + the whole r12 cohort; the never-recorded
    #  set stays exactly the three no-oracle side-effecting surfaces,
    #  each with a hash-gated companion. Round 17's window should
    #  rotate the r13-stale cohort plus whatever round 16 changed.)
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
