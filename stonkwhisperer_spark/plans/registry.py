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
    # ======================= ROUND-12 WINDOW =======================
    # -- the one oracle-bearing query with NO recorded driver row
    #    (registered after the r11 window froze; VERDICT r11 task 1
    #    says lead with it) --
    "corpus_drift",
    # -- new in round 12: the third retrieval/dedup index-MAINTENANCE
    #    twin (VERDICT r11 task 2) — the LSH band table MERGE-maintained
    #    through the txlog, candidate pairs hash-gated against a
    #    from-scratch re-banding --
    "minhash_index_upsert",
    # -- changed in round 12 (VERDICT r11 task 3): the gate relation is
    #    now a per-cell digest (count + modular checksums + min/max)
    #    instead of the O(corpus) assignment table --
    "ivf_assign_incremental",
    # -- new in round 12: the DELETE and REPLACE arms of index
    #    maintenance — right-to-be-forgotten erasure cascaded into the
    #    BM25 tf index (deletion-vector mask + compaction purge) and
    #    the LSH band index (copy-on-write rewrite), each hash-gated
    #    against a from-scratch rebuild on the kept corpus; and the
    #    offline re-cluster that atomically swaps the IVF assignment
    #    table for a new quantizer's output --
    "bm25_index_forget",
    "minhash_index_forget",
    "ivf_recluster_replace",
    # -- changed in round 12: every harness-glue materialization in
    #    plans/ now routes through glue.bounded_collect (VERDICT r11
    #    task 5). The conversion is one shared helper across ~40 sites;
    #    these four re-gate a representative of every converted family
    #    not already covered above or by the stale cohort below (flows
    #    state, the stream-sketch drains, txlog e2e, the bucketed-join
    #    rollup; txlog_history / streaming_cms / bm25_index_upsert keep
    #    their r11 rows — bm25_index_upsert's converted site is the
    #    byte-identical "top-k scored postings" collect that
    #    bm25_index_forget gates above, txlog_history additionally
    #    carries this round's idle-box probe in BENCH_METHOD.md, and
    #    streaming_cms shares streaming_sketch's drain shape) --
    "bucketed_order_lineitem_join",
    "flows_e2e_state",
    "streaming_sketch",
    "txlog_e2e_state",
    # -- the full r7-stale cohort (40 queries; newest recorded green
    #    row round 7 for all — VERDICT r11 task 1). After this window
    #    closes the newest-green floor moves to r9. --
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
    "text_quality",
    "token_stats",
    "trailing_30d_spend",
    "txlog_bloom_lookup",
    "txlog_clone_replay",
    "txlog_merge_evolve",
    "txlog_merge_sync_replay",
    "value_outliers",
    "vwap_1min",
    "weekly_cohort_retention",
    # (after this window closes, every oracle-bearing query's newest
    #  green row is r9+ and the never-recorded set is exactly the three
    #  no-oracle side-effecting surfaces, each with a hash-gated
    #  companion: flows_e2e -> flows_e2e_state, txlog_e2e ->
    #  txlog_e2e_state, sentiment_scores -> sentiment_closed_form.
    #  Round 13's window should rotate the r9-stale cohort (~42) plus
    #  whatever round 12 changed.)
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
