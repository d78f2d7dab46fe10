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
# 50 is archived-green from rounds 2-3 with unchanged code. Rotate this
# list each round so every oracle-bearing query accumulates a recorded
# green row.
# ---------------------------------------------------------------------------
_GATE_ORDER: list[str] = [
    # -- new in round 6 (third wave): DSIR importance resampling,
    #    integer-exact k-means + SemDeDup, txlog DEEP CLONE --
    "dsir_sample",
    "semantic_clusters",
    "semantic_dedup",
    "txlog_clone_replay",
    "txlog_incremental_agg",
    "bpe_merges",
    "near_dup_jaccard_prefix",
    # -- new in round 6 (second half): deletion vectors, column
    #    mapping, generated columns, bloom index, log checkpointing,
    #    type widening, replaceWhere, 3-clause MERGE, CDC replication
    #    stream, plus the LLM/OLAP additions --
    "txlog_dv_replay",
    "txlog_rename_replay",
    "txlog_generated",
    "txlog_bloom_lookup",
    "txlog_checkpoint_replay",
    "txlog_type_widening",
    "txlog_update_replay",
    "txlog_replace_where",
    "txlog_merge_sync_replay",
    "txlog_stream_upsert",
    "revenue_rollup",
    "lineitem_status_cube",
    "sq8_topk_embeddings",
    "bigram_familiarity",
    "doc_chunks",
    "doc_keywords",
    "corpus_shuffle",
    # -- new in round 6 (first half): MERGE upsert + typed CDC,
    #    closed-form ML gate, 2-D Z-order skipping, RESTORE +
    #    timestamp travel, exactly-once txn streaming sink --
    "txlog_cdc_update_replay",
    "txlog_cdc_delete_replay",
    "sentiment_closed_form",
    "txlog_skipping_2d",
    "txlog_restore_replay",
    "txlog_stream_sink",
    "span_dedup",
    "txlog_constraints",
    "txlog_vacuum_replay",
    "txlog_history",
    "histogram_quantiles",
    # -- changed in round 6 (typed CDC in table_changes/stream source,
    #    zone-map hardening, star-CC fallback, postings checkpoint,
    #    per-run bucketed tables): re-confirm under the driver --
    "txlog_cdc_replay",
    "txlog_stream_cdc",
    "txlog_skipping",
    "txlog_schema_evolution",
    "bucketed_order_lineitem_join",
    "dup_clusters",
    "dedup_canonical",
    "curation_e2e",
    # -- rows-only by design: keep a recorded smoke row every round --
    "txlog_e2e",
    "flows_e2e",
    "sentiment_scores",
    # -- oldest archived-green (last recorded row: round 3) --
    "ohlcv_1min",
    "pricing_summary",
    "topk_newest_events",
    "user_event_pivot",
    "vwap_1min",
    "clickers_and_buyers",
    "value_outliers",
    "click_surplus_multiset",
    "simhash_signatures",
    "orders_monthly",
    "order_price_quantiles",
    "trailing_30d_spend",
    "order_deciles",
    "event_prop_keys",
    "order_relative_ranks",
    "zip_docs_embeddings",
    "region_revenue",
    # -- r4-green rotation: unchanged code, oldest families first --
    "streaming_ohlcv",
    "streaming_join",
    "streaming_sessions",
    "streaming_dedup",
    "doc_token_positions_udtf",
    "benchmark_contamination",
    "pii_scrub",
    "kmv_distinct_estimate",
    "event_sessions",
    "purchase_funnel",
    "weekly_cohort_retention",
    "text_quality",
    "token_stats",
    "quality_filter",
    "mixture_sample",
    "media_manifest",
    "gapfill_events",
    "price_qty_correlation",
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
