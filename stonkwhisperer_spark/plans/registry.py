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
    # -- r4 red rows; oracle CAST(... AS BIGINT) fixed this round --
    "pack_documents",
    "user_event_runs",
    # -- registered outside the r4 window; never driver-checked --
    "nation_market_share",
    "product_profit_by_nation",
    "returned_item_customers",
    "shipping_delay_priority",
    "part_supplier_counts",
    # -- new in round 5: hash-checked CDC rows for the txlog family --
    "txlog_cdc_replay",
    "txlog_stream_cdc",
    "bucketed_order_lineitem_join",
    "doc_repetition",
    "dedup_canonical",
    "txlog_skipping",
    "txlog_schema_evolution",
    "temperature_mixture",
    "curation_e2e",
    "event_weighted_stats_udaf",
    # -- rows-only by design: keep a recorded smoke row every round --
    "txlog_e2e",
    "flows_e2e",
    "sentiment_scores",
    # -- oldest archived-green (last recorded row: round 2) --
    "distinct_event_types",
    "profile_documents",
    # -- r3-green rotation: unchanged code, re-confirm oldest first --
    "api_ingest_e2e",
    "asof_next_sentiment",
    "asof_sentiment_bars",
    "bars_clean",
    "bars_enrich",
    "clean_documents",
    "click_buy_reconcile",
    "clickers_minus_buyers",
    "dedup_keep_first",
    "dedup_low_card",
    "doc_fingerprints",
    "doc_shingles",
    "embedding_lsh_buckets",
    "embedding_near_dup",
    "event_type_stats_salted",
    "events_in_promo_windows",
    "events_in_promo_windows_grid",
    "events_props_parsed",
    "events_schema_evolution_union",
    "fuzzy_near_dups",
    "ivf_topk_embeddings",
    "knn_embeddings",
    "minhash_band_candidates",
    "near_dup_jaccard",
    "new_urls_anti",
    "news_clean",
    "posts_clean",
    "posts_link_articles",
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
