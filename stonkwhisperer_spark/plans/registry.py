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
    # -- new in round 11: retrieval-index MAINTENANCE twins (VERDICT
    #    r10 task 5) — persisted inverted-index / IVF-assignment tables
    #    maintained through the txlog MERGE path, hash-gated against
    #    from-scratch rebuilds --
    "bm25_index_upsert",
    "ivf_assign_incremental",
    # -- the four round-10 debuts that registered after the r10 window
    #    froze (VERDICT r10 task 1): first driver-recorded rows --
    "pagerank_part_supplier",
    "rrf_hybrid_retrieval",
    "leakage_safe_split",
    "lm_perplexity_scores",
    # -- changed in round 11: bm25_scored factored into bm25_tf_index +
    #    bm25_score_index (one token-stream shuffle instead of three;
    #    shared with bm25_index_upsert and the RRF lexical side), and
    #    near_dup_jaccard_prefix now runs under the lossless
    #    guard_doc_freq fail-loud bound (ADVICE r10) --
    "bm25_topk_docs",
    "near_dup_jaccard_prefix",
    # -- changed in round 10, displaced from its frozen window
    #    (VERDICT r10 task 1): curation_e2e gave its slot to the bm25
    #    debut; semantic pair shares the _int_mean_vectors extract;
    #    txlog_stream_upsert / txlog_stream_cdc seeds moved to shared
    #    fixtures (and round 11 put those fixture caches behind
    #    double-checked build locks); streaming_sketch re-confirms the
    #    locked stream_fixtures family for the five sketch drains
    #    (identical build path, representative row) --
    "curation_e2e",
    "semantic_clusters",
    "semantic_dedup",
    "txlog_stream_upsert",
    "txlog_stream_cdc",
    "streaming_sketch",
    # -- the full r6-stale cohort (newest recorded green row round 6
    #    for all 35; txlog_cdc_replay additionally owed a re-gate since
    #    its seed build became the shared fixture in round 10) --
    "txlog_cdc_replay",
    "txlog_cdc_delete_replay",
    "txlog_cdc_update_replay",
    "txlog_checkpoint_replay",
    "txlog_constraints",
    "txlog_dv_replay",
    "txlog_generated",
    "txlog_history",
    "txlog_incremental_agg",
    "txlog_rename_replay",
    "txlog_replace_where",
    "txlog_restore_replay",
    "txlog_schema_evolution",
    "txlog_skipping",
    "txlog_skipping_2d",
    "txlog_stream_sink",
    "txlog_type_widening",
    "txlog_update_replay",
    "txlog_vacuum_replay",
    "bigram_familiarity",
    "bucketed_order_lineitem_join",
    "corpus_shuffle",
    "doc_chunks",
    "doc_keywords",
    "dsir_sample",
    "histogram_quantiles",
    "lineitem_status_cube",
    "ohlcv_1min",
    "pricing_summary",
    "revenue_rollup",
    "sentiment_closed_form",
    "span_dedup",
    "sq8_topk_embeddings",
    "topk_newest_events",
    "user_event_pivot",
    # -- one r7 fill: the J1 parity baseline (oldest r7 row; its
    #    distributed twin zip_docs_embeddings_dist is r9-green) --
    "zip_docs_embeddings",
    # (after this window closes, every oracle-bearing query's newest
    #  green row is r7+ and the never-recorded set is exactly the
    #  three no-oracle side-effecting surfaces, each with a hash-gated
    #  companion: flows_e2e -> flows_e2e_state r10, txlog_e2e ->
    #  txlog_e2e_state r9, sentiment_scores -> sentiment_closed_form
    #  r11. Round 12's window should LEAD with corpus_drift (the one
    #  round-11 debut registered after this window froze; parity-green
    #  sf0.001/0.01/0.1 locally) and then rotate the remaining r7
    #  cohort (~42: tpch quantile/rank family, streaming_{dedup,join,
    #  ohlcv,sessions}, txlog_{bloom_lookup,clone_replay,merge_evolve,
    #  merge_sync_replay}, media_manifest, gapfill_events, vwap_1min,
    #  kmv_distinct_estimate, simhash_signatures, ...) plus whatever
    #  round 11 changed.)
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
