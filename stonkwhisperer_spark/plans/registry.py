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
    # ======================= ROUND-15 WINDOW =======================
    # -- new in round 15 (VERDICT r14 tasks 3 + 4): the two r14
    #    pytest-pinned seams promoted to driver rows — the retention-
    #    maintenance pass (compact + bounded-window vacuum on a
    #    stream-churned index, time-travel window and below-horizon
    #    refusal asserted in-query) and the CDC→index incremental
    #    materialized view (one change-feed poll refreshes a postings
    #    index in one scoped merge_sync commit, gated against the
    #    from-scratch head rebuild) --
    "index_retention_maintenance",
    "cdc_index_incremental_mv",
    # -- VERDICT r14 task 1: the flagged query, re-gated in the same
    #    round its mechanism was instrumented (trace_progress hook in
    #    streaming/jobs.py — default-off, shared by the whole
    #    foreachBatch-MERGE drain family) --
    "txlog_stream_upsert",
    # -- the full r11-stale cohort (43 queries; newest recorded green
    #    row round 11 for all — VERDICT r14 task 2). After this window
    #    closes the newest-green floor moves to r12. --
    "bigram_familiarity",
    "bm25_index_upsert",
    "bm25_topk_docs",
    "corpus_shuffle",
    "curation_e2e",
    "doc_chunks",
    "doc_keywords",
    "dsir_sample",
    "histogram_quantiles",
    "leakage_safe_split",
    "lineitem_status_cube",
    "lm_perplexity_scores",
    "near_dup_jaccard_prefix",
    "ohlcv_1min",
    "pagerank_part_supplier",
    "pricing_summary",
    "revenue_rollup",
    "rrf_hybrid_retrieval",
    "semantic_clusters",
    "semantic_dedup",
    "sentiment_closed_form",
    "span_dedup",
    "sq8_topk_embeddings",
    "topk_newest_events",
    "txlog_cdc_delete_replay",
    "txlog_cdc_replay",
    "txlog_cdc_update_replay",
    "txlog_checkpoint_replay",
    "txlog_constraints",
    "txlog_dv_replay",
    "txlog_generated",
    "txlog_rename_replay",
    "txlog_replace_where",
    "txlog_restore_replay",
    "txlog_schema_evolution",
    "txlog_skipping",
    "txlog_skipping_2d",
    "txlog_stream_cdc",
    "txlog_stream_sink",
    "txlog_type_widening",
    "txlog_update_replay",
    "user_event_pivot",
    "zip_docs_embeddings",
    # -- 4 fillers rotated ahead from the r12-stale cohort: the
    #    BENCH_r14-observed sub-second outlier, the merge_sync family
    #    twin of cdc_index_incremental_mv, and two heavy family
    #    representatives --
    "value_outliers",
    "txlog_merge_sync_replay",
    "bm25_index_forget",
    "flows_e2e_state",
    # (the distribution going INTO this round, computed from the
    #  CORRECTNESS_r*.json artifacts themselves — not predicted:
    #  r14=50, r13=49, r12=46, r11=43, floor r11. After this window
    #  records, the floor moves r11→r12; the never-recorded set stays
    #  exactly the three no-oracle side-effecting surfaces, each with
    #  a hash-gated companion. Round 16's window should rotate the
    #  remaining r12-stale cohort plus whatever round 15 changed.)
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
