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
    # ======================= ROUND-13 WINDOW =======================
    # -- new in round 13 (VERDICT r12 tasks 3 + 4): the STREAMING arm
    #    of index maintenance (foreachBatch exactly-once MERGE ingest
    #    into the persisted BM25 tf / LSH band tables, drained index
    #    hash-gated against the from-scratch rebuild) and the
    #    forget+vacuum composition (post-purge zero-retention vacuum:
    #    pre-erasure version unreadable, files physically gone,
    #    current read still rebuild-equal) --
    "bm25_index_stream_upsert",
    "minhash_index_stream_upsert",
    "bm25_forget_vacuum",
    # -- changed in round 13: the assignment digest gained hsum_mod
    #    (an order-insensitive modular sum of the portable md5 hash —
    #    closes the algebraic-collision seam, ADVICE r12) on both the
    #    Spark and oracle sides of both consumers; corpus_drift's
    #    zero-denominator CASE now also guards n2 = 0 on both sides --
    "ivf_assign_incremental",
    "ivf_recluster_replace",
    "corpus_drift",
    # -- probed this round (VERDICT r12 tasks 2 + 5, docs/BENCH_METHOD
    #    round-13 table): the two above-band txlog rows and the
    #    shifted bucketed join re-gate alongside their probe verdicts
    #    so the round's perf story carries fresh correctness rows --
    "txlog_incremental_agg",
    "txlog_stream_upsert",
    "bucketed_order_lineitem_join",
    # -- the full r9-stale cohort (41 queries; newest recorded green
    #    row round 9 for all — VERDICT r12 task 1). After this window
    #    closes the newest-green floor moves to r10. --
    "audio_pcm_stats",
    "bloom_prune_lineitem",
    "bpe_encode",
    "bpe_merges",
    "cms_token_topk",
    "dedup_canonical",
    "dup_clusters",
    "event_type_enrich_salted",
    "event_type_enrich_sketch_salted",
    "forecast_revenue",
    "idle_rich_customers",
    "incremental_dedup",
    "ivfpq_refine_embeddings",
    "ivfpq_topk_embeddings",
    "ivfsq8_topk_embeddings",
    "jsonl_ingest_roundtrip",
    "kmv_shard_overlap",
    "kmv_vocab_cardinality",
    "large_orders",
    "media_headers",
    "media_pixel_stats",
    "media_resize_stats",
    "nation_trade_volume",
    "near_dup_jaccard",
    "part_value_share",
    "priority_order_counts",
    "priority_sample",
    "promo_revenue_share",
    "quantile_sketch_prices",
    "revenue_cube",
    "shipping_priority",
    "small_order_part_revenue",
    "sole_return_suppliers",
    "source_capped_sample",
    "sql_top_brands_by_region",
    "steel_part_suppliers",
    "top_customer_per_nation",
    "top_supplier_revenue",
    "url_canonical_dedup",
    "video_frame_stats",
    "zip_docs_embeddings_dist",
    # (after this window closes the newest-green distribution is
    #  r13=50, r12=47, r11=44, r10=42 — floor r10; the never-recorded
    #  set stays exactly the three no-oracle side-effecting surfaces,
    #  each with a hash-gated companion. Round 14's window should
    #  rotate the r10-stale cohort (~42) plus whatever round 13
    #  changed.)
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
