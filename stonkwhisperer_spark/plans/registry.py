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
    # -- new in round 9: bloom-filter membership sketch, KMV set
    #    operations, stream-maintained bloom, JSONL ingest --
    "bloom_prune_lineitem",
    "kmv_shard_overlap",
    "streaming_bloom",
    "streaming_hll",
    "jsonl_ingest_roundtrip",
    # -- round 8 (no CORRECTNESS_r08 was ever recorded, so the whole
    #    round-8 window stays for round 9's gate): IVF×PQ composed ANN,
    #    txlog lifecycle hash companion, incremental corpus dedup,
    #    mergeable sketches --
    "ivfpq_topk_embeddings",
    "ivfpq_refine_embeddings",
    "txlog_e2e_state",
    "incremental_dedup",
    "kmv_vocab_cardinality",
    "cms_token_topk",
    "streaming_sketch",
    "event_type_enrich_sketch_salted",
    "media_resize_stats",
    "priority_sample",
    "zip_docs_embeddings_dist",
    "video_frame_stats",
    "streaming_cms",
    "ivfsq8_topk_embeddings",
    # (hll_vocab_cardinality ceded its slot to streaming_hll, which
    #  gates the same hll_sketch/hll_estimate chain PLUS the
    #  element-wise-max merge loop; it re-enters in round 10)
    "audio_pcm_stats",
    "url_canonical_dedup",
    "quantile_sketch_prices",
    "streaming_quantiles",
    # -- changed in round 8 (batched BPE passes, grouped single-pass
    #    jaccard + lazy-checkpoint CC, availableNow-wrapper streaming
    #    drains, ivf_probe factoring + pq qsub reuse): re-confirm --
    "bpe_merges",
    "bpe_encode",
    "curation_e2e",
    "dedup_canonical",
    "dup_clusters",
    "near_dup_jaccard",
    "txlog_stream_cdc",
    "txlog_stream_upsert",
    # (pq_topk_embeddings / ivf_topk_embeddings also changed in r8 —
    #  displaced to make room for the r9 debuts because the refactored
    #  ivf_probe/pq chains are gated THROUGH ivfpq_topk/ivfpq_refine/
    #  ivfsq8 above, which share those code paths; both re-enter in
    #  round 10 with the r5-stale rotation)
    # -- backlog: the 19 whose newest green row is round 4 (the full
    #    r4-stale set — VERDICT r7 task 1; event_type_enrich_salted
    #    was listed at position 51 in r7 and never gated) --
    "event_type_enrich_salted",
    "forecast_revenue",
    "idle_rich_customers",
    "large_orders",
    "media_headers",
    "media_pixel_stats",
    "nation_trade_volume",
    "part_value_share",
    "priority_order_counts",
    "promo_revenue_share",
    "revenue_cube",
    "shipping_priority",
    "small_order_part_revenue",
    "sole_return_suppliers",
    "source_capped_sample",
    "sql_top_brands_by_region",
    "steel_part_suppliers",
    "top_customer_per_nation",
    "top_supplier_revenue",
    # (the 40 r5-stale queries lead round 10's window; the two that
    #  briefly held these slots in the unrecorded r8 window —
    #  api_ingest_e2e, asof_next_sentiment — go first then)
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
