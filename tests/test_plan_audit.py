"""Registry-wide physical-plan audit: every registered query's plan is
scanned for the patterns that break at 100 TB — cartesian products,
nested-loop joins outside the documented 1-row/k-row broadcast cases,
and row-at-a-time Python eval. A new query that sneaks in a quadratic
join or a Python UDF fails here before it ever reaches the driver."""

from __future__ import annotations

import pytest

from stonkwhisperer_spark.plans.registry import query_map

SF = "/root/testdata/sf0.001"

# Queries whose *construction* runs jobs (flows, ML training, streaming
# drains) — their cost is the point; plan-audited by their own tests.
SIDE_EFFECTING = {"flows_e2e", "sentiment_scores", "streaming_ohlcv"}

# BroadcastNestedLoopJoin allowances: joins whose build side is a
# documented O(1)-row (scalar threshold) or O(k)-row (centroid/query
# set) broadcast — the legitimate uses. value = max allowed count.
BNLJ_ALLOWED = {
    "knn_embeddings": 1,          # |Q|-row query set broadcast
    "ivf_topk_embeddings": 2,     # centroid set into quantizer + probes
    "ivfpq_topk_embeddings": 2,   # same centroid broadcasts (assign + probe)
    "ivfsq8_topk_embeddings": 2,  # same centroid broadcasts (assign + probe)
    "ivfpq_refine_embeddings": 2,  # inherits the shortlist chain's two
                                   # coarse-centroid broadcasts; the
                                   # refine joins are broadcast HASH
                                   # equi-joins on id
    "idle_rich_customers": 1,     # 1-row AVG threshold
    "part_value_share": 1,        # 1-row global-share threshold
    "top_supplier_revenue": 1,    # 1-row MAX threshold
    "purchase_funnel": 2,         # three 1-row stage counts cross-joined
    "click_buy_reconcile": 0,
    "temperature_mixture": 1,     # 1-row MIN(lang count) into the rate table
    "event_type_enrich_sketch_salted": 0,  # the 1-row threshold
                                           # crossJoin lives behind the
                                           # hot-set checkpoint
    "sq8_topk_embeddings": 1,     # |Q|-row query set broadcast (ADC scan)
    "semantic_clusters": 2,       # K-row centroid broadcast, one per
                                  # Lloyd's assignment pass (K=8)
    "quantile_sketch_prices": 3,  # 3-row (pct, total) into the sketch
                                  # rank scan; 3-row estimate + 1-row
                                  # total into the truth pass
    "kmv_shard_overlap": 4,       # four 1-row sketch-estimate slices
                                  # cross-joined into the single result
                                  # row (every side ≤ K=64 sketch rows)
    "bm25_topk_docs": 2,          # 1-row corpus stats (N, Σdl) into the
                                  # idf table and the scoring join
    "rrf_hybrid_retrieval": 3,    # bm25's two 1-row stats broadcasts +
                                  # the ≤#sources-row centroid broadcast
    "lm_perplexity_scores": 2,    # 1-row vocab-size stats into the
                                  # per-bigram cost and the keep gate
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in query_map().items():
        if name in SIDE_EFFECTING:
            continue
        out[name] = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian product in: {bad}"


def test_no_row_at_a_time_python(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python eval in: {bad}"


def test_nested_loop_joins_only_where_documented(plans):
    bad = {}
    for n, p in plans.items():
        count = p.count("BroadcastNestedLoopJoin")
        if count > BNLJ_ALLOWED.get(n, 0):
            bad[n] = count
    assert not bad, f"undocumented BroadcastNestedLoopJoin: {bad}"


def test_no_bare_collect_in_plans():
    """Harness-glue collect discipline (VERDICT r11 task 5): every
    driver-side materialization in plans/ must route through
    glue.bounded_collect, which enforces the site's documented row
    bound (inventoried in docs/SCALE.md). A bare .collect() is either
    an undocumented driver materialization or a new site that skipped
    the inventory — both fail here."""
    import ast
    from pathlib import Path

    plans_dir = Path(__file__).resolve().parent.parent / (
        "stonkwhisperer_spark/plans"
    )
    driver_mat = {"collect", "toPandas", "take", "head", "first"}
    bad = []
    for path in sorted(plans_dir.rglob("*.py")):
        if path.name == "glue.py":  # the one sanctioned .collect()
            continue
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in driver_mat
            ):
                bad.append(f"{path.name}:{node.lineno} ({node.func.attr})")
    assert not bad, (
        f"bare .collect() outside glue.bounded_collect: {bad} — route "
        "through bounded_collect(df, cap, what) and add the bound to "
        "docs/SCALE.md's harness-glue inventory"
    )


def test_bounded_collect_semantics(spark):
    """bounded_collect is the sanctioned driver-materialization path
    for every plans/ glue site: under the cap it must return the full
    relation; over the cap it must raise (naming the site) while
    having fetched at most cap+1 rows."""
    import pytest as _pytest

    from stonkwhisperer_spark.plans.glue import bounded_collect

    df = spark.range(10)
    assert len(bounded_collect(df, 10, "exact-cap")) == 10
    assert len(bounded_collect(df, 50, "under-cap")) == 10
    with _pytest.raises(AssertionError, match=r"over-cap.*documented"):
        bounded_collect(df, 9, "over-cap")
