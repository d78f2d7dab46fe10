"""Physical-plan regression tests: the plan properties docs/PLANS.md
documents are asserted here so a refactor that silently loses a
pushdown, broadcasts a fact table, or adds a shuffle fails CI — plan
quality is part of the contract, not a side effect."""

from __future__ import annotations

import pytest

from stonkwhisperer_spark.plans.registry import query_map

SF = "/root/testdata/sf0.01"


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qmap():
    return query_map()


def test_pricing_summary_filter_pushdown(spark, qmap):
    plan = _formatted_plan(qmap["pricing_summary"](spark, SF))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert read_schema.count(":") <= 8


def test_region_revenue_broadcasts_dims_not_facts(spark, qmap):
    plan = _executed(qmap["region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan  # dim chain broadcast
    # the fact table must never sit under a BroadcastExchange
    for chunk in plan.split("BroadcastExchange")[1:]:
        scan_area = chunk[:1500]
        assert "lineitem" not in scan_area


def test_ohlcv_single_exchange(spark, qmap):
    plan = _executed(qmap["ohlcv_1min"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle, map-side partials


def test_interval_grid_no_nested_loop(spark, qmap):
    plan = _executed(qmap["events_in_promo_windows_grid"](spark, SF))
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_no_python_eval_in_jvm_queries(spark, qmap):
    """Queries claimed JVM-side must carry no Python eval operator of
    any kind (api_ingest_e2e and sentiment_scores legitimately cross
    the Python boundary and are excluded)."""
    for name in (
        "text_quality",
        "minhash_band_candidates",
        "embedding_near_dup",
        "bars_clean",
        "doc_fingerprints",
        "gapfill_events",
    ):
        plan = _executed(qmap[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_knn_scoring_has_no_interpreted_lambdas(spark, qmap):
    """The ANN scoring paths must use the unrolled codegen expressions —
    the interpreted array-lambda fold would appear as lambdafunction(...)
    in the plan (higher-order functions evaluate outside codegen)."""
    for name in ("knn_embeddings", "embedding_near_dup", "embedding_lsh_buckets"):
        plan = _executed(qmap[name](spark, SF))
        assert "lambdafunction" not in plan, name


def test_gate_window_rotation(qmap):
    """The driver's correctness gate records the FIRST 50 registered
    queries; the rotation must place every never-yet-checked, fixed, or
    newly added query inside that window (everything before the
    archived-green re-confirmation section of _GATE_ORDER), and the
    window must be exactly the list's head."""
    from stonkwhisperer_spark.plans.registry import _GATE_ORDER

    names = list(qmap)
    window = set(names[:50])
    # r7 window: the archived-green backlog section starts at the
    # oldest r3 row ("vwap_1min"); everything before it is new or
    # changed this round and MUST be driver-checked.
    must_be_gated = _GATE_ORDER[: _GATE_ORDER.index("vwap_1min")]
    assert set(must_be_gated) <= window
    assert len(_GATE_ORDER) == len(set(_GATE_ORDER))  # no dup rows wasted


def test_bpe_merge_respects_unit_boundaries(spark):
    """The ADVICE-r6 finding: raw substring replace on the space-joined
    sequence merges ACROSS unit boundaries once an earlier merge created
    a multi-char unit ('b a th e' + pair 'h e' substring-matches the
    tail of 'th' plus the separator -> ['b','a','the']). The unit-array
    fold must refuse that, merge greedily left-to-right, and handle
    single-unit / back-to-back cases."""
    from pyspark.sql import functions as F

    from stonkwhisperer_spark.plans.queries_text import bpe_apply_merge_expr

    rows = [
        ("b a th e", "b a th e"),  # boundary: naive replace gives 'b a the'
        ("t h e h e", "t he he"),  # back-to-back, both merge
        ("h e h", "he h"),         # trailing left unit survives
        ("h h e", "h he"),         # left-left then match
        ("e h e", "e he"),
        ("x", "x"),                # single unit: fold over empty rest
        ("h e", "he"),             # whole word merges to one unit
    ]
    df = (
        spark.createDataFrame([(s,) for s, _ in rows], "seq string")
        .withColumn("pair", F.lit("h e"))
        .select("seq", F.expr(bpe_apply_merge_expr("seq", "pair")).alias("out"))
    )
    got = {r["seq"]: r["out"] for r in df.collect()}
    assert got == dict(rows)

    # the DuckDB twin agrees on the identical corpus
    import duckdb

    from stonkwhisperer_spark.plans.queries_text import _bpe_apply_merge_duck

    vals = ", ".join(f"('{s}')" for s, _ in rows)
    expr = _bpe_apply_merge_duck("s", "px", "py", "pm")
    duck = duckdb.sql(
        f"WITH m AS (SELECT 'h' AS px, 'e' AS py, 'he' AS pm) "
        f"SELECT s, {expr} AS o FROM (VALUES {vals}) v(s), m"
    ).fetchall()
    assert {s: o for s, o in duck} == dict(rows)


def test_bpe_run_parity_same_unit():
    """x == y runs ('e e e e' with pair 'e e') must merge greedily
    left-to-right into non-overlapping pairs on both engines."""
    import duckdb

    from stonkwhisperer_spark.plans.queries_text import _bpe_apply_merge_duck

    expr = _bpe_apply_merge_duck("s", "px", "py", "pm")
    duck = duckdb.sql(
        f"WITH m AS (SELECT 'e' AS px, 'e' AS py, 'ee' AS pm) "
        f"SELECT {expr} FROM (VALUES ('e e e'), ('e e e e')) v(s), m"
    ).fetchall()
    assert [r[0] for r in duck] == ["ee e", "ee ee"]
