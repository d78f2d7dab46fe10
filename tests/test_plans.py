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


def test_ann_kernel_shapes_follow_dim_contract(spark, qmap):
    """Optimization r15 reversed the kernel contract with a
    measurement (docs/kernel_dim_bench.py): at dim 64 the unrolled
    literal-indexed expression overflows hugeMethodLimit and runs
    INTERPRETED (11.3 s vs the HOF fold's 3.7 s on 2M pairs), while at
    the PQ subspace dim (8) the unrolled shape stays codegen'd+JIT'd
    and wins 2× (0.30 vs 0.55). So: full-dim scoring paths must use
    the zip_with/aggregate fold (lambdafunction in-plan), and the PQ
    subspace kernels must stay unrolled (no lambdafunction in the ADC
    distance-table / assignment expressions)."""
    # Full-dim (64) scorers: the HOF fold is the fast shape.
    for name in ("knn_embeddings", "embedding_near_dup"):
        plan = _executed(qmap[name](spark, SF))
        assert "lambdafunction" in plan, name
    # The LSH bucketing projections are literal-plane element_at
    # arithmetic — codegen'd, never an interpreted HOF (the per-plane
    # dot has literal coefficients, not an array-valued operand).
    lsh = _executed(qmap["embedding_lsh_buckets"](spark, SF))
    assert "lambdafunction" not in lsh and "element_at" in lsh
    # Small-dim (dsub=8) PQ kernels: unrolled stays codegen'd. Assert
    # the shape on the REAL call path — _pq_assign with the dsub the
    # PQ queries derive (dim // PQ_M = 8) — so a future caller passing
    # the full dim into the subspace kernel flips this test, not just
    # the standalone-Column repr.
    from stonkwhisperer_spark.operators.similarity import (
        _UNROLL_MAX_DIM,
        _pq_assign,
        sqdist_unrolled_int,
    )

    sub = spark.createDataFrame(
        [(0, 0, [1] * 8)], "vec_id long, m int, sv array<bigint>"
    )
    cents = spark.createDataFrame(
        [(0, 0, [1] * 8)], "m int, cid int, cv array<bigint>"
    )
    assign_plan = (
        _pq_assign(sub, cents, 8)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "element_at" in assign_plan
    assert "lambdafunction" not in assign_plan.lower()
    big = sqdist_unrolled_int("a", "b", _UNROLL_MAX_DIM + 1)
    assert "zip_with" in str(big) or "lambda" in str(big)


def test_gate_window_rotation(qmap):
    """The driver's correctness gate records the FIRST 50 registered
    queries; the rotation must place every never-yet-checked, fixed, or
    newly added query inside that window (everything before the
    archived-green re-confirmation section of _GATE_ORDER), and the
    window must be exactly the list's head."""
    from stonkwhisperer_spark.plans.registry import _GATE_ORDER

    names = list(qmap)
    window = set(names[:50])
    # r16 window: the archived-green re-confirmation section starts at
    # the r12-stale cohort ("benchmark_contamination"); everything
    # before it is an engine path changed this round and MUST be
    # driver-checked.
    must_be_gated = _GATE_ORDER[: _GATE_ORDER.index("benchmark_contamination")]
    assert set(must_be_gated) <= window
    assert len(_GATE_ORDER) == len(set(_GATE_ORDER))  # no dup rows wasted
    # ADVICE r7: the r7 list held 51 names, silently dropping the 51st
    # from the gate — the list must be exactly the 50-slot window.
    assert len(_GATE_ORDER) == 50


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

    # the DuckDB twin (batch fold with a 1-entry map) agrees on the
    # identical corpus — the single-pair case is a batch of one
    import duckdb

    from stonkwhisperer_spark.plans.queries_text import _bpe_apply_merges_duck

    vals = ", ".join(f"('{s}')" for s, _ in rows)
    expr = _bpe_apply_merges_duck("s", "mm")
    duck = duckdb.sql(
        f"WITH m AS (SELECT MAP(['h e'], ['he']) AS mm) "
        f"SELECT s, {expr} AS o FROM (VALUES {vals}) v(s), m"
    ).fetchall()
    assert {s: o for s, o in duck} == dict(rows)


def test_bpe_run_parity_same_unit():
    """x == y runs ('e e e e' with pair 'e e') must merge greedily
    left-to-right into non-overlapping pairs on both engines."""
    import duckdb

    from stonkwhisperer_spark.plans.queries_text import _bpe_apply_merges_duck

    expr = _bpe_apply_merges_duck("s", "mm")
    duck = duckdb.sql(
        f"WITH m AS (SELECT MAP(['e e'], ['ee']) AS mm) "
        f"SELECT {expr} FROM (VALUES ('e e e'), ('e e e e')) v(s), m"
    ).fetchall()
    assert [r[0] for r in duck] == ["ee e", "ee ee"]


def test_bpe_batch_fold_equals_sequential(spark):
    """The r8 batching contract: applying a CONFLICT-FREE batch in one
    combined fold equals sequential per-pair application in any order —
    on Spark and on the DuckDB twin, including the boundary cases the
    single-pair fold guards."""
    from pyspark.sql import functions as F

    from stonkwhisperer_spark.plans.queries_text import (
        bpe_apply_merge_expr,
        bpe_apply_merges_expr,
    )

    batch = ["t h", "i n"]  # units {t,h,i,n} + merged {th,in}: disjoint
    seqs = [
        "t h i n",        # both merge
        "t i h n",        # neither pair adjacent
        "i n t h i n",    # repeats of both
        "h t h e i n",    # boundary guard: 'h' before 't h'
        "t",              # single unit
        "n i t h t h",    # back-to-back left pair
    ]
    df = spark.createDataFrame([(s,) for s in seqs], "orig string")
    mm = F.expr("map('t h', 'th', 'i n', 'in')")
    combined = {
        r["orig"]: r["o"]
        for r in df.withColumn("mm", mm)
        .withColumn("seq", F.col("orig"))
        .select("orig", F.expr(bpe_apply_merges_expr("seq", "mm")).alias("o"))
        .collect()
    }
    # sequential single-pair application, both orders, must agree
    for order in (batch, list(reversed(batch))):
        cur = df.withColumn("seq", F.col("orig"))
        for pair in order:
            cur = cur.withColumn("pair", F.lit(pair)).select(
                "orig", F.expr(bpe_apply_merge_expr("seq", "pair")).alias("seq")
            )
        seq_result = {r["orig"]: r["seq"] for r in cur.collect()}
        assert seq_result == combined, f"order {order} diverged"
    import duckdb

    from stonkwhisperer_spark.plans.queries_text import _bpe_apply_merges_duck

    vals = ", ".join(f"('{s}')" for s in seqs)
    dexpr = _bpe_apply_merges_duck("s", "mm")
    duck = dict(
        duckdb.sql(
            f"WITH m AS (SELECT MAP(['t h', 'i n'], ['th', 'in']) AS mm) "
            f"SELECT s, {dexpr} FROM (VALUES {vals}) v(s), m"
        ).fetchall()
    )
    assert duck == combined
    expected = {
        "t h i n": "th in",
        "t i h n": "t i h n",
        "i n t h i n": "in th in",
        "h t h e i n": "h th e in",
        "t": "t",
        "n i t h t h": "n i th th",
    }
    assert combined == expected


def test_bpe_batch_selection_conflict_free(spark):
    """_bpe_select_batch must accept candidates in (count desc, pair
    asc) rank order, skipping any whose units OR merged token collide
    with an earlier acceptance — including the merged-token rule that
    keeps ('a','b') and ('ab','c') out of the same batch."""
    from stonkwhisperer_spark.plans.queries_text import (
        _BPE_BATCH,
        _bpe_select_batch,
    )

    counts = spark.createDataFrame(
        [
            ("a b", 100),   # accepted (rank 1)
            ("b c", 90),    # skipped: shares 'b'
            ("ab c", 80),   # skipped: 'ab' == merge of rank 1
            ("c d", 70),    # accepted
            ("e f", 60),    # accepted
            ("g h", 50),    # accepted (batch now full at 4)
            ("i j", 40),    # skipped: budget exhausted
        ],
        "pair string, cnt long",
    )
    sel = _bpe_select_batch(counts).collect()[0]["sel"]
    assert [s["pair"] for s in sel] == ["a b", "c d", "e f", "g h"][:_BPE_BATCH]
    assert [s["cnt"] for s in sel] == [100, 70, 60, 50][:_BPE_BATCH]
