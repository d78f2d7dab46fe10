"""Constraint checks (§4 parity) and partition-pruning proof for the
sink layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.quality import check_constraints
from stonkwhisperer_spark.sinks.writers import write_partitioned


def test_check_constraints_report(spark):
    df = spark.createDataFrame(
        [
            ("u1", "short", 1),
            ("u1", "x" * 600, None),  # dup url + overlong title + null qty
            (None, "ok", 3),
        ],
        "url string, title string, qty int",
    )
    report = {
        r.constraint: r.n_violations
        for r in check_constraints(
            df,
            not_null=["url", "qty"],
            max_length={"title": 500},
            unique=[["url"]],
        ).collect()
    }
    assert report == {
        "not_null:url": 1,
        "not_null:qty": 1,
        "max_length:title<=500": 1,
        "unique:(url)": 1,
    }


def test_clean_data_reports_zero_violations(spark):
    df = spark.createDataFrame([("a", "t", 1), ("b", "t", 2)], "url string, title string, qty int")
    report = check_constraints(df, not_null=["url"], max_length={"title": 10}, unique=[["url"]])
    assert all(r.n_violations == 0 for r in report.collect())


def test_partition_pruning_on_written_layout(spark, tmp_path):
    path = str(tmp_path / "landing")
    df = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.when(F.col("id") % 2 == 0, F.lit("2024-01-01"))
        .otherwise(F.lit("2024-01-02"))
        .cast("date")
        .alias("ingestion_date"),
    )
    write_partitioned(df, path)
    read = spark.read.parquet(path).filter(F.col("ingestion_date") == "2024-01-01")
    assert read.count() == 50
    plan = read._jdf.queryExecution().executedPlan().toString()
    # the date predicate lands in PartitionFilters (pruned at planning,
    # the other partition's files are never opened)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "ingestion_date" in pf


def test_corpus_drift_invariants(spark):
    """corpus_drift contract pins beyond the oracle hash: tvd_e9 is a
    valid fixed-point probability distance (0..1e9), v1 is a subset of
    v2 (token totals and vocabulary are monotone), the no-v1-mass
    convention reports full shift, and exactly top-3 shifted tokens are
    reported per source."""
    from stonkwhisperer_spark.plans.queries_curation import (
        _DRIFT_SCALE,
        _DRIFT_TOP,
        q_corpus_drift,
    )

    rows = q_corpus_drift(spark, "/root/testdata/sf0.001").collect()
    assert rows, "drift frame empty"
    for r in rows:
        assert 0 <= r.tvd_e9 <= _DRIFT_SCALE
        assert r.n_tokens_v1 <= r.n_tokens_v2
        assert r.vocab_v1 <= r.vocab_v2
        if r.n_tokens_v1 == 0:
            assert r.tvd_e9 == _DRIFT_SCALE  # full shift by convention
        # top shift list: exactly min(TOP, vocab) non-empty tokens
        toks = r.top_shift_toks.split(",")
        assert len(toks) == min(_DRIFT_TOP, r.vocab_v2)
        assert all(toks)
