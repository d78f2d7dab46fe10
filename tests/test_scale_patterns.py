"""Scale-pattern proofs: bucketed co-located joins (no exchange) and
salted skew handling (identical results, spread partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.skew import salted_agg, salted_join
from stonkwhisperer_spark.sources.tables import spread


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed on the join key by the same bucket count join
    WITHOUT an exchange on either side — the co-located join layout for
    repeated fact⋈fact joins at scale."""
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    for name, df in [("t_facts", facts), ("t_dims", dims)]:
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
    a, b = spark.table("t_facts"), spark.table("t_dims")
    joined = a.join(b.hint("merge"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    assert joined.count() == 10_000
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def test_spread_is_layout_aware(spark, tmp_path):
    """spread() must exchange when the scan is one row group (the
    driver-testdata layout: splits lie, one task does all the work) and
    must NO-OP when the parquet layout already yields enough row groups
    — at production scale an unconditional repartition would be a
    gratuitous full exchange of the corpus."""
    df = spark.range(50_000).select(F.col("id"), (F.col("id") % 100).alias("v"))

    one = str(tmp_path / "one_group")
    df.coalesce(1).write.mode("overwrite").parquet(one)
    many = str(tmp_path / "many_groups")
    df.repartition(16).write.mode("overwrite").parquet(many)

    single = spark.read.parquet(one)
    plan = spread(single, "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # single row group → must rebalance

    multi = spark.read.parquet(many)
    spread_multi = spread(multi, "id", min_partitions=8)
    plan = spread_multi._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # ≥8 row groups → scan is already parallel
    assert spread_multi.count() == 50_000


def test_salted_agg_matches_direct(spark):
    df = spark.range(20_000).select(
        # one pathologically hot key + a long tail
        F.when(F.col("id") % 2 == 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 50)
        ).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    direct = {
        (r.k): (r.total, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.total, r.n, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("sum", F.sum("v")),
                "n": ("sum", F.count("*")),
                "mx": ("max", F.max("v")),
            },
            n_salts=8,
        ).collect()
    }
    assert direct == salted


def test_salted_join_matches_plain(spark):
    skewed = spark.range(5_000).select(
        F.when(F.col("id") % 3 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("d"), F.col("id") % 20)
        ).alias("k"),
        F.col("id").alias("rid"),
    )
    small = spark.createDataFrame(
        [("HOT", 1)] + [(f"d{i}", i) for i in range(20)], "k string, dim long"
    )
    plain = {(r.rid, r.dim) for r in skewed.join(small, "k").collect()}
    salted = {(r.rid, r.dim) for r in salted_join(skewed, small, "k", n_salts=8).collect()}
    assert plain == salted


def test_stream_fixtures_build_once_and_shard_layout(spark):
    """The shared stream landings (plans/stream_fixtures.py) build once
    per (process, sf_dir) and lay out exactly N_BATCHES one-file shards
    — the property that makes maxFilesPerTrigger=1 drains see exactly
    N_BATCHES micro-batches across every consumer."""
    import os

    from pyspark.sql import functions as F

    from stonkwhisperer_spark.plans import stream_fixtures as sfx

    sf = "/root/testdata/sf0.001"
    p1 = sfx.docs_landing(spark, sf)
    assert sfx.docs_landing(spark, sf) == p1  # cached, not rebuilt
    parts = [f for f in os.listdir(p1) if f.startswith("part-")]
    assert len(parts) == sfx.N_BATCHES

    t1 = sfx.token_landing(spark, sf)
    assert sfx.token_landing(spark, sf) == t1
    tparts = [f for f in os.listdir(t1) if f.startswith("part-")]
    assert len(tparts) == sfx.N_BATCHES
    # shard i holds exactly the doc_id % N_BATCHES == i rows
    bad = (
        spark.read.parquet(t1)
        .withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.count_distinct(F.col("doc_id") % sfx.N_BATCHES).alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    assert bad == 0


def test_stream_fixtures_concurrent_first_build(spark):
    """Build-once holds under CONCURRENT first callers (ADVICE r10):
    N threads racing the cold cache must produce ONE landing with
    exactly N_BATCHES part files — without the _BUILD_LOCK, racers
    each append their own shard set into the same path and the
    maxFilesPerTrigger=1 micro-batch contract breaks."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from stonkwhisperer_spark.plans import stream_fixtures as sfx

    sf = "/root/testdata/sf0.001"
    key = ("docs", sf)
    prior = sfx._LANDINGS.pop(key, None)  # force a cold first build
    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            paths = list(pool.map(lambda _: sfx.docs_landing(spark, sf), range(4)))
        assert len(set(paths)) == 1
        parts = [f for f in os.listdir(paths[0]) if f.startswith("part-")]
        assert len(parts) == sfx.N_BATCHES
    finally:
        if prior is not None:
            sfx._LANDINGS[key] = prior
