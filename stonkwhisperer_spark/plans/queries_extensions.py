"""Extension queries: as-of join (bars↔sentiment), JSON parsing (C14),
and date formatting/arithmetic rollups (C7/C8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.operators.asof import asof_join
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

_D122 = "decimal(12,2)"


# --------------------------------------------------------------------------
# As-of join: minute bars pick up the latest sentiment score at or
# before the bar time (SURVEY §7.2 M5 extension; DuckDB oracle uses its
# native ASOF LEFT JOIN).
# --------------------------------------------------------------------------
@register(
    "asof_sentiment_bars",
    oracle="""
    WITH bars AS (
      SELECT date_trunc('minute', ts) AS bucket_ts, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    raw_sent AS (
      SELECT event_type, ts, value AS score, event_id
      FROM events WHERE event_id % 37 = 0
    ),
    sent AS (
      SELECT event_type, ts, score FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, ts ORDER BY event_id DESC) AS rn
        FROM raw_sent
      ) WHERE rn = 1
    )
    SELECT b.event_type, b.bucket_ts, b.n_events, s.score AS last_sentiment
    FROM bars b ASOF LEFT JOIN sent s
      ON b.event_type = s.event_type AND b.bucket_ts >= s.ts
    """,
)
def q_asof_sentiment_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-inclusive as-of join of minute bars to a sparse
    sentiment stream via the union+window construction: ONE shuffle +
    per-key sort over |bars|+|sentiment| — no range-join explosion.
    Right side pre-deduped per (key, ts) so the pick is deterministic."""
    events = load_table(spark, sf_dir, "events")
    bars = (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("bucket_ts"),
            "event_type",
        ).agg(F.count("*").alias("n_events"))
    )
    raw_sent = events.filter(F.col("event_id") % 37 == 0).select(
        "event_type", "ts", F.col("value").alias("score"), "event_id"
    )
    w = W.partitionBy("event_type", "ts").orderBy(F.desc("event_id"))
    sent = (
        raw_sent.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "ts", "score")
    )
    joined = asof_join(
        bars,
        sent,
        on=["event_type"],
        left_ts="bucket_ts",
        right_ts="ts",
        value_cols=["score"],
    )
    return joined.select(
        "event_type", "bucket_ts", "n_events", F.col("score").alias("last_sentiment")
    )


# --------------------------------------------------------------------------
# Range/interval join: count events inside promo windows (the join
# family SURVEY §2.4 notes the reference lacks entirely).
# --------------------------------------------------------------------------
_PROMO_WINDOWS_ORACLE = """
    WITH windows AS (
      SELECT event_id AS window_id, event_type,
             ts AS w_start, ts + INTERVAL 5 MINUTE AS w_end
      FROM events WHERE event_id % 211 = 0
    )
    SELECT w.window_id, w.event_type,
           count(e.event_id)                 AS n_events,
           cast(sum(CASE WHEN e.event_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
                                             AS n_matched
    FROM windows w
    LEFT JOIN events e
      ON e.event_type = w.event_type
     AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id, w.event_type
    """


@register("events_in_promo_windows", oracle=_PROMO_WINDOWS_ORACLE)
def q_events_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events falling inside 5-minute windows anchored
    at a sampled event subset, grouped per window.
    Scale: the window side is small (1/211 sample) and BROADCAST, so
    the range predicate evaluates as a broadcast nested-loop prefiltered
    by the event_type equi-key — no shuffle of the fact side. For two
    LARGE interval sets use events_in_promo_windows_grid (equi-join on
    (key, cell); no nested loop either side)."""
    events = load_table(spark, sf_dir, "events")
    windows = events.filter(F.col("event_id") % 211 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("event_type").alias("w_type"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    joined = F.broadcast(windows).join(
        events,
        (events["event_type"] == windows["w_type"])
        & (events["ts"] >= windows["w_start"])
        & (events["ts"] < windows["w_end"]),
        "left",
    )
    return joined.groupBy(
        "window_id", F.col("w_type").alias("event_type")
    ).agg(
        F.count("event_id").alias("n_events"),
        F.sum(F.when(F.col("event_id").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_matched"),
    )


@register("events_in_promo_windows_grid", oracle=_PROMO_WINDOWS_ORACLE)
def q_events_in_promo_windows_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same interval-join semantics as events_in_promo_windows, via the
    LARGE×LARGE path: grid decomposition (operators/interval.py). The
    interval side explodes onto the 5-minute grid cells it overlaps,
    points map to one cell, and the join is a pure EQUI join on
    (event_type, cell) + residual range filter — no broadcast
    requirement and no nested loop on either side. Unmatched windows
    come back via a second equi-join against the window set (left,
    zero-filled), keeping every operator shuffle-hash at 100 TB."""
    from stonkwhisperer_spark.operators.interval import interval_join_grid

    events = load_table(spark, sf_dir, "events")
    windows = events.filter(F.col("event_id") % 211 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("event_type").alias("w_type"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    points = events.select(
        F.col("event_id"), F.col("event_type").alias("w_type"), F.col("ts")
    )
    matched = interval_join_grid(
        points, windows, "ts", "w_start", "w_end", keys=["w_type"], cell_seconds=300
    )
    counts = matched.groupBy("window_id", "w_type").agg(
        F.count("event_id").alias("_n")
    )
    return windows.join(counts, ["window_id", "w_type"], "left").select(
        "window_id",
        F.col("w_type").alias("event_type"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_matched"),
    )


# --------------------------------------------------------------------------
# C14: JSON payload parsing (events.props carries a JSON object).
# --------------------------------------------------------------------------
@register(
    "events_props_parsed",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS int) AS k
    FROM events
    """,
)
def q_events_props_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over the props JSON column with an explicit schema
    (C14) — map-only; the parsed struct prunes to the single field."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.from_json("props", "k int").getField("k").alias("k")
    )


# --------------------------------------------------------------------------
# C7/C8: date formatting + date arithmetic in a monthly rollup.
# --------------------------------------------------------------------------
@register(
    "orders_monthly",
    oracle=f"""
    SELECT cast(date_trunc('month', o_orderdate) AS timestamp)  AS month_ts,
           strftime(o_orderdate, '%Y-%m')                       AS month_str,
           min(cast(o_orderdate AS date) + 30)                  AS first_due_date,
           cast(sum(cast(o_totalprice AS {_D122})) AS double)   AS total_price,
           count(*)                                             AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup exercising date formatting (C7,
    date_format ≡ strftime) and date arithmetic (C8, +30 days) with
    decimal-exact totals. Single low-cardinality shuffle with map-side
    partials."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_ts"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
        )
        .agg(
            F.min(F.date_add(F.col("o_orderdate").cast("date"), 30)).alias("first_due_date"),
            F.sum(F.col("o_totalprice").cast(_D122)).cast("double").alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Exact quantiles per group (Spark percentile ≡ DuckDB quantile_cont,
# both R-7 linear interpolation — verified bit-exact cross-engine).
# --------------------------------------------------------------------------
@register(
    "order_price_quantiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(cast(o_totalprice AS double), 0.5) AS median_price,
           quantile_cont(cast(o_totalprice AS double), 0.9) AS p90_price,
           count(*)                                         AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (median, p90) of order prices: Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the R-7 linear
    interpolation, so doubles match bit-for-bit. Scale: exact
    percentile buffers each group's values — fine for bounded group
    sizes; at 100 TB switch to ``approx_percentile`` (t-digest, mergeable
    map-side sketch) and accept the documented error bound."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(cast(o_totalprice as double), 0.5)").alias("median_price"),
        F.expr("percentile(cast(o_totalprice as double), 0.9)").alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# RANGE-frame window: trailing 30-day spend per customer (value-based
# frames — the rows-frame family is covered by gapfill/sessions).
# --------------------------------------------------------------------------
@register(
    "trailing_30d_spend",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           cast(sum(cast(o_totalprice AS {_D122})) OVER (
                  PARTITION BY o_custkey
                  ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
                ) AS double)                             AS spend_30d,
           count(*) OVER (
                  PARTITION BY o_custkey
                  ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
                )                                       AS n_orders_30d
    FROM orders
    """,
)
def q_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day spend per customer via a RANGE window frame over
    epoch-days: value-based framing includes ALL same-day peers, so the
    result is deterministic under ties with no explicit tie-break
    (unlike ROWS frames). Sum runs decimal-exact, one cast to double at
    the end. Scale: one shuffle on the customer key; the frame is
    evaluated with a sliding aggregate over each sorted partition."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    epoch_days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = W.partitionBy("o_custkey").orderBy(epoch_days).rangeBetween(-30, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_D122)).over(w).cast("double").alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


# --------------------------------------------------------------------------
# Forward as-of join: each bar picks the NEXT sentiment at/after it —
# the lookahead direction (label generation: "what happened next").
# --------------------------------------------------------------------------
@register(
    "asof_next_sentiment",
    oracle="""
    WITH bars AS (
      SELECT date_trunc('minute', ts) AS bucket_ts, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    raw_sent AS (
      SELECT event_type, ts, value AS score, event_id
      FROM events WHERE event_id % 37 = 0
    ),
    sent AS (
      SELECT event_type, ts, score FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY event_type, ts ORDER BY event_id DESC) AS rn
        FROM raw_sent
      ) WHERE rn = 1
    )
    SELECT b.event_type, b.bucket_ts, b.n_events, s.score AS next_sentiment
    FROM bars b ASOF LEFT JOIN sent s
      ON b.event_type = s.event_type AND b.bucket_ts <= s.ts
    """,
)
def q_asof_next_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-inclusive as-of join (direction='forward'): each minute
    bar attaches the EARLIEST sentiment at/after it — the lookahead
    direction a training pipeline uses to build "what happened next"
    labels. Same union+single-window plan as backward, time reversed;
    DuckDB's ASOF with a <= condition is the native oracle."""
    events = load_table(spark, sf_dir, "events")
    bars = (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("bucket_ts"),
            "event_type",
        ).agg(F.count("*").alias("n_events"))
    )
    raw_sent = events.filter(F.col("event_id") % 37 == 0).select(
        "event_type", "ts", F.col("value").alias("score"), "event_id"
    )
    w = W.partitionBy("event_type", "ts").orderBy(F.desc("event_id"))
    sent = (
        raw_sent.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "ts", "score")
    )
    joined = asof_join(
        bars,
        sent,
        on=["event_type"],
        left_ts="bucket_ts",
        right_ts="ts",
        value_cols=["score"],
        direction="forward",
    )
    return joined.select(
        "event_type", "bucket_ts", "n_events", F.col("score").alias("next_sentiment")
    )


# --------------------------------------------------------------------------
# Schema-evolution union: two vintages of a feed with different columns
# union by NAME with nulls for the missing ones — the data-lake append
# across schema versions.
# --------------------------------------------------------------------------
@register(
    "events_schema_evolution_union",
    oracle="""
    SELECT event_id, event_type, value, cast(NULL AS varchar) AS props_v2
    FROM events WHERE event_id % 2 = 0
    UNION ALL
    SELECT event_id, event_type, cast(NULL AS double) AS value, props AS props_v2
    FROM events WHERE event_id % 2 = 1
    """,
)
def q_events_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union across schema vintages: the v1 half carries `value`, the
    v2 half replaces it with a `props_v2` payload; unionByName with
    allowMissingColumns fills the holes with typed nulls — positional
    UNION would silently misalign columns. Map-only on both branches
    (no shuffle; the union is a plan concatenation)."""
    events = load_table(spark, sf_dir, "events")
    v1 = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", "value"
    )
    v2 = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", F.col("props").alias("props_v2")
    )
    return v1.unionByName(v2, allowMissingColumns=True)


# --------------------------------------------------------------------------
# Decile bucketing: ntile(10) of order value within each nation — the
# "spend tier" feature column.
# --------------------------------------------------------------------------
@register(
    "order_deciles",
    oracle="""
    SELECT o.o_orderkey, n.n_name AS nation,
           ntile(10) OVER (PARTITION BY n.n_name
                           ORDER BY o.o_totalprice, o.o_orderkey) AS spend_decile
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    """,
)
def q_order_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation spend deciles via ntile(10) — deterministic tie-break
    on orderkey. Scale: the window partitions on nation (25 keys here —
    bounded-cardinality caveat applies exactly as in bars_clean: real
    deployments partition on a finer key or pre-bucket by
    approx-quantile boundaries, which needs no per-key sort at all);
    dims broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            "o_orderkey",
            F.col("n_name").alias("nation"),
            F.ntile(10).over(w).alias("spend_decile"),
        )
    )


# --------------------------------------------------------------------------
# Map-typed column ops: JSON payload → map, sorted key inventory.
# --------------------------------------------------------------------------
@register(
    "event_prop_keys",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys
    FROM events WHERE props IS NOT NULL
    """,
)
def q_event_prop_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema inventory of a semi-structured payload: parse props into
    a MAP column, emit its sorted key list — map_keys/sort_array over
    from_json, all JVM-side (the map type surface beyond the struct
    parse in events_props_parsed). Serialized to csv per the
    no-arrays-in-final-projections discipline. Map-only pass."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.array_join(
            F.sort_array(F.map_keys(F.from_json("props", "map<string,string>"))), ","
        ).alias("prop_keys"),
    )


# --------------------------------------------------------------------------
# Relative-rank windows: percent_rank / cume_dist per nation.
# --------------------------------------------------------------------------
@register(
    "order_relative_ranks",
    oracle="""
    SELECT o.o_orderkey, n.n_name AS nation,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WINDOW w AS (PARTITION BY n.n_name ORDER BY o.o_totalprice, o.o_orderkey)
    """,
)
def q_order_relative_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative ranking per nation: percent_rank ((rank-1)/(n-1)) and
    cume_dist — deterministic under the orderkey tie-break, and both
    derive from integer ranks with ONE double division, so they hash
    identically cross-engine. Same bounded-partition caveat as
    order_deciles."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            "o_orderkey",
            F.col("n_name").alias("nation"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


# --------------------------------------------------------------------------
# jsonl_ingest_roundtrip — the JSONL source-format leg: the landing
# format every scraped/exported corpus actually arrives in. The query
# WRITES the documents table out as JSON Lines (Spark's parallel text
# writer over to_json), drops one deliberately malformed line into the
# landing dir, reads it back under an EXPLICIT schema in PERMISSIVE
# mode with a corrupt-record column, and proves the round trip against
# the parquet source of truth: per-language counts and char sums must
# match `documents` exactly, and exactly one '<corrupt>' row must
# surface (never silently dropped, never poisoning the typed columns).
# --------------------------------------------------------------------------
_JSONL_BAD = b'{"doc_id": 999999, "text": "truncated...\n'


@register(
    "jsonl_ingest_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '<corrupt>', 1, NULL
    """,
)
def q_jsonl_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest with schema-on-read: parquet → JSON Lines landing
    files (parallel write, one line per doc, newlines escaped by
    to_json) → read back under an explicit schema + PERMISSIVE mode.
    A malformed line lands in the `_corrupt` column with the typed
    columns null — surfaced as a '<corrupt>' group, so ingest
    monitoring sees bad records instead of losing them (FAILFAST and
    DROPMALFORMED are one option away). The oracle recomputes the
    expected relation from the parquet source: any encode/escape/parse
    drift breaks the hash.

    Scale: both directions are map-only (to_json / from_json per row,
    no shuffle until the final small agg); the landing dir holds one
    part-file per task, so 1000 executors write and re-read without
    coordination. Explicit schema is the 100 TB discipline — inference
    would cost a full extra pass before the first real read.

    Cites reference ingestion shape: stonkWhisperer lands scraped API
    batches as JSON before normalization (SURVEY §2.1 S1-S3)."""
    import os
    import shutil

    from stonkwhisperer_spark.session import scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    scratch = scratch_dir("stonkw_jsonl_")
    try:
        land = f"{scratch}/landing"
        docs.select(
            F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")).alias(
                "value"
            )
        ).write.mode("overwrite").text(land)
        with open(os.path.join(land, "part-bad.txt"), "wb") as fh:
            fh.write(_JSONL_BAD)
        schema = (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint, _corrupt string"
        )
        back = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(land)
        )
        out = (
            back.groupBy(
                F.when(F.col("_corrupt").isNotNull(), F.lit("<corrupt>"))
                .otherwise(F.col("lang"))
                .alias("lang")
            )
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# pagerank_part_supplier — iterative PageRank (Pregel-shape message
# passing as per-round join+agg) over the supplier↔part co-occurrence
# graph, in integer fixed point so the iteration is hash-gateable: the
# DuckDB twin replays all 8 rounds as programmatically unrolled CTEs.
# --------------------------------------------------------------------------
_PR_SCALE = 10**12
_PR_ITERS = 8
_PR_TOPK = 25


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    ctes = [
        f"""pairs AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
    edges AS (
      SELECT sk * 2 AS src, pk * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT pk * 2 + 1, sk * 2 FROM pairs
    ),
    outdeg AS (SELECT src, count(*) AS outd FROM edges GROUP BY 1),
    ew AS (SELECT e.src, e.dst, o.outd FROM edges e JOIN outdeg o USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST({_PR_SCALE} // n AS BIGINT) AS r FROM nodes, st)"""
    ]
    for i in range(iters):
        ctes.append(
            f"""c{i} AS (
      SELECT ew.dst AS node,
             CAST(SUM((17 * r{i}.r) // (20 * ew.outd)) AS BIGINT) AS s
      FROM ew JOIN r{i} ON r{i}.node = ew.src GROUP BY 1
    ),
    r{i + 1} AS (
      SELECT n.node,
             CAST((3 * {_PR_SCALE}) // (20 * st.n)
                  + COALESCE(c{i}.s, 0) AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} USING (node) CROSS JOIN st
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT kind, key, rank_scaled, rnk FROM (
      SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
             CAST(node // 2 AS BIGINT) AS key,
             r AS rank_scaled,
             CAST(row_number() OVER (ORDER BY r DESC, node) AS INT) AS rnk
      FROM r{iters}
    ) WHERE rnk <= {_PR_TOPK}
    """


@register("pagerank_part_supplier", oracle=_pagerank_oracle())
def q_pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier↔part co-occurrence graph (an edge per
    distinct lineitem (suppkey, partkey) pair, both directions — the
    random walk alternates sides of the bipartite graph), 8 Pregel
    rounds in INTEGER fixed point (operators/graph.py): damping 17/20,
    per-edge contribution (17·r) DIV (20·outdeg) floor-divided then
    exactly summed, teleport (3·scale) DIV (20·N). The DuckDB twin
    replays all 8 rounds as unrolled CTEs, so the hash gates the whole
    iterative computation — join plumbing, degree normalization,
    teleport arithmetic and convergence trajectory, not just the top-k
    shape. Returns the top 25 nodes (ties broken by node id).

    Scale: per round ONE hash-uniform equi-join (edge list × ranks,
    keyed on node ids) + one partial-aggregated sum keyed on dst — the
    canonical distributed PageRank plan; the degree-annotated edge list
    is checkpointed once and re-read per round. The top-k is
    TakeOrderedAndProject (per-partition partial top-25), never a
    global sort."""
    from stonkwhisperer_spark.operators.graph import pagerank

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    fwd = li.select((F.col("sk") * 2).alias("src"), (F.col("pk") * 2 + 1).alias("dst"))
    bwd = li.select((F.col("pk") * 2 + 1).alias("src"), (F.col("sk") * 2).alias("dst"))
    ranks = pagerank(
        fwd.unionByName(bwd), iterations=_PR_ITERS, scale=_PR_SCALE
    )
    top = ranks.orderBy(F.desc("rank_scaled"), "node").limit(_PR_TOPK)
    # row_number over the 25-row post-limit relation (bounded single
    # partition); the full-relation cut above plans as
    # TakeOrderedAndProject.
    rnk = F.row_number().over(W.orderBy(F.desc("rank_scaled"), "node")).cast("int")
    return top.withColumn("rnk", rnk).select(
        F.when(F.col("node") % 2 == 0, F.lit("supplier"))
        .otherwise(F.lit("part"))
        .alias("kind"),
        F.expr("CAST(node DIV 2 AS BIGINT)").alias("key"),
        "rank_scaled",
        "rnk",
    )
