"""Registry entries for the surfaces that were pytest-only in round 2:
the end-to-end flows (landing → clean → merge sink), the J1 positional
zip join, and MLlib sentiment scoring — so the external driver sees and
records them, not just the test suite.

``flows_e2e`` is rows-only (its semantics are side-effecting writes +
inserted counts, not a SQL-expressible relation); ``zip_docs_embeddings``
has a full DuckDB oracle (row_number twins); ``sentiment_scores`` is
rows-only (LR training is iterative, not SQL).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.flows import bars_flow, news_flow, posts_flow
from stonkwhisperer_spark.functions.text import clean_text_for_nlp, clean_text_for_nlp_sql
from stonkwhisperer_spark.operators.asof import zip_join
from stonkwhisperer_spark.plans.queries_pipelines import _bars_raw, _news_raw, _posts_raw
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# flows_e2e — the reference's three ETL flows end to end, twice each.
# Exercises F1 (flair predicate), F12/A5 (empty-input short-circuit +
# count-sum), K1 (partitioned write), K3–K5 (merge sinks, FK resolve).
# --------------------------------------------------------------------------
_BARS_LANDING_CAP = 20_000  # deterministic event subset keeps bench bounded


@register("flows_e2e", oracle=None)
def q_flows_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run news/posts/bars flows end-to-end against scratch targets:
    landing-zone parquet (derived deterministically from documents /
    events) → pipeline transform → idempotent merge sink. Each flow
    runs TWICE; the rerun must insert 0 rows (the reference's core
    idempotence invariant, loading.py:150-161). Returns one row per
    flow with both insert counts — rows-only check by design: the
    result is a side-effecting job's audit log, not a relation.

    Scale: each flow is one lazy plan — a shuffle for the dedup window
    plus the merge anti-join; the rerun's anti-join prunes to the key
    columns of the freshly written target."""
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < _BARS_LANDING_CAP
    )
    scratch = tempfile.mkdtemp(prefix="stonkw_flows_")
    try:
        news_landing = f"{scratch}/landing_news"
        posts_landing = f"{scratch}/landing_posts"
        bars_landing = f"{scratch}/landing_bars"
        # Landing drops: RAW_* shaped, single sorted file so the
        # reader's _arrival_id reproduces arrival order deterministically.
        _news_raw(docs).orderBy("_arrival_id").drop("_arrival_id").coalesce(
            1
        ).write.parquet(news_landing)
        _posts_raw(docs).orderBy("_arrival_id").drop("_arrival_id").coalesce(
            1
        ).write.parquet(posts_landing)
        _bars_raw(events).withColumn(
            "timestamp", F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        ).orderBy("event_id").drop("event_id").coalesce(1).write.parquet(bars_landing)
        companies = spark.createDataFrame(
            [(f"c{i}", f"S{i}") for i in range(15)], "id string, ticker string"
        )

        rows = []
        for flow, run in (
            ("news", lambda t: news_flow(spark, news_landing, t)),
            ("posts", lambda t: posts_flow(spark, posts_landing, t, flairs=["DD", "News"])),
            ("bars", lambda t: bars_flow(spark, bars_landing, t, companies)),
        ):
            target = f"{scratch}/target_{flow}"
            rows.append((flow, run(target), run(target)))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(
        rows, "flow string, inserted_first bigint, inserted_rerun bigint"
    )


# --------------------------------------------------------------------------
# api_ingest_e2e — the Spark-4 Python Data Source (sources/datasource.py)
# feeding clean_news, oracle-checked end to end: the synthetic page
# records are deterministic formulas DuckDB re-derives from range().
# --------------------------------------------------------------------------
_API_LIMIT = 200


@register(
    "api_ingest_e2e",
    oracle=f"""
    WITH raw AS (
      SELECT i,
             CASE WHEN i % 7 = 0 THEN NULL
                  ELSE 'author_' || (i % 13) END        AS author,
             'Title ' || i                              AS title,
             'body text ' || i                          AS content,
             'https://news.example.com/' || i           AS url,
             'Source ' || (i % 5)                       AS source_name,
             '2024-03-' || lpad(cast((i % 28) + 1 AS varchar), 2, '0')
               || 'T' || lpad(cast(i % 24 AS varchar), 2, '0')
               || ':15:30Z'                             AS publishedAt
      FROM range({_API_LIMIT}) t(i)
    )
    SELECT sha256(url)                                  AS id,
           coalesce(author, 'No Author')                AS author,
           title, content,
           {clean_text_for_nlp_sql("title")}            AS title_cleaned,
           {clean_text_for_nlp_sql("content")}          AS content_cleaned,
           cast(publishedAt AS timestamp)               AS published_at,
           source_name, url
    FROM raw
    """,
)
def q_api_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-as-a-DataSource end to end: ``format("stonkw_api")`` (the
    reference's NewsAPI extractor packaged as a Spark 4 Python Data
    Source — 4 input partitions respec the Celery fan-out) piped into
    clean_news, verified against a DuckDB twin that re-derives the same
    deterministic page records. Proves the source's schema declaration,
    partition planning, and record iteration produce exactly the rows
    the contract says."""
    from stonkwhisperer_spark.pipelines import clean_news
    from stonkwhisperer_spark.sources.datasource import LandingApiDataSource

    try:
        spark.dataSource.register(LandingApiDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    raw = (
        spark.read.format("stonkw_api")
        .option("kind", "news")
        .option("limit", _API_LIMIT)
        .load()
    )
    return clean_news(
        raw.withColumn("_arrival_id", F.monotonically_increasing_id()),
        order_col="_arrival_id",
    )


# --------------------------------------------------------------------------
# zip_docs_embeddings — J1 positional zip join, exact form.
# --------------------------------------------------------------------------
@register(
    "zip_docs_embeddings",
    oracle="""
    WITH l AS (
      SELECT doc_id, source,
             row_number() OVER (ORDER BY doc_id) AS rn
      FROM documents
    ),
    r AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY vec_id) AS rn
      FROM embeddings
    )
    SELECT l.doc_id, l.source, r.vec_id
    FROM l JOIN r USING (rn)
    """,
)
def q_zip_docs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 exact positional join (reference extraction.py:178-179 zips
    fetched articles back onto posts by list position): i-th document ↔
    i-th embedding under explicit orderings. The global row_number is a
    single-partition sort by construction — parity surface only; the
    scale path is the key-equi respec (posts_link_articles)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return zip_join(docs, emb, F.col("doc_id"), F.col("vec_id")).select(
        "doc_id", "source", "vec_id"
    )


# --------------------------------------------------------------------------
# sentiment_scores — MLlib train + score (BASELINE north-star surface).
# --------------------------------------------------------------------------
@register("sentiment_scores", oracle=None)
def q_sentiment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the Tokenizer→StopWords→TF-IDF→LogisticRegression pipeline
    on deterministic weak labels over cleaned document text, then score
    the corpus (fixed seed + fixed hash space ⇒ deterministic).
    Rows-only check: iterative LR training is not SQL-expressible.
    Scale: training iterates over a cached feature frame; scoring is a
    JVM map-only pass (plan asserted free of Python eval in
    tests/test_ml.py)."""
    from stonkwhisperer_spark.ml.sentiment import score_sentiment, train_sentiment, weak_labels

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", clean_text_for_nlp("text").alias("content_cleaned")
    )
    # cache: the LR fit iterates over the TF-IDF chain and the scoring
    # pass reads it again — uncached this recomputes the regex-clean +
    # featurization per action (measured 4.5x slower). Standard MLlib
    # practice: cache the training frame for the fit's lifetime.
    labeled = weak_labels(docs, "content_cleaned", pos_word="fast", neg_word="slow").cache()
    model = train_sentiment(labeled)
    return score_sentiment(model, labeled).select(
        "doc_id", "label", "prediction", "p_positive"
    )


# --------------------------------------------------------------------------
# streaming_ohlcv — the Structured Streaming minute-bars path itself
# under the DuckDB oracle: a real availableNow stream over a landing
# drop, drained to a memory sink, returned as the batch relation.
# --------------------------------------------------------------------------
_STREAM_OHLCV_CAP = 20_000
_stream_ohlcv_runs = 0


@register(
    "streaming_ohlcv",
    oracle=f"""
    WITH ticks AS (
      SELECT 'S' || (user_id % 15) AS symbol, ts, event_id, value AS price
      FROM events WHERE event_id < {_STREAM_OHLCV_CAP}
    ),
    e AS (
      SELECT symbol, date_trunc('minute', ts) AS bar_ts, price,
             row_number() OVER (PARTITION BY symbol, date_trunc('minute', ts)
                                ORDER BY ts, event_id)           AS rn_a,
             row_number() OVER (PARTITION BY symbol, date_trunc('minute', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM ticks
    )
    SELECT bar_ts, symbol,
           max(CASE WHEN rn_a = 1 THEN price END) AS open,
           max(price)                             AS high,
           min(price)                             AS low,
           max(CASE WHEN rn_d = 1 THEN price END) AS close,
           count(*)                               AS n_ticks
    FROM e GROUP BY 1, 2
    """,
)
def q_streaming_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute OHLCV computed BY THE STREAMING PATH — not a batch twin:
    ticks (derived deterministically from events) land as parquet, a
    file-source stream reads them, the watermarked windowed aggregation
    runs under an availableNow trigger into a complete-mode memory
    sink, and the drained table is returned for the oracle compare. So
    the driver's correctness gate covers the streaming aggregation
    operator itself (deterministic open/close via the (ts, event_id)
    tie-break, same discipline as batch ohlcv_1min).

    Scale: the streaming agg shuffles once on (window, symbol) with
    partial merge, state bounded by the watermark; complete-mode memory
    sink is the TEST harness shape only — production writes through
    start_merge_stream."""
    global _stream_ohlcv_runs
    import shutil
    import tempfile

    from stonkwhisperer_spark.streaming.jobs import minute_bars, read_landing_stream

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < _STREAM_OHLCV_CAP
    )
    ticks = events.select(
        F.concat(F.lit("S"), F.col("user_id") % 15).alias("symbol"),
        # watermarks require TIMESTAMP (tz-aware); the session is pinned
        # UTC so the ntz→ltz cast is wall-clock lossless both ways.
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id"),
        F.col("value").alias("price"),
    )
    scratch = tempfile.mkdtemp(prefix="stonkw_stream_ohlcv_")
    try:
        landing = f"{scratch}/ticks"
        ticks.coalesce(1).write.parquet(landing)
        _stream_ohlcv_runs += 1
        name = f"stream_ohlcv_{_stream_ohlcv_runs}"
        stream = read_landing_stream(
            spark,
            landing,
            spark.read.parquet(landing).schema,
        )
        bars = minute_bars(stream, tiebreak_col="event_id")
        q = (
            bars.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{scratch}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.table(name).select(
            F.col("bar_ts").cast("timestamp_ntz").alias("bar_ts"),
            "symbol",
            "open",
            "high",
            "low",
            "close",
            F.col("n_ticks").cast("bigint").alias("n_ticks"),
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
