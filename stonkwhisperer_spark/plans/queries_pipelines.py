"""The three reference transform flows as registered, oracle-checked
queries (SURVEY.md §3.1–3.3).

The oracle harness only sees the driver's parquet views, so each query
first DERIVES a deterministic raw landing-zone frame from `documents` /
`events` (same expressions on both engines), then runs the pipeline from
stonkwhisperer_spark.pipelines. The derivation is the test fixture; the
pipeline is the product code under test.

Covers: F4–F10 projections/filters, C2–C6 scalar chains, C9/C10
coercions, A1/A2 dedup, W1–W4 gap-fill, C11 surrogate ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.functions.text import clean_text_for_nlp_sql
from stonkwhisperer_spark.pipelines import clean_bars, clean_news, clean_posts
from stonkwhisperer_spark.plans.registry import register
from stonkwhisperer_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# news_clean — SURVEY §3.1 (transformation.py:13-78)
# --------------------------------------------------------------------------

_NEWS_RAW_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE 'author_' || (doc_id % 13) END                   AS author,
           CASE WHEN doc_id % 11 = 0 THEN NULL
                ELSE 'Title ' || (doc_id % 97) END                    AS title,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE substr(text, 1, 80) END                          AS description,
           'https://news.example.com/' || (doc_id % 350)              AS url,
           '2024-03-' || lpad(cast(1 + doc_id % 28 AS varchar), 2, '0')
             || ' ' || lpad(cast(doc_id % 24 AS varchar), 2, '0')
             || ':15:30'                                              AS publishedAt,
           CASE WHEN doc_id % 17 = 0 THEN NULL ELSE text END          AS content,
           source                                                     AS source_name
    FROM documents
"""


def _news_raw(docs: DataFrame) -> DataFrame:
    """Spark twin of _NEWS_RAW_SQL, shaped as RAW_NEWS_SCHEMA + arrival id."""
    d = F.col("doc_id")
    return docs.select(
        d.alias("_arrival_id"),
        F.struct(
            F.lower("source").alias("id"), F.col("source").alias("name")
        ).alias("source"),
        F.when(d % 7 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("author_"), d % 13)
        ).alias("author"),
        F.when(d % 11 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("Title "), d % 97)
        ).alias("title"),
        F.when(d % 5 == 0, F.lit(None)).otherwise(
            F.substring("text", 1, 80)
        ).alias("description"),
        F.concat(F.lit("https://news.example.com/"), d % 350).alias("url"),
        F.concat(F.lit("https://img.example.com/"), d).alias("urlToImage"),
        F.concat(
            F.lit("2024-03-"),
            F.lpad((d % 28 + 1).cast("string"), 2, "0"),
            F.lit(" "),
            F.lpad((d % 24).cast("string"), 2, "0"),
            F.lit(":15:30"),
        ).alias("publishedAt"),
        F.when(d % 17 == 0, F.lit(None)).otherwise(F.col("text")).alias("content"),
    )


def news_clean_oracle() -> str:
    """DuckDB twin of the full news transform (raw derivation → C2
    fixes → keep-first url dedup → clean/id/parse). Reused by
    flows_e2e_state to replay the news flow's committed end state."""
    return f"""
    WITH raw AS ({_NEWS_RAW_SQL}),
    fixed AS (
      SELECT doc_id, url, source_name,
             coalesce(author, 'No Author')                  AS author,
             coalesce(title, 'Untitled Article')            AS title,
             coalesce(content, description, title)          AS content,
             publishedAt
      FROM raw
      WHERE coalesce(content, description, title) IS NOT NULL
    ),
    dedup AS (
      SELECT *, row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rn
      FROM fixed
    )
    SELECT sha256(url)                                      AS id,
           author, title, content,
           {clean_text_for_nlp_sql("title")}                AS title_cleaned,
           {clean_text_for_nlp_sql("content")}              AS content_cleaned,
           cast(publishedAt AS timestamp)                   AS published_at,
           source_name, url
    FROM dedup WHERE rn = 1
    """


@register("news_clean", oracle=news_clean_oracle())
def q_news_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end news transform flow (F4/F6/F7, C1/C2/C5, A1, C11) over
    a raw frame derived from documents. Scale: map-only except the url
    dedup window shuffle (high-cardinality key)."""
    docs = load_table(spark, sf_dir, "documents")
    return clean_news(_news_raw(docs), order_col="_arrival_id")


# --------------------------------------------------------------------------
# posts_clean — SURVEY §3.2 (transformation.py:81-181)
# --------------------------------------------------------------------------

_POSTS_RAW_CASES = """
           't3_' || (doc_id % 430)                                    AS reddit_id,
           CASE WHEN doc_id % 19 = 0 THEN NULL
                ELSE 'r_' || source END                               AS subreddit,
           CASE WHEN doc_id % 23 = 0 THEN NULL
                ELSE 'u_' || (doc_id % 31) END                        AS author,
           'Post ' || doc_id                                          AS title,
           CASE WHEN doc_id % 3 = 0 THEN text ELSE NULL END           AS selftext,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                ELSE (doc_id * 7) % 1000 - 50 END                     AS score,
           CASE WHEN doc_id % 37 = 0 THEN NULL
                ELSE (doc_id * 3) % 200 END                           AS num_comments,
           doc_id % 3 = 0                                             AS is_text_post,
           CASE WHEN doc_id % 4 = 0 THEN 'DD'
                WHEN doc_id % 4 = 1 THEN 'News'
                WHEN doc_id % 4 = 2 THEN NULL
                ELSE 'Discussion' END                                 AS link_flair_text,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE (doc_id % 100) / 100.0 END                       AS upvote_ratio,
           'https://reddit.com/r/all/' || (doc_id % 430)              AS permalink,
           CASE WHEN doc_id % 41 = 0 THEN NULL
                ELSE 1700000000 + doc_id * 60 END                     AS published_at,
           CASE WHEN doc_id % 3 = 0 THEN NULL
                WHEN doc_id % 6 = 1 THEN ''
                WHEN doc_id % 5 = 0 THEN NULL
                ELSE '2024-02-01 10:00:00' END                        AS article_published_at,
           CASE WHEN doc_id % 2 = 0 THEN source || ', ' || lang
                WHEN doc_id % 5 = 1 THEN ''
                ELSE NULL END                                         AS article_categories_joined
"""


def _posts_raw(docs: DataFrame) -> DataFrame:
    """Spark twin shaped as RAW_POSTS_SCHEMA (subset) + arrival id; the
    category column is a real array here (the oracle precomputes its
    joined form)."""
    d = F.col("doc_id")
    return docs.select(
        d.alias("_arrival_id"),
        F.concat(F.lit("t3_"), d % 430).alias("reddit_id"),
        F.when(d % 19 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("r_"), F.col("source")))
        .alias("subreddit"),
        F.when(d % 23 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("u_"), d % 31))
        .alias("author"),
        F.concat(F.lit("Post "), d).alias("title"),
        F.when(d % 3 == 0, F.col("text")).otherwise(F.lit(None)).alias("selftext"),
        F.when(d % 29 == 0, F.lit(None))
        .otherwise((d * 7) % 1000 - 50)
        .alias("score"),
        F.when(d % 37 == 0, F.lit(None)).otherwise((d * 3) % 200).alias("num_comments"),
        (d % 3 == 0).alias("is_text_post"),
        F.when(d % 4 == 0, F.lit("DD"))
        .when(d % 4 == 1, F.lit("News"))
        .when(d % 4 == 2, F.lit(None))
        .otherwise(F.lit("Discussion"))
        .alias("link_flair_text"),
        F.when(d % 13 == 0, F.lit(None))
        .otherwise((d % 100) / F.lit(100.0))
        .alias("upvote_ratio"),
        F.concat(F.lit("https://reddit.com/r/all/"), d % 430).alias("permalink"),
        F.when(d % 41 == 0, F.lit(None))
        .otherwise(F.lit(1700000000) + d * 60)
        .alias("published_at"),
        F.when(d % 3 == 0, F.lit(None))
        .when(d % 6 == 1, F.lit(""))
        .when(d % 5 == 0, F.lit(None))
        .otherwise(F.lit("2024-02-01 10:00:00"))
        .alias("article_published_at"),
        F.when(d % 2 == 0, F.array("source", "lang"))
        .when(d % 5 == 1, F.array().cast("array<string>"))
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("article_category"),
    )


def posts_clean_oracle(flairs: list[str] | None = None) -> str:
    """DuckDB twin of the full posts transform. ``flairs`` prepends the
    F1 source predicate exactly where the pipeline applies it — BEFORE
    the keep-first dedup (clean_posts filters raw first, so flair
    filtering changes which duplicate survives). Reused by
    flows_e2e_state."""
    dedup_src = "raw"
    if flairs is not None:
        quoted = ", ".join("'" + f + "'" for f in flairs)
        dedup_src = f"(SELECT * FROM raw WHERE link_flair_text IN ({quoted}))"
    return f"""
    WITH raw AS (SELECT doc_id, {_POSTS_RAW_CASES} FROM documents),
    dedup AS (
      SELECT *, row_number() OVER (
               PARTITION BY reddit_id, permalink ORDER BY doc_id) AS rn
      FROM {dedup_src}
    ),
    kept AS (
      SELECT * FROM dedup
      WHERE rn = 1
        AND reddit_id IS NOT NULL AND subreddit IS NOT NULL
        AND published_at IS NOT NULL
        AND NOT ((NOT is_text_post)
                 AND (article_published_at IS NULL OR article_published_at = ''))
    )
    SELECT sha256('post:' || reddit_id)                       AS id,
           reddit_id, subreddit,
           coalesce(author, '[deleted]')                      AS author,
           title,
           {clean_text_for_nlp_sql("coalesce(selftext, 'No text')")} AS body_text,
           cast(coalesce(score, 0) AS int)                    AS score,
           cast(coalesce(num_comments, 0) AS int)             AS number_of_comments,
           is_text_post,
           coalesce(link_flair_text, 'None')                  AS subreddit_category,
           coalesce(upvote_ratio, 0.5)                        AS upvote_ratio,
           make_timestamp(cast(published_at AS bigint) * 1000000) AS published_at,
           permalink                                          AS reddit_post_url,
           article_categories_joined                          AS article_categories
    FROM kept
    """


@register("posts_clean", oracle=posts_clean_oracle())
def q_posts_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reddit-posts transform flow (F5/F8/F9, C3/C4/C6/C10,
    A2, C11) over a raw frame derived from documents. Scale: one dedup
    window shuffle on (reddit_id, url); the rest map-side."""
    docs = load_table(spark, sf_dir, "documents")
    return clean_posts(_posts_raw(docs), order_col="_arrival_id")


# --------------------------------------------------------------------------
# bars_clean — SURVEY §3.3 (transformation.py:184-231)
# --------------------------------------------------------------------------


def _bars_price_sql(off: int) -> str:
    e = f"(event_id + {off})"
    return (
        f"CASE WHEN {e} % 13 = 0 THEN 'N/A' "
        f"ELSE cast({e} % 9000 + 100 AS varchar) || '.' "
        f"|| lpad(cast({e} % 10000 AS varchar), 4, '0') END"
    )


def _bars_price_col(off: int) -> F.Column:
    e = F.col("event_id") + off
    base = F.concat(
        (e % 9000 + 100).cast("string"),
        F.lit("."),
        F.lpad((e % 10000).cast("string"), 4, "0"),
    )
    return F.when(e % 13 == 0, F.lit("N/A")).otherwise(base)


_BARS_OFFSETS = {"open": 0, "high": 7, "low": 13, "close": 3, "vwap": 5}


def _bars_raw(events: DataFrame) -> DataFrame:
    """Spark twin shaped as RAW_BARS_SCHEMA (timestamp pre-parsed) +
    event_id tie-break: stringly-typed prices with deterministic garbage
    so C9 try_cast has real nulls to coerce."""
    e = F.col("event_id")
    return events.select(
        e,
        F.concat(F.lit("S"), (F.col("user_id") % 15)).alias("symbol"),
        F.col("ts").alias("timestamp"),
        *[_bars_price_col(off).alias(c) for c, off in _BARS_OFFSETS.items()],
        F.when(e % 17 == 0, F.lit("x"))
        .otherwise((e % 5000).cast("string"))
        .alias("volume"),
        F.when(e % 19 == 0, F.lit(None))
        .otherwise((e % 500).cast("string"))
        .alias("trade_count"),
    )


def bars_clean_oracle(src: str = "events") -> str:
    """DuckDB twin of the full bars transform (raw derivation → C9
    coercion → W1-W4 gap-fill → all-null drop), parameterized on the
    events-shaped source relation so flows_e2e_state can replay it over
    a capped/deduplicated subset. Emits doubles (the registered
    projection's final cast)."""
    return f"""
    WITH raw AS (
      SELECT event_id,
             'S' || (user_id % 15)                       AS symbol,
             ts                                          AS bar_ts,
             {_bars_price_sql(0)}                        AS open,
             {_bars_price_sql(7)}                        AS high,
             {_bars_price_sql(13)}                       AS low,
             {_bars_price_sql(3)}                        AS close,
             {_bars_price_sql(5)}                        AS vwap,
             CASE WHEN event_id % 17 = 0 THEN 'x'
                  ELSE cast(event_id % 5000 AS varchar) END AS volume,
             CASE WHEN event_id % 19 = 0 THEN NULL
                  ELSE cast(event_id % 500 AS varchar) END  AS trade_count
      FROM {src}
    ),
    coerced AS (
      SELECT symbol, bar_ts, event_id,
             try_cast(open  AS decimal(12,4)) AS open,
             try_cast(high  AS decimal(12,4)) AS high,
             try_cast(low   AS decimal(12,4)) AS low,
             try_cast(close AS decimal(12,4)) AS close,
             try_cast(vwap  AS decimal(12,4)) AS vwap,
             try_cast(volume AS int)          AS volume,
             try_cast(trade_count AS int)     AS trade_count
      FROM raw
    ),
    filled AS (
      SELECT symbol, bar_ts, event_id,
             coalesce(last_value(open IGNORE NULLS) OVER wff,
                      first_value(open IGNORE NULLS) OVER wbf)  AS open,
             coalesce(last_value(high IGNORE NULLS) OVER wff,
                      first_value(high IGNORE NULLS) OVER wbf)  AS high,
             coalesce(last_value(low IGNORE NULLS) OVER wff,
                      first_value(low IGNORE NULLS) OVER wbf)   AS low,
             coalesce(last_value(close IGNORE NULLS) OVER wff,
                      first_value(close IGNORE NULLS) OVER wbf) AS close,
             coalesce(last_value(vwap IGNORE NULLS) OVER wff,
                      first_value(vwap IGNORE NULLS) OVER wbf)  AS vwap,
             coalesce(volume, 0)                                AS volume,
             coalesce(trade_count, 0)                           AS trade_count
      FROM coerced
      WINDOW wff AS (PARTITION BY symbol ORDER BY bar_ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wbf AS (PARTITION BY symbol ORDER BY bar_ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT symbol AS ticker, bar_ts,
           cast(open  AS double) AS open,
           cast(high  AS double) AS high,
           cast(low   AS double) AS low,
           cast(close AS double) AS close,
           cast(vwap  AS double) AS vwap,
           volume, trade_count
    FROM filled
    WHERE open IS NOT NULL AND high IS NOT NULL AND low IS NOT NULL
      AND close IS NOT NULL AND vwap IS NOT NULL
    """


@register("bars_clean", oracle=bars_clean_oracle())
def q_bars_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end bars transform flow (C9 try_cast, W1-W4 gap-fill, F10,
    F5) over a raw frame derived from events. Scale: one shuffle on
    symbol for the shared gap-fill windows; coercion map-side. Local
    wall time is bounded by the 15-symbol window parallelism — a
    testdata-cardinality artifact; production symbol counts (thousands)
    parallelize the same plan fully.

    The pipeline keeps prices DECIMAL(12,4) (stock_bar.py:42-45 parity);
    the registered projection casts them to double ONCE at the end so
    the final frame carries no raw decimal columns (driver-canonicalizer
    discipline, same as every other money query)."""
    events = load_table(spark, sf_dir, "events")
    cleaned = clean_bars(_bars_raw(events), tiebreak_col="event_id")
    price_cols = ["open", "high", "low", "close", "vwap"]
    return cleaned.select(
        *[
            F.col(c).cast("double").alias(c) if c in price_cols else F.col(c)
            for c in cleaned.columns
        ]
    )
