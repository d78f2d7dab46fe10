"""Explicit StructType schemas.

Two families:
 1. Reference entity schemas (SURVEY.md §1.2) — the stonkWhisperer storage
    model re-expressed as Spark types (reference: data_pipeline/models/
    article.py:15-81, reddit_post.py:20-88, company.py:11-40,
    stock_bar.py:17-58). VARCHAR(n) limits become data-quality checks,
    NUMERIC(12,4) becomes DecimalType(12,4), TIMESTAMPTZ becomes
    TimestampType under a UTC session.
 2. Raw landing-zone schemas — the shape of the reference extractors'
    output (extraction.py:28-223) so the transform operators are testable
    offline (FIXTURES.md §A1-A4). Schemas are always declared, never
    inferred (the reference's pandas inference is a bug surface, see
    SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- raw inputs

# NewsAPI article records (reference extraction.py:28-96 + content
# enrichment :329-346; consumed by transformation.py:13-78).
RAW_NEWS_SCHEMA = T.StructType(
    [
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), True),
                    T.StructField("name", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("author", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("urlToImage", T.StringType(), True),
        T.StructField("publishedAt", T.StringType(), True),  # ISO-8601 UTC
        T.StructField("content", T.StringType(), True),
    ]
)

# Reddit/PRAW post records (reference extraction.py:137-154 projection +
# linked-article enrichment :367-374).
RAW_POSTS_SCHEMA = T.StructType(
    [
        T.StructField("reddit_id", T.StringType(), True),
        T.StructField("subreddit", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("selftext", T.StringType(), True),
        T.StructField("score", T.LongType(), True),
        T.StructField("num_comments", T.LongType(), True),
        T.StructField("is_text_post", T.BooleanType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("link_flair_text", T.StringType(), True),
        T.StructField("upvote_ratio", T.DoubleType(), True),
        T.StructField("permalink", T.StringType(), True),
        T.StructField("published_at", T.LongType(), True),  # epoch seconds
        T.StructField("article_headline", T.StringType(), True),
        T.StructField("article_author", T.StringType(), True),
        T.StructField("article_publisher", T.StringType(), True),
        T.StructField("article_content", T.StringType(), True),
        T.StructField("article_published_at", T.StringType(), True),
        T.StructField("article_category", T.ArrayType(T.StringType()), True),
    ]
)

# Alpaca minute OHLCV bars (reference extraction.py:196-222). Prices may
# arrive as strings with garbage — the clean step try_casts them (C9).
RAW_BARS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("open", T.StringType(), True),
        T.StructField("high", T.StringType(), True),
        T.StructField("low", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
        T.StructField("vwap", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("trade_count", T.StringType(), True),
    ]
)

# ------------------------------------------------------------ clean entities

# articles (reference models/article.py:15-81)
ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("author", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("title_cleaned", T.StringType(), True),
        T.StructField("content_cleaned", T.StringType(), True),
        T.StructField("sentiment_strategy", T.StringType(), True),
        T.StructField("published_at", T.TimestampType(), True),
        T.StructField("source_name", T.StringType(), True),
        T.StructField("url", T.StringType(), False),  # unique merge key
    ]
)

# reddit_posts (reference models/reddit_post.py:20-88)
REDDIT_POSTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("article_id", T.StringType(), True),
        T.StructField("reddit_id", T.StringType(), False),  # unique merge key
        T.StructField("subreddit", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("body_text", T.StringType(), True),
        T.StructField("score", T.IntegerType(), True),
        T.StructField("number_of_comments", T.IntegerType(), True),
        T.StructField("is_text_post", T.BooleanType(), True),
        T.StructField("subreddit_category", T.StringType(), True),
        T.StructField("upvote_ratio", T.DoubleType(), True),
        T.StructField("published_at", T.TimestampType(), True),
        T.StructField("reddit_post_url", T.StringType(), True),
    ]
)

# companies (reference models/company.py:11-40)
COMPANIES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("ticker", T.StringType(), False),
    ]
)

# stock_bars (reference models/stock_bar.py:17-58); merge key
# (company_id, timestamp) per the composite unique constraint :20-22.
STOCK_BARS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("company_id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("open_price", T.DecimalType(12, 4), False),
        T.StructField("high_price", T.DecimalType(12, 4), False),
        T.StructField("low_price", T.DecimalType(12, 4), False),
        T.StructField("close_price", T.DecimalType(12, 4), False),
        T.StructField("volume", T.IntegerType(), False),
        T.StructField("trade_count", T.IntegerType(), False),
        T.StructField("vwap", T.DecimalType(12, 4), False),
    ]
)

# --------------------------------------------------- driver testdata tables

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
