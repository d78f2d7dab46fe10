"""News transform pipeline (reference data_pipeline/tasks/
transformation.py:13-78 — transform_news_data).

Step order follows the reference: missing-value handling (:26-30,
:263-275) → rename/drop (:31-45) → dedup keep-first on url (:47-49) →
text cleaning (:51-53) → surrogate id (:56) → timestamp parse (:59-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.functions.text import clean_text_for_nlp


def clean_news(raw: DataFrame, order_col: str = "_arrival_id") -> DataFrame:
    """RAW_NEWS_SCHEMA (+ an arrival-order column) → clean articles frame.

    * F4/C13 nested projection: ``source.name`` → source_name.
    * C2 coalesce chain: content ← coalesce(content, description, title);
      author ← 'No Author'; title ← 'Untitled Article'
      (reference :263-275).
    * F5/F6: publishedAt→published_at; drop urlToImage/description/source.
    * A1 dedup keep-first by url, "first" = min(order_col) — the arrival
      order pandas keep='first' relies on (:47-49, SURVEY §7.4).
    * C1 clean title/content; C5 ISO parse; F7 drop null content (:270);
      C11 deterministic sha256 surrogate id instead of uuid4 (:56).

    Scale: single shuffle (the url dedup window); everything else is
    map-side codegen.
    """
    fixed = raw.select(
        F.col(order_col),
        F.col("url"),
        F.col("source").getField("name").alias("source_name"),
        F.coalesce("author", F.lit("No Author")).alias("author"),
        F.coalesce("title", F.lit("Untitled Article")).alias("title"),
        F.coalesce("content", "description", "title").alias("content"),
        F.col("publishedAt"),
    ).filter(F.col("content").isNotNull())  # F7 runs pre-dedup (ref :26-30 vs :47)
    w = W.partitionBy("url").orderBy(order_col)
    deduped = (
        fixed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )
    return deduped.select(
        F.sha2(F.col("url"), 256).alias("id"),
        "author",
        "title",
        "content",
        clean_text_for_nlp("title").alias("title_cleaned"),
        clean_text_for_nlp("content").alias("content_cleaned"),
        F.col("publishedAt").cast("timestamp_ntz").alias("published_at"),
        "source_name",
        "url",
    )
