"""Reddit-posts transform pipeline (reference data_pipeline/tasks/
transformation.py:81-181 — transform_praw_data).

Step order follows the reference: renames (:91-99) → category
array-join (:104-106) → dedup (:108-112) → required-field dropna
(:114-124) → fill map (:129-142) → link-post filter (:149) → text clean
(:151-155) → epoch-seconds parse (:166-172) → casts (:174-178).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stonkwhisperer_spark.functions.text import clean_text_for_nlp

# C3 constant-default fill map (reference :129-142).
_FILL_MAP = {
    "body_text": "No text",
    "author": "[deleted]",
    "subreddit_category": "None",
}
_FILL_NUM = {"score": 0, "number_of_comments": 0, "upvote_ratio": 0.5}


def clean_posts(
    raw: DataFrame,
    order_col: str = "_arrival_id",
    flairs: list[str] | None = None,
) -> DataFrame:
    """RAW_POSTS_SCHEMA (+ arrival-order column) → clean reddit_posts.

    * F5 renames: selftext→body_text, num_comments→number_of_comments,
      link_flair_text→subreddit_category, permalink→reddit_post_url.
    * C4 array→string: article_category joined with ', ' (:104-106).
    * A2 dedup keep-first on (reddit_id, reddit_post_url) (:108-112).
    * F8 drop rows missing reddit_id/subreddit/published_at (:114-124).
    * C3 fill map (:129-142); F9 compound link-post filter (:149);
      C1 body text clean; C6 epoch-seconds parse (:166-172);
      C10 int casts (:174-178); C11 sha256 surrogate id.

    ``flairs``: F1 — the reference pushes a ``flair:"A" OR flair:"B"``
    predicate into the Reddit search query (extraction.py:114-119,
    325-327); the in-engine equivalent is an isin filter, which
    Catalyst pushes to the landing-zone scan.

    Scale: one shuffle (the dedup window on the high-cardinality
    reddit_id key); the rest is map-side.
    """
    if flairs is not None:
        raw = raw.filter(F.col("link_flair_text").isin(list(flairs)))
    renamed = raw.withColumnsRenamed(
        {
            "selftext": "body_text",
            "num_comments": "number_of_comments",
            "link_flair_text": "subreddit_category",
            "permalink": "reddit_post_url",
        }
    ).withColumn("article_category", F.array_join("article_category", ", "))

    w = W.partitionBy("reddit_id", "reddit_post_url").orderBy(order_col)
    deduped = (
        renamed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )
    required = deduped.na.drop("any", subset=["reddit_id", "subreddit", "published_at"])
    filled = required.na.fill(_FILL_MAP).na.fill(_FILL_NUM)
    # F9: remove link posts whose article_published_at is null or ''
    # (reference :149 — mask with ~, &, |).
    kept = filled.filter(
        ~(
            (~F.col("is_text_post"))
            & (
                F.col("article_published_at").isNull()
                | (F.col("article_published_at") == "")
            )
        )
    )
    return kept.select(
        F.sha2(F.concat(F.lit("post:"), F.col("reddit_id")), 256).alias("id"),
        "reddit_id",
        "subreddit",
        "author",
        "title",
        clean_text_for_nlp("body_text").alias("body_text"),
        F.col("score").cast("int").alias("score"),
        F.col("number_of_comments").cast("int").alias("number_of_comments"),
        "is_text_post",
        "subreddit_category",
        "upvote_ratio",
        F.timestamp_seconds("published_at").cast("timestamp_ntz").alias("published_at"),
        "reddit_post_url",
        F.col("article_category").alias("article_categories"),
    )
