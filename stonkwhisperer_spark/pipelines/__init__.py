"""The reference's three transform flows re-expressed as composable
DataFrame pipelines (SURVEY.md §3.1–3.3, data_pipeline/tasks/
transformation.py).

Each takes a raw landing-zone DataFrame (schemas.RAW_*_SCHEMA) and
returns the clean entity frame. All steps are native column expressions
— no UDFs, map-mostly plans whose only shuffle is the dedup/gap-fill
key."""

from stonkwhisperer_spark.pipelines.bars import clean_bars
from stonkwhisperer_spark.pipelines.news import clean_news
from stonkwhisperer_spark.pipelines.posts import clean_posts

__all__ = ["clean_bars", "clean_news", "clean_posts"]
