from stonkwhisperer_spark.functions.text import (
    clean_text_for_nlp,
    language_id,
    quality_signals,
    token_count,
)

__all__ = ["clean_text_for_nlp", "token_count", "language_id", "quality_signals"]
