"""MLlib sentiment pipeline (BASELINE north star; reference stores the
strategy name per article — models/article.py:49-54 sentiment_strategy —
but has no model; this supplies the idiomatic Spark one).

Tokenizer → StopWordsRemover → HashingTF → IDF → LogisticRegression,
all JVM-side: tokenization and TF live in whole-stage-friendly
transformers, scoring is a vector dot product per row — no Python in
the hot path. Deterministic: fixed seed, fixed hash space.

Scale: training is the only iterative stage (LR over a cached feature
frame); scoring is a map-only pass you can run inside foreachBatch on
the streaming ingest (SURVEY §2.9) or over the full corpus.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer, StopWordsRemover
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def build_sentiment_pipeline(
    text_col: str = "content_cleaned",
    label_col: str = "label",
    num_features: int = 1 << 16,
) -> Pipeline:
    tok = RegexTokenizer(inputCol=text_col, outputCol="_toks", pattern=r"\s+")
    stop = StopWordsRemover(inputCol="_toks", outputCol="_toks_f")
    tf = HashingTF(inputCol="_toks_f", outputCol="_tf", numFeatures=num_features)
    idf = IDF(inputCol="_tf", outputCol="_features")
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        predictionCol="prediction",
        probabilityCol="probability",
        maxIter=20,
        regParam=0.01,
    )
    return Pipeline(stages=[tok, stop, tf, idf, lr])


def train_sentiment(
    df: DataFrame, text_col: str = "content_cleaned", label_col: str = "label"
) -> PipelineModel:
    """Fit the pipeline; callers cache ``df`` when it feeds multiple
    LR iterations from remote storage."""
    return build_sentiment_pipeline(text_col, label_col).fit(df)


def score_sentiment(model: PipelineModel, df: DataFrame) -> DataFrame:
    """Batch scoring: input columns + prediction + positive-class
    probability. Map-only, JVM-side."""
    scored = model.transform(df)
    pos_prob = F.element_at(vector_to_array("probability"), 2)
    return scored.select(
        *df.columns, F.col("prediction"), pos_prob.alias("p_positive")
    )


def weak_labels(df: DataFrame, text_col: str, pos_word: str, neg_word: str) -> DataFrame:
    """Deterministic weak supervision for tests/demos: label = 1 when
    pos_word occurrences outnumber neg_word occurrences."""

    def count_of(w: str):
        c = F.coalesce(F.col(text_col), F.lit(""))
        return (F.length(c) - F.length(F.replace(c, F.lit(w), F.lit("")))) / len(w)

    return df.withColumn(
        "label", (count_of(pos_word) > count_of(neg_word)).cast("double")
    )
