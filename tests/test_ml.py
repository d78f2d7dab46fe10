"""MLlib sentiment pipeline: deterministic training, AUC floor, and a
JVM-only scoring path (no Python UDF in the plan)."""

from __future__ import annotations

from pyspark.ml.evaluation import BinaryClassificationEvaluator

from stonkwhisperer_spark.functions.text import clean_text_for_nlp
from stonkwhisperer_spark.ml.sentiment import score_sentiment, train_sentiment, weak_labels
from stonkwhisperer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sentiment_train_score_auc(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", clean_text_for_nlp("text").alias("content_cleaned")
    )
    labeled = weak_labels(docs, "content_cleaned", pos_word="fast", neg_word="slow").cache()
    model = train_sentiment(labeled)
    scored = model.transform(labeled)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction"
    ).evaluate(scored)
    assert auc > 0.8, f"AUC {auc} below floor"

    out = score_sentiment(model, labeled)
    assert {"prediction", "p_positive"} <= set(out.columns)
    rows = out.collect()
    assert len(rows) == labeled.count()
    assert all(0.0 <= r.p_positive <= 1.0 for r in rows)

    # determinism: retrain on the same data → identical predictions
    again = score_sentiment(train_sentiment(labeled), labeled)
    a = {r.doc_id: r.prediction for r in out.collect()}
    b = {r.doc_id: r.prediction for r in again.collect()}
    assert a == b

    # no Python UDF in the scoring plan (JVM-side end to end)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    labeled.unpersist()
