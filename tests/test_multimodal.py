"""Multimodal plumbing: mapInPandas decode stage over binary payloads —
schema, batch shape, determinism, and skew-bucket column."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    size_bucket,
)


def _media(spark):
    rows = [
        (i, ["image/png", "audio/wav", "video/mp4"][i % 3], bytes([i % 251]) * (10 + i * 7))
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )


def test_decode_features_schema_and_values(spark):
    out = decode_features(_media(spark))
    assert out.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 50
    # deterministic features of the bytes themselves
    assert rows[0].n_bytes == 10
    assert rows[0].header_hex == bytes([0]).hex() * 4
    assert len(rows[0].feature) == 8
    # single-valued payload → zero entropy; determinism across runs
    assert rows[0].byte_entropy == 0.0
    again = {r.media_id: r for r in decode_features(_media(spark)).collect()}
    assert all(rows[i].feature == again[i].feature for i in rows)


def test_decode_features_null_payload(spark):
    df = spark.createDataFrame(
        [(1, "image/png", None)], "media_id long, media_type string, payload binary"
    )
    row = decode_features(df).collect()[0]
    assert row.n_bytes is None and row.feature is None


def test_size_bucket_bounded(spark):
    out = size_bucket(_media(spark), n_buckets=8)
    stats = out.agg(
        F.min("_size_bucket").alias("lo"), F.max("_size_bucket").alias("hi")
    ).collect()[0]
    assert 0 <= stats.lo and stats.hi < 8
