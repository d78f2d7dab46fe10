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


def test_resize_images_fixed_output(spark):
    from stonkwhisperer_spark.operators.multimodal import RESIZED_SCHEMA, resize_images

    out = resize_images(_media(spark), width=8, height=4)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.pixels) == 8 * 4 for r in rows)  # constant-size contract
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_sample_frames_row_expansion(spark):
    from stonkwhisperer_spark.operators.multimodal import FRAME_SCHEMA, sample_frames

    # payload of media_id i has 10 + 7i bytes (see _media); with
    # 20-byte frames and every_n=1: (10 + 7i) // 20 frames per row.
    out = sample_frames(_media(spark), frame_bytes=20, every_n=1)
    assert out.schema == FRAME_SCHEMA
    per_doc = {r.media_id: r.cnt for r in out.groupBy("media_id").agg(
        F.count("*").alias("cnt")).collect()}
    for i, cnt in per_doc.items():
        assert cnt == (10 + 7 * i) // 20
    # media 0 (10 bytes) yields no complete frame and is absent
    assert 0 not in per_doc and 1 not in per_doc and 2 in per_doc
    assert all(len(r.frame) == 20 for r in out.collect())

    # every_n=2 halves the sampled frames (rounded up per video)
    half = sample_frames(_media(spark), frame_bytes=20, every_n=2)
    for r in half.groupBy("media_id").agg(F.count("*").alias("cnt")).collect():
        assert r.cnt == -(-per_doc[r.media_id] // 2)
