"""Multimodal binary-column plumbing (stubbed codecs, real Spark path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synth_media_table(spark, n=60)


def test_metadata_and_hash(media):
    out = MM.attach_media_metadata(media)
    rows = out.select("media_id", "payload_bytes", "payload_sha256").collect()
    assert all(r["payload_bytes"] > 0 and len(r["payload_sha256"]) == 64 for r in rows)


def test_exact_media_dedup(spark, media):
    # duplicate the first 10 payloads under new ids
    dup = media.limit(10).withColumn("media_id", F.col("media_id") + 1000)
    out = MM.exact_media_dedup(media.unionByName(dup))
    assert out.count() == 60  # dups collapsed, originals (min id) survive
    assert out.where(F.col("media_id") >= 1000).count() == 0


def test_decode_stub_raises(media):
    with pytest.raises(NotImplementedError):
        MM.extract_media_features(media, decoder="stub")


def test_fake_decoder_runs_mapinpandas(media):
    out = MM.extract_media_features(media, decoder="fake")
    rows = out.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same input → same features
    again = {r["media_id"]: r["features"] for r in MM.extract_media_features(media, decoder="fake").collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert first == again


def test_frame_sample_plan(media):
    plan = MM.frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    # every video expands to duration/1000 frames
    durations = {
        r["media_id"]: r["meta_duration_ms"]
        for r in media.where(F.col("media_type") == "video").collect()
    }
    got = {r["media_id"]: r["count"] for r in rows}
    assert got == {mid: d // 1000 for mid, d in durations.items()}


def test_r10_multimodal_null_and_duration_guards(spark):
    """r10 review: NULL payloads pass through dedup (they used to vanish
    at the NULL join key); zero/NULL-duration videos contribute no frames
    instead of crashing sequence()."""
    from ml_data_pipeline_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [
            (1, "image", bytearray(b"xx"), 0),
            (2, "image", bytearray(b"xx"), 0),   # dup of 1
            (3, "image", None, 0),               # NULL payload
            (4, "video", bytearray(b"v"), 0),    # ZERO duration
            (5, "video", bytearray(b"v2"), None),  # NULL duration
            (6, "video", bytearray(b"v3"), 2500),
        ],
        "media_id long, media_type string, payload binary, meta_duration_ms long",
    )
    kept = {r["media_id"] for r in MM.exact_media_dedup(df).collect()}
    assert kept == {1, 3, 4, 5, 6}  # dup 2 dropped, NULL payload KEPT
    plan = MM.frame_sample_plan(df, every_ms=1000).collect()
    assert {r["media_id"] for r in plan} == {6}  # 0/NULL durations: no crash
    assert sorted(r["frame_ts_ms"] for r in plan) == [0, 1000, 2000]
