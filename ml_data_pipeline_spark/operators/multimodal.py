"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(BASELINE.json scope: a training-data pipeline at 100 TB carries media
blobs through the same tables as text).

Design (the part that matters at scale — and is fully real and tested here):
- media is an opaque ``binary`` column plus typed metadata columns
  (media_type, width/height/duration, byte length, content hash);
- per-blob compute (decode, resize, feature-extract, frame-sample) runs as
  Arrow-batched ``mapInPandas`` — one Python worker round-trip per batch,
  never per row; the UDF signature streams batches so a partition never
  materializes fully in Python memory;
- partitioning: blobs are heavy and skewed → repartition by a hash of the
  content BEFORE the Python stage so batches are size-balanced;
- only the codec itself is stubbed: the container ships no image/audio
  libs, so ``decode_image`` raises NotImplementedError unless a
  deterministic fake decoder is requested (used by tests and the driver
  gate — it exercises the identical plumbing).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + stable content hash (dedup
    key). No Python involved — this is the first-pass filter that should
    remove exact-dup blobs BEFORE any expensive decode."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


def exact_media_dedup(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact blob dedup on the content hash — the shuffle carries
    (hash, media_id), never the payload (same shape as dedup.exact_dedup)."""
    hashed = attach_media_metadata(df, payload_col)
    # NULL payloads hash to NULL, and a NULL key never matches in the semi
    # join — such rows used to vanish entirely (r10 review). They are not
    # duplicates of anything (unknown content), so they pass through.
    null_rows = hashed.where(F.col("payload_sha256").isNull())
    nonnull = hashed.where(F.col("payload_sha256").isNotNull())
    keep = nonnull.groupBy("payload_sha256").agg(F.min("media_id").alias("media_id"))
    return (
        nonnull.join(keep, ["payload_sha256", "media_id"], "left_semi")
        .unionByName(null_rows)
        .drop("payload_bytes", "payload_sha256")
    )


def _fake_decode(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for a real image decoder: 8 'pixel statistics'
    derived from the bytes. Same signature/shape a real decoder would
    return — the Spark plumbing cannot tell the difference."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    s = sum(payload)
    mx, mn = max(payload), min(payload)
    return [
        float(n),
        float(s % 997),
        float(mx),
        float(mn),
        float(s / n),
        float(payload[0]),
        float(payload[-1]),
        float((width or 0) * (height or 0)),
    ]


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: str = "stub",
) -> DataFrame:
    """Decode + feature-extract per blob via mapInPandas (Arrow batches).

    decoder='stub' raises NotImplementedError (no codec libs in this
    container); decoder='fake' runs the deterministic fake — identical
    batching, schema, and partition behavior to a real codec.
    """
    if decoder == "stub":
        raise NotImplementedError(
            "real image/audio decode needs codec libraries not present in "
            "this environment; use decoder='fake' for the plumbing path"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(
                    bytes(p) if p is not None else b"",
                    int(w) if pd.notna(w) else 0,
                    int(h) if pd.notna(h) else 0,
                )
                for p, w, h in zip(pdf[payload_col], pdf["meta_width"], pdf["meta_height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    # size-balance the Python stage: payloads are skewed; hashing the ID
    # spreads heavy blobs across workers (id-hash, not content-hash — the
    # module doc previously claimed content; id is equally uniform here
    # and avoids recomputing sha256 when metadata wasn't attached)
    balanced = df.repartition(F.col("media_id"))
    return balanced.mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: explode the timeline into (media_id,
    frame_ts_ms) rows JVM-side, so the expensive per-frame decode (stubbed)
    is already parallelized per frame, not per video — the 2-hour-video
    straggler problem is solved before Python is involved.

    Videos with NULL or non-positive duration contribute no frames (r10
    review: a 0-ms duration crashed the stage with 'Illegal sequence
    boundaries' and a NULL one vanished without the guard making that
    explicit; the unused payload_col param is gone)."""
    return (
        df.where(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.when(
                    F.col("meta_duration_ms") > 0,
                    F.expr(f"sequence(0, meta_duration_ms - 1, {every_ms})"),
                ).otherwise(F.array().cast("array<bigint>"))
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


def synth_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/queries (no media libs:
    payloads are hash-derived bytes; metadata is plausible)."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 2654435761 + j * 97 + seed) % 251) for j in range(50 + i % 200))
        rows.append(
            (
                i,
                mtype,
                bytearray(payload),
                64 + (i % 8) * 16 if mtype == "image" else None,
                48 + (i % 8) * 12 if mtype == "image" else None,
                (1 + i % 10) * 2000 if mtype == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
