"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas functions
via ``mapInPandas``.

The Spark-side architecture here is the real deliverable for 100 TB:

- assets are rows of (asset_id, kind, payload BINARY, meta STRUCT) — the
  payload column stays opaque to Catalyst, metadata columns stay native so
  filters on kind/size/dims prune BEFORE any decode runs;
- decode/feature steps are ``mapInPandas`` batch iterators: Arrow moves
  payload bytes executor-side in columnar batches, the pandas function
  yields augmented batches, and Spark pipelines the whole thing per
  partition (no driver involvement, no per-row Python overhead);
- partitioning: repartition by a hash of asset_id before heavy decode so
  work balances even when payload sizes skew.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image``'s real path raises ``NotImplementedError`` behind the
``codec="real"`` flag, and the default is a **deterministic fake decoder**
(dimensions/features derived from the payload bytes themselves) — the
schema contract, batching shape, and partition behavior are real and
tested; only the pixel math is stubbed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_type", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_IMAGE_SCHEMA = (
    "asset_id long, kind string, width int, height int, channels int, "
    "sha256 string, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_sha256 string"


def synthetic_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table: payload = md5-chain bytes. Stands in
    for a real binary-column source (parquet/tar shards) in tests."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.unbase64(
                F.base64(
                    F.concat(
                        F.unhex(F.md5(F.concat(F.lit(str(seed)), F.col("id")))),
                        F.unhex(F.md5(F.concat(F.col("id"), F.lit("payload")))),
                    )
                )
            ).alias("payload"),
        )
        .withColumn(
            "meta",
            F.struct(
                F.concat(F.lit("synthetic/"), F.col("asset_id")).alias("source"),
                F.length("payload").cast("long").alias("n_bytes"),
                F.concat(F.lit("application/x-fake-"), F.col("kind")).alias(
                    "content_type"
                ),
            ),
        )
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str, list[float]]:
    """Deterministic stand-in for pixel decoding: dims/features from the
    payload bytes. Replace with PIL/ffmpeg in a codec-equipped image."""
    digest = hashlib.sha256(payload).hexdigest()
    width = 64 + payload[0] % 192
    height = 64 + payload[1] % 192
    channels = 1 + payload[2] % 3
    feature = [b / 255.0 for b in payload[:8]]
    return width, height, channels, digest, feature


def decode_images(assets: DataFrame, codec: str = "fake", batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract the image assets via mapInPandas.

    ``codec="real"`` is the PIL/ffmpeg slot — explicitly NotImplemented in
    this container. The filter on ``kind`` happens BEFORE the Python
    boundary, so non-image payload bytes are never shipped to Python.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            raise NotImplementedError(
                "real image decoding requires PIL/ffmpeg, not present in this "
                "container; use codec='fake' for the deterministic stub"
            )
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "sha256": [d[3] for d in decoded],
                    "feature": [d[4] for d in decoded],
                }
            )

    images = assets.filter(F.col("kind") == "image").select("asset_id", "kind", "payload")
    # Hash-repartition before the Python stage: payload sizes skew, decode
    # cost follows bytes, and range-partitioned asset_ids correlate with
    # crawl order -> hash spreads the heavy tail.
    return images.repartition(F.col("asset_id")).mapInPandas(op, DECODED_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = (
    "asset_id long, width int, height int, resized binary, resized_sha256 string"
)


def resize_images(
    assets: DataFrame, width: int = 32, height: int = 32, codec: str = "fake"
) -> DataFrame:
    """Resize step of the image pipeline: emits a new (smaller) binary
    payload per image asset at the requested dimensions.

    With ``codec="fake"`` the 'pixels' are a deterministic strided
    resample of the payload bytes (index ``i * len // (w*h)`` — the
    nearest-neighbor access pattern a real resampler has, minus the pixel
    math); ``codec="real"`` is the PIL slot, NotImplemented here. The
    output payload is width*height bytes, so downstream stages see the
    size contract a real thumbnailer would produce. Same Spark shape as
    decode_images: kind filter before Python, hash repartition, Arrow
    batches."""
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")
    n_out = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            raise NotImplementedError(
                "real image resizing requires PIL, not present in this "
                "container; use codec='fake' for the deterministic stub"
            )
        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                payload = bytes(payload)
                out = bytes(payload[(i * len(payload)) // n_out] for i in range(n_out))
                resized.append(out)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                    "resized_sha256": [
                        hashlib.sha256(r).hexdigest() for r in resized
                    ],
                }
            )

    images = assets.filter(F.col("kind") == "image").select("asset_id", "payload")
    return images.repartition(F.col("asset_id")).mapInPandas(op, RESIZED_IMAGE_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "asset_id long, chunk_idx int, byte_start long, byte_len long, "
    "chunk_sha256 string, mean_level double"
)


def chunk_audio(assets: DataFrame, chunk_bytes: int = 8) -> DataFrame:
    """Audio chunking + per-chunk level feature: split each audio payload
    into fixed-byte chunks (the stand-in for fixed-duration windows a real
    resampler would cut), emitting byte offsets, a digest, and the mean
    byte level (the fake 'RMS'). Completes the image/audio/video trio on
    the same Spark shape: kind filter before Python, hash repartition,
    1-to-N Arrow batches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "chunk_idx": [], "byte_start": [],
                "byte_len": [], "chunk_sha256": [], "mean_level": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload)
                for idx, start in enumerate(range(0, len(payload), chunk_bytes)):
                    chunk = payload[start : start + chunk_bytes]
                    out["asset_id"].append(aid)
                    out["chunk_idx"].append(idx)
                    out["byte_start"].append(start)
                    out["byte_len"].append(len(chunk))
                    out["chunk_sha256"].append(hashlib.sha256(chunk).hexdigest())
                    out["mean_level"].append(sum(chunk) / len(chunk) / 255.0)
            yield pd.DataFrame(out)

    audio = assets.filter(F.col("kind") == "audio").select("asset_id", "payload")
    return audio.repartition(F.col("asset_id")).mapInPandas(op, AUDIO_CHUNK_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 4, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video assets: deterministic frame indices +
    per-frame digests (the real codec would decode at those offsets).
    Demonstrates the 1-to-N batch shape (one asset row -> many frame rows)
    through mapInPandas.

    The fake per-frame digest is ``sha256(payload + b":" + frame_no)``
    with an ASCII ordinal suffix — deliberately NUL-free so a SQL oracle
    can recompute it over text payloads (see x_sample_frames)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"asset_id": [], "frame_idx": [], "frame_sha256": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = min(max_frames, max(1, len(payload) // every_n))
                for i in range(n_frames):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i * every_n)
                    out["frame_sha256"].append(
                        hashlib.sha256(payload + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    videos = assets.filter(F.col("kind") == "video").select("asset_id", "payload")
    return videos.repartition(F.col("asset_id")).mapInPandas(op, FRAME_SAMPLE_SCHEMA)
