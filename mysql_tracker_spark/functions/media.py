"""Multimodal (image/audio/video) column handling for the training-data
pipeline.

Media assets are OPAQUE ``binary`` columns plus a typed metadata struct
— the same stance the reference takes for BLOB columns (kept as bytes,
never interpreted: ``mysql/dbsync/event/RowsLogBuffer.java:756-829``).
All per-asset compute runs as Arrow-batched ``mapInPandas`` stages:
schema, partitioning, UDF signature and batch shape are real and
tested; only the *codec* innermost step is stubbed, because no
image/audio library ships in this container.

Stub policy: ``decode_image`` / ``decode_audio`` raise
``NotImplementedError`` when ``codec="real"`` (the seam where PIL /
soundfile / av would plug in), and default to ``codec="fake"`` — a
deterministic pure-numpy decode of the synthetic asset format below,
so every stage downstream of the codec (feature extraction, resize
geometry, frame sampling, batching) is exercised for real.

Synthetic asset format (``synth_assets``): header ``MTSA`` ++ u8 kind
++ u16 width ++ u16 height ++ u16 n_frames ++ payload bytes derived
from a seeded RNG — enough structure for decode/resize/sample to have
verifiable semantics.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MAGIC = b"MTSA"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2
_KIND_NAME = {KIND_IMAGE: "image", KIND_AUDIO: "audio", KIND_VIDEO: "video"}

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
    ]
)

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


# ---------------------------------------------------------------- synthesis

def synth_asset_meta(n: int = 64, seed: int = 7) -> pd.DataFrame:
    """Pure-pandas twin of :func:`synth_assets` METADATA (no payload):
    the same per-asset rng derivation, so driver-side consumers (e.g.
    the contract oracle's dump) can materialize the meta table without
    a SparkSession. Equality with the Spark synth is pytest-asserted."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind = i % 3
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        frames = int(rng.integers(2, 9)) if kind == KIND_VIDEO else 1
        body_len = w * h * frames
        rows.append((i, _KIND_NAME[kind], w, h, frames, len(MAGIC) + 7 + body_len))
    return pd.DataFrame(
        rows, columns=["asset_id", "media_type", "width", "height", "n_frames", "bytes"]
    )


def synth_asset_features(n: int = 64, seed: int = 7, n_bins: int = 8) -> pd.DataFrame:
    """Pure-pandas twin of ``extract_features(synth_assets(...))``: the
    same rng derivation and the same float64 numpy arithmetic as the
    distributed stages, so the values are BITWISE identical — the
    contract oracle's dump needs no rounding tolerance. Equality with
    the Spark path is pytest-asserted (tests/test_media.py)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind = i % 3
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        frames = int(rng.integers(2, 9)) if kind == KIND_VIDEO else 1
        body = rng.integers(0, 256, size=w * h * frames, dtype=np.uint8)
        flat = body.astype(np.float64)
        hist, _ = np.histogram(flat, bins=n_bins, range=(0, 256))
        rows.append(
            (
                i, _KIND_NAME[kind], w, h,
                float(flat.mean()), float(flat.std()),
                (hist / max(len(flat), 1)).tolist(),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "asset_id", "media_type", "width", "height",
            "mean_intensity", "std_intensity", "histogram",
        ],
    )


def synth_assets(spark, n: int = 64, seed: int = 7, parallelism: int | None = None) -> DataFrame:
    """Deterministic synthetic media table (distributed generation —
    each task synthesizes its id range)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 1_000_003 + i)
                kind = i % 3
                w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                frames = int(rng.integers(2, 9)) if kind == KIND_VIDEO else 1
                body = rng.integers(0, 256, size=w * h * frames, dtype=np.uint8).tobytes()
                payload = MAGIC + struct.pack("<BHHH", kind, w, h, frames) + body
                rows.append(
                    (
                        i,
                        _KIND_NAME[kind],
                        payload,
                        (w, h, frames, len(payload)),
                    )
                )
            yield pd.DataFrame(rows, columns=["asset_id", "media_type", "payload", "meta"])

    return (
        spark.range(n, numPartitions=parallelism or spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema=ASSET_SCHEMA)
    )


# ------------------------------------------------------------------- codecs

def _decode_payload(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """(kind, w, h, n_frames, pixels[frames, h, w]) of a synthetic asset."""
    if payload[:4] != MAGIC:
        raise ValueError("not a MTSA asset")
    kind, w, h, frames = struct.unpack("<BHHH", payload[4:11])
    px = np.frombuffer(payload[11 : 11 + w * h * frames], dtype=np.uint8)
    return kind, w, h, frames, px.reshape(frames, h, w)


def decode_image(payload: bytes, codec: str = "fake") -> np.ndarray:
    """THE CODEC SEAM. ``codec="real"`` is where PIL/libjpeg would be
    invoked; not available in this container."""
    if codec == "real":
        raise NotImplementedError(
            "real image codecs (PIL/libjpeg) are not installed in this "
            "environment; use codec='fake' (deterministic synthetic decode)"
        )
    _, _, _, _, px = _decode_payload(payload)
    return px[0]


def decode_audio(payload: bytes, codec: str = "fake") -> np.ndarray:
    if codec == "real":
        raise NotImplementedError(
            "real audio codecs (soundfile/ffmpeg) are not installed; "
            "use codec='fake'"
        )
    _, _, _, _, px = _decode_payload(payload)
    return px.reshape(-1).astype(np.float32) / 127.5 - 1.0


# ------------------------------------------------------------- spark stages

def extract_features(assets: DataFrame, n_bins: int = 8, codec: str = "fake") -> DataFrame:
    """Per-asset features via mapInPandas: decode -> intensity stats +
    coarse histogram. Runs on whatever partitioning the input has —
    embarrassingly parallel, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                _, w, h, _, px = _decode_payload(bytes(payload))
                if codec == "real":  # pragma: no cover - the stub seam
                    raise NotImplementedError("real codecs unavailable")
                flat = px.reshape(-1).astype(np.float64)
                hist, _ = np.histogram(flat, bins=n_bins, range=(0, 256))
                out.append(
                    (
                        aid, mt, w, h,
                        float(flat.mean()), float(flat.std()),
                        (hist / max(len(flat), 1)).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "mean_intensity", "std_intensity", "histogram",
                ],
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(assets: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Thumbnail stage: nearest-neighbour resize of frame 0 (pure
    numpy geometry — a real codec would swap in here untouched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, w, h, _, px = _decode_payload(bytes(payload))
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                thumb = px[0][np.ix_(ys, xs)]
                out.append((aid, out_w, out_h, thumb.tobytes()))
            yield pd.DataFrame(out, columns=["asset_id", "thumb_w", "thumb_h", "thumb"])

    return assets.mapInPandas(run, schema=THUMB_SCHEMA)


def sample_frames(assets: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling stage for video assets: one output row per kept
    frame (1:N mapInPandas — batch shape changes, which is the point)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
                    continue
                _, _, _, frames, px = _decode_payload(bytes(payload))
                for fi in range(0, frames, every):
                    out.append((aid, fi, px[fi].tobytes()))
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame"])

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


def media_summary(assets: DataFrame) -> DataFrame:
    """JVM-only metadata aggregation (no decode — metadata-first design:
    at 100 TB you filter/plan on the typed meta struct and decode only
    the selected subset)."""
    return (
        assets.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.col("meta.bytes")).alias("total_bytes"),
            F.avg(F.col("meta.width") * F.col("meta.height")).alias("avg_pixels"),
            F.max("meta.n_frames").alias("max_frames"),
        )
    )
