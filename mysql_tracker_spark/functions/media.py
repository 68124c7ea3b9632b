"""Multimodal (image/audio/video) column handling for the training-data
pipeline.

Media assets are OPAQUE ``binary`` columns plus a typed metadata struct
— the same stance the reference takes for BLOB columns (kept as bytes,
never interpreted: ``mysql/dbsync/event/RowsLogBuffer.java:756-829``).
All per-asset compute runs as Arrow-batched ``mapInPandas`` stages:
schema, partitioning, UDF signature and batch shape are real and
tested; only the *codec* innermost step is stubbed, because no
image/audio library ships in this container.

Codec policy: ``codec="fake"`` (the default and the contract/test
path) is a deterministic pure-numpy decode of the synthetic asset
format below, so every stage downstream of the codec (feature
extraction, resize geometry, frame sampling, batching) is exercised
for real. ``codec="real"`` is the opt-in real-format seam: it uses
PIL (images) / soundfile (audio) WHEN IMPORTABLE, and otherwise falls
back to dependency-free real-format decoders — pure-numpy PGM (P5/P2)
for images and stdlib-``wave`` PCM WAV for audio — so the real seam
is usable even in minimal containers; other formats raise
``NotImplementedError`` naming the missing library. Real video decode
(av/ffmpeg) has no stdlib fallback and always raises without the
library.

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


def _decode_pgm(payload: bytes) -> np.ndarray:
    """Dependency-free decode of a binary (P5) or ASCII (P2) PGM image
    — a real public format (netpbm), usable without PIL."""
    toks: list[bytes] = []
    i = 0
    # header = 4 whitespace-separated tokens (magic, w, h, maxval),
    # '#' comments run to end-of-line
    while len(toks) < 4 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.find(b"\n", i)
            i = len(payload) if i < 0 else i + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < 4 or toks[0] not in (b"P5", b"P2"):
        raise ValueError("not a PGM image")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval > 255:
        # 16-bit PGM stores 2 big-endian bytes per sample — reading it
        # as uint8 would silently produce garbage (review fix)
        raise NotImplementedError(
            "16-bit PGM (maxval > 255) needs pillow (pip install "
            "pillow); the dependency-free fallback decodes 8-bit only"
        )
    if toks[0] == b"P5":
        data = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i + 1)
    else:
        data = np.array(payload[i:].split()[: w * h], dtype=np.int64)
    px = data.reshape(h, w).astype(np.float64) * (255.0 / max(maxval, 1))
    return px.round().astype(np.uint8)


def decode_image(payload: bytes, codec: str = "fake") -> np.ndarray:
    """THE CODEC SEAM. ``codec="real"`` decodes real image bytes:
    PIL when importable (any format it knows, converted to grayscale),
    else the dependency-free PGM decoder; anything else raises
    ``NotImplementedError`` naming the missing library."""
    if codec == "real":
        try:
            from PIL import Image  # noqa: PLC0415 - optional extra
        except ImportError:
            if payload[:2] in (b"P5", b"P2"):
                return _decode_pgm(payload)
            raise NotImplementedError(
                "real image decode needs pillow for non-PGM formats "
                "(pip install pillow); PGM (P5/P2) decodes without it"
            ) from None
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    _, _, _, _, px = _decode_payload(payload)
    return px[0]


def decode_audio(payload: bytes, codec: str = "fake") -> np.ndarray:
    """``codec="real"`` decodes real audio bytes to float32 in [-1, 1]:
    soundfile when importable, else stdlib ``wave`` for PCM WAV
    (8/16-bit); anything else raises ``NotImplementedError``."""
    if codec == "real":
        try:
            import soundfile  # noqa: PLC0415 - optional extra
        except ImportError:
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                import io
                import wave

                with wave.open(io.BytesIO(payload), "rb") as wf:
                    width = wf.getsampwidth()
                    raw = wf.readframes(wf.getnframes())
                if width == 2:
                    return (
                        np.frombuffer(raw, dtype="<i2").astype(np.float32)
                        / 32768.0
                    )
                if width == 1:  # 8-bit WAV is unsigned
                    return (
                        np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                        - 128.0
                    ) / 128.0
                raise NotImplementedError(
                    f"{8 * width}-bit WAV needs soundfile (pip install "
                    "soundfile); 8/16-bit PCM decodes without it"
                )
            raise NotImplementedError(
                "real audio decode needs soundfile for non-WAV formats "
                "(pip install soundfile); PCM WAV decodes without it"
            ) from None
        import io

        data, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(data, dtype=np.float32).reshape(-1)
    _, _, _, _, px = _decode_payload(payload)
    return px.reshape(-1).astype(np.float32) / 127.5 - 1.0


# ------------------------------------------------------------- spark stages

def extract_features(assets: DataFrame, n_bins: int = 8, codec: str = "fake") -> DataFrame:
    """Per-asset features via mapInPandas: decode -> intensity stats +
    coarse histogram. Runs on whatever partitioning the input has —
    embarrassingly parallel, no shuffle. ``codec="real"`` decodes real
    image/audio bytes through :func:`decode_image`/:func:`decode_audio`
    (audio samples are mapped back to the uint8 intensity domain so the
    stats/histogram semantics match); real video needs av/ffmpeg and
    raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                if codec == "real":
                    if mt == "image":
                        px2 = decode_image(bytes(payload), codec="real")
                        h, w = px2.shape
                        flat = px2.reshape(-1).astype(np.float64)
                    elif mt == "audio":
                        a = decode_audio(bytes(payload), codec="real")
                        w, h = len(a), 1
                        flat = (a.astype(np.float64) + 1.0) * 127.5
                    else:
                        raise NotImplementedError(
                            "real video decode needs av/ffmpeg"
                        )
                else:
                    _, w, h, _, px = _decode_payload(bytes(payload))
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
