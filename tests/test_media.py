"""Multimodal binary-column pipeline (media module): synthesis,
decode/feature/resize/frame-sample stages as Arrow-batched mapInPandas
— codec stubbed deterministically, plumbing (schema, partitioning,
batch shape) real."""

import struct

import numpy as np
import pytest

from mysql_tracker_spark.functions import media as M


def test_synth_deterministic_and_typed(spark):
    a = M.synth_assets(spark, n=24, seed=7).orderBy("asset_id").collect()
    b = M.synth_assets(spark, n=24, seed=7, parallelism=3).orderBy("asset_id").collect()
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
    r0 = a[0]
    assert bytes(r0["payload"])[:4] == M.MAGIC
    assert r0["meta"]["bytes"] == len(bytes(r0["payload"]))
    assert {r["media_type"] for r in a} == {"image", "audio", "video"}


def test_decode_roundtrip_matches_header():
    import pandas as pd

    payload = M.MAGIC + struct.pack("<BHHH", M.KIND_IMAGE, 4, 3, 1) + bytes(range(12))
    img = M.decode_image(payload)
    assert img.shape == (3, 4)
    assert img.reshape(-1).tolist() == list(range(12))


def test_real_codec_is_explicit_stub():
    payload = M.MAGIC + struct.pack("<BHHH", M.KIND_IMAGE, 2, 2, 1) + bytes(4)
    with pytest.raises(NotImplementedError):
        M.decode_image(payload, codec="real")
    with pytest.raises(NotImplementedError):
        M.decode_audio(payload, codec="real")


def test_feature_extraction_matches_numpy_oracle(spark):
    assets = M.synth_assets(spark, n=18, seed=9)
    feats = {r["asset_id"]: r for r in M.extract_features(assets).collect()}
    for r in assets.collect():
        _, w, h, fr, px = M._decode_payload(bytes(r["payload"]))
        f = feats[r["asset_id"]]
        flat = px.reshape(-1).astype(np.float64)
        assert f["width"] == w and f["height"] == h
        assert abs(f["mean_intensity"] - flat.mean()) < 1e-9
        assert abs(f["std_intensity"] - flat.std()) < 1e-9
        assert abs(sum(f["histogram"]) - 1.0) < 1e-9
        assert len(f["histogram"]) == 8


def test_resize_geometry(spark):
    assets = M.synth_assets(spark, n=9, seed=3)
    thumbs = {r["asset_id"]: r for r in M.resize_images(assets, 8, 8).collect()}
    for r in assets.collect():
        t = thumbs[r["asset_id"]]
        assert t["thumb_w"] == 8 and t["thumb_h"] == 8
        assert len(bytes(t["thumb"])) == 64
        # corner pixel invariant: nearest-neighbour keeps (0,0)
        _, w, h, _, px = M._decode_payload(bytes(r["payload"]))
        assert bytes(t["thumb"])[0] == int(px[0][0, 0])


def test_frame_sampling_video_only_and_stride(spark):
    assets = M.synth_assets(spark, n=24, seed=7)
    frames = M.sample_frames(assets, every=2).collect()
    by_asset = {}
    for f in frames:
        by_asset.setdefault(f["asset_id"], []).append(f["frame_idx"])
    kinds = {r["asset_id"]: (r["media_type"], r["meta"]["n_frames"]) for r in assets.collect()}
    assert by_asset, "some video assets expected"
    for aid, idxs in by_asset.items():
        mt, nf = kinds[aid]
        assert mt == "video"
        assert sorted(idxs) == list(range(0, nf, 2))
    # non-video assets yield no frames
    for aid, (mt, _) in kinds.items():
        if mt != "video":
            assert aid not in by_asset


def test_media_summary_is_jvm_only(spark):
    from mysql_tracker_spark.plans.checks import python_stage_count

    assets = M.synth_assets(spark, n=12, seed=7)
    summary = M.media_summary(assets)
    # the synthesis stage is python by design; the aggregation adds none
    assert python_stage_count(summary) == python_stage_count(assets)
    rows = {r["media_type"]: r for r in summary.collect()}
    assert rows["image"]["n_assets"] == 4
    assert rows["video"]["max_frames"] >= 2


def test_synth_meta_pandas_twin_equals_spark(spark):
    """The driver-side pandas meta twin must match the distributed
    generator's meta exactly (same rng derivation per asset)."""
    import pandas as pd

    from mysql_tracker_spark.functions.media import synth_asset_meta, synth_assets

    got = (
        synth_assets(spark, n=48, seed=7)
        .selectExpr(
            "asset_id", "media_type", "meta.width width", "meta.height height",
            "meta.n_frames n_frames", "meta.bytes bytes",
        )
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    exp = synth_asset_meta(n=48, seed=7)
    for c in ("width", "height", "n_frames"):
        got[c] = got[c].astype("int64")
        exp[c] = exp[c].astype("int64")
    got["bytes"] = got["bytes"].astype("int64"); exp["bytes"] = exp["bytes"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_synth_features_pandas_twin_is_bitwise_equal(spark):
    """The feature-dump twin must match the distributed decode->extract
    path BITWISE (same float64 arithmetic) — this is what lets the
    media_features contract oracle compare without rounding."""
    import pandas as pd

    from mysql_tracker_spark.functions.media import (
        extract_features,
        synth_asset_features,
        synth_assets,
    )

    got = (
        extract_features(synth_assets(spark, n=48, seed=7))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    exp = synth_asset_features(n=48, seed=7)
    for c in ("width", "height"):
        got[c] = got[c].astype("int64")
        exp[c] = exp[c].astype("int64")
    # check_exact: bitwise float equality, no tolerance
    pd.testing.assert_frame_equal(
        got.drop(columns=["histogram"]), exp.drop(columns=["histogram"]), check_exact=True
    )
    assert all(
        list(a) == list(b) for a, b in zip(got["histogram"], exp["histogram"])
    )


def test_real_codec_seam_decodes_pgm_and_wav(spark):
    """Opt-in real-codec path (round-4 VERDICT item 7): real-format
    bytes — binary/ASCII PGM images and stdlib-wave PCM WAV audio —
    decode through the same mapInPandas feature stage with
    codec='real'; formats that genuinely need PIL/soundfile/av raise
    NotImplementedError naming the library. The contract rows stay
    pinned to the synthetic codec and are untouched."""
    import io
    import struct as _struct
    import wave as _wave

    import numpy as np
    import pytest

    from mysql_tracker_spark.functions.media import (
        ASSET_SCHEMA,
        decode_audio,
        decode_image,
        extract_features,
    )

    # binary PGM (P5), 4x3 gradient
    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    pgm5 = b"P5\n# comment\n4 3\n255\n" + img.tobytes()
    assert (decode_image(pgm5, codec="real") == img).all()
    # ASCII PGM (P2) with a non-255 maxval rescales to 0..255
    # (maxval 51 -> exact x5 scale, no float rounding ambiguity)
    pgm2 = b"P2\n2 2\n51\n0 10\n51 25\n"
    got2 = decode_image(pgm2, codec="real")
    assert got2.tolist() == [[0, 50], [255, 125]]

    # 16-bit PCM WAV via the stdlib writer
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        samples = [0, 16384, -16384, 32767, -32768]
        wf.writeframes(b"".join(_struct.pack("<h", s) for s in samples))
    wav = buf.getvalue()
    a = decode_audio(wav, codec="real")
    assert a.dtype == np.float32 and len(a) == 5
    assert abs(a[1] - 0.5) < 1e-3 and abs(a[4] + 1.0) < 1e-6

    # unknown formats name the missing optional library
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(b"\x89PNG\r\n\x1a\nrest", codec="real")
    # 16-bit PGM stores 2 bytes/sample: refuse rather than misdecode
    with pytest.raises(NotImplementedError, match="16-bit PGM"):
        decode_image(b"P5\n2 2\n65535\n" + b"\x00" * 8, codec="real")
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"OggS...", codec="real")

    # the full Spark stage over real payloads
    rows = [
        (1, "image", bytearray(pgm5), (4, 3, 1, len(pgm5))),
        (2, "audio", bytearray(wav), (len(samples), 1, 1, len(wav))),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = {
        r.asset_id: r
        for r in extract_features(assets, codec="real").collect()
    }
    assert (feats[1].width, feats[1].height) == (4, 3)
    assert feats[1].mean_intensity == pytest.approx(img.mean())
    assert (feats[2].width, feats[2].height) == (5, 1)
    assert abs(sum(feats[2].histogram) - 1.0) < 1e-9

    # real video decode stays behind the av/ffmpeg seam
    vid = [(3, "video", bytearray(b"xxxx"), (1, 1, 1, 4))]
    with pytest.raises(Exception, match="av/ffmpeg"):
        extract_features(
            spark.createDataFrame(vid, ASSET_SCHEMA), codec="real"
        ).collect()
