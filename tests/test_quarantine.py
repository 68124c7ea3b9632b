"""Dead-letter quarantine for corrupt wire frames: the decode path
drops them (reference log-and-skip, LogDecoder.java:158-169); the
opt-in quarantine persists them with a reason so data loss at 10^10
events stays auditable."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysql_tracker_spark.schema import RAW_FRAME_SCHEMA
from mysql_tracker_spark.sources.binlog_gen import GenConfig, gen_change_events
from mysql_tracker_spark.sources.wire import (
    HEADER_LEN,
    encode_frames,
    quarantine_frames,
    read_quarantine,
    write_wire_batches,
)

CFG = GenConfig(n_events=2000, n_conversations=80, seed=51)


def _restamp_crc(payload: bytes) -> bytes:
    """Recompute the additive checksum after a body edit (used to craft
    a frame that is checksum-CLEAN but structurally malformed)."""
    s = sum(payload[:-4]) & 0xFFFFFFFF
    return payload[:-4] + s.to_bytes(4, "little")


def _corrupt(frames):
    """Deterministically corrupt three well-separated frames; returns
    (mutated frames df, {(file, pos): reason})."""
    frames = frames.copy()
    n = len(frames)
    picks = [n // 4, n // 2, (3 * n) // 4]
    expected = {}

    i = picks[0]  # truncated: shorter than header+crc+1
    frames.at[i, "payload"] = bytes(frames.at[i, "payload"])[:10]
    expected[(frames.at[i, "file"], int(frames.at[i, "pos"]))] = "truncated"

    i = picks[1]  # bad_crc: +1 a body byte, checksum not restamped
    p = bytearray(bytes(frames.at[i, "payload"]))
    p[HEADER_LEN] = (p[HEADER_LEN] + 1) % 256
    frames.at[i, "payload"] = bytes(p)
    expected[(frames.at[i, "file"], int(frames.at[i, "pos"]))] = "bad_crc"

    i = picks[2]  # malformed: a field separator vanishes, checksum FIXED
    p = bytes(frames.at[i, "payload"])
    body = p[HEADER_LEN:-4]
    assert b"\x1f" in body
    frames.at[i, "payload"] = _restamp_crc(
        p[:HEADER_LEN] + body.replace(b"\x1f", b"?", 1) + p[-4:]
    )
    expected[(frames.at[i, "file"], int(frames.at[i, "pos"]))] = "malformed"
    return frames, expected


def test_quarantine_scan_classifies_reasons(spark):
    frames = encode_frames(gen_change_events(CFG))
    mutated, expected = _corrupt(frames)
    df = spark.createDataFrame(mutated, RAW_FRAME_SCHEMA)

    got = {
        (r["file"], r["pos"]): r["reason"]
        for r in quarantine_frames(df).collect()
    }
    assert got == expected
    # clean stream -> zero quarantine rows
    clean = spark.createDataFrame(frames, RAW_FRAME_SCHEMA)
    assert quarantine_frames(clean).count() == 0


def test_quarantine_payload_is_verbatim(spark):
    frames = encode_frames(gen_change_events(CFG))
    mutated, expected = _corrupt(frames)
    df = spark.createDataFrame(mutated, RAW_FRAME_SCHEMA)
    rows = quarantine_frames(df).collect()
    by_fp = {(r["file"], r["pos"]): r for r in rows}
    src = {
        (f, int(p)): bytes(b)
        for f, p, b in zip(mutated["file"], mutated["pos"], mutated["payload"])
        if (f, int(p)) in expected
    }
    for fp, r in by_fp.items():
        assert bytes(r["payload"]) == src[fp]
        assert r["n_bytes"] == len(src[fp])


def test_apply_job_quarantine_e2e(spark, tmp_path):
    from mysql_tracker_spark.runner import CdcApplyJob

    ev = gen_change_events(CFG)
    d = str(tmp_path / "in")
    paths = write_wire_batches(ev, d, n_batches=3)

    # corrupt three frames inside the SECOND batch file
    t = pq.read_table(paths[1]).to_pandas()
    mutated, expected = _corrupt(t)
    schema = pa.schema([("file", pa.string()), ("pos", pa.int64()), ("payload", pa.binary())])
    pq.write_table(pa.Table.from_pandas(mutated, schema=schema, preserve_index=False), paths[1])

    qdir = str(tmp_path / "dead_letter")
    job = CdcApplyJob(
        spark, d, str(tmp_path / "tbl"), source_format="wire",
        n_buckets=8, quarantine_dir=qdir,
    )
    stats = job.run()
    assert [s.frames_quarantined for s in stats] == [0, len(expected), 0]

    q = read_quarantine(spark, qdir)
    got = {(r["file"], r["pos"]): r["reason"] for r in q.collect()}
    assert got == expected
    # the job still applied the clean remainder
    assert job.table.read(spark).count() > 0

    # replay: fenced batches never re-scan, quarantine unchanged
    stats2 = job.run()
    assert all(s.skipped for s in stats2)
    assert read_quarantine(spark, qdir).count() == len(expected)

    # crash-window double-write: a duplicated quarantine segment dedups
    # at read time on (file, pos)
    import os

    sub = next(p for p in os.listdir(qdir))
    shutil.copytree(os.path.join(qdir, sub), os.path.join(qdir, "batch-99999-deadbeef"))
    assert read_quarantine(spark, qdir).count() == len(expected)


def test_quarantine_disabled_by_default(spark, tmp_path):
    from mysql_tracker_spark.runner import CdcApplyJob

    ev = gen_change_events(GenConfig(n_events=600, n_conversations=40, seed=52))
    d = str(tmp_path / "in")
    write_wire_batches(ev, d, n_batches=1)
    job = CdcApplyJob(spark, d, str(tmp_path / "tbl"), source_format="wire", n_buckets=4)
    stats = job.run()
    assert all(s.frames_quarantined is None for s in stats)
