"""Structured Streaming front-end: drain a directory of micro-batches
via foreachBatch and converge to the same state as batch replay."""

import pandas as pd
import pytest

from mysql_tracker_spark.sources.binlog_gen import (
    GenConfig,
    expected_final_state,
    gen_change_events,
    write_batches,
)
from mysql_tracker_spark.streaming import CdcStreamJob

from .conftest import normalize

CFG = GenConfig(n_events=3000, n_conversations=120, seed=21)
CMP = ["conv_id", "turn_idx", "role", "text", "tool", "score"]


def test_stream_drain_matches_oracle(spark, tmp_path):
    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=4)
    job = CdcStreamJob(
        spark,
        in_dir,
        str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
    )
    stats = job.run_available()
    assert len(stats) >= 1 and sum(s.rows_in for s in stats) == len(ev)
    got = normalize(job.job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])


def test_stream_restart_resumes_and_converges(spark, tmp_path):
    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    all_paths = write_batches(ev, in_dir, n_batches=4)
    # stage 1: only the first two files exist
    import os
    import shutil

    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    hidden = []
    for p in all_paths[2:]:
        dst = str(tmp_path / os.path.basename(p))
        shutil.move(p, dst)
        hidden.append((dst, p))
    job = CdcStreamJob(
        spark, in_dir, str(tmp_path / "tbl"), checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=8
    )
    job.run_available()
    # new files arrive; a fresh query (same checkpoint) drains the rest
    for dst, orig in hidden:
        shutil.move(dst, orig)
    job2 = CdcStreamJob(
        spark, in_dir, str(tmp_path / "tbl"), checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=8
    )
    job2.run_available()
    got = normalize(job2.job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])


def test_stream_wire_format_matches_oracle(spark, tmp_path):
    """Streaming over raw BINARY wire frames: decode in foreachBatch,
    same final table as the oracle."""
    from mysql_tracker_spark.sources.wire import write_wire_batches

    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_wire_batches(ev, in_dir, n_batches=3)
    job = CdcStreamJob(
        spark,
        in_dir,
        str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_format="wire",
        n_buckets=8,
    )
    stats = job.run_available()
    assert sum(s.rows_in for s in stats) == len(ev)
    got = normalize(job.job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])


def test_heartbeat_probe_and_reload(spark, tmp_path):
    """M4 heartbeat: healthy probe after a drain; source failure flips
    reload_needed; reload() resumes from the committed checkpoint and
    converges (exactly-once makes the reference's close+prepare safe)."""
    from mysql_tracker_spark.streaming.stream_runner import Heartbeat

    ev = gen_change_events(GenConfig(n_events=1200, n_conversations=60, seed=23))
    d = str(tmp_path / "in")
    write_batches(ev, d, n_batches=3)
    sj = CdcStreamJob(
        spark, d, str(tmp_path / "t"), str(tmp_path / "ck"), n_buckets=4
    )
    hb = Heartbeat(sj, stall_after_s=600)
    q = sj.start(available_now=True)
    hb.attach(q)
    q.awaitTermination()
    checks = hb.probe()
    assert checks["source_ok"] and checks["sink_ok"]
    assert not checks["reload_needed"] or not checks.get("query_alive", True)

    # source failure -> reload flag (the reference's mysql-ping failure)
    sj.input_dir = str(tmp_path / "gone")
    bad = hb.probe()
    assert not bad["source_ok"] and bad["reload_needed"]
    sj.input_dir = d

    # reference recovery: close + prepare + resume; table converges
    q2 = hb.reload(available_now=True)
    q2.awaitTermination()
    got = normalize(sj.job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    cmp_cols = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
    pd.testing.assert_frame_equal(got[cmp_cols], exp[cmp_cols])
