"""Initial-snapshot bootstrap + CDC catchup (Debezium "initial
snapshot" analogue; the reference can only bootstrap the *position*,
``tracker/position/EntryPosition.java:45-69`` — never the data).

Convergence claims under test:

* aligned fence: seed from the state-at-position-P, fence at P, replay
  the full retained input -> prefix fenced out, suffix applied, final
  state equals the never-bootstrapped full apply;
* FUZZY fence: seed from a snapshot read while writes continued
  (snapshot reflects events past the fence), fence at an earlier
  position -> the overlap window re-applies over already-reflecting
  rows, and full-image LWW MERGE makes that a per-key no-op, so the
  final state still converges.
"""

import pandas as pd
import pytest

from mysql_tracker_spark.runner import CdcApplyJob
from mysql_tracker_spark.sources.binlog_gen import (
    GenConfig,
    gen_change_events,
    write_batches,
)

from .conftest import normalize

CFG = GenConfig(n_events=4000, n_conversations=150, seed=11)
CMP = ["conv_id", "turn_idx", "role", "text", "tool", "score", "ts"]


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boot_stream"))
    ev = gen_change_events(CFG)
    write_batches(ev, d, n_batches=4)
    return d


@pytest.fixture(scope="module")
def full_state(spark, stream, tmp_path_factory):
    """Final state of the plain (never-bootstrapped) full apply."""
    p = str(tmp_path_factory.mktemp("boot_full") / "t")
    job = CdcApplyJob(spark, stream, p, n_buckets=8)
    job.run()
    return normalize(job.table.read(spark).toPandas())


def _snapshot_at(spark, stream, tmp_path, n_batches):
    """State + watermark after applying the first ``n_batches``."""
    p = str(tmp_path / f"snap{n_batches}")
    job = CdcApplyJob(spark, stream, p, n_buckets=8)
    job.run(max_batches=n_batches)
    wm_file, wm_pos, _ = job.watermark()
    return job.table.read(spark), (wm_file, wm_pos)


def test_bootstrap_catchup_matches_full_apply(spark, stream, full_state, tmp_path):
    snap_df, (f, p) = _snapshot_at(spark, stream, tmp_path, 2)
    job = CdcApplyJob(spark, stream, str(tmp_path / "t"), n_buckets=8)
    v = job.bootstrap_snapshot(snap_df, f, p)
    assert v >= 1
    assert job.table.properties()["bootstrap"] == "snapshot"
    stats = job.run()
    # the seeded fence skips the already-reflected prefix batches
    assert [s.skipped for s in stats[:2]] == [True, True]
    assert not stats[2].skipped and not stats[3].skipped
    got = normalize(job.table.read(spark).toPandas())
    pd.testing.assert_frame_equal(got[CMP], full_state[CMP])


def test_bootstrap_fuzzy_overlap_converges(spark, stream, full_state, tmp_path):
    # snapshot reflects batches 0-1, but the fence is batch 0's end:
    # batch 1 replays over rows that already include it
    snap_df, _ = _snapshot_at(spark, stream, tmp_path, 2)
    _, (f0, p0) = _snapshot_at(spark, stream, tmp_path, 1)
    job = CdcApplyJob(spark, stream, str(tmp_path / "t"), n_buckets=8)
    job.bootstrap_snapshot(snap_df, f0, p0)
    stats = job.run()
    assert stats[0].skipped and not stats[1].skipped
    got = normalize(job.table.read(spark).toPandas())
    pd.testing.assert_frame_equal(got[CMP], full_state[CMP])


def test_bootstrap_refuses_nonempty(spark, stream, tmp_path):
    snap_df, (f, p) = _snapshot_at(spark, stream, tmp_path, 1)
    job = CdcApplyJob(spark, stream, str(tmp_path / "t"), n_buckets=8)
    job.bootstrap_snapshot(snap_df, f, p)
    with pytest.raises(ValueError, match="watermark"):
        job.bootstrap_snapshot(snap_df, f, p)
    # explicit re-bootstrap is allowed and rewrites cleanly
    v = job.bootstrap_snapshot(snap_df, f, p, allow_nonempty=True)
    assert v == job.table.current_version()


def test_bootstrap_validates_schema(spark, stream, tmp_path):
    snap_df, (f, p) = _snapshot_at(spark, stream, tmp_path, 1)
    job = CdcApplyJob(spark, stream, str(tmp_path / "t2"), n_buckets=8)
    with pytest.raises(ValueError, match="missing table columns"):
        job.bootstrap_snapshot(snap_df.drop("text"), f, p)


def test_bootstrap_lineage_row(spark, stream, tmp_path):
    import json
    import os

    snap_df, (f, p) = _snapshot_at(spark, stream, tmp_path, 1)
    tbl = str(tmp_path / "t3")
    job = CdcApplyJob(spark, stream, tbl, n_buckets=8)
    job.bootstrap_snapshot(snap_df, f, p)
    with open(os.path.join(tbl, "lineage.jsonl")) as fh:
        rec = json.loads(fh.readlines()[-1])
    assert rec["batch_id"] == -1
    assert rec["write_mode"] == "bootstrap"
    assert rec["file_end"] == f and rec["pos_end"] == p
    assert rec["rows_in"] == snap_df.count()


def test_bootstrap_then_streaming_catchup(spark, stream, full_state, tmp_path):
    """Bootstrap composes with the Structured Streaming front-end: seed
    + fence via the stream job's inner apply job, then the availableNow
    drain replays everything — the fence skips the pre-snapshot prefix
    (rows_applied 0, table version unchanged by those epochs) and the
    final state equals the never-bootstrapped full apply."""
    from mysql_tracker_spark.streaming import CdcStreamJob

    snap_df, (f, p) = _snapshot_at(spark, stream, tmp_path, 2)
    sj = CdcStreamJob(
        spark,
        stream,
        str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
    )
    v_boot = sj.job.bootstrap_snapshot(snap_df, f, p)
    stats = sj.run_available()
    assert len(stats) == 4
    assert [s.skipped for s in stats[:2]] == [True, True]
    assert all(not s.skipped for s in stats[2:])
    assert all(s.snapshot_version is None for s in stats[:2])  # no commits
    got = normalize(sj.job.table.read(spark).toPandas())
    pd.testing.assert_frame_equal(got[CMP], full_state[CMP])
    assert sj.job.table.current_version() > v_boot
