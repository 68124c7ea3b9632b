"""MultiApplyJob: one binlog stream fanned out to N lakestore targets,
each independently exactly-once against its own per-table oracle."""

import pandas as pd

from mysql_tracker_spark.runner import MultiApplyJob
from mysql_tracker_spark.sources.binlog_gen import (
    GenConfig,
    expected_final_state,
    gen_change_events,
    write_batches,
)

from .conftest import normalize

# noise rows (~2% of the stream) target chat.noise_tbl — a real second
# table in the same binlog, exactly the multi-table shape the
# reference tracks
CFG = GenConfig(n_events=4000, n_conversations=120, seed=29, noise_prob=0.10)


def test_multi_target_apply_each_matches_its_oracle(spark, tmp_path):
    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)
    multi = MultiApplyJob(
        spark,
        in_dir,
        {
            ("chat", "transcripts"): str(tmp_path / "t_main"),
            ("chat", "noise_tbl"): str(tmp_path / "t_noise"),
        },
        n_buckets=4,
    )
    res = multi.run()
    assert res["errors"] == {}
    for key in [("chat", "transcripts"), ("chat", "noise_tbl")]:
        stats = res[key]
        assert sum(s.rows_in for s in stats) == len(ev)  # same stream scanned
        job = multi.jobs[key]
        got = normalize(job.table.read(spark).toPandas())
        exp = normalize(expected_final_state(ev, *key))
        # score materializes via ADD COLUMN DDL, which only ever
        # targets chat.transcripts — the noise table's schema (rightly)
        # never gains the column, so compare the shared columns
        cols = ["conv_id", "turn_idx", "role", "text", "tool"]
        if key == ("chat", "transcripts"):
            cols.append("score")
        assert len(got) == len(exp) and len(exp) > 0
        pd.testing.assert_frame_equal(got[cols], exp[cols])
    # independence: the main table's watermark equals the noise table's
    # (both consumed the full stream) but lives in its own snapshot line
    wm_main = multi.jobs[("chat", "transcripts")].watermark()
    wm_noise = multi.jobs[("chat", "noise_tbl")].watermark()
    assert wm_main[:2] == wm_noise[:2]


def test_late_added_target_catches_up(spark, tmp_path):
    """A target declared AFTER the stream was already applied to
    another target starts from scratch and catches up from retained
    input — per-target fencing means no coordination is needed."""
    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)
    first = MultiApplyJob(
        spark, in_dir, {("chat", "transcripts"): str(tmp_path / "t_main")}, n_buckets=4
    )
    assert first.run()["errors"] == {}

    both = MultiApplyJob(
        spark,
        in_dir,
        {
            ("chat", "transcripts"): str(tmp_path / "t_main"),  # replays -> fence
            ("chat", "noise_tbl"): str(tmp_path / "t_noise"),  # catches up
        },
        n_buckets=4,
    )
    res = both.run()
    assert res["errors"] == {}
    # main target: full rerun fenced out (no new data applied)
    assert all(s.skipped for s in res[("chat", "transcripts")])
    got = normalize(both.jobs[("chat", "noise_tbl")].table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev, "chat", "noise_tbl"))
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "role", "text", "tool"]],
        exp[["conv_id", "turn_idx", "role", "text", "tool"]],
    )


def _prefix(ev, fence):
    f, p = fence
    return ev[(ev["file"] < f) | ((ev["file"] == f) & (ev["pos"] <= p))]


def test_consistent_read_pins_leader_at_laggard_fence(spark, tmp_path):
    """Snapshot-consistent cross-table read: target B lags 2/3 batches
    behind target A; consistent_read returns A time-travelled back to
    B's fence, and BOTH tables equal the sequential oracle applied to
    exactly the events at or before that fence (the reference's
    single-cursor consistency, re-established read-side)."""
    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)
    multi = MultiApplyJob(
        spark,
        in_dir,
        {
            ("chat", "transcripts"): str(tmp_path / "t_main"),
            ("chat", "noise_tbl"): str(tmp_path / "t_noise"),
        },
        n_buckets=4,
    )
    # laggard: both targets consume 2 batches, then only A finishes
    assert multi.run(max_batches=2)["errors"] == {}
    jA = multi.jobs[("chat", "transcripts")]
    jB = multi.jobs[("chat", "noise_tbl")]
    wm_b = jB.watermark()[:2]
    jA.run()
    assert jA.watermark()[:2] > wm_b  # A really is ahead

    frames, fence = multi.consistent_read()
    assert fence == wm_b  # greatest COMMON fence == the laggard's
    pre = _prefix(ev, fence)
    for key, frame in frames.items():
        got = normalize(frame.toPandas())
        exp = normalize(expected_final_state(pre, *key))
        cols = [c for c in ["conv_id", "turn_idx", "role", "text", "tool"] if c in got]
        assert len(got) == len(exp) and len(exp) > 0
        pd.testing.assert_frame_equal(got[cols], exp[cols])
    # and the leader's CURRENT state differs from its pinned state
    # (events landed past the fence), so the time travel was real
    cur = normalize(multi.jobs[("chat", "transcripts")].table.read(spark).toPandas())
    pinned = normalize(frames[("chat", "transcripts")].toPandas())
    assert not cur[["conv_id", "turn_idx", "text"]].equals(
        pinned[["conv_id", "turn_idx", "text"]]
    )


def test_consistent_read_txn_aligned_fence(spark, tmp_path):
    """txn_aligned=True restricts the fence to Xid-gated snapshots
    (offset == txn_end): over a txn-aligned input cut every commit
    qualifies, and the fence is a true transaction boundary (the
    snapshot's last applied event is a COMMIT/DDL frame)."""
    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3, txn_aligned=True)
    multi = MultiApplyJob(
        spark,
        in_dir,
        {
            ("chat", "transcripts"): str(tmp_path / "t_main"),
            ("chat", "noise_tbl"): str(tmp_path / "t_noise"),
        },
        n_buckets=4,
    )
    assert multi.run(max_batches=2)["errors"] == {}
    multi.jobs[("chat", "transcripts")].run()
    frames, fence = multi.consistent_read(txn_aligned=True)
    # the fence event really ends a transaction in the source stream
    at = ev[(ev["file"] == fence[0]) & (ev["pos"] == fence[1])]
    assert ((at["op"] == "COMMIT") | at["is_ddl"]).any()
    pre = _prefix(ev, fence)
    for key, frame in frames.items():
        got = normalize(frame.toPandas())
        exp = normalize(expected_final_state(pre, *key))
        cols = [c for c in ["conv_id", "turn_idx", "role", "text", "tool"] if c in got]
        pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_consistent_read_raises_when_no_common_fence(spark, tmp_path):
    """A target that never committed (or whose common snapshot was
    expired away) cannot join a consistent set — explicit error, never
    a silently-inconsistent read."""
    import pytest

    from mysql_tracker_spark.runner import ConsistencyError

    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)
    multi = MultiApplyJob(
        spark,
        in_dir,
        {
            ("chat", "transcripts"): str(tmp_path / "t_main"),
            ("chat", "noise_tbl"): str(tmp_path / "t_noise"),
        },
        n_buckets=4,
    )
    # only A runs; B exists but never committed a batch
    multi.jobs[("chat", "transcripts")].run()
    multi.jobs[("chat", "noise_tbl")].prepare()
    with pytest.raises(ConsistencyError):
        multi.consistent_read()


def test_stream_fanout_consistent_read(spark, tmp_path):
    """Fence alignment holds under the STREAMING front-end too: two
    CdcStreamJobs (one per target table) tail the same input with
    maxFilesPerTrigger=1, so per-micro-batch commits land on identical
    file boundaries regardless of trigger timing. The noise target goes
    down before the last file arrives; consistent_read over the two
    stream tables pins the leader back to the laggard's fence and both
    match the sequential oracle over exactly the prefix events."""
    import os
    import shutil

    from mysql_tracker_spark.lakestore.table import LakeTable
    from mysql_tracker_spark.runner import consistent_read
    from mysql_tracker_spark.streaming.stream_runner import CdcStreamJob

    ev = gen_change_events(CFG)
    in_dir = str(tmp_path / "in")
    all_paths = write_batches(ev, in_dir, n_batches=4)
    hidden = []
    for p in all_paths[3:]:  # last file arrives later
        dst = str(tmp_path / os.path.basename(p))
        shutil.move(p, dst)
        hidden.append((dst, p))

    def stream(tbl, ck, table_name):
        return CdcStreamJob(
            spark,
            in_dir,
            str(tmp_path / tbl),
            checkpoint_dir=str(tmp_path / ck),
            n_buckets=4,
            max_files_per_trigger=1,
            schema_name="chat",
            table_name=table_name,
        )

    stream("t_main", "ck_main", "transcripts").run_available()
    stream("t_noise", "ck_noise", "noise_tbl").run_available()
    for dst, orig in hidden:
        shutil.move(dst, orig)
    # only the transcripts stream comes back up for the new file
    stream("t_main", "ck_main", "transcripts").run_available()

    tables = {
        ("chat", "transcripts"): LakeTable.load(str(tmp_path / "t_main")),
        ("chat", "noise_tbl"): LakeTable.load(str(tmp_path / "t_noise")),
    }
    frames, fence = consistent_read(spark, tables)
    pre = _prefix(ev, fence)
    # the fence really is the laggard's position: some events lie past it
    assert len(pre) < len(ev)
    for key, frame in frames.items():
        got = normalize(frame.toPandas())
        exp = normalize(expected_final_state(pre, *key))
        cols = [c for c in ["conv_id", "turn_idx", "role", "text", "tool"] if c in got]
        assert len(got) == len(exp) and len(exp) > 0
        pd.testing.assert_frame_equal(got[cols], exp[cols])
