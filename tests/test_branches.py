"""Branches (Iceberg branch / fast_forward analogue): an independent
snapshot chain sharing the table's data files — write/audit on the
branch, main untouched, fast-forward publishes atomically, retention
respects live branches."""

import os

import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.lakestore import LakeTable
from mysql_tracker_spark.lakestore.table import CommitConflictError


def _ch(spark, rows):
    """Change frame in the MERGE contract shape (one row per key +
    boolean __delete)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    ).withColumn("__delete", F.lit(False))


def _mk_table(spark, path, rows):
    ch = _ch(spark, rows)
    schema = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    ).schema
    t = LakeTable.create(
        path, schema, key_cols=["conv_id", "turn_idx"],
        bucket_by="conv_id", n_buckets=4,
    )
    t.merge(spark, ch)
    return t


def _state(spark, t, version=None):
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read(spark, version=version).collect()
    }


def test_branch_write_isolated_then_fast_forward(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a"), ("c2", 0, "b")])
    v_main = t.current_version()
    main_before = _state(spark, t)

    br = t.branch("audit")
    assert t.branch_names() == ["audit"]
    up1 = _ch(spark, [("c1", 0, "a2"), ("c3", 0, "new")])
    up2 = _ch(spark, [("c2", 0, "b2")])
    br.merge(spark, up1, properties={"offset_file": "f", "offset_pos": "10"})
    br.merge(spark, up2, properties={"offset_file": "f", "offset_pos": "20"})

    # branch sees its commits; main is untouched
    assert _state(spark, br) == {
        ("c1", 0): "a2", ("c2", 0): "b2", ("c3", 0): "new",
    }
    assert t.current_version() == v_main
    assert _state(spark, t) == main_before
    # branch changelog works across its chain (seed = fork point)
    ch = br.read_changes(spark, br.fork_version(), br.current_version())
    assert ch.count() == 3

    v = t.fast_forward("audit", properties={"published_by": "test"})
    assert v == v_main + 1
    assert _state(spark, t) == {
        ("c1", 0): "a2", ("c2", 0): "b2", ("c3", 0): "new",
    }
    # squashed publish carries the branch head's replay watermark
    assert t.properties()["offset_pos"] == "20"
    assert t.properties()["published_by"] == "test"
    assert t.manifest()["summary"]["operation"] == "fast-forward"
    assert t.branch_names() == []
    rep = t.validate(spark, deep=True)
    assert rep["ok"], rep["issues"]


def test_fast_forward_conflicts_when_main_moved(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("b")
    br.merge(spark, _ch(spark, [("c1", 0, "branch")]))
    # a commit lands on main after the fork
    t.merge(spark, _ch(spark, [("c9", 0, "main")]))
    with pytest.raises(CommitConflictError):
        t.fast_forward("b")
    # main retains its own commit; branch still readable
    assert _state(spark, t)[("c9", 0)] == "main"
    assert _state(spark, br)[("c1", 0)] == "branch"


def test_drop_branch_reaps_only_branch_files(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a"), ("c2", 0, "b")])
    main_files = set(t.live_files())
    br = t.branch("tmp")
    br.merge(spark, _ch(spark, [("c1", 0, "x")]))
    branch_only = set(br.live_files()) - main_files
    assert branch_only
    removed = t.drop_branch("tmp")
    assert removed == len(branch_only)
    for rel in branch_only:
        assert not os.path.exists(os.path.join(t.path, rel))
    for rel in main_files:
        assert os.path.exists(os.path.join(t.path, rel))
    assert t.branch_names() == []
    assert t.validate(spark, deep=True)["ok"]


def test_expiry_protects_branch_fork_files(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("keep")  # forks at the current head
    # churn main so the fork version falls out of the retention window
    for i in range(6):
        t.merge(spark, _ch(spark, [("c1", 0, f"v{i}")]))
    t.expire_snapshots(keep_last=2)
    # the branch still reads its fork state: its referenced files
    # survived expiry even though the fork snapshot itself is gone
    assert _state(spark, br) == {("c1", 0): "a"}
    # and orphan GC does not eat branch files either
    br.merge(spark, _ch(spark, [("c1", 0, "onb")]))
    t.gc_orphans(min_age_s=0.0)
    assert _state(spark, br) == {("c1", 0): "onb"}


def test_branch_guards_main_only_ops_and_duplicate_names(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("b")
    for op in (
        lambda: br.expire_snapshots(),
        lambda: br.gc_orphans(),
        lambda: br.tag("x"),
        lambda: br.drop(),
        lambda: br.branch("nested"),
    ):
        with pytest.raises(RuntimeError):
            op()
    with pytest.raises(ValueError):
        t.branch("b")  # create-once
    with pytest.raises(ValueError):
        t.branch("bad/name")
    with pytest.raises(FileNotFoundError):
        t.load_branch("nope")
    # empty branch fast-forward is a no-op that consumes the ref
    v = t.current_version()
    assert t.fast_forward("b") == v
    assert t.branch_names() == []


def test_branch_time_travel_and_mor(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("m")
    fork_v = br.fork_version()
    br.merge_mor(spark, _ch(spark, [("c1", 0, "d1")]))
    br.merge_mor(spark, _ch(spark, [("c1", 0, "d2")]))
    # time travel within the branch chain
    assert _state(spark, br, version=fork_v) == {("c1", 0): "a"}
    assert _state(spark, br) == {("c1", 0): "d2"}
    br.compact(spark)
    assert _state(spark, br) == {("c1", 0): "d2"}
    t.fast_forward("m")
    assert _state(spark, t) == {("c1", 0): "d2"}
    assert t.validate(spark, deep=True)["ok"]


def test_cdc_apply_onto_branch_then_publish(spark, tmp_path):
    """The flagship branch use-case: a suspect window of the stream is
    applied onto a branch (its own watermark chain; main untouched),
    audited, then fast-forwarded — the published table equals the
    uninterrupted sequential-oracle state, and a main-bound job resumes
    past the branch's watermark (no replay)."""
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
        write_batches,
    )
    from tests.conftest import normalize

    ev = gen_change_events(GenConfig(n_events=3000, n_conversations=80, seed=7))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)
    tbl = str(tmp_path / "tbl")

    # batch 1 lands on main
    CdcApplyJob(spark, in_dir, tbl, n_buckets=8).run(max_batches=1)
    t = LakeTable.load(tbl)
    main_wm = t.properties()["offset_pos"]

    # the rest of the stream goes to a branch
    bj = CdcApplyJob(spark, in_dir, tbl, n_buckets=8, branch="staging")
    stats = bj.run()
    assert stats[0].skipped  # branch fence starts at the fork watermark
    assert t.properties()["offset_pos"] == main_wm  # main untouched

    t.fast_forward("staging")
    got = normalize(t.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    assert got.equals(exp), "published branch state != sequential oracle"

    # main job resumes past the branch's published watermark: full no-op
    again = CdcApplyJob(spark, in_dir, tbl, n_buckets=8).run()
    assert all(s.skipped for s in again)


def test_fast_forward_mor_branch_compacts_first(spark, tmp_path):
    """A branch head holding MOR delta entries (branch-chain seqs) must
    not be published raw: the squashed main version is lower than the
    branch delta seqs, so a later main MOR commit would stamp an
    equal-or-lower seq and max_by(seq) reads would prefer the stale
    branch delta. fast_forward compacts first (spark required), and a
    post-publish main MOR write wins LWW."""
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("m")
    br.merge_mor(spark, _ch(spark, [("c1", 0, "d1")]))
    br.merge_mor(spark, _ch(spark, [("c1", 0, "d2")]))
    with pytest.raises(ValueError, match="delta"):
        t.fast_forward("m")  # no spark -> refuse, branch intact
    assert "m" in t.branch_names()
    v = t.fast_forward("m", spark=spark)
    assert t.current_version() == v
    assert _state(spark, t) == {("c1", 0): "d2"}
    rep = t.validate(spark, deep=True)
    assert rep["ok"], rep["issues"]  # no delta seq above the version
    # the decisive check: a NEWER main MOR write must beat the
    # published branch state under LWW-by-seq
    t.merge_mor(spark, _ch(spark, [("c1", 0, "after-publish")]))
    assert _state(spark, t) == {("c1", 0): "after-publish"}


def test_fast_forward_refuses_pending_branch_stage(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("w")
    br.merge(spark, _ch(spark, [("c1", 0, "staged")]), stage_as="audit-1")
    with pytest.raises(ValueError, match="WAP"):
        t.fast_forward("w")
    # resolve the stage, then publish cleanly
    br.publish_staged("audit-1")
    t.fast_forward("w")
    assert _state(spark, t) == {("c1", 0): "staged"}


def test_branch_create_adopts_crash_debris_dir(spark, tmp_path):
    """A killed branch() can leave a seedless branch dir; it must not
    wedge the name nor break listings."""
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    os.makedirs(os.path.join(t.path, "snapshots", "branches", "ghost"))
    assert t.branch_names() == []  # seedless dir is not a live branch
    br = t.branch("ghost")  # adopted, not "already exists"
    assert t.branch_names() == ["ghost"]
    br.merge(spark, _ch(spark, [("c1", 0, "g")]))
    assert _state(spark, br) == {("c1", 0): "g"}


def test_fast_forward_retry_after_crash_between_commit_and_cleanup(
    spark, tmp_path
):
    """Crash window: the main commit landed but the branch-ref rmtree
    did not.  A retried fast_forward must recognize the already-
    published head and finish the cleanup as a no-op — not raise a
    (misleading) CommitConflictError forever."""
    import shutil

    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("audit")
    br.merge(spark, _ch(spark, [("c2", 0, "b")]))
    # simulate the crash: copy the branch dir aside, publish, restore
    bdir = os.path.join(t._branches_dir(), "audit")
    shutil.copytree(bdir, str(tmp_path / "saved"))
    v = t.fast_forward("audit")
    shutil.copytree(str(tmp_path / "saved"), bdir)
    assert t.branch_names() == ["audit"]
    # retry completes as ref cleanup, state unchanged
    assert t.fast_forward("audit") == v
    assert t.branch_names() == []
    assert _state(spark, t) == {("c1", 0): "a", ("c2", 0): "b"}
    # a DIFFERENT stale branch whose head was never published still
    # conflicts (with the drop_branch hint)
    t2 = _mk_table(spark, str(tmp_path / "t2"), [("x", 0, "a")])
    b2 = t2.branch("dev")
    b2.merge(spark, _ch(spark, [("y", 0, "n")]))
    t2.merge(spark, _ch(spark, [("z", 0, "m")]))  # main moves on
    with pytest.raises(CommitConflictError, match="drop_branch"):
        t2.fast_forward("dev")


def test_register_table_skips_branch_dropped_mid_registration(
    spark, tmp_path
):
    """A branch removed between branch_names() and load_branch() must
    not abort catalog registration."""
    from mysql_tracker_spark.catalog import register_table

    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("ghost")
    br.merge(spark, _ch(spark, [("c2", 0, "b")]))
    t.branch("alive").merge(spark, _ch(spark, [("c3", 0, "c")]))

    orig = LakeTable.load_branch

    def racy(self, name):
        if name == "ghost" and os.path.isdir(
            os.path.join(self._branches_dir(), "ghost")
        ):
            import shutil

            shutil.rmtree(os.path.join(self._branches_dir(), "ghost"))
        return orig(self, name)

    try:
        LakeTable.load_branch = racy
        created = register_table(spark, t.path, "racereg")
    finally:
        LakeTable.load_branch = orig
    assert any(v.endswith("__branch_alive") for v in created)
    assert not any("ghost" in v for v in created)
    assert spark.sql("SELECT count(*) FROM racereg__branch_alive").collect()[0][0] == 2


def test_fast_forward_conflict_scan_survives_expired_snapshots(
    spark, tmp_path
):
    """The already-published recovery scan walks main versions since
    the fork; expired snapshot manifests in that range must be skipped,
    not crash the (clean) CommitConflictError path."""
    t = _mk_table(spark, str(tmp_path / "t"), [("c1", 0, "a")])
    br = t.branch("stale")
    br.merge(spark, _ch(spark, [("c2", 0, "b")]))
    for i in range(8):  # main moves on past the fork
        t.merge(spark, _ch(spark, [("c1", 0, f"v{i}")]))
    t.expire_snapshots(keep_last=2)  # manifests near the fork are gone
    with pytest.raises(CommitConflictError, match="drop_branch"):
        t.fast_forward("stale")
