"""Write-audit-publish staged snapshots (Iceberg wap.id analogue):
staging is invisible, read_staged shows the would-be state, publish is
atomic fast-forward (COW) or composable replay (MOR delta), abort
reaps only staged-only files, and GC/expiry never eat a pending stage.
"""

import os

import pytest
from pyspark.sql import types as T

from mysql_tracker_spark.lakestore import LakeTable, WapConflictError

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
CH_SCHEMA = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])


def _mk(spark, path):
    t = LakeTable.create(path, SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4)
    t.overwrite(
        spark.createDataFrame(
            [("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "c")], SCHEMA
        )
    )
    return t


def _state(spark, t):
    return {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}


CH = [("c1", 1, "B", False), ("c2", 0, None, True), ("c3", 9, "n", False)]
AFTER = {("c1", 0): "a", ("c1", 1): "B", ("c3", 9): "n"}
BEFORE = {("c1", 0): "a", ("c1", 1): "b", ("c2", 0): "c"}


def test_cow_stage_audit_publish(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    v0 = t.current_version()
    ver, s = t.merge(spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="audit-1")
    assert ver is None and s["wap_id"] == "audit-1"
    # invisible until published
    assert t.current_version() == v0
    assert _state(spark, t) == BEFORE
    assert t.staged() == ["audit-1"]
    # the audit surface IS the post-merge table state
    staged = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read_staged(spark, "audit-1").collect()
    }
    assert staged == AFTER
    v, summary = t.publish_staged("audit-1", properties={"audited": "yes"})
    assert v == v0 + 1
    assert _state(spark, t) == AFTER
    assert t.properties()["audited"] == "yes"
    assert t.manifest()["summary"]["wap_id"] == "audit-1"
    assert t.staged() == []


def test_cow_abort_reaps_only_staged_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    live_before = set(t.live_files())
    t.merge(spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="bad-batch")
    removed = t.abort_staged("bad-batch")
    assert removed > 0
    assert t.staged() == []
    # every committed file still present, table state untouched
    for rel in live_before:
        assert os.path.exists(os.path.join(t.path, rel))
    assert _state(spark, t) == BEFORE
    # no dangling staged-only parquet anywhere
    assert t.gc_orphans(min_age_s=0) == 0


def test_cow_publish_conflict_on_concurrent_commit(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge(spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="stale")
    # a concurrent commit lands after staging -> fast-forward impossible
    t.merge(spark, spark.createDataFrame([("c9", 0, "x", False)], CH_SCHEMA))
    with pytest.raises(WapConflictError):
        t.publish_staged("stale")
    t.abort_staged("stale")
    assert ("c9", 0) in _state(spark, t)


def test_delta_stage_composes_with_concurrent_commit(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    ver, s = t.merge_mor(
        spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="mor-1"
    )
    assert ver is None and s["wap_id"] == "mor-1"
    assert _state(spark, t) == BEFORE
    # concurrent COW commit after staging: delta publish still works
    t.merge(spark, spark.createDataFrame([("c9", 0, "x", False)], CH_SCHEMA))
    # the audit view resolves against the CURRENT head (what publish
    # would actually produce), so it includes the concurrent row
    staged = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read_staged(spark, "mor-1").collect()
    }
    assert staged == {**AFTER, ("c9", 0): "x"}
    v, summary = t.publish_staged("mor-1")
    assert summary["wap_id"] == "mor-1"
    assert _state(spark, t) == {**AFTER, ("c9", 0): "x"}


def test_staged_refs_survive_gc_and_expiry(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge(spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="pending")
    # aggressive GC with zero age guard: staged files are NOT orphans
    assert t.gc_orphans(min_age_s=0) == 0
    # churn the table, then expire history down to 1 snapshot: files
    # the pending stage carries forward must survive
    for i in range(3):
        t.merge(spark, spark.createDataFrame([("c1", 0, f"v{i}", False)], CH_SCHEMA))
    t.expire_snapshots(keep_last=1)
    staged = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read_staged(spark, "pending").collect()
    }
    assert staged == AFTER  # still fully readable
    # ...but it can no longer fast-forward (head moved): honest conflict
    with pytest.raises(WapConflictError):
        t.publish_staged("pending")
    t.abort_staged("pending")


def test_restage_same_id_is_an_error(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.merge(spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="dup")
    with pytest.raises(FileExistsError):
        t.merge(spark, spark.createDataFrame(CH, CH_SCHEMA), stage_as="dup")
    t.abort_staged("dup")


def test_runner_table_audit_blocks_and_replays(spark, tmp_path):
    """CdcApplyJob(table_expectations=...): a blocking violation on the
    STAGED post-merge state aborts the stage — no snapshot, no staged
    leftovers, watermark untouched — and the fixed job replays to the
    oracle state with the wap id stamped in the commit summary."""
    import pandas as pd
    import pytest as _pt
    from pyspark.sql import functions as F

    from mysql_tracker_spark.quality import predicate, unique
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
        write_batches,
    )
    from tests.conftest import normalize

    ev = gen_change_events(GenConfig(n_events=1500, n_conversations=60, seed=21))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=2)
    tbl = str(tmp_path / "tbl")

    bad = CdcApplyJob(
        spark, in_dir, tbl, n_buckets=4,
        table_expectations=[
            predicate("never", F.length("text") < 0, blocking=True)
        ],
    )
    with _pt.raises(ValueError, match="post-merge table audit failed"):
        bad.run()
    assert bad.table.read(spark).count() == 0
    assert bad.table.staged() == []  # aborted, not leaked
    assert bad.watermark()[0] is None
    assert bad.table.gc_orphans(min_age_s=0) == 0  # abort reaped files

    good = CdcApplyJob(
        spark, in_dir, tbl, n_buckets=4,
        table_expectations=[
            unique("pk_unique", ["conv_id", "turn_idx"], blocking=True)
        ],
    )
    stats = [s for s in good.run() if not s.skipped]
    assert all(s.table_audit == {"pk_unique": 0} for s in stats)
    assert good.table.manifest()["summary"]["wap_id"].startswith("batch-")
    assert good.table.staged() == []
    got = normalize(good.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_runner_table_audit_mor_path(spark, tmp_path):
    """The WAP gate under the merge-on-read sink: staged delta commits
    audit and publish identically, and the final state still equals
    the sequential oracle (sink mode never changes table state)."""
    import pandas as pd

    from mysql_tracker_spark.quality import unique
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
        write_batches,
    )
    from tests.conftest import normalize

    ev = gen_change_events(GenConfig(n_events=1500, n_conversations=60, seed=22))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=2)
    job = CdcApplyJob(
        spark, in_dir, str(tmp_path / "tbl"), n_buckets=4,
        write_mode="mor",
        table_expectations=[
            unique("pk_unique", ["conv_id", "turn_idx"], blocking=True)
        ],
    )
    stats = [s for s in job.run() if not s.skipped]
    assert all(s.table_audit == {"pk_unique": 0} for s in stats)
    assert job.table.manifest()["summary"]["wap_id"].startswith("batch-")
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
    pd.testing.assert_frame_equal(got[cols], exp[cols])
