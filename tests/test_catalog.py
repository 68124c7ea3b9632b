"""SQL catalog surface: temp-view registration over lake tables and
event logs (Iceberg SQL-UX analogue)."""

import os

from pyspark.sql import types as T

from mysql_tracker_spark.catalog import register_eventlog, register_table
from mysql_tracker_spark.lakestore import LakeTable

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
        spark.createDataFrame([("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "c")], SCHEMA)
    )
    return t


def test_register_table_sql_roundtrip(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.tag("audit")
    created = register_table(spark, t, "transcripts")
    assert "transcripts" in created and "transcripts__at_audit" in created

    assert spark.sql("SELECT count(*) AS n FROM transcripts").first().n == 3
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in spark.sql(
            "SELECT conv_id, turn_idx, text FROM transcripts ORDER BY 1, 2"
        ).collect()
    }
    assert got == {("c1", 0): "a", ("c1", 1): "b", ("c2", 0): "c"}

    # metadata tables answer through SQL
    hist = spark.sql("SELECT version, operation FROM `transcripts__history`").collect()
    assert {r.operation for r in hist} >= {"overwrite"}
    nfiles = spark.sql("SELECT count(*) AS n FROM `transcripts__files`").first().n
    assert nfiles >= 1
    tags = dict(
        (r.tag, r.version)
        for r in spark.sql("SELECT tag, version FROM `transcripts__tags`").collect()
    )
    assert tags == {"audit": t.current_version()}


def test_register_table_pins_snapshot_until_reregistered(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.tag("before")
    register_table(spark, t, "pinned")
    ch = spark.createDataFrame([("c1", 0, "UPDATED", False)], CH_SCHEMA)
    t.merge(spark, ch)

    # the registered view still reads the snapshot current at
    # registration (reader isolation), and the tag view stays pinned
    assert (
        spark.sql("SELECT text FROM pinned WHERE conv_id='c1' AND turn_idx=0")
        .first()
        .text
        == "a"
    )
    assert (
        spark.sql("SELECT text FROM `pinned__at_before` WHERE conv_id='c1' AND turn_idx=0")
        .first()
        .text
        == "a"
    )
    # re-registration advances to the new commit
    register_table(spark, t, "pinned")
    assert (
        spark.sql("SELECT text FROM pinned WHERE conv_id='c1' AND turn_idx=0")
        .first()
        .text
        == "UPDATED"
    )


def test_register_lineage_view_after_apply(spark, tmp_path):
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=1500, n_conversations=40, seed=5))
    inp = os.path.join(str(tmp_path), "in")
    tbl = os.path.join(str(tmp_path), "tbl")
    write_batches(ev, inp, n_batches=3)
    CdcApplyJob(spark, inp, tbl, n_buckets=4, files_per_batch=1).run()

    created = register_table(spark, tbl, "applied")
    assert "applied__lineage" in created
    rows = spark.sql(
        "SELECT batch_id, rows_in, file_end, pos_end FROM `applied__lineage` "
        "ORDER BY batch_id"
    ).collect()
    assert len(rows) == 3 and all(r.rows_in > 0 for r in rows)
    # the lineage's last committed offset equals the table watermark
    hi = rows[-1]
    props = spark.sql(
        "SELECT offset_file, offset_pos FROM `applied__history` "
        "ORDER BY version DESC LIMIT 1"
    ).first()
    assert (props.offset_file, props.offset_pos) == (hi.file_end, hi.pos_end)


def test_register_table_by_path_and_defaults(spark, tmp_table_dir):
    _mk(spark, tmp_table_dir)
    created = register_table(spark, tmp_table_dir)
    name = created[0]
    assert spark.sql(f"SELECT count(*) AS n FROM {name}").first().n == 3


def test_register_eventlog_sql(spark, tmp_path):
    from mysql_tracker_spark.eventlog import EventLogJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=2000, n_conversations=50, seed=11))
    inp = os.path.join(str(tmp_path), "in")
    write_batches(ev, inp, n_batches=4)
    log = EventLogJob(spark, inp, os.path.join(str(tmp_path), "log"), files_per_batch=2)
    log.run()

    created = register_eventlog(spark, log, "evlog")
    assert created == ["evlog", "evlog__segments"]
    n = spark.sql("SELECT count(*) AS n FROM evlog").first().n
    # the log collapses producer replay duplicates on (file, pos, row_idx)
    expected = len(ev.drop_duplicates(subset=["file", "pos", "row_idx"]))
    assert n == expected
    # seq is dense 0..n-1 and SQL-visible
    mx = spark.sql("SELECT max(seq) AS m, min(seq) AS lo FROM evlog").first()
    assert (mx.lo, mx.m) == (0, n - 1)
    segs = spark.sql(
        "SELECT segment, rows, seq_min, seq_max FROM `evlog__segments` ORDER BY seq_min"
    ).collect()
    assert sum(r.rows for r in segs) == n
    assert segs[0].seq_min == 0 and segs[-1].seq_max == n - 1


def test_register_table_exposes_branch_views(spark, tmp_path):
    """Live branches surface as pinned `name__branch_<x>` SQL views —
    main's view is unaffected by branch commits, the branch view shows
    the branch head, and fast-forwarding then re-registering retires
    the branch view."""
    from pyspark.sql import functions as F

    from mysql_tracker_spark.lakestore import LakeTable

    rows = [("c1", 0, "a"), ("c2", 0, "b")]
    base = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    t = LakeTable.create(
        str(tmp_path / "t"), base.schema, key_cols=["conv_id", "turn_idx"],
        bucket_by="conv_id", n_buckets=4,
    )
    t.merge(spark, base.withColumn("__delete", F.lit(False)))
    br = t.branch("wip.1")
    br.merge(
        spark,
        spark.createDataFrame(
            [("c1", 0, "branched")], base.schema
        ).withColumn("__delete", F.lit(False)),
    )

    created = register_table(spark, t, "bt")
    assert "bt__branch_wip_1" in created
    assert spark.sql(
        "SELECT text FROM bt WHERE conv_id='c1'"
    ).first().text == "a"
    assert spark.sql(
        "SELECT text FROM bt__branch_wip_1 WHERE conv_id='c1'"
    ).first().text == "branched"

    # a second branch that sanitizes to the same view name must not
    # shadow the first (same collision rule as tag views)
    t.branch("wip-1")
    created_dup = register_table(spark, t, "bt")
    dup_views = [c for c in created_dup if c.startswith("bt__branch_")]
    assert len(dup_views) == 2 and len(set(dup_views)) == 2

    t.fast_forward("wip.1")
    t.drop_branch("wip-1")
    created2 = register_table(spark, t, "bt")
    assert not any(c.startswith("bt__branch_") for c in created2)
    assert spark.sql(
        "SELECT text FROM bt WHERE conv_id='c1'"
    ).first().text == "branched"
    # stale branch views are RETIRED, not left serving pre-publish data
    import pytest
    from pyspark.errors import AnalysisException

    for v in dup_views:
        with pytest.raises(AnalysisException):
            spark.sql(f"SELECT * FROM {v}")


def test_register_table_surfaces_corrupt_branch(spark, tmp_path):
    """A branch that VANISHED mid-registration is skipped, but a live
    branch whose data is unreadable (corrupt/missing file) must raise —
    silently omitting its view would hide real corruption."""
    import pytest
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    t = _mk(spark, str(tmp_path / "t"))
    br = t.branch("wip")
    br.merge(
        spark,
        spark.createDataFrame([("c9", 0, "branch-only")], SCHEMA).withColumn(
            "__delete", F.lit(False)
        ),
    )
    main_files = {
        fe["path"] for fs in t.manifest()["buckets"].values() for fe in fs
    }
    br_files = {
        fe["path"]
        for fs in t.load_branch("wip").manifest()["buckets"].values()
        for fe in fs
    }
    only = br_files - main_files
    assert only  # the branch merge produced branch-exclusive data
    for rel in only:
        os.remove(os.path.join(t.path, rel))
    with pytest.raises(AnalysisException):
        register_table(spark, t, "ct")
