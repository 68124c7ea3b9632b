"""MaterializedView: bootstrap, incremental refresh from the
changelog, no-op idempotence, crash-orphan GC, and equivalence with a
full recompute across multiple merge rounds."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import types as T

from mysql_tracker_spark.functions.conversations import (
    conv_signatures,
    incremental_conv_signatures,
)
from mysql_tracker_spark.lakestore import LakeTable
from mysql_tracker_spark.views import MaterializedView

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
CH_SCHEMA = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
T0 = dt.datetime(1995, 1, 1)


def _mk_table(spark, d):
    rows = [
        ("a", 0, "user", "the quick brown fox jumps over the lazy dog", T0),
        ("a", 1, "assistant", "and the dog sleeps on while the fox runs", T0),
        ("b", 0, "user", "completely unrelated question about spark plans", T0),
        ("c", 0, "user", "short lived conversation to be deleted", T0),
    ]
    t = LakeTable.create(d, SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4)
    t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def _sig_view(t, d):
    return MaterializedView(
        t,
        os.path.join(d, "sig_view"),
        bootstrap=conv_signatures,
        refresh=incremental_conv_signatures,
    )


def _as_map(df):
    return {r.conv_id: tuple(r.sig) for r in df.collect()}


def test_bootstrap_then_incremental_equals_full(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    view = _sig_view(t, str(tmp_path))
    assert view.sync(spark) is True  # bootstrap
    assert view.synced_version() == t.current_version()
    assert _as_map(view.read(spark)) == _as_map(conv_signatures(t.read(spark)))

    # round 1: update a, delete c, insert d
    ch = spark.createDataFrame(
        [
            ("a", 1, "assistant", "and the dog wakes while the fox hides", T0, False),
            ("c", 0, None, None, None, True),
            ("d", 0, "user", "a brand new conversation enters the corpus", T0, False),
        ],
        CH_SCHEMA,
    )
    t.merge(spark, ch)
    assert view.sync(spark) is True  # incremental (last is not None)
    got = _as_map(view.read(spark))
    assert got == _as_map(conv_signatures(t.read(spark)))
    assert "c" not in got and "d" in got

    # round 2: another merge, sync again — still equals full recompute
    ch2 = spark.createDataFrame(
        [("b", 1, "assistant", "a late reply arrives in conversation b", T0, False)],
        CH_SCHEMA,
    )
    t.merge(spark, ch2)
    assert view.sync(spark) is True
    assert _as_map(view.read(spark)) == _as_map(conv_signatures(t.read(spark)))


def test_sync_is_noop_when_current(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    view = _sig_view(t, str(tmp_path))
    assert view.sync(spark) is True
    before = _as_map(view.read(spark))
    assert view.sync(spark) is False  # same table version: no work
    assert _as_map(view.read(spark)) == before


def test_orphan_data_dir_is_ignored_and_gced(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    view = _sig_view(t, str(tmp_path))
    view.sync(spark)
    # simulate a killed sync: stranded data dir with no meta commit.
    # Real debris is OLD by reap time — a YOUNG dir at a newer version
    # could be a concurrent sync's about-to-commit rename and is
    # protected, so age the orphan past the in-flight guard.
    orphan = os.path.join(view.view_dir, "data_v99999999")
    os.makedirs(orphan)
    old_ts = time.time() - 2 * view.TMP_GC_AGE_S
    os.utime(orphan, (old_ts, old_ts))
    ch = spark.createDataFrame(
        [("b", 1, "assistant", "another turn lands", T0, False)], CH_SCHEMA
    )
    t.merge(spark, ch)
    assert view.sync(spark) is True
    assert not os.path.exists(orphan)  # GC swept it
    assert _as_map(view.read(spark)) == _as_map(conv_signatures(t.read(spark)))


def test_gc_keeps_last_two_versions(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    view = _sig_view(t, str(tmp_path))
    view.sync(spark)
    for i in range(3):
        ch = spark.createDataFrame(
            [("a", 1, "assistant", f"edit number {i}", T0, False)], CH_SCHEMA
        )
        t.merge(spark, ch)
        view.sync(spark)
    metas = [f for f in os.listdir(view.meta_dir) if f.endswith(".json")]
    datas = [d for d in os.listdir(view.view_dir) if d.startswith("data_v")]
    assert len(metas) == 2 and len(datas) == 2
    assert _as_map(view.read(spark)) == _as_map(conv_signatures(t.read(spark)))


def test_view_synced_per_microbatch_in_stream(spark, tmp_path):
    """Streaming integration: a signature-index view attached to the
    CDC tail is synced after every micro-batch and matches a full
    recompute of the final table."""
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )
    from mysql_tracker_spark.streaming import CdcStreamJob

    ev = gen_change_events(GenConfig(n_events=2000, n_conversations=80, seed=33))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)
    job = CdcStreamJob(
        spark,
        in_dir,
        str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
    )
    job.job.prepare()  # idempotent; materializes the table for the view
    view = MaterializedView(
        job.job.table,
        str(tmp_path / "sig_view"),
        bootstrap=conv_signatures,
        refresh=incremental_conv_signatures,
    )
    job.views.append(view)
    stats = job.run_available()
    assert len(stats) >= 2  # several micro-batches ran
    assert view.synced_version() == job.job.table.current_version()
    assert _as_map(view.read(spark)) == _as_map(
        conv_signatures(job.job.table.read(spark))
    )
