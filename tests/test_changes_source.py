"""Streaming CDC-out: the lakestore changelog as a Structured
Streaming source (Spark 4 Python Data Source API) — the streaming twin
of LakeTable.read_changes, equivalence-tested against it (the
executor-side pandas diff must never diverge from the Spark-side
changelog)."""

import random

import pytest
from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.lakestore import LakeTable
from mysql_tracker_spark.lakestore.changes_source import LakeChangesDataSource

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
CH_SCHEMA = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
OUT_COLS = ["op", "k", "i", "v", "ts"]


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(LakeChangesDataSource)


def _mk(spark, path):
    return LakeTable.create(str(path), SCHEMA, ["k", "i"], "k", n_buckets=4)


def _row(k, i, v, delete=False, h=0):
    import datetime

    return (k, i, v, datetime.datetime(2026, 1, 1, h), delete)


def _drain(spark, tbl_path, ckpt, name, from_version=None):
    reader = spark.readStream.format("lakestore_changes").option("path", tbl_path)
    if from_version is not None:
        reader = reader.option("fromVersion", from_version)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _sorted(rows):
    return sorted(map(tuple, rows))


def test_stream_equals_batch_changelog_random_sequence(spark, tmp_path):
    """Random merge sequence mixing COW and MOR commits (updates,
    deletes, NULLs): one availableNow drain from v0 must equal
    read_changes(v0, head) exactly."""
    rng = random.Random(7)
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    keys = [(f"c{i}", j) for i in range(6) for j in range(2)]
    for step in range(5):
        batch = []
        for k, i in rng.sample(keys, rng.randint(2, 6)):
            if rng.random() < 0.25:
                batch.append(_row(k, i, None, delete=True))
            else:
                batch.append(
                    _row(k, i, None if rng.random() < 0.15 else f"v{step}", h=step)
                )
        ch = spark.createDataFrame(batch, CH_SCHEMA)
        (t.merge_mor(spark, ch) if rng.random() < 0.5 else t.merge(spark, ch))
    _drain(spark, t.path, str(tmp_path / "ck"), "chg_rand", from_version=v0)
    got = _sorted(spark.sql("select * from chg_rand").collect())
    exp = _sorted(t.read_changes(spark, v0).select(*OUT_COLS).collect())
    assert got == exp and got


def test_stream_incremental_across_triggers_with_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: drain to a parquet sink, apply
    more commits, drain AGAIN from the same checkpoint — the
    accumulated output equals the concatenation of the per-interval
    batch changelogs, with no replay of the first interval (offsets =
    versions ride the stream checkpoint)."""
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("lakestore_changes")
            .option("path", t.path)
            .option("fromVersion", v0)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return _sorted(spark.read.parquet(out).select(*OUT_COLS).collect())

    t.merge(spark, spark.createDataFrame([_row("a", 1, "x"), _row("b", 1, "y")], CH_SCHEMA))
    first = drain()
    v1 = t.current_version()
    assert first == _sorted(t.read_changes(spark, v0, v1).select(*OUT_COLS).collect())

    t.merge_mor(
        spark,
        spark.createDataFrame(
            [_row("a", 1, "x2", h=1), _row("b", 1, None, delete=True)], CH_SCHEMA
        ),
    )
    accumulated = drain()
    interval2 = _sorted(t.read_changes(spark, v1).select(*OUT_COLS).collect())
    assert accumulated == _sorted(first + interval2)


def test_metadata_only_split_emits_no_changes(spark, tmp_path):
    """A split_buckets commit moves no rows — the stream must emit
    ZERO change rows across it (regression: the per-bucket diff used
    to read shared parent files WITHOUT their residual predicate, so a
    fresh child bucket surfaced the whole parent as fake inserts)."""
    t = _mk(spark, tmp_path / "t")
    base = [_row(f"c{i}", 0, "s") for i in range(20)]
    t.merge(spark, spark.createDataFrame(base, CH_SCHEMA))
    v1 = t.current_version()
    t.split_buckets(2)
    _drain(spark, t.path, str(tmp_path / "ck"), "chg_split", from_version=v1)
    assert spark.sql("select * from chg_split").count() == 0
    assert t.read_changes(spark, v1).count() == 0


def test_stream_across_split_rescale_rename_random_sequence(spark, tmp_path):
    """The hard equivalence property: a random commit sequence mixing
    COW/MOR merges with bucket-layout changes (metadata-only split,
    full rescale to a NON-multiple count) and a payload-column RENAME
    must stream exactly the batch changelog. Exercises the
    executor-side twin's residual predicates (pure-Python Murmur3),
    cross-layout old-side re-bucketing, and rename-chain alignment."""
    rng = random.Random(23)
    t = _mk(spark, tmp_path / "t")
    keys = [(f"c{i}", j) for i in range(8) for j in range(2)]
    vcol = "v"

    def random_batch(step):
        batch = []
        for k, i in rng.sample(keys, rng.randint(2, 6)):
            if rng.random() < 0.2:
                batch.append(_row(k, i, None, delete=True))
            else:
                batch.append(_row(k, i, f"v{step}", h=step % 24))
        return spark.createDataFrame(
            batch,
            T.StructType(
                [
                    T.StructField("k", T.StringType()),
                    T.StructField("i", T.IntegerType()),
                    T.StructField(vcol, T.StringType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("__delete", T.BooleanType()),
                ]
            ),
        )

    t.merge(spark, random_batch(0))
    v0 = t.current_version()
    ops = [
        "merge", "mor", "split", "merge", "rename",
        "mor", "rescale_odd", "merge", "mor",
    ]
    for step, op in enumerate(ops, start=1):
        if op == "merge":
            t.merge(spark, random_batch(step))
        elif op == "mor":
            t.merge_mor(spark, random_batch(step))
        elif op == "split":
            t.split_buckets(2)  # 4 -> 8, metadata-only, residuals
        elif op == "rescale_odd":
            t.rescale_buckets(spark, 3)  # non-multiple: fallback path
        elif op == "rename":
            t.rename_column(vcol, "val")
            vcol = "val"
    _drain(spark, t.path, str(tmp_path / "ck"), "chg_layout", from_version=v0)
    exp_df = t.read_changes(spark, v0)
    cols = exp_df.columns
    got = _sorted(spark.sql("select * from chg_layout").select(*cols).collect())
    exp = _sorted(exp_df.collect())
    assert got == exp and got


def test_partitions_are_changed_buckets(spark, tmp_path):
    """Scale shape: one input partition per CHANGED bucket — an
    untouched bucket never gets a task."""
    from mysql_tracker_spark.lakestore.changes_source import (
        LakeChangesStreamReader,
    )

    t = _mk(spark, tmp_path / "t")
    base = [_row(f"c{i}", 0, "s") for i in range(12)]
    t.merge(spark, spark.createDataFrame(base, CH_SCHEMA))
    v1 = t.current_version()
    t.merge(spark, spark.createDataFrame([_row("c3", 0, "S2")], CH_SCHEMA))
    v2 = t.current_version()
    out_schema = T.StructType(
        [T.StructField("op", T.StringType())] + list(SCHEMA.fields)
    )
    r = LakeChangesStreamReader({"path": t.path}, out_schema.json())
    parts = r.partitions({"version": v1}, {"version": v2})
    assert len(parts) == len(t.changed_buckets(v1, v2)) == 1
    assert r.partitions({"version": v2}, {"version": v2}) == []
