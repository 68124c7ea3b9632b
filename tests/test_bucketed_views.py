"""BucketedMaterializedView: per-sync write cost tracks CHANGED buckets
(untouched bucket files carry by hardlink), content always equals a full
recompute."""

import datetime as dt
import os

from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.lakestore import LakeTable
from mysql_tracker_spark.views import BucketedMaterializedView

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(1995, 1, 1)
N_VIEW_BUCKETS = 8


def _rows(n_convs=24, turns=3):
    return [
        (f"conv{c:03d}", t, "user", f"text {c} {t} words here", T0)
        for c in range(n_convs)
        for t in range(turns)
    ]


def _stats_bootstrap(df):
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"), F.max("turn_idx").alias("max_turn")
    )


def _as_map(df):
    return {(r.conv_id, r.n_turns, r.max_turn) for r in df.collect()}


def _inodes(data_dir):
    """bucket subdir -> {filename: inode}"""
    out = {}
    for d in os.listdir(data_dir):
        if d.startswith("__bucket="):
            sub = os.path.join(data_dir, d)
            out[d] = {
                f: os.stat(os.path.join(sub, f)).st_ino
                for f in os.listdir(sub)
                if f.endswith(".parquet")
            }
    return out


def _mk(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    view = BucketedMaterializedView(
        t, str(tmp_path / "view"), _stats_bootstrap, key_col="conv_id",
        n_buckets=N_VIEW_BUCKETS,
    )
    return t, view


def test_bucketed_sync_equals_full_and_carries_by_hardlink(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    assert view.sync(spark) is True
    assert view.sync(spark) is False  # unchanged version no-op
    assert _as_map(view.read(spark)) == _as_map(_stats_bootstrap(t.read(spark)))
    v1_data = os.path.join(view.view_dir, view._meta(view.synced_version())["data"])
    ino1 = _inodes(v1_data)

    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [("conv001", 3, "assistant", "a new turn", T0, False)], ch_schema
        ),
    )
    assert view.sync(spark) is True
    assert _as_map(view.read(spark)) == _as_map(_stats_bootstrap(t.read(spark)))
    v2_data = os.path.join(view.view_dir, view._meta(view.synced_version())["data"])
    ino2 = _inodes(v2_data)

    b = (
        spark.range(1)
        .select(F.pmod(F.hash(F.lit("conv001")), F.lit(N_VIEW_BUCKETS)))
        .collect()[0][0]
    )
    changed_bucket = f"__bucket={b}"
    assert changed_bucket in ino2
    carried = 0
    for d, files in ino2.items():
        if d == changed_bucket:
            # the touched bucket was REWRITTEN: all-new inodes
            assert not (set(files.values()) & set(ino1.get(d, {}).values()))
        elif d in ino1:
            # untouched buckets carry the SAME inodes (hardlinks, no write)
            assert files == ino1[d]
            carried += 1
    assert carried >= 1


def test_bucketed_sync_drops_deleted_keys(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    view.sync(spark)
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [("conv002", i, None, None, None, True) for i in range(3)], ch_schema
        ),
    )
    view.sync(spark)
    out = _as_map(view.read(spark))
    assert not any(c == "conv002" for c, _, _ in out)
    assert out == _as_map(_stats_bootstrap(t.read(spark)))


def test_bucketed_factories_equal_classic_views(spark, tmp_path):
    """ann_index_view / conv_band_index_view in bucketed mode produce
    exactly the classic views' content across a merge."""
    from mysql_tracker_spark.functions.conversations import (
        conv_band_index,
        conv_band_index_view,
    )
    from mysql_tracker_spark.functions.similarity import (
        ann_index_view,
        hashed_embedding,
        ivf_assign,
        train_ivf_centroids,
    )

    def emb(df):
        return df.select(
            "conv_id", "turn_idx", hashed_embedding(F.col("text"), dim=8).alias("embedding")
        )

    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(emb(t.read(spark)), n_cells=4, seed=7)
    ann = ann_index_view(t, str(tmp_path / "ann"), cents, emb, n_view_buckets=8)
    band = conv_band_index_view(t, str(tmp_path / "band"), n_view_buckets=8)
    ann.sync(spark), band.sync(spark)

    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [
                ("conv003", 0, "user", "edited text entirely", T0, False),
                ("conv004", 1, None, None, None, True),
                ("conv900", 0, "user", "fresh conversation", T0, False),
            ],
            ch_schema,
        ),
    )
    ann.sync(spark), band.sync(spark)

    got_ann = {(r.conv_id, r.turn_idx, r.cell) for r in ann.read(spark).collect()}
    full_ann = {
        (r.conv_id, r.turn_idx, r.cell)
        for r in ivf_assign(emb(t.read(spark)), cents, id_cols=("conv_id", "turn_idx")).collect()
    }
    assert got_ann == full_ann
    got_band = {(r.id, r.band, r.bh) for r in band.read(spark).collect()}
    full_band = {(r.id, r.band, r.bh) for r in conv_band_index(t.read(spark)).collect()}
    assert got_band == full_band


def test_sync_lineage_records_modes_and_buckets(spark, tmp_path):
    import json

    t, view = _mk(spark, tmp_path)
    view.sync(spark)
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [("conv001", 3, "assistant", "new turn", T0, False)], ch_schema
        ),
    )
    view.sync(spark)
    view.sync(spark)  # no-op: must NOT add a row
    with open(os.path.join(view.view_dir, "lineage.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 2
    assert recs[0]["mode"] == "bootstrap" and recs[0]["from_version"] is None
    assert recs[1]["mode"] == "refresh"
    assert recs[1]["carried_buckets"] == N_VIEW_BUCKETS - len(recs[1]["changed_buckets"])
    assert len(recs[1]["changed_buckets"]) == 1
    assert all("wall_ms" in r and "ts_ms" in r for r in recs)
