"""LakeTable semantics: atomic commits, COW merge, evolution, travel."""

import pytest
from pyspark.sql import types as T

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
    t.overwrite(spark.createDataFrame([("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "c")], SCHEMA))
    return t


def test_merge_upsert_delete(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    ch = spark.createDataFrame(
        [("c1", 1, "B", False), ("c2", 0, None, True), ("c3", 9, "n", False)], CH_SCHEMA
    )
    v, s = t.merge(spark, ch)
    rows = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}
    assert rows == {("c1", 0): "a", ("c1", 1): "B", ("c3", 9): "n"}
    assert s["upserts"] == 2


def test_merge_only_rewrites_affected_buckets(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    before = {b: [f["path"] for f in fs] for b, fs in t.manifest()["buckets"].items()}
    ch = spark.createDataFrame([("c1", 0, "z", False)], CH_SCHEMA)
    t.merge(spark, ch)
    after = {b: [f["path"] for f in fs] for b, fs in t.manifest()["buckets"].items()}
    changed = [b for b in after if after[b] != before.get(b)]
    unchanged = [b for b in after if after[b] == before.get(b)]
    assert len(changed) == 1  # only c1's bucket rewritten (COW)
    assert unchanged  # others carried forward by reference


def test_read_changes_changelog_between_snapshots(spark, tmp_table_dir):
    """Incremental changelog scan (Iceberg changelog analogue / the
    reference's S6 verification consumer made real): row-level
    insert/update/delete between two snapshots, reading only CHANGED
    buckets; carried-forward identical rows in rewritten buckets are
    not emitted."""
    t = _mk(spark, tmp_table_dir)
    v1 = t.current_version()
    ch = spark.createDataFrame(
        [("c1", 1, "B", False), ("c2", 0, None, True), ("c3", 9, "n", False)], CH_SCHEMA
    )
    t.merge(spark, ch)
    v2 = t.current_version()
    got = {
        (r.op, r.conv_id, r.turn_idx, r.text)
        for r in t.read_changes(spark, v1, v2).collect()
    }
    assert got == {
        ("update", "c1", 1, "B"),  # post-image
        ("delete", "c2", 0, "c"),  # pre-image
        ("insert", "c3", 9, "n"),
    }
    # ("c1", 0, "a") shares c1's rewritten bucket but did not change: not emitted
    # changed-bucket bounding: only the touched buckets are scanned
    cb = t.changed_buckets(v1, v2)
    assert 0 < len(cb) < t.manifest()["n_buckets"]
    # no-op range: empty changelog
    assert t.read_changes(spark, v2, v2).count() == 0
    # multi-step range composes: v1 -> HEAD after another merge
    t.merge(spark, spark.createDataFrame([("c3", 9, "N2", False)], CH_SCHEMA))
    got2 = {
        (r.op, r.conv_id, r.turn_idx, r.text)
        for r in t.read_changes(spark, v1).collect()
    }
    assert ("insert", "c3", 9, "N2") in got2 and ("insert", "c3", 9, "n") not in got2


def test_read_changes_equals_snapshot_diff_random_sequence(spark, tmp_table_dir):
    """Changelog invariant over a seeded random merge sequence: for
    every version pair (i, j), read_changes(i, j) must equal the plain
    diff of read(i) vs read(j) computed independently in pandas —
    including composition across multiple merges (intermediate churn
    collapses to net changes)."""
    import random

    rng = random.Random(41)
    t = _mk(spark, tmp_table_dir)
    versions = [t.current_version()]
    keys = [(f"c{i}", j) for i in range(1, 7) for j in range(3)]
    for step in range(4):
        ch = []
        for k in rng.sample(keys, rng.randint(2, 6)):
            if rng.random() < 0.25:
                ch.append((*k, None, True))  # delete
            else:
                ch.append((*k, f"v{step}-{rng.randint(0, 9)}", False))
        t.merge(spark, spark.createDataFrame(ch, CH_SCHEMA))
        versions.append(t.current_version())

    def state(v):
        return {
            (r.conv_id, r.turn_idx): r.text for r in t.read(spark, version=v).collect()
        }

    for a in range(len(versions)):
        for b in range(a, len(versions)):
            va, vb = versions[a], versions[b]
            sa, sb = state(va), state(vb)
            expected = set()
            for k in set(sa) | set(sb):
                if k not in sa:
                    expected.add(("insert", *k, sb[k]))
                elif k not in sb:
                    expected.add(("delete", *k, sa[k]))
                elif sa[k] != sb[k]:
                    expected.add(("update", *k, sb[k]))
            got = {
                (r.op, r.conv_id, r.turn_idx, r.text)
                for r in t.read_changes(spark, va, vb).collect()
            }
            assert got == expected, (va, vb)


def test_read_changes_across_schema_evolution(spark, tmp_table_dir):
    """The changelog aligns both sides to the TO snapshot's schema:
    rows written before an ADD COLUMN diff cleanly against rows after
    it (old side null-padded)."""
    t = _mk(spark, tmp_table_dir)
    v1 = t.current_version()
    new_schema = T.StructType(SCHEMA.fields + [T.StructField("score", T.LongType())])
    t.update_schema(new_schema)
    ch_schema = T.StructType(new_schema.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(spark, spark.createDataFrame([("c1", 1, "b", 7, False)], ch_schema))
    got = {
        (r.op, r.conv_id, r.turn_idx, r.text, r.score)
        for r in t.read_changes(spark, v1).collect()
    }
    # text unchanged but score went null -> 7: emitted as update
    assert got == {("update", "c1", 1, "b", 7)}


def test_commit_collision(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    m = t.manifest()
    m["version"] = t.current_version()
    with pytest.raises(FileExistsError):
        t._commit(m)


def test_schema_evolution_widen_and_time_travel(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    v_before = t.current_version()
    t.update_schema(
        T.StructType(SCHEMA.fields + [T.StructField("score", T.IntegerType())]), "add"
    )
    ch = spark.createDataFrame(
        [("c9", 0, "s", 7, False)],
        T.StructType(t.schema().fields + [T.StructField("__delete", T.BooleanType())]),
    )
    t.merge(spark, ch)
    t.update_schema(
        T.StructType(SCHEMA.fields + [T.StructField("score", T.LongType())]), "widen"
    )
    ch2 = spark.createDataFrame(
        [("c9", 1, "w", 3_000_000_000, False)],
        T.StructType(t.schema().fields + [T.StructField("__delete", T.BooleanType())]),
    )
    t.merge(spark, ch2)
    df = t.read(spark)
    assert dict(df.dtypes)["score"] == "bigint"
    got = {(r.conv_id, r.turn_idx): r.score for r in df.collect()}
    assert got[("c9", 0)] == 7 and got[("c9", 1)] == 3_000_000_000
    assert got[("c1", 0)] is None  # old rows null-filled, never rewritten
    # time travel sees the pre-evolution world
    old = t.read(spark, version=v_before)
    assert "score" not in old.columns


def test_properties_fencing_roundtrip(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    ch = spark.createDataFrame([("c1", 0, "z", False)], CH_SCHEMA)
    t.merge(spark, ch, properties={"offset_file": "bin.000002", "offset_pos": "123"})
    p = t.properties()
    assert (p["offset_file"], p["offset_pos"]) == ("bin.000002", "123")


def test_gc_orphans(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    # stage a fake orphan
    import os

    orphan = os.path.join(t.data_dir, "stage-dead", "__bucket=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("x")
    # young debris survives the in-flight-writer guard; aged debris
    # (min_age_s=0 simulates age) is reaped
    assert t.gc_orphans() == 0
    assert t.gc_orphans(min_age_s=0) == 1
    assert t.read(spark).count() == 3  # table unharmed


def test_expire_snapshots_bounds_history_and_gc(spark, tmp_table_dir):
    """Snapshot expiry keeps the newest K versions, deletes orphaned
    data files, and the current snapshot still reads correctly."""
    import os
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]
    )
    t = LakeTable.create(tmp_table_dir, schema, key_cols=["k"], bucket_by="k", n_buckets=4)
    for i in range(6):
        ch = spark.createDataFrame([(f"k{j}", f"v{i}") for j in range(8)], schema).withColumn(
            "__delete", F.lit(False)
        )
        t.merge(spark, ch)
    n_before = len(os.listdir(t.snap_dir))
    dropped = t.expire_snapshots(keep_last=2)
    assert dropped == n_before - 2
    assert len(os.listdir(t.snap_dir)) == 2
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {f"k{j}": "v5" for j in range(8)}
    # all remaining data files are referenced by SOME kept snapshot
    import json

    live = set()
    for fn in os.listdir(t.snap_dir):
        with open(os.path.join(t.snap_dir, fn)) as f:
            man = json.load(f)
        for files in man["buckets"].values():
            live.update(fe["path"] for fe in files)
    on_disk = set()
    for root, _d, files in os.walk(t.data_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(root, fn), t.path))
    assert on_disk <= live


def test_bucket_hash_stamped_and_verified(spark, tmp_path):
    """The bucket-placement hash is stamped at create() and verified at
    load(): a table placed by a different/unknown hash must be refused
    (merging into it would silently duplicate keys)."""
    import json
    import os

    import pytest
    from pyspark.sql import types as T

    from mysql_tracker_spark.lakestore import LakeTable

    p = str(tmp_path / "t")
    schema = T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.LongType())])
    t = LakeTable.create(p, schema, key_cols=["k"], bucket_by="k", n_buckets=4)
    assert t.manifest()["bucket_hash"] == "murmur3_42"
    assert LakeTable.load(p).manifest()["bucket_hash"] == "murmur3_42"
    # simulate a table written by an older engine (different hash)
    m = t.manifest()
    m["version"] += 1
    m["parent"] = m["version"] - 1
    m["bucket_hash"] = "xxhash64_42"
    with open(os.path.join(p, "snapshots", f"v{m['version']:08d}.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="bucketed with"):
        LakeTable.load(p)


def test_optimistic_commit_conflict_detected(spark, tmp_path):
    """Two writers racing to the same next version: exclusive-create
    makes exactly one commit win; the loser gets an explicit error and
    must re-read + retry (optimistic concurrency, as documented)."""
    import pytest
    from pyspark.sql import types as T

    from mysql_tracker_spark.lakestore import LakeTable

    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.StringType())]),
        key_cols=["k"], bucket_by="k", n_buckets=2,
    )
    a, b = LakeTable.load(t.path), LakeTable.load(t.path)
    a.set_properties({"writer": "a"})  # wins version 2
    with pytest.raises(FileExistsError):
        m = b.manifest(version=1)
        m["version"] = 2
        m["parent"] = 1
        b._commit(m)
    # loser retries against the new current version and succeeds
    b.set_properties({"writer": "b"})
    assert b.properties()["writer"] == "b"


def test_lakestore_read_pushes_filters_to_scan(spark, tmp_path):
    """Predicate pushdown survives the schema-align projection in
    read(): a key filter reaches the parquet scan as a PushedFilter
    (100 TB reads depend on this, e.g. point lookups by conv_id)."""
    from pyspark.sql import functions as F, types as T

    from mysql_tracker_spark.lakestore import LakeTable
    from mysql_tracker_spark.plans.checks import pushed_filters

    schema = T.StructType(
        [T.StructField("conv_id", T.StringType()), T.StructField("v", T.LongType())]
    )
    t = LakeTable.create(
        str(tmp_path / "t"), schema, key_cols=["conv_id"],
        bucket_by="conv_id", n_buckets=2,
    )
    df = spark.createDataFrame([(f"c{i}", i) for i in range(50)], schema)
    t.overwrite(df)
    q = t.read(spark).filter(F.col("conv_id") == "c7")
    pf = pushed_filters(q)
    assert pf and any("conv_id" in p for p in pf), pf
    assert q.count() == 1


def test_rescale_buckets_preserves_content_and_placement(spark, tmp_table_dir):
    """Bucket-count evolution: content identical, placement re-hashed,
    history time-travelable, changelog across the boundary empty, and
    subsequent merges pick up the new count."""
    from pyspark.sql import functions as F

    t = _mk(spark, tmp_table_dir)
    v_before = t.current_version()
    before = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}

    v = t.rescale_buckets(spark, 16)
    assert t.manifest()["n_buckets"] == 16
    assert t.manifest()["summary"]["operation"] == "rescale-buckets"
    after = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}
    assert after == before
    # placement invariant: every file entry lives under the bucket id
    # pmod(hash(conv_id), 16) of the rows it holds
    for b, files in t.manifest()["buckets"].items():
        for fe in files:
            import os as _os
            df = spark.read.parquet(_os.path.join(t.path, fe["path"]))
            bad = df.filter(F.pmod(F.hash("conv_id"), F.lit(16)) != int(b)).count()
            assert bad == 0
    # the rescale commit changed no ROW: changelog across it is empty
    assert t.read_changes(spark, v_before, v).count() == 0
    # time travel to the pre-rescale snapshot still reads the old layout
    old = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark, v_before).collect()}
    assert old == before

    # merges after the rescale use the new count and stay correct
    ch = spark.createDataFrame([("c9", 0, "new", False), ("c1", 0, None, True)], CH_SCHEMA)
    t.merge(spark, ch)
    rows = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}
    expect = dict(before)
    del expect[("c1", 0)]
    expect[("c9", 0)] = "new"
    assert rows == expect

    # shrink path works too (4x down) and no-op is a no-op
    v2 = t.current_version()
    assert t.rescale_buckets(spark, t.manifest()["n_buckets"]) == v2
    t.rescale_buckets(spark, 2)
    assert t.manifest()["n_buckets"] == 2
    rows2 = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}
    assert rows2 == expect


def test_read_for_keys_prunes_to_owning_buckets(spark, tmp_table_dir):
    """Point read: only the key's buckets are opened (inputFiles is the
    proof), result identical to a full-scan filter."""
    t = LakeTable.create(
        tmp_table_dir, SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=8
    )
    from pyspark.sql import functions as F

    rows = [(f"c{i}", j, f"t{i}.{j}") for i in range(40) for j in range(3)]
    t.overwrite(spark.createDataFrame(rows, SCHEMA))

    keys = ["c7", "c23"]
    got = t.read_for_keys(spark, keys)
    want = t.read(spark).filter(F.col("conv_id").isin(keys))
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) == 6

    # pruning: the point read scanned only the owning buckets' files
    m = t.manifest()
    owning = set(t.buckets_for_keys(spark, keys))
    assert owning and len(owning) < m["n_buckets"]
    allowed = {
        fe["path"] for b in owning for fe in m["buckets"].get(str(b), [])
    }
    opened = {p.split("/data/")[-1] for p in got.inputFiles()}
    opened = {f"data/{p}" for p in opened}
    assert opened <= allowed
    assert len(set(want.inputFiles())) > len(set(got.inputFiles()))

    # a key that hashes to an empty/absent bucket returns empty, not error
    assert t.read_for_keys(spark, ["never-written"]).count() == 0


def test_tags_pin_survive_expiry_and_read(spark, tmp_table_dir):
    """Iceberg-tag analogue: a tag pins a version by name, protects it
    from snapshot expiry, and reads it back by name; retagging a taken
    name is an error; deleting the tag releases the snapshot."""
    t = _mk(spark, tmp_table_dir)
    v1 = t.current_version()
    t.tag("baseline")  # defaults to current
    for i in range(3):
        t.merge(spark, spark.createDataFrame([("c1", 0, f"v{i}", False)], CH_SCHEMA))
    assert t.tags() == {"baseline": v1}

    t.expire_snapshots(keep_last=1)
    # tagged snapshot survived; everything else old is gone
    left = sorted(
        int(f[1:-5]) for f in __import__("os").listdir(t.snap_dir) if f.endswith(".json")
    )
    assert v1 in left and len(left) == 2

    rows = {(r.conv_id, r.turn_idx): r.text for r in t.read_tag(spark, "baseline").collect()}
    assert rows[("c1", 0)] == "a"  # pre-merge content, by name

    with pytest.raises(FileExistsError):
        t.tag("baseline", v1)
    with pytest.raises(ValueError):
        t.tag("bad name!")

    t.delete_tag("baseline")
    t.expire_snapshots(keep_last=1)
    left = [int(f[1:-5]) for f in __import__("os").listdir(t.snap_dir) if f.endswith(".json")]
    assert v1 not in left  # released


def test_history_and_files_metadata_tables(spark, tmp_table_dir):
    """Iceberg metadata-table analogues: history() rows mirror the
    snapshot chain (operations, watermarks), files() inventories live
    files with bucket/delta/seq — both driver-side only."""
    t = _mk(spark, tmp_table_dir)
    t.merge(
        spark,
        spark.createDataFrame([("c1", 0, "u", False)], CH_SCHEMA),
        properties={"offset_file": "bin.000002", "offset_pos": "77", "batch_seq": "4"},
    )
    t.merge_mor(spark, spark.createDataFrame([("c2", 0, "m", False)], CH_SCHEMA))
    h = {r["version"]: r for r in t.history(spark).collect()}
    assert h[1]["operation"] == "create" and h[1]["parent"] is None
    assert h[max(h)]["operation"] == "merge-mor"
    merge_row = h[max(h) - 1]
    assert (merge_row["operation"], merge_row["offset_file"], merge_row["offset_pos"]) == (
        "merge", "bin.000002", 77,
    )
    assert [h[v]["parent"] for v in sorted(h)][1:] == sorted(h)[:-1]
    f = t.files(spark).collect()
    assert all(r["size_bytes"] > 0 for r in f)
    deltas = [r for r in f if r["is_delta"]]
    assert deltas and all(r["seq"] == max(h) for r in deltas)
    assert {r["path"] for r in f} == set(t.live_files())


def test_file_record_counts_and_bucket_rows(spark, tmp_table_dir):
    """Per-file footer record counts stamped at write (Iceberg file
    stats) and the per-bucket commit footprint in merge summaries —
    the per-partition row counts the lineage carries."""
    t = _mk(spark, tmp_table_dir)

    # every live file's stamped record_count equals its actual rows
    for r in t.files(spark).collect():
        actual = spark.read.parquet(
            str(tmp_table_dir) + "/" + r["path"]
        ).count()
        assert r["record_count"] == actual, r["path"]

    # COW merge: bucket_rows = live rows written per rewritten bucket
    v, s = t.merge(
        spark, spark.createDataFrame([("c1", 1, "B", False), ("c9", 0, "n", False)], CH_SCHEMA)
    )
    assert set(s["bucket_rows"]) == {
        str(b) for b in t.buckets_for_keys(spark, ["c1", "c9"])
    }
    for b, n in s["bucket_rows"].items():
        live = sum(
            e["rows"] for e in t.manifest()["buckets"][b]
        )
        assert n == live

    # MOR merge: bucket_rows = delta rows (winners + tombstones)
    v, s = t.merge_mor(
        spark,
        spark.createDataFrame([("c1", 0, None, True), ("c2", 0, "m2", False)], CH_SCHEMA),
    )
    assert sum(s["bucket_rows"].values()) == 2
    f = t.files(spark).collect()
    assert all(r["record_count"] is not None and r["record_count"] >= 0 for r in f)


def test_row_count_from_manifest_stats(spark, tmp_table_dir):
    """count(*) from manifest stats: exact with zero Spark jobs on a
    delta-free snapshot; falls back to the resolved read under MOR
    deltas (tombstones must subtract)."""
    t = _mk(spark, tmp_table_dir)
    assert t.row_count() == 3  # no spark needed
    t.merge(spark, spark.createDataFrame([("c7", 0, "x", False)], CH_SCHEMA))
    assert t.row_count() == 4

    # MOR delta with one tombstone: stats alone can't answer
    t.merge_mor(
        spark,
        spark.createDataFrame([("c1", 0, None, True), ("c8", 0, "y", False)], CH_SCHEMA),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.row_count()
    assert t.row_count(spark) == 4  # +c8, -c1/0
    # compaction folds deltas away -> stats path is exact again
    t.compact(spark)
    assert t.row_count() == 4


def test_file_stats_stamped_and_point_read_skips_deltas(spark, tmp_table_dir):
    """Manifest entries carry column min/max bounds from the parquet
    footer (Iceberg lower/upper-bounds analogue); point reads use the
    KEY bounds to skip merge-on-read delta files of unrelated batches
    — LWW-sound because a skipped file provably has no rows of the
    requested keys."""
    from mysql_tracker_spark.lakestore.table import _stats_keep_keys

    t = _mk(spark, tmp_table_dir)
    entries = [fe for fs in t.manifest()["buckets"].values() for fe in fs]
    assert all("conv_id" in fe.get("stats", {}) for fe in entries)
    assert all("turn_idx" in fe.get("stats", {}) for fe in entries)

    # two MOR batches with disjoint key ranges -> two delta files
    t.merge_mor(spark, spark.createDataFrame([("a1", 0, "x", False)], CH_SCHEMA))
    t.merge_mor(spark, spark.createDataFrame([("z1", 0, "y", False)], CH_SCHEMA))
    deltas = [
        fe for fs in t.manifest()["buckets"].values() for fe in fs if fe.get("delta")
    ]
    assert len(deltas) == 2
    kept = [fe for fe in deltas if _stats_keep_keys(fe, "conv_id", ["z1"])]
    assert [fe["stats"]["conv_id"] for fe in kept] == [["z1", "z1"]]
    # the pruned point read stays exact
    rows = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read_for_keys(spark, ["z1", "c1"]).collect()
    }
    assert rows == {("z1", 0): "y", ("c1", 0): "a", ("c1", 1): "b"}
    # files() surfaces the bounds
    f = t.files(spark).collect()
    assert any(r.lower_bounds and "conv_id" in r.lower_bounds for r in f)


def test_read_where_ts_range_skips_files(spark, tmp_table_dir):
    """Payload-column (ts) range read: on a delta-free snapshot the
    manifest bounds skip files outside the window; the residual
    predicate keeps semantics exact. Under MOR deltas the payload-
    column fast path disengages (updates can move values) and the read
    falls back to full LWW resolution + filter."""
    import datetime as dt

    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    chs = T.StructType(sch.fields + [T.StructField("__delete", T.BooleanType())])
    jan = dt.datetime(2026, 1, 1)
    mar = dt.datetime(2026, 3, 1)
    t = LakeTable.create(
        tmp_table_dir, sch, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(
        spark.createDataFrame(
            [(f"k{i}", 0, "old", jan) for i in range(8)], sch
        )
    )
    t.merge(spark, spark.createDataFrame([("m1", 0, "new", mar, False)], chs))
    all_live = t.live_files(t.current_version())
    kept = t.live_files_where("ts", lo=dt.datetime(2026, 2, 1))
    # only the bucket file rewritten by the March merge can match
    assert len(kept) == 1 and len(all_live) > 1
    got = t.read_where(spark, "ts", lo=dt.datetime(2026, 2, 1)).collect()
    assert [(r.conv_id, r.text) for r in got] == [("m1", "new")]
    # exactness: no-bound read_where == read
    assert t.read_where(spark, "ts").count() == t.read(spark).count()

    # MOR delta updates k0 into the window: fallback must see it
    t.merge_mor(
        spark,
        spark.createDataFrame([("k0", 0, "moved", mar, False)], chs),
    )
    got2 = {
        r.conv_id: r.text
        for r in t.read_where(spark, "ts", lo=dt.datetime(2026, 2, 1)).collect()
    }
    assert got2 == {"m1": "new", "k0": "moved"}


def test_apply_lineage_carries_bucket_rows(spark, tmp_path):
    """The apply job's lineage rows carry the per-partition commit
    footprint on BOTH sink modes (north_star per-partition lineage)."""
    import json
    import os

    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=1200, n_conversations=30, seed=3))
    inp = os.path.join(str(tmp_path), "in")
    write_batches(ev, inp, n_batches=2)
    for mode in ("cow", "mor"):
        tbl = os.path.join(str(tmp_path), f"tbl_{mode}")
        stats = CdcApplyJob(
            spark, inp, tbl, n_buckets=4, files_per_batch=1, write_mode=mode
        ).run()
        assert all(
            s.bucket_rows and all(v > 0 for v in s.bucket_rows.values())
            for s in stats
            if not s.skipped
        ), mode
        with open(os.path.join(tbl, "lineage.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert all(r["bucket_rows"] for r in recs), mode
        if mode == "mor":
            # delta-rows semantics: per-batch sum equals the LWW winner
            # count the runner derived from the same footers
            for s in stats:
                if not s.skipped and s.rows_winners is not None:
                    assert sum(s.bucket_rows.values()) == s.rows_winners


def test_validate_fsck_detects_corruption(spark, tmp_table_dir):
    """Table fsck: healthy tables pass shallow+deep; a deleted data
    file and a tampered (misplaced) bucket are each detected."""
    import json as _json
    import os as _os

    t = _mk(spark, tmp_table_dir)
    t.merge_mor(spark, spark.createDataFrame([("c9", 5, "m", False)], CH_SCHEMA))
    assert t.validate() == {"ok": True, "issues": []}
    assert t.validate(spark, deep=True)["ok"]

    # corruption 1: a referenced file vanishes
    victim = _os.path.join(t.path, t.live_files()[0])
    _os.rename(victim, victim + ".gone")
    r = t.validate()
    assert not r["ok"] and any("missing file" in i for i in r["issues"])
    _os.rename(victim + ".gone", victim)

    # corruption 2: a live file silently replaced by one with a
    # DIFFERENT row count -> the manifest record-count stat catches it
    # shallow (pick a pair whose stamped counts differ: c1's bucket
    # file holds 2 rows, the others 1)
    import shutil as _shutil

    entries = [fe for fs in t.manifest()["buckets"].values() for fe in fs]
    by_rows = sorted(entries, key=lambda fe: fe["rows"])
    lo, hi = by_rows[0], by_rows[-1]
    assert lo["rows"] != hi["rows"]
    v_path = _os.path.join(t.path, lo["path"])
    backup = v_path + ".bak"
    _shutil.copyfile(v_path, backup)
    _shutil.copyfile(_os.path.join(t.path, hi["path"]), v_path)
    r = t.validate()
    assert not r["ok"] and any("record_count drift" in i for i in r["issues"])
    _shutil.copyfile(backup, v_path)
    _os.remove(backup)
    assert t.validate()["ok"]

    # corruption 2b: stamped min/max bounds go stale while the row
    # count still matches — record_count alone misses it, the stats
    # check catches it (a narrower-than-data bound would silently
    # prune live rows on point/range reads)
    m = t.manifest()
    stat_fe, col, bounds = next(
        (fe, c, b)
        for fs in m["buckets"].values()
        for fe in fs
        if fe.get("stats")
        for c, b in fe["stats"].items()
        if b[0] != b[1]  # a [x, x] bound can't be narrowed detectably
    )
    saved = list(bounds)
    stat_fe["stats"][col] = [bounds[0], bounds[0]]  # narrow the bound
    m["version"] += 1
    t._commit(m)
    r = t.validate()
    assert not r["ok"] and any("stats drift" in i for i in r["issues"])
    stat_fe["stats"][col] = saved
    m["version"] += 1
    t._commit(m)
    assert t.validate()["ok"]

    # corruption 3: swap two buckets' file lists -> rows misplaced
    m = t.manifest()
    bks = [b for b, fs in m["buckets"].items() if fs]
    assert len(bks) >= 2
    a, b = bks[0], bks[1]
    m["buckets"][a], m["buckets"][b] = m["buckets"][b], m["buckets"][a]
    m["version"] += 1
    t._commit(m)
    r = t.validate(spark, deep=True)
    assert not r["ok"] and any("misplaced" in i for i in r["issues"])


def test_rename_column_metadata_only_evolution(spark, tmp_path):
    """Iceberg RENAME COLUMN analogue: metadata-only rename — old files
    keep their on-disk name and are mapped through the rename chain on
    read; pre-rename snapshots still read under the old name; the
    changelog across the rename boundary is empty; merges after the
    rename keep working; chained renames compose."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    ch = T.StructType(list(schema.fields) + [T.StructField("__delete", T.BooleanType())])
    t = LakeTable.create(str(tmp_path / "t"), schema, ["k", "i"], "k", n_buckets=4)
    t.merge(spark, spark.createDataFrame(
        [("a", 1, "x", False), ("b", 2, "y", False)], ch))
    pre = t.current_version()

    t.rename_column("v", "val")
    assert [f.name for f in t.schema().fields] == ["k", "i", "val"]
    # old files (still storing column 'v') read under the new name
    got = {(r["k"], r["i"]): r["val"] for r in t.read(spark).collect()}
    assert got == {("a", 1): "x", ("b", 2): "y"}
    # time travel to the pre-rename snapshot keeps the OLD name
    assert [c for c, _ in t.read(spark, version=pre).dtypes] == ["k", "i", "v"]
    # rename rewrites nothing: changelog across the boundary is empty
    assert t.read_changes(spark, pre).count() == 0
    assert t.column_aliases() == {"val": ["v"]}

    # merge NEW data under the new name; both generations resolve
    ch2 = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("val", T.StringType()),
            T.StructField("__delete", T.BooleanType()),
        ]
    )
    t.merge_mor(spark, spark.createDataFrame(
        [("a", 1, "x2", False), ("c", 3, "z", False)], ch2))
    got = {(r["k"], r["i"]): r["val"] for r in t.read(spark).collect()}
    assert got == {("a", 1): "x2", ("b", 2): "y", ("c", 3): "z"}
    # changelog across rename+merge shows only the real changes, under
    # the new name
    chg = {(r["op"], r["k"], r["i"]): r["val"] for r in t.read_changes(spark, pre).collect()}
    assert chg == {("update", "a", 1): "x2", ("insert", "c", 3): "z"}

    # chained rename composes over BOTH old generations
    t.rename_column("val", "value")
    got = {(r["k"], r["i"]): r["value"] for r in t.read(spark).collect()}
    assert got == {("a", 1): "x2", ("b", 2): "y", ("c", 3): "z"}
    assert t.column_aliases() == {"value": ["val", "v"]}
    # compaction folds everything to the current name; reads unchanged
    t.compact(spark)
    got = {(r["k"], r["i"]): r["value"] for r in t.read(spark).collect()}
    assert got == {("a", 1): "x2", ("b", 2): "y", ("c", 3): "z"}
    # fsck stays green (deep: placement + uniqueness over renamed reads)
    assert t.validate(spark, deep=True)["ok"]


def test_rename_key_column_updates_key_metadata(spark, tmp_path):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    ch = T.StructType(list(schema.fields) + [T.StructField("__delete", T.BooleanType())])
    t = LakeTable.create(str(tmp_path / "t"), schema, ["k", "i"], "k", n_buckets=4)
    t.merge(spark, spark.createDataFrame([("a", 1, "x", False)], ch))
    t.rename_column("k", "conv")
    m = t.manifest()
    assert m["bucket_by"] == "conv" and m["key_cols"] == ["conv", "i"]
    ch2 = T.StructType(
        [
            T.StructField("conv", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.StringType()),
            T.StructField("__delete", T.BooleanType()),
        ]
    )
    t.merge(spark, spark.createDataFrame([("a", 1, "x2", False), ("b", 2, "y", False)], ch2))
    got = {(r["conv"], r["i"]): r["v"] for r in t.read(spark).collect()}
    assert got == {("a", 1): "x2", ("b", 2): "y"}
    # point read through the renamed bucket key still prunes buckets
    assert {r["conv"] for r in t.read_for_keys(spark, ["b"]).collect()} == {"b"}
    # invalid renames fail fast
    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with _pytest.raises(ValueError):
        t.rename_column("v", "i")


def test_read_changes_across_key_rename_with_deltas(spark, tmp_path):
    """Cross-version changelog where a KEY column was renamed and MOR
    deltas are in scope: both sides align to the newer schema, so the
    delta-resolution group key must map through the rename chain."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.StringType()),
        ]
    )
    ch = T.StructType(list(schema.fields) + [T.StructField("__delete", T.BooleanType())])
    t = LakeTable.create(str(tmp_path / "t"), schema, ["k", "i"], "k", n_buckets=2)
    t.merge_mor(spark, spark.createDataFrame(
        [("a", 1, "x", False), ("b", 2, "y", False)], ch))
    pre = t.current_version()  # MOR deltas live at this version
    t.rename_column("k", "conv")
    ch2 = T.StructType(
        [
            T.StructField("conv", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("v", T.StringType()),
            T.StructField("__delete", T.BooleanType()),
        ]
    )
    t.merge_mor(spark, spark.createDataFrame([("a", 1, "x2", False)], ch2))
    chg = {(r["op"], r["conv"], r["i"]): r["v"]
           for r in t.read_changes(spark, pre).collect()}
    assert chg == {("update", "a", 1): "x2"}


def test_zvalue_boundaries_spread_for_midsize_domains(spark):
    """Boundary selection must stay evenly spread when the distinct
    count sits between n_codes and 2*n_codes (an integer stride would
    collapse the upper range into one code)."""
    from pyspark.sql import functions as F

    from mysql_tracker_spark.lakestore.table import _zvalue_expr

    df = spark.range(100).select((F.col("id") * 10).cast("int").alias("x"))
    z = df.withColumn("z", _zvalue_expr(df, ["x", "x"]))
    codes = z.select(F.countDistinct("z")).first()[0]
    assert codes >= 50, f"only {codes} distinct z codes over 100 values"
    # top of the domain must not collapse into one code
    top = z.filter(F.col("x") >= 640).select(F.countDistinct("z")).first()[0]
    assert top >= 18, f"upper third collapsed to {top} codes"


def test_delete_where_retention_prunes_and_changelogs(spark, tmp_table_dir):
    """Predicate DELETE (retention): matching rows gone, buckets whose
    file stats exclude the range carried BY REFERENCE, changelog across
    the boundary shows exactly the deleted rows as deletes, replay
    watermark untouched, and a no-match delete is a no-op commit-wise."""
    import datetime as dt

    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    jan, mar = dt.datetime(2026, 1, 1), dt.datetime(2026, 3, 1)
    t = LakeTable.create(
        tmp_table_dir, sch, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    old_keys = ["aa", "ab"]
    new_keys = [f"z{i}" for i in range(10)]
    t.overwrite(
        spark.createDataFrame(
            [(k, 0, "old", jan) for k in old_keys]
            + [(k, 0, "new", mar) for k in new_keys],
            sch,
        ),
        properties={"watermark": "f0:100"},
    )
    v0 = t.current_version()
    before = {b: [f["path"] for f in fs] for b, fs in t.manifest()["buckets"].items()}
    affected = set(t.buckets_for_keys(spark, old_keys))
    assert affected != set(range(4))  # some bucket holds only March rows

    v, n = t.delete_where(spark, {"ts": (None, dt.datetime(2026, 2, 1))})
    assert n == 2
    assert {r.conv_id for r in t.read(spark).collect()} == set(new_keys)
    after = {b: [f["path"] for f in fs] for b, fs in t.manifest()["buckets"].items()}
    for b in after:
        if int(b) not in affected:  # pruned: identical entries, never rewritten
            assert after[b] == before[b]
        else:
            assert after[b] != before[b]
    # changelog: exactly the two deleted rows, as deletes
    ch = t.read_changes(spark, v0, v).collect()
    assert {(r.conv_id, r.op) for r in ch} == {
        ("aa", "delete"), ("ab", "delete")
    }
    # maintenance commit: replay watermark carried forward untouched
    assert t.properties()["watermark"] == "f0:100"
    assert t.manifest()["summary"]["rows_deleted"] == 2
    # time travel: the pre-delete snapshot still shows the old rows
    assert t.read(spark, v0).count() == 12

    # no file intersects -> no rewrite, same version, zero deleted
    v2, n2 = t.delete_where(spark, {"ts": (dt.datetime(2030, 1, 1), None)})
    assert (v2, n2) == (v, 0)

    # an empty predicate is a refused footgun, not a full wipe
    with pytest.raises(ValueError, match="delete every row"):
        t.delete_where(spark, {})


def test_delete_where_resolves_mor_deltas_and_keeps_nulls(spark, tmp_table_dir):
    """DELETE over merge-on-read state: the LIVE (LWW) row decides the
    match — an update that moved a row out of the range saves it, the
    rewrite absorbs the bucket's deltas, and NULL predicate columns
    never match (SQL semantics)."""
    import datetime as dt

    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    chs = T.StructType(sch.fields + [T.StructField("__delete", T.BooleanType())])
    jan, mar = dt.datetime(2026, 1, 1), dt.datetime(2026, 3, 1)
    t = LakeTable.create(
        tmp_table_dir, sch, ["conv_id", "turn_idx"], "conv_id", n_buckets=2
    )
    t.overwrite(
        spark.createDataFrame(
            [(f"k{i}", 0, "old", jan) for i in range(4)] + [("n1", 0, "nul", None)],
            sch,
        )
    )
    # MOR delta: k0 moves to March (must survive), m1 inserted in March
    t.merge_mor(
        spark,
        spark.createDataFrame(
            [("k0", 0, "moved", mar, False), ("m1", 0, "new", mar, False)], chs
        ),
    )
    v0 = t.current_version()
    v, n = t.delete_where(spark, {"ts": (None, dt.datetime(2026, 2, 1))})
    assert n == 3  # k1,k2,k3; k0 saved by its delta, n1 NULL never matches
    got = {r.conv_id: r.text for r in t.read(spark).collect()}
    assert got == {"k0": "moved", "m1": "new", "n1": "nul"}
    # the rewrite absorbed every delta in the affected buckets
    assert t.delta_counts() == {}
    ch = t.read_changes(spark, v0, v).collect()
    assert {(r.conv_id, r.op) for r in ch} == {
        ("k1", "delete"), ("k2", "delete"), ("k3", "delete")
    }


def test_delete_where_file_granular_in_clustered_bucket(spark, tmp_table_dir):
    """Retention on a ts-clustered bucket rewrites ONLY the files whose
    bounds intersect the expired range (Delta DELETE rewrite model):
    the in-range file survives in the manifest byte-identically."""
    import datetime as dt

    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    jan, mar = dt.datetime(2026, 1, 1), dt.datetime(2026, 3, 1)
    t = LakeTable.create(
        tmp_table_dir, sch, ["conv_id", "turn_idx"], "conv_id", n_buckets=1
    )
    t.overwrite(
        spark.createDataFrame(
            [(f"j{i}", 0, "old", jan) for i in range(8)]
            + [(f"m{i}", 0, "new", mar) for i in range(8)],
            sch,
        )
    )
    # cluster the single bucket into ~2 ts-ranged files
    t.compact(spark, bucket_ids=[0], sort_by="ts", files_per_bucket=2)
    before = t.manifest()["buckets"]["0"]
    assert len(before) >= 2
    mar_entries = [
        fe for fe in before if fe["stats"]["ts"][0] >= "2026-02-01"
    ]
    assert mar_entries  # clustering actually separated the ranges

    v, n = t.delete_where(spark, {"ts": (None, dt.datetime(2026, 2, 1))})
    assert n == 8
    after = t.manifest()["buckets"]["0"]
    # every pure-March file carried BY REFERENCE, never rewritten
    for fe in mar_entries:
        assert fe in after
    s = t.manifest()["summary"]
    assert s["rewritten_files"] == len(before) - len(mar_entries)
    assert s["resolved_buckets"] == 0
    assert {r.conv_id for r in t.read(spark).collect()} == {
        f"m{i}" for i in range(8)
    }


def test_read_asof_timestamp_time_travel(spark, tmp_table_dir):
    """FOR TIMESTAMP AS OF: version_at resolves the snapshot current at
    a probe time from the commit stamps; probes between commits land on
    the earlier one, probes before create raise."""
    import datetime as dt

    t = _mk(spark, tmp_table_dir)
    v0 = t.current_version()
    ts0 = t.manifest(v0)["summary"]["ts_ms"]
    t.merge(spark, spark.createDataFrame([("c9", 0, "new", False)], CH_SCHEMA))
    v1 = t.current_version()
    ts1 = t.manifest(v1)["summary"]["ts_ms"]
    assert ts0 <= ts1

    assert t.version_at(ts0) >= v0  # at-or-before semantics
    if ts1 > ts0:  # commits in the same millisecond collapse
        assert t.version_at(ts1 - 1) < v1
    assert t.version_at(ts1) == v1
    # datetime probe, now() covers head
    head = t.version_at(dt.datetime.now())
    assert head == v1
    got = {r.conv_id for r in t.read_asof(spark, dt.datetime.now()).collect()}
    assert "c9" in got
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.version_at(0)


def test_point_read_time_travel_across_rescale(spark, tmp_table_dir):
    """read_for_keys(version=...) must hash with the HISTORICAL bucket
    layout: after a rescale the requested key lives in a different
    bucket id, and computing placement from the current manifest would
    open the wrong (or nonexistent) historical bucket and silently
    return nothing."""
    t = _mk(spark, tmp_table_dir)
    v1 = t.current_version()
    t.rescale_buckets(spark, 7)
    # historical read: every key readable at v1 under the OLD layout
    for k in ("c1", "c2"):
        got = {
            (r.conv_id, r.turn_idx)
            for r in t.read_for_keys(spark, [k], version=v1).collect()
        }
        exp = {
            (r.conv_id, r.turn_idx)
            for r in t.read(spark, version=v1)
            .filter(f"conv_id = '{k}'")
            .collect()
        }
        assert got == exp and got
    # and the current-layout read still works post-rescale
    assert t.read_for_keys(spark, ["c1"]).count() == 2


def test_exists_ignores_stranded_commit_temps(tmp_path):
    """A crash between temp-write and link leaves only a .tmp-* file;
    exists() must not claim a table load() cannot open."""
    import os

    snap = tmp_path / "t" / "snapshots"
    os.makedirs(snap)
    (snap / ".tmp-v00000001.json-abc123").write_text("{}")
    assert not LakeTable.exists(str(tmp_path / "t"))


def test_merge_stale_affected_buckets_raises_not_drops(spark, tmp_table_dir):
    """A caller-supplied affected_buckets set computed under an OLD
    layout must raise CommitConflictError when the layout changed in
    between — never silently drop the upserts that hash outside it."""
    from mysql_tracker_spark.lakestore.table import CommitConflictError

    t = _mk(spark, tmp_table_dir)
    stale_affected = t.buckets_for_keys(spark, ["c9"])  # under n=4
    t.split_buckets(4)  # 4 -> 16: c9's bucket id changes
    new_b = t.buckets_for_keys(spark, ["c9"])
    assert new_b != stale_affected  # the race is real for this key
    ch = spark.createDataFrame([("c9", 0, "x", False)], CH_SCHEMA)
    with pytest.raises(CommitConflictError):
        t.merge(spark, ch, affected_buckets=stale_affected)
    # and nothing was committed behind the error
    assert t.read(spark).filter("conv_id = 'c9'").count() == 0


def test_read_where_ts_pruning_respects_session_timezone(spark, tmp_table_dir):
    """Round-4 review fix: ts stats are stamped naive-UTC, but a NAIVE
    probe literal goes through TimestampType.toInternal, which uses
    the PYTHON PROCESS's local timezone. On a non-UTC host the pruning
    compare must convert the probe to UTC the same way, or files
    holding matching rows are silently skipped."""
    import datetime as dt
    import os
    import time as _time

    sch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t = LakeTable.create(
        tmp_table_dir, sch, ["conv_id", "turn_idx"], "conv_id", n_buckets=2
    )
    # instant 10:00 UTC
    t.overwrite(
        spark.createDataFrame(
            [("a", 0, dt.datetime(2026, 1, 1, 10, 0))], sch
        )
    )
    old_tz = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "Asia/Shanghai"  # UTC+8, no DST
        _time.tzset()
        # naive 17:00 — toInternal reads it as Shanghai wall = 09:00
        # UTC instant, so the 10:00 UTC row MATCHES; the pre-fix
        # pruning compared 17:00 against the file's UTC max 10:00 and
        # skipped the file
        got = t.read_where(
            spark, "ts", lo=dt.datetime(2026, 1, 1, 17, 0)
        ).collect()
        assert len(got) == 1 and got[0].conv_id == "a"
        # exclusion side: 19:00 Shanghai = 11:00 UTC is past the row
        assert (
            t.read_where(
                spark, "ts", lo=dt.datetime(2026, 1, 1, 19, 0)
            ).count()
            == 0
        )
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
