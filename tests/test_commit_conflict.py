"""Optimistic commit-conflict REBASE for copy-on-write MERGE (Iceberg
commit semantics, ``lakestore/table.py::merge``): a concurrent commit
that touched only DISJOINT state (other buckets, properties, expiry)
rebases onto the new head and commits without redoing data work; a
conflict on anything the rewrite depended on (an affected bucket, the
schema, the bucket layout) raises ``CommitConflictError`` — retrying
would silently drop the concurrent writer's rows. The MOR delta path
has its own composition-based retry (``_commit_delta``), tested in
test_mor.py; this file covers the COW side.
"""

import pytest
from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.lakestore import CommitConflictError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
CH_SCHEMA = T.StructType(
    list(SCHEMA.fields) + [T.StructField("__delete", T.BooleanType())]
)


def _mk(spark, path):
    t = LakeTable.create(
        str(path), SCHEMA, key_cols=["conv_id", "turn_idx"],
        bucket_by="conv_id", n_buckets=8,
    )
    df = spark.range(200).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        (F.col("id") / 50).cast("int").alias("turn_idx"),
        F.concat(F.lit("v0-"), F.col("id").cast("string")).alias("text"),
    )
    t.overwrite(df)
    return t


def _inject_racer(monkeypatch, mutate=None):
    """Patch LakeTable._commit so the FIRST merge commit attempt is
    beaten by a concurrent commit (optionally mutated), exactly the
    window a real racer would win."""
    orig = LakeTable._commit
    state = {"fired": False}

    def racy(self, manifest):
        if (
            not state["fired"]
            and manifest.get("summary", {}).get("operation") == "merge"
        ):
            state["fired"] = True
            h = self.manifest()
            race = dict(h)
            race["version"] = h["version"] + 1
            race["parent"] = h["version"]
            race["properties"] = {**h["properties"], "racer": "1"}
            race["summary"] = {"operation": "racer", "ts_ms": 0}
            if mutate is not None:
                mutate(race)
            orig(self, race)
        return orig(self, manifest)

    monkeypatch.setattr(LakeTable, "_commit", racy)
    return state


def test_disjoint_conflict_rebases_and_commits(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    state = _inject_racer(monkeypatch)  # property-only concurrent commit
    ch = spark.createDataFrame([("c7", 0, "UPDATED", False)], CH_SCHEMA)
    v, summary = t.merge(spark, ch, properties={"mine": "1"})
    assert state["fired"]
    assert v == v0 + 2  # racer took v0+1, merge rebased onto it
    assert summary["rebased_from"] == v0
    props = t.properties()
    assert props["racer"] == "1" and props["mine"] == "1"  # both survive
    got = {r["text"] for r in t.read(spark).filter("conv_id='c7' and turn_idx=0").collect()}
    assert got == {"UPDATED"}
    # full content sanity: one live row per key, count unchanged
    assert t.row_count(spark) == 200


def test_conflict_on_affected_bucket_raises(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path / "t")
    [b] = t.buckets_for_keys(spark, ["c7"])

    def mutate(race):
        race["buckets"] = {k: list(v) for k, v in race["buckets"].items()}
        race["buckets"][str(b)] = race["buckets"][str(b)] + [
            {"path": "data/ghost.parquet", "schema_id": 0, "rows": 0,
             "delta": True, "seq": race["version"]}
        ]

    _inject_racer(monkeypatch, mutate)
    ch = spark.createDataFrame([("c7", 0, "UPDATED", False)], CH_SCHEMA)
    with pytest.raises(CommitConflictError, match=f"bucket {b}"):
        t.merge(spark, ch)
    # the losing merge left no committed state: head is the racer
    assert t.manifest()["summary"]["operation"] == "racer"


def test_conflict_on_schema_raises(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path / "t")

    def mutate(race):
        sid = race["schema_id"] + 1
        sch = T.StructType(
            list(SCHEMA.fields) + [T.StructField("extra", T.StringType())]
        )
        race["schemas"] = {**race["schemas"], str(sid): __import__("json").loads(sch.json())}
        race["schema_id"] = sid

    _inject_racer(monkeypatch, mutate)
    ch = spark.createDataFrame([("c7", 0, "UPDATED", False)], CH_SCHEMA)
    with pytest.raises(CommitConflictError, match="schema or bucket layout"):
        t.merge(spark, ch)


def test_compact_and_delete_where_rebase_too(spark, tmp_path, monkeypatch):
    """The maintenance commits share the same rebase: a property-only
    racer beats a delete_where commit and both survive."""
    t = _mk(spark, tmp_path / "t")
    orig = LakeTable._commit
    state = {"fired": False}

    def racy(self, manifest):
        if (
            not state["fired"]
            and manifest.get("summary", {}).get("operation") == "delete-where"
        ):
            state["fired"] = True
            h = self.manifest()
            race = dict(h)
            race["version"] = h["version"] + 1
            race["parent"] = h["version"]
            race["properties"] = {**h["properties"], "racer": "1"}
            race["summary"] = {"operation": "racer", "ts_ms": 0}
            orig(self, race)
        return orig(self, manifest)

    monkeypatch.setattr(LakeTable, "_commit", racy)
    v, n = t.delete_where(spark, {"turn_idx": (2, None)})
    assert state["fired"] and n > 0
    assert t.properties()["racer"] == "1"
    assert t.manifest()["summary"]["rebased_from"] == v - 2
    assert t.read(spark).filter("turn_idx >= 2").count() == 0


# ---------------------------------------------------------------- torn writes


def test_commit_is_torn_write_proof(spark, tmp_path, monkeypatch):
    """A crash mid-manifest-write must never strand a truncated v-file
    at the table head: the payload goes to a sideways temp and only an
    atomic link publishes it. Simulate the crash by failing os.write
    after a partial write and assert (a) no v-file appeared, (b) the
    prior head still parses, (c) a retry commits cleanly."""
    import os as _os

    t = _mk(spark, tmp_path / "t")
    v0 = t.current_version()
    orig_write = _os.write
    state = {"boom": True}

    def torn_write(fd, data):
        if state["boom"] and len(data) > 64:
            state["boom"] = False
            orig_write(fd, data[: len(data) // 2])  # half the payload lands
            raise OSError(28, "No space left on device (injected)")
        return orig_write(fd, data)

    monkeypatch.setattr(_os, "write", torn_write)
    ch = spark.createDataFrame([("c7", 0, "UPDATED", False)], CH_SCHEMA)
    with pytest.raises(OSError, match="injected"):
        t.merge(spark, ch)
    monkeypatch.setattr(_os, "write", orig_write)

    # head untouched and fully parseable; the claimed version never appeared
    assert t.current_version() == v0
    assert t.manifest()["version"] == v0
    import os
    assert not os.path.exists(os.path.join(t.snap_dir, f"v{v0 + 1:08d}.json"))

    # retry lands (merge rewrites its delta; data work is re-done)
    v, _ = t.merge(spark, ch)
    assert v == v0 + 1
    got = {r["text"] for r in t.read(spark).filter("conv_id='c7' and turn_idx=0").collect()}
    assert got == {"UPDATED"}


def test_commit_leaves_no_temp_and_conflict_contract_holds(spark, tmp_path):
    """Normal commits and losing commits both clean their sideways
    temp; a version collision still surfaces as FileExistsError (the
    contract every optimistic caller catches)."""
    import os

    t = _mk(spark, tmp_path / "t")
    m = t.manifest()
    loser = dict(m)
    loser["version"] = m["version"]  # claim an ALREADY-TAKEN version
    with pytest.raises(FileExistsError):
        t._commit(loser)
    winner = dict(m)
    winner["version"] = m["version"] + 1
    winner["parent"] = m["version"]
    assert t._commit(winner) == m["version"] + 1
    stray = [f for f in os.listdir(t.snap_dir) if f.startswith(".tmp-v")]
    assert stray == []


def test_gc_orphans_reclaims_stranded_commit_temp(spark, tmp_path):
    """A crash between temp-write and link strands a dot-temp in
    snapshots/: invisible to the version scan, reclaimed by gc once
    aged, never reclaimed while younger than the in-flight guard."""
    import os

    t = _mk(spark, tmp_path / "t")
    stranded = os.path.join(t.snap_dir, ".tmp-v00000099-deadbeef.json")
    open(stranded, "w").write('{"version": 99')  # torn payload, typical debris
    v0 = t.current_version()
    assert t.current_version() == v0  # version scan ignores dot-temps
    assert t.gc_orphans(min_age_s=3600) == 0  # too young: in-flight guard
    os.utime(stranded, (1, 1))
    assert t.gc_orphans(min_age_s=3600) == 1
    assert not os.path.exists(stranded)
    assert t.manifest()["version"] == v0
