"""Per-file bloom-filter point-read pruning (Delta bloom-index /
Iceberg puffin analogue, ``lakestore/table.py::read_where_in``).

Guarantees under test: no false negatives ever (every present value is
found, file skipping is exact on the miss side), pruning actually
skips files min/max bounds cannot (high-cardinality values scattered
across files), correctness fallback under merge-on-read deltas, and
the blooms ride every write path (overwrite, merge, the apply job).
"""

import pytest
from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.lakestore import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _mk(spark, path, n_rows=400, n_buckets=8):
    t = LakeTable.create(
        str(path),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        bucket_by="conv_id",
        n_buckets=n_buckets,
        bloom_cols=["text"],
    )
    df = spark.range(n_rows).select(
        F.concat(F.lit("c"), (F.col("id") % 100).cast("string")).alias("conv_id"),
        (F.col("id") / 100).cast("int").alias("turn_idx"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
    )
    t.overwrite(df)
    return t


def test_blooms_stamped_on_write(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    m = t.manifest()
    entries = [fe for fs in m["buckets"].values() for fe in fs]
    assert entries and all("bloom" in fe and "text" in fe["bloom"] for fe in entries)
    # 8192-bit bitmap = 1024 bytes = 2048 hex chars
    assert all(len(fe["bloom"]["text"]) == 2048 for fe in entries)


def test_no_false_negatives_and_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    full = len(t.live_files())
    assert full > 1
    # every present value is found (bloom can never skip a holder)
    hit = t.read_where_in(spark, "text", ["payload-7", "payload-393"])
    rows = {r["text"] for r in hit.collect()}
    assert rows == {"payload-7", "payload-393"}
    opened = len(hit.inputFiles())
    assert 0 < opened < full, f"bloom must prune: opened {opened} of {full}"
    # absent value: 0 rows, and (deterministically, at this fill ratio)
    # far fewer files opened than the full live set
    miss = t.read_where_in(spark, "text", ["payload-nope"])
    assert miss.count() == 0
    assert len(miss.inputFiles()) < full


def test_matches_full_scan_filter(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    probes = [f"payload-{i}" for i in range(0, 400, 37)]
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read_where_in(spark, "text", probes).collect()
    )
    exp = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).filter(F.col("text").isin(probes)).collect()
    )
    assert got == exp and len(got) == len(probes)


def test_mor_delta_fallback_correct(spark, tmp_path):
    """Payload-column skipping must disengage while deltas are live: an
    update moves a key's winning text into a delta file, and the OLD
    base value must not resurface."""
    t = _mk(spark, tmp_path / "t")
    upd = spark.createDataFrame(
        [("c7", 0, "payload-MOVED", False)],
        T.StructType(
            list(SCHEMA.fields) + [T.StructField("__delete", T.BooleanType())]
        ),
    )
    t.merge_mor(spark, upd)
    assert any(
        fe.get("delta") for fs in t.manifest()["buckets"].values() for fe in fs
    )
    # old value is dead: the pre-update text of (c7, 0) was payload-7
    got = t.read_where_in(spark, "text", ["payload-7", "payload-MOVED"]).collect()
    texts = {r["text"] for r in got}
    assert "payload-MOVED" in texts and "payload-7" not in texts


def test_blooms_survive_merge_and_apply_job(spark, tmp_path):
    """The flagship apply path stamps blooms too (CdcApplyJob
    bloom_cols -> create -> every _write_buckets commit)."""
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=1200, n_conversations=60, seed=31))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=2)
    job = CdcApplyJob(
        spark, in_dir, str(tmp_path / "tbl"), n_buckets=4, bloom_cols=["text"]
    )
    job.run()
    m = job.table.manifest()
    entries = [fe for fs in m["buckets"].values() for fe in fs]
    assert entries and all("text" in (fe.get("bloom") or {}) for fe in entries)
    # point-read a live text value through the bloom path
    some = job.table.read(spark).select("text").first()["text"]
    got = job.table.read_where_in(spark, "text", [some])
    assert got.count() >= 1
    assert len(got.inputFiles()) < len(job.table.live_files())


def test_pre_bloom_files_are_kept(spark, tmp_path):
    """Files committed before bloom_cols existed carry no bitmap and
    must never be skipped (missing index = keep, like missing stats)."""
    t = _mk(spark, tmp_path / "t")
    m = t.manifest()
    for fs in m["buckets"].values():
        for fe in fs:
            fe.pop("bloom", None)
    m["version"] += 1
    m["parent"] = m["version"] - 1
    t._commit(m)
    got = t.read_where_in(spark, "text", ["payload-7"]).collect()
    assert {r["text"] for r in got} == {"payload-7"}


def test_fsck_detects_bloom_drift(spark, tmp_path):
    """Deep fsck re-derives each file's required positions with the
    same engine hash and flags a bitmap that no longer contains them
    (e.g. a file replaced after commit)."""
    t = _mk(spark, tmp_path / "t")
    assert t.validate(spark, deep=True)["ok"]
    m = t.manifest()
    # zero one file's bitmap: its values' bits are now missing
    fe = next(fe for fs in m["buckets"].values() for fe in fs)
    fe["bloom"]["text"] = "00" * 1024
    m["version"] += 1
    m["parent"] = m["version"] - 1
    t._commit(m)
    r = t.validate(spark, deep=True)
    assert not r["ok"]
    assert any("bloom bitmap drift" in i for i in r["issues"])


def test_bloom_stamping_under_data_rooted_table_path(spark, tmp_path):
    """A table rooted under a path that itself contains '/data/' must
    still map staged files back to their manifest entries (the rsplit
    anchor on the TABLE's own data dir)."""
    root = tmp_path / "data" / "tables"
    root.mkdir(parents=True)
    t = _mk(spark, root / "t", n_rows=50, n_buckets=2)
    entries = [fe for fs in t.manifest()["buckets"].values() for fe in fs]
    assert entries and all("text" in (fe.get("bloom") or {}) for fe in entries)
    assert t.validate(spark, deep=True)["ok"]


def test_read_where_in_randomized_equivalence(spark, tmp_path):
    """Randomized model check: for random corpora (duplicated texts,
    NULLs, multi-bucket layouts) and random probe sets (present +
    absent values), read_where_in == full-scan isin, always — pruning
    is an optimization, never a semantic filter."""
    import random

    from pyspark.sql import Row

    rng = random.Random(97)
    for it in range(3):
        t = LakeTable.create(
            str(tmp_path / f"t{it}"),
            SCHEMA,
            key_cols=["conv_id", "turn_idx"],
            bucket_by="conv_id",
            n_buckets=rng.choice([2, 4, 8]),
            bloom_cols=["text"],
        )
        vocab = [f"w{i}" for i in range(rng.randint(5, 40))]
        rows = [
            Row(
                conv_id=f"c{rng.randint(0, 30)}",
                turn_idx=i,
                text=rng.choice(vocab) if rng.random() > 0.1 else None,
            )
            for i in range(rng.randint(50, 200))
        ]
        t.overwrite(spark.createDataFrame(rows, SCHEMA))
        probes = rng.sample(vocab, k=min(5, len(vocab))) + ["absent-1", "absent-2"]
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in t.read_where_in(spark, "text", probes).collect()
        )
        exp = sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in t.read(spark).filter(F.col("text").isin(probes)).collect()
        )
        assert got == exp, f"iteration {it} diverged"
