"""Wire-format encode/decode round-trip (SURVEY §2.2 D1-D5): the
vectorized binary decode must reproduce the typed change events
exactly, including multi-row frames and checksums."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.schema import CHANGE_EVENT_SCHEMA, RAW_FRAME_SCHEMA
from mysql_tracker_spark.sources.binlog_gen import GenConfig, gen_change_events, write_batches
from mysql_tracker_spark.sources.wire import (
    HEADER_LEN,
    decode_frames,
    encode_frames,
    write_wire_batches,
)

CFG = GenConfig(n_events=2500, n_conversations=100, seed=9)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    ev = gen_change_events(CFG)
    wire = str(tmp_path_factory.mktemp("wire"))
    typed = str(tmp_path_factory.mktemp("typed"))
    write_wire_batches(ev, wire, n_batches=3)
    write_batches(ev, typed, n_batches=3)
    return wire, typed


def _canon(df):
    key = ["file", "pos", "row_idx"]
    cols = ["op", "xid", "schema_name", "table_name", "is_ddl", "ddl_sql", "server_id"]
    # full-row distinct (replayed duplicates are exact copies);
    # dropDuplicates(subset) + exceptAll over a mapInPandas plan trips
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1
    return df.select(
        *key,
        *cols,
        F.to_json("before").alias("bj"),
        F.to_json("after").alias("aj"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("tss"),
    ).distinct()


def test_roundtrip_equals_typed(spark, dirs):
    wire, typed = dirs
    dec = _canon(decode_frames(spark.read.schema(RAW_FRAME_SCHEMA).parquet(wire)))
    ref = _canon(spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(typed))
    assert dec.exceptAll(ref).count() == 0
    assert ref.exceptAll(dec).count() == 0


def test_corrupt_frame_dropped(spark, dirs):
    wire, _ = dirs
    raw = spark.read.schema(RAW_FRAME_SCHEMA).parquet(wire)
    # flip one byte in the body of every 50th frame
    corrupt = raw.withColumn(
        "payload",
        F.when(
            F.col("pos") % 50 == 0,
            F.concat(
                F.substring("payload", 1, HEADER_LEN),
                F.lit(b"X"),
                F.expr(f"substring(payload, {HEADER_LEN + 2})"),
            ),
        ).otherwise(F.col("payload")),
    )
    total = decode_frames(raw, drop_bad_crc=False).count()
    kept = decode_frames(corrupt, drop_bad_crc=True).count()
    dropped = total - kept
    assert dropped > 0  # corrupted frames detected by checksum and dropped


def test_invalid_utf8_frame_dropped_not_task_failure(spark, dirs):
    """A genuinely corrupted frame (non-ASCII byte flip -> invalid
    UTF-8 body) must fall into the drop path, not fail the decode
    task (the C++ binary->string cast raises on invalid UTF-8)."""
    wire, _ = dirs
    raw = spark.read.schema(RAW_FRAME_SCHEMA).parquet(wire)
    corrupt = raw.withColumn(
        "payload",
        F.when(
            F.col("pos") % 50 == 0,
            F.concat(
                F.substring("payload", 1, HEADER_LEN),
                F.lit(bytes([0xFF, 0xFE])),  # invalid UTF-8 sequence
                F.expr(f"substring(payload, {HEADER_LEN + 3})"),
            ),
        ).otherwise(F.col("payload")),
    )
    total = decode_frames(raw, drop_bad_crc=False).count()
    kept = decode_frames(corrupt, drop_bad_crc=True).count()
    assert 0 < kept < total


def test_truncated_frame_dropped_not_task_failure(spark, dirs):
    """Frames shorter than header+crc are undecodable; they must be
    dropped JVM-side, not crash the fixed-width header cast."""
    wire, _ = dirs
    raw = spark.read.schema(RAW_FRAME_SCHEMA).parquet(wire)
    corrupt = raw.withColumn(
        "payload",
        F.when(F.col("pos") % 50 == 0, F.expr("substring(payload, 1, 10)"))
        .otherwise(F.col("payload")),
    )
    total = decode_frames(raw, drop_bad_crc=False).count()
    kept = decode_frames(corrupt, drop_bad_crc=True).count()
    assert 0 < kept < total


def test_adversarial_payload_fuzz_never_crashes(spark, dirs):
    """S4 robustness under garbage: 400 seeded-random byte payloads
    (arbitrary lengths, incl. empty / header-sized / long) plus
    structured mutations of valid frames (appended junk, flipped type
    byte, injected separator bytes) are unioned with valid frames.
    The decode must not fail any task, must drop every junk frame, and
    must keep exactly the untouched valid set."""
    import random

    wire, _ = dirs
    raw = spark.read.schema(RAW_FRAME_SCHEMA).parquet(wire)
    valid_keys = {(r["file"], r["pos"]) for r in raw.select("file", "pos").collect()}

    rng = random.Random(77)
    junk_rows = []
    for i in range(400):
        ln = rng.choice([0, 1, HEADER_LEN - 1, HEADER_LEN, HEADER_LEN + 4,
                         rng.randint(24, 200), rng.randint(200, 2000)])
        junk_rows.append(("zz.999999", 10_000_000 + i, bytes(rng.randbytes(ln))))
    # structured mutations of one real frame
    sample = raw.limit(3).collect()
    for j, r in enumerate(sample):
        p = bytes(r["payload"])
        junk_rows.append(("zz.999999", 20_000_000 + j * 3, p + b"\xff\x00junk"))
        junk_rows.append(("zz.999999", 20_000_001 + j * 3, bytes([p[0], p[1], p[2], p[3], 0x7F]) + p[5:]))
        junk_rows.append(("zz.999999", 20_000_002 + j * 3, p[:HEADER_LEN] + b"\x1c\x1d\x1e" * 10 + p[-4:]))
    junk = spark.createDataFrame(junk_rows, RAW_FRAME_SCHEMA)

    out = decode_frames(raw.unionByName(junk), drop_bad_crc=True)
    got_keys = {(r["file"], r["pos"]) for r in out.select("file", "pos").distinct().collect()}
    assert got_keys == valid_keys  # nothing junk survived, nothing valid lost


def test_ddl_flood_bounded_collect_raises(spark, tmp_path):
    """10k unknown-op QUERY frames must not become an unbounded driver
    collect: the wire manifest pass caps candidate-DDL frames and
    raises loudly (operator decision) instead of OOMing."""
    import pandas as pd

    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import gen_change_events

    ev = gen_change_events(GenConfig(n_events=500, n_conversations=50, seed=3))
    flood = pd.DataFrame(
        {
            "file": "bin.000099",
            "pos": 4 + 64 * np.arange(10_000, dtype=np.int64),
            "row_idx": np.int32(0),
            "server_id": np.int64(1),
            "ts": ev["ts"].iloc[0],
            "xid": pd.array([None] * 10_000, dtype="Int64"),
            "op": "FLUSHCACHE",  # unknown op -> encoder emits QUERY type byte
            "schema_name": "chat",
            "table_name": "transcripts",
            "is_ddl": False,
            "ddl_sql": None,
            "before": None,
            "after": None,
        }
    )
    flood["before"] = flood["before"].astype(object).where(flood["before"].notna(), None)
    flood["after"] = flood["after"].astype(object).where(flood["after"].notna(), None)
    ev_all = pd.concat([ev.drop(columns=["event_len"]), flood], ignore_index=True)
    in_dir = str(tmp_path / "in")
    write_wire_batches(ev_all, in_dir, n_batches=1)
    job = CdcApplyJob(
        spark, in_dir, str(tmp_path / "tbl"), n_buckets=4, source_format="wire"
    )
    with pytest.raises(RuntimeError, match="cap"):
        job.run()


def test_multirow_frames_exist_and_decode(spark, dirs):
    wire, _ = dirs
    dec = decode_frames(spark.read.schema(RAW_FRAME_SCHEMA).parquet(wire))
    multi = dec.groupBy("file", "pos").count().filter("count > 1").count()
    assert multi > 0
