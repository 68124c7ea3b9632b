"""Filter + dedup operator unit tests on tiny frames."""

from pyspark.sql import functions as F

from mysql_tracker_spark.operators.dedup import exact_dedup, lww_latest, lww_latest_salted
from mysql_tracker_spark.operators.filters import (
    allowlist_filter,
    dml_for_table,
    handled_event_filter,
    query_class_filter,
    regex_name_filter,
)

COLS = "file string, pos long, row_idx int, op string, schema_name string, table_name string, is_ddl boolean, k string, v string"
ROWS = [
    ("bin.000001", 10, 0, "INSERT", "chat", "transcripts", False, "a", "v1"),
    ("bin.000001", 20, 0, "UPDATE", "chat", "transcripts", False, "a", "v2"),
    ("bin.000002", 5, 0, "UPDATE", "chat", "transcripts", False, "a", "v3"),
    ("bin.000002", 5, 0, "UPDATE", "chat", "transcripts", False, "a", "v3"),  # replayed dup
    ("bin.000001", 30, 0, "INSERT", "chat", "noise_tbl", False, "b", "x"),
    ("bin.000001", 40, 0, "BEGIN", None, None, False, None, None),
    ("bin.000001", 50, 0, "INSERT", "otherdb", "transcripts", False, "c", "y"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_regex_filter(spark):
    out = regex_name_filter(_df(spark), r"chat\..*").select("table_name").distinct().collect()
    assert {r[0] for r in out} == {"transcripts", "noise_tbl"}


def test_allowlist_filter(spark):
    out = allowlist_filter(_df(spark), [("chat", "transcripts")])
    assert out.count() == 4


def test_query_class_filter_drops_txn(spark):
    assert query_class_filter(_df(spark)).filter("op = 'BEGIN'").count() == 0


def test_handled_event_filter(spark):
    assert handled_event_filter(_df(spark)).count() == 6


def test_dml_for_table(spark):
    assert dml_for_table(_df(spark), "chat", "transcripts").count() == 4


def test_lww_variants_agree_and_pick_max_order(spark):
    df = dml_for_table(_df(spark), "chat", "transcripts")
    a = lww_latest(df, ["k"], ["v"]).collect()
    b = lww_latest_salted(df, ["k"], ["v"], n_salts=4).collect()
    assert {(r.k, r.v) for r in a} == {(r.k, r.v) for r in b} == {("a", "v3")}
    # file rotation respected: bin.000002:5 beats bin.000001:20


def test_exact_dedup(spark):
    df = _df(spark)
    assert exact_dedup(df).count() == df.count() - 1


def test_avro_flat_records_rules(spark):
    """D8 flatten: DELETE keeps only key cols in current; INSERT has
    empty source; UPDATE carries both images (reference forgets to set
    them — documented divergence)."""
    from mysql_tracker_spark.operators.parse import avro_flat_records
    import datetime as dt

    rows = [
        ("INSERT", None, {"conv_id": "c1", "turn_idx": "0", "text": "a"}),
        ("UPDATE", {"conv_id": "c1", "turn_idx": "0", "text": "a"},
         {"conv_id": "c1", "turn_idx": "0", "text": "b"}),
        ("DELETE", {"conv_id": "c1", "turn_idx": "0", "text": "b"},
         {"conv_id": "c1", "turn_idx": "0"}),
    ]
    df = spark.createDataFrame(
        [("chat", "transcripts", op, dt.datetime(2025, 1, 1), None, b_, a_) for op, b_, a_ in rows],
        "schema_name string, table_name string, op string, ts timestamp, ddl_sql string, "
        "before map<string,string>, after map<string,string>",
    )
    out = {r["operation"]: r for r in avro_flat_records(df).collect()}
    assert out["INSERT"]["source"] == {}
    assert out["INSERT"]["current"]["text"] == "a"
    assert out["UPDATE"]["source"]["text"] == "a"
    assert out["UPDATE"]["current"]["text"] == "b"
    assert set(out["DELETE"]["current"].keys()) == {"conv_id", "turn_idx"}
    assert out["DELETE"]["source"]["text"] == "b"
    assert all(r["dbName"] == "mysql" and r["tableName"] == "transcripts" for r in out.values())
    # per-column updated flag (LogEventConvert.isUpdate :584-611):
    # UPDATE marks only the changed column; INSERT marks every column;
    # DELETE marks none
    assert out["UPDATE"]["updatedColumns"] == ["text"]
    assert out["INSERT"]["updatedColumns"] == ["conv_id", "text", "turn_idx"]
    assert out["DELETE"]["updatedColumns"] == []


def test_gtid_fence_equals_position_fence_at_txn_boundary(spark, tmp_path):
    """north_star offset vocabulary: replaying from a position watermark
    that sits at a transaction boundary selects exactly the same DML
    suffix as fencing by the executed-GTID set (gtids are per-txn, the
    COMMIT is a txn's last event, so the two vocabularies agree at
    boundaries — and ONLY there, which is why the engine commits only
    at them)."""
    from mysql_tracker_spark.operators.parse import (
        after_gtid_set,
        after_watermark,
        txn_end_position,
    )
    from mysql_tracker_spark.schema import CHANGE_EVENT_SCHEMA
    from mysql_tracker_spark.sources.binlog_gen import (
        SERVER_UUID,
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=2000, n_conversations=80, seed=21))
    d = str(tmp_path / "in")
    write_batches(ev, d, n_batches=1)
    df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(d)
    assert df.filter(F.col("gtid").isNotNull()).count() > 0

    # watermark = last txn end of the first ~half of the log
    half = df.orderBy("file", "pos", "row_idx").limit(df.count() // 2)
    wm = txn_end_position(half)
    assert wm is not None
    executed_hi = (
        df.filter(
            F.struct("file", "pos")
            <= F.struct(F.lit(wm[0]), F.lit(wm[1]).cast("long"))
        )
        .agg(F.max("xid"))
        .collect()[0][0]
    )
    key = ["file", "pos", "row_idx"]
    dml = F.col("op").isin("INSERT", "UPDATE", "DELETE")
    by_pos = {
        tuple(r) for r in after_watermark(df, wm[0], wm[1]).filter(dml).select(*key).collect()
    }
    by_gtid = {
        tuple(r)
        for r in after_gtid_set(df, f"{SERVER_UUID}:1-{executed_hi}")
        .filter(dml)
        .select(*key)
        .collect()
    }
    assert by_pos == by_gtid and len(by_pos) > 0


def test_lww_packed_equals_max_by(spark, tmp_path):
    """The packed-argmax hash-agg LWW must pick exactly the same
    winners as the max_by(struct) formulation, including under replay
    duplicates and payloads containing the 0x01 separator byte."""
    from mysql_tracker_spark.operators.dedup import lww_latest, lww_latest_packed

    rows = []
    for i in range(400):
        rows.append((
            f"bin.{1 + i // 200:06d}", 100 + i, i % 3,
            f"c{i % 17}", i % 5,
            ["INSERT", "UPDATE", "DELETE"][i % 3],
            f"k\x1dv{i}\x01with_sep",  # payload may contain \x01
        ))
    rows += rows[50:80]  # replay duplicates
    df = spark.createDataFrame(
        rows, "file string, pos long, row_idx int, conv_id string, "
        "turn_idx int, op string, after_kv string",
    )
    keys = ["conv_id", "turn_idx"]
    a = {tuple(r) for r in lww_latest(df, keys, ["op", "after_kv"]).collect()}
    b = {tuple(r) for r in lww_latest_packed(df, keys).collect()}
    assert a == b and len(a) > 0


def test_gtid_fence_multi_interval(spark):
    """A real executed-GTID set is interval-compressed with possibly
    many intervals ('uuid:1-5:7-9'); each interval must fence, the gaps
    must pass, and a lone number means THAT txn only (MySQL semantics,
    not 1..N)."""
    from mysql_tracker_spark.operators.parse import after_gtid_set

    import pytest

    uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    rows = [(f"bin.000001", 10 * t, 0, f"{uuid}:{t}") for t in range(1, 13)]
    rows.append(("bin.000001", 500, 0, None))  # DDL: no gtid, passes
    df = spark.createDataFrame(rows, "file string, pos long, row_idx int, gtid string")

    out = {r.gtid for r in after_gtid_set(df, f"{uuid}:1-5:7-9").collect()}
    assert out == {f"{uuid}:{t}" for t in (6, 10, 11, 12)} | {None}
    # lone number = that single transaction
    out2 = {r.gtid for r in after_gtid_set(df, f"{uuid}:3").collect()}
    assert f"{uuid}:3" not in out2 and f"{uuid}:2" in out2 and len(out2) == 12
    # mixed lone + range
    out3 = {r.gtid for r in after_gtid_set(df, f"{uuid}:2:10-12").collect()}
    assert out3 == {f"{uuid}:{t}" for t in (1, 3, 4, 5, 6, 7, 8, 9)} | {None}
    with pytest.raises(ValueError):
        after_gtid_set(df, "no-colon-anywhere")


def test_lww_packed_null_payload(spark):
    """A NULL payload must not poison the packed string: the true
    latest event wins even when its kv is NULL, and NULL round-trips
    (not decoded as '')."""
    from mysql_tracker_spark.operators.dedup import lww_latest, lww_latest_packed

    rows = [
        ("bin.000001", 10, 0, "c1", 0, "INSERT", "old"),
        ("bin.000001", 20, 0, "c1", 0, "DELETE", None),   # latest: NULL kv
        ("bin.000001", 10, 0, "c2", 0, "INSERT", None),
        ("bin.000001", 20, 0, "c2", 0, "UPDATE", "new"),  # latest: non-null
        ("bin.000001", 10, 0, "c3", 0, "INSERT", ""),     # empty != NULL
    ]
    df = spark.createDataFrame(
        rows, "file string, pos long, row_idx int, conv_id string, "
        "turn_idx int, op string, after_kv string",
    )
    keys = ["conv_id", "turn_idx"]
    got = {tuple(r) for r in lww_latest_packed(df, keys).collect()}
    want = {tuple(r) for r in lww_latest(df, keys, ["op", "after_kv"]).collect()}
    assert got == want == {
        ("c1", 0, "DELETE", None),
        ("c2", 0, "UPDATE", "new"),
        ("c3", 0, "INSERT", ""),
    }


def test_lww_packed_plan_has_map_side_partial_agg(spark):
    """The scale property of the packed formulation: a PARTIAL
    aggregate below the exchange (shuffle carries <=1 row per key per
    partition, hot keys collapse pre-shuffle) — the repartition+max_by
    plan shuffles every event with no partial agg."""
    from mysql_tracker_spark.operators.dedup import lww_latest_packed
    from mysql_tracker_spark.plans.checks import explain_str

    df = spark.createDataFrame(
        [("bin.000001", 4, 0, "c1", 1, "INSERT", "x")],
        "file string, pos long, row_idx int, conv_id string, turn_idx int, "
        "op string, after_kv string",
    )
    txt = explain_str(lww_latest_packed(df, ["conv_id", "turn_idx"]), "simple")
    assert "partial_max" in txt, txt
    # the exchange must sit ABOVE the partial aggregate
    assert txt.index("Exchange") < txt.index("partial_max"), txt
