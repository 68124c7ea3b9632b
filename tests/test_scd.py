"""SCD2 history semantics: interval chaining, delete-closes-version,
reinsert-after-delete, version numbering stability, plan shape."""

import datetime as dt

from mysql_tracker_spark.operators.scd import scd2_history
from mysql_tracker_spark.plans.checks import explain_str, python_stage_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _history(spark, rows):
    df = spark.createDataFrame(
        rows, "k string, seq int, ts timestamp, op string, val string"
    )
    out = scd2_history(
        df, key_cols=["k"], order_cols=["seq"], ts_col="ts", op_col="op"
    )
    return {
        (r.k, r.version): (r.val, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in out.collect()
    }


def test_update_chain_and_current(spark):
    got = _history(
        spark,
        [
            ("a", 1, _ts("2026-01-01 10:00:00"), "I", "v1"),
            ("a", 2, _ts("2026-01-01 11:00:00"), "U", "v2"),
            ("b", 1, _ts("2026-01-01 10:30:00"), "I", "w1"),
        ],
    )
    assert got[("a", 1)] == ("v1", "2026-01-01 10:00:00", "2026-01-01 11:00:00", False)
    assert got[("a", 2)] == ("v2", "2026-01-01 11:00:00", "None", True)
    assert got[("b", 1)] == ("w1", "2026-01-01 10:30:00", "None", True)


def test_delete_closes_version_no_current(spark):
    got = _history(
        spark,
        [
            ("a", 1, _ts("2026-01-01 10:00:00"), "I", "v1"),
            ("a", 2, _ts("2026-01-01 12:00:00"), "D", None),
        ],
    )
    # delete emits no row but its ts closes the predecessor
    assert got == {
        ("a", 1): ("v1", "2026-01-01 10:00:00", "2026-01-01 12:00:00", False)
    }


def test_reinsert_after_delete_opens_new_version(spark):
    got = _history(
        spark,
        [
            ("a", 1, _ts("2026-01-01 10:00:00"), "I", "v1"),
            ("a", 2, _ts("2026-01-01 12:00:00"), "D", None),
            ("a", 3, _ts("2026-01-01 13:00:00"), "I", "v3"),
        ],
    )
    # version numbers count the delete too -> replay-stable numbering
    assert got[("a", 1)][1:3] == ("2026-01-01 10:00:00", "2026-01-01 12:00:00")
    assert got[("a", 3)] == ("v3", "2026-01-01 13:00:00", "None", True)
    assert set(got) == {("a", 1), ("a", 3)}


def test_plan_single_exchange_no_python(spark):
    df = spark.createDataFrame(
        [("a", 1, _ts("2026-01-01 10:00:00"), "I", "v1")],
        "k string, seq int, ts timestamp, op string, val string",
    )
    out = scd2_history(df, ["k"], ["seq"])
    txt = explain_str(out, mode="simple")
    assert python_stage_count(out) == 0
    assert txt.count("Exchange hashpartitioning") == 1
    assert txt.count("Sort ") <= 1  # row_number and lead share one sort


def test_scd2_over_eventlog_current_equals_merge_table(spark, tmp_path):
    """Two-pipeline composition: the append-only event log (dense seq)
    folded through SCD2 must agree with the MERGE-applied table — the
    is_current slice of the history IS the table state, key by key."""
    from pyspark.sql import functions as F

    from mysql_tracker_spark.eventlog import EventLogJob
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=2500, n_conversations=80, seed=41))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)

    log = EventLogJob(spark, in_dir, str(tmp_path / "log"))
    log.run()
    apply_job = CdcApplyJob(spark, in_dir, str(tmp_path / "tbl"), n_buckets=4)
    apply_job.run()

    changes = (
        log.read()
        .filter(
            F.col("op").isin("INSERT", "UPDATE", "DELETE")
            & (F.col("schema_name") == "chat")
            & (F.col("table_name") == "transcripts")
        )
        .select(
            F.element_at("after", "conv_id").alias("conv_id"),
            F.element_at("after", "turn_idx").cast("int").alias("turn_idx"),
            "seq",
            F.col("ts").cast("timestamp").alias("ts"),
            "op",
            F.element_at("after", "text").alias("text"),
        )
    )
    hist = scd2_history(
        changes,
        key_cols=["conv_id", "turn_idx"],
        order_cols=["seq"],
        ts_col="ts",
        delete_op="DELETE",
        attr_cols=["text"],
    )
    current = {
        (r.conv_id, r.turn_idx): r.text
        for r in hist.filter("is_current").collect()
    }
    table = {
        (r.conv_id, r.turn_idx): r.text
        for r in apply_job.table.read(spark).collect()
    }
    assert current == table and len(table) > 0
