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
