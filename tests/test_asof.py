"""As-of join: semantics (inclusive/strict/tolerance/ties), the
window-path vs binned-path equivalence, and the plan shapes each path
promises (single key shuffle; no cartesian/broadcast-nested-loop; zero
Python stages; binned groupBy reuses the join's clustering)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.operators.asof import asof_join, asof_join_binned
from mysql_tracker_spark.plans.checks import explain_str, python_stage_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # (key, lid, ts)
            ("a", 1, _ts("2026-01-01 10:00:00")),
            ("a", 2, _ts("2026-01-01 11:30:00")),
            ("a", 3, _ts("2026-01-01 09:00:00")),  # before any right row
            ("b", 4, _ts("2026-01-01 10:00:00")),
            ("c", 5, _ts("2026-01-01 10:00:00")),  # key with no right rows
        ],
        "key string, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # (key, rid, ts, state)
            ("a", 10, _ts("2026-01-01 09:30:00"), "s1"),
            ("a", 11, _ts("2026-01-01 10:00:00"), "s2"),  # ties left lid=1
            ("a", 12, _ts("2026-01-01 10:00:00"), "s3"),  # same ts, higher rid
            ("a", 13, _ts("2026-01-01 11:00:00"), "s4"),
            ("b", 14, _ts("2026-01-01 08:00:00"), "s5"),
        ],
        "key string, rid int, ts timestamp, state string",
    )
    return left, right


RCOLS = {"match_rid": "rid", "match_state": "state", "match_ts": "ts"}


def _collect(df):
    rows = df.select("key", "lid", "match_rid", "match_state").collect()
    return {(r.key, r.lid): (r.match_rid, r.match_state) for r in rows}


def test_inclusive_semantics_and_ties(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, ["key"], "ts", "ts", RCOLS, tie_cols=("rid",), inclusive=True
    )
    got = _collect(out)
    assert got[("a", 1)] == (12, "s3")  # equal-ts match; max rid wins the tie
    assert got[("a", 2)] == (13, "s4")  # latest at-or-before 11:30
    assert got[("a", 3)] == (None, None)  # nothing at-or-before 09:00
    assert got[("b", 4)] == (14, "s5")
    assert got[("c", 5)] == (None, None)  # unmatched key kept (left-outer)
    assert out.count() == left.count()


def test_strict_semantics(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, ["key"], "ts", "ts", RCOLS, tie_cols=("rid",), inclusive=False
    )
    got = _collect(out)
    assert got[("a", 1)] == (10, "s1")  # equal-ts rows excluded under strict


def test_window_tolerance_nulls_out_stale_match(spark, frames):
    left, right = frames
    out = asof_join(
        left,
        right,
        ["key"],
        "ts",
        "ts",
        RCOLS,
        tie_cols=("rid",),
        tolerance_s=3600.0,
    )
    got = _collect(out)
    assert got[("b", 4)] == (None, None)  # s5 is 2h old, outside 1h tolerance
    assert got[("a", 2)] == (13, "s4")  # 30min old, inside


def test_binned_equals_window_path(spark, frames):
    left, right = frames
    for inclusive in (True, False):
        w = asof_join(
            left,
            right,
            ["key"],
            "ts",
            "ts",
            RCOLS,
            tie_cols=("rid",),
            inclusive=inclusive,
            tolerance_s=3600.0,
        )
        b = asof_join_binned(
            left,
            right,
            ["key"],
            "ts",
            "ts",
            RCOLS,
            left_id=["lid"],
            tolerance_s=3600.0,
            tie_cols=("rid",),
            inclusive=inclusive,
        )
        assert _collect(w) == _collect(b)
        assert b.count() == left.count()


def test_binned_equals_window_on_random_data(spark):
    """Property check on a dense random-ish corpus: many boundary
    collisions, multiple keys, duplicates at equal timestamps."""
    left = (
        spark.range(400)
        .select(
            (F.col("id") % 7).cast("string").alias("key"),
            F.col("id").alias("lid"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 137) % 5000
            ).alias("ts"),
        )
    )
    right = (
        spark.range(300)
        .select(
            (F.col("id") % 7).cast("string").alias("key"),
            F.col("id").alias("rid"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 211) % 5000
            ).alias("ts"),
            F.concat(F.lit("v"), F.col("id")).alias("state"),
        )
    )
    w = asof_join(
        left, right, ["key"], "ts", "ts", RCOLS, tie_cols=("rid",), tolerance_s=900.0
    )
    b = asof_join_binned(
        left,
        right,
        ["key"],
        "ts",
        "ts",
        RCOLS,
        left_id=["lid"],
        tolerance_s=900.0,
        tie_cols=("rid",),
    )
    assert _collect(w) == _collect(b)


def test_plan_shapes(spark, frames):
    left, right = frames
    w = asof_join(left, right, ["key"], "ts", "ts", RCOLS, tie_cols=("rid",))
    wtxt = explain_str(w, mode="simple")
    assert python_stage_count(w) == 0
    assert "CartesianProduct" not in wtxt
    assert "BroadcastNestedLoopJoin" not in wtxt
    # exactly one exchange: the key hash-partitioning for the window
    assert wtxt.count("Exchange hashpartitioning") == 1

    b = asof_join_binned(
        left,
        right,
        ["key"],
        "ts",
        "ts",
        RCOLS,
        left_id=["lid"],
        tolerance_s=3600.0,
        tie_cols=("rid",),
    )
    btxt = explain_str(b, mode="simple")
    assert python_stage_count(b) == 0
    assert "CartesianProduct" not in btxt
    assert "Window" not in btxt  # no per-key window -> no hot-key funnel
    # the post-join groupBy reuses the join's (key, bin) clustering:
    # only the two join-input exchanges, none between join and agg
    assert btxt.count("Exchange hashpartitioning") <= 2


def test_asof_composite_key(spark):
    """Multi-column key: matches respect BOTH key columns."""
    left = spark.createDataFrame(
        [("a", "x", 1, _ts("2026-01-01 10:00:00")),
         ("a", "y", 2, _ts("2026-01-01 10:00:00"))],
        "k1 string, k2 string, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", "x", 10, _ts("2026-01-01 09:00:00"), "sx"),
         ("a", "y", 11, _ts("2026-01-01 09:30:00"), "sy")],
        "k1 string, k2 string, rid int, ts timestamp, state string",
    )
    for out in (
        asof_join(left, right, ["k1", "k2"], "ts", "ts", RCOLS, tie_cols=("rid",)),
        asof_join_binned(
            left, right, ["k1", "k2"], "ts", "ts", RCOLS,
            left_id=["lid"], tolerance_s=7200.0, tie_cols=("rid",),
        ),
    ):
        got = {(r.k1, r.k2): (r.match_rid, r.match_state) for r in out.collect()}
        assert got == {("a", "x"): (10, "sx"), ("a", "y"): (11, "sy")}
