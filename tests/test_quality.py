"""Data-quality expectations: per-kind violation counting, single-pass
row-level plan, unique-key counting, and the blocking gate."""

import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.plans.checks import explain_str, python_stage_count
from mysql_tracker_spark.quality import (
    enforce,
    in_range,
    in_set,
    not_null,
    predicate,
    run_expectations,
    unique,
)

ROWS = [
    ("a", 0, "user", 1.0),
    ("a", 0, "user", 2.0),  # duplicate key (a, 0)
    ("a", 1, None, 3.0),  # null role
    ("b", 0, "alien", -1.0),  # bad role, negative value
    ("b", 1, "assistant", None),  # null value
]
SCHEMA = "conv_id string, turn_idx int, role string, value double"

def _expects():  # F.col needs an active session -> build lazily
    return [
        not_null("role_not_null", "role"),
        in_set("role_known", "role", ["user", "assistant", "system", "tool"]),
        in_range("value_nonneg", "value", lo=0.0),
        predicate("conv_before_b", F.col("conv_id") < "b"),
        unique("key_unique", ["conv_id", "turn_idx"]),
    ]


def _res(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        r.name: (r.violations, r.passed)
        for r in run_expectations(df, _expects()).collect()
    }


def test_violation_counts_per_kind(spark):
    got = _res(spark)
    assert got["role_not_null"] == (1, False)
    assert got["role_known"] == (2, False)  # 'alien' + the NULL
    assert got["value_nonneg"] == (2, False)  # -1.0 + the NULL
    assert got["conv_before_b"] == (2, False)  # both 'b' rows
    assert got["key_unique"] == (1, False)  # one extra copy of (a, 0)


def test_all_pass_on_clean_data(spark):
    df = spark.createDataFrame(ROWS[:1], SCHEMA)
    res = run_expectations(df, _expects()).collect()
    assert all(r.passed and r.violations == 0 for r in res)
    assert [r.ord for r in sorted(res, key=lambda r: r.ord)] == [0, 1, 2, 3, 4]


def test_row_level_checks_share_one_pass(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    row_only = [e for e in _expects() if e.kind != "unique"]
    plan = explain_str(run_expectations(df, row_only), mode="simple")
    assert python_stage_count(run_expectations(df, row_only)) == 0
    # one aggregation over one scan: no join, no union of scans
    assert plan.count("LocalTableScan") + plan.count("Scan ") <= 1


def test_enforce_raises_only_on_blocking(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    soft = run_expectations(df, _expects())  # no gate: fine
    assert soft.count() == 5
    gated = [
        not_null("role_not_null", "role", blocking=True),
        in_range("value_nonneg", "value", lo=0.0),
    ]
    with pytest.raises(ValueError, match="role_not_null=1"):
        enforce(df, gated)
    # blocking but clean -> returns results
    ok = enforce(df.filter(F.col("role").isNotNull()), gated)
    assert {r.name for r in ok.collect()} == {"role_not_null", "value_nonneg"}


def test_engine_gate_blocks_before_publish(spark, tmp_path):
    """Write-audit-publish in the apply loop: a blocking expectation
    failure leaves table AND watermark untouched (the batch replays
    after the fix); with a passing gate the apply completes and
    matches the oracle."""
    import pandas as pd

    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
        write_batches,
    )
    from tests.conftest import normalize

    ev = gen_change_events(GenConfig(n_events=1500, n_conversations=60, seed=9))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=2)

    # impossible predicate -> every upsert row violates -> batch blocked
    bad = CdcApplyJob(
        spark, in_dir, str(tmp_path / "tbl"), n_buckets=4,
        expectations=[predicate("never", F.length("text") < 0, blocking=True)],
    )
    with pytest.raises(ValueError, match="never="):
        bad.run()
    v_blocked = bad.table.current_version()
    assert bad.table.read(spark).count() == 0  # nothing published
    assert bad.watermark()[0] is None  # watermark never moved

    # same table dir, passing gate -> full apply, oracle equality
    good = CdcApplyJob(
        spark, in_dir, str(tmp_path / "tbl"), n_buckets=4,
        expectations=[not_null("text_not_null", "text", blocking=True)],
    )
    good.run()
    assert good.table.current_version() > (v_blocked or 0)
    got = normalize(good.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_expectation_counts_land_in_lineage(spark, tmp_path):
    """Non-blocking expectations are a metric stream: per-batch
    violation counts ride in ApplyStats and the lineage JSONL."""
    import json as _json
    import os as _os

    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    ev = gen_change_events(GenConfig(n_events=1200, n_conversations=50, seed=13))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=2)
    tbl = str(tmp_path / "tbl")
    job = CdcApplyJob(
        spark, in_dir, tbl, n_buckets=4,
        expectations=[
            not_null("text_not_null", "text"),          # passes
            predicate("never", F.length("text") < 0),   # all rows violate (non-blocking)
        ],
    )
    stats = job.run()
    applied = [s for s in stats if not s.skipped]
    assert applied
    for s in applied:
        assert s.expectation_violations["text_not_null"] == 0
        assert s.expectation_violations["never"] > 0
    recs = [
        _json.loads(line)
        for line in open(_os.path.join(tbl, "lineage.jsonl"))
    ]
    assert all("expectation_violations" in r for r in recs)
    assert any(r["expectation_violations"]["never"] > 0 for r in recs)


def test_from_spec_declarative_gates(spark, tmp_path):
    """JSON-able expectation specs (config.py -> quality.from_spec):
    every kind maps to its constructor, `sql` compiles a PASS
    expression, and a JobConfig carrying table_expectations drives the
    write-audit-publish gate end-to-end."""
    import pandas as pd

    from mysql_tracker_spark.config import JobConfig
    from mysql_tracker_spark.quality import from_spec, from_specs
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
        write_batches,
    )
    from tests.conftest import normalize

    e = from_spec({"name": "n", "kind": "not_null", "col": "x", "blocking": True})
    assert (e.kind, e.cols, e.blocking) == ("not_null", ("x",), True)
    e = from_spec({"name": "s", "kind": "in_set", "col": "x", "values": ["a"]})
    assert e.values == ("a",) and not e.blocking
    e = from_spec({"name": "r", "kind": "range", "col": "x", "lo": 0})
    assert e.lo == 0 and e.hi is None
    e = from_spec({"name": "u", "kind": "unique", "cols": ["a", "b"]})
    assert e.cols == ("a", "b")
    e = from_spec({"name": "q", "kind": "sql", "expr": "length(text) >= 0"})
    assert e.kind == "predicate"
    with pytest.raises(ValueError, match="unknown expectation kind"):
        from_spec({"name": "z", "kind": "nope"})
    assert from_specs(None) == []

    # declarative specs through JobConfig drive both gates
    ev = gen_change_events(GenConfig(n_events=1200, n_conversations=50, seed=41))
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=2)
    cfg = JobConfig(
        input_dir=in_dir,
        table_path=str(tmp_path / "tbl"),
        n_buckets=4,
        expectations=[
            {"name": "text_not_null", "kind": "not_null", "col": "text",
             "blocking": True},
        ],
        table_expectations=[
            {"name": "pk_unique", "kind": "unique",
             "cols": ["conv_id", "turn_idx"], "blocking": True},
            {"name": "turns_nonneg", "kind": "sql",
             "expr": "turn_idx >= 0", "blocking": True},
        ],
    )
    # the config round-trips through JSON (spark-submit contract)
    cfg_path = str(tmp_path / "job.json")
    cfg.dump(cfg_path)
    job = CdcApplyJob.from_config(spark, JobConfig.load(cfg_path))
    stats = [s for s in job.run() if not s.skipped]
    assert all(
        s.table_audit == {"pk_unique": 0, "turns_nonneg": 0} for s in stats
    )
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
    pd.testing.assert_frame_equal(got[cols], exp[cols])
