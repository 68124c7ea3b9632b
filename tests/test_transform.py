"""Ingest transform hook (Debezium SMT analogue): applied per batch to
the post-LWW change set on BOTH apply paths, deterministic under
replay, schema-disciplined, and resolvable from a JSON config by
dotted path."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.config import JobConfig
from mysql_tracker_spark.lakestore import LakeTable
from mysql_tracker_spark.runner import CdcApplyJob
from mysql_tracker_spark.sources.binlog_gen import (
    GenConfig,
    expected_final_state,
    gen_change_events,
    write_batches,
)
from mysql_tracker_spark.sources.wire import write_wire_batches
from tests.conftest import normalize

CMP = ["conv_id", "turn_idx", "role", "text", "tool", "score"]
CFG = GenConfig(n_events=1500, n_conversations=60, seed=77)


def _upper_text(df):
    return df.withColumn("text", F.upper("text"))


@pytest.mark.parametrize("fmt", ["typed", "wire"])
def test_transform_applies_on_both_paths(spark, tmp_path, fmt):
    ev = gen_change_events(CFG)
    d = str(tmp_path / "in")
    if fmt == "wire":
        write_wire_batches(ev, d, n_batches=3)
    else:
        write_batches(ev, d, n_batches=3)
    job = CdcApplyJob(
        spark, d, str(tmp_path / "tbl"), n_buckets=8,
        source_format=fmt, transform=_upper_text,
    )
    job.run()
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    exp["text"] = exp["text"].str.upper()
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])


def test_transform_replay_converges(spark, tmp_path):
    """A deterministic transform keeps exactly-once convergence: a job
    killed mid-run and resumed lands on the same (transformed) state,
    and a full rerun is a fenced no-op."""
    ev = gen_change_events(CFG)
    d = str(tmp_path / "in")
    write_batches(ev, d, n_batches=3)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    CdcApplyJob(spark, d, p1, n_buckets=8, transform=_upper_text).run()
    CdcApplyJob(spark, d, p2, n_buckets=8, transform=_upper_text).run(max_batches=1)
    resumed = CdcApplyJob(spark, d, p2, n_buckets=8, transform=_upper_text)
    stats = resumed.run()
    assert stats[0].skipped
    a = normalize(LakeTable.load(p1).read(spark).toPandas())
    b = normalize(resumed.table.read(spark).toPandas())
    pd.testing.assert_frame_equal(a[CMP], b[CMP])
    again = CdcApplyJob(spark, d, p1, n_buckets=8, transform=_upper_text)
    assert all(s.skipped for s in again.run())


def test_transform_must_preserve_columns(spark, tmp_path):
    ev = gen_change_events(GenConfig(n_events=200, n_conversations=10, seed=3))
    d = str(tmp_path / "in")
    write_batches(ev, d, n_batches=1)
    job = CdcApplyJob(
        spark, d, str(tmp_path / "tbl"), n_buckets=4,
        transform=lambda df: df.drop("text"),
    )
    with pytest.raises(ValueError, match="preserve the change-set columns"):
        job.run()


def test_transform_dotted_path_from_config_redacts(spark, tmp_path):
    """JSON config carries the transform by dotted path; the bundled
    redact_text scrubs planted PII at ingest so it never lands in the
    table (checked against a pandas twin of the frozen patterns)."""
    from mysql_tracker_spark.functions.text import PII_PATTERNS

    ev = gen_change_events(GenConfig(n_events=800, n_conversations=30, seed=9))

    def plant(m):
        if isinstance(m, dict) and m.get("text"):
            m = dict(m)
            m["text"] += f" mail {m['conv_id']}@corp.io or 192.168.0.{int(m['turn_idx']) % 99}"
        return m

    ev = ev.copy()
    ev["after"] = ev["after"].map(plant, na_action="ignore")
    d = str(tmp_path / "in")
    write_batches(ev, d, n_batches=2)
    cfg = JobConfig(
        input_dir=d,
        table_path=str(tmp_path / "tbl"),
        n_buckets=4,
        transform="mysql_tracker_spark.transforms:redact_text",
    )
    cfg_path = str(tmp_path / "job.json")
    cfg.dump(cfg_path)
    job = CdcApplyJob.from_config(spark, JobConfig.load(cfg_path))
    job.run()
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    for pat, tok in PII_PATTERNS:
        exp["text"] = exp["text"].map(
            lambda s: None if s is None else re.sub(pat, tok, s)
        )
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])
    # nothing PII-shaped survived ingest
    assert not got["text"].str.contains("@corp.io", na=False).any()
    assert got["text"].str.contains("<EMAIL>", na=False).any()


def test_resolve_transform_rejects_bad_specs():
    from mysql_tracker_spark.runner import _resolve_transform

    assert _resolve_transform(None) is None
    assert _resolve_transform(_upper_text) is _upper_text
    with pytest.raises(ValueError, match="callable or"):
        _resolve_transform("no-colon-here")
    with pytest.raises(ValueError, match="non-callable"):
        _resolve_transform("mysql_tracker_spark.functions.text:PII_PATTERNS")
