"""Mid-stream RENAME COLUMN through the full apply (D6/D7 + Iceberg
rename-column analogue): the DDL commits a metadata-only rename, old
data files map through the rename chain on read, and same-batch events
emitted BEFORE the rename (whose row images still carry the old key)
are extracted via the alias coalesce."""

import datetime as dt

import pandas as pd
import pytest

from mysql_tracker_spark.runner import CdcApplyJob
from mysql_tracker_spark.sources.binlog_gen import write_batches

TS = "2025-01-01 00:00:%02d"


def _ev(i, op, conv, turn, is_ddl=False, ddl=None, before=None, after=None):
    return {
        "file": "bin.000001",
        "pos": 4 + i * 100,
        "row_idx": 0,
        "server_id": 1,
        "ts": pd.Timestamp(dt.datetime(2025, 1, 1, 0, 0, i)),
        "xid": i + 1,
        "gtid": f"uuid:{i + 1}",
        "op": op,
        "schema_name": "chat",
        "table_name": "transcripts",
        "is_ddl": is_ddl,
        "ddl_sql": ddl,
        "before": before,
        "after": after,
    }


def _row(conv, turn, text, tool_key, tool_val, i):
    return {
        "conv_id": conv,
        "turn_idx": str(turn),
        "role": "user",
        "text": text,
        tool_key: tool_val,
        "ts": TS % i,
    }


def _stream():
    evs = [
        _ev(0, "INSERT", "a", 1, after=_row("a", 1, "t1", "tool", "search", 0)),
        _ev(1, "INSERT", "a", 2, after=_row("a", 2, "t2", "tool", "", 1)),
        # same-batch DML BEFORE the rename: still carries the OLD key
        _ev(2, "UPDATE", "a", 1, before=_row("a", 1, "t1", "tool", "search", 0),
            after=_row("a", 1, "t1b", "tool", "search2", 2)),
        _ev(3, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts RENAME COLUMN tool TO tool_name"),
        # post-rename events carry the NEW key
        _ev(4, "INSERT", "b", 1, after=_row("b", 1, "t3", "tool_name", "calc", 4)),
        _ev(5, "UPDATE", "a", 2, before=_row("a", 2, "t2", "tool_name", "", 1),
            after=_row("a", 2, "t2b", "tool_name", "calc2", 5)),
    ]
    return pd.DataFrame(evs)


def test_rename_column_mid_stream_applies(spark, tmp_path):
    write_batches(_stream(), str(tmp_path / "in"), n_batches=2)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4)
    job.run()
    cols = [f.name for f in job.table.schema().fields]
    assert cols == ["conv_id", "turn_idx", "role", "text", "tool_name", "ts"]
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["tool_name"])
        for r in job.table.read(spark).collect()
    }
    assert got == {
        ("a", 1): ("t1b", "search2"),  # pre-rename event, old key in map
        ("a", 2): ("t2b", "calc2"),
        ("b", 1): ("t3", "calc"),
    }
    assert job.table.column_aliases() == {"tool_name": ["tool"]}
    # replay is a no-op (rename DDL is idempotent under the guard)
    stats = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4).run()
    assert all(s.skipped for s in stats)
    got2 = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["tool_name"])
        for r in job.table.read(spark).collect()
    }
    assert got2 == got


def test_rename_key_column_raises_by_default(spark, tmp_path):
    evs = pd.DataFrame([
        _ev(0, "INSERT", "a", 1, after=_row("a", 1, "t1", "tool", "x", 0)),
        _ev(1, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts RENAME COLUMN conv_id TO cid"),
    ])
    write_batches(evs, str(tmp_path / "in"), n_batches=1)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(RuntimeError, match="key column"):
        job.run()
    # ignore policy skips it, reference-style
    job2 = CdcApplyJob(
        spark, str(tmp_path / "in"), str(tmp_path / "t2"), n_buckets=4,
        on_destructive_ddl="ignore",
    )
    job2.run()
    assert [f.name for f in job2.table.schema().fields][0] == "conv_id"


def test_change_column_syntax_renames_and_widens():
    from pyspark.sql import types as T

    from mysql_tracker_spark.ddl import parse_ddl

    p = parse_ddl("ALTER TABLE chat.transcripts RENAME COLUMN tool TO tool_name")
    assert (p.kind, p.column, p.new_name) == ("RENAME_COLUMN", "tool", "tool_name")
    p = parse_ddl("ALTER TABLE chat.t CHANGE COLUMN score rating BIGINT")
    assert (p.kind, p.column, p.new_name) == ("RENAME_COLUMN", "score", "rating")
    assert p.new_type == T.LongType()
    p = parse_ddl("ALTER TABLE chat.t CHANGE score score BIGINT")
    assert (p.kind, p.column) == ("WIDEN", "score")
    # the destructive TABLE rename stays classified as RENAME
    p = parse_ddl("ALTER TABLE chat.t RENAME TO chat.t2")
    assert p.kind == "RENAME"


def test_drop_column_mid_stream_applies(spark, tmp_path):
    """ALTER TABLE .. DROP COLUMN mid-stream: metadata-only removal —
    subsequent reads stop selecting the column, old file bytes stay,
    pre-drop snapshots still expose it (time travel)."""
    evs = pd.DataFrame([
        _ev(0, "INSERT", "a", 1, after=_row("a", 1, "t1", "tool", "search", 0)),
        _ev(1, "INSERT", "b", 1, after=_row("b", 1, "t2", "tool", "calc", 1)),
        _ev(2, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts DROP COLUMN tool"),
        _ev(3, "UPDATE", "a", 1, before=_row("a", 1, "t1", "tool", "search", 0),
            after={"conv_id": "a", "turn_idx": "1", "role": "user",
                   "text": "t1b", "ts": TS % 3}),
    ])
    write_batches(evs, str(tmp_path / "in"), n_batches=2)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4)
    job.run()
    cols = [f.name for f in job.table.schema().fields]
    assert cols == ["conv_id", "turn_idx", "role", "text", "ts"]
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in job.table.read(spark).collect()}
    assert got == {("a", 1): "t1b", ("b", 1): "t2"}
    # pre-drop snapshot still exposes the column with its data
    pre = next(
        v for v in range(1, job.table.current_version() + 1)
        if "tool" in {f.name for f in job.table.schema(version=v).fields}
        and job.table.manifest(v)["summary"]["operation"] in ("merge", "merge-mor")
    )
    old = {(r["conv_id"], r["turn_idx"]): r["tool"]
           for r in job.table.read(spark, version=pre).collect()}
    assert old == {("a", 1): "search", ("b", 1): "calc"}
    # replay converges (drop is idempotent)
    stats = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4).run()
    assert all(s.skipped for s in stats)


def test_drop_key_column_raises_and_drop_index_is_other():
    from mysql_tracker_spark.ddl import parse_ddl

    p = parse_ddl("ALTER TABLE chat.t DROP COLUMN tool")
    assert (p.kind, p.column) == ("DROP_COLUMN", "tool")
    p = parse_ddl("ALTER TABLE chat.t DROP tool")
    assert (p.kind, p.column) == ("DROP_COLUMN", "tool")
    # index/key/constraint drops are NOT column drops
    for sql in (
        "ALTER TABLE chat.t DROP INDEX i1",
        "ALTER TABLE chat.t DROP PRIMARY KEY",
        "ALTER TABLE chat.t DROP FOREIGN KEY fk1",
        "ALTER TABLE chat.t DROP PARTITION p0",
    ):
        assert parse_ddl(sql).kind != "DROP_COLUMN", sql
    # DROP TABLE still classifies as DROP
    assert parse_ddl("DROP TABLE chat.t").kind == "DROP"


def test_drop_then_readd_does_not_resurrect_old_bytes(spark, tmp_path):
    """Field-identity hole (Iceberg closes it with field ids, we close
    it with the schema-continuity check): DROP COLUMN tool then ADD
    COLUMN tool — unrewritten old files still hold the old bytes, but
    the re-added column is a NEW identity and must read NULL there."""
    evs = pd.DataFrame([
        _ev(0, "INSERT", "a", 1, after=_row("a", 1, "t1", "tool", "search", 0)),
        _ev(1, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts DROP COLUMN tool"),
        _ev(2, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts ADD COLUMN tool TEXT"),
        _ev(3, "INSERT", "b", 1, after=_row("b", 1, "t2", "tool", "calc", 3)),
    ])
    write_batches(evs, str(tmp_path / "in"), n_batches=2)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4)
    job.run()
    got = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in job.table.read(spark).collect()}
    # ("a",1) was written BEFORE the drop: its old 'tool' bytes must NOT
    # leak into the re-added column
    assert got == {("a", 1): None, ("b", 1): "calc"}


def test_rename_then_readd_old_name_keeps_identities_apart(spark, tmp_path):
    """RENAME tool->tool_name then ADD tool: old files' bytes feed ONLY
    tool_name (via the rename chain); the re-added 'tool' reads NULL
    there, and the alias chain must NOT coalesce new-tool values into
    tool_name."""
    evs = pd.DataFrame([
        _ev(0, "INSERT", "a", 1, after=_row("a", 1, "t1", "tool", "search", 0)),
        _ev(1, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts RENAME COLUMN tool TO tool_name"),
        _ev(2, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts ADD COLUMN tool TEXT"),
        # new event carrying ONLY the re-added tool (no tool_name)
        _ev(3, "INSERT", "b", 1, after={
            "conv_id": "b", "turn_idx": "1", "role": "user", "text": "t2",
            "tool": "newtool", "ts": TS % 3}),
    ])
    write_batches(evs, str(tmp_path / "in"), n_batches=2)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4)
    job.run()
    # alias chain for tool_name must stop at the reused name
    assert "tool_name" not in job.table.column_aliases() or \
        "tool" not in job.table.column_aliases().get("tool_name", [])
    got = {(r["conv_id"], r["turn_idx"]): (r["tool_name"], r["tool"])
           for r in job.table.read(spark).collect()}
    assert got == {
        ("a", 1): ("search", None),   # old bytes feed tool_name only
        ("b", 1): (None, "newtool"),  # new tool stays its own identity
    }


def test_multi_clause_alter_applies_every_clause(spark, tmp_path):
    evs = pd.DataFrame([
        _ev(0, "INSERT", "a", 1, after=_row("a", 1, "t1", "tool", "search", 0)),
        _ev(1, "ALTER", None, None, is_ddl=True,
            ddl="ALTER TABLE chat.transcripts DROP COLUMN tool, "
                "RENAME COLUMN role TO speaker, ADD COLUMN score INT"),
        _ev(2, "INSERT", "b", 1, after={
            "conv_id": "b", "turn_idx": "1", "speaker": "assistant",
            "text": "t2", "score": "7", "ts": TS % 2}),
    ])
    write_batches(evs, str(tmp_path / "in"), n_batches=1)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=4)
    job.run()
    cols = [f.name for f in job.table.schema().fields]
    assert cols == ["conv_id", "turn_idx", "speaker", "text", "ts", "score"]
    got = {(r["conv_id"], r["turn_idx"]): (r["speaker"], r["score"])
           for r in job.table.read(spark).collect()}
    assert got == {("a", 1): ("user", None), ("b", 1): ("assistant", 7)}


def test_parse_ddl_clauses_multi():
    from pyspark.sql import types as T

    from mysql_tracker_spark.ddl import parse_ddl_clauses

    rs = parse_ddl_clauses(
        "ALTER TABLE chat.t DROP COLUMN a, ADD COLUMN b BIGINT, "
        "CHANGE COLUMN c d INT, MODIFY e DOUBLE", "chat")
    assert [(r.kind, r.column) for r in rs] == [
        ("DROP_COLUMN", "a"), ("ADD_COLUMN", "b"),
        ("RENAME_COLUMN", "c"), ("WIDEN", "e"),
    ]
    assert rs[1].new_type == T.LongType() and rs[2].new_name == "d"
    # single clause falls back to parse_ddl exactly
    rs = parse_ddl_clauses("ALTER TABLE chat.t ADD COLUMN x INT", "chat")
    assert len(rs) == 1 and rs[0].kind == "ADD_COLUMN"
    # non-ALTER statements pass through
    rs = parse_ddl_clauses("TRUNCATE TABLE chat.t", "chat")
    assert len(rs) == 1 and rs[0].kind == "TRUNCATE"


def test_auto_compaction_survives_renamed_sort_column(spark, tmp_path):
    """compact_sort_by='ts' stays effective after the stream renames ts
    (resolved through the alias chain) and degrades to unclustered —
    never crashing the apply loop — if the column disappears."""
    evs = pd.DataFrame(
        [_ev(i, "INSERT", "a", i + 1,
             after=_row("a", i + 1, f"t{i}", "tool", "x", i)) for i in range(4)]
        + [_ev(4, "ALTER", None, None, is_ddl=True,
               ddl="ALTER TABLE chat.transcripts RENAME COLUMN ts TO event_ts")]
        + [_ev(5 + i, "INSERT", "b", i + 1, after={
            "conv_id": "b", "turn_idx": str(i + 1), "role": "user",
            "text": f"u{i}", "event_ts": TS % (5 + i)}) for i in range(3)]
    )
    write_batches(evs, str(tmp_path / "in"), n_batches=3)
    job = CdcApplyJob(
        spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=2,
        write_mode="mor", mor_compact_threshold=1,
        compact_sort_by="ts", compact_files_per_bucket=2,
    )
    stats = job.run()
    assert any(s.compacted_buckets for s in stats)
    # post-rename compaction clustered on the RESOLVED name
    compacts = [
        job.table.manifest(v)["summary"]
        for v in range(2, job.table.current_version() + 1)
        if job.table.manifest(v)["summary"]["operation"] == "compact"
    ]
    assert compacts[-1]["sort_by"] == "event_ts"
    got = {(r["conv_id"], r["turn_idx"]) for r in job.table.read(spark).collect()}
    assert got == {("a", i + 1) for i in range(4)} | {("b", i + 1) for i in range(3)}
