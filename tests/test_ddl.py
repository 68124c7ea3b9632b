"""DDL regex classification + schema evolution legality (SURVEY §2.2 D6)."""

from pyspark.sql import types as T

from mysql_tracker_spark.ddl import evolve_schema, parse_ddl

BASE = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("score", T.IntegerType()),
    ]
)


def test_parse_add_column():
    r = parse_ddl("ALTER TABLE chat.transcripts ADD COLUMN score INT")
    assert (r.kind, r.schema_name, r.table_name, r.column) == (
        "ADD_COLUMN", "chat", "transcripts", "score",
    )
    assert isinstance(r.new_type, T.IntegerType)


def test_parse_backticks_and_no_schema():
    r = parse_ddl("alter table `transcripts` add `tool_version` varchar(64)", "chat")
    assert r.kind == "ADD_COLUMN" and r.schema_name == "chat" and r.column == "tool_version"
    assert isinstance(r.new_type, T.StringType)


def test_parse_modify_widen():
    r = parse_ddl("ALTER TABLE chat.transcripts MODIFY COLUMN score BIGINT")
    assert r.kind == "WIDEN" and isinstance(r.new_type, T.LongType)


def test_parse_comment_prefix_classifies():
    r = parse_ddl("/* app */ TRUNCATE TABLE chat.transcripts")
    assert r.kind == "OTHER"


def test_parse_decimal():
    r = parse_ddl("ALTER TABLE t ADD COLUMN price DECIMAL(12,2)")
    assert r.new_type == T.DecimalType(12, 2)


def test_evolve_add_is_idempotent():
    add = parse_ddl("ALTER TABLE chat.transcripts ADD COLUMN score INT")
    assert evolve_schema(BASE, add) is None  # already present -> no-op (replay)


def test_evolve_widen_ok_narrow_rejected():
    widen = parse_ddl("ALTER TABLE c.t MODIFY score BIGINT")
    s2 = evolve_schema(BASE, widen)
    assert isinstance(s2["score"].dataType, T.LongType)
    narrow = parse_ddl("ALTER TABLE c.t MODIFY score TINYINT")
    assert evolve_schema(BASE, narrow) is None
