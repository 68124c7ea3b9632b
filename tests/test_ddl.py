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
    # reference removeComment strips /* */ BEFORE classification
    # (SimpleDdlParser.java:37)
    r = parse_ddl("/* app */ TRUNCATE TABLE chat.transcripts")
    assert r.kind == "TRUNCATE" and r.table_name == "transcripts"


def test_parse_full_event_class_vocabulary():
    # SimpleDdlParser.java:13-33 pattern surface
    r = parse_ddl("TRUNCATE TABLE chat.transcripts")
    assert r.kind == "TRUNCATE" and (r.schema_name, r.table_name) == ("chat", "transcripts")
    r = parse_ddl("TRUNCATE transcripts", "chat")
    assert r.kind == "TRUNCATE" and (r.schema_name, r.table_name) == ("chat", "transcripts")
    r = parse_ddl("DROP TABLE IF EXISTS chat.transcripts")
    assert r.kind == "DROP" and r.table_name == "transcripts"
    r = parse_ddl("CREATE TABLE chat.new_t (id INT)")
    assert r.kind == "CREATE" and r.table_name == "new_t"
    r = parse_ddl("RENAME TABLE chat.transcripts TO chat.transcripts_old")
    assert r.kind == "RENAME" and r.table_name == "transcripts"
    assert r.rename_to == ("chat", "transcripts_old")
    r = parse_ddl("ALTER TABLE chat.transcripts RENAME TO chat.t2")
    assert r.kind == "RENAME" and r.rename_to == ("chat", "t2")
    r = parse_ddl("ALTER TABLE chat.transcripts RENAME chat.t3")
    assert r.kind == "RENAME" and r.rename_to == ("chat", "t3")
    # benign in-table renames are NOT a destructive table RENAME — they
    # must not halt the apply job under on_destructive_ddl='raise'.
    # RENAME COLUMN is first-class evolution (applied as a metadata
    # rename, tests/test_rename_column.py); INDEX/KEY renames are OTHER
    r = parse_ddl("ALTER TABLE chat.transcripts RENAME COLUMN a TO b")
    assert (r.kind, r.column, r.new_name) == ("RENAME_COLUMN", "a", "b")
    for sql in (
        "ALTER TABLE chat.transcripts RENAME INDEX i1 TO i2",
        "ALTER TABLE chat.transcripts RENAME KEY k1 TO k2",
    ):
        assert parse_ddl(sql).kind == "OTHER", sql
    r = parse_ddl("CREATE UNIQUE INDEX idx ON chat.transcripts (conv_id)")
    assert r.kind == "CINDEX" and r.table_name == "transcripts"
    r = parse_ddl("DROP INDEX idx ON chat.transcripts")
    assert r.kind == "DINDEX" and r.table_name == "transcripts"
    assert parse_ddl("SET NAMES utf8").kind == "OTHER"


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
