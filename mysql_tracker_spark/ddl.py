"""DDL classification and schema evolution (SURVEY.md §2.2 D6 + §4).

The reference classifies DDL with regexes (``tracker/parser/
SimpleDdlParser.java:13-97``) and reacts by *invalidating its metadata
cache* (``LogEventConvert.java:220-230``), tolerating only added
columns. We go further: ADD COLUMN and type widening are applied to
the lakestore schema *before* the same batch's DML is merged (ordered
DDL-then-DML), never rewriting existing data files.

DDL events are rare (a handful per batch at most), so parsing happens
driver-side on the collected DDL rows; the per-event hot path never
sees them after the split filter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

from .lakestore import LakeTable

# mysql type name -> Spark type (subset the transcripts pipeline needs;
# extend per SURVEY.md §1.2 table as columns appear)
_TYPE_MAP: dict[str, T.DataType] = {
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "TEXT": T.StringType(),
    "STRING": T.StringType(),
    "VARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
    "DATETIME": T.TimestampType(),
    "DATE": T.DateType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "BLOB": T.BinaryType(),
}

# legal widenings (old -> allowed new); Iceberg-compatible set
_WIDEN_OK = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
    ("integer", "decimal"), ("long", "decimal"),
    ("date", "timestamp"),
}

_NAME = r"[`\"']?(\w+)[`\"']?"
_QTBL = rf"(?:{_NAME}\.)?{_NAME}"
# shared by statement- and clause-level patterns: an ADD/DROP followed
# by one of these keywords is an index/constraint operation, not a
# column — without the lookahead "ADD KEY text (col)" would parse as
# ADD_COLUMN(column='KEY', type=text) and commit a phantom column
_NOT_KEYWORD = r"(?!INDEX\b|KEY\b|PRIMARY\b|FOREIGN\b|CONSTRAINT\b|PARTITION\b|CHECK\b|UNIQUE\b|FULLTEXT\b)"
_DROP_COL_RE = re.compile(
    rf"ALTER\s+TABLE\s+{_QTBL}\s+DROP\s+(?:COLUMN\s+)?"
    rf"{_NOT_KEYWORD}"
    # mysqld accepts trailing semicolons in COM_QUERY — ';' must not
    # make the drop classify as OTHER (silently skipped forever)
    rf"{_NAME}\s*(?:,|;|$)",
    re.IGNORECASE,
)
_ADD_RE = re.compile(
    rf"ALTER\s+TABLE\s+{_QTBL}\s+ADD\s+(?:COLUMN\s+)?{_NOT_KEYWORD}{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
_MODIFY_RE = re.compile(
    rf"ALTER\s+TABLE\s+{_QTBL}\s+MODIFY\s+(?:COLUMN\s+)?{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
# MySQL's two column-rename spellings: RENAME COLUMN old TO new (8.0+)
# and CHANGE [COLUMN] old new TYPE (which may also retype)
_RENAME_COL_RE = re.compile(
    rf"ALTER\s+TABLE\s+{_QTBL}\s+RENAME\s+COLUMN\s+{_NAME}\s+TO\s+{_NAME}",
    re.IGNORECASE,
)
_CHANGE_RE = re.compile(
    rf"ALTER\s+TABLE\s+{_QTBL}\s+CHANGE\s+(?:COLUMN\s+)?{_NAME}\s+{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
# full reference classification surface (SimpleDdlParser.java:13-33,
# matched in its order :36-80); CINDEX/DINDEX before CREATE/DROP TABLE
# tests would be wrong — the reference tries TABLE patterns first
_CREATE_RE = re.compile(rf"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QTBL}", re.IGNORECASE)
_DROP_RE = re.compile(rf"^\s*DROP\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+EXISTS\s+)?{_QTBL}", re.IGNORECASE)
_TRUNCATE_RE = re.compile(rf"^\s*TRUNCATE\s+(?:TABLE\s+)?{_QTBL}", re.IGNORECASE)
_RENAME_RE = re.compile(rf"^\s*RENAME\s+TABLE\s+{_QTBL}\s+TO\s+{_QTBL}", re.IGNORECASE)
# negative lookahead: "RENAME COLUMN a TO b" / "RENAME INDEX|KEY i TO j"
# are benign in-table renames, not a destructive table RENAME — they
# must fall through to OTHER (the reference's meta-refresh path)
_ALTER_RENAME_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_QTBL}\s+RENAME\s+(?:TO\s+)?(?!COLUMN\b|INDEX\b|KEY\b){_QTBL}",
    re.IGNORECASE,
)
_CINDEX_RE = re.compile(rf"^\s*CREATE\s+(?:\w+\s+)*?INDEX\s+{_NAME}\s+ON\s+{_QTBL}", re.IGNORECASE)
_DINDEX_RE = re.compile(rf"^\s*DROP\s+INDEX\s+{_NAME}\s+ON\s+{_QTBL}", re.IGNORECASE)
_COMMENT_RE = re.compile(r"/\*.*?\*/", re.DOTALL)
_CLASS_RE = re.compile(
    r"^\s*(CREATE|DROP|ALTER|TRUNCATE|RENAME)\b", re.IGNORECASE
)


@dataclass
class DdlResult:
    # ADD_COLUMN | WIDEN | CREATE | DROP | TRUNCATE | RENAME |
    # CINDEX | DINDEX | OTHER  (reference EventType vocabulary,
    # EntryProtocol.proto:185-198; DROP ≡ the reference's ERASE)
    kind: str
    schema_name: str | None
    table_name: str | None
    column: str | None = None
    new_type: T.DataType | None = None
    sql: str = ""
    # RENAME target: (schema|None, table)
    rename_to: tuple[str | None, str] | None = None
    # RENAME_COLUMN target name (column carries the OLD name)
    new_name: str | None = None


def _spark_type(type_text: str) -> T.DataType | None:
    m = re.match(r"(\w+)(?:\((\d+)(?:,(\d+))?\))?", type_text.strip())
    if not m:
        return None
    base = m.group(1).upper()
    if base in ("DECIMAL", "NUMERIC"):
        p = int(m.group(2) or 10)
        s = int(m.group(3) or 0)
        return T.DecimalType(p, s)
    return _TYPE_MAP.get(base)


def parse_ddl(sql: str, default_schema: str | None = None) -> DdlResult:
    """Classify one DDL statement (reference SimpleDdlParser patterns
    ``SimpleDdlParser.java:13-97``, re-expressed; comments stripped
    first like ``removeComment``, backticks tolerated). Classification
    order follows the reference's ``parse()`` (:36-80): ALTER first,
    then CREATE/DROP TABLE, TRUNCATE, RENAME, CREATE/DROP INDEX."""
    sql_clean = _COMMENT_RE.sub(" ", sql or "")
    m = _ADD_RE.search(sql_clean)
    if m:
        sch, tbl, col, ty = m.groups()
        return DdlResult("ADD_COLUMN", sch or default_schema, tbl, col, _spark_type(ty), sql)
    m = _MODIFY_RE.search(sql_clean)
    if m:
        sch, tbl, col, ty = m.groups()
        return DdlResult("WIDEN", sch or default_schema, tbl, col, _spark_type(ty), sql)
    m = _DROP_COL_RE.search(sql_clean)
    if m:
        sch, tbl, col = m.groups()
        return DdlResult("DROP_COLUMN", sch or default_schema, tbl, col, sql=sql)
    m = _RENAME_COL_RE.search(sql_clean)
    if m:
        sch, tbl, old, new = m.groups()
        return DdlResult(
            "RENAME_COLUMN", sch or default_schema, tbl, old, sql=sql,
            new_name=new,
        )
    m = _CHANGE_RE.search(sql_clean)
    if m:
        sch, tbl, old, new, ty = m.groups()
        if old.lower() == new.lower():
            # CHANGE with same name == MODIFY (retype only)
            return DdlResult("WIDEN", sch or default_schema, tbl, old, _spark_type(ty), sql)
        return DdlResult(
            "RENAME_COLUMN", sch or default_schema, tbl, old, _spark_type(ty),
            sql=sql, new_name=new,
        )
    m = _ALTER_RENAME_RE.match(sql_clean)
    if m:
        s1, t1, s2, t2 = m.groups()
        return DdlResult(
            "RENAME", s1 or default_schema, t1, sql=sql,
            rename_to=(s2 or default_schema, t2),
        )
    # index DDL before the generic CREATE/DROP TABLE tests: "CREATE
    # INDEX i ON t" has no TABLE keyword so order is safe either way,
    # but keep the disambiguation explicit
    m = _CINDEX_RE.match(sql_clean)
    if m:
        _idx, sch, tbl = m.groups()
        return DdlResult("CINDEX", sch or default_schema, tbl, sql=sql)
    m = _DINDEX_RE.match(sql_clean)
    if m:
        _idx, sch, tbl = m.groups()
        return DdlResult("DINDEX", sch or default_schema, tbl, sql=sql)
    m = _CREATE_RE.match(sql_clean)
    if m:
        sch, tbl = m.groups()
        return DdlResult("CREATE", sch or default_schema, tbl, sql=sql)
    m = _DROP_RE.match(sql_clean)
    if m:
        sch, tbl = m.groups()
        return DdlResult("DROP", sch or default_schema, tbl, sql=sql)
    m = _TRUNCATE_RE.match(sql_clean)
    if m:
        sch, tbl = m.groups()
        return DdlResult("TRUNCATE", sch or default_schema, tbl, sql=sql)
    m = _RENAME_RE.match(sql_clean)
    if m:
        s1, t1, s2, t2 = m.groups()
        return DdlResult(
            "RENAME", s1 or default_schema, t1, sql=sql,
            rename_to=(s2 or default_schema, t2),
        )
    return DdlResult("OTHER", default_schema, None, sql=sql)


# clause-level patterns (no ALTER TABLE prefix) for multi-clause
# statements: "ALTER TABLE t DROP COLUMN a, RENAME COLUMN b TO c, ..."
_CL_ADD = re.compile(
    rf"\bADD\s+(?:COLUMN\s+)?{_NOT_KEYWORD}{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
_CL_MODIFY = re.compile(
    rf"\bMODIFY\s+(?:COLUMN\s+)?{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
_CL_RENAME_COL = re.compile(
    rf"\bRENAME\s+COLUMN\s+{_NAME}\s+TO\s+{_NAME}", re.IGNORECASE
)
_CL_CHANGE = re.compile(
    rf"\bCHANGE\s+(?:COLUMN\s+)?{_NAME}\s+{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
_CL_DROP = re.compile(
    rf"\bDROP\s+(?:COLUMN\s+)?{_NOT_KEYWORD}{_NAME}", re.IGNORECASE
)
_CL_RENAME_TBL = re.compile(
    rf"\bRENAME\s+(?:TO\s+|AS\s+)?(?!COLUMN\b|INDEX\b|KEY\b){_QTBL}",
    re.IGNORECASE,
)
_ALTER_PREFIX_RE = re.compile(rf"^\s*ALTER\s+TABLE\s+{_QTBL}", re.IGNORECASE)


def parse_ddl_clauses(sql: str, default_schema: str | None = None) -> list[DdlResult]:
    """Parse EVERY clause of an ALTER statement (MySQL allows
    comma-separated clause lists): returns one DdlResult per recognized
    clause, in statement order — applying only the first clause would
    silently half-evolve the schema. Non-ALTER statements and ALTERs
    with at most one recognized clause fall back to :func:`parse_ddl`
    (single authoritative classification)."""
    sql_clean = _COMMENT_RE.sub(" ", sql or "")
    pm = _ALTER_PREFIX_RE.match(sql_clean)
    if not pm:
        return [parse_ddl(sql, default_schema)]
    sch, tbl = pm.group(1) or default_schema, pm.group(2)
    rest = sql_clean[pm.end():]
    found: list[tuple[int, DdlResult]] = []
    for m in _CL_RENAME_COL.finditer(rest):
        old, new = m.groups()
        found.append((m.start(), DdlResult(
            "RENAME_COLUMN", sch, tbl, old, sql=sql, new_name=new)))
    for m in _CL_CHANGE.finditer(rest):
        old, new, ty = m.groups()
        kind = "WIDEN" if old.lower() == new.lower() else "RENAME_COLUMN"
        found.append((m.start(), DdlResult(
            kind, sch, tbl, old, _spark_type(ty), sql=sql,
            new_name=None if kind == "WIDEN" else new)))
    for m in _CL_ADD.finditer(rest):
        col, ty = m.groups()
        found.append((m.start(), DdlResult(
            "ADD_COLUMN", sch, tbl, col, _spark_type(ty), sql=sql)))
    for m in _CL_MODIFY.finditer(rest):
        col, ty = m.groups()
        found.append((m.start(), DdlResult(
            "WIDEN", sch, tbl, col, _spark_type(ty), sql=sql)))
    for m in _CL_DROP.finditer(rest):
        found.append((m.start(), DdlResult(
            "DROP_COLUMN", sch, tbl, m.group(1), sql=sql)))
    for m in _CL_RENAME_TBL.finditer(rest):
        s2, t2 = m.groups()
        found.append((m.start(), DdlResult(
            "RENAME", sch, tbl, sql=sql, rename_to=(s2 or default_schema, t2))))
    if len(found) <= 1:
        return [parse_ddl(sql, default_schema)]
    found.sort(key=lambda x: x[0])
    return [r for _, r in found]


def evolve_schema(current: T.StructType, ddl: DdlResult) -> T.StructType | None:
    """Apply one parsed DDL to a schema; return the new schema or None
    if it is a no-op / unsupported (add-only tolerance — unsupported
    DDL is skipped, mirroring the reference's drift policy)."""
    if ddl.kind == "ADD_COLUMN" and ddl.new_type is not None:
        if any(f.name == ddl.column for f in current.fields):
            return None  # idempotent re-apply (replayed DDL)
        return T.StructType(current.fields + [T.StructField(ddl.column, ddl.new_type, True)])
    if ddl.kind == "DROP_COLUMN":
        if not any(f.name == ddl.column for f in current.fields):
            return None  # idempotent re-apply (replayed DDL)
        return T.StructType([f for f in current.fields if f.name != ddl.column])
    if ddl.kind == "WIDEN" and ddl.new_type is not None:
        fields = []
        changed = False
        for f in current.fields:
            if f.name == ddl.column and f.dataType != ddl.new_type:
                old_t = f.dataType.typeName()
                new_t = ddl.new_type.typeName()
                if (old_t, new_t) in _WIDEN_OK:
                    fields.append(T.StructField(f.name, ddl.new_type, True))
                    changed = True
                    continue
                return None  # narrowing / unsupported: skip
            fields.append(f)
        return T.StructType(fields) if changed else None
    return None


def apply_ddl_events(table: LakeTable, ddl_rows: list, default_schema: str | None = None) -> int:
    """Apply a batch's DDL rows (already sorted in log order) to the
    lakestore table. Returns the number of schema versions committed.
    Idempotent: re-applied DDL (replay overlap) is a no-op."""
    n = 0
    for row in ddl_rows:
        sql = row["ddl_sql"] if not isinstance(row, str) else row
        if not sql:
            continue
        for parsed in parse_ddl_clauses(sql, default_schema):
            # EVERY clause of a multi-clause ALTER applies (first-
            # clause-only parsing would silently half-evolve the
            # schema — the exact failure parse_ddl_clauses exists for)
            new_schema = evolve_schema(table.schema(), parsed)
            if new_schema is not None:
                table.update_schema(new_schema, note=sql)
                n += 1
    return n
