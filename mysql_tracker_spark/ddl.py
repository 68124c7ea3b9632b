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
_ADD_RE = re.compile(
    rf"ALTER\s+TABLE\s+(?:{_NAME}\.)?{_NAME}\s+ADD\s+(?:COLUMN\s+)?{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
_MODIFY_RE = re.compile(
    rf"ALTER\s+TABLE\s+(?:{_NAME}\.)?{_NAME}\s+(?:MODIFY|CHANGE)\s+(?:COLUMN\s+)?{_NAME}\s+(\w+(?:\(\d+(?:,\d+)?\))?)",
    re.IGNORECASE,
)
_CLASS_RE = re.compile(
    r"^\s*(?:/\*.*?\*/\s*)*(CREATE|DROP|ALTER|TRUNCATE|RENAME)\b", re.IGNORECASE | re.DOTALL
)


@dataclass
class DdlResult:
    kind: str  # ADD_COLUMN | WIDEN | OTHER
    schema_name: str | None
    table_name: str | None
    column: str | None = None
    new_type: T.DataType | None = None
    sql: str = ""


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
    """Classify one DDL statement (reference SimpleDdlParser regexes,
    re-expressed; comments and backticks tolerated)."""
    m = _ADD_RE.search(sql)
    if m:
        sch, tbl, col, ty = m.groups()
        return DdlResult("ADD_COLUMN", sch or default_schema, tbl, col, _spark_type(ty), sql)
    m = _MODIFY_RE.search(sql)
    if m:
        sch, tbl, col, ty = m.groups()
        return DdlResult("WIDEN", sch or default_schema, tbl, col, _spark_type(ty), sql)
    c = _CLASS_RE.match(sql or "")
    return DdlResult("OTHER", default_schema, None, sql=sql)


def evolve_schema(current: T.StructType, ddl: DdlResult) -> T.StructType | None:
    """Apply one parsed DDL to a schema; return the new schema or None
    if it is a no-op / unsupported (add-only tolerance — unsupported
    DDL is skipped, mirroring the reference's drift policy)."""
    if ddl.kind == "ADD_COLUMN" and ddl.new_type is not None:
        if any(f.name == ddl.column for f in current.fields):
            return None  # idempotent re-apply (replayed DDL)
        return T.StructType(current.fields + [T.StructField(ddl.column, ddl.new_type, True)])
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
        parsed = parse_ddl(sql, default_schema)
        new_schema = evolve_schema(table.schema(), parsed)
        if new_schema is not None:
            table.update_schema(new_schema, note=sql)
            n += 1
    return n
