"""Filter operators (SURVEY.md §2.3, F1-F4).

All are plain Catalyst predicates so they push down to the parquet/
lakestore scan — the analogue of the reference filtering *after*
decode in Java (``tracker/filter/FilterMatcher.java:10-66``,
``tracker/parser/LogEventConvert.java:313-320``), but cheaper: here
the filter prunes row groups before decode work happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schema import DML_OPS


def regex_name_filter(df: DataFrame, pattern: str) -> DataFrame:
    """F1: keep rows whose ``schema.table`` matches the regex, anchored
    ``^...$`` like the reference's FilterMatcher (longest-first comma
    lists collapse to alternation here)."""
    # normalize to FULL anchoring whatever the caller wrote: strip a
    # leading '^' / trailing unescaped '$' and re-wrap — '^db\\.users'
    # alone must NOT become a prefix match leaking db.users_archive
    core = pattern[1:] if pattern.startswith("^") else pattern
    if core.endswith("$") and not core.endswith("\\$"):
        core = core[:-1]
    name = F.concat_ws(".", F.col("schema_name"), F.col("table_name"))
    return df.filter(name.rlike(f"^(?:{core})$"))


def allowlist_filter(df: DataFrame, allow: list[tuple[str, str]]) -> DataFrame:
    """F2: exact ``(schema, table)`` allow-list — the reference's
    ``filterMap`` (``tracker/utils/TrackerConf.java:206-216``). Small
    list → `isin` on a concat key keeps it a pushed-down predicate; a
    large list would become a broadcast left-semi join."""
    keys = [f"{s}.{t}" for s, t in allow]
    name = F.concat_ws(".", F.col("schema_name"), F.col("table_name"))
    return df.filter(name.isin(keys))


def query_class_filter(
    df: DataFrame,
    drop_dml: bool = False,
    drop_ddl: bool = False,
    drop_txn: bool = True,
) -> DataFrame:
    """F3: drop whole event classes (reference ``filterQueryDml/Ddl/Dcl``
    flags, ``LogEventConvert.java:69-71``). Txn delimiters are dropped
    by default *after* boundary extraction."""
    cond = F.lit(True)
    if drop_dml:
        cond = cond & ~F.col("op").isin(*DML_OPS)
    if drop_ddl:
        # null-safe: is_ddl is nullable and filter(NULL) DROPS the row
        # — a DML event with is_ddl unset must survive drop_ddl
        cond = cond & ~F.coalesce(F.col("is_ddl"), F.lit(False))
    if drop_txn:
        cond = cond & ~F.col("op").isin("BEGIN", "COMMIT")
    return df.filter(cond)


def handled_event_filter(df: DataFrame, handled: tuple[str, ...] = DML_OPS) -> DataFrame:
    """F4: keep only handled event types (the decoder BitSet gate,
    ``mysql/dbsync/LogDecoder.java:67-86``)."""
    return df.filter(F.col("op").isin(*handled))


def dml_for_table(df: DataFrame, schema_name: str, table_name: str) -> DataFrame:
    """The standard pre-apply predicate stack: handled DML ops of one
    target table."""
    return df.filter(
        F.col("op").isin(*DML_OPS)
        & (F.col("schema_name") == schema_name)
        & (F.col("table_name") == table_name)
    )
