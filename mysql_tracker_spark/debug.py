"""Golden dumps — the reference's EntryPrinter pattern
(``tracker/utils/EntryPrinter.java``, used by
``src/test/java/MysqlParserTest.java:13-29``) re-expressed: render a
change-event or transcripts DataFrame as ordered JSON lines for
eyeballing and cross-run diffing."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .schema import LOG_ORDER


def golden_dump(df: DataFrame, path: str, order: list[str] | None = None) -> None:
    """Write an ordered single-file JSONL dump (driver-coalesced; use
    only at test scale, like the reference's .dat files)."""
    order = order or [c for c in LOG_ORDER if c in df.columns] or df.columns[:1]
    (
        df.orderBy(*order)
        .coalesce(1)
        .write.mode("overwrite")
        .json(path)
    )


def entry_print(df: DataFrame, n: int = 20) -> str:
    """Human-readable entry rendering (EntryPrinter.printEntry style)."""
    order = [c for c in LOG_ORDER if c in df.columns]
    rows = df.orderBy(*order).limit(n).collect() if order else df.limit(n).collect()
    lines = []
    for r in rows:
        d = r.asDict(recursive=True)
        head = ":".join(str(d.get(k)) for k in ("file", "pos", "row_idx") if k in d)
        lines.append(f"[{head}] {d}")
    return "\n".join(lines)
