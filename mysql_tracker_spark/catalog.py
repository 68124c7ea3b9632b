"""SQL catalog surface over lakestore tables and event logs — the
Iceberg SQL-UX analogue (``SELECT * FROM t``, ``t__history``,
``t__files``, ``t__tags``, tagged reads), so a SQL-first consumer of
the reference's downstream tables (``consumer/kafka/KafkaReceiver.java``
formatted entries for exactly this kind of ad-hoc inspection) can query
the applied transcripts table without touching the Python API. Spark
temp-view names reject Iceberg's ``$`` metadata suffix, hence the
``__`` separator.

Temp views are session-scoped name bindings over lazily-planned
DataFrames: registering costs one driver-side manifest read per view
and NO data read or copy — the resolved plan still carries the
bucket-pruned, LWW-resolved read the table API builds, so every
pushdown/pruning property the plan tests lock holds through
``spark.sql`` too.

A view binds to the snapshot CURRENT AT REGISTRATION TIME for data
(Iceberg's read-isolation semantics: a reader pins a snapshot), so
concurrent commits never shear a running SQL query; re-register (or
call ``register_table`` again after a commit) to advance. Metadata
views (`__history`/`__files`/`__tags`) are materialized driver-side at
registration for the same reason.
"""

from __future__ import annotations

import re

import os
import time

from pyspark.sql import SparkSession

from .lakestore.table import LakeTable


def register_table(
    spark: SparkSession,
    table: LakeTable | str,
    name: str | None = None,
    include_metadata: bool = True,
    include_tags: bool = True,
) -> list[str]:
    """Register a lakestore table (object or path) as SQL temp views:

    * ``name`` — the current LWW-resolved state (bucket-layout read);
    * ``name__history`` / ``name__files`` — Iceberg-style metadata tables;
    * ``name__tags`` — tag name -> pinned version;
    * ``name__at_<tag>`` — one view per tag, reading that pinned
      snapshot (the Iceberg ``VERSION AS OF`` / branch-read UX).

    Returns the list of view names registered. Snapshot-pinned: views
    see the table as of registration; call again to advance to a newer
    commit.
    """
    t = LakeTable.load(table) if isinstance(table, str) else table
    name = name or t.properties().get("table_name") or "lake_table"
    created = []

    t.read(spark).createOrReplaceTempView(name)
    created.append(name)

    if include_metadata:
        t.history(spark).createOrReplaceTempView(f"{name}__history")
        t.files(spark).createOrReplaceTempView(f"{name}__files")
        created += [f"{name}__history", f"{name}__files"]
        # per-batch lineage/metrics the apply job appends next to the
        # table (offset ranges, row counts, commit snapshot ids —
        # FIXTURES.md §3): the audit stream, queryable alongside the
        # data it produced
        lineage = os.path.join(t.path, "lineage.jsonl")
        if os.path.exists(lineage):
            spark.read.json(lineage).createOrReplaceTempView(f"{name}__lineage")
            created.append(f"{name}__lineage")

    if include_tags:
        tags = t.tags()
        rows = [(k, v) for k, v in sorted(tags.items())]
        spark.createDataFrame(
            rows or [], "tag string, version int"
        ).createOrReplaceTempView(f"{name}__tags")
        created.append(f"{name}__tags")
        seen: dict[str, str] = {}
        for tag, v in rows:
            # tag names allow '.'/'-' which are illegal in single-part
            # view identifiers — sanitize for the VIEW name only (the
            # __tags view still carries the exact tag string). Distinct
            # tags that sanitize identically ('v1.0' vs 'v1-0') get the
            # pinned version appended instead of silently shadowing
            # each other.
            safe = re.sub(r"[^A-Za-z0-9_]", "_", tag)
            if safe in seen:
                safe = f"{safe}_v{v}"
            seen[safe] = tag
            t.read_tag(spark, tag).createOrReplaceTempView(f"{name}__at_{safe}")
            created.append(f"{name}__at_{safe}")

    # live branches: one pinned view per branch head (branch names
    # share the tag charset, so the same sanitize + collision rule
    # applies — distinct branches that sanitize identically get the
    # branch head version appended instead of silently shadowing; the
    # branch chain can advance after registration — re-register to
    # see newer branch commits, same pinning contract as the base view)
    from pyspark.errors import AnalysisException

    bseen: set[str] = set()
    for bname in t.branch_names():
        registered = False
        # two attempts: AnalysisException covers BOTH a mid-rmtree
        # concurrent drop (transient — the dir vanishes moments later)
        # and a genuinely corrupt branch (persistent). A vanished
        # branch resolves by the retry (gone from branch_names, or
        # FileNotFoundError); a still-listed branch that fails twice
        # is corrupt and must surface, not be silently omitted.
        for attempt in (0, 1):
            try:
                br = t.load_branch(bname)
                safe = re.sub(r"[^A-Za-z0-9_]", "_", bname)
                if safe in bseen:
                    safe = f"{safe}_v{br.current_version()}"
                br.read(spark).createOrReplaceTempView(
                    f"{name}__branch_{safe}"
                )
                bseen.add(safe)
                registered = True
                break
            except FileNotFoundError:
                # concurrent fast_forward/drop_branch removed the
                # branch dir between the listing and the load — skip
                break
            except AnalysisException:
                if bname not in t.branch_names():
                    break  # provably vanished mid-read
                if attempt == 1:
                    raise  # still listed, failed twice: corrupt
                time.sleep(0.2)  # let a mid-rmtree drop finish
        if registered:
            created.append(f"{name}__branch_{safe}")

    # retire STALE derived views from an earlier registration of this
    # name (a fast-forwarded branch's view, a deleted tag's __at_
    # view): leaving them bound would serve pre-publish data silently
    # only sweep view classes this call actually (re)registered —
    # include_tags=False must not retire live tag views
    stale_prefixes = (
        (f"{name}__branch_", f"{name}__at_")
        if include_tags
        else (f"{name}__branch_",)
    )
    mine = set(created)
    for tbl in spark.catalog.listTables():
        if (
            tbl.isTemporary
            and tbl.name not in mine
            and tbl.name.startswith(stale_prefixes)
        ):
            spark.catalog.dropTempView(tbl.name)
    return created


def register_eventlog(
    spark: SparkSession,
    log,
    name: str = "event_log",
) -> list[str]:
    """Register an :class:`~mysql_tracker_spark.eventlog.EventLogJob`'s
    live log as ``name`` (full ordered log, ``seq`` column included)
    plus ``name__segments`` — one row per live segment with its manifest
    stats (rows, seq range, ts range), the pruning metadata
    ``read_range`` uses. Same snapshot-pinning semantics as
    :func:`register_table`."""
    log.read(spark).createOrReplaceTempView(name)
    m = log.manifest()
    segs = m.get("segments", {})
    rows = []
    for sub in m["files"]:
        st = segs.get(sub) or {}
        sq, ts = st.get("seq"), st.get("ts")
        rows.append(
            (
                sub,
                st.get("rows"),
                sq[0] if sq else None,
                sq[1] if sq else None,
                ts[0] if ts else None,
                ts[1] if ts else None,
            )
        )
    spark.createDataFrame(
        rows or [],
        "segment string, rows long, seq_min long, seq_max long, "
        "ts_min string, ts_max string",
    ).createOrReplaceTempView(f"{name}__segments")
    return [name, f"{name}__segments"]
