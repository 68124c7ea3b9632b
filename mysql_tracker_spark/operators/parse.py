"""Convert/project operators: map-typed change records -> typed rows
(SURVEY.md §2.2 D4/D5/D8), plus sequencing (B3) and transaction
boundary extraction (B4).

The reference builds each record's columns in Java per row
(``tracker/parser/LogEventConvert.java:381-550``); here the same
"column assembly" is a single Catalyst projection over MapType columns
— ``element_at`` + ``cast`` stay inside whole-stage codegen, no Python.

The ``before``/``after`` maps hold the reference's canonical *string*
renderings (SURVEY.md §1.2): casts below define the frozen
string->typed rules (timestamps 'yyyy-MM-dd HH:mm:ss', plain decimal
integers), so per-turn text equality is preserved end-to-end.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..schema import LOG_ORDER


def typed_from_map(
    map_col: str | Column,
    schema: T.StructType,
    aliases: dict[str, list[str]] | None = None,
) -> list[Column]:
    """Projection list turning a map<string,string> column (name or
    expression) into typed columns per ``schema`` (absent key -> null,
    the reference's NULL rule). ``aliases`` maps a current column name
    to its HISTORICAL names (newest first, a RENAME COLUMN chain):
    events emitted before the rename carry the old key in their row
    image, so the extraction coalesces over the chain."""
    mc = F.col(map_col) if isinstance(map_col, str) else map_col
    cols = []
    for fld in schema.fields:
        names = [fld.name, *(aliases or {}).get(fld.name, [])]
        c = (
            F.coalesce(*[F.element_at(mc, n) for n in names])
            if len(names) > 1
            else F.element_at(mc, fld.name)
        )
        if not isinstance(fld.dataType, T.StringType):
            c = c.cast(fld.dataType)
        cols.append(c.alias(fld.name))
    return cols


def project_changes(dml: DataFrame, schema: T.StructType) -> DataFrame:
    """Typed change rows: target-schema columns from ``after`` (for
    DELETE the PK lives in ``after`` too — reference flatten rule D8:
    DELETE current = PK only), plus op and the log-order columns."""
    return dml.select(
        *[F.col(c) for c in LOG_ORDER],
        F.col("op"),
        *typed_from_map("after", schema),
    )


def avro_flat_records(
    events: DataFrame,
    dbname: str = "mysql",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """D8: the reference's flattened Avro change record
    (``protocol/avro/EventEntry.avro:1-17``), built from an Entry in
    ``tracker/HandlerNoParserMagpieHBase.java:735-793``:
    ``{dbName, schema, tableName, operation, dbOptTimestamp, ddlSql,
    source: map, current: map}``. Flatten rules:

    * DELETE: ``source`` = full before image, ``current`` = key columns
      only (reference :750-761 copies only isKey columns forward);
    * INSERT: ``source`` = empty, ``current`` = after image (:762-770);
    * UPDATE: ``source`` = before, ``current`` = after. **Deliberate
      divergence**: the reference builds both maps but never assigns
      them to the record (:771-781 constructs ``source``/``current``
      HashMaps and forgets ``setSource``/``setCurrent`` — UPDATE
      records ship with empty maps). We implement the evident intent;
      consumers diffing against reference output will see empty maps
      there for UPDATEs.
    """
    keys_only = F.map_filter(F.col("after"), lambda k, _v: k.isin(*key_cols))
    empty = F.create_map().cast("map<string,string>")
    source = (
        F.when(F.col("op") == "DELETE", F.col("before"))
        .when(F.col("op") == "UPDATE", F.col("before"))
        .otherwise(empty)
    )
    current = (
        F.when(F.col("op") == "DELETE", keys_only)
        .when(F.col("op").isin("INSERT", "UPDATE"), F.col("after"))
        .otherwise(empty)
    )
    # per-column `updated` flag (reference Column.updated,
    # LogEventConvert.isUpdate :584-611: set on after-image columns
    # whose value differs from the before image, or on every column of
    # an INSERT): emitted as the array of changed column names —
    # map-of-bools carries no more information and scans worse
    cur = F.coalesce(current, empty)
    bef = F.coalesce(F.col("before"), empty)
    changed = F.filter(
        F.map_keys(cur),
        lambda k: ~F.element_at(bef, k).eqNullSafe(F.element_at(cur, k)),
    )
    return events.select(
        F.lit(dbname).alias("dbName"),
        F.col("schema_name").alias("schema"),
        F.col("table_name").alias("tableName"),
        F.col("op").alias("operation"),
        F.unix_millis("ts").alias("dbOptTimestamp"),
        F.col("ddl_sql").alias("ddlSql"),
        F.coalesce(source, empty).alias("source"),
        cur.alias("current"),
        F.when(F.col("op").isin("INSERT", "UPDATE"), F.array_sort(changed))
        .otherwise(F.array().cast("array<string>"))
        .alias("updatedColumns"),
    )


class _DurableBarrierHandle:
    """Release handle for ``global_sequence(barrier="durable")`` —
    quacks like the persisted-DataFrame handle (``unpersist()``) but
    removes the scratch directory instead. When global_sequence
    created the base temp dir itself (``scratch_dir=None``), the
    handle owns and removes that base too — callers' explicit
    scratch_dirs are left in place (only the tagged subdir goes)."""

    def __init__(self, path: str, owned_base: str | None = None):
        self.path = path
        self._owned_base = owned_base

    def unpersist(self, blocking: bool = False):
        import shutil

        shutil.rmtree(self._owned_base or self.path, ignore_errors=True)
        return self


def global_sequence(
    df: DataFrame,
    order_cols: tuple[str, ...] | list[str],
    out_col: str = "in_id",
    n_parts: int | None = None,
    barrier: str = "auto",
    scratch_dir: str | None = None,
) -> DataFrame:
    """Global 0-based sequence numbers over a total order WITHOUT a
    single-task global sort.

    ``Window.orderBy`` with no partitionBy moves the entire input
    through one task — correct, but a scale-killer (Spark itself warns).
    This is the classic two-phase replacement (the DataFrame analogue of
    ``rdd.zipWithIndex``):

    1. range-repartition on the order key (parallel sampled shuffle) and
       sort within partitions; ``monotonically_increasing_id`` then
       encodes ``(partition_id << 33) | local_row_index`` — local
       indices follow the sorted within-partition order because the
       nondeterministic id expression cannot be reordered past the sort;
    2. per-partition counts (tiny aggregation, ≤ n_parts rows) turn into
       cumulative start offsets, broadcast-joined back:
       ``seq = local_index + offset[partition]``.

    The tagged frame is PERSISTED and the counts are collected from the
    materialized cache — never recomputed. The two phases MUST see one
    materialization: ``repartitionByRange`` samples its boundaries with
    a seed derived from the new shuffle's RDD id, so a second
    materialization (whenever exchange reuse fails to unify the two
    plan arms) re-draws the boundaries and can place borderline rows in
    a different partition in each arm — the per-partition counts then
    disagree with the per-partition local indices and the output gets
    duplicate+missing sequence numbers (observed: ~50 dups per 7,500
    rows on small micro-batches before this was pinned). The cache is
    one micro-batch (MEMORY_AND_DISK, spills, working-set-bounded);
    callers may ``unpersist()`` the handle exposed as
    ``result._mts_seq_cache`` after consuming the result. Rows with
    equal order keys get an arbitrary but stable relative order (the
    reference's single-reader arrival order is equally arbitrary for
    concurrent events).

    ``barrier`` selects how the materialization is pinned:

    * ``"auto"`` (default): single-JVM masters use a MEMORY_AND_DISK
      persist (spills, can never lose a block); multi-executor masters
      use ``localCheckpoint`` — block loss on executor decommission
      then FAILS loudly instead of silently renumbering, and the
      runner's retry-with-reload renumbers the whole batch
      consistently (restart-costly for a giant batch).
    * ``"durable"``: write the tagged frame to a parquet scratch dir
      (``scratch_dir`` or a temp dir) and re-read it — survives
      executor loss with NO restart, the cluster-deployment choice for
      batches too expensive to renumber. The release handle
      (``result._mts_seq_cache.unpersist()``) removes the scratch dir.
    """
    from pyspark import StorageLevel

    if barrier not in ("auto", "durable"):
        raise ValueError(f"barrier must be 'auto' or 'durable', got {barrier!r}")
    order = [F.col(c) for c in order_cols]
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    tagged = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright(F.col("__mid"), 33))
        .withColumn("__local", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)))
    )
    seq_cache = None
    if barrier == "durable":
        import os as _os
        import tempfile as _tempfile
        import uuid as _uuid

        base = scratch_dir or _tempfile.mkdtemp(prefix="mts_seq_")
        path = _os.path.join(base, f"tagged_{_uuid.uuid4().hex[:8]}")
        # the write IS the barrier: ids are frozen in the files, every
        # later read (counts + join + caller's write) sees one
        # materialization whatever blocks or executors are lost
        tagged.write.parquet(path)
        tagged = df.sparkSession.read.parquet(path)
        seq_cache = _DurableBarrierHandle(
            path, owned_base=None if scratch_dir else base
        )
    elif df.sparkSession.sparkContext.master.startswith("local"):
        # single JVM: MEMORY_AND_DISK spills but can never lose a block,
        # so the cache IS the barrier
        tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        # multi-executor: a lost cache block would silently recompute
        # with freshly-sampled repartitionByRange boundaries and
        # reintroduce duplicate/missing sequence numbers. localCheckpoint
        # cuts the lineage so block loss (executor decommission) FAILS
        # the job loudly instead — the runner's retry-with-reload path
        # then renumbers the whole batch consistently.
        tagged = tagged.localCheckpoint(eager=False)
    # this action MATERIALIZES the cache; every later read (the join
    # below, the caller's write) consumes the frozen rows, so the ids
    # the counts were derived from are the ids the output carries
    cnt_rows = sorted(
        tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect(),
        key=lambda r: r["__pid"],
    )
    offs, acc = [], 0
    for r in cnt_rows:
        offs.append((int(r["__pid"]), acc))
        acc += int(r["__cnt"])
    spark = df.sparkSession
    offsets = spark.createDataFrame(offs, "__pid long, __off long")
    out = (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__mid", "__pid", "__local", "__off")
    )
    out._mts_seq_cache = seq_cache if seq_cache is not None else tagged
    return out


def with_sequence(df: DataFrame, batch_id: int) -> DataFrame:
    """B3: re-pack with (batch_id, in_id) like the reference's
    ``batchId/inId`` counters (``HandlerMagpieKafka.java:840-864``).
    The log order already *is* a total order, so in_id is derived, not
    stateful — a two-phase global sequence over it (no single-task
    sort; see :func:`global_sequence`). The sequencer's per-batch
    cache handle is re-exposed on the returned frame so callers can
    release it after consuming."""
    gs = global_sequence(df, LOG_ORDER, out_col="in_id")
    out = gs.withColumn("batch_id", F.lit(batch_id))
    out._mts_seq_cache = gs._mts_seq_cache
    return out


def txn_end_position(batch: DataFrame) -> tuple[str, int] | None:
    """B4: the greatest (file, pos) of a transaction-end event in the
    batch — COMMIT rows (Xid events, ``MysqlTracker.java:339-346``) or
    DDL (auto-committing QUERY). Replay from a checkpoint must start at
    a txn boundary; the runner fences its commit watermark on this."""
    ends = batch.filter(F.col("op").isin("COMMIT") | F.col("is_ddl"))
    row = ends.agg(
        F.max(F.struct(F.col("file"), F.col("pos"))).alias("m")
    ).collect()[0]["m"]
    if row is None:
        return None
    return row["file"], row["pos"]


def offset_range(batch: DataFrame) -> dict:
    """(file,pos) min/max of the batch — the per-batch offset manifest
    entry (reference ZK checkpoint string, FIXTURES.md §3)."""
    r = batch.agg(
        F.min(F.struct("file", "pos")).alias("lo"),
        F.max(F.struct("file", "pos")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if r["n"] == 0:
        # empty batch: no offsets to report (mirror txn_end_position's
        # None contract instead of subscripting a NULL struct)
        return {
            "file_start": None, "pos_start": None,
            "file_end": None, "pos_end": None, "rows": 0,
        }
    return {
        "file_start": r["lo"]["file"],
        "pos_start": r["lo"]["pos"],
        "file_end": r["hi"]["file"],
        "pos_end": r["hi"]["pos"],
        "rows": r["n"],
    }


def after_gtid_set(df: DataFrame, executed: str) -> DataFrame:
    """GTID-set fencing: drop events whose transaction is inside the
    executed set ``"server_uuid:lo-hi[:lo2-hi2...]"`` (MySQL's
    interval-compressed GTID-set form, multi-interval supported; a lone
    number means that single transaction, per MySQL semantics). The
    fence compiles to a constant predicate, so it scales regardless of
    how many transactions the set covers; malformed sets raise rather
    than silently fencing nothing.

    Equivalence contract (tested): when the position watermark sits at
    a TRANSACTION BOUNDARY (B4/C4 — the only place the engine commits
    one), fencing by ``(file, pos)`` and fencing by the executed-GTID
    set select exactly the same DML suffix, because a transaction's
    events are contiguous in the log and its COMMIT is its last event.
    The reference itself discards GTID payloads and fences on position
    only (``GtidLogEvent.java:30-37``); this operator closes the
    north-star's "GTID+log-position offsets" vocabulary. Events without
    a gtid (DDL — auto-committing, no Xid) pass through.
    """
    inside = gtid_inside_predicate(executed)
    return df.filter(F.col("gtid").isNull() | ~inside)


_UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}(-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}$"
)


def parse_gtid_set(executed: str) -> dict[str, list[tuple[int, int]]]:
    """Parse the MySQL executed-GTID-set text form
    ``"uuid:lo-hi[:lo2-hi2...][,uuid2:...]"`` into
    ``{uuid: [(lo, hi), ...]}`` — THE one parser behind the Column
    predicate (:func:`gtid_inside_predicate`), the wire path's
    driver-side carry decision, and job-build validation, so the three
    can never disagree about the same gtid. A bare ``"uuid"`` entry
    (no intervals — the decode of an interval-less PREVIOUS_GTIDS SID
    block) is accepted and covers nothing; anything else malformed
    raises rather than silently fencing nothing. An EMPTY executed set
    also raises — spell "no fence" as ``None`` (``decode_previous_
    gtids_body() or None`` for fence self-seeding from a fresh
    server's empty preamble)."""
    entries = [e.strip() for e in executed.split(",") if e.strip()]
    if not entries:
        raise ValueError(f"malformed GTID set: {executed!r}")
    out: dict[str, list[tuple[int, int]]] = {}
    for entry in entries:
        parts = entry.split(":")
        if not parts[0]:
            raise ValueError(f"malformed GTID set: {entry!r}")
        if len(parts) < 2:
            if not _UUID_RE.match(parts[0]):
                raise ValueError(f"malformed GTID set: {entry!r}")
            out.setdefault(parts[0], [])
            continue
        ivs = out.setdefault(parts[0], [])
        for rng in parts[1:]:
            if "-" in rng:
                lo_s, hi_s = rng.split("-", 1)
                ivs.append((int(lo_s), int(hi_s)))
            else:
                ivs.append((int(rng), int(rng)))
    return out


def gtid_inside_predicate(executed: str):
    """The constant Column predicate ``gtid ∈ executed`` over a
    ``gtid`` column in MySQL ``"uuid:txn"`` text form — the core of
    :func:`after_gtid_set`, exposed separately so the wire path can
    apply it to the tiny GTID-frame projection (one row per
    transaction-opening GTID_LOG_EVENT) instead of per data row.
    Multi-uuid sets (comma-separated) are supported; malformed sets
    raise (via :func:`parse_gtid_set`) rather than silently fencing
    nothing."""
    parsed = parse_gtid_set(executed)
    g_uuid = F.substring_index(F.col("gtid"), ":", 1)
    g_txn = F.split(F.col("gtid"), ":").getItem(1).cast("long")
    inside = F.lit(False)
    for uuid, intervals in parsed.items():
        in_any = F.lit(False)
        for lo, hi in intervals:
            in_any = in_any | ((g_txn >= lo) & (g_txn <= hi))
        inside = inside | ((g_uuid == uuid) & in_any)
    return inside


def after_watermark(df: DataFrame, file: str | None, pos: int | None) -> DataFrame:
    """Fencing predicate: only events strictly beyond the committed
    watermark. (file, pos) compare is lexicographic on the struct —
    matches binlog file rotation ordering."""
    if file is None:
        return df
    wm = F.struct(F.lit(file).alias("file"), F.lit(pos).alias("pos"))
    return df.filter(F.struct(F.col("file"), F.col("pos")) > wm)
