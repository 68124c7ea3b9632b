"""Canonical schemas of the engine (FIXTURES.md sections 1-3).

These mirror the reference's data shapes without any protobuf/Avro —
columns *are* the schema:

* ``CHANGE_EVENT_SCHEMA``  — one typed change record per row; the flat
  union of the reference's ``CanalEntry.Entry`` header
  (``protocol/protobuf/EntryProtocol.proto:32-68``) and the flattened
  Avro record (``protocol/avro/EventEntry.avro:1-17``): scalars +
  ``before``/``after`` maps (Avro ``source``/``current``).
* ``TRANSCRIPTS_BASE_SCHEMA`` — the MERGE target per BASELINE.json
  ``input_hint``; evolves via DDL events (add column / type widen).
* ``RAW_FRAME_SCHEMA`` — undecoded wire frames, the analogue of the
  byte stream the reference's ``DirectLogFetcherChannel`` feeds into
  ``LogDecoder.decode`` (``mysql/dbsync/LogDecoder.java:94-491``).
* ``LINEAGE_SCHEMA`` — per-batch checkpoint/lineage rows, the analogue
  of the ZK checkpoint string ``"file:pos:batchId:inId"``
  (``tracker/HandlerMagpieKafka.java:966-1033``) plus the monitor
  counters (``monitor/TrackerMonitor.java:16-64``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- change events (FIXTURES.md §2) -----------------------------------------

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("row_idx", T.IntegerType(), True),
        T.StructField("server_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("xid", T.LongType(), True),
        # GTID "server_uuid:txn_no" of the event's transaction. The
        # reference decodes GTID events but DISCARDS the payload
        # (mysql/dbsync/event/GtidLogEvent.java:30-37) and fences on
        # (file,pos) only; we carry it so a GTID-set fence is available
        # and provably equivalent at txn boundaries (operators.parse.
        # after_gtid_set + tests). DDL events carry no gtid (faithful).
        T.StructField("gtid", T.StringType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("schema_name", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("is_ddl", T.BooleanType(), True),
        T.StructField("ddl_sql", T.StringType(), True),
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# ops carried by row-change events (EntryProtocol.proto:185-198 subset we use)
DML_OPS = ("INSERT", "UPDATE", "DELETE")
# transaction-delimiter pseudo-events (EntryType TRANSACTIONBEGIN/END,
# EntryProtocol.proto:176-182; Xid handling LogEventConvert.java:298-302)
TXN_OPS = ("BEGIN", "COMMIT")
DDL_OPS = ("ALTER", "CREATE", "DROP", "TRUNCATE", "RENAME")

# --- transcripts target (FIXTURES.md §1, BASELINE.json input_hint) ----------

TRANSCRIPTS_BASE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TRANSCRIPTS_KEY = ("conv_id", "turn_idx")

# --- typed-metrics target (SURVEY.md §1.2 type-surface coverage) -------------
# Exercises the frozen stringification rules in values.py end-to-end:
# unsigned-promoted integer columns (TINY->short ... LONGLONG->decimal),
# DECIMAL toPlainString, and the temporal TEXT columns that must stay
# strings because the reference's zero-date sentinel ("0000-00-00 ...",
# RowsLogBuffer.java:395-449) is not a representable Timestamp/Date.
METRICS_TYPED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("u8", T.ShortType(), True),       # unsigned TINY
        T.StructField("u16", T.IntegerType(), True),    # unsigned SHORT
        T.StructField("u24", T.IntegerType(), True),    # unsigned INT24
        T.StructField("u32", T.LongType(), True),       # unsigned LONG
        T.StructField("u64", T.DecimalType(20, 0), True),  # unsigned LONGLONG
        T.StructField("price", T.DecimalType(12, 4), True),
        T.StructField("dur", T.StringType(), True),     # TIME (text, ±838h)
        T.StructField("born", T.StringType(), True),    # DATE (zero sentinel)
        T.StructField("y", T.StringType(), True),       # YEAR ("0000" | 1901+)
        T.StructField("created", T.StringType(), True),  # TIMESTAMP (sentinel)
        T.StructField("ratio", T.DoubleType(), True),
    ]
)
# total order of the log; ties impossible (SURVEY.md §7 "hard parts")
LOG_ORDER = ("file", "pos", "row_idx")

# --- raw wire frames (sources.wire) ------------------------------------------

RAW_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

# --- lineage / checkpoint (FIXTURES.md §3) -----------------------------------

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("file_start", T.StringType(), True),
        T.StructField("pos_start", T.LongType(), True),
        T.StructField("file_end", T.StringType(), True),
        T.StructField("pos_end", T.LongType(), True),
        T.StructField("txn_file_end", T.StringType(), True),
        T.StructField("txn_pos_end", T.LongType(), True),
        T.StructField("rows_applied", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)
