"""mysql_tracker_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference CDC
tracker ``wuce7758/mysql-tracker`` (a single-process Java binlog dumper:
fetch -> decode -> convert -> filter -> batch -> sink -> checkpoint,
see ``/root/reference/src/main/java/tracker/HandlerMagpieKafka.java``)
as a distributed Spark DataFrame pipeline:

* raw binlog-style event batches (binary wire frames or typed rows) are
  decoded by vectorized Arrow/pandas stages (``operators.parse``),
* filtered (``operators.filters``: regex / allowlist / query-class /
  event-type, mirroring the reference's FilterMatcher + filterMap),
* deduplicated last-writer-wins per ``(conv_id, turn_idx)`` keyed on the
  total log order ``(file, pos, row_idx)`` (``operators.dedup``),
* MERGE-upserted into a snapshot-versioned, hash-bucketed lakehouse
  table (``lakestore`` — Iceberg-like semantics implemented from
  scratch over parquet: atomic manifest commits, copy-on-write bucketed
  merge, schema evolution, snapshot properties for offset fencing),
* with exactly-once replay guaranteed by offset-range fencing recorded
  in the same atomic commit as the data (``checkpoint`` semantics the
  reference only approximates at-least-once via ZooKeeper confirms,
  ``HandlerMagpieKafka.java:966-1103``).

Everything is public PySpark API; no per-row Python in any hot path.
"""

__version__ = "0.1.0"
