"""Structured Streaming front-end (SURVEY.md §2.8 O1 as a streaming
query).

The batch replay loop (``runner.CdcApplyJob``) is the canonical apply
path; this wraps the same ``apply_df`` in ``readStream -> foreachBatch``
so an unbounded directory of arriving micro-batch files is tailed like
the reference tails the binlog socket:

* source: parquet file stream over the input directory
  (``maxFilesPerTrigger`` plays the reference's flush-threshold role,
  B2 — batchsize/spacesize/timeInterval);
* sink: ``foreachBatch`` -> the fenced lakestore MERGE. Exactly-once
  holds even though foreachBatch is at-least-once: re-delivered
  batches are fenced out by the offset watermark committed atomically
  with the data (the streaming checkpoint only avoids re-reading
  files; correctness never depends on it);
* ordering: file names are offset-ordered; within a micro-batch LWW
  dedup handles any interleaving, and delivery of files is in-order
  per the file-stream source's sorted listing.

No event-time watermark is needed for correctness — order is
positional, as in the reference (SURVEY.md §2.9 streaming notes); the
lag metric (M3) rides in the per-batch lineage rows.

The exactly-once-through-idempotent-sink shape (at-least-once
micro-batch delivery + transactional/idempotent writer keyed by batch
range) follows the design described in "Structured Streaming: A
Declarative API for Real-Time Applications in Apache Spark" (SIGMOD
2018) §3.2; our lakestore commit carries the fencing range itself, so
correctness never depends on the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..runner import ApplyStats, CdcApplyJob
from ..schema import CHANGE_EVENT_SCHEMA, RAW_FRAME_SCHEMA


class CdcStreamJob:
    """Tail an input directory as a stream and apply each micro-batch
    exactly once into the lakestore table."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        table_path: str,
        checkpoint_dir: str,
        source_format: str = "typed",
        max_files_per_trigger: int = 1,
        **job_kwargs,
    ):
        self.job = CdcApplyJob(
            spark, input_dir, table_path, source_format=source_format, **job_kwargs
        )
        self.spark = spark
        self.input_dir = input_dir
        self.checkpoint_dir = checkpoint_dir
        self.source_format = source_format
        self.max_files_per_trigger = max_files_per_trigger
        self.stats: list[ApplyStats] = []

    def _apply(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.source_format == "wire":
            # the optimized wire path: JVM manifest pass + single Arrow
            # decode + narrow dedup + bucket-aligned delta MERGE
            self.stats.append(self.job._apply_wire_df(int(epoch_id), batch_df))
        else:
            self.stats.append(self.job.apply_df(int(epoch_id), batch_df))

    def start(self, available_now: bool = True):
        """Start the streaming query. ``available_now=True`` drains the
        current directory contents then stops (replay mode); False
        keeps tailing with the default processing-time trigger."""
        self.job.prepare()
        schema = RAW_FRAME_SCHEMA if self.source_format == "wire" else CHANGE_EVENT_SCHEMA
        reader = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .parquet(self.input_dir)
        )
        writer = (
            reader.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_available(self):
        """Convenience: drain everything currently in the directory and
        block until done."""
        q = self.start(available_now=True)
        q.awaitTermination()
        return self.stats
