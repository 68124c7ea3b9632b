"""Event-time windowed aggregation with late-data WATERMARK handling
(SURVEY.md §2.9 streaming notes; the brief's "watermarks + windowed
aggs for late data").

The batch engine aggregates minute/hour windows after the fact
(``metrics.per_minute_windows``, contract row ``cdc_window_hourly``);
a live tail needs bounded state: the watermark lets Spark finalize and
EMIT a window once event time has moved ``delay`` past its end, drop
events arriving later than that, and discard the window's state — the
standard bounded-lateness contract (Structured Streaming paper,
SIGMOD 2018 §4.3).

State is O(open windows × groups), not O(events); the aggregation is
hash-partial like any groupBy — no per-event state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _out_schema(group_col: str, group_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("win_start", T.TimestampType()),
            T.StructField("win_end", T.TimestampType()),
            T.StructField(group_col, group_type),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    delay: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-window per-group counts + exact sums of
    ``value_col`` (must be castable to decimal). ``delay`` is the
    allowed lateness: an event older than ``max(event time seen) -
    delay`` is dropped; a window is emitted (append mode) once the
    watermark passes its end, then its state is freed."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            group_col,
            "n",
            "total",
        )
    )


def run_windowed_counts_files(
    spark,
    in_dir: str,
    schema,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    delay: str = "1 hour",
    group_col: str = "event_type",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain a directory of time-ordered event files through the
    watermarked windowed aggregation (one file per micro-batch, so the
    watermark genuinely advances batch over batch) into a parquet
    append sink; returns everything FINALIZED so far. Windows still
    open at the end of the drain stay in state (and would emit on a
    later drain with the same checkpoint)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(in_dir)
    )
    q = (
        windowed_counts_stream(src, window=window, delay=delay, group_col=group_col)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: a drain that finalized no window leaves a
    # data-less sink dir, where schema inference would raise. The group
    # column keeps ITS OWN type from the input schema — requesting
    # StringType for e.g. an INT64 parquet column would fail the read
    return spark.read.schema(
        _out_schema(group_col, schema[group_col].dataType)
    ).parquet(out_dir)
