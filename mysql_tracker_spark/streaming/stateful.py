"""Custom STATEFUL streaming operator (SURVEY.md §2.9 streaming notes):
cross-micro-batch sessionization via ``applyInPandasWithState``.

The batch engine already sessionizes with lead/lag windows
(``__spark_entry__.q_cdc_sessionization``); a live tail cannot — a
session spanning two micro-batches needs carried state. This operator
keeps one open session per key in the state store and emits sessions
the moment they CLOSE (a later event arrives past the gap), the
classic event-stream segmentation shape the reference's per-minute
monitor windows approximate (``tracker/monitor/JrdwMonitorVo.java``
minute buckets, generalized).

Scale stance: state is O(keys) — three longs per key, not per event;
each micro-batch shuffles only on the session key (the same hash
partitioning every stateful operator pays). ORDERING CONTRACT: Spark's
file stream source delivers files in MODIFICATION-TIME order, so
cross-batch per-key time order holds only when files are produced
in-order (the normal live-tail case: write order == mtime order == log
order). A backfill/copy that reorders mtimes violates it — drain such
input through the batch path (or a fresh checkpoint after mtimes
settle); sessions would otherwise close early and re-open. (The CDC
table apply path is NOT exposed to this: its streaming front-end
re-orders by manifest, see stream_runner.) Arrow-batched (pandas), no
per-row Python through the serializer.

Timestamps ride as epoch MICROSECONDS (long) end-to-end — no session
timezone ambiguity in state or output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """``events`` (streaming) -> stream of CLOSED sessions
    ``(user_id, start_us, end_us, n_events)``.

    A session closes when a later event of the same key arrives more
    than ``gap_s`` after the session's last event; the still-open
    session stays in the per-key state store across micro-batches (and
    across restarts via the streaming checkpoint). Events within one
    micro-batch may arrive unsorted — each batch is sorted per key —
    but batches themselves must be in per-key time order (see the
    module docstring's ordering contract: true for in-order-produced
    files, NOT guaranteed under mtime-reordering backfills)."""
    gap_us = int(gap_s * 1_000_000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        chunks = [p[["__us"]] for p in pdfs]
        # a null/unparseable ts arrives as NaN (pandas floats the long
        # column) — one poison event must not kill the query with
        # int(NaN), and NaN comparisons would corrupt the gap logic for
        # every later event of the key; such events carry no position
        # on the session timeline, so drop them
        rows = (
            pd.concat(chunks, ignore_index=True)
            .dropna(subset=["__us"])
            .sort_values("__us")
        )
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        for us in rows["__us"].tolist():
            us = int(us)
            if start is None:
                start, last, n = us, us, 1
            elif us - last > gap_us:
                out.append((uid, start, last, n))
                start, last, n = us, us, 1
            else:
                last = us
                n += 1
        if start is not None:
            state.update((int(start), int(last), int(n)))
        yield pd.DataFrame(out, columns=["user_id", "start_us", "end_us", "n_events"])

    # NOTE: only the key and the event time enter the stateful shuffle
    # — carrying per-event payload columns through the groupBy exchange
    # and the Arrow transfer would be pure wasted bytes on the hot path
    del id_col
    keyed = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_files(
    spark,
    in_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    out_dir: str,
    gap_s: float = 1800.0,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive :func:`sessionize_stream` over a directory of
    time-ordered event files (availableNow drain, one file per
    micro-batch so state genuinely carries across batches) into a
    parquet file sink (restart-capable: a later drain with the same
    checkpoint resumes both source offsets AND operator state);
    returns everything emitted so far as a batch frame."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(in_dir)
    )
    q = (
        sessionize_stream(src, gap_s=gap_s)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(SESSION_SCHEMA).parquet(out_dir)
