"""Profile the apply pipeline phase-by-phase at a given core count.

Usage: python tools/profile_scaling.py <cores> <input_dir> [events]
Generates input into <input_dir> if empty. Prints JSON phase timings.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main():
    cores = int(sys.argv[1])
    in_dir = sys.argv[2]
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 1_600_000

    from mysql_tracker_spark.session import get_spark
    from mysql_tracker_spark.schema import RAW_FRAME_SCHEMA
    from mysql_tracker_spark.sources.wire import decode_frames, write_wire_batches
    from mysql_tracker_spark.sources.binlog_gen import GenConfig, gen_change_events

    if not os.path.isdir(in_dir) or not os.listdir(in_dir):
        os.makedirs(in_dir, exist_ok=True)
        ev = gen_change_events(
            GenConfig(n_events=n_events, n_conversations=max(n_events // 40, 100), seed=42)
        )
        write_wire_batches(ev, in_dir, n_batches=4)

    spark = get_spark(
        app_name=f"profile{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    phases = {}

    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
    )

    raw = spark.read.schema(RAW_FRAME_SCHEMA).parquet(*files)
    t0 = time.time()
    n = raw.count()
    phases["raw_scan_count"] = round(time.time() - t0, 2)

    t0 = time.time()
    dec = decode_frames(raw)
    n = dec.count()
    phases["decode_count"] = round(time.time() - t0, 2)
    phases["decoded_rows"] = n

    from pyspark.sql import functions as F
    from mysql_tracker_spark.operators.dedup import lww_latest
    from mysql_tracker_spark.operators.filters import dml_for_table
    from mysql_tracker_spark.schema import LOG_ORDER

    t0 = time.time()
    dml = dml_for_table(dec, "chat", "transcripts")
    keyed = dml.select(
        F.element_at("after", "conv_id").alias("conv_id"),
        F.element_at("after", "turn_idx").cast("int").alias("turn_idx"),
        *[F.col(c) for c in LOG_ORDER],
        "op",
        "after",
    )
    latest = lww_latest(keyed, ["conv_id", "turn_idx"], ["op", "after"])
    n2 = latest.count()
    phases["decode_dedup_count"] = round(time.time() - t0, 2)
    phases["deduped_rows"] = n2

    # full apply
    from mysql_tracker_spark.runner import CdcApplyJob

    tbl = tempfile.mkdtemp(prefix=f"prof_tbl_{cores}_")
    t0 = time.time()
    job = CdcApplyJob(spark, in_dir, tbl, n_buckets=64, files_per_batch=1, source_format="wire")
    stats = job.run()
    phases["full_apply"] = round(time.time() - t0, 2)
    phases["batch_wall_ms"] = [s.wall_ms for s in stats]
    phases["batch_phases"] = [s.phase_ms for s in stats]
    phases["cores"] = cores
    print(json.dumps(phases))
    spark.stop()


if __name__ == "__main__":
    main()
