"""Benchmark harness: headline CDC MERGE-apply throughput plus the
contract query suite, one JSON line on stdout.

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] cores (default 32)
  BENCH_EVENTS        override synthetic change-event count
  BENCH_QUERIES=0     skip the query suite (apply-only, for scaling runs)

The headline metric mirrors BASELINE.md: sustained change-events/sec of
the fenced replay apply (decode -> filter -> LWW dedup -> MERGE ->
atomic commit) on a deterministic synthetic binlog. The reference's
single-JVM numbers to beat: ~543 ev/s sustained / ~208 entries/s
sink-bound (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    run_queries = os.environ.get("BENCH_QUERIES", "1") != "0"

    from mysql_tracker_spark.session import get_spark

    # small scan partitions so a single micro-batch file fans out over
    # all cores (decode parallelism is bounded by row groups x this)
    spark = get_spark(
        app_name="bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}

    # ---- headline: CDC apply throughput --------------------------------
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )

    n_events = int(os.environ.get("BENCH_EVENTS", 0)) or max(int(4_000_000 * sf), 20_000)
    n_batches = int(os.environ.get("BENCH_BATCHES", "4"))
    fmt = os.environ.get("BENCH_FORMAT", "typed")  # typed | wire
    work = tempfile.mkdtemp(prefix="mts_bench_")
    tbl_dir = os.environ.get("BENCH_TABLE_DIR") or os.path.join(work, "tbl")
    in_dir = os.environ.get("BENCH_INPUT_DIR")  # pre-generated input (scaling runs)
    if not in_dir:
        in_dir = os.path.join(work, "in")
        ev = gen_change_events(
            GenConfig(n_events=n_events, n_conversations=max(n_events // 40, 100), seed=42)
        )
        if fmt == "wire":
            from mysql_tracker_spark.sources.wire import write_wire_batches

            write_wire_batches(ev, in_dir, n_batches=n_batches)
        else:
            write_batches(ev, in_dir, n_batches=n_batches)

    t0 = time.time()
    # bucket count constant across parallelism levels (identical table
    # layout in scaling runs); > cores so the bucketed write load-balances
    job = CdcApplyJob(
        spark, in_dir, tbl_dir, n_buckets=64, files_per_batch=1, source_format=fmt
    )
    stats = job.run()
    apply_sec = time.time() - t0
    applied_events = sum(s.rows_in for s in stats)
    results["cdc_apply"] = round(apply_sec, 3)
    events_per_sec = round(applied_events / apply_sec, 1)

    # ---- contract query suite ------------------------------------------
    if run_queries:
        import __spark_entry__ as entrymod

        for name, fn in entrymod.queries().items():
            if name == "cdc_apply_transcripts_final":
                continue  # covered by the headline apply above
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                results[name] = round(time.time() - t0, 3)
            except Exception as e:  # keep the bench line intact
                results[name] = -1.0
                print(f"bench error {name}: {e}", file=sys.stderr)

    total = round(sum(v for v in results.values() if v > 0), 3)
    out = {
        "metric": "cdc_apply_events_per_sec",
        "value": events_per_sec,
        "unit": "events/sec",
        "queries": results,
        "sf": sf,
        "apply_events": applied_events,
        "apply_sec": round(apply_sec, 3),
        "suite_total_sec": total,
        "cores": cpus,
    }
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
