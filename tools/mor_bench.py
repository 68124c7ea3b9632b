"""COW vs MOR growing-table bench: the measurement behind the
merge-on-read sink mode.

Protocol: one wire input of ``n_chunks`` equal files; both variants
bootstrap the table from the first ``base_files`` files in ONE big
batch (identical cost, not part of the comparison), then the remaining
TAIL files are applied one micro-batch at a time, ALTERNATING
cow/mor per file — pairwise batches share host conditions, cancelling
the multi-minute host-drift windows this VM exhibits (a first attempt
ran the modes sequentially and drift swamped the signal: identical
decode work measured 3.6 s in one block and 4.4 s in the other). The
steady-state regime under measurement: table ≫ batch, every batch's
keys spread across all buckets. COW pays a rewrite of every affected
bucket per batch (cost tracks TABLE size); MOR commits the staged
delta by rename (cost tracks BATCH size) plus threshold-amortized
compactions (write-amp 1/K for read-amp ≤K — the LSM trade, so the
merge-phase ratio ≈ min(threshold, table/batch)). After the tail the
MOR table is fully compacted (wall reported — part of MOR's honest
total) and both tables are digest-compared: identical final state is
asserted before any number is reported.

Output: one JSON line with per-batch walls, merge-phase walls, totals,
and the equality verdict. Defaults run in ~15 min at local[32]; scale
with MORB_* env vars.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_tracker_spark.session import get_spark
from tools.scaling_bench import table_digest


def main() -> None:
    cores = int(os.environ.get("MORB_CPUS", "32"))
    n_events = int(os.environ.get("MORB_EVENTS", 16_000_000))
    n_chunks = int(os.environ.get("MORB_CHUNKS", "160"))
    base_files = int(os.environ.get("MORB_BASE_FILES", "152"))
    threshold = int(os.environ.get("MORB_COMPACT_THRESHOLD", "8"))
    work = os.environ.get("MORB_WORK", "/tmp/mts_mor_bench")
    cache_root = os.environ.get("BENCH_CACHE_DIR", "/tmp/mts_bench_cache")

    spark = get_spark(cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.wire import write_wire_distributed

    key = f"morb_{n_events}_{n_chunks}"
    in_dir = os.path.join(cache_root, key)
    marker = os.path.join(in_dir, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(in_dir, ignore_errors=True)
        t0 = time.time()
        write_wire_distributed(spark, n_events, in_dir, n_chunks=n_chunks)
        open(marker, "w").write("ok")
        print(f"gen {n_events} events: {time.time()-t0:.0f}s", file=sys.stderr)

    os.makedirs(work, exist_ok=True)
    out: dict = {
        "events": n_events,
        "chunks": n_chunks,
        "base_files": base_files,
        "tail_files": n_chunks - base_files,
        "compact_threshold": threshold,
        "cores": cores,
    }

    tables, jobs = {}, {}
    for mode in ("cow", "mor"):
        tbl = os.path.join(work, f"tbl_{mode}")
        shutil.rmtree(tbl, ignore_errors=True)
        tables[mode] = tbl
        kw = dict(
            n_buckets=64,
            source_format="wire",
            write_mode=mode,
            mor_compact_threshold=threshold,
        )
        # bootstrap: one big batch over the base files (shared cost,
        # not part of the comparison — host drift between the two
        # blocks makes these two walls incomparable by design)
        t0 = time.time()
        CdcApplyJob(spark, in_dir, tbl, files_per_batch=base_files, **kw).run(
            max_batches=1
        )
        out[f"{mode}_bootstrap_s"] = round(time.time() - t0, 2)
        # tail applier: one file per micro-batch, driven below
        jobs[mode] = CdcApplyJob(spark, in_dir, tbl, files_per_batch=1, **kw)
        out[f"{mode}_batch_walls_s"] = []
        out[f"{mode}_merge_phase_s"] = []
        out[f"{mode}_tail_events"] = 0

    # steady-state tail, INTERLEAVED: batch i runs cow-then-mor
    # back-to-back so each pair shares host conditions
    # slice off the base files (already committed by the bootstrap;
    # re-checking their fences 150x would just measure the skip path)
    groups = {m: jobs[m].batch_files()[base_files:] for m in jobs}
    n_tail = len(groups["cow"])
    assert len(groups["mor"]) == n_tail
    for m in jobs:
        jobs[m].prepare()
    for i in range(n_tail):
        for m in ("cow", "mor"):
            s = jobs[m].apply_batch(base_files + i, groups[m][i])
            if s.skipped:
                continue
            out[f"{m}_batch_walls_s"].append(round(s.wall_ms / 1000, 2))
            out[f"{m}_merge_phase_s"].append(
                round(s.phase_ms.get("merge", 0) / 1000, 2)
            )
            out[f"{m}_tail_events"] += s.rows_in
            if m == "mor" and s.compacted_buckets:
                out["mor_compactions"] = out.get("mor_compactions", 0) + 1
    out.setdefault("mor_compactions", 0)
    for m in ("cow", "mor"):
        out[f"{m}_tail_s"] = round(sum(out[f"{m}_batch_walls_s"]), 2)
        out[f"{m}_tail_batches"] = len(out[f"{m}_batch_walls_s"])
    # final full compaction: part of MOR's honest cost, and it makes
    # the raw-file digest below valid
    t0 = time.time()
    jobs["mor"].table.compact(spark)
    out["mor_final_compact_s"] = round(time.time() - t0, 2)

    n_cow, d_cow = table_digest(tables["cow"])
    n_mor, d_mor = table_digest(tables["mor"])
    out["rows"] = n_cow
    out["digest_equal"] = (n_cow, d_cow) == (n_mor, d_mor)
    assert out["digest_equal"], f"FINAL STATE DIVERGED: {(n_cow, d_cow)} vs {(n_mor, d_mor)}"
    out["tail_speedup"] = round(out["cow_tail_s"] / (out["mor_tail_s"] + out["mor_final_compact_s"]), 2)
    out["merge_phase_speedup"] = round(
        sum(out["cow_merge_phase_s"]) / max(sum(out["mor_merge_phase_s"]), 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
