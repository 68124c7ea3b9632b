"""Sustained-volume apply bench (the 10^10-shape datapoint recorded in
BENCH/BASELINE.md): 64M generated wire events (~80.8M decoded change
rows after multi-row frame explode), 128 chunk files, 4 micro-batches
of 32, local[32], fresh table per rep, best of N.

The per-batch walls are the signal: they must stay FLAT as the table
grows 4x across the run — COW MERGE cost tracks the micro-batch
working set, not table size.

Usage: python tools/sustained_bench.py [n_events] [reps]
Input is cached under $BENCH_CACHE_DIR (default /tmp/mts_bench_cache)
keyed by size, like tools/scaling_bench.py.

SUSTAINED_AB_PREFETCH=1 switches to the prefetch A/B protocol
(round-4 VERDICT item 8): `reps` INTERLEAVED pairs of prefetch-ON /
prefetch-OFF applies (interleaving is this host's documented defense
against its multi-minute 2x slowdown windows — see BENCH/BASELINE.md),
each pair's final-table digests compared (must be identical), both
sides reported min-of-reps. This records the shipping default's
benefit at the headline volume, not just the round-3 10M-event A/B.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mysql_tracker_spark.runner import CdcApplyJob
from mysql_tracker_spark.session import get_spark
from mysql_tracker_spark.sources.wire import write_wire_distributed

N_CHUNKS = 128
FILES_PER_BATCH = 32


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cache_root = os.environ.get("BENCH_CACHE_DIR", "/tmp/mts_bench_cache")
    in_dir = os.path.join(cache_root, f"wire_v2_{n_events}_{N_CHUNKS}_42")
    spark = get_spark(cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(in_dir, "_COMPLETE")):
        shutil.rmtree(in_dir, ignore_errors=True)
        t0 = time.time()
        write_wire_distributed(
            spark, n_events, in_dir, n_chunks=N_CHUNKS, base_seed=42
        )
        open(os.path.join(in_dir, "_COMPLETE"), "w").write("ok")
        print(f"gen {time.time() - t0:.0f}s", file=sys.stderr)
    work = tempfile.mkdtemp(prefix="mts_sustained_")

    def one_rep(tbl: str, prefetch: bool) -> dict:
        t0 = time.time()
        job = CdcApplyJob(
            spark, in_dir, tbl, n_buckets=64,
            files_per_batch=FILES_PER_BATCH, source_format="wire",
            pipeline_prefetch=prefetch,
        )
        stats = job.run()
        wall = time.time() - t0
        ev = sum(s.rows_in for s in stats)
        return {
            "prefetch": prefetch,
            "wall": round(wall, 1),
            "events": ev,
            "eps": round(ev / wall),
            "batch_walls": [round(s.wall_ms / 1000, 1) for s in stats],
        }

    if os.environ.get("SUSTAINED_AB_PREFETCH", "0") == "1":
        from tools.scaling_bench import table_digest

        pairs = []
        for r in range(reps):
            pair = {}
            # alternate which side runs first: the session's one-time
            # JIT/slow-start penalty lands on the FIRST apply, and must
            # not systematically tax one arm (min-of-reps then absorbs
            # it for both)
            order = (("on", True), ("off", False))
            if r % 2:
                order = (order[1], order[0])
            for tag, pf in order:
                tbl = os.path.join(work, f"tbl_{tag}_{r}")
                rec = one_rep(tbl, pf)
                rec["digest"] = table_digest(tbl)
                print(json.dumps(rec), file=sys.stderr)
                pair[tag] = rec
                shutil.rmtree(tbl, ignore_errors=True)
            assert pair["on"]["digest"] == pair["off"]["digest"], (
                "prefetch changed the final table state"
            )
            pairs.append(pair)
        shutil.rmtree(work, ignore_errors=True)
        best_on = min(p["on"]["wall"] for p in pairs)
        best_off = min(p["off"]["wall"] for p in pairs)
        print(
            json.dumps(
                {
                    "protocol": "ab_prefetch_interleaved",
                    "n_events": n_events,
                    "prefetch_on_wall": best_on,
                    "prefetch_off_wall": best_off,
                    "speedup": round(best_off / best_on, 3),
                    "digests_identical": True,
                    "pairs": pairs,
                }
            )
        )
        return

    recs = []
    for r in range(reps):
        tbl = os.path.join(work, f"tbl_{r}")
        recs.append(one_rep(tbl, True))
        print(json.dumps(recs[-1]), file=sys.stderr)
        shutil.rmtree(tbl, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    best = min(recs, key=lambda x: x["wall"])
    print(json.dumps({"best": best, "reps": recs}))


if __name__ == "__main__":
    main()
