"""Two-parallelism-level scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the north_rule's
"N vs 4N executors" criterion is evidenced by running the SAME apply
job on the SAME pre-generated input at local[N] and local[4N]
(spark.sql.shuffle.partitions scaled with cores), reporting both
throughputs and efficiency = (T_N / T_4N) / 4, and checking both runs
converge to the identical final table (which also equals the
sequential oracle).

Usage: python tools/scaling_bench.py [n_events] [N] [--format wire]
Writes BENCH/BASELINE.md and prints a JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def table_digest(table_path: str) -> tuple[int, str]:
    """Order-insensitive digest of a lakestore table's live rows, read
    straight from the manifest with DuckDB (no Spark needed)."""
    import duckdb

    from mysql_tracker_spark.lakestore import LakeTable

    t = LakeTable.load(table_path)
    files = [os.path.join(table_path, p) for p in t.live_files()]
    if not files:
        return 0, "empty"
    con = duckdb.connect()
    flist = ", ".join(f"'{f}'" for f in files)
    n, dig = con.execute(
        f"""
        SELECT count(*),
               md5(string_agg(md5(concat_ws('|', conv_id, turn_idx, role, text, tool, ts, score)), '' ORDER BY conv_id, turn_idx))
        FROM read_parquet([{flist}], union_by_name=true)
        """
    ).fetchone()
    return n, dig


def run_level(cores: int, in_dir: str, tbl_dir: str, fmt: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        BENCH_QUERIES="0",
        BENCH_INPUT_DIR=in_dir,
        BENCH_TABLE_DIR=tbl_dir,
        BENCH_FORMAT=fmt,
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["cmdline"] = (
        f"SPARK_GRAFT_CPUS={cores} BENCH_QUERIES=0 BENCH_FORMAT={fmt} "
        f"BENCH_INPUT_DIR=<shared> python bench.py   "
        f"# ≡ spark-submit --master local[{cores}] --conf spark.sql.shuffle.partitions={cores}"
    )
    return rec


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    fmt = "wire" if "--format" in sys.argv and "wire" in sys.argv else os.environ.get("SCALE_FORMAT", "wire")
    n_high = n_low * 4

    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
        write_batches,
    )
    from mysql_tracker_spark.sources.wire import write_wire_batches

    work = tempfile.mkdtemp(prefix="mts_scale_")
    in_dir = os.path.join(work, "in")
    print(f"generating {n_events} events ({fmt}) ...", file=sys.stderr)
    ev = gen_change_events(
        GenConfig(n_events=n_events, n_conversations=max(n_events // 40, 100), seed=42)
    )
    if fmt == "wire":
        write_wire_batches(ev, in_dir, n_batches=4)
    else:
        write_batches(ev, in_dir, n_batches=4)

    results = {}
    digests = {}
    for cores in (n_low, n_high):
        tbl = os.path.join(work, f"tbl_{cores}")
        print(f"running local[{cores}] ...", file=sys.stderr)
        results[cores] = run_level(cores, in_dir, tbl, fmt)
        digests[cores] = table_digest(tbl)
        print(f"local[{cores}]: {results[cores]['value']} ev/s, digest {digests[cores]}", file=sys.stderr)

    t_low = results[n_low]["apply_sec"]
    t_high = results[n_high]["apply_sec"]
    eff = (t_low / t_high) / (n_high / n_low)
    identical = digests[n_low] == digests[n_high]

    md = f"""# BENCH — scaling evidence ({time.strftime('%Y-%m-%d %H:%M')} UTC)

Protocol per BASELINE.md: same job, same pre-generated input
({n_events:,} change events, {fmt} format, 4 micro-batches), two local
parallelism levels standing in for N vs 4N executors;
`spark.sql.shuffle.partitions` scaled with cores.

| level | cores | events applied | apply wall (s) | events/s |
|---|---|---|---|---|
| N  | {n_low} | {results[n_low]['apply_events']:,} | {t_low} | {results[n_low]['value']:,} |
| 4N | {n_high} | {results[n_high]['apply_events']:,} | {t_high} | {results[n_high]['value']:,} |

**Scaling efficiency = (T_N / T_4N) / 4 = {eff:.3f}** (target >= 0.8).

Correctness gate: both runs' final lakestore tables are
{"**identical** (same row count + order-insensitive digest)" if identical else "**DIFFERENT — FAIL**"}:
N digest = `{digests[n_low]}`, 4N digest = `{digests[n_high]}`.
Replay-convergence (kill/restart) and sequential-oracle equality are
asserted by `tests/test_e2e_replay.py`.

Command lines:

```
{results[n_low]['cmdline']}
{results[n_high]['cmdline']}
```

Reference single-JVM baseline (BASELINE.md): ~543 events/s sustained,
~208 entries/s sink-bound.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    summary = {
        "n_events": n_events,
        "format": fmt,
        "levels": {str(c): results[c]["value"] for c in results},
        "efficiency": round(eff, 3),
        "identical_final_state": identical,
    }
    print(json.dumps(summary))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
