"""Measured skew evidence for the as-of join's two paths.

Workload: one flooded key owning `hot_frac` of all rows (the hot-
conversation shape from the north rule) spread over a time range many
tolerance-windows wide, plus a uniform remainder. The window path
(`asof_join`) must sort the whole hot key in ONE task; the binned path
(`asof_join_binned`) spreads the same key over its time bins. Same
results (asserted on a digest), different walls — the gap is the
single-task funnel, measured.

Usage: python tools/asof_bench.py [n_left] [n_right] [hot_frac]
Prints one JSON line; paste results into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mysql_tracker_spark.operators.asof import asof_join, asof_join_binned
from mysql_tracker_spark.session import get_spark

TOL = 3600.0  # 1h lookback
# time span sized so the hot key sees ~10 right rows per tolerance
# window — realistic event density; the binned path's per-(key,bin)
# candidate product is density-bounded BY DESIGN (a tolerance join is
# quadratic in per-window density on any engine), while the window
# path's cost concentrates in one task regardless of span
SPAN_WINDOWS = 400_000
RCOLS = {"match_rid": "rid", "match_ts": "ts"}


def gen(spark, n, n_keys, hot_frac, seed_mult, id_name):
    """Deterministic skewed frame: `hot_frac` of rows on key 'hot'."""
    hot_n = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < hot_n, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")))
        .alias("key"),
        F.col("id").alias(id_name),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * seed_mult) % (SPAN_WINDOWS * int(TOL))
        ).alias("ts"),
    )


def digest(df) -> tuple:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("key", "lid", "match_rid").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def main():
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="asof_bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    left = gen(spark, n_left, 1000, hot_frac, 137, "lid").cache()
    right = gen(spark, n_right, 1000, hot_frac, 211, "rid").cache()
    left.count(), right.count()  # materialize inputs outside the timings

    def timed(fn):
        t0 = time.time()
        d = digest(fn())
        return round(time.time() - t0, 2), d

    w_sec, w_dig = timed(
        lambda: asof_join(
            left, right, ["key"], "ts", "ts", RCOLS,
            tie_cols=("rid",), tolerance_s=TOL,
        )
    )
    b_sec, b_dig = timed(
        lambda: asof_join_binned(
            left, right, ["key"], "ts", "ts", RCOLS,
            left_id=["lid"], tolerance_s=TOL, tie_cols=("rid",),
        )
    )
    assert w_dig == b_dig, f"path divergence: {w_dig} vs {b_dig}"
    print(json.dumps({
        "n_left": n_left, "n_right": n_right, "hot_frac": hot_frac,
        "cores": cpus, "window_path_sec": w_sec, "binned_path_sec": b_sec,
        "speedup": round(w_sec / b_sec, 2), "digest_equal": True,
        "rows": w_dig[0],
    }))


if __name__ == "__main__":
    main()
