"""REAL concurrent-writer stress for the optimistic commit protocol:
multiple threads race genuine merge (COW) and merge_mor (delta)
commits against ONE table while a maintenance thread compacts, with
no injected interleavings (the monkeypatched single-window races live
in test_commit_conflict.py / test_mor.py). Assertions are invariant-
based, so any scheduling is a valid run:

- same-bucket COW conflicts must serialize (the loser re-merges
  against the new head), so the final value of every key is the value
  written by the HIGHEST-version committed merge that touched it —
  reconstructable post-hoc from the per-commit log the threads keep;
- the version chain stays contiguous (every rebase claims exactly
  head+1);
- deep fsck (placement + key uniqueness + footer drift) stays clean;
- losing COW attempts' staged files are reclaimable debris: gc_orphans
  removes them without touching live state.
"""

import os
import random
import threading
import time

from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.lakestore import CommitConflictError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
CH_SCHEMA = T.StructType(
    list(SCHEMA.fields) + [T.StructField("__delete", T.BooleanType())]
)

N_WRITERS = 4
N_ROUNDS = 4
KEYS_PER_MERGE = 12
ALL_KEYS = [(f"c{i}", j) for i in range(40) for j in range(4)]  # 160 keys


def _mk(spark, path):
    t = LakeTable.create(
        str(path), SCHEMA, key_cols=["conv_id", "turn_idx"],
        bucket_by="conv_id", n_buckets=8,
    )
    rows = [(c, j, f"v0-{c}-{j}") for c, j in ALL_KEYS]
    t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def test_racing_writers_and_compactor_converge(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    log_lock = threading.Lock()
    commit_log = []  # (version, [(key, text_or_None)]) per successful merge
    errors = []
    done = threading.Event()

    def writer(tid: int):
        rng = random.Random(1000 + tid)
        try:
            for r in range(N_ROUNDS):
                keys = rng.sample(ALL_KEYS, KEYS_PER_MERGE)
                recs = []
                for i, (c, j) in enumerate(keys):
                    if i < 2:  # a couple of deletes per round
                        recs.append((c, j, None, True))
                    else:
                        recs.append((c, j, f"w{tid}r{r}-{c}-{j}", False))
                ch = spark.createDataFrame(recs, CH_SCHEMA)
                while True:
                    try:
                        if r % 2 == 0:
                            v, _ = t.merge(spark, ch)
                        else:
                            v, _ = t.merge_mor(spark, ch)
                        break
                    except CommitConflictError:
                        continue  # replay against the new head
                with log_lock:
                    commit_log.append(
                        (v, [((c, j), None if d else x) for c, j, x, d in recs])
                    )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append((tid, repr(e)))

    def compactor():
        try:
            while not done.is_set():
                try:
                    t.compact(spark)
                except CommitConflictError:
                    pass
                time.sleep(0.2)
        except Exception as e:  # pragma: no cover
            errors.append(("compactor", repr(e)))

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(N_WRITERS)
    ]
    comp = threading.Thread(target=compactor)
    comp.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    done.set()
    comp.join(timeout=600)
    assert not errors, errors
    assert len(commit_log) == N_WRITERS * N_ROUNDS

    # every commit claimed a distinct version; chain is contiguous
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(t.snap_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    assert versions == list(range(versions[0], versions[-1] + 1))
    for v in versions[1:]:
        assert t.manifest(v)["parent"] == v - 1

    # post-hoc LWW: highest-version commit touching a key decides it
    expected = {(c, j): f"v0-{c}-{j}" for c, j in ALL_KEYS}
    for v, recs in sorted(commit_log):
        for key, text in recs:
            if text is None:
                expected.pop(key, None)
            else:
                expected[key] = text
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(spark).collect()
    }
    assert got == expected

    rep = t.validate(spark, deep=True)
    assert rep["ok"], rep["issues"]

    # losing COW attempts leave staged debris only; reclaim must not
    # touch live state (all writers are done, so age guard can be 0)
    t.gc_orphans(min_age_s=0.0)
    got2 = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(spark).collect()
    }
    assert got2 == expected
    rep2 = t.validate(spark, deep=True)
    assert rep2["ok"], rep2["issues"]
