"""Randomized model check for schema evolution: arbitrary interleavings
of merges (COW + MOR), ADD / DROP / RENAME COLUMN (including name
re-use), and compaction must always read back exactly what a plain
dict model says — renamed columns map through the chain, dropped-then-
re-added names never resurrect old bytes, compaction changes nothing.
"""

import random

import pytest
from pyspark.sql import types as T

from mysql_tracker_spark.lakestore import LakeTable

KEYS = [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 7)]


def _ch_schema(schema):
    return T.StructType(
        list(schema.fields) + [T.StructField("__delete", T.BooleanType())]
    )


@pytest.mark.parametrize("seed", [3, 11, 27, 58])
def test_random_evolution_matches_dict_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("c0", T.StringType()),
        ]
    )
    t = LakeTable.create(
        str(tmp_path / f"t{seed}"), schema, ["k", "i"], "k", n_buckets=2
    )
    # model: live payload column names (ordered) + per-key row dicts
    cols = ["c0"]
    truth: dict = {}
    n_named = 0
    retired: list[str] = []  # names available for re-use

    def verify():
        got = {}
        for r in t.read(spark).collect():
            got[(r["k"], r["i"])] = {c: r[c] for c in cols}
        want = {
            k: {c: v.get(c) for c in cols} for k, v in truth.items()
        }
        assert got == want, f"seed={seed} cols={cols}"

    for step in range(14):
        op = rng.choice(
            ["merge", "merge", "mor", "add", "drop", "rename", "compact"]
        )
        if op in ("merge", "mor"):
            rows = []
            for k in rng.sample(KEYS, rng.randint(1, 4)):
                delete = rng.random() < 0.2 and k in truth
                payload = {
                    c: (None if rng.random() < 0.15 else f"{c}.s{step}")
                    for c in cols
                }
                rows.append((k[0], k[1], *[payload[c] for c in cols], delete))
                if delete:
                    truth.pop(k, None)
                else:
                    truth[k] = payload
            df = spark.createDataFrame(rows, _ch_schema(t.schema()))
            (t.merge_mor if op == "mor" else t.merge)(spark, df)
        elif op == "add":
            # 50/50: brand-new name vs re-using a retired name — the
            # re-use case is the field-identity trap
            if retired and rng.random() < 0.5:
                name = retired.pop(rng.randrange(len(retired)))
            else:
                n_named += 1
                name = f"c{n_named}"
            t.update_schema(
                T.StructType(
                    list(t.schema().fields)
                    + [T.StructField(name, T.StringType())]
                ),
                note=f"add {name}",
            )
            cols.append(name)
            # model: existing rows read NULL for the new identity
            for v in truth.values():
                v[name] = None
        elif op == "drop" and len(cols) > 1:
            name = rng.choice(cols)
            t.update_schema(
                T.StructType(
                    [f for f in t.schema().fields if f.name != name]
                ),
                note=f"drop {name}",
            )
            cols.remove(name)
            retired.append(name)
            for v in truth.values():
                v.pop(name, None)
        elif op == "rename" and cols:
            old = rng.choice(cols)
            if retired and rng.random() < 0.5:
                new = retired.pop(rng.randrange(len(retired)))
            else:
                n_named += 1
                new = f"c{n_named}"
            t.rename_column(old, new)
            cols[cols.index(old)] = new
            retired.append(old)
            for v in truth.values():
                if old in v:
                    v[new] = v.pop(old)
        elif op == "compact":
            t.compact(spark)
        verify()
    # end-to-end invariants: fsck green, time travel to v1 still works
    assert t.validate(spark)["ok"]
