"""Deterministic sampling operators (functions/sampling.py):
mixture_sample (hash-threshold Bernoulli) and token_budget_sample
(hash-ordered budget prefix)."""

import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.functions.sampling import (
    hash_uniform,
    mixture_sample,
    token_budget_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_uniform_golden(spark):
    # frozen draw: md5('7' || 's1')[:8] as u32 / 2^32 — recomputed here
    # in python so an engine-side md5/conv regression is caught exactly
    import hashlib

    df = spark.range(7, 8).select(hash_uniform(F.col("id"), "s1").alias("u"))
    got = df.first()["u"]
    exp = int(hashlib.md5(b"7s1").hexdigest()[:8], 16) / 2**32
    assert abs(got - exp) < 1e-12


def test_mixture_sample_deterministic_and_rate(docs):
    w = {"en": 0.8, "de": 0.5, "fr": 0.25, "es": 0.1}
    a = mixture_sample(docs, w, default_weight=0.05).select("doc_id").collect()
    b = mixture_sample(docs, w, default_weight=0.05).select("doc_id").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)

    kept = mixture_sample(docs, w, default_weight=0.05)
    rates = {
        r["lang"]: r["rate"]
        for r in kept.groupBy("lang").count()
        .join(docs.groupBy("lang").agg(F.count("*").alias("n")), "lang")
        .select("lang", (F.col("count") / F.col("n")).alias("rate"))
        .collect()
    }
    for lang, weight in w.items():
        # Bernoulli over ~60-220 rows per lang: generous 3-sigma-ish band
        tol = 3 * (weight * (1 - weight) / 60) ** 0.5 + 0.02
        assert abs(rates[lang] - weight) < tol, (lang, rates[lang], weight)


def test_mixture_sample_is_scan_local(docs):
    plan = mixture_sample(docs, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mixture_sample_validates_weights(docs):
    with pytest.raises(ValueError):
        mixture_sample(docs, {"en": 1.5})
    with pytest.raises(ValueError):
        mixture_sample(docs, {"en": 0.5}, default_weight=-0.1)


def test_token_budget_exact_prefix(docs, spark):
    budgets = {"en": 3000, "de": 1200, "zh": 600}
    d = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    out = token_budget_sample(d, budgets, token_col="n_tokens", salt="budget-v1")
    rows = out.collect()
    # only budgeted groups appear, and budgets are never exceeded
    per_group_max = {}
    for r in rows:
        assert r["lang"] in budgets
        per_group_max[r["lang"]] = max(per_group_max.get(r["lang"], 0), r["running_tokens"])
    for g, m in per_group_max.items():
        assert m <= budgets[g]

    # prefix is maximal: the hash-order successor of each group's last
    # kept row would overflow the budget (recompute the order in python)
    import hashlib

    all_rows = d.filter(F.col("lang").isin(*budgets)).collect()
    by_group = {}
    for r in all_rows:
        u = int(hashlib.md5(f"{r.doc_id}budget-v1".encode()).hexdigest()[:8], 16) / 2**32
        by_group.setdefault(r.lang, []).append((u, r.doc_id, r.n_tokens))
    kept_ids = {r.doc_id for r in rows}
    for g, items in by_group.items():
        items.sort()
        running = 0
        for u, doc_id, n in items:
            running += n
            if running <= budgets[g]:
                assert doc_id in kept_ids, (g, doc_id)
            else:
                assert doc_id not in kept_ids, (g, doc_id)
                break  # rows after the first overflow needn't be checked


def test_token_budget_validates(docs):
    with pytest.raises(ValueError):
        token_budget_sample(docs, {"en": -1})


def test_topk_per_group_equals_plain_window(spark):
    """Exactness property of the salted two-phase top-k: for ANY shard
    assignment the union of per-shard local top-k contains the global
    top-k, so the result must equal the plain window's — across k,
    n_salts (incl. 1), k > group size, and ties broken by the total
    order."""
    from pyspark.sql import Window

    from mysql_tracker_spark.functions.sampling import topk_per_group

    rows = [
        (f"g{(i * 7) % 5}", i, float((i * 13) % 11))  # dup scores => real ties
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    order = [F.desc("score"), F.asc("id")]
    for k, n_salts in [(3, 1), (3, 4), (25, 8), (500, 4)]:
        got = (
            topk_per_group(df, ["grp"], order, k, n_salts=n_salts)
            .select("grp", "id", "rank")
            .collect()
        )
        w = Window.partitionBy("grp").orderBy(*order)
        exp = (
            df.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select("grp", "id", "rank")
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, exp)), (k, n_salts)


def test_topk_per_group_shards_the_hot_group(spark):
    """Plan shape: phase 1 partitions on (group, __shard) — the hot
    group's sort is spread over n_salts tasks — and phase 2 only ever
    sorts the <= n_salts*k survivors. One group being 100% of the
    input must still produce the exact top-k."""
    from mysql_tracker_spark.functions.sampling import topk_per_group

    df = spark.createDataFrame(
        [("hot", i, float(i % 97)) for i in range(20000)],
        "grp string, id long, score double",
    )
    out = topk_per_group(df, ["grp"], [F.desc("score"), F.asc("id")], 10, n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__shard" in plan  # phase-1 sharded window is really in the plan
    rows = out.orderBy("rank").collect()
    assert [r.id for r in rows] == sorted(
        range(20000), key=lambda i: (-(i % 97), i)
    )[:10]
    assert [r.rank for r in rows] == list(range(1, 11))


def test_topk_per_group_rejects_colliding_columns(spark):
    """Working/output names must not silently clobber caller data."""
    from mysql_tracker_spark.functions.sampling import topk_per_group

    order = [F.asc("id")]
    for col in ("rank", "__shard", "__r1"):
        df = spark.createDataFrame(
            [("g", 1, 0)], f"grp string, id long, {col} int"
        )
        with pytest.raises(ValueError, match=col):
            topk_per_group(df, ["grp"], order, 1)
    # a custom rank_col dodges the 'rank' collision
    df = spark.createDataFrame([("g", 1, 0)], "grp string, id long, rank int")
    out = topk_per_group(df, ["grp"], order, 1, rank_col="topk_rank")
    assert out.columns == ["grp", "id", "rank", "topk_rank"]


def test_topk_per_group_handles_map_columns(spark):
    """The default shard key must skip map-typed columns (Spark
    prohibits hashing maps) instead of throwing AnalysisException —
    the engine's before/after images are maps."""
    from mysql_tracker_spark.functions.sampling import topk_per_group

    df = spark.createDataFrame(
        [("g", i, {"k": str(i)}) for i in range(20)],
        "grp string, id long, img map<string,string>",
    )
    out = topk_per_group(df, ["grp"], [F.asc("id")], 3, n_salts=4)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2]
