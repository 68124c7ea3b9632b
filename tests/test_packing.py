"""Greedy sequence packing (functions/packing.py) invariants."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.functions.packing import pack_sequences, packed_bins_summary

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _check_greedy(pdf: pd.DataFrame, budget: int, keys):
    for _, g in pdf.groupby(keys):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # bin_idx starts at 0 and is nondecreasing with steps of <=1
        assert g["bin_idx"].iloc[0] == 0
        steps = g["bin_idx"].diff().dropna()
        assert set(steps.unique()) <= {0, 1}
        fills = g.groupby("bin_idx")["n_tokens"].agg(["sum", "count"])
        # a bin over budget must be a singleton oversize doc
        over = fills[fills["sum"] > budget]
        assert (over["count"] == 1).all()
        # greedy tightness: the first doc of bin k+1 would NOT have fit
        # into bin k
        bin_sum = g.groupby("bin_idx")["n_tokens"].sum()
        firsts = g[g["bin_idx"].diff().fillna(0) == 1]
        for _, row in firsts.iterrows():
            assert bin_sum[row["bin_idx"] - 1] + row["n_tokens"] > budget


def test_pack_respects_budget_and_greedy_rule(spark, docs):
    out = pack_sequences(docs, budget=256).toPandas()
    assert len(out) == docs.count()
    _check_greedy(out, 256, ["lang"])


def test_pack_is_deterministic(spark, docs):
    a = pack_sequences(docs, budget=128).toPandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = pack_sequences(docs, budget=128).toPandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sharded_scale_path(spark, docs):
    """The 100 TB shape: packing per (lang, shard) — every doc packed
    exactly once; greedy invariants hold within each shard."""
    out = pack_sequences(docs, budget=256, n_shards=4)
    # shard column is internal; invariants re-derived from doc hashes
    pdf = out.toPandas()
    assert len(pdf) == docs.count()
    shard = (
        spark.createDataFrame(pdf[["doc_id"]])
        .select("doc_id", F.pmod(F.hash("doc_id"), F.lit(4)).alias("shard"))
        .toPandas()
    )
    merged = pdf.merge(shard, on="doc_id")
    # bin ids are INTERLEAVED (local_bin * n_shards + shard) so two
    # shards can never share a (lang, bin_idx) — un-interleave before
    # checking the per-shard greedy invariants
    assert ((merged["bin_idx"] % 4) == merged["shard"]).all()
    merged["bin_idx"] = (merged["bin_idx"] - merged["shard"]) // 4
    _check_greedy(merged, 256, ["lang", "shard"])
    # and globally: no (lang, bin_idx) collision across shards
    dup = pdf.merge(shard, on="doc_id").groupby(["lang", "bin_idx"])["shard"].nunique()
    assert (dup == 1).all()


def test_bins_summary(spark, docs):
    packed = pack_sequences(docs, budget=256)
    summary = packed_bins_summary(packed).toPandas()
    assert summary["n_docs"].sum() == docs.count()
    # roll-up must agree with the detail
    detail = packed.toPandas().groupby(["lang", "bin_idx"])["n_tokens"].sum()
    for _, r in summary.iterrows():
        assert detail[(r["lang"], r["bin_idx"])] == r["bin_tokens"]
