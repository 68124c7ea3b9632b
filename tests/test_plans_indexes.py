"""Plan-shape locks for the index-serving paths: the maintained IVF /
band indexes must be PROBED, not recomputed — Python stages bounded,
probe side broadcast, corpus render semi-join-restricted."""

import datetime as dt

from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.functions.conversations import (
    conv_band_index_view,
    conv_gate_lookup,
)
from mysql_tracker_spark.functions.similarity import (
    ann_search_indexed,
    hashed_embedding,
    ivf_assign,
    train_ivf_centroids,
)
from mysql_tracker_spark.lakestore import LakeTable
from mysql_tracker_spark.plans.checks import (
    explain_str,
    has_broadcast_join,
    python_stage_count,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
T0 = dt.datetime(1995, 1, 1)


def _rows():
    return [
        (f"c{c:03d}", t, "user", f"text {c} {t} alpha beta gamma", T0)
        for c in range(8)
        for t in range(3)
    ]


def _emb(df):
    return df.select(
        "conv_id", "turn_idx", hashed_embedding(F.col("text"), dim=8).alias("embedding")
    )


def test_ivf_assign_is_one_python_stage_even_over_derived_embeddings(spark):
    df = _emb(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(df, n_cells=4, seed=7)
    out = ivf_assign(df, cents, id_cols=("conv_id", "turn_idx"))
    # the home-cell UDF and nothing else: the HOF embedding stays JVM
    assert python_stage_count(out) == 1


def test_ann_serving_probes_broadcast_and_python_budget(spark, tmp_path):
    """Serving from a MATERIALIZED index: exactly one Python stage (the
    probe-cells UDF — assignment is read, not recomputed) and the small
    probe set broadcasts into the index join."""
    df = _emb(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(df, n_cells=4, seed=7)
    idx_dir = str(tmp_path / "idx")
    ivf_assign(df, cents, id_cols=("conv_id", "turn_idx")).write.parquet(idx_dir)
    index = spark.read.parquet(idx_dir)
    queries = spark.createDataFrame(
        [("q0", "alpha beta gamma")], "query_id string, text string"
    ).select("query_id", hashed_embedding(F.col("text"), dim=8).alias("embedding"))
    out = ann_search_indexed(df, index, cents, queries, k=3, n_probe=2)
    assert python_stage_count(out) == 1
    assert has_broadcast_join(out)


def test_gate_lookup_is_pure_jvm_with_semi_restricted_corpus(spark, tmp_path):
    """conv_gate_lookup: zero Python stages (Catalyst signature family
    end-to-end) and the corpus conv_full_text aggregate sits ABOVE a
    LeftSemi join on the candidate ids — the table contributes only
    candidate rows, never a corpus-wide render."""
    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    view = conv_band_index_view(t, str(tmp_path / "view"))
    view.sync(spark)
    incoming = spark.createDataFrame(
        [("new0", 0, "user", "text 3 0 alpha beta gamma", T0)], SCHEMA
    )
    out = conv_gate_lookup(spark, view, t.read(spark), incoming, threshold=0.5)
    assert python_stage_count(out) == 0
    assert "LeftSemi" in explain_str(out)
