"""Conversation-level training-data operators (functions/conversations.py)
over the planted synthetic transcript corpus (sources/conv_gen.py)."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.functions.conversations import (
    boilerplate_turns,
    conv_fingerprint,
    conv_stats,
    dedup_conversations,
    render_chat,
)
from mysql_tracker_spark.sources.conv_gen import (
    _BOILER_ASSISTANT_EXPORTED,
    gen_conversations,
)


@pytest.fixture(scope="module")
def conv_df(spark):
    pdf = gen_conversations(n_convs=120, seed=11)
    return spark.createDataFrame(pdf).cache()


def test_gen_is_deterministic():
    a = gen_conversations(n_convs=60, seed=3)
    b = gen_conversations(n_convs=60, seed=3)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(a["turn_idx"].dtype) == "int32"
    assert str(a["ts"].dtype) == "datetime64[us]"


def test_planted_duplicates_collapse(spark, conv_df):
    # 120 convs at dup_frac 0.15 -> 18 planted exact copies
    dd = dedup_conversations(conv_df).toPandas()
    assert dd["n_convs"].sum() == 120
    assert 120 - len(dd) == 18
    dup_groups = dd[dd["n_convs"] > 1]
    assert not dup_groups.empty
    # every keeper is the minimum conv_id of its group by construction:
    # planted copies get ids AFTER all originals
    assert (dup_groups["keeper_conv"] < "conv-00102").all()


def test_fingerprint_ignores_ts_and_conv_id(spark, conv_df):
    # re-id one conversation and shift its timestamps: same fingerprint
    one = conv_df.filter(F.col("conv_id") == "conv-00000")
    mutated = one.select(
        F.lit("conv-zz").alias("conv_id"),
        "turn_idx",
        "role",
        "text",
        "tool",
        (F.col("ts") + F.expr("INTERVAL 5 DAYS")).alias("ts"),
    )
    fp = conv_fingerprint(one.unionByName(mutated)).toPandas()
    assert fp["fingerprint"].nunique() == 1


def test_render_respects_budget_and_keeps_tail(spark, conv_df):
    budget = 48
    out = render_chat(conv_df, token_budget=budget)
    pdf = out.toPandas()
    assert (pdf["n_tokens"] <= budget).all()
    assert (pdf["n_turns_kept"] >= 1).all()
    assert set(pdf["conv_id"]) == set(
        r[0] for r in conv_df.select("conv_id").distinct().collect()
    )
    # tail rule: the kept turns are exactly the LAST n_turns_kept turns
    turns = conv_df.filter(F.col("conv_id") == "conv-00001").orderBy("turn_idx")
    rows = turns.collect()
    sample = pdf[pdf["conv_id"] == "conv-00001"].iloc[0]
    lines = sample["sample_text"].split("\n")
    expect = [f"{r.role}: {r.text}" for r in rows][-int(sample["n_turns_kept"]):]
    assert lines == expect


def test_stats_shapes(spark, conv_df):
    st = conv_stats(conv_df).toPandas()
    assert (st["n_user"] + st["n_assistant"] + st["n_tool"] == st["n_turns"]).all()
    # fixture plants ~10% double-user sends; some conv must show one
    assert st["n_alt_violations"].sum() > 0
    assert (st["duration_s"] >= 0).all()
    # turns are 45 s apart: duration == 45 * (n_turns - 1)
    assert (st["duration_s"] == 45 * (st["n_turns"] - 1)).all()


def test_boilerplate_detection(spark, conv_df):
    bp = boilerplate_turns(conv_df, min_convs=30).toPandas()
    # the planted greeting appears in ~60% of 102 original convs plus
    # their duplicates -> well above 30 distinct convs
    assert _BOILER_ASSISTANT_EXPORTED in set(bp["text"])
    assert (bp["n_convs"] >= 30).all()
    assert (bp["n_occurrences"] >= bp["n_convs"]).all()


def test_sft_export_composition(spark, conv_df):
    from mysql_tracker_spark.functions.conversations import build_sft_samples

    out = build_sft_samples(conv_df, token_budget=48).toPandas()
    assert (out["n_tokens"] <= 48).all()
    # no boilerplate line survives in any rendered sample
    bp = boilerplate_turns(conv_df, min_convs=10).toPandas()["text"]
    for t in bp:
        assert not out["sample_text"].str.contains(t, regex=False).any()
    # every surviving conversation has zero violations AFTER the drop
    kept = set(out["conv_id"])
    clean = conv_df.join(
        spark.createDataFrame([(t,) for t in bp], "text string"),
        "text",
        "left_anti",
    )
    st = conv_stats(clean).toPandas()
    assert set(st[st["n_alt_violations"] == 0]["conv_id"]) >= kept


def test_incremental_stats_matches_full_recompute(spark, tmp_table_dir):
    from pyspark.sql import types as T

    from mysql_tracker_spark.functions.conversations import incremental_conv_stats
    from mysql_tracker_spark.lakestore import LakeTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    ch_schema = T.StructType(schema.fields + [T.StructField("__delete", T.BooleanType())])
    import datetime as dt

    t0 = dt.datetime(1995, 1, 1)
    sec = dt.timedelta(seconds=45)
    rows = [
        ("a", 0, "user", "hi", t0),
        ("a", 1, "assistant", "hello", t0 + sec),
        ("b", 0, "user", "q", t0),
        ("b", 1, "user", "q again", t0 + sec),  # violation
        ("c", 0, "user", "solo", t0),
    ]
    t = LakeTable.create(tmp_table_dir, schema, ["conv_id", "turn_idx"], "conv_id", n_buckets=4)
    t.overwrite(spark.createDataFrame(rows, schema))
    v1 = t.current_version()
    prev = conv_stats(t.read(spark)).localCheckpoint()

    # change set: update a turn in 'a', fully delete 'c', create 'd'
    ch = spark.createDataFrame(
        [
            ("a", 1, "assistant", "hello!", t0 + sec, False),
            ("c", 0, None, None, None, True),
            ("d", 0, "user", "new conv", t0, False),
            ("d", 1, "assistant", "reply", t0 + sec, False),
        ],
        ch_schema,
    )
    t.merge(spark, ch)
    changes = t.read_changes(spark, v1)

    inc = (
        incremental_conv_stats(t.read(spark), prev, changes)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    full = conv_stats(t.read(spark)).toPandas().sort_values("conv_id").reset_index(drop=True)
    assert inc.equals(full)
    assert "c" not in set(inc["conv_id"])  # fully deleted conv dropped
    assert "d" in set(inc["conv_id"])
    # untouched 'b' carried forward (violation count intact)
    assert int(inc[inc["conv_id"] == "b"]["n_alt_violations"].iloc[0]) == 1


def test_incremental_signatures_match_full_recompute(spark, tmp_table_dir):
    from pyspark.sql import types as T

    from mysql_tracker_spark.functions.conversations import (
        conv_signatures,
        incremental_conv_signatures,
    )
    from mysql_tracker_spark.lakestore import LakeTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    ch_schema = T.StructType(schema.fields + [T.StructField("__delete", T.BooleanType())])
    import datetime as dt

    t0 = dt.datetime(1995, 1, 1)
    sec = dt.timedelta(seconds=45)
    rows = [
        ("a", 0, "user", "the quick brown fox jumps over the lazy dog", t0),
        ("a", 1, "assistant", "and the dog sleeps on while the fox runs", t0 + sec),
        ("b", 0, "user", "completely unrelated question about spark plans", t0),
        ("c", 0, "user", "short lived conversation to be deleted", t0),
    ]
    t = LakeTable.create(tmp_table_dir, schema, ["conv_id", "turn_idx"], "conv_id", n_buckets=4)
    t.overwrite(spark.createDataFrame(rows, schema))
    v1 = t.current_version()
    prev = conv_signatures(t.read(spark)).localCheckpoint()

    ch = spark.createDataFrame(
        [
            ("a", 1, "assistant", "and the dog wakes up while the fox hides", t0 + sec, False),
            ("c", 0, None, None, None, True),
            ("d", 0, "user", "a brand new conversation enters the corpus", t0, False),
        ],
        ch_schema,
    )
    t.merge(spark, ch)
    changes = t.read_changes(spark, v1)

    inc = {
        r.conv_id: tuple(r.sig)
        for r in incremental_conv_signatures(t.read(spark), prev, changes).collect()
    }
    full = {
        r.conv_id: tuple(r.sig) for r in conv_signatures(t.read(spark)).collect()
    }
    assert inc == full
    assert "c" not in inc  # fully deleted conv dropped from the index
    assert "d" in inc
    prev_map = {r.conv_id: tuple(r.sig) for r in prev.collect()}
    assert inc["b"] == prev_map["b"]  # untouched conv carried forward
    assert inc["a"] != prev_map["a"]  # touched conv re-signed
