"""At-ingest near-dup gate: the banded MinHash index
(sketches.banded_signature_index / conversations.conv_band_index) and
near_dup_lookup — incoming documents checked against a maintained index
without recomputing anything corpus-sized."""

import datetime as dt

from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.functions.conversations import (
    conv_band_index,
    conv_band_index_view,
    conv_full_text,
    conv_gate_lookup,
    incremental_conv_band_index,
)
from mysql_tracker_spark.functions.sketches import (
    banded_signature_index,
    minhash_signature,
    minhash_signature_fast,
    near_dup_lookup,
)
from mysql_tracker_spark.lakestore import LakeTable

T0 = dt.datetime(1995, 1, 1)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the tall green trees"
)


def _docs(spark):
    rows = [
        ("d0", BASE),
        ("d1", "completely different content about databases and indexes and shuffles"),
        ("d2", "a third unrelated document mentioning spark catalyst and arrow batches"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_lookup_finds_planted_near_dup_and_skips_unrelated(spark):
    corpus = _docs(spark)
    sigs = corpus.select(
        "doc_id", minhash_signature_fast(32, 3, 42)(F.col("text")).alias("sig")
    )
    index = banded_signature_index(sigs, id_col="doc_id", k=32, bands=8)
    probes = spark.createDataFrame(
        [
            ("p0", BASE.replace("lazy", "sleepy")),  # near-copy of d0
            ("p1", "nothing in common with anything stored so far at all"),
        ],
        "doc_id string, text string",
    )
    hits = near_dup_lookup(
        probes, index, corpus, threshold=0.5, use_fast=True
    ).collect()
    got = {(r.probe_id, r.match_id) for r in hits}
    assert ("p0", "d0") in got
    assert not any(p == "p1" for p, _ in got)
    for r in hits:
        assert 0.5 <= r.jaccard <= 1.0


def test_lookup_same_id_reingest_is_not_a_match(spark):
    corpus = _docs(spark)
    sigs = corpus.select(
        "doc_id", minhash_signature_fast(32, 3, 42)(F.col("text")).alias("sig")
    )
    index = banded_signature_index(sigs, id_col="doc_id", k=32, bands=8)
    # replaying the exact same (id, text) must not flag itself
    hits = near_dup_lookup(
        corpus.filter(F.col("doc_id") == "d0"), index, corpus, threshold=0.5
    ).collect()
    assert all(r.match_id != "d0" or r.probe_id != "d0" for r in hits)
    assert not hits  # d0 has no other near-dup in this corpus


def test_hash_family_mismatch_matches_nothing(spark):
    """The documented trap: an index built from the Catalyst signature
    probed with the Arrow signature shares no bands even for an exact
    copy."""
    corpus = _docs(spark)
    catalyst_index = banded_signature_index(
        corpus.select(
            "doc_id", minhash_signature(F.col("text"), 32, 3, 42).alias("sig")
        ),
        id_col="doc_id",
    )
    probes = spark.createDataFrame([("p0", BASE)], "doc_id string, text string")
    wrong = near_dup_lookup(
        probes, catalyst_index, corpus, threshold=0.5, use_fast=True
    )
    right = near_dup_lookup(
        probes, catalyst_index, corpus, threshold=0.5, use_fast=False
    )
    assert wrong.count() == 0
    assert {(r.probe_id, r.match_id) for r in right.collect()} == {("p0", "d0")}


SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _conv_rows():
    out = []
    for c in range(10):
        for t in range(3):
            out.append(
                (
                    f"conv{c:03d}",
                    t,
                    "user" if t % 2 == 0 else "assistant",
                    f"conversation {c} turn {t} " + BASE if c == 4 else
                    f"conversation {c} turn {t} about topic number {c * 7 + t}",
                    T0 + dt.timedelta(seconds=45 * t),
                )
            )
    return out


def _band_map(df):
    return {(r.id, r.band, r.bh) for r in df.collect()}


def test_incremental_band_index_equals_full(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_conv_rows(), SCHEMA))
    v1 = t.current_version()
    prev = conv_band_index(t.read(spark)).localCheckpoint()
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [
                ("conv001", 1, "assistant", "rewritten turn omega", T0, False),
                ("conv002", 0, None, None, None, True),
                ("conv002", 1, None, None, None, True),
                ("conv002", 2, None, None, None, True),  # conv fully deleted
                ("conv555", 0, "user", "a brand new conversation", T0, False),
            ],
            ch_schema,
        ),
    )
    changes = t.read_changes(spark, v1)
    inc = incremental_conv_band_index(t.read(spark), prev, changes)
    full = conv_band_index(t.read(spark))
    assert _band_map(inc) == _band_map(full)
    assert not any(i == "conv002" for i, _, _ in _band_map(inc))
    assert any(i == "conv555" for i, _, _ in _band_map(inc))


def test_band_index_view_gates_an_incoming_batch(spark, tmp_path):
    """End-to-end gate: transcript table -> synced band-index view ->
    an incoming batch containing a near-copy of a stored conversation
    is flagged against it; unrelated conversations pass."""
    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_conv_rows(), SCHEMA))
    view = conv_band_index_view(t, str(tmp_path / "view"))
    assert view.sync(spark) is True

    incoming = spark.createDataFrame(
        [
            # near-copy of conv004 (same turns, one word changed)
            ("new000", 0, "user", "conversation 4 turn 0 " + BASE, T0),
            ("new000", 1, "assistant", "conversation 4 turn 1 " + BASE.replace("fox", "wolf"), T0),
            ("new000", 2, "user", "conversation 4 turn 2 " + BASE, T0),
            ("new111", 0, "user", "entirely novel material never stored", T0),
        ],
        SCHEMA,
    )
    hits = conv_gate_lookup(spark, view, t.read(spark), incoming, threshold=0.5)
    got = {(r.probe_id, r.match_id) for r in hits.collect()}
    assert ("new000", "conv004") in got
    assert not any(p == "new111" for p, _ in got)


def test_band_hashes_rejects_non_dividing_bands(spark):
    import pytest

    from mysql_tracker_spark.functions.sketches import band_hashes

    for k, bands in [(32, 64), (30, 8)]:
        with pytest.raises(ValueError, match="bands must divide k"):
            band_hashes(F.lit(None), k=k, bands=bands)


def test_band_index_view_provenance_stamp(spark, tmp_path):
    """Reconstructing the view with drifted banding parameters raises —
    a restart must not mix band rows from two incompatible bandings."""
    import pytest

    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_conv_rows(), SCHEMA))
    vdir = str(tmp_path / "view")
    conv_band_index_view(t, vdir, k=32, bands=8)
    conv_band_index_view(t, vdir, k=32, bands=8)  # same params: fine
    with pytest.raises(ValueError, match="built with"):
        conv_band_index_view(t, vdir, k=32, bands=4)
