"""Incremental IVF ANN-index maintenance (similarity.ivf_assign /
incremental_ivf_index) and the hashed_embedding derivation it indexes:
the FAISS-style add/remove-under-a-frozen-quantizer contract, driven by
the engine's own changelog."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from mysql_tracker_spark.functions.similarity import (
    hashed_embedding,
    incremental_ivf_index,
    ivf_assign,
    train_ivf_centroids,
)
from mysql_tracker_spark.lakestore import LakeTable

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


def _turn_emb(df):
    return df.select(
        "conv_id", "turn_idx", hashed_embedding(F.col("text"), dim=8).alias("embedding")
    )


def _rows(n_convs=12, turns=4):
    out = []
    for c in range(n_convs):
        for t in range(turns):
            out.append(
                (
                    f"conv{c:03d}",
                    t,
                    "user" if t % 2 == 0 else "assistant",
                    f"turn text {c} {t} " + ("alpha beta " * (c % 3 + 1)),
                    T0 + dt.timedelta(seconds=45 * t),
                )
            )
    return out


def _index_map(df):
    return {(r.conv_id, r.turn_idx): r.cell for r in df.collect()}


def test_hashed_embedding_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [("a", "hello world hello"), ("b", None), ("c", ""), ("d", "  spaced   out ")],
        "id string, text string",
    )
    e1 = {r.id: tuple(r.e) for r in df.select("id", hashed_embedding(F.col("text")).alias("e")).collect()}
    e2 = {
        r.id: tuple(r.e)
        for r in df.repartition(7)
        .select("id", hashed_embedding(F.col("text")).alias("e"))
        .collect()
    }
    assert e1 == e2  # pure function of the text, layout-independent
    assert e1["b"] == e1["c"] == (0.0,) * 16  # null/empty -> zero vector
    assert any(v != 0.0 for v in e1["a"])
    # repeated token counts, not just presence: "hello" x2 has twice the weight
    single = {
        r.id: tuple(r.e)
        for r in spark.createDataFrame([("a", "hello world")], "id string, text string")
        .select("id", hashed_embedding(F.col("text")).alias("e"))
        .collect()
    }
    assert sum(abs(v) for v in e1["a"]) > sum(abs(v) for v in single["a"])


def test_ivf_assign_deterministic_across_layout(spark):
    df = _turn_emb(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(df, n_cells=4, seed=7)
    a = _index_map(ivf_assign(df, cents, id_cols=("conv_id", "turn_idx")))
    b = _index_map(
        ivf_assign(df.repartition(11), cents, id_cols=("conv_id", "turn_idx"))
    )
    assert a == b
    assert len(set(a.values())) > 1  # a real partition of the corpus


def test_incremental_ivf_matches_full_reassign(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    v1 = t.current_version()
    emb1 = _turn_emb(t.read(spark))
    cents = train_ivf_centroids(emb1, n_cells=4, seed=7)
    prev = ivf_assign(emb1, cents, id_cols=("conv_id", "turn_idx")).localCheckpoint()

    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    ch = spark.createDataFrame(
        [
            # update: text change moves the embedding (and maybe the cell)
            ("conv001", 1, "assistant", "completely different reply gamma", T0, False),
            # delete a whole turn
            ("conv002", 3, None, None, None, True),
            # brand-new conversation
            ("conv999", 0, "user", "fresh question delta", T0, False),
            ("conv999", 1, "assistant", "fresh answer epsilon", T0, False),
        ],
        ch_schema,
    )
    t.merge(spark, ch)
    changes = t.read_changes(spark, v1)
    final_emb = _turn_emb(t.read(spark))

    inc = _index_map(incremental_ivf_index(final_emb, prev, changes, cents))
    full = _index_map(ivf_assign(final_emb, cents, id_cols=("conv_id", "turn_idx")))
    assert inc == full
    assert ("conv002", 3) not in inc  # deleted key dropped out
    assert ("conv999", 0) in inc and ("conv999", 1) in inc

    # untouched keys carried forward bit-identically from prev
    touched = {(r.conv_id, r.turn_idx) for r in changes.select("conv_id", "turn_idx").collect()}
    prev_map = _index_map(prev)
    for k, cell in inc.items():
        if k not in touched and k in prev_map:
            assert cell == prev_map[k]


def test_ann_index_view_follows_the_table(spark, tmp_path):
    """The incremental IVF index packaged as a MaterializedView: sync
    after each commit keeps it equal to a full re-assign, and a sync at
    an unchanged version is a no-op."""
    from mysql_tracker_spark.functions.similarity import ann_index_view

    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(_turn_emb(t.read(spark)), n_cells=4, seed=7)
    view = ann_index_view(t, str(tmp_path / "view"), cents, _turn_emb)

    assert view.sync(spark) is True  # bootstrap
    assert view.sync(spark) is False  # unchanged version -> no-op
    full0 = _index_map(ivf_assign(_turn_emb(t.read(spark)), cents, id_cols=("conv_id", "turn_idx")))
    assert _index_map(view.read(spark)) == full0

    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [
                ("conv000", 0, "user", "rewritten opener eta", T0, False),
                ("conv001", 2, None, None, None, True),
                ("conv777", 0, "user", "another thread theta", T0, False),
            ],
            ch_schema,
        ),
    )
    assert view.sync(spark) is True  # incremental refresh
    full1 = _index_map(ivf_assign(_turn_emb(t.read(spark)), cents, id_cols=("conv_id", "turn_idx")))
    assert _index_map(view.read(spark)) == full1
    assert ("conv001", 2) not in full1


def test_ann_index_view_persists_and_validates_centroids(spark, tmp_path):
    """The quantizer is part of the index identity: reconstruction with
    centroids=None reuses the persisted matrix; a different matrix
    raises instead of silently mixing assignments."""
    import pytest

    from mysql_tracker_spark.functions.similarity import ann_index_view

    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(_turn_emb(t.read(spark)), n_cells=4, seed=7)
    vdir = str(tmp_path / "view")
    view = ann_index_view(t, vdir, cents, _turn_emb)
    view.sync(spark)
    # restart path: reuse without re-passing the matrix
    view2 = ann_index_view(t, vdir, None, _turn_emb)
    assert _index_map(view2.read(spark)) == _index_map(view.read(spark))
    other = train_ivf_centroids(_turn_emb(t.read(spark)), n_cells=4, seed=99)
    assert not np.array_equal(other, cents)
    with pytest.raises(ValueError, match="different centroid matrix"):
        ann_index_view(t, vdir, other, _turn_emb)
    with pytest.raises(ValueError, match="no persisted centroids"):
        ann_index_view(t, str(tmp_path / "fresh"), None, _turn_emb)


def test_rebuild_ann_index_on_skew(spark, tmp_path):
    """Conditional retrain: under the bound the existing view and its
    persisted centroids come back untouched; after drift pushes skew
    over the bound, the rebuild retrains on the current table and the
    new index's skew drops back."""
    from mysql_tracker_spark.functions.similarity import (
        ivf_skew,
        rebuild_ann_index,
    )

    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    vdir = str(tmp_path / "view")
    view1, c1 = rebuild_ann_index(spark, t, vdir, _turn_emb, n_cells=4, seed=7)
    # healthy index: conditional call is a no-op returning the same quantizer
    view2, c2 = rebuild_ann_index(
        spark, t, vdir, _turn_emb, n_cells=4, seed=7, skew_bound=3.9
    )
    assert np.array_equal(c1, c2)
    assert _index_map(view2.read(spark)) == _index_map(view1.read(spark))

    # drift: replace the corpus with near-identical texts -> one cell
    drifted = [
        (f"drift{c:03d}", 0, "user", "same drifted text iota kappa", T0)
        for c in range(60)
    ]
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    dels = [
        (r[0], r[1], None, None, None, True)
        for r in _rows()
    ]
    t.merge(spark, spark.createDataFrame(
        dels + [(c, i, r, x, ts, False) for (c, i, r, x, ts) in drifted], ch_schema
    ))
    view3, c3 = rebuild_ann_index(
        spark, t, vdir, _turn_emb, n_cells=4, seed=7, skew_bound=3.9
    )
    assert not np.array_equal(c3, c1)  # retrained on the drifted corpus
    assert view3.synced_version() == t.current_version()
    assert ivf_skew(view3.read(spark), n_cells=4) <= 4.0
    assert _index_map(view3.read(spark)).keys() == {
        (f"drift{c:03d}", 0) for c in range(60)
    }


def test_ivf_skew_flags_drifted_corpus(spark):
    """The retrain trigger: a balanced corpus sits near skew 1, a
    drifted corpus piling into one cell approaches n_cells."""
    from mysql_tracker_spark.functions.similarity import ivf_skew

    df = _turn_emb(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(df, n_cells=4, seed=7)
    balanced = ivf_assign(df, cents, id_cols=("conv_id", "turn_idx"))
    s_bal = ivf_skew(balanced, n_cells=4)
    assert 1.0 <= s_bal < 4.0

    drifted_rows = [
        (f"drift{c:03d}", 0, "user", "same drifted text iota kappa", T0)
        for c in range(40)
    ]
    drifted = _turn_emb(spark.createDataFrame(drifted_rows, SCHEMA))
    s_drift = ivf_skew(
        ivf_assign(drifted, cents, id_cols=("conv_id", "turn_idx")), n_cells=4
    )
    assert s_drift == 4.0  # every vector identical -> one cell holds all
    assert s_drift > s_bal


def _queries_df(spark):
    rows = [
        ("q0", "turn text 3 1 alpha beta"),
        ("q1", "completely unrelated words sigma tau"),
        ("q2", "alpha beta alpha beta alpha beta"),
    ]
    df = spark.createDataFrame(rows, "query_id string, text string")
    return df.select(
        "query_id", hashed_embedding(F.col("text"), dim=8).alias("embedding")
    )


def test_indexed_search_full_probe_equals_brute_force(spark):
    """Serving path: with n_probe == n_cells, searching FROM the index
    returns exactly the brute-force top-k (rounded-cosine ordering,
    key-order tie-break) — recomputed independently in numpy."""
    from mysql_tracker_spark.functions.similarity import ann_search_indexed

    emb = _turn_emb(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(emb, n_cells=4, seed=7)
    index = ivf_assign(emb, cents, id_cols=("conv_id", "turn_idx"))
    res = ann_search_indexed(
        emb, index, cents, _queries_df(spark), k=3, n_probe=4
    ).collect()

    corpus = {(r.conv_id, r.turn_idx): np.array(r.embedding) for r in emb.collect()}
    qs = {r.query_id: np.array(r.embedding) for r in _queries_df(spark).collect()}
    expected = set()
    for qid, qv in qs.items():
        scored = []
        for key, v in corpus.items():
            c = float(qv @ v) / max(np.linalg.norm(qv) * np.linalg.norm(v), 1e-12)
            scored.append((round(c, 6), key))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, key) in enumerate(scored[:3], 1):
            expected.add((qid, key[0], key[1], c, rank))
    got = {(r.query_id, r.conv_id, r.turn_idx, r.cos, r.rank) for r in res}
    assert got == expected


def test_indexed_search_partial_probe_confinement(spark):
    """With a partial probe, every hit comes from a probed cell, and a
    query whose GLOBAL best neighbor lives in its probed cell must
    return that neighbor at rank 1. (Partial top-k is NOT a subset of
    full top-k in general — an unprobed cell's absence pulls lower-cos
    keys into the cutoff.)"""
    from mysql_tracker_spark.functions.similarity import ann_search_indexed

    emb = _turn_emb(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(emb, n_cells=4, seed=7)
    index = ivf_assign(emb, cents, id_cols=("conv_id", "turn_idx"))
    qdf = _queries_df(spark)
    part = ann_search_indexed(emb, index, cents, qdf, k=3, n_probe=1).collect()
    full_rows = ann_search_indexed(emb, index, cents, qdf, k=3, n_probe=4).collect()
    cells = _index_map(index)
    # probe set re-derived independently in numpy (n_probe=1 -> argmax)
    probes = {}
    for r in qdf.collect():
        v = np.array(r.embedding, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        probes[r.query_id] = {int((v @ cents.T).argmax())}
    assert part and full_rows  # probe-1 still finds something here
    for r in part:
        assert cells[(r.conv_id, r.turn_idx)] in probes[r.query_id]
    best_full = {
        r.query_id: (r.conv_id, r.turn_idx) for r in full_rows if r.rank == 1
    }
    best_part = {r.query_id: (r.conv_id, r.turn_idx) for r in part if r.rank == 1}
    for qid, key in best_full.items():
        if cells[key] in probes[qid]:
            assert best_part[qid] == key


def test_indexed_search_from_synced_view_matches_full_reassign(spark, tmp_path):
    from mysql_tracker_spark.functions.similarity import (
        ann_index_view,
        ann_search_indexed,
    )

    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    cents = train_ivf_centroids(_turn_emb(t.read(spark)), n_cells=4, seed=7)
    view = ann_index_view(t, str(tmp_path / "view"), cents, _turn_emb)
    view.sync(spark)
    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [("conv005", 2, "assistant", "revised answer lambda", T0, False)],
            ch_schema,
        ),
    )
    view.sync(spark)
    emb = _turn_emb(t.read(spark))
    qdf = _queries_df(spark)
    from_view = ann_search_indexed(emb, view.read(spark), cents, qdf, k=3, n_probe=2)
    from_full = ann_search_indexed(
        emb,
        ivf_assign(emb, cents, id_cols=("conv_id", "turn_idx")),
        cents,
        qdf,
        k=3,
        n_probe=2,
    )
    a = {tuple(r) for r in from_view.collect()}
    b = {tuple(r) for r in from_full.collect()}
    assert a == b and a


def test_incremental_refresh_embeds_only_touched_keys(spark, tmp_path):
    """The refresh side's embedding recompute is confined to the
    touched working set: the refreshed half of the union contains
    exactly the touched-and-surviving keys (carry side covers the
    rest), so per-batch cost tracks the change set, not the corpus."""
    t = LakeTable.create(
        str(tmp_path / "tbl"), SCHEMA, ["conv_id", "turn_idx"], "conv_id", n_buckets=4
    )
    t.overwrite(spark.createDataFrame(_rows(), SCHEMA))
    v1 = t.current_version()
    emb1 = _turn_emb(t.read(spark))
    cents = train_ivf_centroids(emb1, n_cells=4, seed=7)

    ch_schema = T.StructType(SCHEMA.fields + [T.StructField("__delete", T.BooleanType())])
    t.merge(
        spark,
        spark.createDataFrame(
            [("conv003", 0, "user", "edited zeta", T0, False)], ch_schema
        ),
    )
    changes = t.read_changes(spark, v1)
    final_emb = _turn_emb(t.read(spark))
    touched = changes.select("conv_id", "turn_idx").distinct()
    refreshed = final_emb.join(touched, ["conv_id", "turn_idx"], "left_semi")
    assert refreshed.count() == 1  # one touched surviving key -> one re-embed
