"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side ``zip_with``/
``aggregate`` — no Python in the inner loop); the scale path is the
LSH-bucketed variant in :mod:`.sketches` (random-hyperplane buckets
cut the candidate set from O(N) to O(N/2^H) per query).

Scale notes: at 10^9 vectors the brute-force form is a cross join —
only usable with a small broadcast query side (it broadcasts
automatically when the query set is small). The bucketed variant
shuffles once on bucket id and joins bucket-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_clamped(a: Column, b: Column) -> Column:
    """Cosine with the norm product clamped away from zero (the same
    1e-12 floor every vectorized kernel here uses): a zero vector
    scores 0 against everything instead of raising ANSI
    DIVIDE_BY_ZERO. Derived embeddings (``hashed_embedding`` of an
    empty or sign-cancelling text) CAN be exactly zero, so the serving
    path must tolerate them; :func:`cosine` stays strict for corpora
    where a zero vector indicates corrupt input."""
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))



def _pin_embedding(df: DataFrame, cols: list, vec_col: str, alias: str) -> DataFrame:
    """Generator barrier shared by every pandas-UDF consumer of an
    embedding column (see :func:`ivf_assign` for the full story): when
    the embedding is a DERIVED higher-order expression
    (``hashed_embedding``), projection collapse would inline the
    lambda-bearing HOF into the PythonUDF argument, which Catalyst
    cannot always extract — INTERNAL_ERROR. The ``inline()`` Generate
    node pins the embedding projection below the UDF. Returns
    ``(*cols, alias)``."""
    return df.select(
        F.inline(
            F.array(
                F.struct(
                    *[F.col(c) for c in cols], F.col(vec_col).alias(alias)
                )
            )
        )
    )


def _home_cell_udf(centroids: np.ndarray):
    """Pandas UDF: nearest-centroid (max-cosine) cell id — the encode
    half every IVF path shares."""
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def _home(vs: pd.Series) -> pd.Series:
        M = np.array(vs.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((M @ C.T).argmax(axis=1).astype("int32"))

    return _home


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector among
    ``vectors`` (self excluded). Returns (query_id, neighbor_id, cos,
    rank). ``queries`` is expected to be small → Catalyst broadcasts it
    and the join is a broadcast nested loop over the big side, which is
    the right plan (AQE confirms)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_clamped(F.col("__qv"), F.col("__v")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold. Exact brute-force self-join — O(n^2)
    comparisons, the verification-grade variant. At corpus scale run
    the LSH-bucketed path (``sketches.ann_lsh`` buckets via random
    hyperplanes) to generate candidates and verify only those here."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_clamped(F.col("__va"), F.col("__vb")), round_to).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def train_ivf_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    return_sample: bool = False,
):
    """Coarse IVF quantizer training: Lloyd iterations on one bounded
    driver-side sample (spherical k-means — centroids re-normalized to
    the unit sphere each step, so assignment == max cosine). Returns
    the ``(n_cells, dim)`` unit-norm centroid matrix; at any corpus
    size the collected sample is ``sample`` rows, never the table.
    ``return_sample=True`` also returns the unit-norm sample matrix
    (and the RNG) so a downstream quantizer (:func:`ann_ivf_pq`'s
    residual PQ) trains on the SAME sample without a second collect."""
    samp = np.array(
        [r[0] for r in vectors.select(vec_col).limit(sample).collect()],
        dtype=np.float64,
    )
    norms = np.linalg.norm(samp, axis=1, keepdims=True)
    samp = samp / np.maximum(norms, 1e-12)
    rng = np.random.default_rng(seed)
    cent = samp[rng.choice(len(samp), size=min(n_cells, len(samp)), replace=False)]
    for _ in range(iters):
        sims = samp @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = samp[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    if return_sample:
        return cent, samp, rng
    return cent


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_cols: tuple[str, ...] = ("vec_id",),
    vec_col: str = "embedding",
) -> DataFrame:
    """``(*id_cols, cell)`` — nearest-centroid (max-cosine) home-cell
    assignment: the IVF INDEX table for a vector corpus. One vectorized
    matmul per Arrow batch, centroids broadcast via closure —
    scan-local, zero shuffles, deterministic (pure function of the
    vector), so replays and re-partitionings re-derive identical
    cells."""
    _home = _home_cell_udf(centroids)
    pre = _pin_embedding(vectors, list(id_cols), vec_col, "__emb")
    return pre.select(*id_cols, _home(F.col("__emb")).alias("cell"))


def incremental_ivf_index(
    table_emb: DataFrame,
    prev_index: DataFrame,
    changes: DataFrame,
    centroids: np.ndarray,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    vec_col: str = "embedding",
) -> DataFrame:
    """Incrementally maintain the :func:`ivf_assign` ANN index from a
    CDC changelog (``LakeTable.read_changes`` output): cells for keys
    touched by the change set are recomputed from the current table's
    embeddings, untouched rows carry forward from ``prev_index``, and
    deleted keys drop out (touched, no surviving row). Centroids are
    FROZEN between refreshes — the standard IVF maintenance contract
    (FAISS add/remove against a trained quantizer); retrain + full
    re-assign only on an explicit invalidation (e.g. when cell-size
    skew degrades probe recall). Same working-set cost model as
    ``conversations.incremental_conv_signatures``: at 10^10 rows the
    per-batch refresh embeds and assigns only touched keys, never the
    corpus. Equivalence to a full re-assign under the same centroids
    is asserted in tests and in the cdc_incremental_ann_index contract
    row."""
    keys = list(key_cols)
    touched = changes.select(*keys).distinct()
    refreshed = ivf_assign(
        table_emb.join(touched, keys, "left_semi"),
        centroids,
        id_cols=tuple(keys),
        vec_col=vec_col,
    )
    carried = prev_index.join(touched, keys, "left_anti")
    return carried.unionByName(refreshed)


def ivf_cell_stats(index: DataFrame) -> DataFrame:
    """``(cell, n)`` occupancy of an :func:`ivf_assign` index — one
    hash aggregation with map-side partials; at most ``n_cells`` rows
    out."""
    return index.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


def ivf_skew(index: DataFrame, n_cells: int) -> float:
    """Cell-balance factor of an IVF index: ``max cell share x
    n_cells`` (perfectly balanced == 1.0; one cell holding everything
    == n_cells). This is the documented RETRAIN TRIGGER for
    :func:`incremental_ivf_index`'s frozen-centroid contract: drifted
    data piles into few cells, probe recall degrades, and a skew above
    a deployment bound (~4x is a common FAISS rule of thumb) means
    invalidate the view, retrain centroids on a fresh sample and
    re-assign once. Collects <= n_cells count rows — driver-safe at
    any corpus size."""
    rows = ivf_cell_stats(index).collect()
    total = sum(r.n for r in rows)
    if not total:
        return 0.0
    return max(r.n for r in rows) * n_cells / total


def ann_index_view(
    table,
    view_dir: str,
    centroids: np.ndarray | None,
    embed,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    keep_last: int = 2,
    n_view_buckets: int | None = None,
):
    """The incremental IVF index packaged as a lakestore
    :class:`~mysql_tracker_spark.views.MaterializedView`: call
    ``sync(spark)`` after each micro-batch and the ANN index follows
    the table — bootstrap is one full :func:`ivf_assign`, every later
    sync is an :func:`incremental_ivf_index` working-set refresh, and
    the view layer supplies the crash-safety/idempotence/no-op-at-
    unchanged-version guarantees. ``embed`` maps the table DataFrame
    to ``(*key_cols, embedding)`` (e.g. :func:`hashed_embedding` over
    the text column, or a passthrough for tables that store model
    vectors).

    The quantizer is part of the index's identity: the centroid matrix
    is PERSISTED beside the view on first construction and validated on
    every later one — a restart that re-trained centroids (``limit()``
    samples are partition-order dependent, and the table has grown)
    would otherwise refresh touched keys under new cells while carrying
    untouched rows assigned under the old ones, silently corrupting the
    index. Pass ``centroids=None`` to load the persisted matrix; pass a
    different matrix and construction raises — retraining means
    deleting the view dir and rebuilding (the ``ivf_skew`` invalidation
    path).

    ``n_view_buckets`` opts into bucketed view STORAGE
    (:class:`~mysql_tracker_spark.views.BucketedMaterializedView`):
    per sync only buckets containing touched keys are recomputed and
    rewritten, untouched bucket files carry by hardlink — at a
    10^10-row index the per-batch write cost drops from view-sized to
    working-set-sized. Cell assignment is per-turn (bucket-local on the
    conversation key), so the bucket-local recompute contract holds."""
    import os

    from ..views import BucketedMaterializedView, MaterializedView

    os.makedirs(view_dir, exist_ok=True)
    cpath = os.path.join(view_dir, "centroids.npy")
    if os.path.exists(cpath):
        stored = np.load(cpath)
        if centroids is None:
            centroids = stored
        elif not np.array_equal(stored, np.asarray(centroids, dtype=np.float64)):
            raise ValueError(
                f"ANN index at {view_dir} was assigned under a different "
                "centroid matrix; pass centroids=None to reuse it, or delete "
                "the view dir to retrain + rebuild"
            )
    else:
        if centroids is None:
            raise ValueError(
                f"no persisted centroids at {cpath}: train "
                "(train_ivf_centroids) and pass them on first construction"
            )
        tmp = os.path.join(view_dir, f".centroids.tmp-{os.getpid()}.npy")
        np.save(tmp, np.asarray(centroids, dtype=np.float64))
        os.replace(tmp, cpath)

    keys = tuple(key_cols)

    def bootstrap(tdf: DataFrame) -> DataFrame:
        return ivf_assign(embed(tdf), centroids, id_cols=keys)

    if n_view_buckets:
        return BucketedMaterializedView(
            table, view_dir, bootstrap, key_col=keys[0],
            n_buckets=n_view_buckets, keep_last=keep_last,
        )

    def refresh(tdf: DataFrame, prev: DataFrame, changes: DataFrame) -> DataFrame:
        return incremental_ivf_index(
            embed(tdf), prev, changes, centroids, key_cols=keys
        )

    return MaterializedView(table, view_dir, bootstrap, refresh, keep_last=keep_last)


def _probe_cells_udf(centroids: np.ndarray, n_probe: int):
    """Pandas UDF: each query vector's ``n_probe`` nearest cells (max
    cosine against the broadcast unit-norm centroid matrix)."""
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    n = min(n_probe, len(C))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _probe(vs: pd.Series) -> pd.Series:
        M = np.array(vs.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        top = np.argsort(-(M @ C.T), axis=1)[:, :n]
        return pd.Series(list(top.astype("int32")))

    return _probe


def ann_search_indexed(
    vectors: DataFrame,
    index: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF top-k cosine search SERVED FROM a maintained index
    (:func:`ivf_assign` output / a synced :func:`ann_index_view`):
    queries probe their ``n_probe`` nearest cells, the INDEX — not a
    fresh corpus-wide cell assignment — supplies the candidate keys in
    those cells, and only those keys' vectors are fetched and re-ranked
    exactly. Returns ``(query_id, *key_cols, cos, rank)``.

    This is the read path the incremental maintenance exists for: the
    per-query cost is ``n_probe/n_cells`` of the corpus via one
    broadcast of the (small) probe set against the index, then an
    equi-join on the table key to fetch candidate vectors — at 10^10
    rows that key join is bucket-co-partitioned with the table, so a
    probe touches only the candidate keys' buckets. With ``n_probe ==
    n_cells`` the result is EXACTLY brute force (asserted in tests);
    smaller probes trade recall for cost like any IVF deployment."""
    keys = list(key_cols)
    probe = _probe_cells_udf(centroids, n_probe)
    # same generator barrier as ivf_assign: query embeddings may be
    # derived HOF expressions (hashed_embedding)
    qpre = queries.select(
        F.inline(
            F.array(
                F.struct(
                    F.col(query_id_col).alias("query_id"),
                    F.col(vec_col).alias("__qv"),
                )
            )
        )
    )
    q = qpre.select(
        "query_id", "__qv", F.explode(probe(F.col("__qv"))).alias("cell")
    )
    cands = index.join(F.broadcast(q), "cell").select("query_id", "__qv", *keys)
    v = vectors.select(*keys, F.col(vec_col).alias("__v"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), *[F.asc(c) for c in keys]
    )
    return (
        cands.join(v, keys)
        .select(
            "query_id",
            *keys,
            F.round(cosine_clamped(F.col("__qv"), F.col("__v")), round_to).alias("cos"),
        )
        .dropDuplicates(["query_id", *keys])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", *keys, "cos", "rank")
    )


def rebuild_ann_index(
    spark,
    table,
    view_dir: str,
    embed,
    n_cells: int = 16,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    skew_bound: float | None = None,
    n_view_buckets: int | None = None,
    **train_kw,
):
    """The :func:`ivf_skew` RECOVERY path, packaged: invalidate the
    persisted index (delete the view dir), retrain centroids on the
    CURRENT table, rebuild + sync, and return the fresh
    ``(view, centroids)``.

    With ``skew_bound`` set this is conditional maintenance: the
    existing synced index's skew is measured first and the rebuild only
    runs when it exceeds the bound (returns the existing view + its
    persisted centroids otherwise) — call it from the same maintenance
    cadence as compaction. Cost when it fires: one bounded-sample
    retrain + one corpus-wide re-assign (the same price as the original
    bootstrap) — which is exactly why the frozen-centroid incremental
    path exists for every sync in between."""
    import os
    import shutil

    cpath = os.path.join(view_dir, "centroids.npy")
    if skew_bound is not None and os.path.exists(cpath):
        existing = ann_index_view(table, view_dir, None, embed,
                                  key_cols=key_cols, n_view_buckets=n_view_buckets)
        existing.sync(spark)
        stored = np.load(cpath)
        if ivf_skew(existing.read(spark), n_cells=len(stored)) <= skew_bound:
            return existing, stored
    shutil.rmtree(view_dir, ignore_errors=True)
    cents = train_ivf_centroids(
        embed(table.read(spark)), n_cells=n_cells, **train_kw
    )
    view = ann_index_view(table, view_dir, cents, embed,
                          key_cols=key_cols, n_view_buckets=n_view_buckets)
    view.sync(spark)
    return view, cents


def hashed_embedding(text_col: Column, dim: int = 16, seed: int = 42) -> Column:
    """Deterministic feature-hashing text embedding (the "hashing
    trick", Weinberger et al. 2009): each whitespace token lands in
    bucket ``xxhash64(token, seed) mod dim`` with a ±1 sign from an
    independent hash; the embedding is the signed bucket-count vector
    as ``array<double>``.

    This is the engine's embedding seam for tables that carry no model
    embeddings: a pure-Catalyst, scan-local derivation (no Python, no
    shuffle) that is a pure function of the text — so CDC replays,
    retries and incremental index refreshes re-derive byte-identical
    vectors, which is what makes :func:`incremental_ivf_index` over a
    TEXT table exactly equal a full recompute. The token array is
    let-bound (``text.let_``) so the split pipeline evaluates once per
    row, and each token's (bucket, sign) pair is let-bound inside the
    single accumulator pass — 2 hashes per TOKEN, not 2 per (token x
    coordinate), which matters on the 10^10-row scan this seam is for."""
    from .text import let_

    toks = F.filter(
        F.split(F.lower(F.coalesce(text_col, F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )

    def body(ts: Column) -> Column:
        def add(acc: Column, t: Column) -> Column:
            bs = F.struct(
                F.pmod(F.xxhash64(t, F.lit(seed)), F.lit(dim))
                .cast("int")
                .alias("b"),
                F.when(
                    F.pmod(F.xxhash64(t, F.lit(seed + 1)), F.lit(2)) == 0,
                    F.lit(1.0),
                )
                .otherwise(F.lit(-1.0))
                .alias("s"),
            )
            return let_(
                bs,
                lambda x: F.transform(
                    acc,
                    lambda v, i: v
                    + F.when(i == x["b"], x["s"]).otherwise(F.lit(0.0)),
                ),
            )

        return F.aggregate(ts, F.array_repeat(F.lit(0.0), dim), add)

    return let_(toks, body)


def ann_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine: a coarse k-means
    quantizer partitions vectors into cells; each query probes its
    ``n_probe`` nearest cells and re-ranks only those candidates
    exactly.

    Scale shape: training runs on a bounded driver-side SAMPLE
    (:func:`train_ivf_centroids`); the centroid matrix broadcasts via
    closure; cell assignment is one vectorized pandas-UDF matmul per
    Arrow batch; the candidate join is an equi-join on cell id — at
    10^9+ vectors the vectors side can be bucketed/partitioned by cell
    so each probe touches n_probe/n_cells of the data. Compare
    ``sketches.ann_lsh`` (random hyperplanes, no training) — IVF gives
    data-adaptive cells at the cost of a training pass.
    """
    C = train_ivf_centroids(
        vectors, n_cells=n_cells, sample=sample, iters=iters, seed=seed,
        vec_col=vec_col,
    )  # (cells, dim), unit norm
    if C.shape[1] != dim:
        raise ValueError(
            f"dim={dim} does not match the corpus vectors (dim {C.shape[1]})"
        )
    probe_cells = _probe_cells_udf(C, n_probe)
    home_cell = _home_cell_udf(C)

    # generator barrier on BOTH sides: the embeddings may be derived
    # HOF expressions (hashed_embedding) — see _pin_embedding
    v = _pin_embedding(vectors, [id_col], vec_col, "__v").select(
        F.col(id_col).alias("neighbor_id"),
        "__v",
        home_cell(F.col("__v")).alias("cell"),
    )
    q = _pin_embedding(queries, [id_col], vec_col, "__qv").select(
        F.col(id_col).alias("query_id"),
        "__qv",
        F.explode(probe_cells(F.col("__qv"))).alias("cell"),
    )
    scored = (
        v.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_clamped(F.col("__qv"), F.col("__v")), round_to).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_ivf_pq(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m_subs: int = 8,
    n_codes: int = 32,
    rerank: int = 32,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ approximate top-k cosine (the FAISS ``IVFPQ,Refine``
    shape): the :func:`ann_ivf` coarse quantizer picks cells, and
    inside each cell vectors are stored as ``m_subs`` product-quantizer
    codes over the RESIDUAL (vector minus cell centroid) — the index a
    10^9+-vector corpus can actually hold in memory (``m_subs`` bytes
    per vector instead of ``4*dim``). Probed candidates are scored by
    asymmetric distance (query against reconstructed
    centroid+codeword), the top ``rerank`` per query are re-ranked
    EXACTLY against the raw vectors, and the final top-k carries true
    cosines — so recall can degrade with quantization but reported
    scores never lie (the contract row's ``cos_exact`` check).

    Scale shape: both codebooks train on one bounded driver-side
    sample; encode is one vectorized matmul+gather per Arrow batch;
    candidate generation is the same cell equi-join as IVF; only the
    ``rerank`` survivors per query touch raw vectors again.
    """
    from pyspark.sql import types as T

    if dim % m_subs:
        raise ValueError(f"dim={dim} not divisible by m_subs={m_subs}")
    d_sub = dim // m_subs

    def _lloyd_l2(X: np.ndarray, n_k: int, rng) -> np.ndarray:
        cent = X[rng.choice(len(X), size=min(n_k, len(X)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = X[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        return cent

    # --- train on one bounded sample: coarse cells (the SAME spherical
    # Lloyd loop every IVF path uses), then residual PQ on that sample
    C, samp, rng = train_ivf_centroids(
        vectors, n_cells=n_cells, sample=sample, iters=iters, seed=seed,
        vec_col=vec_col, return_sample=True,
    )  # (cells, dim), unit norm
    resid = samp - C[(samp @ C.T).argmax(axis=1)]
    CB = np.stack(
        [
            _lloyd_l2(resid[:, j * d_sub : (j + 1) * d_sub], n_codes, rng)
            for j in range(m_subs)
        ]
    )  # (m_subs, n_codes, d_sub)

    def _norm_rows(vs: pd.Series) -> np.ndarray:
        M = np.array(vs.tolist(), dtype=np.float64)
        return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("codes", T.ArrayType(T.IntegerType())),
            ]
        )
    )
    def encode(vs: pd.Series) -> pd.DataFrame:
        M = _norm_rows(vs)
        cell = (M @ C.T).argmax(axis=1)
        R = M - C[cell]
        codes = np.empty((len(M), m_subs), dtype=np.int32)
        for j in range(m_subs):
            Rj = R[:, j * d_sub : (j + 1) * d_sub]
            # argmin ||r - cb||^2 = argmax (r.cb - ||cb||^2/2)
            codes[:, j] = (
                Rj @ CB[j].T - 0.5 * (CB[j] ** 2).sum(axis=1)
            ).argmax(axis=1)
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "codes": list(codes)}
        )

    @F.pandas_udf(T.DoubleType())
    def adc_score(qs: pd.Series, cells: pd.Series, codes: pd.Series) -> pd.Series:
        # asymmetric distance: q . (cell centroid + per-subspace codeword)
        Q = _norm_rows(qs)
        cell = cells.to_numpy(dtype=np.int64)
        Cd = np.array(codes.tolist(), dtype=np.int64)  # (n, m_subs)
        recon = C[cell].copy()
        for j in range(m_subs):
            recon[:, j * d_sub : (j + 1) * d_sub] += CB[j][Cd[:, j]]
        return pd.Series(np.einsum("ij,ij->i", Q, recon))

    probe_cells = _probe_cells_udf(C, n_probe)
    enc = _pin_embedding(vectors, [id_col], vec_col, "__nv").select(
        F.col(id_col).alias("neighbor_id"),
        encode(F.col("__nv")).alias("__e"),
    ).select("neighbor_id", F.col("__e.cell").alias("cell"), F.col("__e.codes").alias("codes"))
    q = _pin_embedding(queries, [id_col], vec_col, "__qv").select(
        F.col(id_col).alias("query_id"),
        "__qv",
        F.explode(probe_cells(F.col("__qv"))).alias("cell"),
    )
    approx = (
        enc.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc_score(F.col("__qv"), F.col("cell"), F.col("codes")).alias("__adc"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("__adc"), F.asc("neighbor_id"))
    survivors = approx.withColumn("__r", F.row_number().over(wa)).filter(
        F.col("__r") <= rerank
    )
    # exact refine: only rerank survivors touch raw vectors again
    nv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv2"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        survivors.join(nv, "neighbor_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_clamped(F.col("__qv2"), F.col("__nv")), round_to).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-level (semantic) near-duplicate dedup:
    ``(id, cluster_id, keep)`` for every vector that participates in at
    least one cosine>=threshold pair; ``keep`` marks the cluster's
    canonical survivor (minimum id). Vectors with no near-dup partner
    are implicitly kept (absent from the output).

    Composition: cosine pair graph -> pointer-jumping connected
    components (``sketches.near_dup_clusters``) -> keep-min rule.
    ``pairs`` overrides the pair source: pass the LSH-bucketed
    candidate pairs (``sketches.ann_lsh`` buckets + exact verify) at
    corpus scale — the default brute-force pair join is the
    verification-grade twin, exactly like ``cosine_near_dups``.
    """
    from .sketches import near_dup_clusters

    if pairs is None:
        pairs = cosine_near_dups(
            vectors, threshold, id_col=id_col, vec_col=vec_col, round_to=round_to
        )
    labels = near_dup_clusters(pairs.select("id_a", "id_b"))
    return labels.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("keep"),
    )
