"""Text / sketch / similarity function tests with hand-computed or
property-based oracles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysql_tracker_spark.functions import sketches as SK
from mysql_tracker_spark.functions import similarity as SIM
from mysql_tracker_spark.functions import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_edges(spark):
    df = _docs(spark, [(0, "a b  c"), (1, ""), (2, "   "), (3, "one")])
    got = {r.doc_id: r.n for r in df.select("doc_id", TX.token_count(F.col("text")).alias("n")).collect()}
    assert got == {0: 3, 1: 0, 2: 0, 3: 1}


def test_normalize_and_fingerprint_equal_for_near_identical(spark):
    df = _docs(spark, [(0, "Hello,  World!"), (1, "hello world"), (2, "other text")])
    fps = {r.doc_id: r.fp for r in df.select("doc_id", TX.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_lang_id_markers(spark):
    df = _docs(
        spark,
        [(0, "the cat and the dog of war"), (1, "der Hund und die Katze"), (2, "xyz qqq")],
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", TX.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "und"}


def test_shingles_and_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e", "a b c d e"), (1, "a b c d e", "v w x y z")],
        "i long, ta string, tb string",
    )
    j = {r.i: r.j for r in df.select("i", SK.jaccard_ngram(F.col("ta"), F.col("tb")).alias("j")).collect()}
    assert j[0] == 1.0 and j[1] == 0.0


def test_minhash_lsh_finds_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [(0, base), (1, base + " extra"), (2, "completely different words here about spark shuffles and joins")]
    rows += [(10 + i, f"unique document number {i} with its own totally distinct content {i*7}") for i in range(20)]
    df = _docs(spark, rows)
    pairs = {(r.id_a, r.id_b) for r in SK.minhash_near_dups(df, threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_minhash_deterministic(spark):
    df = _docs(spark, [(0, "alpha beta gamma delta epsilon zeta")])
    s1 = df.select(SK.minhash_signature(F.col("text"), k=16).alias("s")).collect()[0]["s"]
    s2 = df.select(SK.minhash_signature(F.col("text"), k=16).alias("s")).collect()[0]["s"]
    assert s1 == s2 and len(s1) == 16


def test_simhash_identical_and_distant(spark):
    df = spark.createDataFrame(
        [(0, "spark shuffle join aggregation pipeline"), (1, "spark shuffle join aggregation pipeline"),
         (2, "entirely unrelated set of words about gardening tomatoes rainfall")],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.s for r in df.select("doc_id", SK.simhash(F.col("text")).alias("s")).collect()}
    assert sh[0] == sh[1]
    ham02 = bin((sh[0] ^ sh[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham02 > 3


def test_cosine_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 1.0], [1.0, 1.0])],
        "i long, a array<double>, b array<double>",
    )
    got = {r.i: r.c for r in df.select("i", F.round(SIM.cosine(F.col("a"), F.col("b")), 9).alias("c")).collect()}
    assert got[1] == 0.0 and got[2] == 1.0


def test_knn_bruteforce_exact_small(spark):
    vecs = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    vecs.append((9, [1.0, 0.1, 0.0, 0.0]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = SIM.knn_bruteforce(df, df.filter("vec_id = 9"), k=1)
    row = out.collect()[0]
    assert row.neighbor_id == 0 and row.rank == 1  # closest axis


def test_ann_lsh_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal((50, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.filter("vec_id < 5")
    exact = {(r.query_id, r.neighbor_id) for r in SIM.knn_bruteforce(df, qs, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in SK.ann_lsh(df, qs, dim=16, k=3, n_planes=3, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # multi-table LSH recovers most true neighbors


def test_hyperplane_bucket_deterministic(spark):
    df = spark.createDataFrame([(0, [1.0] * 8)], "vec_id long, embedding array<double>")
    b = SK.hyperplane_bucket_udf(8, n_planes=4, seed=1, n_tables=2)
    v1 = df.select(b(F.col("embedding")).alias("b")).collect()[0]["b"]
    v2 = df.select(b(F.col("embedding")).alias("b")).collect()[0]["b"]
    assert v1 == v2 and len(v1) == 2


def test_ngram_jaccard_near_dups_exact(spark):
    """Planted near-dup pair found with exact jaccard; distinct docs
    excluded; pairwise values match the scalar jaccard_ngram oracle."""
    import pandas as pd
    from mysql_tracker_spark.functions.sketches import jaccard_ngram, ngram_jaccard_near_dups

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different text about spark engines and parquet files"),
            (4, "completely different text about spark engines and parquet files"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_near_dups(docs, n=3, threshold=0.5).collect()
    }
    assert (3, 4) in got and got[(3, 4)] == 1.0
    assert (1, 2) in got
    ref = docs.alias("a").crossJoin(docs.alias("b")).filter("a.doc_id = 1 AND b.doc_id = 2")
    from pyspark.sql import functions as F
    expected = ref.select(F.round(jaccard_ngram(F.col("a.text"), F.col("b.text"), 3), 6).alias("j")).collect()[0]["j"]
    assert abs(got[(1, 2)] - expected) < 1e-9
    assert not any({a, b} == {1, 3} for a, b in got)


def test_cosine_near_dups_bruteforce(spark):
    from mysql_tracker_spark.functions.similarity import cosine_near_dups

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),   # near-dup of 1
            (3, [0.0, 1.0, 0.0]),      # orthogonal
            (4, [0.0, 0.995, 0.1]),    # near-dup of 3
        ],
        ["vec_id", "embedding"],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_near_dups(vecs, threshold=0.95).collect()}
    assert pairs == {(1, 2), (3, 4)}


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with clustered data: probing 4 of 8 cells recovers most true
    neighbors; exact on identical input when probing ALL cells."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 4
    pts = np.concatenate([centers[i % 8] + rng.standard_normal(16) * 0.3 for i in range(80)]).reshape(80, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    qs = df.filter("vec_id < 5")
    exact = {(r.query_id, r.neighbor_id) for r in SIM.knn_bruteforce(df, qs, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ann_ivf(df, qs, dim=16, k=3, n_cells=8, n_probe=4, sample=80).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8
    # probing every cell == exact brute force
    full = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ann_ivf(df, qs, dim=16, k=3, n_cells=8, n_probe=8, sample=80).collect()
    }
    assert full == exact


def test_chunk_documents_windows_and_edges(spark):
    """Sliding-window chunking: stride = max-overlap, overlapping
    windows share exactly `overlap` tokens, short tail kept, empty and
    whitespace-only docs yield no chunks."""
    from mysql_tracker_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),  # shorter than one window
            (3, ""),  # empty
            (4, "   "),  # whitespace only
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=4, overlap=2)
    rows = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in out.collect()}
    assert {k[0] for k in rows} == {1, 2}
    # doc 1: starts 0,2,4,6,8 -> windows of 4 (tail short)
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t2 t3 t4 t5")
    assert rows[(1, 4)] == (2, "t8 t9")
    assert rows[(2, 0)] == (3, "a b c")
    # overlap property: consecutive windows share exactly 2 tokens
    w0, w1 = rows[(1, 0)][1].split(), rows[(1, 1)][1].split()
    assert w0[-2:] == w1[:2]
    # pure Catalyst: no Python stage in the plan
    from mysql_tracker_spark.plans.checks import python_stage_count

    assert python_stage_count(out) == 0


def test_near_dup_clusters_connected_components(spark):
    from mysql_tracker_spark.functions.sketches import near_dup_clusters

    # components: {1,2,3,4} (chain), {7,9}, singleton edges only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], ["id_a", "id_b"]
    )
    got = {r["id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}


def test_near_dup_clusters_long_chain_converges(spark):
    """A 1001-node path graph (diameter 1,000) must converge within
    ~log2(d) rounds — the pointer-jumping guarantee; naive min-label
    propagation would need 1,000 rounds and max_iter=12 would raise.
    The per-round localCheckpoint keeps the plan bounded (no lineage
    blowup), so this runs in seconds."""
    import pytest

    from mysql_tracker_spark.functions.sketches import near_dup_clusters

    n = 1001
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["id_a", "id_b"]
    ).coalesce(4)
    labels = near_dup_clusters(pairs, max_iter=12)
    got = {r["id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}
    # lineage is truncated: the final frame's logical plan is a
    # checkpoint scan + join head, not 12 rounds of nested joins
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 3, plan[:2000]
    # converge-or-raise contract: too few rounds must raise, never
    # silently return non-component-min labels
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, max_iter=3)


def test_ngram_max_df_bounds_stopgram_fanout(spark):
    """Stop-gram guard: 300 docs share one boilerplate sentence; with
    max_df the posting self-join stays bounded (candidates ~ only the
    planted pair), and results above threshold are unchanged vs the
    exact variant."""
    from mysql_tracker_spark.functions.sketches import (
        ngram_jaccard_near_dups,
        posting_candidates,
    )

    boiler = "all rights reserved contact us for more information about licensing"
    rows = [(i, f"doc{i}a doc{i}b doc{i}c doc{i}d doc{i}e " + boiler)
            for i in range(300)]
    # planted near-dup pair with distinctive shared content
    rows.append((1000, "the quick brown fox jumps over the lazy dog tonight in paris"))
    rows.append((1001, "the quick brown fox jumps over the lazy dog tonight in london"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    cands = posting_candidates(docs, n=3, max_df=50)
    n_cands = cands.count()
    # without the guard the boilerplate grams alone give 300*299/2 ≈ 45k
    # candidate pairs; with it only genuinely-sharing docs survive
    assert n_cands < 2000, n_cands
    guarded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_near_dups(docs, n=3, threshold=0.7, max_df=50).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_near_dups(docs, n=3, threshold=0.7).collect()
    }
    assert (1000, 1001) in guarded
    assert guarded == exact


def test_decontaminate_flags_only_sharing_docs(spark):
    """A doc containing an eval 8-gram verbatim is flagged (count =
    number of distinct hit grams); disjoint docs are absent; docs
    shorter than n yield no grams."""
    evalq = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = _docs(spark, [
        (0, "x " + evalq + " y"),            # contains the gram -> flagged
        (1, evalq),                           # the gram itself
        (2, "totally unrelated words here that share nothing with it"),
        (3, "alpha beta gamma"),              # < 8 tokens, no grams
    ])
    eval_df = _docs(spark, [(100, evalq)]).select("text")
    got = {r.doc_id: r.n_hit_grams for r in TX.decontaminate(docs, eval_df, n=8).collect()}
    assert got == {0: 1, 1: 1}


def test_decontaminate_counts_distinct_hits(spark):
    """Repeating the contaminated gram in one doc counts once (distinct
    grams per doc); two different eval grams count twice."""
    docs = _docs(spark, [(0, "a b c d a b c d"), (1, "a b c d x w y z")])
    eval_df = _docs(spark, [(100, "a b c d"), (101, "w y z q")]).select("text")
    got = {r.doc_id: r.n_hit_grams for r in TX.decontaminate(docs, eval_df, n=4).collect()}
    # doc 0: gram 'a b c d' appears at offsets 0 and 4 -> one distinct hit
    # doc 1: hits 'a b c d' only ('w y z q' is not contiguous in doc 1)
    assert got == {0: 1, 1: 1}


def test_repetition_stats_hand_computed(spark):
    docs = _docs(spark, [
        (0, "a a a a"),          # 4 tokens, 1 distinct, top 4; bigrams: 'a a' x3 -> dup frac 2/3
        (1, "a b c d"),          # all distinct; 3 distinct bigrams of 3
        (2, ""),                  # no tokens -> absent
    ])
    rows = {r.doc_id: r for r in TX.repetition_stats(docs).collect()}
    assert set(rows) == {0, 1}
    r0 = rows[0]
    assert (r0.n_tokens, r0.distinct_ratio, r0.top_share) == (4, 0.25, 1.0)
    assert r0.dup_bigram_frac == pytest.approx(2 / 3, abs=1e-6)
    r1 = rows[1]
    assert (r1.n_tokens, r1.distinct_ratio, r1.top_share) == (4, 1.0, 0.25)
    assert r1.dup_bigram_frac == 0.0


def test_ann_ivfpq_recall_and_exact_cosines(spark):
    """IVF-PQ on clustered data: quantized candidate generation + exact
    refine recovers most true neighbors, reported cosines are TRUE
    cosines (refine step), and probing all cells with a generous rerank
    matches brute force."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 4
    pts = np.concatenate(
        [centers[i % 8] + rng.standard_normal(16) * 0.3 for i in range(80)]
    ).reshape(80, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    qs = df.filter("vec_id < 5")
    exact_rows = SIM.knn_bruteforce(df, qs, k=3).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    exact_cos = {(r.query_id, r.neighbor_id): r.cos for r in exact_rows}
    got = SIM.ann_ivf_pq(
        df, qs, dim=16, k=3, n_cells=8, n_probe=4, m_subs=4, n_codes=16,
        rerank=16, sample=80,
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got}
    assert len(exact & approx) / len(exact) >= 0.8
    for r in got:  # refine guarantees true cosines wherever sets agree
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert abs(r.cos - exact_cos[(r.query_id, r.neighbor_id)]) < 1e-9
    full = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ann_ivf_pq(
            df, qs, dim=16, k=3, n_cells=8, n_probe=8, m_subs=4, n_codes=16,
            rerank=80, sample=80,
        ).collect()
    }
    assert full == exact


def test_duplicate_spans_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # shares "a b c","b c d" with doc 2
            (2, "x y a b c d z"),
            (3, "p q r p q r p q r"),    # pure self-repetition
            (4, "unique words only here now"),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in TX.duplicate_spans(docs, n=3).collect()
    }
    # doc1: windows 1,2 -> one span covering tokens 1..4
    # doc2: windows 3,4 -> span 3..6
    # doc3: every window 1..7 duplicated -> span 1..9
    assert spans == {(1, 1, 4), (2, 3, 6), (3, 1, 9)}

    stats = {r.doc_id: r for r in TX.duplicate_span_stats(docs, n=3).collect()}
    assert set(stats) == {1, 2, 3, 4, 5}  # every doc present
    assert (stats[1].n_dup_windows, stats[1].n_spans, stats[1].dup_tokens) == (2, 1, 4)
    assert (stats[2].n_dup_windows, stats[2].n_spans, stats[2].dup_tokens) == (2, 1, 4)
    assert (stats[3].n_dup_windows, stats[3].n_spans, stats[3].dup_tokens) == (7, 1, 9)
    assert stats[3].dup_frac == 1.0
    assert (stats[4].n_dup_windows, stats[4].n_spans, stats[4].dup_tokens) == (0, 0, 0)
    assert stats[4].dup_frac == 0.0
    assert (stats[5].n_tokens, stats[5].dup_frac) == (0, 0.0)
    assert stats[1].dup_frac == round(4 / 6, 6)


def test_duplicate_spans_disjoint_spans_and_stats_agree(spark):
    # two separated duplicated regions in one doc must NOT merge
    filler = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"a b c {filler} d e f"),
            (2, f"a b c {filler.replace('w', 'v')} d e f"),
        ],
        "doc_id int, text string",
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in TX.duplicate_spans(docs, n=3).collect()
    )
    # each doc: span over tokens 1..3 and over the last 3 tokens (14..16)
    assert spans == [(1, 1, 3), (1, 14, 16), (2, 1, 3), (2, 14, 16)]

    stats = {r.doc_id: r for r in TX.duplicate_span_stats(docs, n=3).collect()}
    for d in (1, 2):
        assert (stats[d].n_spans, stats[d].dup_tokens) == (2, 6)

    # generic consistency: stats derivable from the span rows
    agg = (
        TX.duplicate_spans(docs, n=3)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias("t"),
        )
        .collect()
    )
    for r in agg:
        assert stats[r.doc_id].n_spans == r.k
        assert stats[r.doc_id].dup_tokens == r.t


def test_lsh_degenerate_band_guard_bounds_blowup(spark):
    """Planted skew: 10k byte-identical docs collapse into ONE bucket
    per band — all-pairs there is ~4x10^8 joined rows (the quadratic
    blowup AQE can split but not shrink). With max_bucket the oversized
    buckets emit a sorted chain instead: the candidate count stays
    LINEAR in the class size, the duplicate class remains fully
    connected, and normal-bucket pairs are untouched."""
    import time

    dup = "identical template boilerplate text repeated across the whole crawl"
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [(i, dup) for i in range(10_000)]
    rows += [(20_000, base), (20_001, base + " extra")]
    rows += [
        (30_000 + i, f"unique document number {i} with its own totally distinct content {i * 7}")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.monotonic()
    pairs = SK.lsh_candidate_pairs(df, max_bucket=256)
    n_pairs = pairs.count()
    wall = time.monotonic() - t0
    # linear, not quadratic: chain gives ~9,999 pairs for the planted
    # class (plus the normal pair); all-pairs would be ~5x10^7 distinct
    assert n_pairs < 50_000, n_pairs
    assert wall < 60, f"degenerate-band candidates took {wall:.0f}s"
    # the duplicate class stays fully connected through the chain
    dup_pairs = [
        (r.id_a, r.id_b)
        for r in pairs.filter(
            (F.col("id_a") < 10_000) & (F.col("id_b") < 10_000)
        ).collect()
    ]
    parent = list(range(10_000))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in dup_pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(10_000)}) == 1
    # the honest (small-bucket) pair is still found exactly
    normal = {
        (r.id_a, r.id_b)
        for r in pairs.filter(F.col("id_a") >= 10_000).collect()
    }
    assert (20_000, 20_001) in normal
    # release the guard's signature cache (shared test session)
    pairs._mts_sig_cache.unpersist()


def test_minhash_near_dups_forwards_sig_cache_handle(spark):
    """minhash_near_dups(max_bucket=...) forwards lsh_candidate_pairs'
    persisted (id, sig) cache handle so callers can release it; without
    the guard no cache exists and no handle is attached."""
    rows = [(i, "identical dup text repeated for the guard " * 2) for i in range(30)]
    rows += [(100 + i, f"unique doc {i} content {i * 13}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = SK.minhash_near_dups(df, max_bucket=8)
    assert out.count() > 0
    assert hasattr(out, "_mts_sig_cache")
    out._mts_sig_cache.unpersist()
    assert not hasattr(SK.minhash_near_dups(df), "_mts_sig_cache")
