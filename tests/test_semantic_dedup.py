"""semantic_dedup composition (similarity.py): pair graph -> CC ->
keep-min."""
from pyspark.sql import functions as F

from mysql_tracker_spark.functions.similarity import cosine_near_dups, semantic_dedup


def _vectors(spark):
    # two planted clusters ({1,2,3} colinear, {10,11} colinear) + one
    # orthogonal singleton
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        (3, [3.0, 0.0, 0.001]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 2.0, 0.0]),
        (99, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_clusters_and_keep_flags(spark):
    out = semantic_dedup(_vectors(spark), threshold=0.95).toPandas()
    got = {r.vec_id: (r.cluster_id, r.keep) for r in out.itertuples()}
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        10: (10, True),
        11: (10, False),
    }
    # the orthogonal singleton has no pair, so it is implicitly kept
    assert 99 not in got


def test_pairs_override_is_scale_seam(spark):
    """Passing a candidate pair frame (the LSH path at scale) must give
    identical labels when candidates == exact pairs."""
    v = _vectors(spark)
    pairs = cosine_near_dups(v, threshold=0.95)
    a = semantic_dedup(v, threshold=0.95).toPandas().sort_values("vec_id")
    b = semantic_dedup(v, pairs=pairs).toPandas().sort_values("vec_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
