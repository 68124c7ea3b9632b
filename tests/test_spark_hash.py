"""spark_hash must equal F.hash byte-for-byte — the executor-side
changelog reader recomputes bucket placement with it, so a single
divergent value silently mis-diffs a bucket."""

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql_tracker_spark.lakestore.spark_hash import (
    pmod_bucket,
    spark_hash,
)


def _spark_hashes(spark, values, dtype):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("k", dtype)])
    )
    return [r[0] for r in df.select(F.hash("k")).collect()]


def test_string_hash_matches_spark(spark):
    rng = random.Random(7)
    vals = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "abcde",
        "conv-000042",
        "naïve-ütf8-ありがとう",
        "\x00\x01\x7f",
        "x" * 1000,
    ] + [
        "".join(
            rng.choice("abcdefghijklmnop-0123456789éß日本")
            for _ in range(rng.randrange(1, 40))
        )
        for _ in range(200)
    ]
    expect = _spark_hashes(spark, vals, T.StringType())
    got = [spark_hash(v, "string") for v in vals]
    assert got == expect


def test_integral_hash_matches_spark(spark):
    rng = random.Random(11)
    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        rng.randrange(-(2**31), 2**31) for _ in range(100)
    ]
    longs = [0, 1, -1, 2**63 - 1, -(2**63)] + [
        rng.randrange(-(2**63), 2**63) for _ in range(100)
    ]
    assert [spark_hash(v, "integer") for v in ints] == _spark_hashes(
        spark, ints, T.IntegerType()
    )
    assert [spark_hash(v, "long") for v in longs] == _spark_hashes(
        spark, longs, T.LongType()
    )
    assert [spark_hash(v, "boolean") for v in [True, False]] == _spark_hashes(
        spark, [True, False], T.BooleanType()
    )


def test_binary_hash_matches_spark(spark):
    rng = random.Random(13)
    vals = [b"", b"\x00", b"\xff\xfe\x80", bytes(range(256))] + [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 50)))
        for _ in range(50)
    ]
    expect = _spark_hashes(spark, vals, T.BinaryType())
    got = [spark_hash(v, "binary") for v in vals]
    assert got == expect


def test_pmod_bucket_matches_bucket_expr(spark):
    from mysql_tracker_spark.lakestore.table import _bucket_expr

    vals = [f"conv-{i:06d}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    for n in (1, 3, 8, 64):
        expect = [
            r[0] for r in df.select(_bucket_expr("k", n)).collect()
        ]
        assert [pmod_bucket(v, "string", n) for v in vals] == expect


def test_array_twins_match_scalar():
    """The numpy-vectorized hashes (used by the streaming changelog's
    bucket filters) are value-equal to the scalar functions — and hence,
    by the tests above, to F.hash — across types, lengths, and sign
    edges."""
    import numpy as np

    from mysql_tracker_spark.lakestore.spark_hash import (
        pmod_bucket,
        pmod_bucket_array,
        spark_hash,
        spark_hash_array,
    )

    rng = random.Random(42)
    strings = ["", "a", "ab", "abc", "abcd", "é漢字🙂", "conv-000123"] + [
        "".join(chr(rng.randint(32, 0x2FFF)) for _ in range(rng.randint(0, 33)))
        for _ in range(400)
    ]
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 2**31, -(2**31) - 1] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(400)
    ]
    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        rng.randint(-(2**31), 2**31 - 1) for _ in range(400)
    ]
    bins = [bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 19))) for _ in range(200)]
    for vals, ty in [
        (strings, "string"),
        (longs, "long"),
        (ints, "integer"),
        ([True, False], "boolean"),
        (bins, "binary"),
    ]:
        got = spark_hash_array(vals, ty)
        exp = np.array([spark_hash(v, ty) for v in vals], dtype=np.int32)
        assert (got == exp).all(), ty
        gotb = pmod_bucket_array(vals, ty, 13)
        expb = np.array([pmod_bucket(v, ty, 13) for v in vals])
        assert (gotb == expb).all(), ty
