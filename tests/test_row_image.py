"""Distributed byte-decode path (VERDICT r02 #4): encode known source
values into binary row images, decode them through the mapInPandas
stage, and compare against the §1.2 rendered forms computed from the
SOURCE values (never from the decoders) — a genuine inverse test; the
byte formats themselves stay pinned by tests/test_mysql_types.py's
hand-packed vectors."""

from decimal import Decimal

import pytest

from mysql_tracker_spark.sources import mysql_types as MT
from mysql_tracker_spark.sources import row_image as RI
from mysql_tracker_spark.values import render_int, render_time, render_timestamp

SPECS = [
    RI.ColumnSpec("amount", "decimal", precision=12, scale=4),
    RI.ColumnSpec("big", "decimal", precision=20, scale=0),
    RI.ColumnSpec("ts", "timestamp2"),
    RI.ColumnSpec("dt", "datetime2"),
    RI.ColumnSpec("tm", "time2"),
    RI.ColumnSpec("status", "enum", packlen=2),
    RI.ColumnSpec("flags", "set", nbytes=2),
    RI.ColumnSpec("mask", "bit", nbits=12),
    RI.ColumnSpec("cnt", "int", byte_len=4, unsigned=True),
    RI.ColumnSpec("title", "varstring", charset_id=45),
    RI.ColumnSpec("city", "varstring", charset_id=24),  # gb2312
]


def _mk_values():
    return {
        "amount": Decimal("-12345.6789"),
        "big": Decimal("18446744073709551616"),  # > 2^64, 20 digits
        "ts": 1735689600,  # 2025-01-01 00:00:00
        "dt": (2025, 6, 9, 12, 34, 56),
        "tm": -(10 * 3600 + 20 * 60 + 30),
        "status": 257,
        "flags": 0x0105,
        "mask": 0x0FAB,
        "cnt": -2,  # unsigned re-base -> 4294967294
        "title": "héllo wörld",
        "city": "北京",
    }


def _expected(v):
    return [
        "-12345.6789",
        "18446744073709551616",
        render_timestamp(v["ts"]),
        "2025-06-09 12:34:56",
        render_time(v["tm"]),
        257,
        0x0105,
        0x0FAB,
        render_int(v["cnt"], 4, True),
        "héllo wörld",
        "北京",
    ]


def test_row_image_roundtrip_scalar():
    v = _mk_values()
    img = RI.encode_row_image(v, SPECS)
    assert RI._decode_one(img, SPECS) == _expected(v)
    assert _expected(v)[8] == "4294967294"  # the re-base actually fired


def test_row_image_null_bitmap():
    v = _mk_values()
    v["amount"] = None
    v["city"] = None
    img = RI.encode_row_image(v, SPECS)
    out = RI._decode_one(img, SPECS)
    assert out[0] is None and out[10] is None
    assert out[1:10] == _expected(_mk_values())[1:10]
    # a fully-null row is just the bitmap
    img_null = RI.encode_row_image({}, SPECS)
    assert len(img_null) == (len(SPECS) + 7) // 8
    assert RI._decode_one(img_null, SPECS) == [None] * len(SPECS)


def test_row_image_zero_sentinels_and_negatives():
    specs = [
        RI.ColumnSpec("ts", "timestamp2"),
        RI.ColumnSpec("dt", "datetime2"),
        RI.ColumnSpec("tm", "time2"),
        RI.ColumnSpec("d", "decimal", precision=6, scale=2),
    ]
    img = RI.encode_row_image(
        {"ts": 0, "dt": (0, 0, 0, 0, 0, 0), "tm": 0, "d": Decimal("-0.01")}, specs
    )
    assert RI._decode_one(img, specs) == [
        "0000-00-00 00:00:00",
        "0000-00-00 00:00:00",
        "00:00:00",
        "-0.01",
    ]


def test_row_image_date_year_double_blob():
    from mysql_tracker_spark.values import render_double

    specs = [
        RI.ColumnSpec("d", "date"),
        RI.ColumnSpec("y", "year"),
        RI.ColumnSpec("f", "double"),
        RI.ColumnSpec("b", "blob"),
    ]
    v = {"d": (2025, 6, 9), "y": 2026, "f": -12345.6789, "b": b"\x00\xffraw\x01"}
    got = RI._decode_one(RI.encode_row_image(v, specs), specs)
    assert got == ["2025-06-09", "2026", render_double(-12345.6789), b"\x00\xffraw\x01"]
    # zero sentinels and empty blob
    v0 = {"d": (0, 0, 0), "y": 0, "f": 0.0, "b": b""}
    assert RI._decode_one(RI.encode_row_image(v0, specs), specs) == [
        "0000-00-00", "0000", "0.0", b"",
    ]


def test_decimal_encoder_inverts_reference_vector():
    # encode must reproduce the LogBuffer.java worked example bytes
    assert RI.encode_decimal(Decimal("5.4567"), 19, 10).hex() == "800000051b38b06000"
    neg = RI.encode_decimal(Decimal("-5.4567"), 19, 10)
    assert neg == bytes(b ^ 0xFF for b in bytes.fromhex("800000051b38b06000"))
    with pytest.raises(ValueError):
        RI.encode_decimal(Decimal("123456789"), 8, 2)  # doesn't fit


def test_decode_row_images_distributed(spark):
    """The mapInPandas stage: distributed decode equals the per-row
    scalar decode, schema is the declared one, id column passes
    through."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(257):  # crosses batch boundaries
        v = _mk_values()
        v["cnt"] = rng.randint(-(2**31), 2**31 - 1)
        v["tm"] = rng.randint(-3020399, 3020399)
        if i % 7 == 0:
            v["title"] = None
        if i % 11 == 0:
            v["amount"] = None
        rows.append((i, RI.encode_row_image(v, SPECS), v))
    df = spark.createDataFrame(
        [(i, img) for i, img, _ in rows], "row_id long, image binary"
    ).repartition(8)
    out = RI.decode_row_images(df, SPECS, id_cols=["row_id"])
    got = {r["row_id"]: r for r in out.collect()}
    assert len(got) == 257
    for i, img, v in rows:
        exp = RI._decode_one(img, SPECS)
        r = got[i]
        assert [r[s.name] for s in SPECS] == exp, i
        assert r["cnt"] == render_int(v["cnt"], 4, True)
        assert r["tm"] == render_time(v["tm"])
    # typed output: enum/set/bit are longs
    sch = dict(out.dtypes)
    assert sch["status"] == "bigint" and sch["amount"] == "string"


def test_row_image_roundtrip_property():
    """Property-based encode->decode round-trip (hypothesis): random
    values over every column kind — including NULLs, negatives, zero
    sentinels, payload boundary magnitudes — must decode back to the
    §1.2 rendered forms computed from the source values."""
    from hypothesis import given, settings, strategies as st

    from mysql_tracker_spark.values import render_decimal

    specs = [
        RI.ColumnSpec("d1", "decimal", precision=10, scale=3),
        RI.ColumnSpec("d2", "decimal", precision=18, scale=0),
        RI.ColumnSpec("ts", "timestamp2"),
        RI.ColumnSpec("tm", "time2"),
        RI.ColumnSpec("e", "enum", packlen=1),
        RI.ColumnSpec("b", "bit", nbits=20),
        RI.ColumnSpec("i8", "int", byte_len=1, unsigned=True),
        RI.ColumnSpec("i64", "int", byte_len=8, unsigned=True),
        RI.ColumnSpec("s", "varstring", charset_id=45),
    ]

    dec = st.integers(-(10**7 * 1000 - 1), 10**7 * 1000 - 1).map(
        lambda n: Decimal(n).scaleb(-3)
    )
    values = st.fixed_dictionaries(
        {
            "d1": st.none() | dec,
            "d2": st.none() | st.integers(-(10**18) + 1, 10**18 - 1).map(Decimal),
            "ts": st.none() | st.integers(0, 2**31 - 1),
            "tm": st.none() | st.integers(-3020399, 3020399),
            "e": st.none() | st.integers(0, 255),
            "b": st.none() | st.integers(0, 2**20 - 1),
            "i8": st.none() | st.integers(-128, 127),
            "i64": st.none() | st.integers(-(2**63), 2**63 - 1),
            "s": st.none() | st.text(max_size=40),
        }
    )

    @settings(max_examples=150, deadline=None)
    @given(values)
    def check(v):
        img = RI.encode_row_image(v, specs)
        got = RI._decode_one(img, specs)
        exp = [
            None if v["d1"] is None else render_decimal(v["d1"].quantize(Decimal("0.001"))),
            None if v["d2"] is None else render_decimal(v["d2"]),
            None if v["ts"] is None else render_timestamp(v["ts"]),
            None if v["tm"] is None else render_time(v["tm"]),
            v["e"],
            v["b"],
            None if v["i8"] is None else render_int(v["i8"], 1, True),
            None if v["i64"] is None else render_int(v["i64"], 8, True),
            v["s"],
        ]
        assert got == exp, (v, got, exp)

    check()


def test_charset_new_tier_decodes():
    cases = [
        (24, "汉字", "gb2312"),   # gb2312
        (18, "ไทย", "tis-620"),   # tis620
        (25, "αβγ", "iso8859-7"),  # greek
        (16, "שלום", "iso8859-8"),  # hebrew
        (30, "ğüş", "iso8859-9"),  # latin5 Turkish (reference-table typo fixed)
        (41, "āžē", "iso8859-13"),  # latin7 Baltic
        (7, "привет", "koi8-r"),
        (40, "čšž", "cp852"),
        # MySQL ucs2/utf16/utf32 are BIG-endian on disk (reference
        # UnicodeBig/UTF-16/UTF-32); utf16le (56/62) is the LE one;
        # macce (38/43) is Mac CENTRAL EUROPEAN, not Cyrillic
        (35, "Ab☃", "utf-16-be"),   # ucs2
        (54, "Ab☃", "utf-16-be"),   # utf16
        (56, "Ab☃", "utf-16-le"),   # utf16le
        (60, "Ab☃", "utf-32-be"),   # utf32
        (38, "čšž", "mac-latin2"),  # macce
    ]
    for cid, text, codec in cases:
        assert MT.charset_decode(text.encode(codec), cid) == text, cid
    # the endianness trap the review caught: 'A' in utf16 is b'\\x00A';
    # a bare "utf-16" codec would decode it as U+4100
    assert MT.charset_decode(b"\x00A", 54) == "A"


def test_charset_unknown_id_warns_once():
    MT._WARNED_CHARSET_IDS.discard(9999)
    with pytest.warns(UserWarning, match="unknown MySQL collation id 9999"):
        assert MT.charset_decode(b"abc", 9999) == "abc"
    # second call: silent (once per id)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert MT.charset_decode(b"abc", 9999) == "abc"


def test_geometry_packlens_and_roundtrip():
    """GEOMETRY (RowsLogBuffer.java:860-914): BLOB-style bytes with a
    1-4 byte LE length prefix; WKB passes through undecoded."""
    wkb = bytes.fromhex("0101000000000000000000f03f0000000000000040")
    for packlen in (1, 2, 3, 4):
        spec = RI.ColumnSpec("g", "geometry", packlen=packlen)
        enc = RI.encode_geometry(wkb, packlen)
        assert enc[:packlen] == len(wkb).to_bytes(packlen, "little")
        img = RI.encode_row_image({"g": wkb}, [spec])
        assert RI._decode_one(img, [spec]) == [wkb]
    with pytest.raises(ValueError):
        RI.encode_geometry(wkb, 5)


def test_string_declared_len_meta_quirk():
    """The meta>=256 MYSQL_TYPE_STRING encodings
    (RowsLogBuffer.java:246-270): long-CHAR #37426 splits length bits
    into byte0; the ENUM/SET/STRING byte0 form keeps len in byte1."""
    # plain: meta < 256 is the length itself
    assert RI.string_declared_len(40) == 40
    # long CHAR: byte0 & 0x30 != 0x30 -> len = byte1 | ((byte0&0x30)^0x30)<<4
    # CHAR(300) utf8: 900 bytes = 0x384 -> byte0 = 0xFE & ~0x30 bits...
    # construct: declared 900 = 0x384; byte1 = 0x84, high bits 0x3 ->
    # (byte0 & 0x30) ^ 0x30 == 0x30 ^ 0x10? build from the inverse:
    # byte0 = (MYSQL_TYPE_STRING & ~0x30) | (((900 >> 4) & 0x300) >> 4)
    # simpler: verify against the reference formula directly
    for declared in (256, 300, 511, 900, 1020):
        hi = (declared >> 8) & 0x03
        byte0 = (RI.MYSQL_TYPE_STRING & ~0x30) | ((0x30 ^ (hi << 4)) & 0x30)
        meta = (byte0 << 8) | (declared & 0xFF)
        assert RI.string_declared_len(meta) == declared, declared
    # ENUM/SET/STRING in byte0: len = byte1
    for t in (RI.MYSQL_TYPE_ENUM, RI.MYSQL_TYPE_SET, RI.MYSQL_TYPE_STRING):
        assert RI.string_declared_len((t << 8) | 200) == 200
    with pytest.raises(ValueError):
        RI.string_declared_len((0x3F << 8) | 10)  # unknown byte0 form


def test_char_string_roundtrip_both_prefix_widths(spark):
    """CHAR columns: 1-byte prefix under declared<256, 2-byte above
    (RowsLogBuffer.java:855-875) — distributed round-trip for both,
    plus a multi-byte SET (nbytes up to 8) in the same image."""
    long_meta = (
        ((RI.MYSQL_TYPE_STRING & ~0x30) | 0x20) << 8
    ) | (300 & 0xFF)  # declared 300 -> 2-byte prefix (long-CHAR form)
    assert RI.string_declared_len(long_meta) == 300
    specs = [
        RI.ColumnSpec("short_c", "string", meta=40, charset_id=45),
        RI.ColumnSpec("long_c", "string", meta=long_meta, charset_id=45),
        RI.ColumnSpec("s2", "set", nbytes=2),
        RI.ColumnSpec("s8", "set", nbytes=8),
        RI.ColumnSpec("g", "geometry", packlen=2),
    ]
    wkb = bytes.fromhex("010100000000000000000022400000000000002240")
    rows = []
    for i in range(64):
        v = {
            "short_c": f"pad-{i}",
            "long_c": ("xyzé" * 59) + str(i),  # >255 bytes utf-8
            "s2": (i * 257) & 0xFFFF,
            "s8": (i << 40) | 0xABCDEF,
            "g": wkb if i % 3 else None,
        }
        img = RI.encode_row_image(v, specs)
        # prefix widths are as declared
        rows.append((i, img, v))
    df = spark.createDataFrame(
        [(i, img) for i, img, _ in rows], "row_id long, image binary"
    ).repartition(4)
    got = {r["row_id"]: r for r in RI.decode_row_images(df, specs, id_cols=["row_id"]).collect()}
    for i, img, v in rows:
        r = got[i]
        assert r["short_c"] == v["short_c"]
        assert r["long_c"] == v["long_c"]
        assert r["s2"] == v["s2"] and r["s8"] == v["s8"]
        assert (bytes(r["g"]) if r["g"] is not None else None) == v["g"]
