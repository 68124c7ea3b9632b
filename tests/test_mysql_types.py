"""Byte-level MySQL type decoders vs hand-packed format vectors
(SURVEY.md §1.2 D2: packed-BCD DECIMAL, TIMESTAMP2/DATETIME2/TIME2,
ENUM/SET/BIT, charset decode)."""

from decimal import Decimal

from mysql_tracker_spark.sources import mysql_types as MT
from mysql_tracker_spark.values import render_decimal


def test_decimal_reference_example():
    # the worked example in LogBuffer.java:1492-1506:
    # 80 00 00 05 1b 38 b0 60 00 == 5.4567000000 for DECIMAL(19,10)
    buf = bytes.fromhex("800000051b38b06000")
    d = MT.decode_decimal(buf, 19, 10)
    assert d == Decimal("5.4567000000")
    assert render_decimal(d) == "5.4567000000"
    assert MT.decimal_bin_size(19, 10) == 9


def test_decimal_negative_is_bitwise_complement():
    pos = bytes.fromhex("800000051b38b06000")
    neg = bytes(b ^ 0xFF for b in pos)
    assert MT.decode_decimal(neg, 19, 10) == Decimal("-5.4567000000")


def test_decimal_partial_groups_and_zero():
    # DECIMAL(4,2): both partial groups are 2 digits -> 1 byte each
    # (dig2bytes[2] == 1; 99 fits one byte), so bin size is 2
    assert MT.decimal_bin_size(4, 2) == 2
    d0 = MT.decode_decimal(bytes([0x80, 0x00]), 4, 2)
    assert d0 == Decimal("0.00")
    assert render_decimal(d0) == "0.00"
    # 12.34 -> sign|12 , 34
    assert MT.decode_decimal(bytes([0x80 | 12, 34]), 4, 2) == Decimal("12.34")


def test_timestamp2_sentinel_and_value():
    assert MT.decode_timestamp2(b"\x00\x00\x00\x00") == "0000-00-00 00:00:00"
    # 2025-01-01 00:00:00 UTC = 1735689600
    assert (
        MT.decode_timestamp2((1735689600).to_bytes(4, "big"))
        == "2025-01-01 00:00:00"
    )


def _pack_datetime2(y, mo, d, h, mi, s):
    ym = y * 13 + mo
    ymd = (ym << 5) | d
    intpart = (ymd << 17) | (h << 12) | (mi << 6) | s
    return (intpart + MT.DATETIMEF_INT_OFS).to_bytes(5, "big")


def test_datetime2_roundtrip_and_sentinel():
    assert MT.decode_datetime2(_pack_datetime2(2025, 6, 9, 12, 34, 56)) == (
        "2025-06-09 12:34:56"
    )
    assert MT.decode_datetime2(MT.DATETIMEF_INT_OFS.to_bytes(5, "big")) == (
        "0000-00-00 00:00:00"
    )


def _pack_time2(h, mi, s, negative=False):
    intpart = (h << 12) | (mi << 6) | s
    if negative:
        intpart = -intpart
    return (intpart + MT.TIMEF_INT_OFS).to_bytes(3, "big")


def test_time2_positive_negative_zero():
    assert MT.decode_time2(_pack_time2(10, 20, 30)) == "10:20:30"
    assert MT.decode_time2(_pack_time2(10, 20, 30, negative=True)) == "-10:20:30"
    assert MT.decode_time2(_pack_time2(838, 59, 59)) == "838:59:59"
    assert MT.decode_time2(_pack_time2(0, 0, 0)) == "00:00:00"


def test_time2_negative_with_reverse_frac():
    # -00:00:01.00 stores intpart=-1, frac=0; -00:00:00.5 (fsp=2)
    # stores intpart=-1, frac=0x100-50 — after the reverse-frac fix the
    # second-precision rendering truncates toward zero
    assert MT.decode_time2(_pack_time2(0, 0, 1, negative=True)) == "-00:00:01"
    buf = (-1 + MT.TIMEF_INT_OFS).to_bytes(3, "big") + bytes([0x100 - 50])
    assert MT.decode_time2(buf, meta=2) == "00:00:00"


def test_enum_set_bit():
    assert MT.decode_enum(b"\x03", 1) == 3
    assert MT.decode_enum(b"\x01\x01", 2) == 257
    assert MT.decode_set(b"\x05\x00") == 5
    assert MT.decode_bit(b"\x80", 1) == 128
    assert MT.decode_bit(b"\x01\x00\x00\x00\x00\x00\x00\x00", 64) == 1 << 56


def test_charset_decode():
    # latin1 id 8: 0xE9 = é; binary id 63 passes bytes through;
    # utf8mb4 id 45 decodes as UTF-8 (reference table typo documented)
    assert MT.charset_decode(b"caf\xe9", 8) == "café"
    assert MT.charset_decode(b"\x00\xff", 63) == b"\x00\xff"
    assert MT.charset_decode("héllo".encode("utf-8"), 45) == "héllo"
    assert MT.charset_decode(b"\xc4\xe3\xba\xc3", 28) == "你好"  # gbk


def test_charset_tier3_full_reference_table():
    """Every collation id in the reference's CharsetConversion table
    (CharsetConversion.java:69-273) now decodes without the unknown-id
    warning: explicit entries, latin-1 byte-preserving stand-ins for
    charsets with no Python codec (dec8/hp8/keybcs2/armscii8/geostd8/
    filename — the reference's own Java mappings for these are absent
    or ISO8859_1 too), and range entries for the per-language Unicode
    collations."""
    import warnings

    ref_ids = (
        list(range(1, 36)) + list(range(36, 100)) + [101] + list(range(102, 121))
        + list(range(128, 148)) + [159] + list(range(160, 180))
        + [192] + list(range(193, 212)) + [224] + list(range(225, 244)) + [254]
    )
    ref_ids = [i for i in ref_ids if i not in (56, 62, 63, 76, 100)]
    def payload(cid):
        if cid in (35, 54, 55, 90, 159) or 101 <= cid <= 147:
            return "abc".encode("utf-16-be")
        if cid in (60, 61) or 160 <= cid <= 179:
            return "abc".encode("utf-32-be")
        return b"abc123"

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for cid in ref_ids:
            got = MT.charset_decode(payload(cid), cid)
            assert isinstance(got, str) and got, cid
    # per-language unicode ranges hit the right codec
    assert MT.charset_decode("hé".encode("utf-8"), 203) == "hé"       # utf8_danish_ci
    assert MT.charset_decode("hé".encode("utf-8"), 235) == "hé"       # utf8mb4_danish_ci
    assert MT.charset_decode("hé".encode("utf-16-be"), 137) == "hé"   # ucs2_turkish_ci
    assert MT.charset_decode("hé".encode("utf-32-be"), 170) == "hé"   # utf32_czech_ci
    assert MT.charset_decode("hé".encode("utf-16-be"), 110) == "hé"   # utf16_turkish_ci
    # keybcs2/dec8/hp8/armscii8/geostd8: byte-preserving latin-1
    assert MT.charset_decode(b"\xe9\x41", 37) == "\xe9A"
    # an id outside every table still warns (e.g. 250 gb18030-era slot)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        MT._WARNED_CHARSET_IDS.discard(250)
        MT.charset_decode(b"abc", 250)
        assert any("unknown MySQL collation id 250" in str(x.message) for x in w)
