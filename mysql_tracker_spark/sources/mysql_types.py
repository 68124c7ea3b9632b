"""Byte-level MySQL binlog value decoders (SURVEY.md §1.2, operator D2).

The engine's own wire format is typed (strings on the wire), so the
hot path never needs these — but the reference's decode surface
includes the MySQL on-disk encodings, and a user replacing the
reference must be able to decode captured row images. This module
implements the non-trivial ones from scratch against the format specs
cited in the reference:

* packed-BCD ``DECIMAL`` (``mysql/dbsync/LogBuffer.java:1439-1553``,
  itself mirroring mysql ``strings/decimal.c bin2decimal``): sign bit
  in the first byte, then big-endian base-10^9 groups of 4 bytes with
  shortened leading/trailing groups; negative values stored as the
  bitwise complement;
* ``TIMESTAMP2`` (``RowsLogBuffer.java:414-449``): big-endian u32
  seconds + 0-3 bytes fractional; 0 -> zero-date sentinel;
* ``DATETIME2`` (``RowsLogBuffer.java:450-536``): 5-byte big-endian
  packed bitfield (sign, year*13+month:17, day:5, hour:5, min:6,
  sec:6) offset by 0x8000000000, + fractional; 0 -> sentinel;
* ``TIME2`` (``RowsLogBuffer.java:601-655``): 3-byte big-endian packed
  (hour:10, min:6, sec:6) offset by 0x800000, + fractional with the
  reverse-order negative encoding. **Deliberate divergence**: the
  reference computes ``ltime = intpart << 24 + frac * 10000`` — Java
  precedence makes that ``intpart << (24 + frac*10000)``, corrupting
  any TIME2 with a fractional part (an evident bug; its own comment
  gives the correct formula). We implement the commented intent,
  ``(intpart << 24) + frac_scaled``;
* ``ENUM`` (``RowsLogBuffer.java:719-741``): 1/2-byte unsigned
  ordinal; ``SET`` (:742-755): n-byte little-endian bitmask; ``BIT``
  (:350-394): 1-8 byte big-endian integer;
* charset-aware text decode (``mysql/dbsync/CharsetConversion.java``,
  ``LogBuffer.getFullString`` :1280-1310): collation id -> codec. The
  reference maps utf8mb4 ids 45/46 to the Java charset
  "MacCentralEurope" (an evident table typo; the mysql charset column
  says utf8mb4) — we decode utf8mb4 as UTF-8.

Everything here is driven by pytest vectors hand-packed from the
format definitions (tests/test_mysql_types.py); the rendered text
forms reuse the frozen rules in :mod:`mysql_tracker_spark.values`.
"""

from __future__ import annotations

from decimal import Decimal

from ..values import ZERO_DATETIME, render_time

# digits -> bytes for a partial base-10^9 group (decimal.c dig2bytes)
DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
DIG_PER_INT32 = 9
DATETIMEF_INT_OFS = 0x8000000000
TIMEF_INT_OFS = 0x800000


def decimal_bin_size(precision: int, scale: int) -> int:
    """On-disk size of DECIMAL(precision, scale)
    (LogBuffer.java:1449-1451)."""
    intg = precision - scale
    intg0, frac0 = intg // DIG_PER_INT32, scale // DIG_PER_INT32
    intg0x, frac0x = intg - intg0 * DIG_PER_INT32, scale - frac0 * DIG_PER_INT32
    return intg0 * 4 + DIG2BYTES[intg0x] + frac0 * 4 + DIG2BYTES[frac0x]


def decode_decimal(buf: bytes, precision: int, scale: int) -> Decimal:
    """Packed-BCD DECIMAL -> Decimal (LogBuffer.getDecimal0,
    :1514-1553). Rendered text = ``values.render_decimal`` (the
    reference's ``toPlainString``)."""
    size = decimal_bin_size(precision, scale)
    data = bytearray(buf[:size])
    positive = (data[0] & 0x80) == 0x80
    data[0] ^= 0x80
    if not positive:
        data = bytearray((~b) & 0xFF for b in data)

    intg = precision - scale
    intg0, frac0 = intg // DIG_PER_INT32, scale // DIG_PER_INT32
    intg0x, frac0x = intg - intg0 * DIG_PER_INT32, scale - frac0 * DIG_PER_INT32

    pos = 0

    def group(nbytes: int) -> int:
        nonlocal pos
        x = int.from_bytes(data[pos : pos + nbytes], "big")
        pos += nbytes
        return x

    int_digits = ""
    if intg0x:
        int_digits += str(group(DIG2BYTES[intg0x]))
    for _ in range(intg0):
        int_digits += f"{group(4):09d}"
    frac_digits = ""
    for _ in range(frac0):
        frac_digits += f"{group(4):09d}"
    if frac0x:
        frac_digits += f"{group(DIG2BYTES[frac0x]):0{frac0x}d}"

    int_part = int_digits.lstrip("0") or "0"
    text = int_part + ("." + frac_digits if scale else "")
    return Decimal(("-" if not positive else "") + text)


def _frac_bytes(meta: int) -> int:
    return (meta + 1) // 2


def decode_timestamp2(buf: bytes, meta: int = 0) -> str:
    """TIMESTAMP2 -> reference text (RowsLogBuffer.java:414-449):
    big-endian u32 epoch seconds (+frac, decoded but rendered at
    second precision like the reference's frac=0 output); 0 -> the
    zero-date sentinel."""
    secs = int.from_bytes(buf[:4], "big")
    if secs == 0:
        return ZERO_DATETIME
    import pandas as pd

    return pd.Timestamp(secs, unit="s").strftime("%Y-%m-%d %H:%M:%S")


def decode_datetime2(buf: bytes, meta: int = 0) -> str:
    """DATETIME2 -> reference text (RowsLogBuffer.java:450-536)."""
    intpart = int.from_bytes(buf[:5], "big") - DATETIMEF_INT_OFS
    if intpart == 0:
        return ZERO_DATETIME
    ymd = intpart >> 17
    ym = ymd >> 5
    hms = intpart % (1 << 17)
    return (
        f"{ym // 13:04d}-{ym % 13:02d}-{ymd % (1 << 5):02d} "
        f"{hms >> 12:02d}:{(hms >> 6) % (1 << 6):02d}:{hms % (1 << 6):02d}"
    )


def decode_time2(buf: bytes, meta: int = 0) -> str:
    """TIME2 -> reference text (RowsLogBuffer.java:601-655), with the
    CORRECTED in-memory reconstruction (module docstring: the
    reference's shift-precedence bug corrupts fractional TIME2)."""
    intpart = int.from_bytes(buf[:3], "big") - TIMEF_INT_OFS
    fb = _frac_bytes(meta)
    frac = int.from_bytes(buf[3 : 3 + fb], "big") if fb else 0
    if intpart < 0 and frac > 0:
        # negative values store the fractional part in reverse order
        # for binary-sort compatibility (RowsLogBuffer.java:585-599)
        intpart += 1
        frac -= 0x100 ** fb
    if intpart == 0 and frac == 0:
        return "00:00:00"
    # frac is decoded (it carries the sign correction above) but the
    # rendered output is SECOND precision, matching the reference's
    # fsp=0 text; a sub-second-only negative value truncates toward
    # zero and the sign of -0 drops
    negative = intpart < 0 or (intpart == 0 and frac < 0)
    packed = abs(intpart)
    hours = (packed >> 12) % (1 << 10)
    minutes = (packed >> 6) % (1 << 6)
    seconds = packed % (1 << 6)
    total = hours * 3600 + minutes * 60 + seconds
    return render_time(-total if negative else total)


def decode_enum(buf: bytes, packlen: int) -> int:
    """ENUM ordinal (RowsLogBuffer.java:719-741): 1/2-byte unsigned
    little-endian (getUint8/getUint16 are LE reads)."""
    if packlen not in (1, 2):
        raise ValueError(f"unknown ENUM packlen {packlen}")
    return int.from_bytes(buf[:packlen], "little")


def decode_set(buf: bytes) -> int:
    """SET bitmask -> int (RowsLogBuffer.java:742-755 keeps raw bytes;
    the little-endian integer view is the usable form)."""
    return int.from_bytes(buf, "little")


def decode_bit(buf: bytes, nbits: int) -> int:
    """BIT(n) -> int (RowsLogBuffer.java:350-394: 1-8 bytes read
    big-endian)."""
    nbytes = (nbits + 7) // 8
    return int.from_bytes(buf[:nbytes], "big")


# --- charset decode (CharsetConversion.java; LogBuffer.java:1280-1310) ------

# collation id -> python codec (CharsetConversion.java:70-260 table,
# the common tiers). Where the reference's Java-charset column is an
# evident typo against its own mysql-charset column, we decode per the
# MYSQL charset (same stance as utf8mb4 ids 45/46, which the reference
# maps to "MacCentralEurope"): latin5 (30/78) is MySQL's Turkish
# ISO-8859-9 (reference says ISO8859_5 = Cyrillic), latin7 (20/41/42/
# 79) is Baltic ISO-8859-13 (reference says ISO8859_7 = Greek).
# Unlisted ids fall back to the configured default WITH a once-per-id
# warning — the reference logs a warning on unknown ids too
# (CharsetConversion.getJavaCharset); LogEventConvert uses UTF-8 as the
# default connection charset (TrackerConf.java:75).
_CHARSET_CODECS: dict[int, str] = {
    1: "big5", 84: "big5",
    2: "iso8859-2", 9: "iso8859-2", 21: "iso8859-2", 27: "iso8859-2",
    77: "iso8859-2",
    4: "cp850", 80: "cp850",
    40: "cp852", 81: "cp852",
    5: "latin-1", 8: "latin-1", 15: "latin-1", 31: "latin-1",
    47: "latin-1", 48: "latin-1", 94: "latin-1",
    7: "koi8-r", 74: "koi8-r",
    22: "koi8-u", 75: "koi8-u",
    10: "latin-1", 82: "latin-1",  # swe7 (reference maps to ISO8859_1)
    11: "ascii", 65: "ascii",
    12: "euc_jp", 91: "euc_jp",  # ujis
    13: "shift_jis", 88: "shift_jis",  # sjis
    16: "iso8859-8", 71: "iso8859-8",  # hebrew
    18: "tis-620", 89: "tis-620",  # tis620
    20: "iso8859-13", 41: "iso8859-13", 42: "iso8859-13",
    79: "iso8859-13",  # latin7 (Baltic; reference table typo)
    24: "gb2312", 86: "gb2312",
    25: "iso8859-7", 70: "iso8859-7",  # greek
    30: "iso8859-9", 78: "iso8859-9",  # latin5 (Turkish; ref typo)
    14: "cp1251", 23: "cp1251", 50: "cp1251", 51: "cp1251", 52: "cp1251",
    26: "cp1250", 34: "cp1250", 44: "cp1250", 66: "cp1250", 99: "cp1250",
    29: "cp1257", 58: "cp1257", 59: "cp1257",
    # MySQL ucs2/utf16/utf32 store BIG-endian (no BOM); Python's bare
    # "utf-16"/"utf-32" codecs default to LITTLE-endian without a BOM,
    # so the -be variants are required (utf16le is the explicit LE one)
    35: "utf-16-be", 90: "utf-16-be", 159: "utf-16-be",  # ucs2
    38: "mac-latin2", 43: "mac-latin2",  # macce (Mac Central European)
    39: "mac-roman", 53: "mac-roman",
    28: "gbk", 87: "gbk",
    36: "cp866", 68: "cp866",
    33: "utf-8", 83: "utf-8", 192: "utf-8",  # utf8 / utf8_bin / utf8_unicode_ci
    45: "utf-8", 46: "utf-8", 224: "utf-8", 255: "utf-8",  # utf8mb4
    54: "utf-16-be", 55: "utf-16-be",  # utf16
    56: "utf-16-le", 62: "utf-16-le",  # utf16le
    60: "utf-32-be", 61: "utf-32-be",  # utf32
    57: "cp1256", 67: "cp1256",  # cp1256 (Arabic)
    63: None,  # binary: NO decode — bytes pass through
    95: "cp932", 96: "cp932",
    97: "euc_jis_2004", 98: "euc_jis_2004",  # eucjpms
    19: "euc_kr", 85: "euc_kr",  # euckr
    49: "latin-1",  # latin1_general_cs
    # --- tier 3: charsets with NO exact Python codec decode as
    # latin-1 (byte-preserving: every byte maps to U+00..U+FF, so the
    # round trip is lossless and the divergence is visible, never a
    # crash). The reference's own table maps several of these to Java
    # names that don't exist either (Cp895/keybcs2) or to plain
    # ISO8859_1 (dec8, hp8, swe7, armscii8, geostd8, filename) —
    # CharsetConversion.java:71-140.
    3: "latin-1", 69: "latin-1",  # dec8 (DEC MCS)
    6: "latin-1", 72: "latin-1",  # hp8 (HP Roman8)
    17: "latin-1",  # filename
    32: "latin-1", 64: "latin-1",  # armscii8 (Armenian)
    37: "latin-1", 73: "latin-1",  # keybcs2 (Kamenicky; Java Cp895
    #                                is unmapped in the reference too)
    92: "latin-1", 93: "latin-1",  # geostd8 (Georgian)
}

# collation-id RANGES for the per-language Unicode collations
# (CharsetConversion.java:166-273): the charset is constant across
# each range, only the collation differs
_CHARSET_RANGES: list[tuple[int, int, str]] = [
    (101, 120, "utf-16-be"),  # utf16_*_ci
    (128, 147, "utf-16-be"),  # ucs2_*_ci
    (160, 179, "utf-32-be"),  # utf32_*_ci
    (192, 211, "utf-8"),      # utf8_*_ci
    (224, 243, "utf-8"),      # utf8mb4_*_ci
    (254, 254, "utf-8"),      # utf8_general_cs
]

_WARNED_CHARSET_IDS: set[int] = set()

#: sentinel distinguishing "id not in any table" from the explicit
#: ``None`` entry (63 = binary, bytes pass through undecoded)
_UNKNOWN_ID = object()


def codec_for_id(charset_id: int, default: str = "utf-8"):
    """THE codec lookup (explicit table, then the per-language Unicode
    collation ranges, then ``default``): encoder and decoder must
    resolve through the same path or a range-mapped id round-trips
    through two different codecs.  Returns None for ``binary`` (63).
    Does NOT warn — :func:`charset_decode` owns the unknown-id
    warning."""
    try:
        return _CHARSET_CODECS[charset_id]
    except KeyError:
        return next(
            (c for lo, hi, c in _CHARSET_RANGES if lo <= charset_id <= hi),
            default,
        )


def charset_decode(buf: bytes, charset_id: int, default: str = "utf-8"):
    """Decode a text column's bytes per its column/collation charset
    id. ``binary`` (63) returns the raw bytes unchanged — the
    reference keeps true blobs as ISO-8859-1-preserved strings
    (``LogEventConvert.java:519-526``); returning ``bytes`` is the
    Python-native equivalent of that byte-preserving intent. An
    unknown id warns ONCE (per process) and falls back to ``default``
    — never a silent wrong decode."""
    codec = codec_for_id(charset_id, default=_UNKNOWN_ID)
    if codec is _UNKNOWN_ID:
        if charset_id not in _WARNED_CHARSET_IDS:
            _WARNED_CHARSET_IDS.add(charset_id)
            import warnings

            warnings.warn(
                f"unknown MySQL collation id {charset_id}; falling back "
                f"to {default!r} (reference CharsetConversion logs the "
                "same warning for unmapped ids)",
                stacklevel=2,
            )
        codec = default
    if codec is None:
        return bytes(buf)
    return bytes(buf).decode(codec)
