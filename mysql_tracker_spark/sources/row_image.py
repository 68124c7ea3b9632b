"""Distributed decode of captured MySQL binary ROW IMAGES.

:mod:`mysql_tracker_spark.sources.mysql_types` implements the
byte-level value decoders (SURVEY.md §1.2, operator D2) as scalar
functions pinned by hand-packed pytest vectors. This module is the
DISTRIBUTED surface over them: a user replacing the reference who has
captured raw binlog row images (one contiguous buffer per row, as laid
out by ``mysql/dbsync/event/RowsLogBuffer.java:243-360``) decodes them
to rendered columns with one Arrow-batched ``mapInPandas`` stage — no
driver loop, no per-row Python UDF calls through the serializer; each
task cursors through its partition's blobs.

Row-image layout handled here (faithful to RowsLogBuffer):

* leading null bitmap, ``ceil(n_cols/8)`` bytes, LSB-first within each
  byte (``RowsLogBuffer.nextOneRow`` :279-300 reads the columns'
  null bits in this order) — a set bit means the column is NULL and
  contributes NO bytes to the image;
* then each non-null column's bytes back-to-back in declared order,
  sized by its type spec exactly as the decoders expect
  (``decimal_bin_size``, 4/5/3 byte time kernels + fractional bytes,
  ENUM packlen, SET bytes, BIT ``ceil(nbits/8)``, integer byte length);
* VARCHAR/VARSTRING carries a 2-byte little-endian length prefix (the
  MySQL layout when the declared max length exceeds 255,
  ``RowsLogBuffer.java:700-718``; we always use the 2-byte form).

The module also provides the matching ENCODERS. They exist for fixture
generation and round-trip testing (encode from known source values ->
decode distributed -> must equal the source's rendered form, where the
rendered form comes from the frozen §1.2 rules in
:mod:`mysql_tracker_spark.values`, NOT from the decoders — so the
contract check is a genuine inverse test, and the byte formats
themselves stay pinned by the hand-packed vectors in
``tests/test_mysql_types.py``).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame, types as T

from ..values import (
    render_date,
    render_decimal,
    render_double,
    render_int,
    render_time,
    render_timestamp,
    render_year,
)
from . import mysql_types as MT


@dataclass(frozen=True)
class ColumnSpec:
    """One column of a row image. ``kind`` picks the decoder; only the
    parameters that kind uses are read."""

    name: str
    # decimal|timestamp2|datetime2|time2|date|year|double|enum|set|
    # bit|int|varstring|blob|geometry|string
    kind: str
    precision: int = 10  # decimal
    scale: int = 0  # decimal
    meta: int = 0  # frac-seconds meta (timestamp2/datetime2/time2);
    #                raw table-map meta for kind="string" (CHAR),
    #                including the >=256 long-CHAR encodings
    packlen: int = 1  # enum: 1 or 2; geometry: length-prefix width 1-4
    nbytes: int = 1  # set bitmask width (1-8)
    nbits: int = 1  # bit
    byte_len: int = 4  # int: 1/2/3/4/8
    unsigned: bool = False  # int
    charset_id: int = 45  # varstring


# --------------------------------------------------------------- encoders

def encode_decimal(value: Decimal, precision: int, scale: int) -> bytes:
    """Inverse of :func:`mysql_types.decode_decimal` (the
    ``decimal2bin`` side of mysql ``strings/decimal.c``): big-endian
    base-10^9 groups with shortened edge groups, sign bit on the first
    byte, negative values complemented."""
    txt = format(abs(value), f".{scale}f")
    int_part, _, frac_part = txt.partition(".")
    intg = precision - scale
    if intg == 0 and int_part == "0":
        # all-fractional DECIMAL(p,p): the formatted "0." integer digit
        # is presentational, not stored (decode_decimal's intg==0 path)
        int_part = ""
    if len(int_part) > intg:
        raise ValueError(f"{value} does not fit DECIMAL({precision},{scale})")
    int_part = int_part.rjust(intg, "0")
    frac_part = frac_part.ljust(scale, "0")
    intg0, frac0 = intg // MT.DIG_PER_INT32, scale // MT.DIG_PER_INT32
    intg0x = intg - intg0 * MT.DIG_PER_INT32
    frac0x = scale - frac0 * MT.DIG_PER_INT32

    out = bytearray()
    pos = 0
    if intg0x:
        out += int(int_part[:intg0x]).to_bytes(MT.DIG2BYTES[intg0x], "big")
        pos = intg0x
    for _ in range(intg0):
        out += int(int_part[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    pos = 0
    for _ in range(frac0):
        out += int(frac_part[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    if frac0x:
        out += int(frac_part[pos : pos + frac0x]).to_bytes(MT.DIG2BYTES[frac0x], "big")
    out[0] ^= 0x80
    if value < 0:
        out = bytearray((~b) & 0xFF for b in out)
    return bytes(out)


def _frac_bytes(meta: int) -> bytes:
    """The 0-3 fractional-seconds bytes a time column with ``meta`` > 0
    stores after its packed integer part. The decoders consume (and
    per the reference's rendering discard) ``(meta+1)//2`` bytes, so
    the encoders MUST write them or every later column decodes shifted
    (zero fraction — the engine renders at second precision)."""
    return bytes((meta + 1) // 2)


def encode_timestamp2(epoch_seconds: int, meta: int = 0) -> bytes:
    return int(epoch_seconds).to_bytes(4, "big") + _frac_bytes(meta)


def encode_datetime2(y: int, mo: int, d: int, h: int, mi: int, s: int, meta: int = 0) -> bytes:
    ym = y * 13 + mo
    intpart = (((ym << 5) | d) << 17) | (h << 12) | (mi << 6) | s
    return (intpart + MT.DATETIMEF_INT_OFS).to_bytes(5, "big") + _frac_bytes(meta)


def encode_time2(total_seconds: int, meta: int = 0) -> bytes:
    """Second-precision TIME2: sign carried by the packed intpart
    offset, hours up to 838; ``meta`` > 0 appends the zero fractional
    bytes the decoder consumes."""
    mag = abs(total_seconds)
    h, rem = divmod(mag, 3600)
    mi, s = divmod(rem, 60)
    intpart = (h << 12) | (mi << 6) | s
    if total_seconds < 0:
        intpart = -intpart
    return (intpart + MT.TIMEF_INT_OFS).to_bytes(3, "big") + _frac_bytes(meta)


def encode_int(value: int, byte_len: int) -> bytes:
    """Signed little-endian storage (the raw row-image form; unsigned
    re-basing happens at RENDER time per §1.2)."""
    return int(value).to_bytes(byte_len, "little", signed=True)


def encode_date(year: int, month: int, day: int) -> bytes:
    """3-byte little-endian packed day|month<<5|year<<9
    (RowsLogBuffer.java:668-686 reads it as a 3-byte LE int)."""
    return (day | (month << 5) | (year << 9)).to_bytes(3, "little")


def encode_year(year: int) -> bytes:
    """1 byte, offset 1900; raw 0 = the zero year."""
    return bytes([0 if year == 0 else year - 1900])


def encode_double(value: float) -> bytes:
    import struct as _struct

    return _struct.pack("<d", value)


def encode_blob(raw: bytes) -> bytes:
    """BLOB: 4-byte LE length prefix + raw bytes (the meta=4 layout,
    RowsLogBuffer.java:756-829; bytes pass through undecoded)."""
    return len(raw).to_bytes(4, "little") + raw


def encode_varstring(text: str, charset_id: int) -> bytes:
    codec = MT.codec_for_id(charset_id)
    raw = text.encode(codec) if codec else text.encode("latin-1")
    if len(raw) > 0xFFFF:
        raise ValueError("varstring longer than 2-byte length prefix")
    return len(raw).to_bytes(2, "little") + raw


def encode_geometry(raw: bytes, packlen: int) -> bytes:
    """GEOMETRY: ``packlen``-byte (1-4) LE length prefix + WKB bytes —
    the BLOB-style layout (RowsLogBuffer.java:860-914)."""
    if packlen not in (1, 2, 3, 4):
        raise ValueError(f"unknown MYSQL_TYPE_GEOMETRY packlen {packlen}")
    return len(raw).to_bytes(packlen, "little") + raw


def string_declared_len(meta: int) -> int:
    """Declared byte length of a MYSQL_TYPE_STRING (CHAR) column from
    its raw table-map meta, including the meta>=256 encodings
    (RowsLogBuffer.java:246-270): the "long CHAR() field, see #37426"
    split packs bits 4-5 of the length into byte0, and the
    ENUM/SET/STRING-in-byte0 form carries the length in byte1."""
    if meta < 256:
        return meta
    byte0, byte1 = meta >> 8, meta & 0xFF
    if (byte0 & 0x30) != 0x30:
        # long CHAR: real type = byte0 | 0x30, len gains 2 high bits
        return byte1 | (((byte0 & 0x30) ^ 0x30) << 4)
    if byte0 in (MYSQL_TYPE_SET, MYSQL_TYPE_ENUM, MYSQL_TYPE_STRING):
        return byte1
    raise ValueError(f"cannot handle STRING meta={meta} ({meta:#06x})")


# LogEvent.java type codes used by the meta>=256 dispatch
MYSQL_TYPE_ENUM = 247
MYSQL_TYPE_SET = 248
MYSQL_TYPE_STRING = 254


def encode_string(text: str, meta: int, charset_id: int) -> bytes:
    """CHAR/MYSQL_TYPE_STRING: 1-byte length prefix when the declared
    length < 256, else 2-byte (RowsLogBuffer.java:855-875)."""
    declared = string_declared_len(meta)
    codec = MT.codec_for_id(charset_id)
    raw = text.encode(codec) if codec else text.encode("latin-1")
    if len(raw) > declared:
        raise ValueError(f"CHAR value {len(raw)}B exceeds declared {declared}B")
    prefix = 1 if declared < 256 else 2
    return len(raw).to_bytes(prefix, "little") + raw


def _encode_value(v, spec: ColumnSpec) -> bytes:
    k = spec.kind
    if k == "decimal":
        return encode_decimal(Decimal(v), spec.precision, spec.scale)
    if k == "timestamp2":
        return encode_timestamp2(v, spec.meta)
    if k == "datetime2":
        return encode_datetime2(*v, meta=spec.meta)  # (y, mo, d, h, mi, s)
    if k == "time2":
        return encode_time2(v, spec.meta)
    if k == "enum":
        return int(v).to_bytes(spec.packlen, "little")
    if k == "set":
        return int(v).to_bytes(spec.nbytes, "little")
    if k == "bit":
        return int(v).to_bytes((spec.nbits + 7) // 8, "big")
    if k == "int":
        return encode_int(v, spec.byte_len)
    if k == "varstring":
        return encode_varstring(v, spec.charset_id)
    if k == "date":
        return encode_date(*v)  # (y, mo, d)
    if k == "year":
        return encode_year(v)
    if k == "double":
        return encode_double(v)
    if k == "blob":
        return encode_blob(v)
    if k == "geometry":
        return encode_geometry(v, spec.packlen)
    if k == "string":
        return encode_string(v, spec.meta, spec.charset_id)
    raise ValueError(f"unknown column kind {k!r}")


def encode_row_image(values: dict, specs: list[ColumnSpec]) -> bytes:
    """Pack one row: null bitmap (LSB-first, set = NULL) then the
    non-null columns' bytes in spec order."""
    nbitmap = (len(specs) + 7) // 8
    bitmap = bytearray(nbitmap)
    body = bytearray()
    for i, spec in enumerate(specs):
        v = values.get(spec.name)
        if v is None:
            bitmap[i // 8] |= 1 << (i % 8)
            continue
        body += _encode_value(v, spec)
    return bytes(bitmap) + bytes(body)


# --------------------------------------------------------------- decoding

def _decode_one(image: bytes, specs: list[ColumnSpec]) -> list:
    nbitmap = (len(specs) + 7) // 8
    bitmap = image[:nbitmap]
    pos = nbitmap
    out: list = []
    for i, spec in enumerate(specs):
        if bitmap[i // 8] & (1 << (i % 8)):
            out.append(None)
            continue
        k = spec.kind
        if k == "decimal":
            size = MT.decimal_bin_size(spec.precision, spec.scale)
            out.append(
                render_decimal(
                    MT.decode_decimal(image[pos : pos + size], spec.precision, spec.scale)
                )
            )
            pos += size
        elif k == "timestamp2":
            out.append(MT.decode_timestamp2(image[pos : pos + 4], spec.meta))
            pos += 4 + (spec.meta + 1) // 2
        elif k == "datetime2":
            size = 5 + (spec.meta + 1) // 2
            out.append(MT.decode_datetime2(image[pos : pos + size], spec.meta))
            pos += size
        elif k == "time2":
            size = 3 + (spec.meta + 1) // 2
            out.append(MT.decode_time2(image[pos : pos + size], spec.meta))
            pos += size
        elif k == "enum":
            out.append(MT.decode_enum(image[pos : pos + spec.packlen], spec.packlen))
            pos += spec.packlen
        elif k == "set":
            out.append(MT.decode_set(image[pos : pos + spec.nbytes]))
            pos += spec.nbytes
        elif k == "bit":
            nbytes = (spec.nbits + 7) // 8
            out.append(MT.decode_bit(image[pos : pos + nbytes], spec.nbits))
            pos += nbytes
        elif k == "int":
            raw = int.from_bytes(
                image[pos : pos + spec.byte_len], "little", signed=True
            )
            out.append(render_int(raw, spec.byte_len, spec.unsigned))
            pos += spec.byte_len
        elif k == "varstring":
            ln = int.from_bytes(image[pos : pos + 2], "little")
            pos += 2
            decoded = MT.charset_decode(image[pos : pos + ln], spec.charset_id)
            out.append(
                decoded if isinstance(decoded, str) else decoded.decode("latin-1")
            )
            pos += ln
        elif k == "date":
            out.append(render_date(int.from_bytes(image[pos : pos + 3], "little")))
            pos += 3
        elif k == "year":
            out.append(render_year(image[pos]))
            pos += 1
        elif k == "double":
            import struct as _struct

            out.append(render_double(_struct.unpack("<d", image[pos : pos + 8])[0]))
            pos += 8
        elif k == "blob":
            ln = int.from_bytes(image[pos : pos + 4], "little")
            pos += 4
            out.append(bytes(image[pos : pos + ln]))
            pos += ln
        elif k == "geometry":
            # BLOB-style with a 1-4 byte prefix (RowsLogBuffer:860-914);
            # WKB bytes pass through undecoded, like the reference
            ln = int.from_bytes(image[pos : pos + spec.packlen], "little")
            pos += spec.packlen
            out.append(bytes(image[pos : pos + ln]))
            pos += ln
        elif k == "string":
            # CHAR: prefix width depends on the DECLARED length from
            # the raw meta (incl. the meta>=256 long-CHAR quirk,
            # RowsLogBuffer.java:246-270,855-875)
            prefix = 1 if string_declared_len(spec.meta) < 256 else 2
            ln = int.from_bytes(image[pos : pos + prefix], "little")
            pos += prefix
            decoded = MT.charset_decode(image[pos : pos + ln], spec.charset_id)
            out.append(
                decoded if isinstance(decoded, str) else decoded.decode("latin-1")
            )
            pos += ln
        else:
            raise ValueError(f"unknown column kind {k!r}")
    return out


def _output_field(spec: ColumnSpec) -> T.StructField:
    if spec.kind in ("enum", "set", "bit"):
        return T.StructField(spec.name, T.LongType(), True)
    if spec.kind in ("blob", "geometry"):
        return T.StructField(spec.name, T.BinaryType(), True)
    return T.StructField(spec.name, T.StringType(), True)


def decode_row_images(
    df: DataFrame,
    specs: list[ColumnSpec],
    image_col: str = "image",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Decode a table of binary row images distributed: one
    ``mapInPandas`` stage, embarrassingly parallel on the input's
    partitioning (no shuffle). Output = ``id_cols`` passed through +
    one rendered column per spec (text forms per the frozen §1.2
    rules; ENUM/SET/BIT as integers)."""
    id_cols = id_cols or []
    in_schema = dict(df.dtypes)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [_output_field(s) for s in specs]
    )
    names = id_cols + [s.name for s in specs]
    for c in (image_col, *id_cols):
        if c not in in_schema:
            raise ValueError(f"missing column {c!r} in input")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                ids = [pdf[c].iloc[idx] for c in id_cols]
                rows.append(ids + _decode_one(bytes(pdf[image_col].iloc[idx]), specs))
            yield pd.DataFrame(rows, columns=names)

    return df.select(*id_cols, image_col).mapInPandas(run, schema=out_schema)
