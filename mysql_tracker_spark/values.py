"""Frozen value-stringification rules (SURVEY.md §1.2).

The reference renders every decoded binlog value to TEXT before it
ships an Entry; our per-turn text-equality invariant inherits those
rules, so they are frozen here, each matching its reference site
byte-for-byte:

* **unsigned re-basing** (``tracker/parser/LogEventConvert.java:449-482``):
  a negative signed decode of an UNSIGNED column is re-based by the
  type's modulus — TINY +2^8, SHORT +2^16, INT24 +2^24, LONG +2^32 —
  and the declared type is bumped one size up; LONGLONG re-bases via
  BigInteger +2^64 and becomes DECIMAL (constants at
  ``LogEventConvert.java:50-54``).
* **DECIMAL** (``LogEventConvert.java:497-498``): ``BigDecimal
  .toPlainString()`` — scale preserved, never scientific notation.
* **TIMESTAMP / DATETIME zero-date sentinel**
  (``mysql/dbsync/event/RowsLogBuffer.java:395-449,450-536``): raw 0
  renders ``"0000-00-00 00:00:00"``; otherwise
  ``yyyy-MM-dd HH:mm:ss`` (the reference strips ``Timestamp
  .toString()``'s trailing ``.0``).
* **DATE** (``RowsLogBuffer.java:668-686``): raw 0 renders
  ``"0000-00-00"``, else ``%04d-%02d-%02d``.
* **TIME** (``RowsLogBuffer.java:620-655``): text, ``[-]%02d:%02d:%02d``
  with hours unpadded beyond two digits (range ±838:59:59); zero is
  ``"00:00:00"``.
* **YEAR** (``RowsLogBuffer.java:687-718``): raw 0 renders ``"0000"``,
  else ``str(1900 + raw)``.
* **FLOAT/DOUBLE/BIT** (``LogEventConvert.java:489-496``): plain
  ``String.valueOf`` — we mirror with repr-shortest formatting for
  doubles (Java and Python agree on shortest round-trip decimal).

Because a zero-date sentinel is not a representable TimestampType/
DateType value, columns that may carry it stay STRING in the typed
target schema (the reference keeps all temporal values as text too —
``EntryProtocol.proto:93``). ``promoted_spark_type`` gives the typed
readback column for integer columns under the unsigned promotion rule.

Scalar renderers define the rule; ``*_series`` variants are the
vectorized generator/ingest forms (numpy/pandas, no per-row Python in
the numeric path).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import types as T

ZERO_DATETIME = "0000-00-00 00:00:00"
ZERO_DATE = "0000-00-00"

# byte length -> unsigned modulus (LogEventConvert.java:50-54)
_REBASE = {1: 1 << 8, 2: 1 << 16, 3: 1 << 24, 4: 1 << 32, 8: 1 << 64}

# byte length -> (signed spark type, unsigned-promoted spark type)
_INT_TYPES: dict[int, tuple[T.DataType, T.DataType]] = {
    1: (T.ByteType(), T.ShortType()),
    2: (T.ShortType(), T.IntegerType()),
    3: (T.IntegerType(), T.IntegerType()),
    4: (T.IntegerType(), T.LongType()),
    8: (T.LongType(), T.DecimalType(20, 0)),
}


def promoted_spark_type(byte_len: int, unsigned: bool) -> T.DataType:
    """Typed-readback column type for an integer column under the
    reference's unsigned promotion (one size up; LONGLONG -> DECIMAL)."""
    signed, unsig = _INT_TYPES[byte_len]
    return unsig if unsigned else signed


def render_int(value: int, byte_len: int, unsigned: bool) -> str:
    """Integer rendering with unsigned re-basing
    (LogEventConvert.java:449-482). ``value`` is the signed decode of
    the raw bytes (what the binlog row image yields)."""
    if unsigned and value < 0:
        return str(value + _REBASE[byte_len])
    return str(value)


def render_int_series(s: pd.Series, byte_len: int, unsigned: bool) -> pd.Series:
    v = s.astype("int64")
    if not unsigned:
        return v.astype(str)
    if byte_len == 8:
        # numpy int64 cannot hold +2^64 re-bases: go through uint64
        out = v.to_numpy().view(np.uint64)
        return pd.Series(out, index=s.index).astype(str)
    rebased = v.where(v >= 0, v + _REBASE[byte_len])
    return rebased.astype(str)


def render_decimal(value: Decimal | str) -> str:
    """``BigDecimal.toPlainString()``: scale preserved, no exponent
    (LogEventConvert.java:497-498). ``Decimal('1.50')`` -> ``"1.50"``,
    ``Decimal('1.2E-5')`` -> ``"0.000012"``."""
    d = value if isinstance(value, Decimal) else Decimal(value)
    return format(d, "f")


def render_decimal_series(s: pd.Series) -> pd.Series:
    return s.map(render_decimal)


def render_timestamp(epoch_seconds: int) -> str:
    """TIMESTAMP/DATETIME text (RowsLogBuffer.java:395-449): raw 0 is
    the zero-date sentinel; else UTC ``yyyy-MM-dd HH:mm:ss``."""
    if epoch_seconds == 0:
        return ZERO_DATETIME
    return (
        pd.Timestamp(epoch_seconds, unit="s").strftime("%Y-%m-%d %H:%M:%S")
    )


def render_timestamp_series(epoch_seconds: pd.Series) -> pd.Series:
    v = epoch_seconds.astype("int64")
    txt = pd.to_datetime(v, unit="s").dt.strftime("%Y-%m-%d %H:%M:%S")
    return txt.where(v != 0, ZERO_DATETIME)


def render_date(raw: int) -> str:
    """DATE text (RowsLogBuffer.java:668-686): packed day|month<<5|
    year<<9 (i32 = year*16*32 + month*32 + day); raw 0 -> sentinel."""
    if raw == 0:
        return ZERO_DATE
    return f"{raw // (16 * 32):04d}-{raw // 32 % 16:02d}-{raw % 32:02d}"


def render_date_ymd(year: int, month: int, day: int) -> str:
    if year == 0 and month == 0 and day == 0:
        return ZERO_DATE
    return f"{year:04d}-{month:02d}-{day:02d}"


def render_date_series(year: pd.Series, month: pd.Series, day: pd.Series) -> pd.Series:
    txt = (
        year.astype("int64").map("{:04d}".format)
        + "-" + month.astype("int64").map("{:02d}".format)
        + "-" + day.astype("int64").map("{:02d}".format)
    )
    zero = (year == 0) & (month == 0) & (day == 0)
    return txt.where(~zero, ZERO_DATE)


def render_time(total_seconds: int) -> str:
    """TIME text (RowsLogBuffer.java:620-655): ``[-]%02d:%02d:%02d``,
    hours up to 838 print unpadded beyond two digits; zero is
    ``"00:00:00"``."""
    sign = "" if total_seconds >= 0 else "-"
    u = abs(total_seconds)
    return f"{sign}{u // 3600:02d}:{u // 60 % 60:02d}:{u % 60:02d}"


def render_time_series(total_seconds: pd.Series) -> pd.Series:
    v = total_seconds.astype("int64")
    u = v.abs()
    txt = (
        (u // 3600).map("{:02d}".format)
        + ":" + (u // 60 % 60).map("{:02d}".format)
        + ":" + (u % 60).map("{:02d}".format)
    )
    # stay a Series (index-aligned like every sibling renderer)
    return txt.where(v >= 0, "-" + txt)


def render_year(raw: int) -> str:
    """YEAR text (RowsLogBuffer.java:687-718): raw byte 0 -> "0000",
    else str(1900 + raw) (displayable range 1901-2155)."""
    return "0000" if raw == 0 else str(1900 + raw)


def render_year_series(raw: pd.Series) -> pd.Series:
    v = raw.astype("int64")
    return (v + 1900).astype(str).where(v != 0, "0000")


def render_double(value: float) -> str:
    """FLOAT/DOUBLE ``String.valueOf`` (LogEventConvert.java:489-493).
    Java and Python both print the shortest decimal that round-trips;
    Java appends ``.0`` for integral doubles, matching ``repr``."""
    return repr(float(value))
