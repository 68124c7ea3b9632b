"""Binary wire framing + vectorized decode — the engine's analogue of
the reference's byte-level event pipeline.

The reference reads length-prefixed packets and decodes a 19-byte
event header (timestamp u32, type u8, serverId u32, eventLen u32,
logPos u32, flags u16 — ``mysql/dbsync/event/LogHeader.java:243-303``)
followed by a typed body and a trailing CRC32 checksum that the
decoder strips (``mysql/dbsync/LogDecoder.java:158-169``), one event
at a time in Java. This module defines a deterministic wire format
with the same header layout and reproduces decode as **columnar Arrow
stages**:

frame := header(19B LE: ts u32 | type u8 | server_id u32 |
                event_len u32 | log_pos u32 | flags u16)
         ++ body utf-8 (fields joined by 0x1f; map entries "k<0x1d>v"
            joined by 0x1e)
         ++ checksum u32 (additive byte sum of header+body, mod 2^32)

Decode (``decode_frames``) is a ``mapInPandas`` stage where every step
is a numpy / pandas-C operation over the whole Arrow batch — header
fields via one ``np.frombuffer`` on the stacked 19-byte prefixes,
checksums via ``np.add.reduceat`` over the concatenated payload
buffer, body fields via vectorized ``str.split`` — followed by
JVM-side ``str_to_map`` for the before/after maps. No per-row Python.

Event type codes follow the reference's constants
(``mysql/dbsync/LogEvent.java:115-214``): QUERY=2, XID=16,
WRITE_ROWS=30, UPDATE_ROWS=31, DELETE_ROWS=32.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

FIELD_SEP = "\x1f"
ENTRY_SEP = "\x1e"
KV_SEP = "\x1d"

TYPE_QUERY = 2  # BEGIN / DDL (reference: QUERY_EVENT)
TYPE_XID = 16  # COMMIT (reference: XID_EVENT)
TYPE_WRITE = 30
TYPE_UPDATE = 31
TYPE_DELETE = 32

_OP_TO_TYPE = {
    "INSERT": TYPE_WRITE,
    "UPDATE": TYPE_UPDATE,
    "DELETE": TYPE_DELETE,
    "BEGIN": TYPE_QUERY,
    "COMMIT": TYPE_XID,
    "ALTER": TYPE_QUERY,
}
_TYPE_TO_OP_NONDML = {TYPE_XID: "COMMIT"}

_HEADER_DTYPE = np.dtype(
    [
        ("ts", "<u4"),
        ("type", "u1"),
        ("server_id", "<u4"),
        ("event_len", "<u4"),
        ("log_pos", "<u4"),
        ("flags", "<u2"),
    ]
)
HEADER_LEN = _HEADER_DTYPE.itemsize  # 19
CRC_LEN = 4

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("xid", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("is_ddl", T.BooleanType()),
        T.StructField("ddl_sql", T.StringType()),
        T.StructField("before_kv", T.StringType()),
        T.StructField("after_kv", T.StringType()),
        T.StructField("crc_ok", T.BooleanType()),
    ]
)


def _kv_pack(m: dict | None) -> str:
    if not m:
        return ""
    return ENTRY_SEP.join(f"{k}{KV_SEP}{v}" for k, v in m.items())


def encode_frames(events: pd.DataFrame) -> pd.DataFrame:
    """Encode a change-event frame (generator output) into wire frames
    ``(file, pos, payload)``. Rows sharing (file,pos) — multi-row
    events — pack into ONE frame whose body holds several row bodies.
    Generator-side helper (tests/bench input); numpy for the headers,
    Python only at the final bytes join."""
    ev = events.reset_index(drop=True)
    ts_u32 = (
        ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    ).to_numpy().astype(np.uint32)
    type_u8 = ev["op"].map(_OP_TO_TYPE).fillna(TYPE_QUERY).to_numpy().astype(np.uint8)

    bodies = (
        ev["op"].astype(str)
        + FIELD_SEP + ev["xid"].astype("Int64").astype(str).replace("<NA>", "")
        + FIELD_SEP + ev["row_idx"].astype(str)
        + FIELD_SEP + ev["schema_name"].fillna("").astype(str)
        + FIELD_SEP + ev["table_name"].fillna("").astype(str)
        + FIELD_SEP + ev["is_ddl"].map({True: "1", False: "0"}).astype(str)
        + FIELD_SEP + ev["ddl_sql"].fillna("").astype(str)
        + FIELD_SEP + ev["before"].map(_kv_pack)
        + FIELD_SEP + ev["after"].map(_kv_pack)
    )
    # group rows of one frame (same file,pos)
    fp = ev["file"].astype(str) + ":" + ev["pos"].astype(str)
    new_frame = (fp != fp.shift(1)).to_numpy()
    frame_no = np.cumsum(new_frame) - 1
    body_per_frame = bodies.groupby(frame_no).agg("\x1c".join)
    first_idx = np.flatnonzero(new_frame)

    body_bytes = body_per_frame.str.encode("utf-8")
    blens = body_bytes.str.len().to_numpy()
    n = len(first_idx)
    headers = np.zeros(n, dtype=_HEADER_DTYPE)
    headers["ts"] = ts_u32[first_idx]
    headers["type"] = type_u8[first_idx]
    headers["server_id"] = ev["server_id"].to_numpy()[first_idx].astype(np.uint32)
    headers["event_len"] = (HEADER_LEN + blens + CRC_LEN).astype(np.uint32)
    headers["log_pos"] = ev["pos"].to_numpy()[first_idx].astype(np.uint32)
    headers["flags"] = 0
    hbytes = headers.tobytes()

    payloads = []
    for i in range(n):
        h = hbytes[i * HEADER_LEN : (i + 1) * HEADER_LEN]
        b = body_bytes.iloc[i]
        csum = (int(np.frombuffer(h, np.uint8).sum()) + int(np.frombuffer(b, np.uint8).sum())) & 0xFFFFFFFF
        payloads.append(h + b + csum.to_bytes(4, "little"))
    return pd.DataFrame(
        {
            "file": ev["file"].to_numpy()[first_idx],
            "pos": ev["pos"].to_numpy()[first_idx].astype("int64"),
            "payload": payloads,
        }
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized decode of one Arrow batch of frames -> one row per
    RowData (multi-row frames explode on the 0x1c separator)."""
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(columns=[f.name for f in DECODED_SCHEMA.fields])
    payloads = pdf["payload"]
    # --- headers: stack the fixed prefixes, one frombuffer ---
    head_buf = b"".join(payloads.str[:HEADER_LEN])
    heads = np.frombuffer(head_buf, dtype=_HEADER_DTYPE)
    # --- checksum: additive sum over each payload via reduceat ---
    lens = payloads.str.len().to_numpy()
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = np.add.reduceat(flat.astype(np.int64), starts)
    # subtract the trailing 4 checksum bytes from the sum, vectorized
    crc_stored = np.frombuffer(
        b"".join(payloads.str[-CRC_LEN:]), dtype="<u4"
    ).astype(np.int64)
    crc_bytes_sum = (
        (crc_stored & 0xFF)
        + ((crc_stored >> 8) & 0xFF)
        + ((crc_stored >> 16) & 0xFF)
        + ((crc_stored >> 24) & 0xFF)
    )
    crc_ok = ((total - crc_bytes_sum) & 0xFFFFFFFF) == crc_stored

    # --- bodies: pandas-C string ops ---
    body = payloads.str[HEADER_LEN:-CRC_LEN].str.decode("utf-8")
    base = pd.DataFrame(
        {
            "file": pdf["file"].to_numpy(),
            "pos": pdf["pos"].to_numpy(),
            "server_id": heads["server_id"].astype("int64"),
            "ts": pd.to_datetime(heads["ts"].astype("int64"), unit="s"),
            "type": heads["type"],
            "crc_ok": crc_ok,
            "body": body.to_numpy(),
        }
    )
    # explode multi-row frames (0x1c-joined row bodies)
    rows = base.assign(body=base["body"].str.split("\x1c")).explode("body", ignore_index=True)
    fields = rows["body"].str.split(FIELD_SEP, expand=True)
    fields.columns = [
        "op", "xid", "row_idx", "schema_name", "table_name", "is_ddl", "ddl_sql",
        "before_kv", "after_kv",
    ][: fields.shape[1]]
    out = pd.DataFrame(
        {
            "file": rows["file"],
            "pos": rows["pos"].astype("int64"),
            "row_idx": pd.to_numeric(fields["row_idx"]).astype("int32"),
            "server_id": rows["server_id"],
            "ts": rows["ts"],
            "xid": pd.to_numeric(fields["xid"], errors="coerce").astype("Int64"),
            "op": fields["op"],
            "schema_name": fields["schema_name"].replace("", None),
            "table_name": fields["table_name"].replace("", None),
            "is_ddl": fields["is_ddl"] == "1",
            "ddl_sql": fields["ddl_sql"].replace("", None),
            "before_kv": fields["before_kv"],
            "after_kv": fields["after_kv"],
            "crc_ok": rows["crc_ok"],
        }
    )
    return out


def decode_frames(raw: DataFrame, drop_bad_crc: bool = True) -> DataFrame:
    """Raw wire frames -> typed change-event DataFrame (the D1-D5
    pipeline). ``mapInPandas`` vectorized decode, then JVM-side
    ``str_to_map`` to build before/after maps."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    decoded = raw.mapInPandas(gen, schema=DECODED_SCHEMA)
    if drop_bad_crc:
        decoded = decoded.filter(F.col("crc_ok"))
    to_map = lambda c: F.when(  # noqa: E731
        F.length(c) > 0, F.str_to_map(c, F.lit(ENTRY_SEP), F.lit(KV_SEP))
    )
    return decoded.select(
        "file",
        "pos",
        "row_idx",
        "server_id",
        "ts",
        "xid",
        "op",
        "schema_name",
        "table_name",
        "is_ddl",
        "ddl_sql",
        to_map(F.col("before_kv")).alias("before"),
        to_map(F.col("after_kv")).alias("after"),
    )


def write_wire_batches(events: pd.DataFrame, out_dir: str, n_batches: int = 8) -> list[str]:
    """Encode a generated stream into wire-frame parquet micro-batches."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    frames = encode_frames(events)
    os.makedirs(out_dir, exist_ok=True)
    cuts = np.linspace(0, len(frames), n_batches + 1).astype(int)
    schema = pa.schema([("file", pa.string()), ("pos", pa.int64()), ("payload", pa.binary())])
    paths = []
    for b in range(n_batches):
        chunk = frames.iloc[cuts[b] : cuts[b + 1]]
        if chunk.empty:
            continue
        path = os.path.join(out_dir, f"wire_{b:05d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(chunk, schema=schema, preserve_index=False),
            path,
            row_group_size=16384,
        )
        paths.append(path)
    return paths
