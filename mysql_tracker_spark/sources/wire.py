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

Body fields (10): op, xid, row_idx, schema_name, table_name, is_ddl,
ddl_sql, key_kv, before_kv, after_kv. ``key_kv`` carries ONLY the
primary-key columns — the wire analogue of the reference's per-column
``isKey`` flag (``protocol/protobuf/EntryProtocol.proto:83``): the
apply path extracts its partition/dedup keys from this tiny map
instead of parsing the full row image.

Decode (``decode_frames_kv``/``decode_frames``) is a ``mapInArrow``
stage built from pyarrow C++ kernels + zero-copy numpy views — header
fields via one ``np.frombuffer`` on the cast fixed-size prefixes,
checksums via a wrapping-uint32 cumsum over the slice's region of the
shared data buffer, body fields via ``pc.split_pattern`` /
``pc.list_element`` — followed by JVM-side ``str_to_map`` for the
before/after maps. No per-row Python objects at all in the hot path
(a pandas reference decoder, ``_decode_batch``, backs tests and the
driver-side DDL-frame decode).

Event type codes follow the reference's constants
(``mysql/dbsync/LogEvent.java:115-214``): QUERY=2, XID=16,
WRITE_ROWS=30, UPDATE_ROWS=31, DELETE_ROWS=32.

CHARSET INVARIANT: frame bodies are UTF-8 by format definition — the
producer renders values to text before framing, so per-column charset
handling (the reference's ``CharsetConversion``/``getFullString``
machinery over raw column bytes) happens upstream of this wire format.
Decoding captured MySQL row images with their real per-column
collations is the job of :mod:`mysql_tracker_spark.sources.mysql_types`
(``charset_decode`` + the byte-level type decoders); by the time bytes
reach these frames they are canonical UTF-8 strings. Frames whose body
is NOT valid UTF-8 are corrupt by definition and fall into the
checksum/wellformed drop path (tested).
"""

from __future__ import annotations

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
# MySQL control events (LogEvent.java:115-188; bodies decoded by
# sources.mysql_events) — none is a row event, so the runner's
# pre-decode type gate skips them like BEGIN/COMMIT frames.
# HEARTBEAT/INCIDENT/GTID additionally get JVM-side classification in
# the runner's manifest pass (M4 liveness, C5 incident policy, the
# wire GTID-set fence).
TYPE_STOP = 3
TYPE_ROTATE = 4
TYPE_FORMAT_DESC = 15
TYPE_INCIDENT = 26
TYPE_HEARTBEAT = 27
TYPE_ROWS_QUERY = 29
TYPE_GTID_MYSQL = 33
TYPE_PREV_GTIDS = 35
# MariaDB control events (LogEvent.java:189-214; bodies decoded by
# sources.mariadb_events) — none is a row event, so the runner's
# pre-decode type gate skips them like BEGIN/COMMIT frames
TYPE_MARIA_ANNOTATE = 160
TYPE_MARIA_CHECKPOINT = 161
TYPE_MARIA_GTID = 162
TYPE_MARIA_GTID_LIST = 163

_OP_TO_TYPE = {
    "INSERT": TYPE_WRITE,
    "UPDATE": TYPE_UPDATE,
    "DELETE": TYPE_DELETE,
    "BEGIN": TYPE_QUERY,
    "COMMIT": TYPE_XID,
    "ALTER": TYPE_QUERY,
    "STOP": TYPE_STOP,
    "ROTATE": TYPE_ROTATE,
    "FORMAT_DESC": TYPE_FORMAT_DESC,
    "INCIDENT": TYPE_INCIDENT,
    "HEARTBEAT": TYPE_HEARTBEAT,
    "ROWS_QUERY": TYPE_ROWS_QUERY,
    "GTID_MYSQL": TYPE_GTID_MYSQL,
    "PREV_GTIDS": TYPE_PREV_GTIDS,
    "ANNOTATE": TYPE_MARIA_ANNOTATE,
    "CHECKPOINT": TYPE_MARIA_CHECKPOINT,
    "GTID": TYPE_MARIA_GTID,
    "GTID_LIST": TYPE_MARIA_GTID_LIST,
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
        T.StructField("key_kv", T.StringType()),
        T.StructField("before_kv", T.StringType()),
        T.StructField("after_kv", T.StringType()),
        T.StructField("crc_ok", T.BooleanType()),
    ]
)


def _kv_pack(m: dict | None) -> str:
    if not m:
        return ""
    return ENTRY_SEP.join(f"{k}{KV_SEP}{v}" for k, v in m.items())


def encode_frames(
    events: pd.DataFrame, key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
) -> pd.DataFrame:
    """Encode a change-event frame (generator output) into wire frames
    ``(file, pos, payload)``. Rows sharing (file,pos) — multi-row
    events — pack into ONE frame whose body holds several row bodies.
    Generator-side helper (tests/bench input); numpy for the headers,
    Python only at the final bytes join. ``key_cols`` populate the
    ``key_kv`` body field (the reference's isKey columns)."""
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
        + FIELD_SEP + pd.Series(
            [
                _kv_pack(
                    {k: m[k] for k in key_cols if k in m} if m else None
                )
                # row IDENTITY = the before-image key when one exists
                # (MySQL RBR identifies the row to change by its before
                # image) — equal to the after key except for PK-moving
                # UPDATEs, so historical streams stay byte-identical
                for m in (
                    b if isinstance(b, dict) and b else a
                    for a, b in zip(ev["after"], ev["before"])
                )
            ],
            index=ev.index,
        )
        + FIELD_SEP + ev["before"].map(_kv_pack)
        + FIELD_SEP + ev["after"].map(_kv_pack)
    )
    # group rows of one frame (same file,pos) — frames are consecutive
    # runs, so join runs directly (a pandas groupby.agg(join) here cost
    # ~13 s/M rows in per-group python overhead)
    fp = ev["file"].astype(str) + ":" + ev["pos"].astype(str)
    new_frame = (fp != fp.shift(1)).to_numpy()
    first_idx = np.flatnonzero(new_frame)
    barr = bodies.to_numpy()
    run_ends = np.append(first_idx[1:], len(barr))
    body_bytes = pd.Series(
        [
            barr[s].encode("utf-8")
            if e == s + 1
            else "\x1c".join(barr[s:e]).encode("utf-8")
            for s, e in zip(first_idx, run_ends)
        ]
    )
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

    # --- payload assembly: C-level join of interleaved fragments ------
    import itertools

    import pyarrow as pa

    blens64 = blens.astype(np.int64)
    frame_lens = HEADER_LEN + blens64 + CRC_LEN
    frame_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(frame_lens, out=frame_starts[1:])

    # checksums: header row-sums + per-body sums (uint32 wrap = modulus)
    harr = np.frombuffer(hbytes, dtype=np.uint8).reshape(n, HEADER_LEN)
    body_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(blens64, out=body_off[1:])
    body_flat = np.frombuffer(b"".join(body_bytes), dtype=np.uint8)
    bcs = np.zeros(len(body_flat) + 1, dtype=np.uint32)
    np.cumsum(body_flat, out=bcs[1:], dtype=np.uint32)
    csum = (
        harr.sum(axis=1, dtype=np.uint32) + (bcs[body_off[1:]] - bcs[body_off[:-1]])
    ).astype("<u4")
    cbytes = csum.tobytes()

    hl, cl = HEADER_LEN, CRC_LEN
    buf = b"".join(
        itertools.chain.from_iterable(
            zip(
                (hbytes[i * hl : (i + 1) * hl] for i in range(n)),
                body_bytes,
                (cbytes[i * cl : (i + 1) * cl] for i in range(n)),
            )
        )
    )
    payload_arr = pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(frame_starts.tobytes()), pa.py_buffer(buf)],
    )
    return pd.DataFrame(
        {
            "file": ev["file"].to_numpy()[first_idx],
            "pos": ev["pos"].to_numpy()[first_idx].astype("int64"),
            "payload": payload_arr.to_pandas(),
        }
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized decode of one Arrow batch of frames -> one row per
    RowData (multi-row frames explode on the 0x1c separator).

    Corruption tolerance mirrors ``_decode_batch_arrow`` exactly (this
    variant also feeds the runner's DRIVER-side DDL decode, where a
    crash would abort the whole apply): truncated frames drop before
    the fixed-width header cast, invalid-UTF-8 bodies decode with
    replacement and fail the field-count check, and numeric fields are
    gated on frame validity so garbage never raises a cast error —
    corrupt frames surface as ``crc_ok=False`` rows (or vanish when
    truncated), never as task/driver failures."""
    if len(pdf) > 0:
        # truncated frames cannot be decoded (same drop the JVM-side
        # pre-filter applies on the hot path)
        pdf = pdf[
            pdf["payload"].str.len() > HEADER_LEN + CRC_LEN
        ].reset_index(drop=True)
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

    # --- bodies: pandas-C string ops (replacement chars on invalid
    # UTF-8 — the frame then fails the field-count check below) ---
    body = payloads.str[HEADER_LEN:-CRC_LEN].str.decode("utf-8", "replace")
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
    parts = rows["body"].str.split(FIELD_SEP)
    # wellformed = exactly 10 fields (the Arrow path's check); a
    # malformed body yields an all-null field row instead of crashing
    wellformed = parts.str.len() == 10
    safe = parts.where(wellformed, other=pd.Series([[""] * 10] * len(rows)))
    fields = pd.DataFrame(safe.tolist(), columns=[
        "op", "xid", "row_idx", "schema_name", "table_name", "is_ddl", "ddl_sql",
        "key_kv", "before_kv", "after_kv",
    ])
    ok = (rows["crc_ok"].to_numpy() & wellformed.to_numpy()).astype(bool)
    row_idx = pd.to_numeric(fields["row_idx"], errors="coerce").astype("Int64")
    xid = pd.to_numeric(fields["xid"], errors="coerce").astype("Int64")
    out = pd.DataFrame(
        {
            "file": rows["file"],
            "pos": rows["pos"].astype("int64"),
            "row_idx": row_idx.where(ok),
            "server_id": rows["server_id"],
            "ts": rows["ts"],
            "xid": xid.where(ok),
            "op": fields["op"],
            "schema_name": fields["schema_name"].replace("", None),
            "table_name": fields["table_name"].replace("", None),
            "is_ddl": fields["is_ddl"] == "1",
            "ddl_sql": fields["ddl_sql"].replace("", None),
            "key_kv": fields["key_kv"],
            "before_kv": fields["before_kv"],
            "after_kv": fields["after_kv"],
            "crc_ok": ok,
        }
    )
    return out


# Arrow-native decode output (kv maps still packed as strings; ts as
# epoch micros — both converted JVM-side). Kept separate from
# DECODED_SCHEMA so the hot path shuffles narrow strings, not maps.
DECODED_KV_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("xid", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("is_ddl", T.BooleanType()),
        T.StructField("ddl_sql", T.StringType()),
        T.StructField("key_kv", T.StringType()),
        T.StructField("before_kv", T.StringType()),
        T.StructField("after_kv", T.StringType()),
        T.StructField("crc_ok", T.BooleanType()),
    ]
)



def _frame_offsets_crc(pay, n):
    """Zero-copy (starts, ends, flat, lengths, crc_ok) over one Arrow
    binary column — the ONE implementation of the offset/cumsum/
    checksum arithmetic, shared by the decode (`_decode_batch_arrow`)
    and the audit (`_audit_batch_arrow`) so their verdicts can never
    drift. The trailing-CRC gather is clamped for frames shorter than
    4 bytes (all `truncated`, masked out of any verdict) and the empty
    batch degenerates safely."""
    import pyarrow as pa

    large = pa.types.is_large_binary(pay.type)
    off_dt = np.int64 if large else np.int32
    offs = np.frombuffer(pay.buffers()[1], dtype=off_dt)[pay.offset : pay.offset + n + 1]
    # restrict to THIS batch's region: on a sliced RecordBatch the data
    # buffer is the whole parent buffer — summing it all per slice
    # would be O(N^2/slice) (measured: dominated the decode under load)
    base = int(offs[0])
    flat = np.frombuffer(pay.buffers()[2], dtype=np.uint8)[base : int(offs[-1])]
    starts = (offs[:-1] - base).astype(np.int64)
    ends = (offs[1:] - base).astype(np.int64)
    lengths = ends - starts
    # uint32 cumsum wraps mod 2^32 — exactly the checksum's modulus
    cs = np.empty(len(flat) + 1, dtype=np.uint32)
    cs[0] = 0
    np.cumsum(flat, out=cs[1:], dtype=np.uint32)
    total = cs[ends] - cs[starts]
    idx = np.maximum(ends[:, None] - np.array([4, 3, 2, 1]), starts[:, None])
    crcb = flat[idx].astype(np.uint32) if len(flat) else np.zeros((n, 4), np.uint32)
    crc_stored = crcb @ np.array([1, 1 << 8, 1 << 16, 1 << 24], dtype=np.uint32)
    crc_ok = (total - crcb.sum(axis=1, dtype=np.uint32)) == crc_stored
    return starts, ends, flat, lengths, crc_ok


def _decode_batch_arrow(rb):
    """Decode one Arrow RecordBatch of frames entirely with pyarrow C++
    kernels + zero-copy numpy views — no per-row Python objects at all.

    The pandas variant above (``_decode_batch``) is semantically
    identical but churns millions of small PyObjects through the
    allocator; under 30 concurrent task workers that contention costs
    ~2.5x per-task (measured), so the hot path uses this one.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = rb.num_rows
    names = [f.name for f in DECODED_KV_SCHEMA.fields]
    if n == 0:
        return pa.RecordBatch.from_arrays(
            [pa.array([], type=_arrow_type(f.dataType)) for f in DECODED_KV_SCHEMA.fields],
            names=names,
        )
    pay = rb.column(rb.schema.get_field_index("payload"))
    if isinstance(pay, pa.ChunkedArray):  # defensive; RecordBatch cols are Arrays
        pay = pay.combine_chunks()

    # --- header: fixed 19-byte prefixes -> one contiguous buffer ------
    fsb = pc.cast(pc.binary_slice(pay, 0, HEADER_LEN), pa.binary(HEADER_LEN))
    heads = np.frombuffer(
        fsb.buffers()[1], dtype=_HEADER_DTYPE, count=n, offset=fsb.offset * HEADER_LEN
    )

    # --- checksum: shared zero-copy offset/cumsum/CRC arithmetic ------
    _, _, _, _, crc_ok_np = _frame_offsets_crc(pay, n)

    # --- bodies: C++ string kernels ----------------------------------
    body_bin = pc.binary_slice(pay, HEADER_LEN, -CRC_LEN)
    try:
        body = pc.cast(body_bin, pa.string())
    except pa.lib.ArrowInvalid:
        # rare corrupt path: a flipped byte can make a body invalid
        # UTF-8, and the C++ cast would fail the whole TASK instead of
        # dropping the frame. Salvage per-row (corruption is rare, so
        # Python here is off the hot path): invalid bodies become empty
        # strings, which fail the wellformed field-count check below and
        # fall into the existing drop path.
        vals = []
        for b in body_bin.to_pylist():
            try:
                vals.append(b.decode("utf-8"))
            except UnicodeDecodeError:
                vals.append("")
        body = pa.array(vals, pa.string())
    rows = pc.split_pattern(body, "\x1c")
    parent = pc.list_parent_indices(rows)
    parent_np = parent.to_numpy()
    flatrows = pc.list_flatten(rows)
    fields0 = pc.split_pattern(flatrows, FIELD_SEP)
    wellformed = pc.equal(pc.list_value_length(fields0), 10)
    if pc.all(wellformed).as_py() is True:
        fields = fields0  # common case: skip the guarded re-split
    else:
        safe = pc.if_else(wellformed, flatrows, pa.scalar(FIELD_SEP * 9))
        fields = pc.split_pattern(safe, FIELD_SEP)
    f = [pc.list_element(fields, i) for i in range(10)]

    ok = pa.array(crc_ok_np[parent_np] & wellformed.to_numpy(zero_copy_only=False))

    def nz(a):  # '' -> null (absent optional field)
        return pc.if_else(pc.equal(a, ""), pa.scalar(None, pa.string()), a)

    def num(a, typ):  # numeric parse gated on frame validity
        return pc.cast(pc.if_else(ok, nz(a), pa.scalar(None, pa.string())), typ)

    arrays = [
        pc.take(rb.column(rb.schema.get_field_index("file")), parent),
        pc.cast(pc.take(rb.column(rb.schema.get_field_index("pos")), parent), pa.int64()),
        num(f[2], pa.int32()),  # row_idx
        pa.array(heads["server_id"].astype(np.int64)[parent_np]),
        pa.array((heads["ts"].astype(np.int64) * 1_000_000)[parent_np]),
        num(f[1], pa.int64()),  # xid
        f[0],  # op
        nz(f[3]),  # schema_name
        nz(f[4]),  # table_name
        pc.equal(f[5], "1"),  # is_ddl
        nz(f[6]),  # ddl_sql
        f[7],  # key_kv
        f[8],  # before_kv
        f[9],  # after_kv
        ok,  # crc_ok
    ]
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _arrow_type(dt: T.DataType):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "long": pa.int64(),
        "integer": pa.int32(),
        "boolean": pa.bool_(),
    }[dt.typeName()]


def decode_frames_kv(
    raw: DataFrame, drop_bad_crc: bool = True, include_before: bool = False
) -> DataFrame:
    """Raw wire frames -> change events with before/after still PACKED
    as kv strings (``mapInArrow`` C++ decode). The hot apply path dedups
    on these narrow strings and builds maps only for the LWW winners.

    ``include_before=False`` prunes the before-image from the
    python->JVM Arrow transfer — the LWW apply never reads it, and it
    is roughly as large as the after-image."""
    schema = DECODED_KV_SCHEMA
    drop_cols: list[str] = []
    if not include_before:
        schema = T.StructType([f for f in schema.fields if f.name != "before_kv"])
        drop_cols = ["before_kv"]

    # truncated frames (shorter than header+crc+1) cannot be decoded —
    # drop them JVM-side before the Arrow kernel (the fixed-width header
    # cast would otherwise fail the task); same semantics as the
    # crc-fail drop path
    raw = raw.filter(F.length("payload") > HEADER_LEN + CRC_LEN)

    def gen(batches):
        import pyarrow as pa

        for rb in batches:
            out = _decode_batch_arrow(rb)
            for c in drop_cols:
                out = out.drop_columns(c)
            yield out

    decoded = raw.mapInArrow(gen, schema=schema)
    if drop_bad_crc:
        decoded = decoded.filter(F.col("crc_ok"))
    return decoded.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")


def kv_to_map(col):
    """Packed kv string -> map<string,string> ('' -> null map)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0, F.str_to_map(c, F.lit(ENTRY_SEP), F.lit(KV_SEP)))


def decode_frames(raw: DataFrame, drop_bad_crc: bool = True) -> DataFrame:
    """Raw wire frames -> typed change-event DataFrame (the D1-D5
    pipeline): Arrow-kernel decode, then JVM-side ``str_to_map`` for the
    before/after maps.

    ``drop_bad_crc=False`` KEEPS corrupt frames and appends the
    ``crc_ok`` column so the caller can tell them apart — their
    numeric/optional fields are nulled by the decode's validity gate,
    never garbage. Truncated frames (shorter than header+crc+1) are
    undecodable at ANY setting and always drop; use
    :func:`audit_frames` when those need classifying too."""
    decoded = decode_frames_kv(raw, drop_bad_crc=drop_bad_crc, include_before=True)
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
        kv_to_map("before_kv").alias("before"),
        kv_to_map("after_kv").alias("after"),
        *([] if drop_bad_crc else [F.col("crc_ok")]),
    )


def write_wire_distributed(
    spark,
    total_events: int,
    out_dir: str,
    n_chunks: int = 32,
    base_seed: int = 42,
    n_conversations: int | None = None,
    row_group_size: int = 16384,
    gen_kwargs: dict | None = None,
) -> list[str]:
    """Generate + encode the synthetic binlog IN PARALLEL on the
    executors: one Spark task per chunk, each producing a deterministic,
    disjoint slice of the stream (chunk c -> seed ``base_seed+c``, binlog
    files ``bin.{c*1000+1:06d}``...). This is the scale path — a driver
    cannot materialize 10^10 events, but 1000 executors generating 10^7
    each can, and chunk determinism makes the input reproducible at any
    parallelism. Conversations are SHARED across chunks, so cross-chunk
    upserts/deletes exercise the same LWW paths as the single-driver
    generator.

    Returns the sorted list of written parquet files (one per chunk;
    log order == lexicographic file order == chunk order).
    """
    import os as _os

    from .binlog_gen import GenConfig, gen_change_events

    _os.makedirs(out_dir, exist_ok=True)
    per_chunk = total_events // n_chunks
    # no silent caps: chunks 0..remainder-1 carry one extra event so
    # exactly total_events are generated (divisible totals stay
    # byte-identical to earlier runs)
    remainder = total_events % n_chunks
    n_conv = n_conversations or max(total_events // 40, 100)

    def gen_chunk(iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in iterator:
            for c in pdf["id"].tolist():
                cfg = GenConfig(
                    n_events=per_chunk + (1 if int(c) < remainder else 0),
                    n_conversations=n_conv,
                    seed=base_seed + int(c),
                    file_base=int(c) * 1000,
                    **(gen_kwargs or {}),
                )
                frames = gen_change_events(cfg)
                enc = encode_frames(frames)
                path = _os.path.join(out_dir, f"wire_{int(c):05d}.parquet")
                schema = pa.schema(
                    [("file", pa.string()), ("pos", pa.int64()), ("payload", pa.binary())]
                )
                pq.write_table(
                    pa.Table.from_pandas(enc, schema=schema, preserve_index=False),
                    path,
                    row_group_size=row_group_size,
                )
                yield pd.DataFrame({"path": [path], "frames": [len(enc)], "events": [len(frames)]})

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("frames", T.LongType()),
            T.StructField("events", T.LongType()),
        ]
    )
    res = (
        spark.range(n_chunks, numPartitions=n_chunks)
        .mapInPandas(gen_chunk, schema=out_schema)
        .collect()
    )
    return sorted(r["path"] for r in res)


# ---------------------------------------------------------------- quarantine

# Dead-letter record: the corrupt frame verbatim plus why it was
# rejected, keyed by its stream offset for exactly-once-at-read dedup.
FRAME_QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("reason", T.StringType()),  # truncated | bad_crc | malformed
        T.StructField("payload", T.BinaryType()),
    ]
)


def _audit_batch_arrow(rb):
    """Frame-level corruption audit over one Arrow batch: emits ONLY the
    bad frames (clean batches transfer zero rows back to the JVM).

    Classification mirrors the decode's drop rules exactly —
    ``truncated`` (shorter than header+crc+1, dropped JVM-side before
    the decode kernel), ``bad_crc`` (additive-checksum mismatch), and
    ``malformed`` (checksum passes but the body is invalid UTF-8 or a
    row does not split into the 10 wire fields). The checksum/offset
    arithmetic is the same zero-copy numpy as ``_decode_batch_arrow``;
    the body check runs only on checksum-clean frames.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    names = [f.name for f in FRAME_QUARANTINE_SCHEMA.fields]
    n = rb.num_rows
    empty = pa.RecordBatch.from_arrays(
        [
            pa.array([], pa.string()),
            pa.array([], pa.int64()),
            pa.array([], pa.int32()),
            pa.array([], pa.string()),
            pa.array([], pa.binary()),
        ],
        names=names,
    )
    if n == 0:
        return empty
    pay = rb.column(rb.schema.get_field_index("payload"))
    if isinstance(pay, pa.ChunkedArray):
        pay = pay.combine_chunks()

    starts, ends, flat, lengths, crc_ok = _frame_offsets_crc(pay, n)
    truncated = lengths <= HEADER_LEN + CRC_LEN
    bad_crc = ~truncated & ~crc_ok

    malformed = np.zeros(n, dtype=bool)
    chk = np.flatnonzero(~truncated & crc_ok)
    if len(chk):
        sub = pc.take(pay, pa.array(chk, pa.int64()))
        body_bin = pc.binary_slice(sub, HEADER_LEN, -CRC_LEN)
        utf8_bad = np.zeros(len(chk), dtype=bool)
        try:
            body = pc.cast(body_bin, pa.string())
        except pa.lib.ArrowInvalid:
            vals = []
            for i, b in enumerate(body_bin.to_pylist()):
                try:
                    vals.append(b.decode("utf-8"))
                except UnicodeDecodeError:
                    vals.append("")
                    utf8_bad[i] = True
            body = pa.array(vals, pa.string())
        rows = pc.split_pattern(body, "\x1c")
        fields = pc.split_pattern(pc.list_flatten(rows), FIELD_SEP)
        row_ok = pc.equal(pc.list_value_length(fields), 10).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(rows).to_numpy()
        frame_ok = np.ones(len(chk), dtype=bool)
        np.logical_and.at(frame_ok, parent, row_ok)
        malformed[chk] = utf8_bad | ~frame_ok

    reason = np.where(
        truncated, "truncated", np.where(bad_crc, "bad_crc", np.where(malformed, "malformed", ""))
    )
    bad = np.flatnonzero(reason != "")
    if not len(bad):
        return empty
    take = pa.array(bad, pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            pc.take(rb.column(rb.schema.get_field_index("file")), take),
            pc.cast(pc.take(rb.column(rb.schema.get_field_index("pos")), take), pa.int64()),
            pa.array(lengths[bad].astype(np.int32)),
            pa.array(reason[bad]),
            pc.cast(pc.take(pay, take), pa.binary()),
        ],
        names=names,
    )


def quarantine_frames(raw: DataFrame) -> DataFrame:
    """Dead-letter scan: every corrupt frame in ``raw`` with its reason
    and verbatim payload (schema ``FRAME_QUARANTINE_SCHEMA``).

    The decode path *drops* corrupt frames (reference behavior — the
    Java decoder logs and skips, ``LogDecoder.java:158-169``); at 10^10
    events that makes data loss unauditable. This scan is the opt-in
    audit twin: one Arrow pass (numpy checksum + body check on
    checksum-clean frames only), emitting rows ONLY for bad frames, so
    a clean stream costs one scan and zero transfer."""

    def gen(batches):
        for rb in batches:
            yield _audit_batch_arrow(rb)

    return raw.mapInArrow(gen, schema=FRAME_QUARANTINE_SCHEMA)


def read_quarantine(spark, quarantine_dir: str) -> DataFrame:
    """Read a job's dead-letter directory. Replays after a crash between
    the quarantine write and the snapshot commit can double-write a
    batch's bad frames, so reads dedup on the frame's stream offset —
    the same exactly-once-at-read rule the log applies to events."""
    import os

    subs = sorted(
        os.path.join(quarantine_dir, d)
        for d in os.listdir(quarantine_dir)
        if os.path.isdir(os.path.join(quarantine_dir, d))
    )
    if not subs:
        return spark.createDataFrame([], FRAME_QUARANTINE_SCHEMA)
    return spark.read.parquet(*subs).dropDuplicates(["file", "pos"])


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
