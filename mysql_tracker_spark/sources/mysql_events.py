"""MySQL control-event surface (VERDICT round-4 items 2+5).

The reference enumerates ~36 MySQL event types
(``mysql/dbsync/LogEvent.java:115-188``) and decodes the control
vocabulary in ``mysql/dbsync/LogDecoder.java:94-491``.  Much of that
set is replaced by design in this engine (ROTATE ≡ the ``file``
column of every event, TABLE_MAP ≡ the manifest schema registry,
FORMAT_DESCRIPTION ≡ the frame version), and unknown frames already
drop safely through the F4 pre-decode gate — but several control
events have real semantics a capture replay wants CLASSIFIED rather
than dropped:

==================  ===  =============================================
STOP                  3  master shut down cleanly (end of stream)
ROTATE                4  next-binlog pointer: u64 position + filename
                         (``event/RotateLogEvent.java:53-110``)
FORMAT_DESCRIPTION   15  binlog format preamble: version, server
                         version, per-type post-header lengths
                         (``event/FormatDescriptionLogEvent.java``)
INCIDENT             26  "something out of the ordinary happened on
                         the master" — possibly LOST EVENTS; a replica
                         must not silently continue
                         (``event/IncidentLogEvent.java:41-100``)
HEARTBEAT            27  master-is-alive probe sent at idle; carries
                         the current binlog file name
                         (``event/HeartbeatLogEvent.java:23``)
ROWS_QUERY           29  the original SQL text of the following row
                         events (``binlog_rows_query_log_events=ON``)
                         — the MySQL twin of MariaDB ANNOTATE_ROWS
                         (``event/RowsQueryLogEvent.java:10``)
GTID                 33  starts an event group: 16-byte server UUID +
                         u64 transaction number
                         (``event/GtidLogEvent.java:11-45``)
PREVIOUS_GTIDS       35  logged at the start of every binlog ≥5.6:
                         the executed-GTID-set snapshot
                         (``event/PreviousGtidsLogEvent.java:12``)
==================  ===  =============================================

The engine's stance mirrors :mod:`.mariadb_events` (that module is
the template — same dual surface):

* **wire/frame level** — the types are enumerated and classified; none
  is a row event, so the JVM pre-decode gate skips them like
  BEGIN/COMMIT.  HEARTBEAT feeds the M4 liveness surface
  (``ApplyStats.heartbeat_ts``), INCIDENT feeds the C5 incident
  policy (``CdcApplyJob(incident_policy=...)``), and GTID frames feed
  the wire-path GTID-set fence (``CdcApplyJob(gtid_set=...)`` —
  the wire twin of ``operators.parse.after_gtid_set``).
* **byte level** — the real body layouts (public binlog format,
  documented at dev.mysql.com "Binary Log Event Structure"; field-
  compatible with the reference's decoders) are decoded here so
  captured payloads can be classified, and PREVIOUS_GTIDS decodes to
  the canonical executed-set text form that ``after_gtid_set``
  accepts — a capture can self-seed its fence from the binlog
  preamble.

Nothing in this module runs per row on the data path: body decoders
handle single control frames (a handful per binlog file), and the
fence compiles to a constant predicate + one bounded anti-join.
"""

from __future__ import annotations

import struct
import uuid as _uuid

# LogEvent.java:115-188
UNKNOWN_EVENT = 0
QUERY_EVENT = 2
STOP_EVENT = 3
ROTATE_EVENT = 4
INTVAR_EVENT = 5
RAND_EVENT = 13
USER_VAR_EVENT = 14
FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
INCIDENT_EVENT = 26
HEARTBEAT_LOG_EVENT = 27
IGNORABLE_LOG_EVENT = 28
ROWS_QUERY_LOG_EVENT = 29
WRITE_ROWS_EVENT = 30
UPDATE_ROWS_EVENT = 31
DELETE_ROWS_EVENT = 32
GTID_LOG_EVENT = 33
ANONYMOUS_GTID_LOG_EVENT = 34
PREVIOUS_GTIDS_LOG_EVENT = 35
MYSQL_EVENTS_END = 36

MYSQL_CONTROL_EVENT_NAMES = {
    STOP_EVENT: "STOP",
    ROTATE_EVENT: "ROTATE",
    FORMAT_DESCRIPTION_EVENT: "FORMAT_DESC",
    INCIDENT_EVENT: "INCIDENT",
    HEARTBEAT_LOG_EVENT: "HEARTBEAT",
    ROWS_QUERY_LOG_EVENT: "ROWS_QUERY",
    GTID_LOG_EVENT: "GTID_MYSQL",
    PREVIOUS_GTIDS_LOG_EVENT: "PREV_GTIDS",
}

# IncidentLogEvent.java:43-50
INCIDENT_NONE = 0
INCIDENT_LOST_EVENTS = 1


# ---------------------------------------------------------------- bodies
# Post-header body layouts (checksum already stripped by the framing
# layer, LogDecoder.java:158-169).  All integers little-endian.


def decode_rotate_body(body: bytes) -> dict:
    """ROTATE_EVENT (4): u64 next-event position (always 4), then the
    next binlog file name, NOT null-terminated — it runs to the end of
    the event (``RotateLogEvent.java:56-74``)."""
    if len(body) < 8:
        raise ValueError(f"ROTATE_EVENT body too short: {len(body)} bytes")
    (position,) = struct.unpack_from("<Q", body, 0)
    return {
        "position": position,
        "next_file": body[8:].decode("utf-8", "replace"),
    }


def decode_format_description_body(body: bytes) -> dict:
    """FORMAT_DESCRIPTION_EVENT (15): u16 binlog version, 50-byte
    null-padded server-version string, u32 create timestamp, u8 common
    header length, then one post-header-length byte per event type
    (``FormatDescriptionLogEvent.java``; StartLogEventV3 layout)."""
    if len(body) < 57:
        raise ValueError(
            f"FORMAT_DESCRIPTION_EVENT body too short: {len(body)} bytes"
        )
    (binlog_version,) = struct.unpack_from("<H", body, 0)
    server_version = body[2:52].split(b"\x00", 1)[0].decode("utf-8", "replace")
    (create_ts,) = struct.unpack_from("<I", body, 52)
    common_header_len = body[56]
    return {
        "binlog_version": binlog_version,
        "server_version": server_version,
        "create_ts": create_ts,
        "common_header_len": common_header_len,
        "post_header_lens": list(body[57:]),
    }


def decode_heartbeat_body(body: bytes) -> str:
    """HEARTBEAT_LOG_EVENT (27): the current binlog file name, no
    terminator (``HeartbeatLogEvent.java:23-40``)."""
    return body.decode("utf-8", "replace")


def decode_rows_query_body(body: bytes) -> str:
    """ROWS_QUERY_LOG_EVENT (29): u8 length byte (the statement may be
    truncated to 255 in it), then the query text running to the end of
    the event — readers use the full remainder, not the length byte
    (``RowsQueryLogEvent.java:10-30``)."""
    if not body:
        return ""
    return body[1:].decode("utf-8", "replace")


def decode_incident_body(body: bytes) -> dict:
    """INCIDENT_EVENT (26): u16 incident number, u8 message length,
    then the message (``IncidentLogEvent.java:55-80``).  Unrecognized
    incident numbers decode to INCIDENT_NONE with a null message,
    matching the reference's is_valid() contract."""
    if len(body) < 2:
        raise ValueError("INCIDENT_EVENT body too short")
    (number,) = struct.unpack_from("<H", body, 0)
    if number <= INCIDENT_NONE or number >= 2:
        return {"incident": INCIDENT_NONE, "message": None}
    mlen = body[2] if len(body) > 2 else 0
    message = body[3 : 3 + mlen].decode("utf-8", "replace")
    return {"incident": number, "message": message}


def decode_stop_body(body: bytes) -> dict:
    """STOP_EVENT (3): empty body (``StopLogEvent.java:15``)."""
    if body:
        raise ValueError(f"STOP_EVENT carries {len(body)} unexpected bytes")
    return {}


def decode_gtid_body(body: bytes) -> dict:
    """GTID_LOG_EVENT (33): u8 commit flag, 16-byte server UUID (SID),
    u64 transaction number (GNO) (``GtidLogEvent.java:13-38``; the
    reference decodes only the flag and skips the SID/GNO — this
    engine needs them for the fence).  Returns the canonical
    ``"uuid:gno"`` text form."""
    if len(body) < 25:
        raise ValueError(f"GTID_LOG_EVENT body too short: {len(body)} bytes")
    commit_flag = body[0] != 0
    sid = str(_uuid.UUID(bytes=body[1:17]))
    (gno,) = struct.unpack_from("<Q", body, 17)
    return {
        "commit_flag": commit_flag,
        "sid": sid,
        "gno": gno,
        "gtid": f"{sid}:{gno}",
    }


def decode_previous_gtids_body(body: bytes) -> str:
    """PREVIOUS_GTIDS_LOG_EVENT (35): u64 SID count, then per SID a
    16-byte UUID, u64 interval count, and (u64 start, u64 end) interval
    pairs — ends are EXCLUSIVE in the wire form, inclusive in the text
    form (MySQL Gtid_set encoding).  Returns the canonical executed-set
    text ``"uuid:lo-hi[:lo-hi...][,uuid:...]"`` that
    ``operators.parse.after_gtid_set`` accepts; a fresh server's EMPTY
    preamble decodes to ``""`` — self-seed a fence with
    ``CdcApplyJob(gtid_set=decode_previous_gtids_body(...) or None)``
    (the job also normalizes ``""`` to no-fence itself), and an
    interval-less SID decodes to a bare ``"uuid"`` entry that the
    parser accepts as covering nothing."""
    if len(body) < 8:
        raise ValueError("PREVIOUS_GTIDS_LOG_EVENT body too short")
    (n_sids,) = struct.unpack_from("<Q", body, 0)
    off = 8
    sets = []
    for _ in range(n_sids):
        if len(body) < off + 24:
            raise ValueError("PREVIOUS_GTIDS_LOG_EVENT: truncated SID block")
        sid = str(_uuid.UUID(bytes=body[off : off + 16]))
        (n_iv,) = struct.unpack_from("<Q", body, off + 16)
        off += 24
        ivs = []
        for _ in range(n_iv):
            if len(body) < off + 16:
                raise ValueError(
                    "PREVIOUS_GTIDS_LOG_EVENT: truncated interval"
                )
            lo, end = struct.unpack_from("<QQ", body, off)
            off += 16
            hi = end - 1
            ivs.append(str(lo) if lo == hi else f"{lo}-{hi}")
        sets.append(f"{sid}:{':'.join(ivs)}" if ivs else sid)
    return ",".join(sets)


def encode_previous_gtids_body(executed: str) -> bytes:
    """Inverse of :func:`decode_previous_gtids_body` — builds the wire
    bytes for an executed-set text form.  Test-fixture helper (the
    engine never writes real binlogs); round-trips with the decoder."""
    out = []
    sids = [p for p in executed.split(",") if p.strip()]
    out.append(struct.pack("<Q", len(sids)))
    for part in sids:
        bits = part.strip().split(":")
        sid = _uuid.UUID(bits[0])
        ivs = []
        for rng in bits[1:]:
            if "-" in rng:
                lo_s, hi_s = rng.split("-", 1)
                ivs.append((int(lo_s), int(hi_s) + 1))
            else:
                ivs.append((int(rng), int(rng) + 1))
        out.append(sid.bytes)
        out.append(struct.pack("<Q", len(ivs)))
        for lo, end in ivs:
            out.append(struct.pack("<QQ", lo, end))
    return b"".join(out)


# ---------------------------------------- statement-context events
# Statement-based-replication context events (the reference decodes
# them in LogDecoder.java:240-290; an RBR engine never consumes them,
# but a capture replay wants them classified + readable, same stance
# as ROWS_QUERY). Post-headers are empty for all three.

# IntvarLogEvent.java:44-46
INTVAR_LAST_INSERT_ID = 1
INTVAR_INSERT_ID = 2

# UserVarLogEvent.java:52-60 (Item_result enum)
UV_STRING_RESULT = 0
UV_REAL_RESULT = 1
UV_INT_RESULT = 2
UV_DECIMAL_RESULT = 4


def decode_intvar_body(body: bytes) -> dict:
    """INTVAR_EVENT (5): u8 type (1 = LAST_INSERT_ID, 2 = INSERT_ID),
    u64 value (``IntvarLogEvent.java:30-70``)."""
    if len(body) < 9:
        raise ValueError(f"INTVAR_EVENT body too short: {len(body)} bytes")
    kind = body[0]
    (value,) = struct.unpack_from("<Q", body, 1)
    name = {
        INTVAR_LAST_INSERT_ID: "LAST_INSERT_ID",
        INTVAR_INSERT_ID: "INSERT_ID",
    }.get(kind, "INVALID")
    return {"type": kind, "type_name": name, "value": value}


def decode_rand_body(body: bytes) -> dict:
    """RAND_EVENT (13): u64 seed1, u64 seed2
    (``RandLogEvent.java:60-80``)."""
    if len(body) < 16:
        raise ValueError(f"RAND_EVENT body too short: {len(body)} bytes")
    seed1, seed2 = struct.unpack_from("<QQ", body, 0)
    return {"seed1": seed1, "seed2": seed2}


def decode_user_var_body(body: bytes) -> dict:
    """USER_VAR_EVENT (14): u32 name length, name, u8 is_null; when
    not null: u8 result type, u32 charset id, u32 value length, then
    the typed value — f64 (REAL), i64/u32 (INT), precision/scale +
    packed-BCD (DECIMAL, ``strings/decimal.c bin2decimal``), or
    charset-encoded bytes (STRING) (``UserVarLogEvent.java:69-127``).
    Reuses the engine's byte-level DECIMAL and charset decoders."""
    if len(body) < 5:
        raise ValueError("USER_VAR_EVENT body too short")
    (name_len,) = struct.unpack_from("<I", body, 0)
    if len(body) < 4 + name_len + 1:
        raise ValueError("USER_VAR_EVENT: truncated name")
    name = body[4 : 4 + name_len].decode("utf-8", "replace")
    off = 4 + name_len
    if body[off]:
        return {"name": name, "value": None, "type": UV_STRING_RESULT}
    off += 1
    if len(body) < off + 9:
        raise ValueError("USER_VAR_EVENT: truncated value header")
    vtype = body[off]
    (charset_id,) = struct.unpack_from("<I", body, off + 1)
    (val_len,) = struct.unpack_from("<I", body, off + 5)
    off += 9
    if len(body) < off + val_len:
        raise ValueError("USER_VAR_EVENT: truncated value")
    raw = body[off : off + val_len]
    if vtype == UV_REAL_RESULT:
        if val_len != 8:
            raise ValueError(f"REAL_RESULT length {val_len}")
        value = struct.unpack("<d", raw)[0]
    elif vtype == UV_INT_RESULT:
        if val_len == 8:
            value = struct.unpack("<q", raw)[0]
        elif val_len == 4:
            value = struct.unpack("<I", raw)[0]
        else:
            raise ValueError(f"INT_RESULT length {val_len}")
    elif vtype == UV_DECIMAL_RESULT:
        if val_len < 2:
            raise ValueError("DECIMAL_RESULT too short")
        from .mysql_types import decode_decimal

        value = decode_decimal(raw[2:], raw[0], raw[1])
    elif vtype == UV_STRING_RESULT:
        from .mysql_types import charset_decode

        value = charset_decode(raw, charset_id)
    else:
        raise ValueError(f"unsupported USER_VAR result type {vtype}")
    return {
        "name": name,
        "type": vtype,
        "charset_id": charset_id,
        "value": value,
    }


def decode_anonymous_gtid_body(body: bytes) -> dict:
    """ANONYMOUS_GTID_LOG_EVENT (34): same layout as GTID_LOG_EVENT —
    the SID/GNO bytes are present but carry no identity
    (``LogDecoder.java:425-432`` routes both to the same decoder)."""
    out = decode_gtid_body(body)
    out["anonymous"] = True
    return out


# ------------------------------------------------- generator flavoring


def mysql_control_flavor(
    events,
    server_uuid: str = "3e11fa47-71ca-11e1-9e33-c80aa9429562",
    heartbeat_every: int = 500,
    incident_at: int | None = None,
):
    """Re-flavor a generated change stream
    (:func:`binlog_gen.gen_change_events` output) as a control-event-
    laden MySQL ≥5.6 binlog — the MySQL twin of
    :func:`mariadb_events.mariadb_flavor`:

    * every BEGIN query event becomes a GTID event (op ``GTID_MYSQL``,
      payload ``"uuid:gno"`` in ``ddl_sql``, gno = the txn's xid) —
      GTID-mode binlogs start event groups with GTID_LOG_EVENT;
    * a ROWS_QUERY frame is injected immediately before each
      transaction's first row frame (``binlog_rows_query_log_events``);
    * the stream opens with FORMAT_DESCRIPTION, PREVIOUS_GTIDS (empty
      executed set) and ROTATE frames — every real binlog's preamble;
    * a HEARTBEAT frame lands every ``heartbeat_every`` events
      (carrying the current file name) and a STOP frame closes the
      stream;
    * ``incident_at`` (an event index) optionally injects an INCIDENT
      frame there — payload ``"1:<message>"`` (LOST_EVENTS).

    DML frames, positions, timestamps, xids, and the duplicated replay
    tail are byte-untouched, so the LWW oracle of the original stream
    is the oracle of the flavored one."""
    import numpy as np
    import pandas as pd

    ev = events.copy()
    is_begin = ev["op"] == "BEGIN"
    ev.loc[is_begin, "op"] = "GTID_MYSQL"
    ev.loc[is_begin, "ddl_sql"] = (
        f"{server_uuid}:" + ev.loc[is_begin, "xid"].astype("Int64").astype(str)
    )

    def _ctl(file, pos, ts, op, payload, xid=None):
        return {
            "file": file,
            "pos": int(pos),
            "row_idx": 0,
            "server_id": 1,
            "ts": ts,
            "xid": xid,
            "gtid": None,
            "op": op,
            "schema_name": None,
            "table_name": None,
            "is_ddl": False,
            "ddl_sql": payload,
            "before": None,
            "after": None,
        }

    # STREAM ORDER (not (file,pos) order) — same invariant as
    # mariadb_flavor: the replay tail repeats earlier offsets at the
    # END, so injected frames get fractional order keys.
    ev["__ord"] = np.arange(len(ev), dtype="float64")

    # frame-boundary snap for arbitrary-index injections (HEARTBEAT /
    # INCIDENT): rows sharing one (file,pos) are ONE multi-row event,
    # and write_batches promises never to tear an event across batch
    # files — injecting BETWEEN two rows of a frame would split it into
    # two same-offset frames a batch cut could then separate (review
    # fix; reproduced with other seeds: the second half fails the
    # strict past-watermark fence and its rows vanish). Anchor every
    # injection at the START of the frame containing the target index.
    fpkey = ev["file"].astype(str) + ":" + ev["pos"].astype(str)
    frame_start_idx = np.flatnonzero((fpkey != fpkey.shift(1)).to_numpy())

    def snap(i: int) -> int:
        return int(
            frame_start_idx[
                np.searchsorted(frame_start_idx, i, side="right") - 1
            ]
        )

    extra = []
    dml = ev[ev["op"].isin(["INSERT", "UPDATE", "DELETE"])]
    first = dml.drop_duplicates(subset=["xid"], keep="first")
    for idx, r in first.iterrows():  # one row per txn — tiny loop
        c = _ctl(
            r["file"],
            int(r["pos"]) - 1,
            r["ts"],
            "ROWS_QUERY",
            f"/* rows_query */ REPLACE INTO "
            f"{r['schema_name']}.{r['table_name']}",
            xid=r["xid"],
        )
        c["__ord"] = float(idx) - 0.5
        extra.append(c)
    head, tail = ev.iloc[0], ev.iloc[len(events) - 1]
    fd = _ctl(head["file"], 1, head["ts"], "FORMAT_DESC", "4|5.7.30-log")
    fd["__ord"] = -0.9
    pg = _ctl(head["file"], 2, head["ts"], "PREV_GTIDS", "")
    pg["__ord"] = -0.8
    ro = _ctl(head["file"], 3, head["ts"], "ROTATE", str(head["file"]))
    ro["__ord"] = -0.7
    extra += [fd, pg, ro]
    for i in range(heartbeat_every, len(ev), heartbeat_every):
        j = snap(i)
        r = ev.iloc[j]
        # pos-2: distinct from a ROWS_QUERY injected at pos-1 of the
        # same frame (adjacent same-(file,pos) rows would pack into one
        # frame and hide the heartbeat's type byte)
        hb = _ctl(
            r["file"], int(r["pos"]) - 2, r["ts"], "HEARTBEAT", str(r["file"])
        )
        hb["__ord"] = float(j) - 0.45
        extra.append(hb)
    if incident_at is not None:
        j = snap(incident_at)
        r = ev.iloc[j]
        inc = _ctl(
            r["file"],
            int(r["pos"]) - 3,
            r["ts"],
            "INCIDENT",
            "1:possibly lost events on master",
        )
        inc["__ord"] = float(j) - 0.42
        extra.append(inc)
    st = _ctl(tail["file"], int(tail["pos"]) + 1, tail["ts"], "STOP", "")
    st["__ord"] = float(len(ev))
    extra.append(st)

    flavored = pd.concat([ev, pd.DataFrame(extra)], ignore_index=True)
    flavored["xid"] = flavored["xid"].astype("Int64")
    for c in ("row_idx", "pos", "server_id"):
        # concat with the control-frame dict rows promotes dtypes;
        # DML bytes must stay identical to the unflavored stream
        flavored[c] = flavored[c].astype(ev[c].dtype)
    flavored = (
        flavored.sort_values("__ord", kind="stable")
        .drop(columns="__ord")
        .reset_index(drop=True)
    )
    return flavored
