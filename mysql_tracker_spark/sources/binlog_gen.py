"""Deterministic synthetic binlog generator (FIXTURES.md §2).

Produces the change-event stream a MySQL binlog tail would yield for a
``transcripts`` table — the same logical content the reference tracker
emits as ``CanalEntry.Entry`` rows after decode+convert
(``tracker/parser/LogEventConvert.java:92-379``), but synthesized
directly so tests and benchmarks need no MySQL server:

* zipf-skewed conversation popularity (hot keys exercise skew handling),
* valid per-key op chains INSERT -> UPDATE* -> [DELETE],
* BEGIN/COMMIT transaction delimiters with xids every ~8 events
  (the reference's Xid/QUERY boundary events,
  ``LogEventConvert.java:156-302``),
* file rotation every ``rotate_every`` positions (ROTATE semantics,
  ``mysql/dbsync/LogDecoder.java:225-234``),
* multi-row events (several row_idx under one pos — RowChange with
  multiple RowData, ``EntryProtocol.proto:128-138``),
* two mid-stream DDL events: ADD COLUMN then a type widen
  (schema-evolution path),
* a duplicated offset range appended at the tail (replay overlap that
  last-writer-wins dedup must collapse),
* ~2% noise rows for other tables/schemas (filter-path fodder).

All value stringification follows the reference's text rules
(SURVEY.md §1.2): timestamps ``yyyy-MM-dd HH:mm:ss``, integers as plain
decimal strings, NULL = absent key.

Generation is seeded numpy/pandas; only the map-column assembly is a
Python comprehension (generator-side only — the engine itself never
loops per row).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

BASE_TS = np.datetime64("2025-01-01T00:00:00")
MAGIC_LEN = 4  # binlog file magic, mirrors the 4-byte 0xfe62696e header
# fixed source-server UUID for GTID rendering ("uuid:txn_no"); one
# server per stream, like the reference's single dump connection
SERVER_UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


@dataclass
class GenConfig:
    n_events: int = 50_000
    n_conversations: int = 1_000
    max_turns: int = 20
    zipf_a: float = 1.2
    seed: int = 42
    txn_mean: int = 8
    rotate_every: int = 100_000
    multirow_prob: float = 0.10
    delete_prob: float = 0.30  # applied to last occurrence of a key
    # PRIMARY-KEY-MOVING UPDATEs: fraction of key chains whose final
    # UPDATE relocates the row to a new turn_idx (old + max_turns —
    # collision-free by construction). MySQL RBR row identity is the
    # BEFORE image, so the event carries before = old key, after = new
    # key; a correct applier must tombstone the old key AND upsert the
    # new one. 0.0 (default) keeps every existing stream byte-identical.
    pk_move_prob: float = 0.0
    noise_prob: float = 0.02
    dup_frac: float = 0.01
    ddl_at: tuple = (0.4, 0.7)  # fractions of the stream where DDL lands
    schema_name: str = "chat"
    table_name: str = "transcripts"
    # offset added to generated binlog file numbers — lets a distributed
    # generator give each chunk a disjoint, lexicographically ordered
    # file range (chunk c -> files bin.{c*1000+1...})
    file_base: int = 0


def _conv_probs(cfg: GenConfig) -> np.ndarray:
    ranks = np.arange(1, cfg.n_conversations + 1, dtype=np.float64)
    w = 1.0 / ranks**cfg.zipf_a
    return w / w.sum()


def _fmt_ts(ts: pd.Series) -> pd.Series:
    """Reference timestamp text rule: yyyy-MM-dd HH:mm:ss."""
    return ts.dt.strftime("%Y-%m-%d %H:%M:%S")


def gen_change_events(cfg: GenConfig | None = None) -> pd.DataFrame:
    """Return the full ordered change-event stream as a pandas frame
    with columns matching ``schema.CHANGE_EVENT_SCHEMA``."""
    cfg = cfg or GenConfig()
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events

    # --- DML skeleton --------------------------------------------------------
    conv = rng.choice(cfg.n_conversations, size=n, p=_conv_probs(cfg))
    turn = rng.integers(0, cfg.max_turns, size=n)
    dml = pd.DataFrame({"c": conv, "t": turn.astype(np.int32)})
    grp = dml.groupby(["c", "t"], sort=False)
    k = grp.cumcount()
    n_occ = grp["c"].transform("size")
    is_last = k == (n_occ - 1)
    op = np.where(
        k.to_numpy() == 0,
        "INSERT",
        np.where(
            is_last.to_numpy() & (rng.random(n) < cfg.delete_prob),
            "DELETE",
            "UPDATE",
        ),
    )
    version = (k + 1).to_numpy()
    # PK moves: the final UPDATE of a chain may relocate the row to
    # turn_idx + max_turns (a key no base chain ever occupies, and each
    # (c, t) has exactly one last event — collision-free). prev_turn
    # keeps the before-image key. Guarded so pk_move_prob=0 draws no
    # extra RNG and leaves historical streams byte-identical.
    prev_turn = turn.copy()
    if cfg.pk_move_prob > 0:
        mv = (
            (op == "UPDATE")
            & is_last.to_numpy()
            & (rng.random(n) < cfg.pk_move_prob)
        )
        turn = np.where(mv, turn + cfg.max_turns, turn).astype(turn.dtype)
    # conv ids via a cached map table (one python-format per conversation,
    # not per event)
    conv_tbl = pd.Series([f"conv_{i:06d}" for i in range(cfg.n_conversations)])
    conv_id = conv_tbl.take(conv).reset_index(drop=True)
    turn_s = pd.Series(turn).astype(str)
    ver_s = pd.Series(version).astype(str)
    text = conv_id.str.cat(turn_s, sep=":").str.cat("v" + ver_s, sep=":")
    roles = np.where(turn % 2 == 0, "user", "assistant")
    roles = np.where((turn % 7 == 3), "tool", roles)
    tool = np.where(roles == "tool", "search", "")

    # --- transactions --------------------------------------------------------
    txn_sizes = rng.geometric(1.0 / cfg.txn_mean, size=n // 2 + 2).clip(1, 64)
    bounds = np.cumsum(txn_sizes)
    bounds = bounds[bounds < n]
    txn_of = np.searchsorted(np.concatenate([bounds, [n]]), np.arange(n), side="right")
    xid = txn_of.astype(np.int64) + 1

    # --- multi-row event grouping -------------------------------------------
    # consecutive events in the same txn may share one event frame (same pos)
    new_group = np.ones(n, dtype=bool)
    same_txn = np.zeros(n, dtype=bool)
    same_txn[1:] = txn_of[1:] == txn_of[:-1]
    merge_mask = same_txn & (rng.random(n) < cfg.multirow_prob)
    new_group = ~merge_mask
    group_id = np.cumsum(new_group) - 1
    row_idx = np.arange(n) - np.maximum.accumulate(np.where(new_group, np.arange(n), 0))

    # --- noise rows for filter tests -----------------------------------------
    noise = rng.random(n) < cfg.noise_prob
    schema_name = np.where(noise & (rng.random(n) < 0.5), "otherdb", cfg.schema_name)
    table_name = np.where(noise, np.where(schema_name == "otherdb", cfg.table_name, "noise_tbl"), cfg.table_name)

    dml = pd.DataFrame(
        {
            "seq": np.arange(n, dtype=np.int64),
            "sub": np.zeros(n, dtype=np.int8),
            "op": op,
            "xid": xid,
            "group_id": group_id,
            "row_idx": row_idx.astype(np.int32),
            "conv_id": conv_id.to_numpy(),
            "turn_idx": turn.astype(np.int32),
            "prev_turn_idx": prev_turn.astype(np.int32),
            "version": version,
            "text": text.to_numpy(),
            "role": roles,
            "tool": tool,
            "schema_name": schema_name,
            "table_name": table_name,
            "is_ddl": False,
            "ddl_sql": None,
        }
    )

    # --- BEGIN / COMMIT delimiters -------------------------------------------
    txn_first = dml.groupby("xid", sort=False)["seq"].min()
    txn_last = dml.groupby("xid", sort=False)["seq"].max()
    begin = pd.DataFrame(
        {"seq": txn_first.to_numpy(), "sub": np.int8(-1), "op": "BEGIN", "xid": txn_first.index.to_numpy()}
    )
    commit = pd.DataFrame(
        {"seq": txn_last.to_numpy(), "sub": np.int8(1), "op": "COMMIT", "xid": txn_last.index.to_numpy()}
    )

    # --- DDL events -----------------------------------------------------------
    ddl_seq1 = int(n * cfg.ddl_at[0])
    ddl_seq2 = int(n * cfg.ddl_at[1])
    ddl = pd.DataFrame(
        {
            "seq": [ddl_seq1, ddl_seq2],
            "sub": np.int8(-2),
            "op": "ALTER",
            "xid": [None, None],
            "is_ddl": True,
            "ddl_sql": [
                f"ALTER TABLE {cfg.schema_name}.{cfg.table_name} ADD COLUMN score INT",
                f"ALTER TABLE {cfg.schema_name}.{cfg.table_name} MODIFY COLUMN score BIGINT",
            ],
            "schema_name": cfg.schema_name,
            "table_name": cfg.table_name,
        }
    )

    # score column appears after DDL1; values exceed int32 after DDL2 (widen)
    has_score = dml["seq"] > ddl_seq1
    wide_score = dml["seq"] > ddl_seq2
    score = np.where(
        wide_score,
        3_000_000_000 + dml["version"].to_numpy() * 1000 + dml["turn_idx"].to_numpy(),
        dml["version"].to_numpy() * 1000 + dml["turn_idx"].to_numpy(),
    )
    dml["score"] = np.where(has_score, score.astype("int64"), -1)

    ev = pd.concat([dml, begin, commit, ddl], ignore_index=True)
    ev = ev.sort_values(["seq", "sub"], kind="stable").reset_index(drop=True)
    ev["group_id"] = ev["group_id"].astype("float64")
    ev["is_ddl"] = ev["is_ddl"].eq(True)
    ev["row_idx"] = ev["row_idx"].fillna(0).astype(np.int32)

    # --- positions -------------------------------------------------------------
    # one frame per event group (BEGIN/COMMIT/DDL are their own frames);
    # frame boundary = first row of a group
    is_dml = ev["op"].isin(["INSERT", "UPDATE", "DELETE"]).to_numpy()
    gid = ev["group_id"].to_numpy()
    prev_gid = np.roll(gid, 1)
    prev_gid[0] = np.nan
    frame_start = (~is_dml) | (gid != prev_gid) | np.isnan(gid)
    frame_no = np.cumsum(frame_start) - 1

    text_len = ev["text"].fillna("").str.len().to_numpy()
    ddl_len = ev["ddl_sql"].fillna("").str.len().to_numpy()
    row_size = np.where(is_dml, 60 + 2 * text_len, np.where(ev["is_ddl"], 60 + ddl_len, 31))
    frame_size = pd.Series(row_size).groupby(frame_no).transform("sum").to_numpy()
    # size attributed once per frame for offset math
    first_of_frame_size = np.where(frame_start, frame_size, 0)
    frame_end_global = MAGIC_LEN + np.cumsum(first_of_frame_size)
    frame_start_global = frame_end_global - np.where(frame_start, frame_size, 0)
    # propagate the frame's start offset to every row of the frame
    start_per_frame = pd.Series(np.where(frame_start, frame_start_global, np.nan)).ffill().to_numpy()

    file_no = (start_per_frame // cfg.rotate_every).astype(np.int64) + 1 + cfg.file_base
    pos_in_file = (start_per_frame % cfg.rotate_every).astype(np.int64) + MAGIC_LEN
    files = pd.Series(file_no).map(lambda i: f"bin.{i:06d}")

    ev["file"] = files.to_numpy()
    ev["pos"] = pos_in_file
    ev["server_id"] = np.int64(1)
    ev["event_len"] = row_size.astype(np.int64)

    # --- timestamps -------------------------------------------------------------
    # all rows of one frame share the frame's header timestamp (real
    # binlog semantics: executeTime lives in the event header)
    secs = np.cumsum(rng.exponential(0.5, size=len(ev))).astype("int64")
    secs = pd.Series(np.where(frame_start, secs, np.nan)).ffill().to_numpy().astype("int64")
    ev["ts"] = pd.Series(BASE_TS + secs.astype("timedelta64[s]")).dt.floor("s")

    # --- before / after maps ------------------------------------------------------
    ts_text = _fmt_ts(ev["ts"])
    ev["_ts_text"] = ts_text

    before, after = _build_maps(ev)
    ev["before"] = before
    ev["after"] = after

    # GTID = server_uuid : txn number (DDL has no xid -> no gtid,
    # matching the reference discarding GTID payloads)
    ev["gtid"] = np.where(
        ev["xid"].notna(), SERVER_UUID + ":" + ev["xid"].astype("Int64").astype(str), None
    )
    out = ev[
        [
            "file", "pos", "row_idx", "server_id", "ts", "xid", "gtid", "op",
            "schema_name", "table_name", "is_ddl", "ddl_sql", "before", "after",
            "event_len",
        ]
    ].copy()
    out["xid"] = out["xid"].astype("Int64")
    out["pos"] = out["pos"].astype("int64")

    # --- duplicated replay range appended at the tail -----------------------------
    if cfg.dup_frac > 0 and len(out) > 200:
        dup_n = max(1, int(len(out) * cfg.dup_frac))
        start = int(rng.integers(0, len(out) - dup_n))
        dup = out.iloc[start : start + dup_n].copy()
        out = pd.concat([out, dup], ignore_index=True)

    return out


def _build_maps(ev: pd.DataFrame):
    """Assemble before/after map columns (dicts; generator-side only).

    Reference flatten rules (``HandlerNoParserMagpieHBase.java:735-793``):
    DELETE -> source = all before cols, current = PK only;
    INSERT -> current = after cols;
    UPDATE -> both (the reference forgets to attach them — a known
    reference bug; we implement the correct semantics, SURVEY.md §2.2 D8).
    """
    ops = ev["op"].to_numpy()
    conv = ev["conv_id"].to_numpy()
    turn = ev["turn_idx"].to_numpy()
    # before-image key: differs from turn_idx only for PK-moving
    # UPDATEs (pk_move_prob > 0); absent column = no moves
    pturn = ev.get("prev_turn_idx")
    pturn = pturn.to_numpy() if pturn is not None else turn
    ver = ev.get("version")
    ver = ver.to_numpy() if ver is not None else np.zeros(len(ev))
    text = ev["text"].to_numpy()
    role = ev["role"].to_numpy()
    tool = ev["tool"].to_numpy()
    score = ev["score"].to_numpy() if "score" in ev else np.full(len(ev), -1)
    ts_text = ev["_ts_text"].to_numpy()

    before: list = [None] * len(ev)
    after: list = [None] * len(ev)
    for i in range(len(ev)):
        o = ops[i]
        if o not in ("INSERT", "UPDATE", "DELETE"):
            continue
        row = {
            "conv_id": conv[i],
            "turn_idx": str(int(turn[i])),
            "role": role[i],
            "text": text[i],
            "tool": tool[i],
            "ts": ts_text[i],
        }
        if score[i] >= 0:
            row["score"] = str(int(score[i]))
        pk = {"conv_id": conv[i], "turn_idx": str(int(turn[i]))}
        if o == "INSERT":
            after[i] = row
        elif o == "UPDATE":
            prev = dict(row)
            prev["turn_idx"] = str(int(pturn[i]))
            prev["text"] = f"{conv[i]}:{int(pturn[i])}:v{int(ver[i]) - 1}"
            before[i] = prev
            after[i] = row
        else:  # DELETE
            prev = dict(row)
            prev["text"] = f"{conv[i]}:{turn[i]}:v{int(ver[i]) - 1}" if ver[i] > 1 else row["text"]
            before[i] = prev
            after[i] = pk
    return before, after


# ---------------------------------------------------------------------------
# typed-metrics stream: exercises the §1.2 stringification surface
# (values.py) through the full wire -> decode -> apply path
# ---------------------------------------------------------------------------

def gen_typed_metric_events(
    n_events: int = 2000,
    n_keys: int = 300,
    seed: int = 7,
    schema_name: str = "chat",
    table_name: str = "metrics",
) -> pd.DataFrame:
    """Change events for the ``METRICS_TYPED_SCHEMA`` table whose values
    are rendered with the frozen reference rules (values.py): raw signed
    integer decodes (negatives re-base for unsigned columns), DECIMAL
    with preserved scale, TIME/DATE/YEAR/TIMESTAMP text including the
    zero sentinels. Stream shape mirrors :func:`gen_change_events`
    (INSERT -> UPDATE* chains, BEGIN/COMMIT delimiters, offset-ordered
    frames) at reduced complexity — no DDL, no multi-row frames."""
    from ..values import (
        render_date_series,
        render_decimal_series,
        render_int_series,
        render_time_series,
        render_timestamp_series,
        render_year_series,
    )
    from decimal import Decimal

    rng = np.random.default_rng(seed)
    n = n_events
    key = rng.integers(0, n_keys, size=n)
    conv = key // 10
    turn = (key % 10).astype(np.int32)
    d = pd.DataFrame({"c": conv, "t": turn})
    k = d.groupby(["c", "t"], sort=False).cumcount()
    op = np.where(k.to_numpy() == 0, "INSERT", "UPDATE")
    last = d.groupby(["c", "t"], sort=False)["c"].transform("size").to_numpy() - 1
    is_del = (k.to_numpy() == last) & (rng.random(n) < 0.15) & (k.to_numpy() > 0)
    op = np.where(is_del, "DELETE", op)

    # raw signed decodes — negatives exercise the unsigned re-basing
    u8 = pd.Series(rng.integers(-(1 << 7), 1 << 7, size=n))
    u16 = pd.Series(rng.integers(-(1 << 15), 1 << 15, size=n))
    u24 = pd.Series(rng.integers(-(1 << 23), 1 << 23, size=n))
    u32 = pd.Series(rng.integers(-(1 << 31), 1 << 31, size=n))
    u64 = pd.Series(rng.integers(-(1 << 62), (1 << 62), size=n))
    price_raw = pd.Series(rng.integers(-(10**8), 10**8, size=n))
    price = price_raw.map(lambda v: Decimal(int(v)).scaleb(-4))
    dur = pd.Series(rng.integers(-838 * 3600, 838 * 3600 + 3599, size=n))
    year_col = pd.Series(np.where(rng.random(n) < 0.1, 0, rng.integers(1970, 2031, size=n)))
    month = pd.Series(np.where(year_col == 0, 0, rng.integers(1, 13, size=n)))
    day = pd.Series(np.where(year_col == 0, 0, rng.integers(1, 29, size=n)))
    y_raw = pd.Series(np.where(rng.random(n) < 0.1, 0, rng.integers(1, 256, size=n)))
    created = pd.Series(
        np.where(rng.random(n) < 0.1, 0, rng.integers(1, 2_000_000_000, size=n))
    )
    ratio = pd.Series(rng.random(n)).map(lambda v: repr(float(v)))

    rendered = pd.DataFrame(
        {
            "conv_id": pd.Series([f"conv_{i:05d}" for i in range(n_keys // 10 + 1)]).take(conv).to_numpy(),
            "turn_idx": pd.Series(turn).astype(str).to_numpy(),
            "u8": render_int_series(u8, 1, True),
            "u16": render_int_series(u16, 2, True),
            "u24": render_int_series(u24, 3, True),
            "u32": render_int_series(u32, 4, True),
            "u64": render_int_series(u64, 8, True),
            "price": render_decimal_series(price),
            "dur": render_time_series(dur),
            "born": render_date_series(year_col, month, day),
            "y": render_year_series(y_raw),
            "created": render_timestamp_series(created),
            "ratio": ratio,
        }
    )

    # transactions + offsets (one frame per event)
    txn_sizes = rng.geometric(1.0 / 8, size=n // 2 + 2).clip(1, 64)
    bounds = np.cumsum(txn_sizes)
    bounds = bounds[bounds < n]
    txn_of = np.searchsorted(np.concatenate([bounds, [n]]), np.arange(n), side="right")

    recs = rendered.to_dict("records")
    after = []
    before = []
    for i, r in enumerate(recs):
        pk = {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"]}
        if op[i] == "DELETE":
            before.append(dict(r))
            after.append(pk)
        elif op[i] == "UPDATE":
            before.append(dict(r))
            after.append(dict(r))
        else:
            before.append(None)
            after.append(dict(r))

    ev = pd.DataFrame(
        {
            "seq": np.arange(n, dtype=np.int64),
            "sub": np.zeros(n, dtype=np.int8),
            "op": op,
            "xid": txn_of.astype(np.int64) + 1,
            "row_idx": np.zeros(n, dtype=np.int32),
            "schema_name": schema_name,
            "table_name": table_name,
            "is_ddl": False,
            "ddl_sql": None,
            "before": before,
            "after": after,
        }
    )
    txn_first = ev.groupby("xid", sort=False)["seq"].min()
    txn_last = ev.groupby("xid", sort=False)["seq"].max()
    begin = pd.DataFrame(
        {"seq": txn_first.to_numpy(), "sub": np.int8(-1), "op": "BEGIN", "xid": txn_first.index.to_numpy()}
    )
    commit = pd.DataFrame(
        {"seq": txn_last.to_numpy(), "sub": np.int8(1), "op": "COMMIT", "xid": txn_last.index.to_numpy()}
    )
    out = pd.concat([ev, begin, commit], ignore_index=True)
    out = out.sort_values(["seq", "sub"], kind="stable").reset_index(drop=True)
    m = len(out)
    out["row_idx"] = out["row_idx"].fillna(0).astype(np.int32)
    # concat turns absent map cells into NaN floats; maps must be dict|None
    for c in ("before", "after"):
        out[c] = out[c].astype(object).where(out[c].notna(), None)
    out["is_ddl"] = out["is_ddl"].eq(True)
    out["file"] = "bin.000001"
    out["pos"] = MAGIC_LEN + 64 * np.arange(m, dtype=np.int64)
    out["server_id"] = np.int64(1)
    secs = np.cumsum(rng.exponential(0.5, size=m)).astype("int64")
    out["ts"] = pd.Series(BASE_TS + secs.astype("timedelta64[s]")).dt.floor("s")
    out["xid"] = out["xid"].astype("Int64")
    out["gtid"] = np.where(
        out["xid"].notna(), SERVER_UUID + ":" + out["xid"].astype(str), None
    )
    return out[
        [
            "file", "pos", "row_idx", "server_id", "ts", "xid", "gtid", "op",
            "schema_name", "table_name", "is_ddl", "ddl_sql", "before", "after",
        ]
    ].copy()


# ---------------------------------------------------------------------------
# sequential oracle (the reference's replay-and-inspect pattern,
# src/test/java/MysqlParserTest.java:13-29, made rigorous)
# ---------------------------------------------------------------------------

def expected_final_state(
    events: pd.DataFrame,
    schema_name: str = "chat",
    table_name: str = "transcripts",
) -> pd.DataFrame:
    """Sequential LWW oracle: final transcripts state after applying the
    whole stream in ``(file, pos, row_idx)`` order with duplicates
    collapsed. Returns rows sorted by (conv_id, turn_idx)."""
    e = events[
        events["op"].isin(["INSERT", "UPDATE", "DELETE"])
        & (events["schema_name"] == schema_name)
        & (events["table_name"] == table_name)
    ].copy()
    e = e.drop_duplicates(subset=["file", "pos", "row_idx"], keep="first")
    # PK-moving UPDATE (before-image key != after key) applies as
    # DELETE(old key) + upsert(new key) at the same log position — the
    # tombstone sorts immediately before its move (_mv = 0 < 1)
    e["_mv"] = 1
    bk = e["before"].map(
        lambda m: (m.get("conv_id"), int(m.get("turn_idx"))) if m else None
    )
    ak = e["after"].map(lambda m: (m.get("conv_id"), int(m.get("turn_idx"))))
    moved = e[(e["op"] == "UPDATE") & bk.notna() & (bk != ak)]
    if len(moved):
        tomb = moved.copy()
        tomb["op"] = "DELETE"
        tomb["after"] = tomb["before"].map(
            lambda m: {"conv_id": m["conv_id"], "turn_idx": m["turn_idx"]}
        )
        tomb["_mv"] = 0
        e = pd.concat([e, tomb], ignore_index=True)
    e = e.sort_values(["file", "pos", "row_idx", "_mv"], kind="stable")
    key = e["after"].map(lambda m: (m.get("conv_id"), int(m.get("turn_idx"))))
    e["_k"] = key
    last = e.groupby("_k", sort=False).tail(1)
    live = last[last["op"] != "DELETE"]
    rows = []
    for m in live["after"]:
        rows.append(
            {
                "conv_id": m["conv_id"],
                "turn_idx": int(m["turn_idx"]),
                "role": m.get("role"),
                "text": m.get("text"),
                "tool": m.get("tool"),
                "ts": m.get("ts"),
                "score": int(m["score"]) if "score" in m else None,
            }
        )
    out = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "score"])
    out["score"] = out["score"].astype("Int64")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# parquet batch writer (micro-batch input layout)
# ---------------------------------------------------------------------------

def frame_cuts(events: pd.DataFrame, n_batches: int):
    """THE frame-boundary split rule (shared): rows sharing (file,pos)
    form one frame; frames are cut into ``n_batches`` contiguous
    groups. Returns ``(frame_no, cuts)``. write_batches,
    write_jsonl_batches AND the changelog contract oracle's replicated
    batch-1 watermark all derive from this one function — the oracle's
    correctness depends on the split rule having exactly one home."""
    fp = events["file"].astype(str) + ":" + events["pos"].astype(str)
    new_frame = (fp != fp.shift(1)).to_numpy()
    frame_no = np.cumsum(new_frame) - 1
    cuts = np.linspace(0, frame_no[-1] + 1, n_batches + 1).astype(int)
    return frame_no, cuts


def write_jsonl_batches(events: pd.DataFrame, out_dir: str, n_batches: int = 8) -> list[str]:
    """Write the stream as offset-contiguous JSON-LINES micro-batches
    (``batch_00000.jsonl``…) — the reference's flattened Avro/JSON
    record shape as an ingest format (``EventEntry.avro``; its Kafka
    consumers see exactly this). Same frame-boundary split rule as
    :func:`write_batches`; timestamps as ISO-8601 seconds (Spark's
    schema-first JSON reader parses them into TimestampType), NaN/None
    fields omitted (decode as null)."""
    import json as _json
    import math

    os.makedirs(out_dir, exist_ok=True)
    ev = events.drop(columns=["event_len"], errors="ignore")
    frame_no, cuts = frame_cuts(ev, n_batches)
    paths = []
    for b in range(n_batches):
        sel = (frame_no >= cuts[b]) & (frame_no < cuts[b + 1])
        chunk = ev[sel]
        if chunk.empty:
            continue
        path = os.path.join(out_dir, f"batch_{b:05d}.jsonl")
        with open(path, "w") as f:
            for rec in chunk.to_dict("records"):
                rec["ts"] = rec["ts"].strftime("%Y-%m-%dT%H:%M:%S")
                out = {
                    k: (int(v) if k == "xid" else v)
                    for k, v in rec.items()
                    if v is not None
                    and not (isinstance(v, float) and math.isnan(v))
                    and v is not pd.NA
                }
                f.write(_json.dumps(out, ensure_ascii=False) + "\n")
        paths.append(path)
    return paths


def snap_cuts_to_txn(events: pd.DataFrame, frame_no, cuts):
    """Snap interior frame cuts FORWARD to the next transaction
    boundary (a frame whose op is COMMIT, or a DDL — the reference's
    isEndEvent rule, ``MysqlTracker.java:339-346``), so every batch
    ends exactly at a txn end — the standalone tracker's Xid-gated
    flush (C4). Falls back to the nearest preceding boundary when none
    follows; duplicate cuts collapse to empty batches (skipped by the
    writers)."""
    is_end = (events["op"].astype(str) == "COMMIT") | events["is_ddl"].astype(bool)
    # frame f is a valid cut-BEFORE point when frame f-1 ends a txn
    end_frames = np.unique(frame_no[is_end.to_numpy()])
    candidates = end_frames + 1
    out = [cuts[0]]
    for c in cuts[1:-1]:
        fwd = candidates[candidates >= c]
        bwd = candidates[candidates < c]
        snapped = int(fwd[0]) if len(fwd) else (int(bwd[-1]) if len(bwd) else int(c))
        # monotone non-decreasing, never past the end: a degenerate snap
        # collapses to an empty batch rather than overlapping a prior one
        out.append(min(max(snapped, out[-1]), int(cuts[-1])))
    out.append(cuts[-1])
    return np.array(out)


def write_batches(
    events: pd.DataFrame,
    out_dir: str,
    n_batches: int = 8,
    txn_aligned: bool = False,
) -> list[str]:
    """Write the stream as offset-contiguous parquet micro-batches
    ``batch_00000.parquet``… — the engine's replay input. Splits never
    tear an event frame (rows sharing (file,pos) stay together);
    ``txn_aligned`` additionally snaps every INTERIOR split to a
    transaction boundary (:func:`snap_cuts_to_txn`), so every batch but
    the last ends exactly at its txn end — the fixture shape for
    Xid-gated (C4) fences. The final batch ends wherever the stream
    ends (a generated stream may end mid-transaction), so its fence is
    txn-aligned only if the stream's last frame is a COMMIT/DDL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    ev = events.drop(columns=["event_len"], errors="ignore")
    frame_no, cuts = frame_cuts(ev, n_batches)
    if txn_aligned:
        cuts = snap_cuts_to_txn(ev, frame_no, cuts)
    paths = []
    map_ty = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            ("file", pa.string()),
            ("pos", pa.int64()),
            ("row_idx", pa.int32()),
            ("server_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("xid", pa.int64()),
            ("gtid", pa.string()),
            ("op", pa.string()),
            ("schema_name", pa.string()),
            ("table_name", pa.string()),
            ("is_ddl", pa.bool_()),
            ("ddl_sql", pa.string()),
            ("before", map_ty),
            ("after", map_ty),
        ]
    )
    for b in range(n_batches):
        sel = (frame_no >= cuts[b]) & (frame_no < cuts[b + 1])
        chunk = ev[sel]
        if chunk.empty:
            continue
        tbl = pa.Table.from_pandas(chunk.reset_index(drop=True), schema=schema, preserve_index=False)
        path = os.path.join(out_dir, f"batch_{b:05d}.parquet")
        pq.write_table(tbl, path, row_group_size=16384)
        paths.append(path)
    return paths
