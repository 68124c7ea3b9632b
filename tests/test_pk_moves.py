"""Primary-key-moving UPDATEs (MySQL RBR row identity = before image).

An UPDATE whose before-image key differs from its after key RELOCATES
the row: a correct applier must tombstone the old key and upsert the
new one, or the old row survives as a ghost. The reference forwards
both images per row (``LogEventConvert.java`` before/after columns);
these tests pin the apply semantics on both the typed and the wire
path against TWO independent oracles (the vectorized
``expected_final_state`` and a plain sequential dict replay).
"""

import pandas as pd
import pytest

from mysql_tracker_spark.runner import CdcApplyJob
from mysql_tracker_spark.sources.binlog_gen import (
    GenConfig,
    expected_final_state,
    gen_change_events,
    write_batches,
)

from .conftest import normalize

CFG = GenConfig(n_events=3000, n_conversations=120, seed=13, pk_move_prob=0.5)
CMP = ["conv_id", "turn_idx", "role", "text", "tool", "score"]


def _dict_replay(ev) -> pd.DataFrame:
    """Independent sequential oracle: apply events one at a time with
    explicit move semantics (delete before-key, upsert after-key)."""
    e = ev[
        ev["op"].isin(["INSERT", "UPDATE", "DELETE"])
        & (ev["schema_name"] == "chat")
        & (ev["table_name"] == "transcripts")
    ]
    e = e.drop_duplicates(subset=["file", "pos", "row_idx"], keep="first")
    e = e.sort_values(["file", "pos", "row_idx"], kind="stable")
    state: dict = {}
    for op, before, after in zip(e["op"], e["before"], e["after"]):
        ak = (after["conv_id"], int(after["turn_idx"]))
        if op == "DELETE":
            state.pop(ak, None)
            continue
        if op == "UPDATE" and before:
            bk = (before["conv_id"], int(before["turn_idx"]))
            if bk != ak:
                state.pop(bk, None)
        state[ak] = after
    rows = [
        {
            "conv_id": k[0],
            "turn_idx": k[1],
            "role": m.get("role"),
            "text": m.get("text"),
            "tool": m.get("tool"),
            "ts": m.get("ts"),
            "score": int(m["score"]) if "score" in m else None,
        }
        for k, m in state.items()
    ]
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "score"]
    )
    out["score"] = out["score"].astype("Int64")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def move_events():
    ev = gen_change_events(CFG)
    dml = ev[ev["op"] == "UPDATE"]
    n_moves = sum(
        1
        for b, a in zip(dml["before"], dml["after"])
        if b and (b["conv_id"], b["turn_idx"]) != (a["conv_id"], a["turn_idx"])
    )
    assert n_moves > 20, "fixture must actually contain PK moves"
    return ev


def test_oracles_agree_on_moves(move_events):
    a = expected_final_state(move_events)
    b = _dict_replay(move_events)
    pd.testing.assert_frame_equal(a, b)


def test_pk_move_typed_apply_no_ghost_rows(spark, move_events, tmp_path):
    write_batches(move_events, str(tmp_path / "in"), n_batches=4)
    job = CdcApplyJob(spark, str(tmp_path / "in"), str(tmp_path / "t"), n_buckets=8)
    job.run()
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(move_events))
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])
    # ghost check, independent of the oracle frames: a moved-away key
    # with no later event must be absent from the table
    final_keys = set(zip(got["conv_id"], got["turn_idx"]))
    exp_keys = set(zip(exp["conv_id"], exp["turn_idx"]))
    assert final_keys == exp_keys


def test_pk_move_wire_apply_no_ghost_rows(spark, move_events, tmp_path):
    from mysql_tracker_spark.sources.wire import write_wire_batches

    write_wire_batches(move_events, str(tmp_path / "in"), n_batches=4)
    job = CdcApplyJob(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "t"),
        n_buckets=8,
        source_format="wire",
    )
    job.run()
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(move_events))
    pd.testing.assert_frame_equal(got[CMP], exp[CMP])


def test_pk_move_prob_zero_streams_unchanged():
    """pk_move_prob=0 (the default) must leave historical streams
    untouched: no RNG drift, before key == after key everywhere."""
    ev = gen_change_events(GenConfig(n_events=2000, n_conversations=80, seed=5))
    upd = ev[ev["op"] == "UPDATE"]
    assert all(
        (b["conv_id"], b["turn_idx"]) == (a["conv_id"], a["turn_idx"])
        for b, a in zip(upd["before"], upd["after"])
        if b
    )
