"""Generator invariants (FIXTURES.md §2)."""

import numpy as np
import pandas as pd

from mysql_tracker_spark.sources.binlog_gen import (
    GenConfig,
    expected_final_state,
    gen_change_events,
)

CFG = GenConfig(n_events=4000, n_conversations=150, seed=3)


def test_deterministic():
    assert gen_change_events(CFG).equals(gen_change_events(CFG))


def test_total_order_unique():
    ev = gen_change_events(CFG)
    core = ev.drop_duplicates(["file", "pos", "row_idx"])
    # only the appended replay range duplicates frames
    n_dup = len(ev) - len(core)
    assert 0 < n_dup <= int(len(ev) * CFG.dup_frac) + 1
    # log order is sorted in arrival order within the core prefix
    pre = ev.iloc[: len(ev) - n_dup]
    key = list(zip(pre["file"], pre["pos"], pre["row_idx"]))
    assert key == sorted(key)


def test_valid_op_chains():
    ev = gen_change_events(CFG)
    dml = ev[ev["op"].isin(["INSERT", "UPDATE", "DELETE"])]
    dml = dml.drop_duplicates(["file", "pos", "row_idx"])
    k = dml["after"].map(lambda m: (m["conv_id"], m["turn_idx"]))
    first = dml.groupby(k.rename("k"), sort=False)["op"].first()
    assert (first == "INSERT").all()
    # DELETE only terminal
    last_non_delete = dml.groupby(k.rename("k"), sort=False)["op"].apply(
        lambda s: (s == "DELETE").any() and s.iloc[-1] != "DELETE"
    )
    assert not last_non_delete.any()


def test_txn_wrapping_and_ddl():
    ev = gen_change_events(CFG)
    assert (ev["op"] == "BEGIN").sum() == (ev["op"] == "COMMIT").sum() > 0
    ddl = ev[ev["is_ddl"]]
    assert len(ddl) >= 2
    assert ddl["ddl_sql"].str.contains("ADD COLUMN").any()
    assert ddl["ddl_sql"].str.contains("MODIFY COLUMN").any()


def test_oracle_shape():
    ev = gen_change_events(CFG)
    exp = expected_final_state(ev)
    assert exp["conv_id"].notna().all()
    assert (exp.groupby(["conv_id", "turn_idx"]).size() == 1).all()
    # widened scores exceed int32 after second DDL
    assert (exp["score"].dropna().astype("int64") > 2**31).any()


def test_snap_cuts_to_txn_alignment_and_monotonicity():
    """Interior cuts snap FORWARD to the frame after a COMMIT/DDL; cuts
    stay monotone (degenerate snaps collapse to empty batches, never
    overlap) and the ends are pinned. A stream with no txn ends leaves
    the cuts unchanged rather than crashing."""
    import pandas as pd

    from mysql_tracker_spark.sources.binlog_gen import frame_cuts, snap_cuts_to_txn

    rows = [
        {"file": "b.1", "pos": f * 10, "op": "COMMIT" if f in (2, 7) else "INSERT", "is_ddl": False}
        for f in range(10)
    ]
    ev = pd.DataFrame(rows)
    frame_no, cuts = frame_cuts(ev, 4)
    snapped = snap_cuts_to_txn(ev, frame_no, cuts)
    assert list(snapped) == sorted(snapped)
    assert snapped[0] == cuts[0] and snapped[-1] == cuts[-1]
    assert set(snapped[1:-1]) <= {3, 8}  # only just-after-COMMIT frames

    ev2 = ev.assign(op="INSERT")
    fn2, c2 = frame_cuts(ev2, 3)
    s2 = snap_cuts_to_txn(ev2, fn2, c2)
    assert list(s2) == sorted(s2) and list(s2) == list(c2)
