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
