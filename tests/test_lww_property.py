"""Property-based LWW invariants (hypothesis): for arbitrary event
sets — random keys, ops, order positions, payloads including separator
bytes, exact replay duplicates, arbitrary arrival order — all three
LWW formulations (max_by struct, salted two-phase, packed argmax)
agree with each other and with a sequential pandas oracle."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from mysql_tracker_spark.operators.dedup import (
    lww_latest,
    lww_latest_packed,
    lww_latest_salted,
)

_PAYLOAD_ALPHABET = list("abz 09\x01\x1d\x1e~")


@st.composite
def event_lists(draw):
    n = draw(st.integers(3, 20))
    events, used = [], set()
    for _ in range(n):
        fp = (
            draw(st.sampled_from(["bin.000001", "bin.000002"])),
            draw(st.integers(4, 500)),
            draw(st.integers(0, 3)),
        )
        if fp in used:
            continue
        used.add(fp)
        events.append(
            fp
            + (
                draw(st.sampled_from(["c1", "c2", "c3"])),
                draw(st.integers(0, 2)),
                draw(st.sampled_from(["INSERT", "UPDATE", "DELETE"])),
                # NULL payloads included: the packed formulation must
                # not let concat-null poison the argmax
                draw(
                    st.one_of(
                        st.none(), st.text(alphabet=_PAYLOAD_ALPHABET, max_size=8)
                    )
                ),
            )
        )
    # exact replay duplicates + arbitrary arrival order
    dups = draw(st.lists(st.sampled_from(events), max_size=4))
    shuffled = draw(st.permutations(events + dups))
    return shuffled


def _oracle(rows):
    pdf = pd.DataFrame(
        rows, columns=["file", "pos", "row_idx", "conv_id", "turn_idx", "op", "after_kv"]
    )
    pdf = pdf.drop_duplicates(["file", "pos", "row_idx"])
    pdf = pdf.sort_values(["file", "pos", "row_idx"], kind="stable")
    last = pdf.groupby(["conv_id", "turn_idx"], sort=False).tail(1)
    return {
        (r.conv_id, r.turn_idx, r.op, r.after_kv) for r in last.itertuples()
    }


@settings(max_examples=12, deadline=None)
@given(event_lists())
def test_lww_formulations_agree_with_sequential_oracle(spark, rows):
    df = spark.createDataFrame(
        rows,
        "file string, pos long, row_idx int, conv_id string, turn_idx int, "
        "op string, after_kv string",
    )
    keys = ["conv_id", "turn_idx"]
    expected = _oracle(rows)
    a = {tuple(r) for r in lww_latest(df, keys, ["op", "after_kv"]).collect()}
    b = {tuple(r) for r in lww_latest_salted(df, keys, ["op", "after_kv"], n_salts=3).collect()}
    c = {tuple(r) for r in lww_latest_packed(df, keys).collect()}
    assert a == expected
    assert b == expected
    assert c == expected
