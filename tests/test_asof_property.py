"""Property tests (hypothesis): as-of join and SCD2 vs brute-force
Python oracles on random corpora — random keys, colliding timestamps,
strict/inclusive bounds, tolerance, deletes-last, reinserts."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from mysql_tracker_spark.operators.asof import asof_join, asof_join_binned
from mysql_tracker_spark.operators.scd import scd2_history

T0 = dt.datetime(2026, 1, 1)


def _ts(offset_s: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=offset_s)


rows_strategy = st.tuples(
    st.lists(  # left: (key, ts_offset)
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=1, max_size=12,
    ),
    st.lists(  # right: (key, ts_offset)
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=0, max_size=12,
    ),
    st.booleans(),  # inclusive
    st.sampled_from([None, 10.0]),  # tolerance_s
)


def _oracle_asof(lrows, rrows, inclusive, tol):
    out = {}
    for lid, (lk, lt) in enumerate(lrows):
        best = None
        for rid, (rk, rt) in enumerate(rrows):
            if rk != lk:
                continue
            ok = (rt <= lt) if inclusive else (rt < lt)
            if ok and (tol is None or lt - rt <= tol):
                cand = (rt, rid)
                if best is None or cand > best:
                    best = cand
        out[lid] = best[1] if best is not None else None
    return out


@settings(max_examples=12, deadline=None)
@given(rows_strategy)
def test_asof_both_paths_match_python_oracle(spark, case):
    lrows, rrows, inclusive, tol = case
    left = spark.createDataFrame(
        [(k, i, _ts(t)) for i, (k, t) in enumerate(lrows)],
        "key string, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, i, _ts(t)) for i, (k, t) in enumerate(rrows)],
        "key string, rid int, ts timestamp",
    ) if rrows else spark.createDataFrame([], "key string, rid int, ts timestamp")
    expect = _oracle_asof(lrows, rrows, inclusive, tol)

    w = asof_join(
        left, right, ["key"], "ts", "ts", {"mrid": "rid"},
        tie_cols=("rid",), inclusive=inclusive, tolerance_s=tol,
    )
    got_w = {r.lid: r.mrid for r in w.collect()}
    assert got_w == expect
    if tol is not None:
        b = asof_join_binned(
            left, right, ["key"], "ts", "ts", {"mrid": "rid"},
            left_id=["lid"], tolerance_s=tol, tie_cols=("rid",),
            inclusive=inclusive,
        )
        assert {r.lid: r.mrid for r in b.collect()} == expect


changes_strategy = st.lists(
    st.tuples(
        st.sampled_from("ab"),          # key
        st.integers(0, 30),             # ts offset
        st.sampled_from(["U", "U", "D"]),  # op (deletes rarer)
    ),
    min_size=1, max_size=14,
)


def _oracle_scd2(rows):
    """Brute fold in seq order -> {(key, version): (from, to, current)}."""
    by_key: dict = {}
    for seq, (k, t, op) in enumerate(rows):
        by_key.setdefault(k, []).append((seq, t, op))
    out = {}
    for k, chs in by_key.items():
        for i, (seq, t, op) in enumerate(chs):
            if op == "D":
                continue
            nxt = chs[i + 1][1] if i + 1 < len(chs) else None
            out[(k, i + 1)] = (t, nxt, nxt is None)
    return out


@settings(max_examples=12, deadline=None)
@given(changes_strategy)
def test_scd2_matches_python_oracle(spark, rows):
    df = spark.createDataFrame(
        [(k, i, _ts(t), op) for i, (k, t, op) in enumerate(rows)],
        "k string, seq int, ts timestamp, op string",
    )
    hist = scd2_history(df, ["k"], ["seq"], ts_col="ts", op_col="op")
    got = {
        (r.k, r.version): (
            (r.valid_from - T0).total_seconds(),
            (r.valid_to - T0).total_seconds() if r.valid_to else None,
            r.is_current,
        )
        for r in hist.collect()
    }
    assert got == {
        k: (float(f), float(t) if t is not None else None, c)
        for k, (f, t, c) in _oracle_scd2(rows).items()
    }
