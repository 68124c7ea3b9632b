"""§1.2 value-stringification rules: unit byte-equality against
hand-computed reference renderings, plus the full wire -> decode ->
apply path over the typed metrics table (values survive the round trip
through typed lakestore columns and re-render identically)."""

from decimal import Decimal

import pandas as pd

from mysql_tracker_spark import values as V


# ---------------------------------------------------------------- unit rules

def test_unsigned_rebasing_matches_reference():
    # LogEventConvert.java:449-482 with constants :50-54
    assert V.render_int(-1, 1, True) == "255"
    assert V.render_int(-128, 1, True) == "128"
    assert V.render_int(-1, 2, True) == "65535"
    assert V.render_int(-1, 3, True) == "16777215"
    assert V.render_int(-1, 4, True) == "4294967295"
    assert V.render_int(-2147483648, 4, True) == "2147483648"
    assert V.render_int(-1, 8, True) == "18446744073709551615"
    assert V.render_int(-9223372036854775808, 8, True) == "9223372036854775808"
    # non-negative / signed: plain String.valueOf
    assert V.render_int(42, 1, True) == "42"
    assert V.render_int(-7, 4, False) == "-7"


def test_unsigned_rebasing_series_matches_scalar():
    raw = pd.Series([-1, 0, 5, -128, 127])
    for bl in (1, 2, 3, 4, 8):
        got = V.render_int_series(raw, bl, True).tolist()
        exp = [V.render_int(int(v), bl, True) for v in raw]
        assert got == exp, bl
    big = pd.Series([-1, -9223372036854775808, 9223372036854775807])
    assert V.render_int_series(big, 8, True).tolist() == [
        "18446744073709551615",
        "9223372036854775808",
        "9223372036854775807",
    ]


def test_decimal_to_plain_string():
    # LogEventConvert.java:497-498: scale preserved, never scientific
    assert V.render_decimal(Decimal("1.50")) == "1.50"
    assert V.render_decimal(Decimal("1.2E-5")) == "0.000012"
    assert V.render_decimal(Decimal("-0.0001")) == "-0.0001"
    assert V.render_decimal(Decimal("12345678.9012")) == "12345678.9012"
    assert V.render_decimal("100") == "100"


def test_zero_date_sentinels():
    # RowsLogBuffer.java:395-449 (TIMESTAMP), :668-686 (DATE)
    assert V.render_timestamp(0) == "0000-00-00 00:00:00"
    assert V.render_timestamp(1) == "1970-01-01 00:00:01"
    assert V.render_timestamp(1735689600) == "2025-01-01 00:00:00"
    assert V.render_date(0) == "0000-00-00"
    # packed i32 = year*512 + month*32 + day
    assert V.render_date(2025 * 512 + 6 * 32 + 9) == "2025-06-09"
    assert V.render_date_ymd(0, 0, 0) == "0000-00-00"
    s = V.render_timestamp_series(pd.Series([0, 1, 1735689600]))
    assert s.tolist() == [
        "0000-00-00 00:00:00",
        "1970-01-01 00:00:01",
        "2025-01-01 00:00:00",
    ]


def test_time_rendering():
    # RowsLogBuffer.java:620-655: [-]%02d:%02d:%02d, hours unpadded >2 digits
    assert V.render_time(0) == "00:00:00"
    assert V.render_time(-(838 * 3600 + 59 * 60 + 59)) == "-838:59:59"
    assert V.render_time(838 * 3600 + 59 * 60 + 59) == "838:59:59"
    assert V.render_time(3661) == "01:01:01"
    got = V.render_time_series(pd.Series([0, -3661, 90000]))
    assert list(got) == ["00:00:00", "-01:01:01", "25:00:00"]


def test_year_rendering():
    # RowsLogBuffer.java:687-718
    assert V.render_year(0) == "0000"
    assert V.render_year(1) == "1901"
    assert V.render_year(255) == "2155"
    assert V.render_year_series(pd.Series([0, 1, 125])).tolist() == [
        "0000", "1901", "2025",
    ]


def test_promoted_types():
    from pyspark.sql import types as T

    assert V.promoted_spark_type(1, False) == T.ByteType()
    assert V.promoted_spark_type(1, True) == T.ShortType()
    assert V.promoted_spark_type(4, True) == T.LongType()
    assert V.promoted_spark_type(8, True) == T.DecimalType(20, 0)


# ----------------------------------------------------- full wire->apply path

def _rerender(df: pd.DataFrame) -> pd.DataFrame:
    """Typed readback -> canonical text, column by column."""
    out = pd.DataFrame(index=df.index)
    out["conv_id"] = df["conv_id"]
    out["turn_idx"] = df["turn_idx"].astype("int64").astype(str)
    for c in ("u8", "u16", "u24", "u32"):
        out[c] = df[c].astype("int64").astype(str)
    out["u64"] = df["u64"].map(str)
    out["price"] = df["price"].map(str)
    for c in ("dur", "born", "y", "created"):
        out[c] = df[c]
    out["ratio"] = df["ratio"].map(repr)
    return out


def test_typed_values_survive_wire_apply_roundtrip(spark, tmp_path):
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.schema import METRICS_TYPED_SCHEMA
    from mysql_tracker_spark.sources.binlog_gen import gen_typed_metric_events
    from mysql_tracker_spark.sources.wire import write_wire_batches

    ev = gen_typed_metric_events(n_events=1500, n_keys=200, seed=7)
    in_dir = str(tmp_path / "in")
    write_wire_batches(ev, in_dir, n_batches=3)
    job = CdcApplyJob(
        spark,
        in_dir,
        str(tmp_path / "tbl"),
        table_name="metrics",
        base_schema=METRICS_TYPED_SCHEMA,
        n_buckets=4,
        source_format="wire",
    )
    job.run()
    got = job.table.read(spark).toPandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # sequential pandas oracle over the RENDERED after maps
    dml = ev[ev["op"].isin(["INSERT", "UPDATE", "DELETE"])]
    dml = dml.sort_values(["file", "pos", "row_idx"], kind="stable")
    last = dml.groupby(
        dml["after"].map(lambda m: (m["conv_id"], m["turn_idx"])), sort=False
    ).tail(1)
    live = last[last["op"] != "DELETE"]
    exp = pd.DataFrame(list(live["after"]))
    exp = exp.sort_values(
        ["conv_id", "turn_idx"], key=lambda s: s.astype("int64") if s.name == "turn_idx" else s
    ).reset_index(drop=True)

    re_got = _rerender(got)
    assert len(re_got) == len(exp), (len(re_got), len(exp))
    for c in exp.columns:
        mism = (re_got[c].to_numpy() != exp[c].to_numpy()).nonzero()[0]
        assert len(mism) == 0, (
            c,
            re_got[c].iloc[mism[:3]].tolist(),
            exp[c].iloc[mism[:3]].tolist(),
        )
