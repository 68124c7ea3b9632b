"""MariaDB event surface: type classification, body byte-decoders
(fixture vectors), the GTID_LIST replication-state fence, and e2e
convergence of a MariaDB-flavored wire stream through the full apply
(reference enumeration: mysql/dbsync/LogEvent.java:189-214)."""

import struct

import pandas as pd
import pytest

from mysql_tracker_spark.sources.mariadb_events import (
    ANNOTATE_ROWS_EVENT,
    BINLOG_CHECKPOINT_EVENT,
    GTID_EVENT,
    GTID_LIST_EVENT,
    after_mariadb_gtid_list,
    classify_event_type,
    decode_annotate_body,
    decode_binlog_checkpoint_body,
    decode_gtid_body,
    decode_gtid_list_body,
    gtid_list_fence,
    mariadb_flavor,
)


def test_classify_event_type():
    assert classify_event_type(2) == "mysql"
    assert classify_event_type(16) == "mysql"
    assert classify_event_type(30) == "mysql"
    assert classify_event_type(35) == "mysql"
    for t in (160, 161, 162, 163):
        assert classify_event_type(t) == "mariadb"
    for t in (36, 100, 159, 164, 255):
        assert classify_event_type(t) == "unknown"
    assert ANNOTATE_ROWS_EVENT == 160
    assert BINLOG_CHECKPOINT_EVENT == 161
    assert GTID_EVENT == 162
    assert GTID_LIST_EVENT == 163


def test_gtid_body_vector():
    # hand-packed: seqno=0x1122334455667788 u64le, domain=7 u32le,
    # flags2=FL_STANDALONE
    body = struct.pack("<QIB", 0x1122334455667788, 7, 1) + b"\x00" * 8
    g = decode_gtid_body(body, server_id=3)
    assert g["domain_id"] == 7
    assert g["server_id"] == 3
    assert g["seqno"] == 0x1122334455667788
    assert g["standalone"] is True
    assert g["gtid"] == f"7-3-{0x1122334455667788}"
    with pytest.raises(ValueError):
        decode_gtid_body(b"\x00" * 5, 1)


def test_gtid_list_body_vector():
    # 2 entries; count field carries flags in the top 4 bits
    body = struct.pack("<I", 2 | (0x1 << 28))
    body += struct.pack("<IIQ", 0, 1, 100)
    body += struct.pack("<IIQ", 5, 2, 7)
    got = decode_gtid_list_body(body)
    assert [g["gtid"] for g in got] == ["0-1-100", "5-2-7"]
    with pytest.raises(ValueError):
        decode_gtid_list_body(body[:-1])  # truncated entry
    assert decode_gtid_list_body(struct.pack("<I", 0)) == []


def test_annotate_and_checkpoint_vectors():
    assert (
        decode_annotate_body("UPDATE t SET x=1".encode()) == "UPDATE t SET x=1"
    )
    name = b"mariadb-bin.000042"
    assert (
        decode_binlog_checkpoint_body(struct.pack("<I", len(name)) + name)
        == "mariadb-bin.000042"
    )
    with pytest.raises(ValueError):
        decode_binlog_checkpoint_body(struct.pack("<I", 99) + b"short")


def test_gtid_list_fence_and_filter(spark):
    assert gtid_list_fence("0-1-100, 5-2-7") == {0: 100, 5: 7}
    assert gtid_list_fence([]) == {}
    with pytest.raises(ValueError):
        gtid_list_fence("0-1")
    df = spark.createDataFrame(
        [
            ("0-1-99", "a"),   # fenced (seqno <= 100 in domain 0)
            ("0-1-100", "b"),  # fenced (boundary)
            ("0-1-101", "c"),  # passes
            ("5-2-7", "d"),    # fenced
            ("9-9-1", "e"),    # unknown domain: passes
            (None, "f"),       # no gtid: passes
        ],
        "gtid string, v string",
    )
    got = {
        r.v for r in after_mariadb_gtid_list(df, "0-1-100,5-2-7").collect()
    }
    assert got == {"c", "e", "f"}
    # u32 domains / u64 seqnos beyond the signed 32/63-bit range must
    # not null-poison the predicate (round-4 review fix): high-domain
    # events pass when unknown, fence correctly when listed
    hi = spark.createDataFrame(
        [
            ("3000000000-1-5", "p"),    # listed domain, fenced seqno
            ("3000000000-1-6", "q"),    # listed domain, past the fence
            ("4294967295-1-1", "r"),    # unknown u32-max domain: passes
            (f"7-1-{2**64 - 2}", "s"),  # u64 seqno at the fence: fenced
            (f"7-1-{2**64 - 1}", "t"),  # u64 seqno past it: passes
        ],
        "gtid string, v string",
    )
    got_hi = {
        r.v
        for r in after_mariadb_gtid_list(
            hi, f"3000000000-1-5,7-1-{2**64 - 2}"
        ).collect()
    }
    assert got_hi == {"q", "r", "t"}


def test_mariadb_flavored_wire_stream_converges(spark, tmp_path):
    """e2e: a MariaDB-flavored stream (GTID instead of BEGIN, injected
    ANNOTATE/GTID_LIST/CHECKPOINT control frames with real MariaDB
    header type bytes) applied through the wire path converges to the
    SAME final state as the plain stream's sequential oracle."""
    import pyarrow.parquet as pq

    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
    )
    from mysql_tracker_spark.sources.wire import write_wire_batches
    from tests.conftest import normalize

    ev = gen_change_events(GenConfig(n_events=2000, n_conversations=60, seed=11))
    fl = mariadb_flavor(ev)
    # flavor invariants: no BEGIN left, control frames present
    assert (fl["op"] == "BEGIN").sum() == 0
    assert (fl["op"] == "GTID").sum() > 0
    assert (fl["op"] == "ANNOTATE").sum() > 0
    assert (fl["op"] == "GTID_LIST").sum() == 1
    assert (fl["op"] == "CHECKPOINT").sum() == 1
    in_dir = str(tmp_path / "in")
    write_wire_batches(fl, in_dir, n_batches=3)
    # the wire actually carries the MariaDB type bytes (header byte 5)
    types = set()
    for p in sorted((tmp_path / "in").iterdir()):
        for pay in pq.read_table(p)["payload"].to_pylist():
            types.add(pay[4])
    assert {160, 161, 162, 163} <= types

    tbl = str(tmp_path / "tbl")
    job = CdcApplyJob(spark, in_dir, tbl, n_buckets=8, source_format="wire")
    job.run()
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(ev))
    assert got.equals(exp), "MariaDB-flavored replay != sequential oracle"


def test_mariadb_flavor_preserves_dml_bytes():
    """The flavor transform must not touch DML frames: positions,
    xids, and images are byte-identical — the original stream's LWW
    oracle is the flavored stream's oracle."""
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        gen_change_events,
    )

    ev = gen_change_events(GenConfig(n_events=500, n_conversations=20, seed=3))
    fl = mariadb_flavor(ev)
    dml_cols = ["file", "pos", "row_idx", "xid", "op", "before", "after"]
    a = (
        ev[ev["op"].isin(["INSERT", "UPDATE", "DELETE"])][dml_cols]
        .reset_index(drop=True)
    )
    b = (
        fl[fl["op"].isin(["INSERT", "UPDATE", "DELETE"])][dml_cols]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_runner_gtid_list_fence_equals_position_fence(spark, tmp_path):
    """gtid_list wired into the apply job: fencing by the MariaDB
    GTID_LIST state must yield the same final table as an unfenced
    apply (the fenced txns are exactly the replay prefix an
    already-applied table carries), and MySQL-form gtids must pass
    through the MariaDB fence untouched."""
    from mysql_tracker_spark.runner import CdcApplyJob
    from mysql_tracker_spark.sources.binlog_gen import (
        GenConfig,
        expected_final_state,
        gen_change_events,
        write_batches,
    )
    from tests.conftest import normalize

    ev = gen_change_events(GenConfig(n_events=1500, n_conversations=50, seed=21))
    # re-stamp gtids in MariaDB form keyed by xid (monotone txn ids)
    ev = ev.copy()
    ev["gtid"] = ev["xid"].map(
        lambda x: None if pd.isna(x) else f"0-1-{int(x)}"
    )
    in_dir = str(tmp_path / "in")
    write_batches(ev, in_dir, n_batches=3)

    # fence at the median xid: txns <= mid are "already replicated"
    xids = sorted(ev["xid"].dropna().astype(int).unique())
    mid = xids[len(xids) // 2]
    job = CdcApplyJob(
        spark, in_dir, str(tmp_path / "t1"), n_buckets=8,
        gtid_list=f"0-1-{mid}",
    )
    job.run()
    # events from fenced txns never reached the table; convergence
    # still holds for the unfenced suffix
    keep = ev[(ev["gtid"].isna()) | (ev["xid"].astype("Int64") > mid)]
    got = normalize(job.table.read(spark).toPandas())
    exp = normalize(expected_final_state(keep))
    assert got.equals(exp), "gtid-fenced apply != oracle over unfenced suffix"

    # MySQL-form gtids are NOT candidates for the MariaDB fence
    ev2 = gen_change_events(GenConfig(n_events=800, n_conversations=30, seed=22))
    in2 = str(tmp_path / "in2")
    write_batches(ev2, in2, n_batches=2)
    job2 = CdcApplyJob(
        spark, in2, str(tmp_path / "t2"), n_buckets=8,
        gtid_list="0-1-999999999",  # covers everything IF misparsed
    )
    job2.run()
    got2 = normalize(job2.table.read(spark).toPandas())
    exp2 = normalize(expected_final_state(ev2))
    assert got2.equals(exp2), "MySQL-form gtids must pass the MariaDB fence"


def test_mariadb_body_decoders_property():
    """Property (hypothesis): encode->decode round-trips for random
    GTID / GTID_LIST / CHECKPOINT values, and random byte garbage
    either decodes or raises ValueError — never crashes another way."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        seqno=st.integers(0, 2**64 - 1),
        domain=st.integers(0, 2**32 - 1),
        server=st.integers(0, 2**32 - 1),
        flags=st.integers(0, 255),
    )
    def gtid_rt(seqno, domain, server, flags):
        body = struct.pack("<QIB", seqno, domain, flags)
        g = decode_gtid_body(body, server)
        assert (g["domain_id"], g["server_id"], g["seqno"]) == (
            domain, server, seqno,
        )
        assert g["standalone"] == bool(flags & 1)

    gtid_rt()

    @settings(max_examples=100, deadline=None)
    @given(
        entries=st.lists(
            st.tuples(
                st.integers(0, 2**32 - 1),
                st.integers(0, 2**32 - 1),
                st.integers(0, 2**64 - 1),
            ),
            max_size=16,
        ),
        flags=st.integers(0, 15),
    )
    def gtid_list_rt(entries, flags):
        body = struct.pack("<I", len(entries) | (flags << 28))
        for d, s, q in entries:
            body += struct.pack("<IIQ", d, s, q)
        got = decode_gtid_list_body(body)
        assert [(g["domain_id"], g["server_id"], g["seqno"]) for g in got] == entries

    gtid_list_rt()

    @settings(max_examples=200, deadline=None)
    @given(garbage=st.binary(max_size=64))
    def never_crashes(garbage):
        for fn in (
            lambda b: decode_gtid_body(b, 1),
            decode_gtid_list_body,
            decode_binlog_checkpoint_body,
            decode_annotate_body,
        ):
            try:
                fn(garbage)
            except ValueError:
                pass

    never_crashes()
