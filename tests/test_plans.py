"""Plan-shape regression tests: pushdown, pruning, broadcast, and
Python-stage budget (SURVEY.md §4)."""

import __spark_entry__ as entrymod
from mysql_tracker_spark.plans.checks import (
    has_broadcast_join,
    pushed_filters,
    python_stage_count,
    read_schemas,
    wholestage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


def test_tpch_q6_filter_pushed_and_pruned(spark):
    df = entrymod.q_tpch_q6(spark, SF)
    pf = pushed_filters(df)
    assert any("l_shipdate" in p for p in pf), pf
    rs = read_schemas(df)
    # column pruning: the scan must not read all 11 lineitem columns
    assert rs and all(s.count(",") <= 4 for s in rs), rs


def test_tpch_q3_broadcasts_filtered_customer(spark):
    df = entrymod.q_tpch_q3(spark, SF)
    assert has_broadcast_join(df)


def test_cdc_queries_are_pure_jvm(spark):
    for name in [
        "cdc_lww_last_event_per_user",
        "cdc_apply_lww_final_state",
        "cdc_filter_regex",
        "cdc_window_hourly",
        "tpch_q1_pricing_summary",
        "doc_token_count",
        "doc_quality",
        "doc_lang_id",
    ]:
        df = entrymod.queries()[name](spark, SF)
        assert python_stage_count(df) == 0, name


def test_filter_regex_pushed_to_scan(spark):
    df = entrymod.q_cdc_filter_regex(spark, SF)
    # rlike is not a pushable parquet predicate, but the IsNotNull guard
    # is; more importantly the scan must prune to the two needed columns
    rs = read_schemas(df)
    assert rs and all("event_type" in s and "props" not in s for s in rs)


def test_whole_stage_codegen_present(spark):
    # AQE wraps the plan in AdaptiveSparkPlan and reports 0 codegen
    # subtrees before execution; disable it just for this inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = entrymod.q_tpch_q1(spark, SF)
        assert wholestage_codegen_spans(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_tpch_q5_broadcasts_dims_no_python(spark):
    df = entrymod.q_tpch_q5(spark, SF)
    assert has_broadcast_join(df)
    assert python_stage_count(df) == 0


def test_anti_and_semi_joins_pure_jvm(spark):
    for name in ["tpch_q4_exists", "customers_without_orders", "tpch_q12_conditional"]:
        df = entrymod.queries()[name](spark, SF)
        assert python_stage_count(df) == 0, name


def test_new_relational_queries_plan_shape(spark):
    """Q14/Q18 broadcast their dims; cube/moving-sum stay pure JVM with
    pushdown reaching the scan."""
    df14 = entrymod.q_tpch_q14_promo_share(spark, SF)
    assert has_broadcast_join(df14) and python_stage_count(df14) == 0
    assert any("l_shipdate" in p for p in pushed_filters(df14))
    df18 = entrymod.q_tpch_q18_large_orders(spark, SF)
    assert has_broadcast_join(df18) and python_stage_count(df18) == 0
    for name in ("cdc_cube_type_hour", "cdc_moving_sum_per_user"):
        df = entrymod.queries()[name](spark, SF)
        assert python_stage_count(df) == 0, name


def test_round3_tpch_queries_plan_shape(spark):
    """Q7/Q10/Q15/Q17/Q19 broadcast their dimension sides and stay pure
    JVM; the date/flag filters reach the parquet scan."""
    df7 = entrymod.q_tpch_q7_volume_shipping(spark, SF)
    assert has_broadcast_join(df7) and python_stage_count(df7) == 0
    assert any("l_shipdate" in p for p in pushed_filters(df7))
    df10 = entrymod.q_tpch_q10_returned_items(spark, SF)
    assert has_broadcast_join(df10) and python_stage_count(df10) == 0
    assert any("l_returnflag" in p for p in pushed_filters(df10))
    df15 = entrymod.q_tpch_q15_top_supplier(spark, SF)
    assert has_broadcast_join(df15) and python_stage_count(df15) == 0
    df17 = entrymod.q_tpch_q17_small_qty_avg(spark, SF)
    assert has_broadcast_join(df17) and python_stage_count(df17) == 0
    df19 = entrymod.q_tpch_q19_disjunctive(spark, SF)
    assert has_broadcast_join(df19) and python_stage_count(df19) == 0
    df13 = entrymod.q_tpch_q13_order_distribution(spark, SF)
    assert python_stage_count(df13) == 0


def test_round3b_tpch_queries_plan_shape(spark):
    """Q8/Q16/Q20/Q21: broadcast dims, pure JVM, filters at the scan;
    Q21's agg rewrite must not contain a lineitem self-join (one scan
    of lineitem, not three)."""
    from mysql_tracker_spark.plans.checks import explain_str

    df8 = entrymod.q_tpch_q8_market_share(spark, SF)
    assert has_broadcast_join(df8) and python_stage_count(df8) == 0
    assert any("o_orderdate" in p for p in pushed_filters(df8))
    df16 = entrymod.q_tpch_q16_supplier_cnt(spark, SF)
    assert has_broadcast_join(df16) and python_stage_count(df16) == 0
    df20 = entrymod.q_tpch_q20_part_promotion(spark, SF)
    assert has_broadcast_join(df20) and python_stage_count(df20) == 0
    assert any("l_shipdate" in p for p in pushed_filters(df20))
    df21 = entrymod.q_tpch_q21_waiting_supplier(spark, SF)
    assert has_broadcast_join(df21) and python_stage_count(df21) == 0
    txt = explain_str(df21, mode="formatted")
    assert txt.count("lineitem.parquet") == 1, (
        "Q21 rewrite must scan lineitem exactly once (EXISTS/NOT-EXISTS "
        "self-joins belong only in the DuckDB oracle)"
    )


def test_round3c_tpch_queries_plan_shape(spark):
    """Q2/Q9/Q11/Q22 (completing the 22-query set): broadcast dims,
    pure JVM; Q2's correlated-MIN rewrite must scan lineitem exactly
    once (the window MIN replaces the correlated re-scan) and Q11's
    scalar-subquery HAVING must likewise not rescan lineitem for the
    global total (it reuses the per-part aggregate)."""
    from mysql_tracker_spark.plans.checks import explain_str

    df2 = entrymod.q_tpch_q2_min_cost_supplier(spark, SF)
    assert has_broadcast_join(df2) and python_stage_count(df2) == 0
    assert explain_str(df2, mode="formatted").count("lineitem.parquet") == 1
    df9 = entrymod.q_tpch_q9_product_profit(spark, SF)
    assert has_broadcast_join(df9) and python_stage_count(df9) == 0
    df11 = entrymod.q_tpch_q11_important_stock(spark, SF)
    assert has_broadcast_join(df11) and python_stage_count(df11) == 0
    # the global-total branch must ReuseExchange the per-part
    # aggregate, not rescan lineitem (AQE hides the reuse pre-exec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        txt11 = explain_str(
            entrymod.q_tpch_q11_important_stock(spark, SF), mode="formatted"
        )
        assert txt11.count("lineitem.parquet") == 1 and "ReusedExchange" in txt11
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    df22 = entrymod.q_tpch_q22_global_sales_opportunity(spark, SF)
    assert has_broadcast_join(df22) and python_stage_count(df22) == 0
    assert any("o_orderdate" in p for p in pushed_filters(df22))


def test_seq_numbering_has_no_global_single_task_sort(spark):
    """B3 two-phase sequencing: the main data path must be a parallel
    range-repartition + within-partition sort, never a row_number over
    an unpartitioned Window (single-task Exchange SinglePartition over
    the full input). The only SinglePartition exchange allowed is the
    tiny per-partition-counts branch (<= shuffle.partitions rows),
    which sits directly above a HashAggregate."""
    from mysql_tracker_spark.operators.parse import global_sequence
    from mysql_tracker_spark.plans.checks import explain_str

    # inspect the ENGINE plan (the contract query materializes its
    # result to release the sequencer cache, so ITS plan is a local
    # scan); building the frame runs the eager counts collect
    ev = entrymod._t(spark, SF, "events")
    gs = global_sequence(ev, ["ts", "event_id"], out_col="in_id")
    df = gs.select("event_id", "in_id")
    txt = explain_str(df, mode="simple")
    assert "row_number" not in txt, "global-window row_number reintroduced"
    assert "rangepartitioning" in txt, "two-phase range repartition missing"
    # every SinglePartition exchange must feed from an aggregate (the
    # counts branch), never from a scan/sort of the full input
    for seg in txt.split("Exchange SinglePartition")[1:]:
        first_node = seg.strip().splitlines()[1] if "\n" in seg else ""
        assert "HashAggregate" in first_node or "HashAggregate" in seg[:300], txt
    gs._mts_seq_cache.unpersist()


def test_decode_has_exactly_one_python_stage(spark, tmp_path):
    from mysql_tracker_spark.schema import RAW_FRAME_SCHEMA
    from mysql_tracker_spark.sources.binlog_gen import GenConfig, gen_change_events
    from mysql_tracker_spark.sources.wire import decode_frames, write_wire_batches

    ev = gen_change_events(GenConfig(n_events=500, n_conversations=50, seed=1))
    write_wire_batches(ev, str(tmp_path), n_batches=1)
    df = decode_frames(spark.read.schema(RAW_FRAME_SCHEMA).parquet(str(tmp_path)))
    assert python_stage_count(df) == 1


def test_conversation_queries_pure_jvm(spark):
    for name in [
        "conv_dedup_exact",
        "conv_chat_render",
        "conv_stats",
        "conv_boilerplate_turns",
        "emb_semantic_dedup",
    ]:
        df = entrymod.queries()[name](spark, SF)
        assert python_stage_count(df) == 0, name


def test_render_chat_shares_one_conv_shuffle(spark):
    """The window (tail token sum) and the final aggregation both
    partition by conv_id — the plan must carry exactly ONE hash
    exchange (the groupBy reuses the window's partitioning)."""
    from mysql_tracker_spark.functions.conversations import render_chat
    from mysql_tracker_spark.plans.checks import explain_str
    from mysql_tracker_spark.sources.conv_gen import gen_conversations

    df = spark.createDataFrame(gen_conversations(n_convs=20, seed=1))
    plan = explain_str(render_chat(df))
    assert plan.count("hashpartitioning(") == 1, plan


def test_packing_has_exactly_one_python_stage_over_counts_only(spark):
    """pack_sequences: one FlatMapGroupsInPandas stage, and ONLY the
    token counts cross the Python boundary (text is projected away
    before the exchange)."""
    df = entrymod.q_doc_seq_packing(spark, SF)
    assert python_stage_count(df) == 1
    from mysql_tracker_spark.plans.checks import explain_str

    plan = explain_str(df)
    assert "FlatMapGroupsInPandas" in plan
    # the grouped exchange must not carry the text column
    seg = plan[plan.index("FlatMapGroupsInPandas") :]
    assert "text" not in seg.split("== Initial Plan ==")[0].split("Scan parquet")[0]


def test_repetition_stats_is_shuffle_free(spark):
    """Every repetition signal is per-document: the plan must contain
    NO exchange (scan-local higher-order expressions only)."""
    from mysql_tracker_spark.plans.checks import explain_str

    df = entrymod.q_doc_repetition_stats(spark, SF)
    plan = explain_str(df)
    body = plan.split("== Physical Plan ==")[1]
    # the trailing orderBy of the contract query adds one range
    # exchange; no hash exchange may appear
    assert "hashpartitioning(" not in body, body


def test_seq_numbering_durable_barrier_equals_cached(spark, tmp_path):
    """barrier='durable' (cluster-deployment option): the parquet
    scratch write pins one materialization — output identical to the
    cached path, still no single-task global sort, and the release
    handle removes the scratch dir."""
    import os

    from mysql_tracker_spark.operators.parse import global_sequence
    from mysql_tracker_spark.plans.checks import explain_str

    ev = entrymod._t(spark, SF, "events")
    scratch = str(tmp_path / "seq_scratch")
    gs_c = global_sequence(ev, ["ts", "event_id"], out_col="in_id")
    gs_d = global_sequence(
        ev, ["ts", "event_id"], out_col="in_id",
        barrier="durable", scratch_dir=scratch,
    )
    got_c = {r.event_id: r.in_id for r in gs_c.select("event_id", "in_id").collect()}
    got_d = {r.event_id: r.in_id for r in gs_d.select("event_id", "in_id").collect()}
    assert got_c == got_d, "durable barrier changed the sequence"
    # dense 0..n-1 (the correctness invariant behind the barrier)
    assert sorted(got_d.values()) == list(range(len(got_d)))
    txt = explain_str(gs_d.select("event_id", "in_id"), mode="simple")
    assert "row_number" not in txt
    for seg in txt.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate" in seg[:300], txt
    gs_c._mts_seq_cache.unpersist()
    assert os.listdir(scratch)  # scratch holds the tagged parquet
    gs_d._mts_seq_cache.unpersist()
    assert not os.listdir(scratch) or not os.path.exists(
        gs_d._mts_seq_cache.path
    )
    # scratch_dir=None: the handle owns (and removes) the temp base
    gs_t = global_sequence(ev, ["ts", "event_id"], barrier="durable")
    base = os.path.dirname(gs_t._mts_seq_cache.path)
    assert os.path.isdir(base)
    gs_t._mts_seq_cache.unpersist()
    assert not os.path.exists(base), "mkdtemp base leaked"
    import pytest

    with pytest.raises(ValueError, match="barrier"):
        global_sequence(ev, ["ts"], barrier="bogus")
