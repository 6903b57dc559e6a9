"""Plan-quality regression tests: assert the PHYSICAL plans stay the
ones we want at scale (SURVEY 'optimize for scale' contract).  These
catch silent regressions like a lost filter pushdown or a broadcast
turning into a shuffle join."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    filter_, join, map_, read_table, run_pipe, sink_df, top_k,
)


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_and_projection_reach_the_scan(spark, sf_dir):
    src = read_table(sf_dir, "lineitem")
    p = (src
         | filter_("l_discount >= 0.05")
         | map_({"l_orderkey": F.col("l_orderkey")})
         | sink_df())
    plan = plan_of(run_pipe(p, spark))
    scan = plan.split("Scan parquet")[-1]
    pushed = scan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_discount" in pushed, f"filter not pushed: {pushed}"
    read_schema = scan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_shipdate" not in read_schema, "column pruning lost"
    assert "l_extendedprice" not in read_schema, "column pruning lost"


def test_dim_join_broadcasts(spark, sf_dir):
    orders = read_table(sf_dir, "orders")
    cust = read_table(sf_dir, "customer")
    p = (orders
         | join(cust, on=[F.expr("o_custkey = c_custkey")], broadcast=True)
         | sink_df())
    plan = plan_of(run_pipe(p, spark))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_k_avoids_global_sort(spark, sf_dir):
    cust = read_table(sf_dir, "customer")
    p = cust | top_k(5, F.desc("c_acctbal")) | sink_df()
    plan = plan_of(run_pipe(p, spark))
    assert "TakeOrderedAndProject" in plan
    # a global sort would appear as Sort + Exchange rangepartitioning
    assert "rangepartitioning" not in plan.lower()


def test_agg_has_map_side_partial(spark, sf_dir):
    li = read_table(sf_dir, "lineitem").df(spark)
    plan = plan_of(
        li.groupBy("l_returnflag").agg(F.sum("l_quantity")), "simple")
    # partial before exchange, final after
    pre_exchange = plan.split("Exchange")[-1]
    assert "partial_sum" in pre_exchange, "map-side combine missing"


def test_segment_boundary_stays_lazy(spark, sf_dir):
    # take over __seq must compile to one plan with a broadcast join on
    # the 1-row boundary - no collect()/driver value in the plan
    from conduino_spark.operators.segments import take
    src = read_table(sf_dir, "orders", seq_col="o_orderkey")
    p = src | take(100) | sink_df()
    plan = plan_of(run_pipe(p, spark))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # the nth-seq boundary


def test_salted_group_agg_matches_plain(spark, sf_dir):
    from conduino_spark import group_agg, salted_group_agg
    li = read_table(sf_dir, "lineitem")
    plain = run_pipe(li | group_agg(["l_returnflag"], {
        "n": F.count(F.lit(1)), "q": F.sum("l_quantity")}) | sink_df(), spark)
    salted = run_pipe(li | salted_group_agg(["l_returnflag"], {
        "n": F.count(F.lit(1)), "q": F.sum("l_quantity")}) | sink_df(), spark)
    a = {r["l_returnflag"]: (r["n"], round(r["q"], 4)) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["n"], round(r["q"], 4)) for r in salted.collect()}
    assert a == b


def test_salted_join_matches_plain(spark, sf_dir):
    from conduino_spark import join, salted_join
    orders = read_table(sf_dir, "orders")
    cust = read_table(sf_dir, "customer")
    plain = run_pipe(orders | join(cust, on=[F.expr("o_custkey = c_custkey")]) | sink_df(), spark)
    salted = run_pipe(orders | salted_join(cust, "o_custkey", "c_custkey") | sink_df(), spark)
    assert plain.count() == salted.count()


def test_asof_join_is_window_not_nested_loop(spark, sf_dir):
    from conduino_spark import asof_join, from_dataframe
    from pyspark.sql import functions as F
    ev = read_table(sf_dir, "events").df(spark)
    clicks = ev.where("event_type = 'click'").select(
        "event_id", F.col("ts").cast("long").alias("t"), "user_id")
    buys = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("ts").cast("long").alias("t"),
        F.col("event_id").alias("p_event"))
    st = asof_join(from_dataframe(buys), on="user_id", left_time="t",
                   right_time="t", right_cols={"p_event": "p_event"})
    plan = plan_of(st(clicks))
    assert "NestedLoop" not in plan          # never quadratic
    assert "Window" in plan                  # the union-trick window
    assert "EqualTo(event_type,click)" in plan  # pushdown survives


def test_interval_join_is_equi_join(spark, sf_dir):
    from conduino_spark import from_dataframe, interval_join
    from pyspark.sql import functions as F
    ev = read_table(sf_dir, "events").df(spark)
    views = ev.where("event_type = 'view'").select(
        "event_id", F.col("ts").cast("long").alias("t"), "user_id")
    buys = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("p_event"), "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 3600).alias("e"))
    st = interval_join(from_dataframe(buys), point="t", start="s", end="e",
                       on="user_id", out_cols={"p_event": "p_event"})
    plan = plan_of(st(views))
    assert "NestedLoop" not in plan          # binning keeps it equi
    assert "HashJoin" in plan or "SortMergeJoin" in plan
