"""Bucketed co-located joins: both sides bucketed on the join key →
sort-merge join with NO exchange (the repeated-big-join scale path)."""

import io
import contextlib

from pyspark.sql import functions as F

from conduino_spark import read_table, run_pipe, sink_df
from conduino_spark.operators.bucketing import bucketed_source, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse dir is static per-session; default ./spark-warehouse is
    # fine for the test, tables are dropped in the finally block
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    run_pipe(read_table(sf_dir, "orders") | write_bucketed("b_orders", "o_orderkey", buckets=8), spark)
    run_pipe(read_table(sf_dir, "lineitem") | write_bucketed("b_lineitem", "l_orderkey", buckets=8), spark)

    a = bucketed_source("b_orders").df(spark)
    b = bucketed_source("b_lineitem").df(spark)
    joined = a.join(b, a["o_orderkey"] == b["l_orderkey"])

    # disable auto-broadcast so the plan shows the merge-join shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, \
            "bucketed join still shuffles"
        n = joined.count()
        plain = (read_table(sf_dir, "orders").df(spark)
                 .join(read_table(sf_dir, "lineitem").df(spark),
                       F.expr("o_orderkey = l_orderkey")).count())
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
