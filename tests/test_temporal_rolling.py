"""rolling_agg (per-key time-RANGE frames) and funnel (ordered step
completion) — known values plus DuckDB oracle replay on real events."""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    from_dataframe, funnel, read_table, rolling_agg, run_pipe, sink_df,
)


def test_rolling_agg_known_values(spark):
    df = spark.createDataFrame(
        [("u", 0.0, 1.0), ("u", 5.0, 2.0), ("u", 10.0, 4.0),
         ("u", 11.0, 8.0), ("u", 20.0, 16.0),
         ("v", 10.0, 100.0)],
        "k string, t double, x double")
    p = (from_dataframe(df)
         | rolling_agg("t", 10.0, keys=["k"],
                       aggs={"n": F.count(F.lit(1)), "s": F.sum("x")})
         | sink_df())
    got = {(r.k, r.t): (r.n, r.s) for r in run_pipe(p, spark).collect()}
    # frames are [t-10, t] inclusive both ends
    assert got[("u", 0.0)] == (1, 1.0)
    assert got[("u", 5.0)] == (2, 3.0)
    assert got[("u", 10.0)] == (3, 7.0)      # 0 is IN [0, 10]
    assert got[("u", 11.0)] == (3, 14.0)     # 0 fell out
    assert got[("u", 20.0)] == (3, 28.0)
    assert got[("v", 10.0)] == (1, 100.0)    # keys isolated

    with pytest.raises(ValueError):
        rolling_agg("t", -1.0)


def test_rolling_agg_matches_duckdb(spark, sf_dir):
    import duckdb

    ev = read_table(sf_dir, "events")
    p = (from_dataframe(ev.df(spark))
         | rolling_agg("ts", 86400.0, keys=["user_id"],
                       aggs={"n": F.count(F.lit(1)),
                             "mx": F.max("value"),
                             "s": F.sum("value")})
         | sink_df())
    got = {r.event_id: (r.n, r.mx, r.s)
           for r in run_pipe(p, spark).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.sql("""
        SELECT event_id,
               count(*) OVER w AS n, max(value) OVER w AS mx,
               sum(value) OVER w AS s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """).fetchall()}

    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]                      # count exact
        assert got[k][1] == want[k][1]                      # max exact
        assert got[k][2] == pytest.approx(want[k][2], rel=1e-9)


def test_rolling_agg_prefix_equals_range(spark):
    """r15 scale path: declared (op, col) aggs decompose the sliding
    RANGE frame into two growing frames + a probe union — results must
    be BIT-EQUAL to the range frame, including ties, null values, an
    all-null frame (sum/avg NULL, not 0) and Column expressions."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n = 2000
    pdf = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "t": np.round(rng.uniform(0, 200, n), 1),   # dense ties
        "v": np.where(rng.random(n) < 0.15, np.nan,
                      rng.integers(-40, 40, n).astype(float)),
    })
    df = (spark.createDataFrame(pdf)
          .withColumn("v", F.when(F.isnan("v"), F.lit(None))
                            .otherwise(F.col("v")))
          .withColumn("vl", F.col("v").cast("long")))
    expr = (F.col("vl") * 2)
    col_aggs = {"n": F.count(F.lit(1)), "nv": F.count("v"),
                "s": F.sum("vl"), "a": F.avg("v"),
                "sx": F.sum(expr)}
    dec_aggs = {"n": ("count", "*"), "nv": ("count", "v"),
                "s": ("sum", "vl"), "a": ("avg", "v"),
                "sx": ("sum", expr)}

    def run(aggs, **kw):
        p = (from_dataframe(df)
             | rolling_agg("t", 25.0, keys=["k"], aggs=aggs, **kw)
             | sink_df())
        return (run_pipe(p, spark)
                .orderBy("k", "t", "v", "n", "nv", "s")
                .toPandas().reset_index(drop=True))

    # r16: strategy='prefix' pins the decomposition branch (the auto
    # density gate would route this small input to the RANGE branch);
    # all three strategies must agree bit-for-bit
    want = run(col_aggs)
    pd.testing.assert_frame_equal(want, run(dec_aggs, strategy="prefix"))
    pd.testing.assert_frame_equal(want, run(dec_aggs, strategy="range"))
    pd.testing.assert_frame_equal(want, run(dec_aggs, strategy="auto"))

    # all-null frame yields NULL (not 0) on both paths
    df2 = spark.createDataFrame(
        [(1, 0.0, None), (1, 10.0, None), (1, 10.0, 3.0)],
        "k int, t double, v double")
    for aggs in ({"s": F.sum("v")}, {"s": ("sum", "v")}):
        p = (from_dataframe(df2)
             | rolling_agg("t", 5.0, keys=["k"], aggs=aggs)
             | sink_df())
        rows = sorted(run_pipe(p, spark).collect(),
                      key=lambda r: (r.t, r.v is not None))
        assert rows[0].s is None
        assert rows[1].s == 3.0 and rows[2].s == 3.0

    # mixed declared/Column forms and bad ops raise
    with pytest.raises(ValueError):
        rolling_agg("t", 1.0, aggs={"a": ("sum", "v"),
                                    "b": F.count(F.lit(1))})
    with pytest.raises(ValueError):
        rolling_agg("t", 1.0, aggs={"a": ("median", "v")})
    with pytest.raises(ValueError):
        rolling_agg("t", 1.0, strategy="fastest")
    with pytest.raises(ValueError):
        # Column aggs have no prefix decomposition
        rolling_agg("t", 1.0, aggs={"a": F.count(F.lit(1))},
                    strategy="prefix")


def test_rolling_agg_prefix_law_hypothesis(spark):
    """Property law: for ANY (key, time, value) multiset — ties,
    duplicate rows, null values, zero/odd window widths — the
    declared prefix path equals a pure-Python reference of the SQL
    RANGE frame semantics (frame [t−W, t] inclusive, peers shared,
    all-null sum frame → None)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[
                  HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(
        st.tuples(st.integers(0, 2),
                  st.integers(0, 30),
                  st.one_of(st.none(), st.integers(-9, 9))),
        min_size=1, max_size=40),
        w=st.sampled_from([0, 3, 7]))
    def law(rows, w):
        df = spark.createDataFrame(
            [(k, float(t), v) for k, t, v in rows],
            "k int, t double, v int")
        p = (from_dataframe(df)
             | rolling_agg("t", float(w), keys=["k"],
                           aggs={"n": ("count", "*"),
                                 "s": ("sum", "v")},
                           strategy="prefix")
             | sink_df())
        got = sorted(((r.k, r.t, r.v, r.n, r.s)
                      for r in run_pipe(p, spark).collect()),
                     key=lambda x: (x[0], x[1], x[2] is None,
                                    x[2] or 0))
        want = []
        for k, t, v in rows:
            frame = [v2 for k2, t2, v2 in rows
                     if k2 == k and t - w <= t2 <= t]
            nn = [x for x in frame if x is not None]
            want.append((k, float(t), v, len(frame),
                         sum(nn) if nn else None))
        want.sort(key=lambda x: (x[0], x[1], x[2] is None, x[2] or 0))
        assert got == want

    law()


def test_rolling_agg_prefix_plan_no_sliding_frame(spark):
    """The prefix path's plan must contain only GROWING window
    frames (unboundedpreceding) — the sliding RANGE frame Spark
    re-aggregates per row is what made a Zipf head user quadratic
    (64x at 10x rows, SCALE_PROBE_r15 real-sf1 mode)."""
    df = spark.createDataFrame([(1, 0.0, 1.0)], "k int, t double, v double")
    p = (from_dataframe(df)
         | rolling_agg("t", 10.0, keys=["k"],
                       aggs={"n": ("count", "*"), "s": ("sum", "v")},
                       strategy="prefix")
         | sink_df())
    plan = run_pipe(p, spark)._jdf.queryExecution().executedPlan().toString()
    spec = plan.lower()
    assert "unboundedpreceding" in spec
    # the only range frame allowed is the growing cumulative one
    import re
    for m in re.finditer(r"specifiedwindowframe\(rangeframe, ([^,]+),",
                         spec):
        assert "unboundedpreceding" in m.group(1)


def test_rolling_agg_auto_density_gate(spark):
    """r16 (VERDICT r15 #6): strategy='auto' takes the one-pass RANGE
    plan when the binned work bound proves the frames sparse, and the
    linear prefix plan when a hot key's frames are dense — decided per
    dataset, results identical either way (the equality tests above)."""
    import re

    def plan_of(df, w):
        p = (from_dataframe(df)
             | rolling_agg("t", w, keys=["k"],
                           aggs={"n": ("count", "*"), "s": ("sum", "v")})
             | sink_df())
        pl = run_pipe(p, spark)._jdf.queryExecution() \
                                    .executedPlan().toString().lower()
        sliding = [m.group(1) for m in re.finditer(
            r"specifiedwindowframe\(rangeframe, ([^,]+),", pl)
            if "unboundedpreceding" not in m.group(1)]
        return pl, sliding

    # sparse: 50 keys x 20 rows spread over 100x the window width ->
    # bound ~ 2 rows/frame -> RANGE branch (a sliding frame IS present)
    sparse = spark.createDataFrame(
        [(k, float(i * 100), 1.0) for k in range(50) for i in range(20)],
        "k int, t double, v double")
    pl, sliding = plan_of(sparse, 10.0)
    assert sliding, "auto should pick the RANGE branch on sparse data"

    # dense: one key, 3000 rows inside ONE window width -> bound
    # ~ 3000 rows/frame >> avg cap -> prefix branch (growing frames
    # only, probe union present)
    dense = spark.createDataFrame(
        [(1, float(i % 7), 1.0) for i in range(3000)],
        "k int, t double, v double")
    pl, sliding = plan_of(dense, 1000.0)
    assert not sliding, "auto must pick the prefix branch on dense data"
    assert "union" in pl


FUNNEL_EVENTS = [
    # u1: clean signup -> click -> purchase
    ("u1", "signup", 1.0), ("u1", "click", 2.0), ("u1", "purchase", 3.0),
    # u2: click BEFORE signup doesn't count; no click after -> no funnel
    ("u2", "click", 1.0), ("u2", "signup", 2.0), ("u2", "purchase", 3.0),
    # u3: completes but outside horizon 10 from FIRST signup (t=0);
    # the later signup at t=50 is NOT re-anchored (first-touch)
    ("u3", "signup", 0.0), ("u3", "signup", 50.0),
    ("u3", "click", 55.0), ("u3", "purchase", 58.0),
    # u4: equal times are NOT 'strictly after'
    ("u4", "signup", 1.0), ("u4", "click", 1.0), ("u4", "purchase", 2.0),
]


def test_funnel_known_values(spark):
    df = spark.createDataFrame(FUNNEL_EVENTS, "user_id string, event_type string, ts double")
    steps = ["signup", "click", "purchase"]

    out = run_pipe(from_dataframe(df) | funnel(steps, key="user_id")
                   | sink_df(), spark)
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in out.collect()}
    assert got == {"u1": (1.0, 2.0, 3.0), "u3": (0.0, 55.0, 58.0)}

    with_h = run_pipe(from_dataframe(df)
                      | funnel(steps, key="user_id", horizon=10.0)
                      | sink_df(), spark)
    assert {r.user_id for r in with_h.collect()} == {"u1"}

    with pytest.raises(ValueError):
        funnel([])
    with pytest.raises(ValueError):
        funnel(steps, horizon=-1.0)


def test_funnel_matches_duckdb(spark, sf_dir):
    import duckdb

    ev = read_table(sf_dir, "events")
    out = run_pipe(from_dataframe(ev.df(spark))
                   | funnel(["signup", "click", "purchase"])
                   | sink_df(), spark)
    got = {r.user_id: (r.t1, r.t2, r.t3) for r in out.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.sql("""
        WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, t1, min(epoch_us(e.ts)) AS t2
               FROM events e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1
               GROUP BY 1, 2),
        s3 AS (SELECT e.user_id, t1, t2, min(epoch_us(e.ts)) AS t3
               FROM events e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2
               GROUP BY 1, 2, 3)
        SELECT user_id, t1 / 1e6 AS t1, t2 / 1e6 AS t2, t3 / 1e6 AS t3
        FROM s3
    """).fetchall()}
    assert got == want
