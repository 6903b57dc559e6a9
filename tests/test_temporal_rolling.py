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
