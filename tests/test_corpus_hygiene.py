"""decontaminate (benchmark n-gram overlap) and redact_pii — known
values plus DuckDB oracle replay."""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    decontaminate, from_dataframe, read_table, redact_pii, run_pipe,
    sink_df,
)


def test_decontaminate_known_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),       # shingles: abg, bgd(elta)
            (1, "alpha beta gamma"),              # exactly the leaked text
            (2, "nothing shared here at all"),
            (3, "xy"),                            # < n tokens
            (4, None),
        ],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [("alpha beta gamma",), ("unrelated benchmark prose",)],
        "text string")

    out = run_pipe(from_dataframe(docs) | decontaminate(bench)
                   | sink_df(), spark)
    got = {r.doc_id: (r.n_shingles, r.n_contam, r.contam_frac)
           for r in out.collect()}
    # doc 0 has 2 shingles, 1 ('alpha beta gamma') in the benchmark
    assert got[0] == (2, 1, 0.5)
    assert got[1] == (1, 1, 1.0)
    assert got[2][1] == 0 and got[2][2] == 0.0
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
    # all input rows survive with their columns
    assert len(got) == 5


def test_decontaminate_matches_duckdb(spark, sf_dir):
    import duckdb

    docs = read_table(sf_dir, "documents")
    # benchmark = every 10th document's text (guaranteed overlap)
    d = docs.df(spark)
    bench = d.where(F.col("doc_id") % 10 == 0).select("text")
    out = run_pipe(from_dataframe(d) | decontaminate(bench) | sink_df(),
                   spark)
    got = {r.doc_id: (r.n_shingles, r.n_contam, r.contam_frac)
           for r in out.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = {r[0]: (r[1], r[2], round(float(r[3]), 6)) for r in con.sql("""
        WITH tk AS (SELECT doc_id,
                           list_filter(string_split_regex(lower(text),
                               '[^a-z0-9]+'), t -> t != '') AS t
                    FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct([array_to_string(t[i:i+2], ' ')
                                     for i in range(1, len(t) - 1)]) AS s
               FROM tk),
        dh AS (SELECT doc_id, unnest(s) AS g FROM sh),
        bh AS (SELECT DISTINCT g FROM dh
               WHERE doc_id % 10 = 0),
        hits AS (SELECT d.doc_id, count(*) AS n_sh,
                        count(b.g) AS n_c
                 FROM dh d LEFT JOIN bh b USING (g) GROUP BY 1)
        SELECT s.doc_id, coalesce(h.n_sh, 0), coalesce(h.n_c, 0),
               CASE WHEN coalesce(h.n_sh, 0) > 0
                    THEN round(h.n_c * 1.0 / h.n_sh, 6) ELSE 0.0 END
        FROM sh s LEFT JOIN hits h USING (doc_id)
    """).fetchall()}
    assert got == want


PII_DOC = ("Contact john.doe+spam@example.co.uk or call +1 (555) 123-4567. "
           "Server at 192.168.1.1 responded; also e@a.io.")


def test_redact_pii_known_values(spark):
    df = spark.createDataFrame(
        [(0, PII_DOC), (1, "no pii here"), (2, None)],
        "doc_id long, text string")
    out = run_pipe(from_dataframe(df) | redact_pii() | sink_df(), spark)
    rows = {r.doc_id: r for r in out.collect()}

    r0 = rows[0]
    assert r0.pii_email == 2
    assert r0.pii_ipv4 == 1
    assert r0.pii_phone == 1
    assert "<EMAIL>" in r0.redacted and "<IP>" in r0.redacted \
        and "<PHONE>" in r0.redacted
    assert "example.co.uk" not in r0.redacted
    assert "192.168" not in r0.redacted
    assert "555" not in r0.redacted
    assert rows[1].redacted == "no pii here"
    assert (rows[1].pii_email, rows[1].pii_ipv4, rows[1].pii_phone) == (0, 0, 0)
    assert rows[2].redacted == ""


def test_redact_pii_matches_duckdb(spark, sf_dir):
    import duckdb
    from conduino_spark.operators.text import redact_pii_sql

    rows = [(0, PII_DOC), (1, "mail a@b.de and c.d@e.org, ip 10.0.0.255"),
            (2, "phones: 030-1234567, +49 171 2345678, digits 12 34"),
            (3, None), (4, "1.2.3.4.5 almost an ip 256.1.1.1")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = run_pipe(from_dataframe(df) | redact_pii() | sink_df(), spark)
    got = {r.doc_id: (r.pii_email, r.pii_ipv4, r.pii_phone, r.redacted)
           for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.sql(
        f"SELECT doc_id, {redact_pii_sql()} FROM documents").fetchall()}
    assert got == want


# --- plan-shape audits (the 100 TB story, pinned) ----------------------------
def _plan(df):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    d = read_table(sf_dir, "documents").df(spark)
    bench = d.where(F.col("doc_id") % 10 == 0).select("text")
    plan = _plan(run_pipe(from_dataframe(d) | decontaminate(bench)
                          | sink_df(), spark))
    assert "BroadcastHashJoin" in plan       # bench hash set broadcast
    assert "CartesianProduct" not in plan
    assert "collect_list" not in plan


def test_funnel_plan_no_cartesian_no_collect(spark, sf_dir):
    from conduino_spark import funnel
    ev = read_table(sf_dir, "events").df(spark)
    plan = _plan(run_pipe(from_dataframe(ev)
                          | funnel(["signup", "click", "purchase"])
                          | sink_df(), spark))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" not in plan
    # per-step filters reach the scan side as pushable predicates
    assert "event_type" in plan


def test_rolling_agg_plan_single_window_pass(spark, sf_dir):
    from conduino_spark import rolling_agg
    ev = read_table(sf_dir, "events").df(spark)
    plan = _plan(run_pipe(
        from_dataframe(ev)
        | rolling_agg("ts", 3600.0, keys=["user_id"],
                      aggs={"n": F.count(F.lit(1)),
                            "mx": F.max("value")})
        | sink_df(), spark))
    # both aggs evaluate in ONE Window node over one keyed exchange
    import re
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1
    assert "hashpartitioning(user_id" in plan


def test_scan_multi_fused_single_pass(spark):
    from conduino_spark import scan_multi, source_list

    p = (source_list(range(1, 11))
         | scan_multi({"s": ("sum", "v"), "n": ("count", "v"),
                       "mx": ("max", "v")})
         | sink_df())
    out = run_pipe(p, spark)
    rows = sorted((r.v, r.s, r.n, r.mx) for r in out.collect())
    assert rows[0] == (1, 1, 1, 1)
    assert rows[-1] == (10, 55, 10, 10)
    # fusion property, robust to AQE's plan printing: the SAME Window
    # node's Arguments line computes all three local accumulators, and
    # likewise one offsets window carries all three offsets
    plan = _plan(out)
    loc_lines = [ln for ln in plan.splitlines() if "AS __loc_s" in ln]
    assert loc_lines and all("__loc_n" in ln and "__loc_mx" in ln
                             for ln in loc_lines)
    off_lines = [ln for ln in plan.splitlines() if "AS __off_s" in ln]
    assert off_lines and all("__off_n" in ln and "__off_mx" in ln
                             for ln in off_lines)
    with pytest.raises(ValueError):
        scan_multi({})
    with pytest.raises(ValueError):
        scan_multi({"x": ("median", "v")})


def _ewma_ref(xs, alpha):
    out, s = [], None
    for x in xs:
        s = x if s is None else alpha * x + (1 - alpha) * s
        out.append(s)
    return out


def test_ewma_matches_sequential_reference(spark):
    import random
    from conduino_spark import ewma, source_list

    rnd = random.Random(7)
    xs = [rnd.uniform(-100, 100) for _ in range(5000)]
    for alpha in (0.9, 0.3, 0.05):
        p = source_list(xs) | ewma(alpha, "v", npart=8) | sink_df()
        got = [r.ewma for r in run_pipe(p, spark)
               .orderBy("__seq").collect()]
        want = _ewma_ref(xs, alpha)
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12)

    # alpha=1 degenerates to identity
    p1 = source_list([1.0, 5.0, 2.0]) | ewma(1.0) | sink_df()
    assert [r.ewma for r in run_pipe(p1, spark).orderBy("__seq").collect()] \
        == [1.0, 5.0, 2.0]

    with pytest.raises(ValueError):
        ewma(0.0)


def test_ewma_partition_independent(spark):
    from conduino_spark import ewma, source_list

    xs = [float((i * 37) % 101) for i in range(2000)]
    outs = []
    for npart in (2, 7, 32):
        p = source_list(xs) | ewma(0.2, "v", npart=npart) | sink_df()
        outs.append(tuple(
            round(r.ewma, 9) for r in run_pipe(p, spark)
            .orderBy("__seq").collect()))
    assert outs[0] == outs[1] == outs[2]
