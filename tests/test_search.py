"""Inverted-index + BM25 retrieval (operators/search.py).

Scores involve libm ``ln`` (JVM vs DuckDB vs CPython may differ in the
last ulp), so score comparisons are tolerance-based; tf/df/dl/ranking
membership are integer-exact.
"""

import math

import pytest
from pyspark.sql import functions as F

from conduino_spark import bm25_search, build_postings, from_dataframe, \
    run_pipe, sink_df
from conduino_spark.operators.search import bm25_sql, query_terms

CORPUS = [
    (0, "hash join hash"),
    (1, "sort merge join"),
    (2, "scan only words here"),
]


def _bm25_ref(docs, query, k1=1.2, b=0.75):
    """Independent driver-side reference implementation."""
    terms = query_terms(query)
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for term in terms:
        df_t = sum(1 for t in toks.values() if term in t)
        if df_t == 0:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, t in toks.items():
            tf = t.count(term)
            if tf:
                out[i] = out.get(i, 0.0) + (
                    idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl)))
    return {i: round(s, 6) for i, s in out.items()}


def test_query_terms_normalization():
    assert query_terms("Hash JOIN, hash!") == ["hash", "join"]
    assert query_terms(["Sort", "merge"]) == ["sort", "merge"]
    with pytest.raises(ValueError):
        bm25_search("  ,; ")


def test_build_postings(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    p = from_dataframe(df) | build_postings() | sink_df()
    rows = {(r.doc_id, r.token): (r.tf, r.dl)
            for r in run_pipe(p, spark).collect()}
    assert rows[(0, "hash")] == (2, 3)
    assert rows[(0, "join")] == (1, 3)
    assert rows[(2, "scan")] == (1, 4)
    assert len({d for d, _ in rows}) == 3


def test_bm25_known_values(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    p = from_dataframe(df) | bm25_search("hash join", k=10) | sink_df()
    got = {r.doc_id: r.bm25 for r in run_pipe(p, spark).collect()}
    want = _bm25_ref(CORPUS, "hash join")
    assert set(got) == set(want) == {0, 1}        # doc 2 matches nothing
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-6)
    # doc 0 (tf(hash)=2 + rarer term) outranks doc 1
    assert got[0] > got[1]


def test_bm25_matches_duckdb(spark, sf_dir):
    import duckdb

    q = "hash join merge sort"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = from_dataframe(docs) | bm25_search(q, k=20) | sink_df()
    got = [(r.doc_id, r.bm25) for r in run_pipe(p, spark).collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = con.sql(bm25_sql(q, k=20)).fetchall()

    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=2e-6)


def test_bm25_plan_broadcasts_and_heap(spark, sf_dir):
    import contextlib
    import io

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = from_dataframe(docs) | bm25_search("hash join", k=10) | sink_df()
    out = run_pipe(p, spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # df/stats joins are broadcast; top-k is a per-partition heap
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
