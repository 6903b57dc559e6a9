"""Coverage tests for the rest of the SURVEY §2 surface: source family,
sink family, multi-pipe algebra, effect layer, relational extras —
plus Hypothesis differential tests of the segment/sequel algebra
against a pure-Python simulator of the reference semantics
(Combinators.hs:416-547)."""

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from conduino_spark import (
    Stage, WriterTap, catch_p, concat, consecutive, cube_agg, drop, drop_while,
    event_window, except_all, exec_writer_p, filter_, fold, fold_monoid, foldr,
    from_dataframe, fuse_both, fuse_upstream, gen_source, head_, intersect,
    iter_m, iterate_maybe, ivf_search, last_, lsh_bucket, map_, map_m,
    minhash_dedup, range_source, read_table, reader_p, repeat_m,
    repeat_maybe_m, repeat_source, replicate_m, replicate_source, rollup_agg,
    run_pipe, scan, session_window, sink_count, sink_df, sink_list, sink_null,
    sink_parquet, sink_text, source_list, source_text_lines, sql_stage, take,
    take_while, tokenize, uncons_zip_source, unfold, unfold_either,
    unfold_maybe, union_all, with_columns,
)
from conduino_spark.plans.core import SEQ


# ---- source family (SURVEY §2.3) -------------------------------------------

def test_unfold_family(spark):
    fib = unfold(lambda s: (s[0], (s[1], s[0] + s[1])), (1, 1), take=7)
    assert run_pipe(fib | sink_list(), spark) == [1, 1, 2, 3, 5, 8, 13]

    bounded = unfold_maybe(lambda s: (s, s + 1) if s < 5 else None, 0)
    assert run_pipe(bounded | sink_list(), spark) == [0, 1, 2, 3, 4]

    src, result = unfold_either(
        lambda s: (s, s + 1) if s < 3 else f"stopped at {s}", 0)
    assert run_pipe(src | sink_list(), spark) == [0, 1, 2]
    assert result == "stopped at 3"


def test_iterate_maybe_and_repeats(spark):
    halving = iterate_maybe(lambda x: x // 2 if x > 1 else None, 40)
    assert run_pipe(halving | sink_list(), spark) == [20, 10, 5, 2, 1]
    assert run_pipe(repeat_source("x", take=3) | sink_list(), spark) == ["x"] * 3
    assert run_pipe(replicate_source(4, 9) | sink_list(), spark) == [9] * 4
    c = iter(range(100))
    assert run_pipe(repeat_m(lambda: next(c), take=3) | sink_list(), spark) == [0, 1, 2]
    d = iter([7, 8, None, 9])
    assert run_pipe(repeat_maybe_m(lambda: next(d)) | sink_list(), spark) == [7, 8]
    e = iter(range(10, 100))
    assert run_pipe(replicate_m(2, lambda: next(e)) | sink_list(), spark) == [10, 11]


def test_range_source_distributed(spark):
    p = range_source(1000, start=5) | fold("v", how="sum")
    assert run_pipe(p, spark) == sum(range(5, 1005))


def test_gen_source_and_from_dataframe(spark):
    def g():
        yield from (i * i for i in range(5))

    assert run_pipe(gen_source(g) | sink_list(), spark) == [0, 1, 4, 9, 16]

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    src = from_dataframe(df, seq_col="k")
    assert run_pipe(src | last_(col="s"), spark) == "b"


def test_source_text_lines(spark, tmp_path):
    path = str(tmp_path / "lines.txt")
    with open(path, "w") as f:
        f.write("alpha\n\nbeta\n")  # blank line PASSED (CHANGELOG.md:23-24)
    rows = run_pipe(source_text_lines(path) | sink_list(col="line"), spark)
    assert sorted(rows) == ["", "alpha", "beta"]


# ---- sink family (SURVEY §2.5) ---------------------------------------------

def test_foldr_and_monoid(spark):
    p = source_list(["a", "b", "c"]) | foldr(lambda x, acc: x + acc, "")
    assert run_pipe(p, spark) == "abc"
    assert run_pipe(source_list([2, 7, 1]) | fold_monoid(how="max"), spark) == 7


def test_sink_null_and_count(spark):
    assert run_pipe(source_list([1, 2, 3]) | sink_null(), spark) is None
    assert run_pipe(source_list([1, 2, 3]) | sink_count(), spark) == 3


def test_sink_parquet_and_text(spark, tmp_path):
    pq = str(tmp_path / "out_parquet")
    run_pipe(source_list([1, 2, 3]) | sink_parquet(pq), spark)
    assert sorted(r["v"] for r in spark.read.parquet(pq).collect()) == [1, 2, 3]
    txt = str(tmp_path / "out_text")
    run_pipe(source_list([10, 20]) | sink_text(txt), spark)
    vals = sorted(r["value"] for r in spark.read.text(txt).collect())
    assert vals == ["10", "20"]


# ---- multi-pipe algebra (SURVEY §2.2) --------------------------------------

def test_uncons_zip_source(spark):
    head, tail = uncons_zip_source(source_list([5, 6, 7]))
    assert run_pipe(head | sink_list(), spark) == [5]
    assert run_pipe(tail | sink_list(), spark) == [6, 7]


def test_fuse_both_and_upstream(spark):
    src = source_list(range(1, 11))
    fb = fuse_both(src, [F.count(F.lit(1)).alias("n")], fold("v", how="sum"))
    up, down = fb.run(spark)
    assert (up, down) == (10, 55)
    fu = fuse_upstream(src, [F.max("v").alias("m")], sink_null())
    assert fu.run(spark) == 10


# ---- effect layer (SURVEY §2.6) --------------------------------------------

def test_reader_p(spark):
    def make(env):
        return filter_(F.col("v") >= env["cutoff"])

    p = source_list([1, 5, 9]) | reader_p(make, {"cutoff": 5}) | sink_list()
    assert run_pipe(p, spark) == [5, 9]


def test_catch_p_handler(spark):
    def risky(x):
        if x == 2:
            raise RuntimeError("boom")
        return x * 1.0

    p = (source_list([1, 2, 3])
         | catch_p(risky, lambda x, e: -1.0)
         | sink_list())
    assert run_pipe(p, spark) == [1.0, -1.0, 3.0]


def test_exec_writer_p(spark):
    result, log = exec_writer_p(
        source_list(range(5)), {"n": F.count(F.lit(1))},
        fold("v", how="max"), spark)
    assert result == 4 and log["n"] == 5


def test_iter_m_observe(spark):
    from pyspark.sql import Observation
    obs = Observation()
    p = (source_list([1, 2, 3])
         | iter_m([F.sum("v").alias("s")], observation=obs)
         | sink_list())
    assert run_pipe(p, spark) == [1, 2, 3]
    assert dict(obs.get)["s"] == 6


# ---- elementwise extras ----------------------------------------------------

def test_map_m_and_with_columns(spark):
    p = source_list([1, 2]) | map_m(lambda x: x + 0.5) | sink_list()
    assert run_pipe(p, spark) == [1.5, 2.5]
    p2 = (source_list([3])
          | with_columns({"double": F.col("v") * 2, "s": F.lit("k")})
          | sink_df())
    row = run_pipe(p2, spark).collect()[0]
    assert row["double"] == 6 and row["s"] == "k"


def test_concat_flattens(spark):
    df = spark.createDataFrame([(0, [1, 2]), (1, [3])], f"{SEQ} long, v array<long>")
    p = from_dataframe(df) | concat() | sink_list()
    assert run_pipe(p, spark) == [1, 2, 3]


# ---- relational extras ------------------------------------------------------

def test_rollup_cube_setops_sql(spark, sf_dir):
    li = read_table(sf_dir, "lineitem")
    r = run_pipe(li | rollup_agg(["l_returnflag"], {"n": F.count(F.lit(1))}) | sink_df(), spark)
    assert r.where(F.col("l_returnflag").isNull()).count() == 1  # grand total
    c = run_pipe(li | cube_agg(["l_returnflag", "l_linestatus"],
                               {"n": F.count(F.lit(1))}) | sink_df(), spark)
    assert c.count() >= r.count()

    a = source_list([1, 2, 3])
    b = source_list([2, 3, 4])
    u = run_pipe(a | union_all(b) | sink_df(), spark)
    assert u.count() == 6
    i = run_pipe(a | intersect(b) | sink_df(), spark)
    assert sorted(r["v"] for r in i.collect()) == [2, 3]
    e = run_pipe(a | except_all(b) | sink_df(), spark)
    assert [r["v"] for r in e.collect()] == [1]

    s = run_pipe(source_list([1, 2, 3])
                 | sql_stage("SELECT sum(v) AS s FROM t") | sink_df(), spark)
    assert s.collect()[0]["s"] == 6


def test_session_window_batch(spark, sf_dir):
    ev = read_table(sf_dir, "events")
    out = run_pipe(ev | session_window("ts", "5 minutes", keys=["user_id"]) | sink_df(), spark)
    assert out.count() > 0
    assert set(out.columns) == {"w_start", "w_end", "user_id", "n"}


# ---- similarity extras ------------------------------------------------------

def test_lsh_bucket_and_ivf(spark, sf_dir):
    emb = read_table(sf_dir, "embeddings")
    dim = len(emb.df(spark).first()["embedding"])
    b = run_pipe(emb | lsh_bucket(dim=dim) | sink_df(), spark)
    assert b.select("bucket").distinct().count() > 1
    q = [float(x) for x in emb.df(spark).orderBy("vec_id").first()["embedding"]]
    res = run_pipe(emb | ivf_search(q, k=3, nprobe=2) | sink_df(), spark).collect()
    assert len(res) == 3 and res[0]["cosine"] >= res[1]["cosine"]


def test_minhash_dedup_keeps_originals(spark, sf_dir):
    docs = read_table(sf_dir, "documents")
    kept = run_pipe(docs | minhash_dedup() | sink_count(), spark)
    total = run_pipe(docs | sink_count(), spark)
    assert 0 < kept <= total


def test_tokenize_bpe(spark):
    docs = source_list([{"doc_id": 1, "text": "ab12,cd!"}])
    out = run_pipe(docs | tokenize(bpe=True) | sink_df(), spark).collect()[0]
    assert out["tokens"] == ["ab", "12", ",", "cd", "!"]


# ---- Hypothesis: differential segment algebra ------------------------------
# Pure-Python simulator of the reference's take/drop/takeWhile/dropWhile +
# sequel semantics (Combinators.hs:416-547).

def sim_segment(kind, arg, xs):
    """Returns (passed, remainder) per reference semantics."""
    if kind == "take":
        return xs[:arg], xs[arg:]
    if kind == "drop":
        return [], xs[arg:]
    if kind == "take_while":
        i = next((j for j, x in enumerate(xs) if not (x < arg)), None)
        if i is None:
            return xs, []
        return xs[:i], xs[i + 1:]          # boundary consumed, not forwarded
    if kind == "drop_while":
        i = next((j for j, x in enumerate(xs) if not (x < arg)), None)
        if i is None:
            return [], []
        return [], xs[i + 1:]              # boundary consumed AND dropped
    raise AssertionError(kind)


def build_segment(kind, arg):
    return {
        "take": lambda: take(arg),
        "drop": lambda: drop(arg),
        "take_while": lambda: take_while(f"v < {arg}"),
        "drop_while": lambda: drop_while(f"v < {arg}"),
    }[kind]()


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    xs=st.lists(st.integers(min_value=-20, max_value=20), max_size=12),
    kind=st.sampled_from(["take", "drop", "take_while", "drop_while"]),
    arg=st.integers(min_value=0, max_value=8),
)
def test_segment_sequel_matches_reference(spark, xs, kind, arg):
    seg = build_segment(kind, arg)
    got = run_pipe(source_list(xs) | (seg >> sink_list()), spark)
    _, remainder = sim_segment(kind, arg, xs)
    assert got == remainder

    got_passed = run_pipe(source_list(xs) | build_segment(kind, arg) | sink_list(), spark)
    passed, _ = sim_segment(kind, arg, xs)
    assert got_passed == passed


def test_passthrough_tags_outputs_with_inputs(spark):
    from conduino_spark import map_, passthrough
    st = passthrough(map_(F.col("v") * 10, name="x10"))
    p = source_list([1, 2, 3]) | st | sink_df()
    rows = {r["v"]: r["in_v"] for r in run_pipe(p, spark).collect()}
    assert rows == {10: 1, 20: 2, 30: 3}
