"""Round-4 regression tests: the r3 VERDICT's carried items.

  * the driver gate window contract: <= 50 declared queries, every one
    with an oracle (or explicitly listed rows-only)
  * knn_lsh over a bucket-partitioned index probes via partition
    PRUNING (r2 task #6 / r3 'weak' item) — plan-tested
  * alt_sink_n >= 3-sink race: earliest termination wins, leftmost
    tie-break (ref Data/Conduino.hs:664-687)
  * the streaming replay law: sentinel-flushed append-mode stream ==
    batch tumbling aggregation (feedPipe law, Data/Conduino.hs:245-257)
"""

import importlib.util
import io
import contextlib
import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    alt_sink_n, event_window, fold, from_dataframe, knn_lsh,
    lsh_index_write, probe_buckets, run_pipe, sink_df, source_list,
)
from conduino_spark.operators.adapters import limited_sink


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_r4", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# --- gate window contract ----------------------------------------------------
def test_gate_window_contract():
    m = _entry()
    q, o = m.queries(), m.oracle_sql()
    # the driver records CORRECTNESS rows for the first 50 declared
    # queries only: every declared query must fit inside the window
    assert len(q) <= m.GATE_MAX_QUERIES
    # and every declared query must be oracle-checked — NO rows-only
    # entries at all since r9: even BPE merge learning (the r8
    # documented exception) replays via the 64-round unrolled
    # materialized-CTE chain (_sql_bpe_train), so the whole gate
    # hash-verifies.  (r15: oracle_sql may carry EXTRA entries for
    # bench-extra pins outside the 50-slot window — profile_media —
    # which tools/check_oracle.py replays the same way.)
    assert set(q) <= set(o)
    for extra in set(o) - set(q):
        assert extra in m.bench_extras(), (
            f"oracle entry {extra} is neither declared nor benched")


# --- knn_lsh partition pruning ----------------------------------------------
def test_knn_lsh_probe_partition_pruning(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.where(F.col("vec_id") == 0).first()
    qv = [float(x) for x in row["embedding"]]

    d = tempfile.mkdtemp(prefix="lsh_idx_test_")
    lsh_index_write(emb, d, dim=len(qv))
    idx = spark.read.parquet(d)

    p = from_dataframe(idx) | knn_lsh(qv, k=5, bucket_col="bucket") | sink_df()
    out = run_pipe(p, spark)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    scan = plan.split("Scan parquet")[-1]
    pf = scan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in pf, f"probe is not partition pruning: {pf}"
    # the probe is the pruning predicate, not a post-scan filter
    assert " IN " in pf or "isin" in pf or "IN (" in pf, pf

    # and the result equals the per-row-bucket (no-index) path
    probe = set(probe_buckets(qv))
    got = {r.vec_id for r in out.collect()}
    p2 = from_dataframe(emb) | knn_lsh(qv, k=5) | sink_df()
    want = {r.vec_id for r in run_pipe(p2, spark).collect()}
    assert got == want


# --- alt_sink_n 3-way race ---------------------------------------------------
def test_alt_sink_n_three_way_race(spark):
    # three sinks with distinct termination seqs: the EARLIEST wins
    full = fold("v", how="sum")            # never terminates early
    take3 = limited_sink(fold("v", how="sum"), 3)
    take2 = limited_sink(fold("v", how="sum"), 2)
    p = source_list(range(1, 11)) | alt_sink_n(full, take3, take2)
    assert run_pipe(p, spark) == 3  # take2: 1+2

    # leftmost wins ties: two sinks terminating at the same seq
    take2_max = limited_sink(fold("v", how="max"), 2)
    p2 = source_list(range(1, 11)) | alt_sink_n(full, take2_max, take2)
    assert run_pipe(p2, spark) == 2  # take2_max (max of 1,2), left of take2

    # none terminates early -> leftmost overall
    p3 = source_list([1, 2]) | alt_sink_n(
        fold("v", how="sum"),
        limited_sink(fold("v", how="sum"), 5),
        limited_sink(fold("v", how="max"), 7))
    assert run_pipe(p3, spark) == 3


# --- streaming replay law ----------------------------------------------------
def test_stream_replay_law_equals_batch(spark, sf_dir):
    from conduino_spark.streaming import (
        SENTINEL_TYPE, file_stream_source, run_stream_to_memory,
        stage_events_dir)

    d = stage_events_dir(f"{sf_dir}/events.parquet", n_chunks=3,
                         sentinel_hours=4.0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    win = event_window("ts", "1 hour", keys=["event_type"],
                       aggs={"n": F.count(F.lit(1))}, watermark="2 hours")
    out = run_stream_to_memory(file_stream_source(d, schema) | win, spark)
    srows = sorted(
        tuple(r) for r in
        out.where(F.col("event_type") != SENTINEL_TYPE)
           .select(F.col("w_start").cast("long"), "event_type", "n")
           .collect())

    # ts has arrived as nanos-long, timestamp, and timestamp_ntz across
    # driver regenerations — normalize to epoch seconds dtype-robustly
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        t = F.col("ts") / 1_000_000_000
    else:
        from conduino_spark.timeutil import epoch_seconds
        t = epoch_seconds("ts")
    batch = (ev.groupBy((F.floor(t / 3600) * 3600).cast("long").alias("w"),
                        "event_type")
               .agg(F.count(F.lit(1)).alias("n")))
    brows = sorted(tuple(r) for r in batch.collect())
    assert srows == brows


# --- repetition_stats (Gopher-style corpus filters) --------------------------
REP_COLS = ["dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
            "symbol_word_ratio", "mean_word_len", "alpha_word_frac"]


def _rep_rows(spark, df):
    from conduino_spark.operators.text import repetition_stats
    out = repetition_stats()(df).select("doc_id", *REP_COLS)
    return {r[0]: tuple(round(float(x), 6) for x in r[1:])
            for r in out.collect()}


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, 'dup dup' twice (7 chars each); 14 of 24 line
            # chars duplicated; top 2-gram 'dup dup' (cnt 2, len 7)
            (0, "dup dup\nuniq one\ndup dup\nxy"),
            (1, None),                          # NULL text -> all zeros
            (2, ""),                            # empty -> all zeros
            (3, "solo"),                        # 1 token: no grams
            (4, "a b # c ... d …"),             # 3 symbol marks, 4 words
        ],
        "doc_id long, text string")
    got = _rep_rows(spark, df)

    d0 = got[0]
    assert d0[0] == round(1 - 3 / 4, 6)                  # dup_line_frac
    assert d0[1] == round(14 / 24, 6)                    # dup chars
    # tokens: dup dup uniq one dup dup xy -> joined len 27; cnt=2,len=7
    assert d0[2] == round(2 * 7 / 27, 6)
    assert got[1] == (0.0,) * 6
    assert got[2] == (0.0,) * 6
    assert got[3][2] == 0.0                              # no 2-grams
    assert got[4][3] == round(3 / 4, 6)                  # symbol/word


def test_repetition_stats_matches_duckdb(spark, sf_dir):
    import duckdb
    from conduino_spark.operators.text import repetition_stats_sql

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rep_rows(spark, df)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = {r[0]: tuple(round(float(x), 6) for x in r[1:])
            for r in con.sql(repetition_stats_sql()).fetchall()}
    assert got == want


def test_repetition_stats_unicode_edges_match_duckdb(spark):
    import duckdb
    from conduino_spark.operators.text import repetition_stats_sql

    rows = [
        (0, "héllo wörld héllo wörld\nhéllo wörld"),   # accents, dup line
        (1, "日本語のテキスト 日本語のテキスト"),        # CJK: no ascii tokens
        (2, "emoji 😀😀 test emoji 😀 test"),           # surrogate pairs
        (3, "  \t  \n\n   \n"),                        # whitespace only
        (4, "MiXeD CaSe MIXED case mixed CASE"),
        (5, "a b c d"),                      # nbsp / em-space
        (6, "tab\tsep\ttab\tsep"),
        (7, "x" * 5000),                               # one huge token
        (8, "dup dup dup dup dup dup dup dup"),        # single-token runs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rep_rows(spark, df)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: tuple(round(float(x), 6) for x in r[1:])
            for r in con.sql(repetition_stats_sql()).fetchall()}
    assert got == want
