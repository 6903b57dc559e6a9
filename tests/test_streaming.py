"""Streaming tests (SURVEY §5.3): incremental-equivalence — batch result
== concatenated micro-batch outputs (the feedPipe law,
Data/Conduino.hs:245-257) — plus watermarked windowed aggs and stateful
streaming mapAccum."""

import shutil

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    event_window, filter_, map_, run_pipe, sink_df, sink_list, source_list,
    read_table, scan,
)
from conduino_spark.plans.core import SEQ, Source
from conduino_spark.streaming import (
    feed_pipe, file_stream_source, map_accum_stream, run_stream_to_memory,
    stage_events_dir,
)

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def test_feed_pipe_law_stateless(spark):
    # batch output == concat of micro-batch outputs for stateless stages
    stage = filter_("v % 2 = 0") | map_(F.col("v") * 10, name="x10")
    batches = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10]]
    _, flat = feed_pipe(stage, batches, spark)
    whole = run_pipe(source_list(range(1, 11)) | stage | sink_list(), spark)
    assert flat == whole == [20, 40, 60, 80, 100]


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    d = stage_events_dir(f"{sf_dir}/events.parquet", n_chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_window_equals_batch(spark, sf_dir, events_stream_dir):
    win = event_window("ts", "1 hour", keys=["event_type"],
                       aggs={"n": F.count(F.lit(1))}, watermark="2 hours")
    src = file_stream_source(events_stream_dir, EVENTS_SCHEMA)
    stream_out = run_stream_to_memory(src | win, spark, mode="append")
    srows = {(r["w_start"], r["event_type"]): r["n"] for r in stream_out.collect()}

    batch_src = read_table(sf_dir, "events")
    bdf = run_pipe(batch_src | win | sink_df(), spark)
    brows = {(r["w_start"], r["event_type"]): r["n"] for r in bdf.collect()}
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch result, and most windows must emit
    assert srows, "stream produced no windows"
    assert all(srows[k] == brows[k] for k in srows)
    assert len(srows) >= len(brows) - 8  # tail windows may be held back


def test_map_accum_stream_state_across_batches(spark, events_stream_dir):
    # per-user running count, state carried across 4 micro-batches
    def step(v, s):
        return s + 1, s + 1

    src = file_stream_source(events_stream_dir, EVENTS_SCHEMA)
    pre = map_({"v": F.col("value")}, name="v") \
        if False else None  # keep columns: use select below

    def prep(df):
        return df.select(F.col("event_id").alias(SEQ),
                         F.col("user_id"), F.col("value").alias("v"))

    from conduino_spark.plans.core import Stage
    stage = Stage(prep, name="prep") | map_accum_stream(
        step, 0, key_col="user_id", returns="long")
    out = run_stream_to_memory(src | stage, spark, mode="append")
    rows = out.collect()
    assert rows, "no streaming output"
    # final per-key count == batch per-key count
    got = {}
    for r in rows:
        got[r["key"]] = max(got.get(r["key"], 0), r["v"])
    batch = (spark.read.parquet(events_stream_dir)
             .groupBy("user_id").agg(F.count("*").alias("n")))
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    assert got == want


def test_socket_source_stdin_lines_composition(spark):
    # socket = the reference's stdin console source (Combinators.hs:228-243);
    # stdinLines = lines until the first blank (Combinators.hs:235-243)
    import socket
    import threading
    import time

    from conduino_spark import from_dataframe, run_pipe, sink_list, take_while
    from conduino_spark.streaming import socket_source

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    lines = ["alpha", "beta", "", "gamma"]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(("\n".join(lines) + "\n").encode())
        time.sleep(8)  # keep the connection open until the query stops
        conn.close()
        srv.close()

    threading.Thread(target=serve, daemon=True).start()

    name = f"sock_{port}"
    q = (socket_source("127.0.0.1", port).df(spark)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 40
    while time.time() < deadline and spark.table(name).count() < len(lines):
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    got = [r["line"] for r in spark.table(name).collect()]
    assert sorted(got) == sorted(lines), f"socket lines lost: {got}"

    # stdinLines composition over the drained stream (arrival order)
    bounded = from_dataframe(
        spark.createDataFrame(list(enumerate(got)), "i long, line string"),
        seq_col="i")
    out = run_pipe(bounded | take_while("line != ''")
                   | map_({"line": F.col("line")}) | sink_list(col="line"), spark)
    want = []
    for ln in got:
        if ln == "":
            break
        want.append(ln)
    assert out == want


def test_map_accum_stream_tws_path(spark, events_stream_dir):
    # transformWithStateInPandas is the preferred Spark-4 backend; it
    # hard-depends on protobuf which this container lacks — SKIP (not
    # silently pass) so the path gets coverage the moment the dep lands.
    pytest.importorskip("google.protobuf")

    def step(v, s):
        return s + 1, s + 1

    def prep(df):
        return df.select(F.col("event_id").alias(SEQ),
                         F.col("user_id"), F.col("value").alias("v"))

    from conduino_spark.plans.core import Stage
    src = file_stream_source(events_stream_dir, EVENTS_SCHEMA)
    stage = Stage(prep, name="prep") | map_accum_stream(
        step, 0, key_col="user_id", returns="long", api="tws")
    out = run_stream_to_memory(src | stage, spark, mode="append")
    rows = out.collect()
    assert rows, "no streaming output"
    got = {}
    for r in rows:
        got[r["key"]] = max(got.get(r["key"], 0), r["v"])
    batch = (spark.read.parquet(events_stream_dir)
             .groupBy("user_id").agg(F.count("*").alias("n")))
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    assert got == want


def test_stream_stream_join_matches_batch(spark, events_stream_dir):
    # watermarked stream-stream join == the equivalent batch join
    from conduino_spark.plans.core import Stage
    from conduino_spark.streaming import stream_stream_join

    def side(event_type):
        src = file_stream_source(events_stream_dir, EVENTS_SCHEMA)
        return src | Stage(lambda df, t=event_type: df.where(F.col("event_type") == t),
                           name=event_type)

    j = stream_stream_join(side("click"), side("purchase"), on="user_id",
                           left_time="ts", right_time="ts",
                           lookback="30 minutes", watermark="2 hours",
                           right_cols={"p_event": "event_id"})
    out = run_stream_to_memory(j, spark, mode="append")
    got = out.select("event_id", "p_event").count()

    ev = spark.read.parquet(events_stream_dir)
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id",
                                                     F.col("ts").alias("lt"))
    buys = ev.where("event_type = 'purchase'").select(
        F.col("user_id").alias("bu"), F.col("ts").alias("rt"),
        F.col("event_id").alias("p_event"))
    want = clicks.join(
        buys, (F.col("user_id") == F.col("bu"))
        & (F.col("rt") <= F.col("lt"))
        & (F.col("rt") >= F.col("lt") - F.expr("interval 30 minutes"))).count()
    assert got == want and want > 0


def test_stream_dedup_matches_batch_distinct(spark, events_stream_dir):
    from conduino_spark.streaming import stream_dedup
    # duplicate keys across micro-batches: user_id+event_type pairs
    src = file_stream_source(events_stream_dir, EVENTS_SCHEMA)
    # events span ~30 days: a 60-day watermark keys the whole replay, so
    # watermark-bounded dedup == global dedup here (shorter delays only
    # dedup within the horizon — the state-bounding trade-off)
    st = stream_dedup(["user_id", "event_type"], watermark_col="ts",
                      delay="60 days")
    out = run_stream_to_memory(src | st, spark, mode="append")
    got = out.select("user_id", "event_type").distinct().count()
    n_out = out.count()
    want = (spark.read.parquet(events_stream_dir)
            .select("user_id", "event_type").distinct().count())
    # every surviving row unique; count equals the batch distinct count
    assert got == n_out == want


def test_stream_funnel_replay_equals_batch(spark, sf_dir):
    """In-order replay law: the streaming funnel over a ts-ordered
    chunked replay equals the batch funnel (same greedy semantics,
    same micros/1e6 times)."""
    from conduino_spark import from_dataframe, funnel, run_pipe, sink_df
    from conduino_spark.sources import read_table
    from conduino_spark.streaming import (
        file_stream_source, run_stream_to_memory, stage_events_dir,
        stream_funnel)

    steps = ["signup", "click", "purchase"]
    d = stage_events_dir(f"{sf_dir}/events.parquet", n_chunks=3)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = run_stream_to_memory(
        file_stream_source(d, schema) | stream_funnel(steps), spark)
    got = sorted((r.key, r.t1, r.t2, r.t3) for r in out.collect())

    ev = read_table(sf_dir, "events").df(spark)
    batch = run_pipe(from_dataframe(ev) | funnel(steps) | sink_df(), spark)
    want = sorted((r.user_id, r.t1, r.t2, r.t3) for r in batch.collect())
    assert got == want

    import pytest as _pytest
    with _pytest.raises(ValueError):
        stream_funnel([])
