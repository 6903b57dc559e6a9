"""Adapters + interop + altSink race (SURVEY §2.1/§2.2 tail items)."""

from pyspark.sql import functions as F

from conduino_spark import (
    alt_sink, await_forever_with, filter_, fold, limited_sink, map_,
    map_input, map_output, run_pipe, sink_list, source_list, squeeze_pipe,
    to_local_iterator, trimap_pipe, with_source,
)


def test_map_input_output(spark):
    inner = filter_("v > 10")
    st = map_input({"v": F.col("v") * 10}, inner)
    p = source_list([1, 2, 3]) | st | sink_list()
    assert run_pipe(p, spark) == [20, 30]

    st2 = map_output({"v": -F.col("v")}, filter_("v % 2 = 0"))
    assert run_pipe(source_list([1, 2, 3, 4]) | st2 | sink_list(), spark) == [-2, -4]

    st3 = trimap_pipe({"v": F.col("v") + 1}, {"v": F.col("v") * 100},
                      filter_("v > 2"))
    assert run_pipe(source_list([1, 2, 3]) | st3 | sink_list(), spark) == [300, 400]


def test_await_forever_with(spark):
    st = await_forever_with(map_(F.col("v") * 2, name="x2"), source_list([99, 98]))
    out = run_pipe(source_list([1, 2]) | st | sink_list(), spark)
    assert out == [2, 4, 99, 98]


def test_squeeze_pipe_incremental(spark):
    stage = filter_("v % 2 = 0") | map_(F.col("v") * 10, name="x10")
    outs, cont = squeeze_pipe(stage, spark, inputs=[1, 2])
    assert outs == [20]
    outs2, cont = cont(4)
    assert outs2 == [20, 40]


def test_local_iterator_interop(spark):
    src = source_list([3, 1, 4])
    assert list(to_local_iterator(src, spark)) == [3, 1, 4]
    assert with_source(src, lambda x: x + 1, spark) == [4, 2, 5]


def test_alt_sink_race_with_limited(spark):
    # FIXTURES.md multi_sink: take-3 sink finishes first, full fold second
    early = limited_sink(fold("v", how="sum"), 3)
    full = fold("v", how="sum")
    p = source_list(range(1, 11)) | alt_sink(full, early)
    assert run_pipe(p, spark) == 6  # early sink wins: 1+2+3
    # but when the "limited" sink needs more elements than exist,
    # it never terminates early -> left operand (full fold) wins
    p2 = source_list([1, 2]) | alt_sink(fold("v", how="sum"), limited_sink(fold("v", how="sum"), 5))
    assert run_pipe(p2, spark) == 3


def test_stdin_lines_stops_at_blank(spark):
    import io
    from conduino_spark import stdin_lines
    src = stdin_lines(stream=io.StringIO("one\ntwo\n\nthree\n"))
    assert run_pipe(src | sink_list(col="line"), spark) == ["one", "two"]


def test_lift_zip_values(spark):
    from conduino_spark import lift_zip_sink, lift_zip_source, zip_sink
    assert run_pipe(lift_zip_source(42) | sink_list(), spark) == [42]
    # pure-sink law (Data/Conduino.hs:651-653): zipSink p pure keeps p
    s = zip_sink(fold("v", how="sum"), lift_zip_sink("const"))
    assert run_pipe(source_list([1, 2, 3]) | s, spark) == (6, "const")


def test_fuse_both_maybe(spark):
    from conduino_spark import fuse_both_maybe, limited_sink
    src = source_list(range(1, 11))
    # full-stream sink: upstream result observed
    fbm = fuse_both_maybe(src, [F.count(F.lit(1)).alias("n")], fold("v", how="sum"))
    assert fbm.run(spark) == (10, 55)
    # early-terminating sink: upstream result None
    fbm2 = fuse_both_maybe(src, [F.count(F.lit(1)).alias("n")],
                           limited_sink(fold("v", how="sum"), 3))
    up, down = fbm2.run(spark)
    assert up is None and down == 6
