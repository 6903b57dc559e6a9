"""Round-2 regression tests: the r1 VERDICT/ADVICE findings.

Each test pins a specific defect found by the round-1 review:
  * scan('count') chunked offsets (ADVICE high)
  * consecutive() chunked plan == window plan (VERDICT wrong #1)
  * concat_map __seq packing overflow (VERDICT wrong #2)
  * cache-registry release after a materializing run (VERDICT wrong #3)
  * salted_join with same-named key columns (ADVICE low)
"""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    SEQ, Stage, concat_map, consecutive, from_dataframe, range_source,
    release_caches, run_pipe, salted_join, scan, sink_df, sink_list,
    source_list,
)


# --- scan('count') chunked (ADVICE high) -----------------------------------
def test_scan_count_chunked_matches_window(spark):
    vals = [7.0] * 6
    chunked = run_pipe(source_list(vals) | scan("count") | sink_list(), spark)
    window = run_pipe(
        source_list(vals) | scan("count", strategy="window") | sink_list(), spark)
    assert chunked == window == [1, 2, 3, 4, 5, 6]


def test_scan_count_chunked_many_partitions(spark):
    # force several range partitions so phase-2 offsets actually combine
    p = range_source(100, num_partitions=8) | scan("count", npart=8) | sink_list()
    assert run_pipe(p, spark) == list(range(1, 101))


# --- consecutive chunked (VERDICT wrong #1) --------------------------------
def test_consecutive_chunked_matches_window(spark):
    src = range_source(50, num_partitions=7)
    chunked = run_pipe(src | consecutive(4, npart=5) | sink_list(), spark)
    window = run_pipe(src | consecutive(4, strategy="window") | sink_list(), spark)
    assert chunked == window
    # golden shape: empty prefix first, terminal window last
    assert chunked[0] == []
    assert chunked[-1] == [46, 47, 48, 49]


def test_consecutive_chunked_short_partitions(spark):
    # n larger than any single partition: the carry must recurse across
    # MULTIPLE preceding partitions' tails
    src = range_source(12, num_partitions=6)
    got = run_pipe(src | consecutive(5, npart=6) | sink_list(), spark)
    want = run_pipe(src | consecutive(5, strategy="window") | sink_list(), spark)
    assert got == want


def test_consecutive_no_global_window_over_data(spark):
    import io, contextlib
    df = run_pipe(range_source(100, num_partitions=4)
                  | consecutive(3) | sink_df(), spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # every data-bearing Window must be partitioned by __pid; the only
    # unpartitioned windows run over the npart-row tails table
    for frag in plan.split("Window")[1:]:
        header = frag.splitlines()[0]
        if "__pid" not in header and "__w" in header:
            pytest.fail(f"unpartitioned window over data rows: {header}")


# --- concat_map reseq (VERDICT wrong #2) -----------------------------------
def _shift_seq(bits: int) -> Stage:
    # simulate monotonically_increasing_id seqs at high partition ids
    return Stage(lambda df: df.withColumn(SEQ, F.col(SEQ) * (1 << bits)),
                 name="shift_seq")


def test_concat_map_rank_survives_sparse_parent_seqs(spark):
    # parent seqs in the pid<<33 regime (would overflow the old packing)
    p = (source_list([1.0, 2.0, 3.0])
         | _shift_seq(43)
         | concat_map(F.array(F.col("v"), F.col("v") + 0.5))
         | sink_list())
    assert run_pipe(p, spark) == [1.0, 1.5, 2.0, 2.5, 3.0, 3.5]


def test_concat_map_pack_overflow_raises(spark):
    p = (source_list([1.0, 2.0])
         | _shift_seq(43)
         | concat_map(F.array(F.col("v")), reseq="pack")
         | sink_list())
    with pytest.raises(Exception, match="overflow|raise_error|__seq"):
        run_pipe(p, spark)


def test_concat_map_pack_fast_path_still_works(spark):
    p = (source_list([1.0, 2.0])
         | concat_map(F.array(F.col("v"), -F.col("v")), reseq="pack")
         | sink_list())
    assert run_pipe(p, spark) == [1.0, -1.0, 2.0, -2.0]


# --- cache registry (VERDICT wrong #3) -------------------------------------
def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_materializing_run_releases_caches(spark):
    release_caches()
    spark.catalog.clearCache()
    for _ in range(2):  # back-to-back pipelines must not accumulate
        out = run_pipe(range_source(1000, num_partitions=4)
                       | scan("sum") | sink_list(), spark)
        assert len(out) == 1000
        assert _n_cached(spark) == 0, "pipeline leaked cached blocks"


def test_lazy_sink_keeps_caches_until_released(spark):
    release_caches()
    spark.catalog.clearCache()
    df = run_pipe(range_source(100, num_partitions=4)
                  | scan("sum") | sink_df(), spark)
    assert df.count() == 100          # caller's action uses the cache
    assert _n_cached(spark) > 0       # still alive for further actions
    release_caches()
    assert _n_cached(spark) == 0


# --- salted_join same-named keys (ADVICE low) ------------------------------
def test_salted_join_same_named_key(spark):
    left = spark.createDataFrame([(i % 3, i) for i in range(30)], "k int, a int")
    right = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k int, b string")
    p = from_dataframe(left) | salted_join(from_dataframe(right), "k", "k") | sink_df()
    out = run_pipe(p, spark)
    assert out.count() == 30
    assert out.where(F.col("b").isNull()).count() == 0


# --- typed-result source variants (VERDICT missing #3) ----------------------
def test_iterate_either_terminal_result(spark):
    from conduino_spark import Left, iterate_either

    # iterate doubling from 1 until > 50: yields 2..64? no — stops AT Left
    src, result = iterate_either(
        lambda x: Left(f"overflow:{x}") if x * 2 > 50 else x * 2, 1)
    assert result == "overflow:32"
    out = run_pipe(src | sink_list(), spark)
    assert out == [2, 4, 8, 16, 32]  # seed NOT yielded (reference golden)


def test_iterate_either_max_elems_gives_none(spark):
    from conduino_spark import iterate_either
    src, result = iterate_either(lambda x: x + 1, 0, max_elems=5)
    assert result is None
    assert run_pipe(src | sink_list(), spark) == [1, 2, 3, 4, 5]


def test_repeat_either_m_terminal_result(spark):
    from conduino_spark import Left, repeat_either_m
    it = iter([10, 20, 30, Left("done"), 40])
    src, result = repeat_either_m(lambda: next(it))
    assert result == "done"
    assert run_pipe(src | sink_list(), spark) == [10, 20, 30]


def test_feedback_pipe_either_provenance(spark):
    # stage sees provenance: halve fed-back values only, pass upstream
    # through doubled; upstream (False) rows must be distinguishable.
    from conduino_spark import feedback_pipe_either, source_list

    def fn(df):
        halved = (df.where(F.col("__fed_back") & (F.col("v") > 1))
                    .select(SEQ, (F.col("v") / 2).cast("long").alias("v")))
        seeded = (df.where(~F.col("__fed_back"))
                    .select(SEQ, (F.col("v") * 2).alias("v")))
        return seeded.unionByName(halved)

    out = feedback_pipe_either(Stage(fn, name="prov"), source_list([8]),
                               spark, max_iters=10)
    vals = sorted(r["v"] for r in out.collect())
    # round0: 8*2=16 (upstream), then fed back: 8, 4, 2, 1
    assert vals == [1, 2, 4, 8, 16]
