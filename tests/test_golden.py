"""Golden tests — the reference's doc examples are its only executable
spec (SURVEY §5, FIXTURES.md §A).  Exact ordered outputs, including the
edge semantics the survey calls out (boundary elements, empty-prefix
windows, seed exclusion, sequel composition).
"""

import operator

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    alt_sink, agg_sink, concat_map, concat_sources, consecutive, drop,
    drop_while, filter_, fold, fold_map, foldl, head_, iterate_source, last_,
    map_, map_accum, pairs, run_pipe, scan, sink_count, sink_list, source_list,
    take, take_while, zip_sink, zip_source,
)


def run(p, spark):
    return run_pipe(p, spark)


# --- scan (README.md:17-20, Combinators.hs:356-360) ---------------------
def test_scan_golden(spark):
    p = source_list(range(1, 11)) | scan("sum") | sink_list()
    assert run(p, spark) == [1, 3, 6, 10, 15, 21, 28, 36, 45, 55]


def test_scan_window_strategy(spark):
    p = source_list(range(1, 11)) | scan("sum", strategy="window") | sink_list()
    assert run(p, spark) == [1, 3, 6, 10, 15, 21, 28, 36, 45, 55]


def test_scan_min(spark):
    p = source_list([5, 3, 8, 1, 9]) | scan("min") | sink_list()
    assert run(p, spark) == [5, 3, 3, 1, 1]


# --- iterate (Combinators.hs:153-166) -----------------------------------
def test_iterate_excludes_seed(spark):
    p = iterate_source(lambda x: x + 1, 0, take=5) | sink_list()
    assert run(p, spark) == [1, 2, 3, 4, 5]


# --- pairs (Combinators.hs:374-378) --------------------------------------
def test_pairs_golden(spark):
    p = source_list(range(1, 6)) | pairs() | sink_list(col="pair")
    assert run(p, spark) == [(1, 2), (2, 3), (3, 4), (4, 5)]


def test_pairs_window_strategy(spark):
    p = source_list(range(1, 6)) | pairs(strategy="window") | sink_list(col="pair")
    assert run(p, spark) == [(1, 2), (2, 3), (3, 4), (4, 5)]


# --- consecutive (Combinators.hs:392-403) ---------------------------------
def test_consecutive_empty_prefix(spark):
    p = source_list(range(1, 7)) | consecutive(3) | sink_list()
    assert run(p, spark) == [[], [1], [1, 2], [1, 2, 3], [2, 3, 4], [3, 4, 5], [4, 5, 6]]


def test_consecutive_full_only(spark):
    p = source_list(range(1, 7)) | consecutive(3, full_only=True) | sink_list()
    assert run(p, spark) == [[1, 2, 3], [2, 3, 4], [3, 4, 5], [4, 5, 6]]


# --- take / sequel (Combinators.hs:416-422) -------------------------------
def test_take_then_sequel(spark):
    seg = take(3) | map_(F.col("v") * 2, name="x2")
    p = source_list(range(1, 9)) | (seg >> map_(-F.col("v"), name="neg")) | sink_list()
    assert run(p, spark) == [2.0, 4.0, 6.0, -4.0, -5.0, -6.0, -7.0, -8.0]


def test_take_alone(spark):
    p = source_list(range(1, 9)) | take(3) | sink_list()
    assert run(p, spark) == [1, 2, 3]


def test_take_more_than_stream(spark):
    p = source_list([1, 2]) | take(5) | sink_list()
    assert run(p, spark) == [1, 2]


# --- drop / sequel (Combinators.hs:523-527) -------------------------------
def test_drop_then_sequel_sink(spark):
    p = source_list(range(1, 9)) | (drop(3) >> sink_list())
    assert run(p, spark) == [4, 5, 6, 7, 8]


def test_drop_alone_yields_nothing(spark):
    p = source_list(range(1, 9)) | drop(3) | sink_list()
    assert run(p, spark) == []


# --- takeWhile / dropWhile boundary (Combinators.hs:432-440, 537-547) -----
def test_take_while_boundary_consumed_not_forwarded(spark):
    p = source_list(range(1, 9)) | take_while("v < 4") | sink_list()
    assert run(p, spark) == [1, 2, 3]


def test_take_while_sequel_starts_after_boundary(spark):
    p = source_list(range(1, 9)) | (take_while("v < 4") >> sink_list())
    # element 4 was consumed by takeWhile: sequel sees 5..8
    assert run(p, spark) == [5, 6, 7, 8]


def test_drop_while_boundary_dropped(spark):
    p = source_list(range(1, 9)) | (drop_while("v < 4") >> sink_list())
    assert run(p, spark) == [5, 6, 7, 8]


def test_take_while_all_pass(spark):
    p = source_list([1, 2, 3]) | take_while("v < 99") | sink_list()
    assert run(p, spark) == [1, 2, 3]
    p2 = source_list([1, 2, 3]) | (take_while("v < 99") >> sink_list())
    assert run(p2, spark) == []


# --- folds (Combinators.hs:480-509) ----------------------------------------
def test_fold_sum(spark):
    p = source_list(range(1, 11)) | fold("v", how="sum")
    assert run(p, spark) == 55


def test_fold_map_max(spark):
    p = source_list([3, 1, 4, 1, 5]) | fold_map("v", how="max")
    assert run(p, spark) == 5


def test_foldl_non_associative(spark):
    # order-dependent fold: build a string left-to-right
    p = source_list([1, 2, 3]) | foldl(lambda acc, v: acc + str(v), "")
    assert run(p, spark) == "123"


def test_empty_stream_edges(spark):
    src = source_list([])
    assert run(src | sink_list(), spark) == []
    assert run(src | last_(), spark) is None
    assert run(src | fold("v", how="sum", initial=0), spark) == 0


def test_last(spark):
    p = source_list([7, 8, 9]) | last_()
    assert run(p, spark) == 9


def test_head(spark):
    p = source_list([7, 8, 9]) | head_()
    assert run(p, spark) == 7


# --- map/filter/concatMap -------------------------------------------------
def test_map_filter(spark):
    p = (source_list(range(1, 11))
         | filter_("v % 2 = 0")
         | map_(F.col("v") * 10, name="x10")
         | sink_list())
    assert run(p, spark) == [20, 40, 60, 80, 100]


def test_map_python_callable(spark):
    p = source_list([1, 2, 3]) | map_(lambda x: x * x, returns="long") | sink_list()
    assert run(p, spark) == [1, 4, 9]


def test_concat_map(spark):
    p = (source_list([1, 2, 3])
         | concat_map(F.array_repeat(F.col("v"), F.col("v").cast("int")))
         | sink_list())
    assert run(p, spark) == [1, 2, 2, 3, 3, 3]


# --- zip algebra (Data/Conduino.hs:512-533, 654-670) -----------------------
def test_zip_source_stops_at_shorter(spark):
    a = source_list([1, 2, 3, 4])
    b = source_list([10, 20, 30, 40, 50, 60])
    p = zip_source(a, b) | sink_list(col="")
    rows = run(p, spark)
    assert rows == [(1, 10), (2, 20), (3, 30), (4, 40)]


def test_concat_sources(spark):
    p = concat_sources(source_list([1, 2]), source_list([3, 4, 5])) | sink_list()
    assert run(p, spark) == [1, 2, 3, 4, 5]


def test_source_rshift_is_concat(spark):
    p = (source_list([1, 2]) >> source_list([3])) | sink_list()
    assert run(p, spark) == [1, 2, 3]


def test_zip_sink_single_pass(spark):
    s = zip_sink(fold("v", how="sum"), sink_count())
    p = source_list(range(1, 11)) | s
    assert run(p, spark) == (55, 10)


def test_alt_sink_left_biased(spark):
    s = alt_sink(fold("v", how="sum"), fold("v", how="max"))
    p = source_list(range(1, 11)) | s
    assert run(p, spark) == 55


# --- mapAccum (Combinators.hs:344-353) --------------------------------------
def test_map_accum_general(spark):
    # non-associative: running alternating sum
    def step(v, s):
        sign, acc = s
        acc = acc + sign * v
        return ((-sign, acc), acc)

    p = (source_list([1, 2, 3, 4])
         | map_accum(step, (1, 0), returns="long")
         | sink_list())
    assert run(p, spark) == [1, -1, 2, -2]


def test_yield_then_iterate_composition(spark):
    # Data.Conduino haddock (Combinators.hs:160-166): iterate excludes
    # the seed; prepend it by source composition — (yield 0 >> iterate)
    from conduino_spark import iterate_source, source_list, take
    src = source_list([0]) >> iterate_source(lambda x: x + 1, 0, take=10)
    got = run_pipe(src | take(5) | sink_list(), spark)
    assert got == [0, 1, 2, 3, 4]
