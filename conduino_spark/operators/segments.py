"""Terminating (segment) stages: take / drop / takeWhile / dropWhile.

Reference semantics (SURVEY §2.4, golden-tested):
  * ``take n``      (Combinators.hs:423-426) — pass n, terminate; the
    (n+1)th element is NOT consumed; sequel sees it.
  * ``takeWhile p`` (Combinators.hs:432-440) — pass until first failing
    element; the failing element IS consumed but NOT forwarded.
  * ``drop n``      (Combinators.hs:528-530) — consume+discard n,
    terminate yielding nothing.
  * ``dropWhile p`` (Combinators.hs:537-547) — discard while p; the
    first failing element is consumed AND dropped too.

Compilation: boundary predicates over ``__seq`` (SURVEY §4 item 2).
The boundary is computed as a 1-row aggregate DF and broadcast —
  * take n: nth smallest __seq → TakeOrderedAndProject (per-partition
    top-n then merge: scale-safe, no global sort);
  * takeWhile p: ``min(__seq) where NOT p`` → plain aggregate with
    map-side partial min.
No driver round-trip: everything stays one lazy Catalyst plan.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Stage
from conduino_spark.operators.elementwise import _as_pandas_udf


# orderBy().limit(n) plans a TakeOrderedAndProject whose per-partition
# top-n buffer is sized by n, NOT by the data — a sentinel-huge n (the
# limited_sink(…, 10**9) "never terminates early" idiom) burned ~18 min
# of single-task CPU on a 1k-row input.  Above this threshold _nth_seq
# pays ONE eager count to prove n exceeds the row count (boundary NULL,
# same value the lazy plan would produce) before risking the big-n sort.
_EAGER_GUARD_N = 50_000_000


def _nth_seq(df: DataFrame, n: int) -> DataFrame:
    """1-row DF (__b) = nth smallest __seq (NULL if fewer than n rows)."""
    if n <= 0:
        # consumed nothing: boundary below every seq — use min(seq)-1;
        # NULL would mean "consumed all", so synthesize -inf.
        return df.agg((F.min(SEQ) - F.lit(1)).alias("__b"))
    if n > _EAGER_GUARD_N and df.select(SEQ).count() < n:
        return df.sparkSession.range(1).select(
            F.lit(None).cast("long").alias("__b"))
    topn = df.select(SEQ).orderBy(SEQ).limit(n)
    cnt = topn.agg(F.max(SEQ).alias("__m"), F.count("*").alias("__c"))
    return cnt.select(F.when(F.col("__c") >= n, F.col("__m")).alias("__b"))


def take(n: int) -> Stage:
    """``take n``: boundary = seq of nth element (not consuming n+1th)."""

    def boundary(df: DataFrame):
        bdf = _nth_seq(df, n)
        passed = (df.crossJoin(F.broadcast(bdf))
                    .where(F.col("__b").isNull() | (F.col(SEQ) <= F.col("__b")))
                    .drop("__b"))
        return passed, bdf

    def fn(df: DataFrame) -> DataFrame:
        return boundary(df)[0]

    return Stage(fn, name=f"take({n})", boundary=boundary)


def drop(n: int) -> Stage:
    """``drop n``: yields NOTHING itself; sequel (``>>``) sees the rest
    (``drop 3 >> sinkList`` golden, Combinators.hs:523-527)."""

    def boundary(df: DataFrame):
        bdf = _nth_seq(df, n)
        passed = df.where(F.lit(False))
        return passed, bdf

    return Stage(lambda df: boundary(df)[0], name=f"drop({n})", boundary=boundary)


def _pred_col(pred: Union[Column, str, Callable]) -> Column:
    if callable(pred) and not isinstance(pred, Column):
        return _as_pandas_udf(pred, "boolean")(F.col("v"))
    return F.expr(pred) if isinstance(pred, str) else pred


def _first_failing_seq(df: DataFrame, cond: Column) -> DataFrame:
    """1-row DF (__b) = min __seq where NOT cond (NULL = none fail)."""
    return df.agg(F.min(F.when(~cond, F.col(SEQ))).alias("__b"))


def take_while(pred: Union[Column, str, Callable]) -> Stage:
    """``takeWhile p``: passes the prefix where p holds; the first
    failing element is consumed (boundary) but NOT forwarded."""
    def boundary(df: DataFrame):
        bdf = _first_failing_seq(df, _pred_col(pred))
        passed = (df.crossJoin(F.broadcast(bdf))
                    .where(F.col("__b").isNull() | (F.col(SEQ) < F.col("__b")))
                    .drop("__b"))
        return passed, bdf

    return Stage(lambda df: boundary(df)[0], name="take_while", boundary=boundary)


def drop_while(pred: Union[Column, str, Callable]) -> Stage:
    """``dropWhile p``: yields nothing; the first failing element is
    consumed AND dropped — the sequel starts strictly after it
    (FIXTURES.md boundary_preds: dropWhile (<4) >> rest over 1..8 ⇒
    rest sees [5,6,7,8])."""
    def boundary(df: DataFrame):
        bdf = _first_failing_seq(df, _pred_col(pred))
        return df.where(F.lit(False)), bdf

    return Stage(lambda df: boundary(df)[0], name="drop_while", boundary=boundary)
