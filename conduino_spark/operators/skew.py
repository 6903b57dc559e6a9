"""Skew mitigation for hot join/aggregation keys (SURVEY 'optimize for
scale': skewed keys → salting or AQE skew-join).

AQE's skew-join handles sort-merge skew automatically (enabled in
get_spark); explicit salting is for the cases AQE can't fix — skewed
AGGREGATION keys and skewed broadcast-probe sides — and for engines of
record where the hot keys are known a priori.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Source, Stage

ExprLike = Union[Column, str]


def _expr(e: ExprLike) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def salted_group_agg(keys: Sequence[str], aggs: Mapping[str, ExprLike], *,
                     salt: int = 16,
                     combine: Optional[Mapping[str, str]] = None) -> Stage:
    """Two-phase aggregation for skewed keys: add a random salt to the
    grouping key, aggregate (spreads a hot key over ``salt`` reducers),
    then aggregate again without the salt.

    ``aggs`` must be re-combinable; ``combine`` maps each output column
    to its recombiner (default: sum for sum/count, min/max for min/max).
    Only needed when ONE key dominates; Spark's map-side partial
    aggregation already handles moderate skew.
    """
    cols = [_expr(e).alias(k) for k, e in aggs.items()]
    combine = combine or {}

    recomb = {
        "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
    }

    def fn(df: DataFrame) -> DataFrame:
        d = df.drop(SEQ) if SEQ in df.columns else df
        salted = d.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        phase1 = salted.groupBy(*keys, "__salt").agg(*cols)
        final = [
            recomb[combine.get(k, "sum")](F.col(k)).alias(k) for k in aggs
        ]
        return phase1.groupBy(*keys).agg(*final)

    return Stage(fn, name="salted_group_agg", seq_preserving=False)


def salted_join(other: Source, left_key: str, right_key: str, *,
                salt: int = 8, how: str = "inner") -> Stage:
    """Skewed equi-join by key replication: the left (skewed) side gets
    a random salt in [0, salt); the right side is replicated ``salt``
    times with every salt value.  The join key becomes
    (key, salt) — a hot left key now spreads over ``salt`` tasks.

    Use when AQE's skew-join can't help (e.g. the right side is too big
    to broadcast but small enough to replicate ``salt×``)."""

    def fn(df: DataFrame) -> DataFrame:
        left = (df.drop(SEQ) if SEQ in df.columns else df) \
            .withColumn("__salt", (F.rand(seed=42) * salt).cast("int")) \
            .alias("__sl")
        r = other.df(df.sparkSession)
        r = r.drop(SEQ) if SEQ in r.columns else r
        right = r.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))) \
            .alias("__sr")
        # qualify both the keys and __salt: with same-named key columns a
        # bare F.col(key) is ambiguous (r1 ADVICE).
        out = left.join(
            right,
            (F.col(f"__sl.{left_key}") == F.col(f"__sr.{right_key}")) &
            (F.col("__sl.__salt") == F.col("__sr.__salt")),
            how)
        return out.drop(F.col("__sl.__salt")).drop(F.col("__sr.__salt"))

    return Stage(fn, name="salted_join", seq_preserving=False)
