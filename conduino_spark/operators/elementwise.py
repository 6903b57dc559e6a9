"""Element-wise pipes: projection / selection / flatten (SURVEY §2.4).

Fast path = Column expressions (JVM-side, whole-stage codegen).  Python
callables are accepted but compiled to vectorized Arrow ``pandas_udf``,
never row-at-a-time UDFs (the reference's per-element functions are the
UDF surface, SURVEY §2.7 tail).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from conduino_spark.plans.core import SEQ, Stage

ExprLike = Union[Column, str]


def _as_pandas_udf(fn: Callable, returns: str):
    @pandas_udf(returns)
    def _u(s: pd.Series) -> pd.Series:
        return s.map(fn)
    return _u


def map_(expr: Union[ExprLike, Mapping[str, ExprLike], Callable],
         *, returns: str = "double", name: str = "map") -> Stage:
    """``map`` (Combinators.hs:324-326) — projection.

    * Column / expression string → ``select`` (codegen fast path);
      result column named ``v``.
    * mapping {out_name: expr} → multi-column projection.
    * Python callable → Arrow-vectorized pandas_udf over column ``v``
      (``returns`` = Spark type string).
    """
    if callable(expr) and not isinstance(expr, Column):
        udf = _as_pandas_udf(expr, returns)

        def fn(df: DataFrame) -> DataFrame:
            return df.withColumn("v", udf(F.col("v")))

        return Stage(fn, name=name)

    if isinstance(expr, Mapping):
        cols = [F.expr(e) .alias(k) if isinstance(e, str) else e.alias(k)
                for k, e in expr.items()]

        def fn(df: DataFrame) -> DataFrame:
            keep = [F.col(SEQ)] if SEQ in df.columns else []
            return df.select(*keep, *cols)

        return Stage(fn, name=name)

    col = F.expr(expr) if isinstance(expr, str) else expr

    def fn(df: DataFrame) -> DataFrame:
        keep = [F.col(SEQ)] if SEQ in df.columns else []
        return df.select(*keep, col.alias("v"))

    return Stage(fn, name=name)


def map_m(fn: Callable, *, returns: str = "double", name: str = "map_m") -> Stage:
    """``mapM`` (Combinators.hs:329-331) — effectful per-element map.
    Effects run inside the executor Python worker (Arrow batches)."""
    return map_(fn, returns=returns, name=name)


def with_columns(exprs: Mapping[str, ExprLike], *, name: str = "with_columns") -> Stage:
    """Projection that KEEPS existing columns (passthrough-flavored map;
    cf. ``passthrough`` Data/Conduino.hs:409-420)."""
    def fn(df: DataFrame) -> DataFrame:
        out = df
        for k, e in exprs.items():
            out = out.withColumn(k, F.expr(e) if isinstance(e, str) else e)
        return out
    return Stage(fn, name=name)


def filter_(pred: Union[ExprLike, Callable], *, name: str = "filter") -> Stage:
    """``filter`` (Combinators.hs:443-447) — selection.  Column predicate
    pushes down to the scan; callables go through pandas_udf."""
    if callable(pred) and not isinstance(pred, Column):
        udf = _as_pandas_udf(pred, "boolean")
        return Stage(lambda df: df.where(udf(F.col("v"))), name=name)
    cond = F.expr(pred) if isinstance(pred, str) else pred
    return Stage(lambda df: df.where(cond), name=name)


def concat_map(expr: Union[ExprLike, Callable], *, returns: str = "array<double>",
               name: str = "concat_map") -> Stage:
    """``concatMap`` (Combinators.hs:451-456) — flatMap/UDTF.

    Maps each element to a container and flattens: implemented as
    ``explode`` of an array expression (JVM) or of a pandas_udf-produced
    array.  Output ``__seq`` is re-derived as (parent_seq, position)
    packed into one long so downstream ordered ops still work.
    """
    if callable(expr) and not isinstance(expr, Column):
        col = _as_pandas_udf(expr, returns)(F.col("v"))
    else:
        col = F.expr(expr) if isinstance(expr, str) else expr

    def fn(df: DataFrame) -> DataFrame:
        out = df.select(F.col(SEQ).alias("__pseq"), F.posexplode(col).alias("__pos", "v"))
        # dense enough packing: 2^20 elements per parent
        return out.select(
            (F.col("__pseq") * (1 << 20) + F.col("__pos")).alias(SEQ), "v")

    return Stage(fn, name=name, seq_preserving=False)


def concat(*, name: str = "concat") -> Stage:
    """``concat`` (Combinators.hs:460-462) — flatten stream of containers."""
    def fn(df: DataFrame) -> DataFrame:
        out = df.select(F.col(SEQ).alias("__pseq"),
                        F.posexplode(F.col("v")).alias("__pos", "v"))
        return out.select(
            (F.col("__pseq") * (1 << 20) + F.col("__pos")).alias(SEQ), "v")
    return Stage(fn, name=name, seq_preserving=False)


def iter_m(aggs: Optional[Sequence[Column]] = None, *, observation=None,
           name: str = "iter_m") -> Stage:
    """``iterM`` (Combinators.hs:337-339) — side-effect tap, element
    passed through unchanged.  Spark-first: ``df.observe`` metrics (the
    effect is an accumulator, read after the action; cf. Writer mapping
    SURVEY §2.6)."""
    def fn(df: DataFrame) -> DataFrame:
        if observation is not None and aggs:
            return df.observe(observation, *aggs)
        return df
    return Stage(fn, name=name)
