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


#: packed reseq bounds: parent __seq < 2^42 and < 2^20 children/parent
#: keep ``pseq * 2^20 + pos`` inside a long.  monotonically_increasing_id
#: seqs (pid << 33) blow the parent bound once partition id ≥ ~512 — the
#: 100×-scale regime — so 'pack' FAILS LOUDLY instead of corrupting order.
_PACK_CHILD_BITS = 20
_PACK_PARENT_MAX = 1 << 42


def _reseq_exploded(out: DataFrame, reseq: str, op: str) -> DataFrame:
    """Derive the output ``__seq`` for (parent __seq, position) pairs.

    * ``'rank'`` (default): chunked dense re-rank (plans/order.rerank) —
      one range shuffle, correct at ANY parent seq / fan-out.
    * ``'pack'``: shuffle-free ``pseq*2^20+pos`` with a runtime bounds
      guard — for shuffle-sensitive pipelines whose parent seqs are
      known dense (e.g. a key-derived __seq), raises on overflow.
    """
    if reseq == "pack":
        packed = F.col("__pseq") * (1 << _PACK_CHILD_BITS) + F.col("__pos")
        guard = (F.col("__pseq") < _PACK_PARENT_MAX) & \
                (F.col("__pos") < (1 << _PACK_CHILD_BITS))
        seq = F.when(guard, packed).otherwise(
            F.raise_error(F.lit(
                f"{op}: packed __seq overflow (parent >= 2^42 or >= 2^20 "
                "children); use reseq='rank'")))
        return out.select(seq.alias(SEQ), "v")
    from conduino_spark.plans.order import rerank
    return rerank(out, ["__pseq", "__pos"]).select(SEQ, "v")


def concat_map(expr: Union[ExprLike, Callable], *, returns: str = "array<double>",
               reseq: str = "rank", name: str = "concat_map") -> Stage:
    """``concatMap`` (Combinators.hs:451-456) — flatMap/UDTF.

    Maps each element to a container and flattens: implemented as
    ``explode`` of an array expression (JVM) or of a pandas_udf-produced
    array.  Output ``__seq`` is re-derived from (parent __seq, position)
    via :func:`_reseq_exploded` so downstream ordered ops still work.
    """
    if callable(expr) and not isinstance(expr, Column):
        col = _as_pandas_udf(expr, returns)(F.col("v"))
    else:
        col = F.expr(expr) if isinstance(expr, str) else expr

    def fn(df: DataFrame) -> DataFrame:
        out = df.select(F.col(SEQ).alias("__pseq"), F.posexplode(col).alias("__pos", "v"))
        return _reseq_exploded(out, reseq, "concat_map")

    return Stage(fn, name=name, seq_preserving=False)


def concat(*, reseq: str = "rank", name: str = "concat") -> Stage:
    """``concat`` (Combinators.hs:460-462) — flatten stream of containers."""
    def fn(df: DataFrame) -> DataFrame:
        out = df.select(F.col(SEQ).alias("__pseq"),
                        F.posexplode(F.col("v")).alias("__pos", "v"))
        return _reseq_exploded(out, reseq, "concat")
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
