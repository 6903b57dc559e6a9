"""Effect/context layer — the Lift.hs mapping (SURVEY §2.6).

Reference semantics (src/Data/Conduino/Lift.hs:31-58): an effect on the
shared monad is GLOBAL across all stages; the ``runXP`` family
ENCAPSULATES it inside one stage.  Spark translation:

  global       = session-level context (conf, broadcast, accumulators)
  encapsulated = stage-local state / per-stage try-except / observe
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping, Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Sink, Source, Stage
from conduino_spark.operators.stateful import map_accum


# -- Reader (Lift.hs:324-343) -------------------------------------------

def reader_p(make_stage: Callable[[Any], Stage], env: Any) -> Stage:
    """``runReaderP``: a stage parameterized by a shared environment.
    Small env → closure literal; big env should go through
    ``spark.sparkContext.broadcast`` inside ``make_stage``."""
    st = make_stage(env)
    return Stage(st.fn, name=f"reader({st.name})", seq_preserving=st.seq_preserving)


def broadcast_env(spark: SparkSession, env: Any):
    """Explicit broadcast for large read-only environments (the 100 TB
    path for lookup tables used inside pandas UDFs)."""
    return spark.sparkContext.broadcast(env)


# -- Writer (Lift.hs:359-467) ---------------------------------------------

class WriterTap:
    """``runWriterP``: accumulate a monoidal log across a stage; the log
    is emitted only at termination (Lift.hs:351-356) — exactly Spark's
    ``df.observe`` contract (metrics readable after the action).

    >>> tap = WriterTap({"n": F.count(F.lit(1)), "s": F.sum("v")})
    >>> p = src | tap.stage() | sink
    >>> result = run_pipe(p, spark); log = tap.log()
    """

    def __init__(self, aggs: Mapping[str, Column]) -> None:
        self.obs = Observation()
        self.aggs = [c.alias(k) for k, c in aggs.items()]

    def stage(self) -> Stage:
        def fn(df: DataFrame) -> DataFrame:
            return df.observe(self.obs, *self.aggs)
        return Stage(fn, name="writer_tap")

    def log(self) -> dict:
        return dict(self.obs.get)


def exec_writer_p(src: Source, aggs: Mapping[str, Column],
                  sink: Sink, spark: SparkSession) -> tuple[Any, dict]:
    """``execWriterP`` convenience: run pipeline, return (result, log)."""
    tap = WriterTap(aggs)
    result = sink.run(tap.stage()(src.df(spark)))
    return result, tap.log()


# -- Except / Catch (Lift.hs:198-315) ---------------------------------------

ERR_COL = "__err"


def except_p(fn: Callable[[Any], Any], *, returns: str = "double",
             col: str = "v") -> Stage:
    """``runExceptP`` (Lift.hs:207-249): isolate failure to one stage.

    The per-element function runs under try/except inside an Arrow
    batch; output carries an Either-shaped pair of columns
    (``v``/NULL, ``__err``/NULL).  Use :func:`partition_errors` to split
    the dead-letter side output; a failing element terminates *its own
    value*, never the job (stage-isolated failure, as in the
    reference)."""

    def stage_fn(df: DataFrame) -> DataFrame:
        other = [c for c in df.columns if c != col]
        schema = ", ".join(
            [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in other]
            + [f"`{col}` {returns}", f"`{ERR_COL}` string"])

        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                vals, errs = [], []
                for x in pdf[col]:
                    try:
                        vals.append(fn(x))
                        errs.append(None)
                    except Exception as e:  # noqa: BLE001 — Either-shaped isolation
                        vals.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                out = pdf[other].copy()
                out[col] = vals
                out[ERR_COL] = errs
                yield out

        return df.mapInPandas(run, schema)

    return Stage(stage_fn, name="except_p")


def catch_p(fn: Callable[[Any], Any], handler: Callable[[Any, Exception], Any], *,
            returns: str = "double", col: str = "v") -> Stage:
    """``runCatchP`` (Lift.hs:284-315): runtime-exception handler —
    failing elements are REPLACED by handler(x, exc) instead of
    dead-lettered."""

    def stage_fn(df: DataFrame) -> DataFrame:
        other = [c for c in df.columns if c != col]
        schema = ", ".join(
            [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in other]
            + [f"`{col}` {returns}"])

        def run(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                vals = []
                for x in pdf[col]:
                    try:
                        vals.append(fn(x))
                    except Exception as e:  # noqa: BLE001
                        vals.append(handler(x, e))
                out = pdf[other].copy()
                out[col] = vals
                yield out

        return df.mapInPandas(run, schema)

    return Stage(stage_fn, name="catch_p")


def partition_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an except_p output into (ok, dead_letter)."""
    ok = df.where(F.col(ERR_COL).isNull()).drop(ERR_COL)
    dead = df.where(F.col(ERR_COL).isNotNull())
    return ok, dead


# -- State (Internal.hs:337-364, Lift.hs:116-188) ----------------------------

def run_state_p(step: Callable[[Any, Any], tuple[Any, Any]], seed: Any, *,
                returns: str = "double", col: str = "v") -> Stage:
    """``runStateP``: stage-local state, isolated from other stages —
    delegated to map_accum's ordered single pass (SURVEY §2.6 row 1).
    eval/exec flavors select the output/state component in ``step``."""
    return map_accum(step, seed, returns=returns, col=col)


def eval_state_p(step: Callable[[Any, Any], tuple[Any, Any]], seed: Any, *,
                 returns: str = "double", col: str = "v") -> Stage:
    """``evalStateP`` (Lift.hs:145-160): stateful stage, keep only the
    output stream (drop final state — which is driver-side anyway)."""
    return run_state_p(step, seed, returns=returns, col=col)


def exec_state_p(step: Callable[[Any, Any], Any], seed: Any,
                 df_values: list) -> Any:
    """``execStateP`` (Lift.hs:162-177): run the state transition over a
    driver-side stream, keep only the FINAL state.  (The output channel
    is discarded, so no cluster work is needed — this is the honest
    driver-side fold the reference also performs single-threaded.)"""
    s = seed
    for v in df_values:
        s = step(v, s)
    return s


def run_except_p_(fn: Callable[[Any], Any], *, returns: str = "double",
                  col: str = "v") -> Stage:
    """``runExceptP_`` (Lift.hs:251-272): like run_except_p but the
    error value is DISCARDED — failing elements simply vanish from the
    stream (no dead-letter column)."""
    inner = except_p(fn, returns=returns, col=col)

    def stage_fn(df: DataFrame) -> DataFrame:
        ok, _ = partition_errors(inner(df))
        return ok

    return Stage(stage_fn, name="run_except_p_")


def rws_p(env: Any, make_stage: Callable[[Any], Stage],
          aggs: Mapping[str, Column]) -> tuple[Stage, "WriterTap"]:
    """``rwsP`` (Lift.hs:483-590): reader+writer+state combined — the
    env parameterizes the (possibly stateful) stage, and a WriterTap
    observes the monoidal log.  Returns (stage, tap); read
    ``tap.log()`` after the action."""
    tap = WriterTap(aggs)
    inner = make_stage(env)
    return (Stage(lambda df: tap.stage()(inner(df)),
                  name=f"rws({inner.name})",
                  seq_preserving=inner.seq_preserving), tap)


# -- feedbackPipe (Data/Conduino.hs:429-462) ---------------------------------

def feedback_pipe(stage: Stage, src: Source, spark: SparkSession, *,
                  max_iters: int = 100,
                  until_empty: bool = True) -> DataFrame:
    """``feedbackPipe``: feed a stage's output back into its own input.

    No cycles in a Spark DAG (SURVEY §2.1) — this is the documented
    driver-side fixpoint loop (Pregel-style): iterate ``work =
    stage(work)`` collecting each round's output, stop on empty/maxed.
    Returns the union of every round's output (the duplicated-output
    law: feedbackPipe duplicates output downstream).  Each round is
    localCheckpointed to cut lineage growth — without it round k
    re-executes rounds 1..k-1."""
    return fixpoint_rounds(stage, src.df(spark), max_iters=max_iters,
                           until_empty=until_empty)


def fixpoint_rounds(stage: Stage, work: DataFrame, *,
                    max_iters: int = 100,
                    until_empty: bool = True) -> DataFrame:
    """The feedbackPipe driver loop over an already-materialized batch:
    iterate ``work = stage(work)``, localCheckpoint each round, return
    the union of every round's output.  Shared by :func:`feedback_pipe`
    (batch) and ``streaming.feedback_pipe_stream`` (per micro-batch)."""
    outs = []
    for _ in range(max_iters):
        work = stage(work).localCheckpoint(eager=True)
        if until_empty and work.isEmpty():
            break
        outs.append(work)
    if not outs:
        return work
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def feedback_pipe_either(stage: Stage, src: Source, spark: SparkSession, *,
                         max_iters: int = 100,
                         until_empty: bool = True,
                         tag_col: str = "__fed_back") -> DataFrame:
    """``feedbackPipeEither`` (Data/Conduino.hs:445-462): feedbackPipe
    whose stage SEES provenance — the reference's pipe receives
    ``Left i`` from upstream and ``Right o`` for its own fed-back
    output.  Spark mapping: the Either tag is a boolean input column
    ``tag_col`` (False = upstream, True = fed back); round 0 runs the
    stage over the tagged upstream batch, round k over round k-1's
    output tagged True.  Same driver-fixpoint relaxation as
    :func:`feedback_pipe` (SURVEY §2.1: rounds instead of the
    reference's per-element FIFO; output still duplicated downstream,
    localCheckpoint bounds lineage)."""
    work = src.df(spark).withColumn(tag_col, F.lit(False))
    outs = []
    for _ in range(max_iters):
        out = stage(work).localCheckpoint(eager=True)
        if until_empty and out.isEmpty():
            break
        outs.append(out)
        cols = [c for c in out.columns if c != tag_col]
        work = out.select(*cols).withColumn(tag_col, F.lit(True))
    if not outs:
        return stage(work).limit(0)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
