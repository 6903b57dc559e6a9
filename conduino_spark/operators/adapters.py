"""Small parity adapters completing the SURVEY §2.1 inventory:
trimapPipe/mapInput/mapOutput (Internal.hs:208-256), awaitForeverWith
(Data/Conduino.hs:162-171), squeezePipe (Data/Conduino.hs:265-296),
toListT/withSource interop (Data/Conduino.hs:540-591), and the
early-terminating sink wrapper that makes altSink's race observable
(Data/Conduino.hs:664-670)."""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Mapping, Optional, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Sink, Source, Stage


def map_input(exprs: Mapping[str, Union[Column, str]], stage: Stage) -> Stage:
    """``mapInput`` (Internal.hs:242-244): contramap a stage's input —
    a projection adapter applied before the stage."""
    from conduino_spark.operators.elementwise import map_
    pre = map_(exprs, name="map_input")
    return Stage(lambda df: stage(pre(df)),
                 name=f"map_input({stage.name})",
                 seq_preserving=stage.seq_preserving)


def map_output(exprs: Mapping[str, Union[Column, str]], stage: Stage) -> Stage:
    """``mapOutput`` (Internal.hs:249-251): map a stage's output —
    a projection adapter applied after the stage."""
    from conduino_spark.operators.elementwise import map_
    post = map_(exprs, name="map_output")
    return Stage(lambda df: post(stage(df)),
                 name=f"map_output({stage.name})",
                 seq_preserving=stage.seq_preserving)


def trimap_pipe(in_exprs: Optional[Mapping], out_exprs: Optional[Mapping],
                stage: Stage) -> Stage:
    """``trimapPipe`` (Internal.hs:208-215) minus the ``u``-channel
    (driver-side, SURVEY §1.3): input + output adapters at once."""
    s = stage
    if in_exprs:
        s = map_input(in_exprs, s)
    if out_exprs:
        s = map_output(out_exprs, s)
    return s


def await_forever_with(stage: Stage, tail: Source) -> Stage:
    """``awaitForeverWith`` (Data/Conduino.hs:162-171): transform every
    element; on upstream termination, switch to ``tail`` — the
    transformed stream followed by the termination-triggered source,
    with ``__seq`` offset to keep the order total."""

    def fn(df: DataFrame) -> DataFrame:
        out = stage(df)
        off = out.agg((F.coalesce(F.max(SEQ), F.lit(-1)) + 1).alias("__off"))
        t = tail.df(df.sparkSession)
        shifted = (t.crossJoin(F.broadcast(off))
                     .withColumn(SEQ, F.col(SEQ) + F.col("__off"))
                     .drop("__off"))
        return out.unionByName(shifted, allowMissingColumns=False)

    return Stage(fn, name=f"await_forever_with({stage.name})",
                 seq_preserving=False)


def squeeze_pipe(stage: Stage, spark: SparkSession, *,
                 inputs: Iterable[Any] = ()) -> tuple[list, Callable]:
    """``squeezePipe`` (Data/Conduino.hs:265-271): extract all output
    producible from the inputs seen so far; return (outputs,
    continuation) where the continuation accepts the next element.
    Built on feed_pipe's micro-batch replay (stateless stages; stateful
    streaming state lives in streaming.map_accum_stream)."""
    from conduino_spark.streaming import feed_pipe

    seen = list(inputs)

    def step(next_input: Any) -> tuple[list, Callable]:
        seen.append(next_input)
        outs, _ = feed_pipe(stage, [seen], spark)
        return outs[0], step

    outs, _ = feed_pipe(stage, [seen] if seen else [[]], spark)
    return outs[0], step


def to_local_iterator(src: Source, spark: SparkSession, *,
                      col: str = "v") -> Iterator[Any]:
    """``toListT`` (Data/Conduino.hs:540-548): consume a source one
    element at a time on the driver without materializing it."""
    df = src.df(spark)
    cols = [c for c in df.columns if c != SEQ]
    for row in df.orderBy(SEQ).select(*cols).toLocalIterator():
        yield row[0] if cols == [col] else tuple(row)


def with_source(src: Source, handler: Callable[[Any], Any],
                spark: SparkSession, *, col: str = "v") -> list:
    """``withSource`` (Data/Conduino.hs:582-591): run a source with a
    per-element handler; returns the handler results."""
    return [handler(x) for x in to_local_iterator(src, spark, col=col)]


def limited_sink(inner: Sink, n: int) -> Sink:
    """A sink that finishes after consuming n elements (``take n .|
    sink`` as a sink value) — carries ``termination_seq`` so
    ``alt_sink`` can race it against a full-stream fold
    (Data/Conduino.hs:664-670; FIXTURES.md multi_sink)."""

    def term(df: DataFrame) -> Optional[int]:
        # nth seq as ONE aggregated row (r14: the old limit(n).collect
        # pulled n seq values to the driver just to read the last one).
        # r15: guard with a count first — orderBy().limit(n) plans a
        # TakeOrderedAndProject whose per-partition top-n buffer is
        # sized by n, NOT by the data; a sentinel n like 10**9 ("never
        # terminates early") burned ~18 min of single-task CPU on a
        # 1k-row input.  count() is column-pruned (parquet metadata
        # cheap) and n > count means "never terminates" — identical
        # result, and the sort-limit only ever runs with n <= rows.
        if df.select(SEQ).count() < n:
            return None
        row = (df.select(SEQ).orderBy(SEQ).limit(n)
                 .agg(F.max(SEQ).alias("m"),
                      F.count(F.lit(1)).alias("c")).collect()[0])
        return row["m"] if row["c"] == n else None

    def run(df: DataFrame):
        from conduino_spark.operators.segments import take
        return inner.run(take(n)(df))

    return Sink(run, name=f"limited({inner.name},{n})", termination_seq=term)
