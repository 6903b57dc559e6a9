"""Core pipeline algebra: the Spark-first re-expression of conduino's Pipe.

Reference semantics (cited into /root/reference):
  * ``Pipe i o u m a``       — src/Data/Conduino/Internal.hs:159
  * ``.|`` composition       — src/Data/Conduino.hs:316-337
  * ``runPipe``              — src/Data/Conduino.hs:210-215
  * monadic sequel (``>>``)  — src/Data/Conduino/Internal.hs:124-135

Design (SURVEY.md §7): we do NOT port coroutines.  A :class:`Stage` is a
``DataFrame -> DataFrame`` function plus metadata; ``|`` is function
composition producing ONE unresolved logical plan, and Catalyst /
WholeStageCodegen plays the role conduino's Church-encoded free monad
plays (operator fusion).  Execution boundaries (shuffles, codegen) are
inherited from Spark, not re-implemented.

The one global convention: an ordered stream is a DataFrame carrying a
``__seq`` long column (total order).  Sources attach it; ordered /
stateful operators (scan, pairs, consecutive, take/drop...) consume it;
pure relational stages ignore it.  At 100 TB the engine never builds a
global row_number — sources derive ``__seq`` from an existing key (or
file order) and boundary operators compute split points with
*aggregates + broadcast joins*, never with driver-side iteration.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the ordered-stream sequence column (SURVEY §1.3)
SEQ = "__seq"


def _identity(df: DataFrame) -> DataFrame:
    return df


class Stage:
    """One pipeline stage: ``DataFrame -> DataFrame`` + metadata.

    Mirrors ``Pipe i o u m a`` (Internal.hs:159) with roles by
    composition position instead of type instantiation.

    Metadata:
      * ``seq_preserving`` — stage emits exactly the input ``__seq``
        values it keeps (map/filter yes; explode/groupBy no).  Needed to
        compose segment stages (take/...) through elementwise stages.
      * ``boundary`` — for *terminating* stages (take/takeWhile/...):
        ``boundary(df) -> (passed_df, boundary_df)`` where boundary_df
        is a single-row DF with column ``__b`` = the greatest input
        ``__seq`` CONSUMED by the stage (NULL = consumed everything).
        The monadic sequel ``a >> b`` (Internal.hs:124-135) feeds ``b``
        the rows with ``__seq > __b``.
    """

    def __init__(
        self,
        fn: Callable[[DataFrame], DataFrame],
        *,
        name: str = "stage",
        seq_preserving: bool = True,
        boundary: Optional[Callable[[DataFrame], tuple[DataFrame, DataFrame]]] = None,
    ) -> None:
        self.fn = fn
        self.name = name
        self.seq_preserving = seq_preserving
        self._boundary = boundary

    # -- application ----------------------------------------------------
    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)

    def boundary(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        if self._boundary is None:
            raise TypeError(f"stage {self.name!r} never terminates; >> needs a "
                            "terminating left operand (take/drop/take_while/drop_while)")
        return self._boundary(df)

    @property
    def terminates(self) -> bool:
        return self._boundary is not None

    # -- composition: ``.|`` (Data/Conduino.hs:316) ---------------------
    def __or__(self, other: "Stage | Sink") -> "Stage | Sink":
        if isinstance(other, Sink):
            return other.premap(self)
        if not isinstance(other, Stage):
            return NotImplemented
        return _compose(self, other)

    # -- monadic sequel: ``>>`` (Internal.hs:124-135) --------------------
    def __rshift__(self, other: "Stage | Sink") -> "Stage | Sink":
        if not self.terminates:
            raise TypeError(f"{self.name!r} >> _: left operand never terminates")
        left = self

        if isinstance(other, Sink):
            # e.g. ``drop 3 >> sinkList`` (Combinators.hs:523-527):
            # sequel sink consumes the remainder of the input stream.
            def run(df: DataFrame) -> Any:
                passed, bdf = left.boundary(df)
                rest = _after_boundary(df, bdf)
                return other.run(rest)

            return Sink(run, name=f"({left.name} >> {other.name})",
                        materializes=other.materializes)

        def fn(df: DataFrame) -> DataFrame:
            passed, bdf = left.boundary(df)
            rest = _after_boundary(df, bdf)
            out = other(rest)
            # order is consistent by construction: every passed __seq is
            # strictly below every remainder __seq.
            return passed.unionByName(out, allowMissingColumns=False)

        return Stage(
            fn,
            name=f"({self.name} >> {other.name})",
            seq_preserving=self.seq_preserving and other.seq_preserving,
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Stage {self.name}>"


def _after_boundary(df: DataFrame, bdf: DataFrame) -> DataFrame:
    """Rows of ``df`` strictly after the consumed boundary.

    ``bdf`` is a 1-row DF ``(__b long)``; NULL __b means the stage
    consumed the whole stream (remainder empty).  Broadcast cross-join
    keeps this a single lazy plan — no driver round-trip, scale-safe.
    """
    b = F.broadcast(bdf)
    return (
        df.crossJoin(b)
        .where(F.col("__b").isNotNull() & (F.col(SEQ) > F.col("__b")))
        .drop("__b")
    )


def _compose(a: Stage, b: Stage) -> Stage:
    """Fuse two stages (``compPipe_``, Data/Conduino.hs:325-337).

    In Spark this is plain function composition — Catalyst fuses the
    resulting plan (WholeStageCodegen) exactly like compPipe_ fuses
    coroutines.  Boundary metadata composes when the seq algebra allows:

      * ``seg | elementwise``: boundary unchanged, passed transformed.
      * ``elementwise | seg`` (elementwise seq-preserving): boundary of
        the composite = boundary of ``seg`` over transformed input —
        valid because seq values survive the prefix unchanged.
      * ``seg | seg``: consumed boundary = least of the two (NULL =
        +inf: that side consumed all it saw).
    """
    fn = lambda df: b(a(df))
    name = f"({a.name} | {b.name})"
    seqp = a.seq_preserving and b.seq_preserving
    boundary = None

    if a.terminates and b.terminates:
        def boundary(df: DataFrame) -> tuple[DataFrame, DataFrame]:
            p1, b1 = a.boundary(df)
            p2, b2 = b.boundary(p1)
            bmin = (
                b1.withColumnRenamed("__b", "__b1")
                .crossJoin(b2.withColumnRenamed("__b", "__b2"))
                .select(F.least("__b1", "__b2").alias("__b"))
            )
            return p2, bmin
    elif a.terminates and b.seq_preserving:
        def boundary(df: DataFrame) -> tuple[DataFrame, DataFrame]:
            p, bdf = a.boundary(df)
            return b(p), bdf
    elif b.terminates and a.seq_preserving:
        def boundary(df: DataFrame) -> tuple[DataFrame, DataFrame]:
            return b.boundary(a(df))

    return Stage(fn, name=name, seq_preserving=seqp, boundary=boundary)


def identity_stage(name: str = "id") -> Stage:
    return Stage(_identity, name=name)


def fenced_where(df: DataFrame, cond) -> DataFrame:
    """Filter WITHOUT letting Catalyst substitute the condition through
    the projection below (r8).

    Spark's ``PushPredicateThroughNonJoin`` pushes any condition
    through a fully-deterministic Project by blind alias substitution —
    no cost guard, unlike ``CollapseProject`` — so a filter on a
    derived column of an expensive projection silently re-inlines the
    column's whole defining expression into an interpreted per-row
    predicate (measured 20x on corpus_filter's lambda-HOF metric
    chain, 2x on embedding_near_dup's cosine fold).  One
    nondeterministic projected field that the condition references
    makes the Project non-pushable: the expensive columns evaluate
    once in the projection and the filter tests plain attributes.

    Zero materialization, JVM-only, streaming-safe; the fence value is
    never observed (``rand() >= 0`` is a tautology — rand ∈ [0,1) —
    and Rand is non-foldable) and the column is dropped.  rand() over
    monotonically_increasing_id because the streaming checker rejects
    mid in streaming Projects while rand passes (verified empirically,
    Spark 4.1); both are Nondeterministic to Catalyst, which is all
    the fence needs.  Trade-off: downstream predicates cannot cross
    the fence to reach the scan either — use only ABOVE the
    cheap/pushable filters, on projections whose recompute
    dominates."""
    return (df.withColumn("__fence", F.rand())
              .where(cond & (F.col("__fence") >= 0))
              .drop("__fence"))


class Source:
    """A source: ``SparkSession -> DataFrame`` (``Pipe () o u m a``,
    Internal.hs:100-106).  Every source attaches ``__seq``.
    """

    def __init__(self, fn: Callable[[SparkSession], DataFrame], *, name: str = "source",
                 bounded: bool = True) -> None:
        self.fn = fn
        self.name = name
        self.bounded = bounded

    def df(self, spark: SparkSession) -> DataFrame:
        return self.fn(spark)

    def __or__(self, other: "Stage | Sink") -> "Source | Pipeline":
        if isinstance(other, Stage):
            return Source(lambda spark: other(self.fn(spark)),
                          name=f"({self.name} | {other.name})", bounded=self.bounded)
        if isinstance(other, Sink):
            return Pipeline(self, other)
        return NotImplemented

    # ``srcA >> srcB`` = exhaust A then B (ZipSource <|>,
    # Data/Conduino.hs:523-525): concatenation with __seq offset.
    def __rshift__(self, other: "Source") -> "Source":
        if not isinstance(other, Source):
            return NotImplemented
        from conduino_spark.operators.zip_alt import concat_sources
        return concat_sources(self, other)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Source {self.name}>"


class Sink:
    """A sink: ``DataFrame -> result`` (``Pipe i Void u m a``,
    Internal.hs:107-110).  ``run`` triggers the Spark action and returns
    the pipe's terminal result ``a`` to the driver.

    ``agg_cols``: when the sink is a pure aggregation (fold/sum/...),
    the list of Column expressions lets :func:`zip_sink` combine many
    sinks into ONE ``df.agg(...)`` pass (Data/Conduino.hs:654-660).
    ``termination_seq``: for early-terminating sinks (e.g. ``take n``
    composed in), a fn df -> Optional[int] giving the __seq at which the
    sink finishes — used by alt_sink's race (Data/Conduino.hs:664-670).
    ``materializes``: True when ``run`` performs the Spark action itself
    (collect/agg/write) — :class:`Pipeline` then releases registry-
    tracked caches afterwards.  ``sink_df`` sets False: it hands a LAZY
    DataFrame to the caller, whose action still needs the caches (the
    caller releases via ``conduino_spark.release_caches``).
    """

    def __init__(self, run: Callable[[DataFrame], Any], *, name: str = "sink",
                 agg_cols: Optional[list] = None,
                 agg_finish: Optional[Callable[[Any], Any]] = None,
                 termination_seq: Optional[Callable[[DataFrame], Optional[int]]] = None,
                 materializes: bool = True) -> None:
        self.run = run
        self.name = name
        self.agg_cols = agg_cols
        self.agg_finish = agg_finish
        self.termination_seq = termination_seq
        self.materializes = materializes

    def premap(self, stage: Stage) -> "Sink":
        return Sink(lambda df: self.run(stage(df)), name=f"({stage.name} | {self.name})",
                    termination_seq=None, materializes=self.materializes)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Sink {self.name}>"


class Pipeline:
    """A closed, runnable pipeline (``Pipe () Void u m a``,
    Data/Conduino.hs:210).  ``run`` ≙ runPipe: triggers execution and
    returns the sink's terminal result."""

    def __init__(self, source: Source, sink: Sink) -> None:
        self.source = source
        self.sink = sink

    def run(self, spark: SparkSession) -> Any:
        if not self.sink.materializes:
            return self.sink.run(self.source.df(spark))
        from conduino_spark.plans.cachereg import mark, release_caches
        # scope the release to caches THIS run creates: other live lazy
        # flows (earlier sink_df results) keep their persists — releasing
        # them here could let a multi-branch plan re-sample range
        # boundaries and silently diverge (ADVICE r2)
        m = mark()
        try:
            return self.sink.run(self.source.df(spark))
        finally:
            release_caches(since=m)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Pipeline {self.source.name} |> {self.sink.name}>"


def run_pipe(pipeline: Pipeline, spark: SparkSession) -> Any:
    """``runPipe`` (Data/Conduino.hs:210-215)."""
    return pipeline.run(spark)


def with_seq_from(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """Attach ``__seq`` to an arbitrary DataFrame.

    * ``order_col`` given: __seq = that column (must be unique; cheap,
      no shuffle, the 100 TB path).
    * otherwise: file/partition order via a per-partition enumeration
      that is globally ordered by (partition_id, local_index).  Encoded
      into one long so no global sort is needed.
    """
    if order_col is not None:
        return df.withColumn(SEQ, F.col(order_col).cast("long"))
    # monotonically_increasing_id already encodes (partition_id << 33 |
    # local_row_index): globally ordered by partition then row, no shuffle.
    return df.withColumn(SEQ, F.monotonically_increasing_id())
