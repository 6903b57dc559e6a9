"""Parallel combination — the zip/alt algebra (SURVEY §2.2), conduino's
only multi-stream operators (it has no keyed joins; those are engine
extensions in operators/relational.py).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Sink, Source


def _positional(df: DataFrame) -> DataFrame:
    """Rank rows by __seq → dense positional index __pos.

    Chunked (no global window): range-partition, local row_number,
    plus broadcast per-partition row-count prefix offsets — shared
    implementation in plans/order.rerank (registry-tracked persist).
    """
    from conduino_spark.plans.order import rerank
    return rerank(df, [SEQ], out="__pos", drop_keys=False)


def zip_source(a: Source, b: Source, *, suffixes: tuple[str, str] = ("_1", "_2")) -> Source:
    """``zipSource`` (Data/Conduino.hs:512-515): run two sources in
    lockstep, collate positionally, stop at the shorter.

    Spark mapping (SURVEY §2.2): positional equi-join on the dense rank
    of ``__seq`` — an inner join, so the shorter side truncates the
    longer exactly like ListT.zip does.
    """

    def fn(spark: SparkSession) -> DataFrame:
        da, db = _positional(a.df(spark)), _positional(b.df(spark))
        la = da.select(F.col("__pos"),
                       *[F.col(c).alias(c + suffixes[0]) for c in da.columns
                         if c not in ("__pos", SEQ)])
        lb = db.select(F.col("__pos"),
                       *[F.col(c).alias(c + suffixes[1]) for c in db.columns
                         if c not in ("__pos", SEQ)])
        return (la.join(lb, "__pos")
                  .withColumnRenamed("__pos", SEQ))

    return Source(fn, name=f"zip({a.name},{b.name})")


def zip_source_n(*sources: Source,
                 suffixes: Optional[tuple[str, ...]] = None) -> Source:
    """n-ary ``zipSource`` — the ZipSource Applicative chain
    (Data/Conduino.hs:491-533) first-class: collate k sources
    positionally, truncating at the shortest (inner joins on the dense
    rank).  Each source is ranked ONCE; the k-way equi-join on ``__pos``
    shares one partitioning."""
    if len(sources) < 2:
        raise ValueError("zip_source_n needs at least two sources")
    sfx = suffixes or tuple(f"_{i + 1}" for i in range(len(sources)))
    if len(sfx) != len(sources):
        raise ValueError("one suffix per source required")

    def fn(spark: SparkSession) -> DataFrame:
        res = None
        for s, suffix in zip(sources, sfx):
            d = _positional(s.df(spark))
            d = d.select("__pos", *[F.col(c).alias(c + suffix)
                                    for c in d.columns
                                    if c not in ("__pos", SEQ)])
            res = d if res is None else res.join(d, "__pos")
        return res.withColumnRenamed("__pos", SEQ)

    return Source(fn, name=f"zip_n({','.join(s.name for s in sources)})")


def concat_sources(a: Source, b: Source) -> Source:
    """``ZipSource <|>`` (Data/Conduino.hs:523-525): exhaust first source,
    then second — unionByName with a __seq offset to preserve order.
    The offset is computed lazily (1-row agg broadcast), no collect."""

    def fn(spark: SparkSession) -> DataFrame:
        da, db = a.df(spark), b.df(spark)
        off = da.agg((F.coalesce(F.max(SEQ), F.lit(-1)) + 1).alias("__off"))
        shifted = (db.crossJoin(F.broadcast(off))
                     .withColumn(SEQ, F.col(SEQ) + F.col("__off"))
                     .drop("__off"))
        return da.unionByName(shifted)

    return Source(fn, name=f"concat({a.name},{b.name})")


def uncons_zip_source(src: Source) -> tuple[Source, Source]:
    """``unconsZipSource`` (Data/Conduino.hs:596-603): head/tail split."""
    def head_fn(spark):
        return src.df(spark).orderBy(SEQ).limit(1)

    def tail_fn(spark):
        df = src.df(spark)
        b = df.agg(F.min(SEQ).alias("__b"))
        return (df.crossJoin(F.broadcast(b))
                  .where(F.col(SEQ) > F.col("__b")).drop("__b"))

    return Source(head_fn, name="head"), Source(tail_fn, name="tail")


def zip_sink(a: Sink, b: Sink) -> Sink:
    """``zipSink`` (Data/Conduino.hs:654-660): broadcast every input to
    both sinks, finish when both finish, tuple the results.

    Spark mapping: when both sinks are pure aggregations, fuse into ONE
    ``df.agg(...)`` pass (single scan, map-side partials — this is the
    multi-aggregate law the reference gets from Applicative).  Otherwise
    cache the input once and run both."""

    def run(df: DataFrame):
        if a.agg_cols is not None and b.agg_cols is not None:
            na, nb = len(a.agg_cols), len(b.agg_cols)
            row = df.agg(*a.agg_cols, *b.agg_cols).collect()[0]
            vals = tuple(row)
            ra = vals[0] if na == 1 else vals[:na]
            rb = vals[na] if nb == 1 else vals[na:]
            if a.agg_finish:
                ra = a.agg_finish(ra)
            if b.agg_finish:
                rb = b.agg_finish(rb)
            return (ra, rb)
        cached = df.cache()
        try:
            return (a.run(cached), b.run(cached))
        finally:
            cached.unpersist()

    return Sink(run, name=f"zip_sink({a.name},{b.name})")


def zip_sink_n(*sinks: Sink) -> Sink:
    """n-ary ``zipSink`` — the reference's ZipSink Applicative gives this
    for free by chaining ``<*>`` (Data/Conduino.hs:651-660); here the
    n-way product is first-class so ALL pure-aggregation sinks fuse into
    ONE ``df.agg(...)`` pass (single scan, map-side partials) instead of
    a nest of binary fusions.  Result = tuple of each sink's result, in
    order.  Falls back to cache-once + run-each when any sink is not a
    pure aggregation."""
    if not sinks:
        raise ValueError("zip_sink_n needs at least one sink")

    def run(df: DataFrame):
        if all(s.agg_cols is not None for s in sinks):
            cols = [c for s in sinks for c in s.agg_cols]
            vals = tuple(df.agg(*cols).collect()[0])
            out, i = [], 0
            for s in sinks:
                n = len(s.agg_cols)
                r = vals[i] if n == 1 else vals[i:i + n]
                i += n
                if s.agg_finish:
                    r = s.agg_finish(r)
                out.append(r)
            return tuple(out)
        cached = df.cache()
        try:
            return tuple(s.run(cached) for s in sinks)
        finally:
            cached.unpersist()

    return Sink(run, name=f"zip_sink_n({','.join(s.name for s in sinks)})")


def alt_sink_n(*sinks: Sink) -> Sink:
    """n-ary ``altSink`` — the reference's Alternative instance gives
    this for free by chaining ``<|>`` (Data/Conduino.hs:664-670,
    675-687); here the n-way race is first-class: every sink's
    termination point is computed, the EARLIEST terminator's result is
    returned (leftmost wins ties and the all-run-to-end case).

    Spark relaxation (SURVEY §7 hard #3): termination points are
    explicit (``termination_seq``); sinks that only finish at
    end-of-stream have termination None = +inf."""
    if not sinks:
        raise ValueError("alt_sink_n needs at least one sink")

    def run(df: DataFrame):
        terms = [s.termination_seq(df) if s.termination_seq else None
                 for s in sinks]
        # (never-terminates, seq, position): earliest seq wins, leftmost
        # on ties; all-None falls back to the leftmost sink
        win = min(range(len(sinks)),
                  key=lambda i: (terms[i] is None,
                                 terms[i] if terms[i] is not None else 0, i))
        return sinks[win].run(df)

    return Sink(run, name=f"alt_sink_n({','.join(s.name for s in sinks)})")


def alt_sink(a: Sink, b: Sink) -> Sink:
    """Binary ``altSink`` (Data/Conduino.hs:664-670): broadcast input to
    both, finish with the FIRST to finish (left-biased on ties / when
    neither terminates early).  Delegates to :func:`alt_sink_n`."""
    s = alt_sink_n(a, b)
    s.name = f"alt_sink({a.name},{b.name})"
    return s


def fuse_both(src: Source, observe_aggs: list, sink: Sink):
    """``fuseBoth`` / ``&|`` (Data/Conduino.hs:342-355): compose but keep
    BOTH results — (upstream result, downstream result).

    Spark mapping: the upstream result is computed as ``df.observe``
    metrics (one pass, no extra scan) while the downstream sink drives
    the action — exactly "two aggregates from one cached intermediate".
    Returns a Pipeline-like runnable producing the tuple."""
    from pyspark.sql import Observation

    class _FuseBoth:
        def run(self, spark: SparkSession):
            obs = Observation()
            df = src.df(spark).observe(obs, *observe_aggs)
            down = sink.run(df)
            up = tuple(obs.get.values())
            if len(up) == 1:
                up = up[0]
            return (up, down)

    return _FuseBoth()


def lift_zip_sink(value: Any) -> Sink:
    """``liftZipSink`` (Data/Conduino.hs:693-695): a pure sink that
    ignores the stream and returns a constant (the Applicative ``pure``
    for ZipSink — ``zipSink p (lift_zip_sink x)`` keeps p's behavior)."""
    return Sink(lambda df: value, name="lift_zip_sink",
                agg_cols=[F.lit(0)], agg_finish=lambda _x: value)


def fuse_both_maybe(src: Source, observe_aggs: list, sink: Sink):
    """``fuseBothMaybe`` (Data/Conduino.hs:362-367): both results, but
    the upstream result is ``None`` when the downstream sink finished
    BEFORE the upstream was exhausted (early-terminating sinks carry
    ``termination_seq``, cf. alt_sink)."""
    fb = fuse_both(src, observe_aggs, sink)

    class _FuseBothMaybe:
        def run(self, spark: SparkSession):
            df = src.df(spark)
            early = sink.termination_seq(df) if sink.termination_seq else None
            up, down = fb.run(spark)
            return (None if early is not None else up, down)

    return _FuseBothMaybe()


def fuse_upstream(src: Source, observe_aggs: list, sink: Sink):
    """``fuseUpstream`` / ``|.`` (Data/Conduino.hs:372-378): compose,
    keep only the upstream's result."""
    fb = fuse_both(src, observe_aggs, sink)

    class _FuseUp:
        def run(self, spark: SparkSession):
            return fb.run(spark)[0]

    return _FuseUp()
