"""Sinks — terminal folds / aggregations (SURVEY §2.5).

A sink's ``run`` triggers the Spark action and returns the pipe's
terminal result ``a`` (Internal.hs:97-98) to the driver.  Builtin
reducers compile to ``df.agg`` (map-side partial aggregation — the
scale path); only ``sink_list`` materializes the stream.
"""

from __future__ import annotations

import functools
import operator
from typing import Any, Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Sink, Stage


def sink_list(*, col: str = "v") -> Sink:
    """``sinkList`` (Combinators.hs:516-518) — collect the entire stream
    in order (memory warning applies exactly as in the reference,
    Combinators.hs:512-515: test/driver tool, not a 100 TB op)."""

    def run(df: DataFrame):
        cols = [c for c in df.columns if c != SEQ]
        # collect unsorted, sort driver-side by __seq: avoids the global
        # range-partitioning sort (whose sampling pass would also make
        # df.observe taps double-count), and it's one job instead of two.
        rows = df.select(SEQ, *cols).collect()
        rows.sort(key=lambda r: (r[0] is None, r[0]))
        if cols == [col]:
            return [r[1] for r in rows]
        return [tuple(r[1:]) for r in rows]

    return Sink(run, name="sink_list")


def sink_df() -> Sink:
    """Engine extension: terminal result = the DataFrame itself (lazy).
    This is how pipelines hand results to the driver contract."""
    return Sink(lambda df: df, name="sink_df", materializes=False)


def agg_sink(*aggs: Column, finish: Optional[Callable[[Any], Any]] = None,
             name: str = "agg") -> Sink:
    """Generic one-pass aggregation sink.  ``agg_cols`` metadata lets
    ``zip_sink`` fuse several of these into ONE ``df.agg`` pass
    (Data/Conduino.hs:654-660)."""

    def run(df: DataFrame):
        row = df.agg(*aggs).collect()[0]
        vals = tuple(row)
        out = vals[0] if len(vals) == 1 else vals
        return finish(out) if finish else out

    return Sink(run, name=name, agg_cols=list(aggs), agg_finish=finish)


def fold(op: Union[str, Column] = "v", *, how: str = "sum",
         initial: Any = None) -> Sink:
    """``foldl`` with an associative reducer (Combinators.hs:480-486) —
    aggregation without grouping, compiled to ``df.agg`` (partial
    map-side combine, scale-safe).  ``how`` ∈ sum/min/max/count/avg/
    product/first/last/collect."""
    col = F.expr(op) if isinstance(op, str) else op
    fns = {
        "sum": F.sum, "min": F.min, "max": F.max, "count": F.count,
        "avg": F.avg, "product": F.product,
    }
    if how not in fns:
        raise ValueError(f"unknown reducer {how!r}")
    agg = fns[how](col)

    def finish(x):
        if x is None and initial is not None:
            return initial
        if initial is not None and how == "sum":
            return x + initial
        return x

    return agg_sink(agg.alias(how), finish=finish, name=f"fold_{how}")


def foldl(f: Callable[[Any, Any], Any], z: Any, *, col: str = "v") -> Sink:
    """General (possibly non-associative) ``foldl`` (Combinators.hs:480-486).

    Order-dependent sequential state — the same parallelism loss the
    reference has (single-threaded).  Implemented as ordered
    ``toLocalIterator`` fold so the stream is never fully materialized
    on the driver; for associative reducers use :func:`fold` (df.agg).
    """

    def run(df: DataFrame):
        acc = z
        for row in df.orderBy(SEQ).select(col).toLocalIterator():
            acc = f(acc, row[0])
        return acc

    return Sink(run, name="foldl")


def foldr(f: Callable[[Any, Any], Any], z: Any, *, col: str = "v") -> Sink:
    """``foldr`` (Combinators.hs:468-474) — reverse-order fold."""

    def run(df: DataFrame):
        acc = z
        for row in df.orderBy(F.desc(SEQ)).select(col).toLocalIterator():
            acc = f(row[0], acc)
        return acc

    return Sink(run, name="foldr")


def fold_monoid(*, how: str = "sum", col: str = "v") -> Sink:
    """``fold`` (Combinators.hs:490-492) — monoidal fold; the monoid is
    declared (sum/min/max/collect) so Spark can combine partials."""
    return fold(col, how=how)


def fold_map(expr: Union[str, Column], *, how: str = "sum") -> Sink:
    """``foldMap`` (Combinators.hs:507-509) — project then monoid-fold
    (docs build sum/maximum this way, Combinators.hs:497-506)."""
    return fold(expr, how=how)


def last_(*, col: str = "v") -> Sink:
    """``last`` (Combinators.hs:558-564): None on empty stream."""

    def run(df: DataFrame):
        rows = df.orderBy(F.desc(SEQ)).limit(1).select(col).collect()
        return rows[0][0] if rows else None

    return Sink(run, name="last")


def head_(*, col: str = "v") -> Sink:
    """Head-of-stream = "just await" (Combinators.hs:556-557)."""

    def run(df: DataFrame):
        rows = df.orderBy(SEQ).limit(1).select(col).collect()
        return rows[0][0] if rows else None

    return Sink(run, name="head")


def sink_null() -> Sink:
    """``sinkNull`` (Combinators.hs:550-553) — drain and discard.
    ``noop`` write format is the canonical full-scan action."""

    def run(df: DataFrame):
        df.write.format("noop").mode("overwrite").save()
        return None

    return Sink(run, name="sink_null")


def sink_count() -> Sink:
    return agg_sink(F.count("*").alias("n"), name="sink_count")


def sink_parquet(path: str, *, mode: str = "overwrite",
                 partition_by: Optional[Sequence[str]] = None) -> Sink:
    """``sinkHandle`` (Combinators.hs:291-297) generalized to a
    format-aware writer (reference gap, SURVEY §2.7).  ``partition_by``
    lays the output out hive-style so downstream filters on those
    columns become partition PRUNING (the lsh_index_write pattern)."""

    def run(df: DataFrame):
        w = df.drop(SEQ).write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return path

    return Sink(run, name=f"sink_parquet({path})")


def sink_orc(path: str, *, mode: str = "overwrite",
             partition_by: Optional[Sequence[str]] = None) -> Sink:
    """ORC writer — same layout contract as :func:`sink_parquet`
    (hive-style ``partition_by`` → partition pruning); ORC stripes
    carry min/max + optional bloom column stats for scan pruning."""

    def run(df: DataFrame):
        w = df.drop(SEQ).write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path)
        return path

    return Sink(run, name=f"sink_orc({path})")


def sink_parquet_sorted(path: str, keys: Sequence[str], *,
                        npart: Optional[int] = None,
                        mode: str = "overwrite") -> Sink:
    """Globally-ordered shard layout: range-partition by ``keys``, sort
    within each partition, write — shard ``i``'s key range lies wholly
    before shard ``i+1``'s, and every parquet row group carries tight
    min/max stats on the sort keys.  The standard "sorted write"
    optimization: downstream range predicates prune at BOTH the file
    level (disjoint shard ranges) and the row-group level (stats), and
    ordered consumers (as-of merges, sequential exports) read shards in
    name order without a sort.

    Cost: one range exchange (sampling pass + shuffle) — exactly what
    any global ordering costs; the per-partition sort spills, never
    collects."""

    def run(df: DataFrame):
        kcols = [F.col(k) for k in keys]
        d = df.drop(SEQ)
        part = (d.repartitionByRange(npart, *kcols) if npart
                else d.repartitionByRange(*kcols))
        part.sortWithinPartitions(*kcols).write.mode(mode).parquet(path)
        return path

    return Sink(run, name=f"sink_parquet_sorted({path})")


def zorder_key(cols: Sequence[str], *, bits: int = 16,
               out: str = "__z") -> "Stage":
    """Morton (Z-order) key over numeric columns: normalize each to an
    integer in ``[0, 2^bits)`` via broadcast min/max bounds, then
    interleave the bits.  Rows close in Z are close in EVERY clustered
    dimension, so sorting by the key gives multi-column locality —
    range predicates on any single dimension touch ~N^{(d−1)/d} of the
    files instead of all of them (a lexicographic sort only prunes its
    leading column).

    Pure column algebra: one tiny bounds aggregate broadcast into the
    row expression (the `_with_pid` lazy-bounds shape), then
    ``bits × d`` shift/mask terms OR-ed together — whole-stage codegen,
    no shuffle.  ``bits * len(cols)`` must fit a long (≤ 63)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*dims = {bits * len(cols)} exceeds 63 (long overflow); "
            "lower bits")

    def fn(df: DataFrame) -> DataFrame:
        n = float(1 << bits)
        bounds = df.agg(*[a for c in cols for a in
                          (F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                           F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))])
        d = df.crossJoin(F.broadcast(bounds))
        z = F.lit(0).cast("long")
        for ci, c in enumerate(cols):
            lo_, hi_ = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
            # NULLs sort to cell 0 EXPLICITLY: F.least skips nulls, so
            # without the isNull branch a null dimension would land in
            # the MAX cell and co-locate null rows with the largest
            # values, silently defeating pruning at that end
            x = F.when(F.col(c).isNull() | (hi_ == lo_), F.lit(0)) \
                 .otherwise(
                F.least(F.floor((F.col(c).cast("double") - lo_)
                                / (hi_ - lo_) * n),
                        F.lit((1 << bits) - 1))).cast("long")
            for b in range(bits):
                z = z.bitwiseOR(
                    F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)),
                                b * len(cols) + ci))
        return d.withColumn(out, z).drop(
            *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])

    return Stage(fn, name=f"zorder_key({','.join(cols)})",
                 seq_preserving=True)


def sink_parquet_zorder(path: str, cols: Sequence[str], *, bits: int = 16,
                        npart: Optional[int] = None,
                        mode: str = "overwrite") -> Sink:
    """Z-order clustered parquet layout: compute the Morton key, range
    partition + sort by it, write without it.  The multi-dimensional
    counterpart of :func:`sink_parquet_sorted` — use when queries
    filter on SEVERAL columns and no single sort order serves them
    all."""
    key_stage = zorder_key(cols, bits=bits)

    def run(df: DataFrame):
        d = key_stage(df.drop(SEQ))
        part = (d.repartitionByRange(npart, F.col("__z")) if npart
                else d.repartitionByRange(F.col("__z")))
        (part.sortWithinPartitions("__z").drop("__z")
             .write.mode(mode).parquet(path))
        return path

    return Sink(run, name=f"sink_parquet_zorder({path})")


def sink_csv(path: str, *, header: bool = True, mode: str = "overwrite",
             **options) -> Sink:
    """CSV writer — the interchange flavor of :func:`sink_parquet`.
    Complex columns (arrays/structs) are not CSV-encodable; cast or
    serialize upstream."""

    def run(df: DataFrame):
        w = df.drop(SEQ).write.mode(mode).option("header", str(header).lower())
        for k, v in options.items():
            w = w.option(k, v)
        w.csv(path)
        return path

    return Sink(run, name=f"sink_csv({path})")


def sink_json(path: str, *, mode: str = "overwrite", **options) -> Sink:
    """JSON-lines writer (one object per row) — pairs with
    ``sources.read_json``."""

    def run(df: DataFrame):
        w = df.drop(SEQ).write.mode(mode)
        for k, v in options.items():
            w = w.option(k, v)
        w.json(path)
        return path

    return Sink(run, name=f"sink_json({path})")


def sink_text(path: str, *, col: str = "v", mode: str = "overwrite") -> Sink:
    """``stdout``/``sinkHandle`` text flavor: one line per element."""

    def run(df: DataFrame):
        df.orderBy(SEQ).select(F.col(col).cast("string").alias("value")) \
          .write.mode(mode).text(path)
        return path

    return Sink(run, name=f"sink_text({path})")


def sink_parquet_compacted(path: str, *, target_rows_per_file: int,
                           partition_by: Optional[Sequence[str]] = None,
                           mode: str = "overwrite") -> Sink:
    """Small-file compaction write: size the output to
    ``ceil(rows / target_rows_per_file)`` files instead of one file per
    upstream task — the maintenance pass every long-lived table needs
    (thousands of kilobyte files turn scans into metadata storms; one
    giant file kills read parallelism).

    Row count comes from ONE count aggregate over the (narrow) plan,
    then a round-robin ``repartition(n)`` balances rows evenly across
    exactly ``n`` writers.  With ``partition_by``, rows are spread
    WITHIN each hive partition by a round-robin split id, bounding
    files per partition at ``n`` without a per-partition count pass
    (the single-shuffle approximation every compactor uses; a skewed
    hive key still gets at most ``n`` files).

    Cost: one counting job + one shuffle of the written rows — the
    same bill `OPTIMIZE`/rewrite jobs pay in table formats."""
    if target_rows_per_file <= 0:
        raise ValueError(
            f"target_rows_per_file must be positive, got "
            f"{target_rows_per_file}")

    def run(df: DataFrame):
        d = df.drop(SEQ) if SEQ in df.columns else df
        n_rows = d.count()
        n_files = max(1, -(-n_rows // target_rows_per_file))
        if partition_by:
            w = (d.repartition(n_files, *[F.col(c) for c in partition_by])
                  .write.mode(mode).partitionBy(*partition_by))
        else:
            w = d.repartition(n_files).write.mode(mode)
        w.parquet(path)
        return path

    return Sink(run, name=f"sink_parquet_compacted({path})")
