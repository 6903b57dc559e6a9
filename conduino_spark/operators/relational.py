"""Relational extensions — the capability gaps SURVEY §2.7 lists as
explicitly absent from the reference (keyed joins, grouped aggregation,
distinct, rollup/cube, ranking windows, sorts, top-k, set ops, scalar
functions, event-time windows).  All are pure Spark built-ins with zero
custom logic; the engine's job is exposing them in the pipeline algebra
and making the SCALE-CORRECT physical choice (broadcast vs shuffle,
partial aggregation, sort-free top-k).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from conduino_spark.plans.core import SEQ, Source, Stage

ExprLike = Union[Column, str]


def _expr(e: ExprLike) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def _drop_seq(df: DataFrame) -> DataFrame:
    return df.drop(SEQ) if SEQ in df.columns else df


def join(other: Source, on, *, how: str = "inner", broadcast: bool = False,
         name: str = "join") -> Stage:
    """Keyed join.  ``broadcast=True`` forces a broadcast-hash join for
    small dimension sides (the 100 TB rule: every dim ≤ ~100 MB should
    broadcast; fact-fact joins shuffle on the key).  AQE handles skew
    when it's enabled (session default)."""

    def fn(df: DataFrame) -> DataFrame:
        right = _drop_seq(other.df(df.sparkSession))
        if broadcast:
            right = F.broadcast(right)
        return _drop_seq(df).join(right, on, how)

    return Stage(fn, name=name, seq_preserving=False)


def group_agg(keys: Sequence[str], aggs: Mapping[str, ExprLike], *,
              name: str = "group_agg") -> Stage:
    """Grouped aggregation — hash aggregate with map-side partials
    (Catalyst inserts the partial stage automatically)."""
    cols = [_expr(e).alias(k) for k, e in aggs.items()]

    def fn(df: DataFrame) -> DataFrame:
        return _drop_seq(df).groupBy(*keys).agg(*cols)

    return Stage(fn, name=name, seq_preserving=False)


def rollup_agg(keys: Sequence[str], aggs: Mapping[str, ExprLike]) -> Stage:
    cols = [_expr(e).alias(k) for k, e in aggs.items()]
    return Stage(lambda df: _drop_seq(df).rollup(*keys).agg(*cols),
                 name="rollup", seq_preserving=False)


def cube_agg(keys: Sequence[str], aggs: Mapping[str, ExprLike]) -> Stage:
    cols = [_expr(e).alias(k) for k, e in aggs.items()]
    return Stage(lambda df: _drop_seq(df).cube(*keys).agg(*cols),
                 name="cube", seq_preserving=False)


def distinct(subset: Optional[Sequence[str]] = None) -> Stage:
    """``dropDuplicates`` — shuffle on the subset key only."""

    def fn(df: DataFrame) -> DataFrame:
        d = _drop_seq(df)
        return d.dropDuplicates(list(subset)) if subset else d.distinct()

    return Stage(fn, name="distinct", seq_preserving=False)


def order_by(*cols: ExprLike, name: str = "order_by") -> Stage:
    """Total sort (range-partitioned sample sort — Spark's only global
    sort; use top_k when only a prefix is needed)."""
    return Stage(lambda df: _drop_seq(df).orderBy(*[_expr(c) for c in cols]),
                 name=name, seq_preserving=False)


def top_k(k: int, *cols: ExprLike, name: str = "top_k") -> Stage:
    """Top-k WITHOUT a global sort: Catalyst compiles orderBy+limit to
    TakeOrderedAndProject (per-partition heap + driver merge) — the only
    sane plan at 100 TB."""
    return Stage(lambda df: _drop_seq(df).orderBy(*[_expr(c) for c in cols]).limit(k),
                 name=name, seq_preserving=False)


def ranked(partition: Sequence[str], order: Sequence[ExprLike], *,
           fn_name: str = "row_number", out: str = "rank", top: Optional[int] = None) -> Stage:
    """Ranking window functions (row_number/rank/dense_rank/ntile) —
    partitioned windows parallelize across keys (never a global
    unpartitioned window on big data)."""
    rank_fns = {"row_number": F.row_number, "rank": F.rank,
                "dense_rank": F.dense_rank}

    def fn(df: DataFrame) -> DataFrame:
        w = W.partitionBy(*partition).orderBy(*[_expr(c) for c in order])
        res = _drop_seq(df).withColumn(out, rank_fns[fn_name]().over(w))
        return res.where(F.col(out) <= top) if top else res

    return Stage(fn, name=f"ranked_{fn_name}", seq_preserving=False)


def union_all(other: Source) -> Stage:
    return Stage(lambda df: _drop_seq(df).unionByName(_drop_seq(other.df(df.sparkSession))),
                 name="union_all", seq_preserving=False)


def intersect(other: Source) -> Stage:
    return Stage(lambda df: _drop_seq(df).intersect(_drop_seq(other.df(df.sparkSession))),
                 name="intersect", seq_preserving=False)


def except_all(other: Source, *, distinct_: bool = True) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        o = _drop_seq(other.df(df.sparkSession))
        d = _drop_seq(df)
        return d.exceptAll(o) if not distinct_ else d.subtract(o)
    return Stage(fn, name="except", seq_preserving=False)


def select(*exprs: ExprLike, name: str = "select") -> Stage:
    """Scalar-function passthrough: any pyspark.sql.functions expression
    (string/date/math/JSON — the reference has no scalar library at all,
    SURVEY §2.7)."""
    cols = [F.expr(e) if isinstance(e, str) else e for e in exprs]
    return Stage(lambda df: df.select(*cols), name=name, seq_preserving=False)


def sql_stage(query: str, *, view: str = "t", name: str = "sql") -> Stage:
    """Full SQL over the current stream (registered as ``view``)."""

    def fn(df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(view)
        return df.sparkSession.sql(query)

    return Stage(fn, name=name, seq_preserving=False)


def event_window(ts_col: str, duration: str, *, slide: Optional[str] = None,
                 keys: Sequence[str] = (), aggs: Optional[Mapping[str, ExprLike]] = None,
                 watermark: Optional[str] = None) -> Stage:
    """Tumbling/sliding event-time windows (reference gap: time never
    appears in its model, SURVEY §2.7).  Works identically on batch and
    streaming DFs; ``watermark`` only applies to streaming."""
    aggs = aggs or {"n": F.count(F.lit(1))}
    cols = [_expr(e).alias(k) for k, e in aggs.items()]

    def fn(df: DataFrame) -> DataFrame:
        d = _drop_seq(df)
        if watermark and d.isStreaming:
            d = d.withWatermark(ts_col, watermark)
        win = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
        return (d.groupBy(win.alias("w"), *keys)
                 .agg(*cols)
                 .select(F.col("w.start").alias("w_start"),
                         F.col("w.end").alias("w_end"), *keys,
                         *[F.col(k) for k in aggs]))

    return Stage(fn, name="event_window", seq_preserving=False)


def session_window(ts_col: str, gap: str, *, keys: Sequence[str] = (),
                   aggs: Optional[Mapping[str, ExprLike]] = None) -> Stage:
    """Session windows (gap-based).  Batch + streaming."""
    aggs = aggs or {"n": F.count(F.lit(1))}
    cols = [_expr(e).alias(k) for k, e in aggs.items()]

    def fn(df: DataFrame) -> DataFrame:
        d = _drop_seq(df)
        return (d.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
                 .agg(*cols)
                 .select(F.col("w.start").alias("w_start"),
                         F.col("w.end").alias("w_end"), *keys,
                         *[F.col(k) for k in aggs]))

    return Stage(fn, name="session_window", seq_preserving=False)


def pivot_agg(keys: Sequence[str], pivot_col: str, values: Sequence,
              agg: ExprLike, *, name: str = "pivot_agg") -> Stage:
    """Pivot: one output column per ``values`` entry, filled by ``agg``.

    ``values`` is REQUIRED (not inferred): inference costs an extra
    distinct scan, makes the schema data-dependent, and at 100 TB an
    unbounded pivot column is an anti-pattern — declare the domain."""
    col = F.expr(agg) if isinstance(agg, str) else agg

    def fn(df: DataFrame) -> DataFrame:
        d = df.drop(SEQ) if SEQ in df.columns else df
        return (d.groupBy(*keys)
                 .pivot(pivot_col, list(values))
                 .agg(col))

    return Stage(fn, name=name, seq_preserving=False)


def percentiles(keys: Sequence[str], col: ExprLike,
                probs: Mapping[str, float], *, exact: bool = True,
                accuracy: int = 10_000, ndigits: int = 6,
                name: str = "percentiles") -> Stage:
    """Grouped quantiles {out_name: probability}.

    ``exact=True``: ``percentile`` (per-group sort) — deterministic,
    matches DuckDB ``quantile_cont`` bit-for-bit after rounding (the
    oracle mode; fine when groups fit a task).  ``exact=False``:
    ``approx_percentile`` (mergeable sketch, map-side partials — the
    100 TB path; engine-private, so no cross-engine oracle)."""
    c = F.expr(col) if isinstance(col, str) else col

    def fn(df: DataFrame) -> DataFrame:
        d = df.drop(SEQ) if SEQ in df.columns else df
        if exact:
            aggs = [F.round(F.percentile(c, F.lit(p)), ndigits).alias(k)
                    for k, p in probs.items()]
        else:
            aggs = [F.round(F.approx_percentile(c, F.lit(p), F.lit(accuracy)),
                            ndigits).alias(k)
                    for k, p in probs.items()]
        return d.groupBy(*keys).agg(*aggs)

    return Stage(fn, name=name, seq_preserving=False)


def dedup_latest(keys: Sequence[str], order_col: ExprLike, *,
                 name: str = "dedup_latest") -> Stage:
    """Keep the single latest row per key (CDC compaction / upsert
    materialization): ``max_by(struct(*), order_col)`` — ONE hash
    aggregate with map-side partials, no window sort.  Ties on
    ``order_col`` are broken by the largest remaining struct (make the
    order column unique — e.g. (ts, id) packed — to pin them)."""
    oc = F.expr(order_col) if isinstance(order_col, str) else order_col

    def fn(df: DataFrame) -> DataFrame:
        d = df.drop(SEQ) if SEQ in df.columns else df
        others = [c for c in d.columns if c not in keys]
        agg = d.groupBy(*keys).agg(
            F.max_by(F.struct(*[F.col(c) for c in others]), oc).alias("__r"))
        return agg.select(*keys, *[F.col(f"__r.{c}").alias(c) for c in others])

    return Stage(fn, name=name, seq_preserving=False)


def cdc_apply(changes: DataFrame, keys: Sequence[str], order_col: str, *,
              op_col: str = "op", delete_op: str = "D",
              name: str = "cdc_apply") -> Stage:
    """Apply a CDC change batch to a snapshot — the table-maintenance
    MERGE every ingestion pipeline runs: upserts (any non-delete op)
    replace the snapshot row with the same key, deletes remove it,
    latest-``order_col``-wins within the batch.  The stage's input is
    the SNAPSHOT; ``changes`` carries the same columns plus ``op_col``.

    Plan: union (snapshot rows ride with order −∞ sentinel NULL —
    ``max_by`` ignores no rows, but any real change outranks them via
    the (has_change, order) packed struct) → ONE ``max_by`` hash
    aggregate per key (map-side partials, no window sort) → filter out
    keys whose winning row is a delete.  Equivalent to ``MERGE INTO``
    with when-matched-update/delete + when-not-matched-insert, as one
    aggregate.

    Ties on ``order_col`` within the batch follow
    :func:`dedup_latest`'s rule — make the order unique to pin them."""
    keys = list(keys)

    def fn(df: DataFrame) -> DataFrame:
        d = df.drop(SEQ) if SEQ in df.columns else df
        cols = [c for c in d.columns if c not in keys]
        snap = d.select(
            *keys, *cols,
            F.lit(None).cast("string").alias("__op"),
            F.lit(0).alias("__is_chg"),
            F.lit(0).cast("long").alias("__ord"))
        chg = changes.select(
            *keys, *cols,
            F.col(op_col).alias("__op"),
            F.lit(1).alias("__is_chg"),
            F.col(order_col).cast("long").alias("__ord"))
        allr = snap.unionByName(chg)
        win = F.max_by(
            F.struct(*[F.col(c) for c in cols], F.col("__op")),
            F.struct(F.col("__is_chg"), F.col("__ord"))).alias("__r")
        agg = allr.groupBy(*keys).agg(win)
        return (agg.where(F.coalesce(F.col("__r.__op"), F.lit("")) !=
                          F.lit(delete_op))
                   .select(*keys, *[F.col(f"__r.{c}").alias(c)
                                    for c in cols]))

    return Stage(fn, name=name, seq_preserving=False)


def snapshot_diff(old: DataFrame, key: str, *,
                  compare: Optional[Sequence[str]] = None,
                  out: str = "change") -> Stage:
    """Diff the incoming snapshot against a prior one BY CONTENT:
    classify every key as ``added`` (new key), ``removed`` (key gone),
    ``changed`` (key present in both but any compared column differs),
    or drop it (unchanged) — the corpus-audit complement of
    :func:`cdc_apply` (which APPLIES a change batch; this RECOVERS the
    change batch from two snapshots).

    ``compare`` defaults to all shared non-key columns.  Output: the
    NEW snapshot's row (removed keys carry the OLD row's values) +
    ``out`` ∈ {added, removed, changed}.

    Plan: each side reduces to (key, md5 of the compared columns) —
    ONE narrow projection, the raw rows never shuffle for the compare —
    then a full outer join on key classifies, and only non-unchanged
    keys join back to fetch their payload.  At 100 TB the join moves
    (key, 32-byte digest) pairs, and the payload fetch touches only
    the changed fraction.

    NULL keys never match each other (SQL join semantics), so a
    NULL-key row in the old snapshot is ``removed`` and one in the new
    snapshot is ``added`` — and the payload fetch is NULL-SAFE, so
    those rows appear in the output instead of silently vanishing."""

    def fn(df: DataFrame) -> DataFrame:
        d = df.drop(SEQ) if SEQ in df.columns else df
        o = old.drop(SEQ) if SEQ in old.columns else old
        cols = compare or [c for c in d.columns
                           if c != key and c in o.columns]
        digest = F.md5(F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in cols]))
        new_d = d.select(F.col(key), digest.alias("__dn"))
        old_d = o.select(F.col(key), digest.alias("__do"))
        j = new_d.join(old_d, key, "full_outer")
        # distinct: several NULL-key rows classify to the same
        # (NULL, added/removed) pair; without it the null-safe payload
        # join below would multiply them quadratically
        cls = (j.withColumn(out, F.when(F.col("__do").isNull(),
                                        F.lit("added"))
                                  .when(F.col("__dn").isNull(),
                                        F.lit("removed"))
                                  .when(F.col("__dn") != F.col("__do"),
                                        F.lit("changed")))
                .where(F.col(out).isNotNull())
                .select(key, out)
                .distinct())

        def fetch(side: DataFrame, tags: DataFrame) -> DataFrame:
            t = tags.withColumnRenamed(key, "__k")
            return (side.join(t, F.col(key).eqNullSafe(F.col("__k")))
                        .select(*side.columns, out))

        from_new = fetch(d, cls.where(F.col(out) != "removed"))
        from_old = fetch(o.select(d.columns),
                         cls.where(F.col(out) == "removed"))
        return from_new.unionByName(from_old)

    return Stage(fn, name="snapshot_diff", seq_preserving=False)


def profile_table(*, approx_distinct_p: int = 12,
                  columns: Optional[Sequence[str]] = None) -> Stage:
    """One-pass data-quality profile: per column, row count, null
    count, null fraction, approximate distinct count (the sparse HLL
    sketch — O(2^p) state per column), and min/max as strings — the
    table-health report an ingestion pipeline records per snapshot.

    Output: one row per column — (column, n_rows, n_nulls, null_frac,
    approx_distinct, min, max).

    Plan: ONE aggregate pass computes every per-column statistic
    except the distinct sketches (map-side partials; no shuffle of
    data rows); the distinct counts come from ONE MORE pass — the
    table restacked to narrow (column, value) rows feeds a single
    GROUPED :func:`~conduino_spark.operators.sketches.hll_build`
    (``keys=("column",)``), so all columns sketch in one scan + one
    register aggregate instead of a job per column.  Nothing ever
    collects data rows to the driver."""

    def fn(df: DataFrame) -> DataFrame:
        from conduino_spark.operators.sketches import (
            hll_build, hll_estimate,
        )
        cols = [c for c in (columns or df.columns) if c != SEQ]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                        .alias(f"__null_{c}"))
            s = F.col(c).cast("string")
            aggs.append(F.min(s).alias(f"__min_{c}"))
            aggs.append(F.max(s).alias(f"__max_{c}"))
        base = df.agg(*aggs)
        stacked = df.select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"),
                     F.col(c).cast("string").alias("__v"))
            for c in cols])).alias("s")).select("s.*")
        rows = hll_estimate()(
            hll_build("__v", p=approx_distinct_p,
                      keys=("column",))(stacked))
        stats = base.select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"),
                     F.col("__n").alias("n_rows"),
                     F.col(f"__null_{c}").alias("n_nulls"),
                     F.round(F.col(f"__null_{c}")
                             / F.greatest(F.col("__n"), F.lit(1)), 6)
                      .alias("null_frac"),
                     F.col(f"__min_{c}").alias("min"),
                     F.col(f"__max_{c}").alias("max"))
            for c in cols])).alias("s")).select("s.*")
        # LEFT join + coalesce: an empty (or all-NULL-column) table has
        # no sketch rows, but the profile must still report the column
        # with n_rows/n_nulls and distinct 0
        return (stats.join(F.broadcast(rows), "column", "left")
                     .select("column", "n_rows", "n_nulls", "null_frac",
                             F.coalesce("approx_distinct", F.lit(0.0))
                              .alias("approx_distinct"), "min", "max"))

    return Stage(fn, name="profile_table", seq_preserving=False)


def profile_diff(old: DataFrame, *, approx_distinct_p: int = 12,
                 columns: Optional[Sequence[str]] = None) -> Stage:
    """Snapshot DRIFT report: apply :func:`profile_table` to a
    previous snapshot and to the current one, full-outer join per
    column, and emit the health deltas an ingestion pipeline alerts
    on — row-count change, null-fraction delta, min/max movement,
    distinct-count ratio, and schema changes (columns added/removed).
    The statistical complement of :func:`snapshot_diff` (which
    recovers the changed ROWS): this one never touches row identity,
    just the per-column aggregates.

    Output: one row per column seen in either snapshot —
    (column, status added|removed|common, n_rows_old, n_rows_new,
    null_frac_old, null_frac_new, d_null_frac, approx_distinct_old,
    approx_distinct_new, distinct_ratio, min_changed, max_changed).

    Deterministic end to end: the profile's exact stats replay in SQL
    directly and the HLL distinct estimates are md5-register exact
    (test_round6c), so the whole diff — including the 6-dec rounded
    distinct ratio — is oracle-replayable.  Plan: two profile passes
    (one per snapshot; each is one agg scan + one grouped sketch) and
    a k-columns-row broadcast join.  Nothing scales with row count on
    the driver."""
    prof = profile_table(approx_distinct_p=approx_distinct_p,
                         columns=columns)
    stats = ("n_rows", "n_nulls", "null_frac", "approx_distinct",
             "min", "max")

    def fn(new: DataFrame) -> DataFrame:
        po = prof(old).select(
            "column", *[F.col(c).alias(f"{c}_old") for c in stats])
        pn = prof(new).select(
            "column", *[F.col(c).alias(f"{c}_new") for c in stats])
        j = po.join(pn, "column", "full_outer")
        ad_old = F.round("approx_distinct_old", 6)
        ad_new = F.round("approx_distinct_new", 6)
        return j.select(
            "column",
            F.when(F.col("n_rows_old").isNull(), F.lit("added"))
             .when(F.col("n_rows_new").isNull(), F.lit("removed"))
             .otherwise(F.lit("common")).alias("status"),
            "n_rows_old", "n_rows_new",
            "null_frac_old", "null_frac_new",
            F.round(F.coalesce("null_frac_new", F.lit(0.0))
                    - F.coalesce("null_frac_old", F.lit(0.0)), 6)
             .alias("d_null_frac"),
            ad_old.alias("approx_distinct_old"),
            ad_new.alias("approx_distinct_new"),
            F.when(ad_old > 0, F.round(ad_new / ad_old, 6))
             .alias("distinct_ratio"),
            (~F.col("min_old").eqNullSafe(F.col("min_new")))
            .alias("min_changed"),
            (~F.col("max_old").eqNullSafe(F.col("max_new")))
            .alias("max_changed"))

    return Stage(fn, name="profile_diff", seq_preserving=False)
