"""Similarity search over embedding columns (north star, BASELINE.json).

* ``knn_brute``: exact top-k cosine — the correctness baseline.  At
  scale this is ONE narrow scan + TakeOrderedAndProject (per-partition
  heap, driver merge of k·partitions rows): no shuffle of the vectors.
* ``knn_lsh`` / ``ivf_search``: the scale paths — restrict the scan to
  LSH/IVF buckets so the candidate set is ~1/buckets of the corpus.

Vector math is JVM-side ``F.zip_with``/``F.aggregate`` (codegen) —
no Python per row.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as _np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import Stage
from conduino_spark.functions.hashing import lcg_params

from conduino_spark.operators.smallio import (
    centroids_arrow as _centroids_arrow,
    driver_parquet_read as _driver_parquet_read,
    driver_parquet_write as _driver_parquet_write)

LSH_PLANES = 8  # 2^8 = 256 buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def _guarded_long_sum(v: Column, what: str) -> Column:
    """Scaled-long sum under the same 2^53 representability guard as
    __spark_entry__._scaled_sum (ADVICE r3: the ivf aggregates had no
    overflow guard, inconsistent with the policy they rely on).
    max(|v|)·count — in DOUBLE, which cannot wrap — bounds |sum|; under
    2^53 every partial is exact AND nowhere near the 2^63 long wrap
    (a hot cell with ~9e9 rows would otherwise wrap silently and
    diverge from the oracle).  Violations raise loudly."""
    s = F.sum(v)
    bound = F.coalesce(
        F.max(F.abs(v)).cast("double") * F.count(v).cast("double"),
        F.lit(0.0))
    return F.when(bound < F.lit(2.0 ** 53), s).otherwise(
        F.raise_error(F.lit(
            f"{what}: scaled-long |sum| bound >= 2^53; reduce the scale "
            "or shrink the cell (exactness claim would be void)")))


def cosine_to(query: Sequence[float], vec_col: str = "embedding", *,
              out: str = "cosine", ndigits: int = 6) -> Stage:
    """Append cosine similarity to a fixed query vector (broadcast as a
    literal array — zero data movement)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(float(x) * float(x) for x in query) ** 0.5

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        cos = _dot(v, q) / (_norm(v) * F.lit(qn))
        return df.withColumn(out, F.round(cos, ndigits))

    return Stage(fn, name="cosine_to", seq_preserving=True)


def knn_brute(query: Sequence[float], k: int = 10, *,
              vec_col: str = "embedding", id_col: str = "vec_id") -> Stage:
    """Exact top-k by cosine: orderBy+limit compiles to
    TakeOrderedAndProject — no global sort, no shuffle of vectors."""
    stage = cosine_to(query, vec_col)

    def fn(df: DataFrame) -> DataFrame:
        return (stage(df)
                .select(id_col, "cosine")
                .orderBy(F.desc("cosine"), F.col(id_col))
                .limit(k))

    return Stage(fn, name=f"knn_brute({k})", seq_preserving=False)


def hyperplanes(dim: int, planes: int = LSH_PLANES, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-derived ±1 entries —
    reproducible across engines and runs)."""
    params = lcg_params(dim * planes, seed=seed)
    out = []
    it = iter(params)
    for _ in range(planes):
        out.append([1.0 if next(it)[0] % 2 else -1.0 for _ in range(dim)])
    return out


def lsh_bucket(vec_col: str = "embedding", *, dim: int, planes: int = LSH_PLANES,
               out: str = "bucket") -> Stage:
    """Random-hyperplane (SRP) LSH bucket id: bit i = sign(v·p_i).
    Cosine-similar vectors collide with high probability."""
    hp = hyperplanes(dim, planes)

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        bucket = F.lit(0)
        for i, plane in enumerate(hp):
            p = F.array(*[F.lit(x) for x in plane])
            bucket = bucket + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return df.withColumn(out, bucket)

    return Stage(fn, name="lsh_bucket", seq_preserving=True)


def probe_buckets(query: Sequence[float], *, planes: int = LSH_PLANES) -> list[int]:
    """The query's SRP bucket plus its Hamming-1 neighbors (recall
    boost) — pure driver arithmetic, shared by :func:`knn_lsh` and its
    oracle rendering."""
    hp = hyperplanes(len(query), planes)
    qbucket = 0
    for i, plane in enumerate(hp):
        if sum(q * p for q, p in zip(query, plane)) > 0:
            qbucket |= 1 << i
    return [qbucket] + [qbucket ^ (1 << i) for i in range(planes)]


def lsh_index_write(df: DataFrame, path: str, *, vec_col: str = "embedding",
                    dim: int, planes: int = LSH_PLANES) -> None:
    """Materialize the SRP index ONCE: compute each row's bucket and
    write the corpus ``partitionBy('bucket')`` so probes are partition
    PRUNING (a directory listing + ~nprobe/2^planes of the bytes), not
    a corpus scan.  The 100 TB posture: build-index is the one full
    pass; every query after it reads only its probe partitions.

    The write repartitions BY the bucket column first: without it every
    input task writes a file into every bucket directory (tasks ×
    2^planes tiny files — measured ~6s of filesystem churn for 500
    rows); with it each bucket is one task writing one file.

    The SRP projections are spread over all cores BEFORE hashing: the
    dot products run map-side in the SCAN stage, so a single-split
    input would otherwise compute every projection in one task
    (measured 8s → 2s at sf0.1).  The round-robin shuffle moves only
    the raw vectors once — at real scale (many splits) the
    getNumPartitions guard makes it a no-op.

    The bucket exchange PINS its partition count (AQE otherwise
    coalesces the small-by-bytes shuffle to one task, serializing the
    2^planes directory commits — measured ~2× the write time)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # plan-only spread guard: df.rdd.getNumPartitions() would convert
    # the plan to an RDD outside AQE (eagerly running upstream shuffles
    # for non-scan inputs) and read a pre-AQE count anyway.  Scan
    # inputs expose their file list as metadata — fewer files than
    # cores means the SRP dot products would concentrate on few tasks;
    # non-scan inputs ([] or unknown) get spread unconditionally, which
    # at worst re-shuffles narrow vectors once.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files < target:
        df = df.repartition(target)
    n_write = min(1 << planes, 2 * target)
    (lsh_bucket(vec_col, dim=dim, planes=planes)(df)
     .repartition(n_write, F.col("bucket"))
     .write.partitionBy("bucket").mode("overwrite").parquet(path))
    # r10: (dim, planes) stored in-band so lsh_index_merge assigns new
    # batches under the SAME hyperplane family (the n_shards rule).
    # The directory is underscore-prefixed: Spark's path filter hides
    # it from `spark.read.parquet(path)`, so the v1 probe layout —
    # bucket dirs at the root — is unchanged for existing readers.
    # Driver-side write (r11): the two ints are driver constants; a
    # Spark job here cost ~4.4 s/call and tripled the cold-build bench.
    import pyarrow as _pa
    _driver_parquet_write(
        f"{path}/_meta",
        _pa.table({"dim": _pa.array([int(dim)], _pa.int32()),
                   "planes": _pa.array([int(planes)], _pa.int32())}))


def lsh_index_merge(new_vecs: DataFrame, path: str, *,
                    vec_col: str = "embedding") -> None:
    """Fold a NEW vector batch into a persisted :func:`lsh_index_write`
    index — the SRP member of the incremental-index family
    (bm25/ivf/ivfpq merges are its siblings): bucket the batch under
    the SAME (dim, planes) the index stores in-band (SRP hyperplanes
    are a pure function of those two ints — h32-derived, no learned
    state), append into the bucket directories.  Probes against the
    merged index are BIT-EQUAL to a from-scratch rebuild over the
    union corpus (law-tested); cost scales with the new batch only.
    Append-only contract as for the other merges.

    A pre-r10 index without the in-band ``_meta`` table raises —
    rebuild once with the current :func:`lsh_index_write` to upgrade
    (guessing dim/planes here could silently split the bucket space)."""
    spark = new_vecs.sparkSession
    try:
        # driver-side read (r11): the _meta table is two ints — a
        # Spark read job here taxed every merge with a whole-job cycle
        meta = _driver_parquet_read(f"{path}/_meta")
    except Exception as e:
        raise ValueError(
            f"no mergeable LSH index at {path} (missing in-band _meta "
            f"— a pre-r10 index must be rebuilt with lsh_index_write "
            f"before merging)") from e
    if len(meta) != 1:
        raise ValueError(f"corrupt _meta at {path}: {len(meta)} rows")
    dim, planes = int(meta[0]["dim"]), int(meta[0]["planes"])
    target = spark.sparkContext.defaultParallelism
    # same sizing as lsh_index_write (ADVICE r10: the old min(n, 8) cap
    # silently serialized large merge batches onto <=8 tasks)
    n_write = min(1 << planes, 2 * target)
    # fail fast on width drift: a batch whose vectors are not the
    # stored dim would bucket under TRUNCATED dot products (zip_with
    # stops at the shorter array) and silently corrupt the bucket
    # space.  raise_error fires on the first mismatched row.
    v = F.col(vec_col)
    guarded = new_vecs.withColumn(vec_col, F.when(
        v.isNull() | (F.size(v) == F.lit(dim)), v).otherwise(
        F.raise_error(F.concat(
            F.lit(f"lsh_index_merge: batch vector width "),
            F.size(v).cast("string"),
            F.lit(f" != stored dim {dim} at {path}")))))
    (lsh_bucket(vec_col, dim=dim, planes=planes)(guarded)
     .repartition(n_write, F.col("bucket"))
     .write.partitionBy("bucket").mode("append").parquet(path))


def knn_lsh(query: Sequence[float], k: int = 10, *, vec_col: str = "embedding",
            id_col: str = "vec_id", planes: int = LSH_PLANES,
            bucket_col: Optional[str] = None) -> Stage:
    """ANN top-k over the query's probe buckets (SRP bucket + Hamming-1
    neighbors).

    Two regimes:

    * ``bucket_col=None`` (no index): the bucket is computed per row and
      filtered — a full scan, acceptable for one-off queries only.
    * ``bucket_col='bucket'`` (indexed): the input already carries the
      bucket — e.g. a ``spark.read.parquet`` of a
      :func:`lsh_index_write` layout, where ``bucket`` is a PARTITION
      column and the ``isin`` probe compiles to partition pruning
      (PartitionFilters in the scan, plan-tested in
      tests/test_round4.py) — the scan touches only the ~``planes+1``
      probe directories, never the corpus."""
    probe = probe_buckets(query, planes=planes)
    bucket_stage = lsh_bucket(vec_col, dim=len(query), planes=planes)
    scorer = cosine_to(query, vec_col)

    def fn(df: DataFrame) -> DataFrame:
        if bucket_col is None:
            # fenced (r11): a plain .where would be alias-substituted
            # through the bucket projection — the whole 2^planes-term
            # SRP sum re-inlined into an interpreted per-row predicate
            # (the r8 giant-filter smell; plan_audit caught it when
            # this path joined the pq_adc_search gate pin)
            from conduino_spark.plans.core import fenced_where
            cand = fenced_where(bucket_stage(df),
                                F.col("bucket").isin(probe))
        else:
            cand = df.where(F.col(bucket_col).isin(probe))
        return (scorer(cand)
                .select(id_col, "cosine")
                .orderBy(F.desc("cosine"), F.col(id_col))
                .limit(k))

    return Stage(fn, name=f"knn_lsh({k})", seq_preserving=False)


def ivf_build(k: int = 8, iters: int = 1, *, vec_col: str = "embedding",
              id_col: str = "vec_id", out: str = "cell",
              scale: int = 1_000_000_000) -> Stage:
    """Train an IVF coarse quantizer (k-means-lite, Lloyd iterations)
    and return the (id, cell) assignment — feeds ``ivf_search`` /
    ``embedding_near_dup_pairs`` a REAL computed quantizer instead of a
    pre-existing label column.

    Scale shape (the same one distributed k-means always has):
    centroids are driver-sized (k × dim doubles) and BROADCAST as
    literal arrays, so ASSIGNMENT is a pure projection — zero shuffle,
    whole-stage codegen; the UPDATE is one (cell, dim)-keyed shuffle of
    scaled-long partial sums.  ``iters`` driver round-trips total.

    Deterministic across engines (exact DuckDB oracle): init = the k
    lowest-id vectors; distances rounded to 6dp with ties broken by
    cell id; means from order-free scaled-long sums (see
    __spark_entry__._scaled_sum for the rationale)."""

    def fn(df: DataFrame) -> DataFrame:
        base = df.select(F.col(id_col),
                         F.col(vec_col).cast("array<double>").alias("__v"))
        cents = _lloyd_iterate(base, k, iters, id_col=id_col, out=out,
                               scale=scale, what="ivf_build means")
        return _km_assign(base, cents, out).select(id_col, out)

    return Stage(fn, name=f"ivf_build(k={k})", seq_preserving=False)


def _km_assign(b: DataFrame, cents: dict, out: str) -> DataFrame:
    """Nearest-centroid assignment with the engine's deterministic tie
    rules (distances rounded 6dp, ties to the lowest cell id) —
    centroids ride as literal arrays, pure codegen projection.

    r15: the expression is ONE parsed SQL string instead of per-literal
    Column calls — k x dim F.lit() py4j round trips cost ~1.2 s of
    driver time PER assignment build (and the Lloyd loop builds one
    per iteration).  Semantics unchanged: same round(aggregate(
    zip_with(...)), 6) fold in index order, same (d, c) struct
    array_min tie rule; doubles ride as CAST('repr' AS DOUBLE), which
    round-trips exactly."""
    def lit_d(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    structs = []
    for cid, c in sorted(cents.items()):
        carr = "array(" + ",".join(lit_d(x) for x in c) + ")"
        d = (f"round(aggregate(zip_with(__v, {carr}, "
             f"(a, b_) -> (a - b_) * (a - b_)), "
             f"CAST(0.0 AS DOUBLE), (s, x) -> s + x), 6)")
        structs.append(f"named_struct('d', {d}, 'c', {int(cid)})")
    expr = "array_min(array(" + ",".join(structs) + ")).c"
    return b.withColumn(out, F.expr(expr))


def _lloyd_iterate(base: DataFrame, k: int, iters: int, *, id_col: str,
                   out: str, scale: int, what: str) -> dict:
    """The deterministic Lloyd loop shared by :func:`ivf_build` and
    :func:`kmeans_fit`: init = the k lowest-id vectors; update = means
    from order-free scaled-long sums (one (cell, dim)-keyed shuffle per
    iteration, centroids driver-sized)."""
    init = base.orderBy(id_col).limit(k).collect()
    cents = {j: list(r["__v"]) for j, r in enumerate(init)}
    for _ in range(iters):
        a = _km_assign(base, cents, out)
        ex = a.select(out, F.posexplode("__v").alias("__i", "__x"))
        sv = F.round(F.col("__x") * scale).cast("long")
        sums = (ex.groupBy(out, "__i")
                  .agg(_guarded_long_sum(sv, what).alias("__s"),
                       F.count(F.lit(1)).alias("__n")))
        rows = (sums.groupBy(out)
                    .agg(F.array_sort(F.collect_list(F.struct(
                         F.col("__i"),
                         (F.col("__s").cast("double")
                          / F.col("__n").cast("double")
                          / F.lit(float(scale))).alias("m")))).alias("__a"))
                    .select(out, F.transform("__a", lambda t: t.m).alias("__c"))
                    .collect())
        cents = {r[out]: list(r["__c"]) for r in rows}
    return cents


class KMeansModel:
    """Driver-sized k-means model: ``centroids[cell] -> [d floats]``.
    Cells with no surviving members after the final update are absent
    (same sparsity ivf_build's assignment exhibits)."""

    def __init__(self, centroids: dict):
        self.centroids = {int(c): [float(x) for x in v]
                          for c, v in centroids.items()}

    @property
    def k(self) -> int:
        return len(self.centroids)


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2, *,
               vec_col: str = "embedding", id_col: str = "vec_id",
               scale: int = 1_000_000_000) -> KMeansModel:
    """Public k-means training over an embedding column (document /
    embedding clustering for mixture balancing, SemDeDup cells, drift
    monitoring).  Driver function returning the model; pair with
    :func:`kmeans_assign` for the assignment projection.  EXACTLY the
    :func:`ivf_build` quantizer loop (same init, tie, and scaled-long
    update rules — law-tested identical assignments), factored so the
    centroids are a first-class, persistable artifact instead of being
    discarded after assignment."""
    base = df.select(F.col(id_col),
                     F.col(vec_col).cast("array<double>").alias("__v"))
    return KMeansModel(_lloyd_iterate(base, k, iters, id_col=id_col,
                                      out="__cell", scale=scale,
                                      what="kmeans_fit means"))


def kmeans_assign(model: KMeansModel, *, vec_col: str = "embedding",
                  out: str = "cell") -> Stage:
    """Nearest-centroid assignment for a trained :class:`KMeansModel` —
    centroids broadcast as literals, zero shuffle, codegen."""

    def fn(df: DataFrame) -> DataFrame:
        b = df.withColumn("__v", F.col(vec_col).cast("array<double>"))
        return _km_assign(b, model.centroids, out).drop("__v")

    return Stage(fn, name=f"kmeans_assign(k={model.k})",
                 seq_preserving=True)


def kcenter_select(df: DataFrame, k: int = 8, *,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   scale: int = 1_000_000) -> "list[tuple]":
    """Greedy k-center coreset selection (Gonzalez's farthest-point
    traversal, 2-approximation): pick the min-id row as the seed, then
    k-1 times the row FARTHEST from every pick so far — the standard
    maximally-spread exemplar set for eval panels, seed centroids, and
    diversity-first data selection (:func:`mmr_select`'s corpus-global
    sibling: MMR diversifies per-query pools, k-center the corpus).

    Returns the driver-sized artifact ``[(id, sel_round, mind)]``
    (round 1..k, ``mind`` = squared-L2 distance to the nearest earlier
    pick at selection time; 0 for the seed) — k rows by construction,
    like :func:`kmeans_fit` returns its model.

    Scale shape: round t is ONE narrow scan + one max-struct aggregate
    (centers broadcast as literals, distances recomputed statelessly —
    no lineage growth, no checkpoints); total k scans with O(k·d) work
    per row in the last round.  Distances are per-term scaled-long
    sums (``Σ round((x-y)²·scale)``, the PCA-moments convention), so
    ties and picks replay bit-for-bit in any engine
    (:func:`kcenter_select_sql`)."""
    if k < 1:
        raise ValueError(f"kcenter_select: k must be >= 1, got {k}")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).where(F.col("__id").isNotNull() & F.col("__v").isNotNull()) \
        .persist()                           # k scans over one cache

    seed = base.orderBy("__id").first()
    if seed is None:
        base.unpersist()
        raise ValueError("kcenter_select: no usable rows "
                         "(NULL ids/vectors are excluded)")
    sc = float(scale)

    # r16 (the _cc_min_label driver-budget posture): the greedy loop is
    # k−1 dependent driver round-trips — each a full plan build over
    # k·dim literals plus a max-struct job, for milliseconds of compute
    # at small n.  Under an env-tunable cell budget
    # (SPARK_GRAFT_KCENTER_DRIVER_CELLS; 32M cells ≈ 256 MB numpy —
    # bounded driver memory) the SAME greedy runs vectorized on the
    # collected matrix: per-term HALF-AWAY-FROM-ZERO rounding to int64
    # (floor(v+0.5) on the non-negative squares — the r15 coarse-ranking
    # convention, bit-equal to F.round), exact int64 sums and carried
    # minima, identical (mind desc, id asc) tie rule.  Past the budget
    # — any real corpus — the distributed carried-minimum loop below
    # runs unchanged; law test forces both branches.
    import os
    cells = int(os.environ.get("SPARK_GRAFT_KCENTER_DRIVER_CELLS",
                               "32000000"))
    n_rows = base.count()
    if n_rows * max(len(seed["__v"]), 1) <= cells:
        import numpy as np
        pdf = base.toPandas()
        base.unpersist()
        ids = pdf["__id"].to_numpy()
        V = np.stack(pdf["__v"].to_numpy())
        order = np.argsort(ids, kind="stable")
        ids, V = ids[order], V[order]

        def dist_np(c):
            t = (V - c)
            return (np.floor(t * t * sc + 0.5)
                    .astype(np.int64).sum(axis=1))

        picks = [(ids[0].item(), 1, 0)]
        # exclusion is BY ID VALUE (the distributed isin filter), so a
        # duplicated id drops every row carrying it
        picked = ids == ids[0]
        mind = dist_np(V[0])
        for rnd in range(2, k + 1):
            if picked.all():
                break                        # fewer than k rows
            m = np.where(picked, np.int64(-1), mind)
            bi = int(np.argmax(m))           # argmax returns FIRST max
            # ids ascending => first max is the lowest-id tie winner
            picks.append((ids[bi].item(), rnd, int(mind[bi])))
            picked |= ids == ids[bi]
            if rnd < k:
                mind = np.minimum(mind, dist_np(V[bi]))
        return picks

    def dist_to(center):
        cl = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with(F.col("__v"), cl,
                       lambda x, y: F.round((x - y) * (x - y) * sc)
                       .cast("long")),
            F.lit(0).cast("long"), lambda s, x: s + x)

    # carried-minimum shape: each round evaluates ONE new-center
    # distance over a persisted running __mind column (higher-order
    # fns are interpreted, so re-evaluating all t-1 centers per round
    # made round cost grow with t — measured 14 s for k=16 at sf0.1,
    # ~2 s this way).  Each round's frame persists; the previous one
    # unpersists once its successor materializes.
    picks = [(seed["__id"], 1, 0)]
    cur = base.withColumn("__mind",
                          dist_to(list(seed["__v"]))).persist()
    grandparent = base                       # ≤2 live frames at a time
    try:
        for rnd in range(2, k + 1):
            best = (cur.where(~F.col("__id").isin(
                        [p[0] for p in picks]))
                    .orderBy(F.desc("__mind"), "__id").first())
            # the first() above materialized `cur`, so the frame two
            # rounds back is no longer an input to anything live
            grandparent.unpersist()
            if best is None:
                break                        # fewer than k rows
            picks.append((best["__id"], rnd, int(best["__mind"])))
            if rnd < k:
                nxt = cur.withColumn(
                    "__mind", F.least(F.col("__mind"),
                                      dist_to(list(best["__v"])))) \
                    .persist()
                grandparent = cur
                cur = nxt
    finally:
        grandparent.unpersist()
        cur.unpersist()
    return picks


def kcenter_select_sql(src_sql: str, k: int = 8, *,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       scale: int = 1_000_000) -> str:
    """DuckDB rendering of :func:`kcenter_select` — the k greedy
    rounds unrolled as static CTEs (the _sql_bpe_train precedent).
    Returns ``(id, sel_round, mind)``."""
    if k < 1:
        raise ValueError("kcenter_select_sql: k must be >= 1")
    dist = (f"CAST(list_sum([CAST(ROUND((b.v[i] - c.v[i]) "
            f"* (b.v[i] - c.v[i]) * {float(scale)!r}) AS BIGINT) "
            f"for i in range(1, len(b.v) + 1)]) AS BIGINT)")
    parts = [f"""
WITH __kb AS (
    SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM ({src_sql})
    WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL
),
__kc1 AS (SELECT id, v FROM __kb ORDER BY id LIMIT 1),
__kd1 AS (
    SELECT b.id, b.v, {dist} AS mind
    FROM __kb b, __kc1 c WHERE b.id <> c.id
)"""]
    for t in range(2, k + 1):
        parts.append(f""",
__kc{t} AS (SELECT id, v, mind FROM __kd{t - 1}
            ORDER BY mind DESC, id LIMIT 1),
__kd{t} AS (
    SELECT b.id, b.v, LEAST(b.mind, {dist}) AS mind
    FROM __kd{t - 1} b, __kc{t} c WHERE b.id <> c.id
)""")
    rounds = ["SELECT id, 1 AS sel_round, CAST(0 AS BIGINT) AS mind "
              "FROM __kc1"]
    for t in range(2, k + 1):
        rounds.append(f"SELECT id, {t} AS sel_round, mind "
                      f"FROM __kc{t}")
    parts.append("\n" + " UNION ALL ".join(rounds))
    return "".join(parts)


def ivf_search(query: Sequence[float], k: int = 10, *, vec_col: str = "embedding",
               id_col: str = "vec_id", cell_col: str = "label",
               nprobe: int = 2, centroids: Optional[DataFrame] = None,
               scale: int = 1_000_000_000) -> Stage:
    """IVF-style ANN when a coarse quantizer column already exists
    (``cell_col``, e.g. a cluster id): rank cells by centroid cosine,
    search the top ``nprobe`` cells only.

    Centroid shape (the r2 VERDICT scale fix): per-(cell, dim) means via
    ``posexplode`` + one hash aggregate — constant aggregation state per
    group, the exact plan :func:`ivf_build` uses for its update step.
    The old ``collect_list``-per-cell formulation materialized every
    vector of a cell in one buffer (executor OOM on the first hot cell
    at 100 TB).  The cell ranking never assembles centroid arrays at
    all: the dot product and norm are per-(cell, dim) products summed in
    a second tiny aggregate.

    Pass ``centroids`` — (cell, centroid array<double>), e.g. persisted
    from an :func:`ivf_build` training run — to skip the mean
    computation entirely.

    Deterministic across engines (DuckDB oracle: ivf_search_topk):
    scaled-long sums for means/dot/norm, ties on cell id and vec id."""
    scorer = cosine_to(query, vec_col)
    sc = float(scale)

    def fn(df: DataFrame) -> DataFrame:
        q = F.array(*[F.lit(float(x)) for x in query])
        if centroids is not None:
            means = centroids.select(
                F.col(cell_col),
                F.posexplode(F.col("centroid").cast("array<double>"))
                 .alias("__i", "__m"))
        else:
            v = F.col(vec_col).cast("array<double>")
            ex = df.select(F.col(cell_col), F.posexplode(v).alias("__i", "__x"))
            sv = F.round(F.col("__x") * scale).cast("long")
            means = (ex.groupBy(cell_col, "__i")
                       .agg((_guarded_long_sum(sv, "ivf_search means")
                              .cast("double")
                             / F.count(F.lit(1)).cast("double")
                             / F.lit(sc)).alias("__m")))
        # dot/n2 sums are per-cell over DIM terms (not rows): |term| ≤
        # scale·max|m·q| ≈ 2^30 for unit-ish vectors, so the 2^53 bound
        # holds for any dim < ~8e6 — guarded anyway for the policy
        qi = F.element_at(q, F.col("__i") + 1)
        dv = F.round(F.col("__m") * qi * scale).cast("long")
        nv = F.round(F.col("__m") * F.col("__m") * scale).cast("long")
        scored = (means.groupBy(cell_col)
                  .agg((_guarded_long_sum(dv, "ivf_search dot")
                         .cast("double") / F.lit(sc)).alias("__dot"),
                       (_guarded_long_sum(nv, "ivf_search norm")
                         .cast("double") / F.lit(sc)).alias("__n2")))
        ccos = F.col("__dot") / (F.sqrt(F.col("__n2")) + F.lit(1e-12))
        top_cells = (scored.orderBy(ccos.desc(), F.col(cell_col))
                           .limit(nprobe).select(cell_col))
        cand = df.join(F.broadcast(top_cells), cell_col, "semi")
        return (scorer(cand)
                .select(id_col, "cosine")
                .orderBy(F.desc("cosine"), F.col(id_col))
                .limit(k))

    return Stage(fn, name=f"ivf_search({k})", seq_preserving=False)


def vec_quantize_int8(vec_col: str = "embedding", *,
                      out: str = "q_embedding",
                      scale_out: str = "q_scale",
                      per_dim: bool = False) -> Stage:
    """Symmetric int8 quantization of an embedding column — the memory
    lever that makes 100 TB ANN tractable: 4 bytes/dim float32 (8 in
    Spark's array<double>) become 1 byte/dim, so a shard's index fits
    in a quarter (eighth) of the RAM, at a recall cost the coarse
    ANN stages (SRP buckets / IVF cells) don't even see.

    ``per_dim=False`` (default): one scale per VECTOR (its max |x| /
    127) emitted as ``scale_out`` — self-contained rows, exact for the
    vector's own largest component, no corpus statistics needed.
    ``per_dim=True``: one GLOBAL scale per DIMENSION (corpus max |x_i|
    / 127), the classic calibrated variant — one narrow (dim, max)
    aggregate broadcast into the projection; rows then need the scale
    table (returned as an array in every row for self-containment).

    q_i = clamp(round(x_i / scale), -127, 127) as array<tinyint>
    (-128 is never emitted: symmetric quantization keeps |q| ≤ 127 so
    dequantization is sign-symmetric).  Zero vectors take scale 1.0
    (all-zero codes).  Use :func:`vec_dequantize` to reconstruct;
    reconstruction error per dim ≤ scale/2."""

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        if per_dim:
            dims = (df.select(F.posexplode(v).alias("__i", "__x"))
                      .groupBy("__i")
                      .agg(F.max(F.abs(F.col("__x"))).alias("__mx")))
            scales = dims.agg(F.map_from_entries(
                F.collect_list(F.struct("__i", "__mx"))).alias("__sm"))
            scales = scales.select(F.transform(
                F.sequence(F.lit(0), F.size(F.map_keys("__sm")) - 1),
                lambda i: F.when(F.element_at("__sm", i) > 0,
                                 F.element_at("__sm", i) / 127.0)
                           .otherwise(F.lit(1.0))).alias("__scales"))
            d = df.crossJoin(F.broadcast(scales))
            q = F.zip_with(
                v, F.col("__scales"),
                lambda x, s: F.greatest(
                    F.lit(-127.0),
                    F.least(F.lit(127.0), F.round(x / s))).cast("tinyint"))
            return (d.withColumn(out, q)
                     .withColumnRenamed("__scales", scale_out))
        mx = F.aggregate(v, F.lit(0.0),
                         lambda s, x: F.greatest(s, F.abs(x)))
        scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
        d = df.withColumn(scale_out, scale)
        q = F.transform(v, lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0),
                    F.round(x / F.col(scale_out)))).cast("tinyint"))
        return d.withColumn(out, q)

    return Stage(fn, name=f"vec_quantize_int8(per_dim={per_dim})",
                 seq_preserving=True)


def vec_dequantize(q_col: str = "q_embedding", scale_col: str = "q_scale",
                   *, out: str = "embedding") -> Stage:
    """Inverse of :func:`vec_quantize_int8`: x̂_i = q_i · scale (scalar
    scale) or q_i · scale_i (per-dim array scale — detected from the
    column type).  Pure projection."""

    def fn(df: DataFrame) -> DataFrame:
        qt = df.schema[scale_col].dataType.simpleString()
        q = F.col(q_col)
        if qt.startswith("array"):
            x = F.zip_with(q, F.col(scale_col),
                           lambda a, s: a.cast("double") * s)
        else:
            x = F.transform(q, lambda a: a.cast("double")
                            * F.col(scale_col))
        return df.withColumn(out, x)

    return Stage(fn, name="vec_dequantize", seq_preserving=True)


def pq_train(df: DataFrame, *, m: int = 8, k: int = 16, iters: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id",
             scale: int = 1_000_000_000) -> "dict[int, dict[int, list[float]]]":
    """Train a Product Quantization codebook — the OTHER half of the
    100 TB ANN stack (IVF prunes the scan; PQ shrinks what remains):
    split every vector into ``m`` subvectors, learn ``k`` centroids per
    subspace (k-means-lite, the :func:`ivf_build` recipe), so a vector
    compresses to ``m`` small codes (m bytes at k ≤ 256) instead of
    ``dim`` doubles — 64× for dim=64, m=8.

    Returns the codebook as driver-sized nested dicts
    ``{sub: {code: centroid}}`` (m × k × dim/m floats — a few KB; this
    is the MODEL, like a query vector, and rides to executors inside
    the broadcast encode UDF).  Deterministic: init per subspace = the
    k lowest-id subvectors; nearest-code assignment is numpy float64
    with first-minimum (lowest code) ties; means via guarded
    scaled-long sums.

    Plan per iteration: assignment = the SAME Arrow-vectorized
    :func:`pq_encode` kernel users run (one code path, no
    train/serve skew); update is ONE (sub, code, dim)-keyed shuffle of
    scaled-long partials."""
    if m < 1 or k < 1:
        raise ValueError(f"need m >= 1 and k >= 1, got m={m}, k={k}")
    v = F.col(vec_col).cast("array<double>")
    first = df.select(F.size(v).alias("__d")).first()
    dim = int(first["__d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m

    init = (df.select(F.col(id_col), v.alias("__v"))
              .orderBy(id_col).limit(k).collect())
    book: dict[int, dict[int, list[float]]] = {
        s: {c: [float(x) for x in r["__v"][s * sub_d:(s + 1) * sub_d]]
            for c, r in enumerate(init)}
        for s in range(m)}

    for _ in range(iters):
        a = pq_encode(book, vec_col=vec_col, out="__codes")(df)
        ex = (a.select(F.explode(F.array(*[
                  F.struct(F.lit(s).alias("__s"),
                           F.element_at("__codes", s + 1).alias("__code"),
                           F.slice(v, s * sub_d + 1, sub_d).alias("__sub"))
                  for s in range(m)])).alias("__e"))
               .select(F.col("__e.__s").alias("__s"),
                       F.col("__e.__code").alias("__code"),
                       F.posexplode("__e.__sub").alias("__i", "__x")))
        sv = F.round(F.col("__x") * scale).cast("long")
        sums = (ex.groupBy("__s", "__code", "__i")
                  .agg(_guarded_long_sum(sv, "pq_train means").alias("__sm"),
                       F.count(F.lit(1)).alias("__n")))
        rows = (sums.groupBy("__s", "__code")
                    .agg(F.array_sort(F.collect_list(F.struct(
                         F.col("__i"),
                         (F.col("__sm").cast("double")
                          / F.col("__n").cast("double")
                          / F.lit(float(scale))).alias("mn")))).alias("__a"))
                    .select("__s", "__code",
                            F.transform("__a", lambda t: t.mn).alias("__c"))
                    .collect())
        for r in rows:
            book[int(r["__s"])][int(r["__code"])] = \
                [float(x) for x in r["__c"]]
    return book


def pq_encode(book: "dict[int, dict[int, list[float]]]", *,
              vec_col: str = "embedding", out: str = "pq_codes") -> Stage:
    """Encode vectors under a :func:`pq_train` codebook: ``out`` =
    array of ``m`` nearest-centroid codes.  No shuffle; at k ≤ 256 the
    codes array is m bytes of information per vector (stored as ints
    here; cast to binary at the write if bytes matter).

    The kernel is an Arrow-vectorized numpy UDF — the sanctioned
    Python-on-the-hot-path exception: per (sub, code) distances are
    (n, k, sub_d) float64 broadcasting, which column algebra can only
    express as an m·k·sub_d-node expression tree that overflows
    janino's 64 KB codegen method limit and falls back to interpreted
    row-at-a-time evaluation (measured: the numpy batch path encodes
    sf0.1 in ~0.2 s where the expression tree took ~5-9 s).  Ties go
    to the lowest code (numpy first-minimum over the sorted code
    axis); the same kernel drives training assignment, so there is no
    train/serve skew."""
    from pyspark.sql.types import ArrayType, IntegerType

    m = len(book)
    sub_d = len(book[0][0])
    code_ids = [_np.array(sorted(book[s]), dtype=_np.int64)
                for s in range(m)]
    cents = [_np.array([book[s][c] for c in sorted(book[s])],
                       dtype=_np.float64) for s in range(m)]

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        V = _np.array([_np.asarray(x, dtype=_np.float64) for x in col])
        codes = _np.empty((len(V), m), dtype=_np.int64)
        for s in range(m):
            sub = V[:, s * sub_d:(s + 1) * sub_d]
            diff = sub[:, None, :] - cents[s][None, :, :]
            d = (diff * diff).sum(axis=2)
            codes[:, s] = code_ids[s][d.argmin(axis=1)]
        return pd.Series([row.tolist() for row in codes])

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        return df.withColumn(out, encode(v))

    return Stage(fn, name=f"pq_encode(m={m})", seq_preserving=True)


def pq_search(book: "dict[int, dict[int, list[float]]]",
              query: Sequence[float], kk: int = 10, *,
              codes_col: str = "pq_codes", id_col: str = "vec_id",
              out: str = "approx_dist") -> Stage:
    """Asymmetric-distance (ADC) top-k over PQ codes: precompute the
    query→centroid distance table driver-side (m × k floats), broadcast
    it as literals, and score each row as a SUM OF TABLE LOOKUPS over
    its codes — no vector math per row, no shuffle, exact
    TakeOrderedAndProject top-k on the approximate distance (smallest
    squared L2 first, ties by id).

    This is the scan shape IVF-PQ engines run inside each probed cell:
    the raw vectors never load — only m small codes per row."""
    m = len(book)
    sub_d = len(book[0][0])
    if len(query) != m * sub_d:
        raise ValueError(
            f"query dim {len(query)} != codebook dim {m * sub_d}")
    dtab = []
    for s in range(m):
        qs = [float(x) for x in query[s * sub_d:(s + 1) * sub_d]]
        row = [round(sum((a - b) * (a - b) for a, b in zip(qs, book[s][c])), 6)
               for c in sorted(book[s])]
        dtab.append(row)

    def fn(df: DataFrame) -> DataFrame:
        dist = None
        for s in range(m):
            lut = F.array(*[F.lit(x) for x in dtab[s]])
            term = F.element_at(lut, F.element_at(codes_col, s + 1)
                                .cast("int") + 1)
            dist = term if dist is None else dist + term
        return (df.withColumn(out, F.round(dist, 6))
                  .select(id_col, out)
                  .orderBy(F.asc(out), F.col(id_col))
                  .limit(kk))

    return Stage(fn, name=f"pq_search({kk})", seq_preserving=False)


def cell_centroids(df: DataFrame, *, cell_col: str = "cell",
                   vec_col: str = "embedding",
                   scale: int = 1_000_000_000) -> "dict[int, list[float]]":
    """Collect per-cell mean vectors as a driver-sized dict (cells ×
    dim doubles — the coarse-quantizer MODEL).  One (cell, dim)-keyed
    aggregate of guarded scaled-long partials; deterministic means
    (same arithmetic as :func:`ivf_build`)."""
    v = F.col(vec_col).cast("array<double>")
    ex = df.select(F.col(cell_col).alias("__c"),
                   F.posexplode(v).alias("__i", "__x"))
    sv = F.round(F.col("__x") * scale).cast("long")
    sums = (ex.groupBy("__c", "__i")
              .agg(_guarded_long_sum(sv, "cell_centroids").alias("__s"),
                   F.count(F.lit(1)).alias("__n")))
    rows = (sums.groupBy("__c")
                .agg(F.array_sort(F.collect_list(F.struct(
                     F.col("__i"),
                     (F.col("__s").cast("double")
                      / F.col("__n").cast("double")
                      / F.lit(float(scale))).alias("m")))).alias("__a"))
                .select("__c", F.transform("__a", lambda t: t.m).alias("__v"))
                .collect())
    return {int(r["__c"]): [float(x) for x in r["__v"]] for r in rows}


def ivfpq_search(book: "dict[int, dict[int, list[float]]]",
                 centroids: "dict[int, list[float]]",
                 query: Sequence[float], kk: int = 10, *,
                 nprobe: int = 2, cell_col: str = "cell",
                 codes_col: str = "pq_codes", id_col: str = "vec_id",
                 out: str = "approx_dist") -> Stage:
    """The full IVF-PQ scan: rank cells by query→centroid distance
    DRIVER-side (the centroid table is the model — k × dim floats),
    keep the ``nprobe`` closest, and run :func:`pq_search`'s ADC
    table-lookup scoring over only those cells' code rows.

    This is the production ANN shape at 100 TB: the coarse quantizer
    prunes the scan to nprobe/k of the corpus (partition pruning when
    the table is written partitionBy(cell)), and PQ means the scanned
    rows are m-byte codes, not dim×8-byte vectors.  Deterministic:
    cell ranking rounds to 6dp with cell-id ties; ADC inherits
    :func:`pq_search`'s rounding."""
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    ranked = sorted(
        ((round(sum((float(q) - c) * (float(q) - c)
                    for q, c in zip(query, cv)), 6), cid)
         for cid, cv in centroids.items()))
    probe_cells = [cid for _, cid in ranked[:nprobe]]
    inner = pq_search(book, query, kk, codes_col=codes_col,
                      id_col=id_col, out=out)

    def fn(df: DataFrame) -> DataFrame:
        cand = df.where(F.col(cell_col).isin(probe_cells))
        return inner(cand)

    return Stage(fn, name=f"ivfpq_search({kk},nprobe={nprobe})",
                 seq_preserving=False)


class SQModel:
    """Driver-sized scalar-quantization model: per-dimension
    ``mins``/``maxs`` (d floats each — the Faiss SQ8 trained state).
    Like :class:`KMeansModel`, a bounded first-class artifact that
    rides to executors as plan literals."""

    def __init__(self, mins, maxs):
        self.mins = [float(x) for x in mins]
        self.maxs = [float(x) for x in maxs]
        if len(self.mins) != len(self.maxs):
            raise ValueError(f"mins/maxs length mismatch: "
                             f"{len(self.mins)} vs {len(self.maxs)}")

    @property
    def dim(self) -> int:
        return len(self.mins)


def sq_train(df: DataFrame, *, vec_col: str = "embedding") -> SQModel:
    """Train 8-bit scalar quantization (Faiss SQ8): per-dimension
    global min/max over the corpus — the third leg of the compressed
    ANN stack (IVF prunes the scan, PQ shrinks to m bytes with a
    codebook, SQ shrinks to d bytes with NO codebook: 8× vs float64,
    and unlike PQ the decode is a two-literal affine map, pure
    codegen, no table lookups).

    Plan: one posexplode to narrow (dim, value) rows + one d-group
    min/max agg (map-side partial combine makes the shuffle d rows per
    partition) + a 2×d driver fetch (the centroid/codebook bounded-
    model-fetch convention).  Min/max are exact SELECTIONS — no
    arithmetic — so the model replays in any engine bit-for-bit.
    NULL vectors and vectors with NULL elements are excluded (the
    vector_moments rule); MIXED dimensions raise — inferring d from
    an arbitrary row would make the trained model depend on partition
    order (raise-loudly posture)."""
    v = F.col(vec_col).cast("array<double>")
    clean = df.where(v.isNotNull()
                     & ~F.exists(v, lambda x: x.isNull())).select(v.alias("__v"))
    dims = [r["__d"] for r in
            clean.select(F.size("__v").alias("__d")).distinct().collect()]
    if not dims:
        raise ValueError("sq_train: no usable vectors (all NULL or "
                         "containing NULL elements)")
    if len(dims) > 1:
        raise ValueError(f"sq_train: mixed vector dimensions "
                         f"{sorted(dims)} — quantization bounds are "
                         f"per-dimension; clean the corpus first")
    d = dims[0]
    rows = (clean.select(F.posexplode("__v").alias("__i", "__x"))
                 .groupBy("__i")
                 .agg(F.min("__x").alias("mn"), F.max("__x").alias("mx"))
                 .collect())
    got = {r["__i"]: (r["mn"], r["mx"]) for r in rows}
    return SQModel([got[i][0] for i in range(d)],
                   [got[i][1] for i in range(d)])


def sq_encode(model: SQModel, *, vec_col: str = "embedding",
              out: str = "sq_codes") -> Stage:
    """Encode vectors under an :class:`SQModel`:
    ``code_i = clamp(round((x_i - mn_i) * 255 / (mx_i - mn_i)), 0,
    255)`` (degenerate dims with mx == mn encode 0).  Pure
    transform-with-index column algebra — no Python, no shuffle; the
    codes column bit-packs to ~1 byte/dim in parquet.  NULL / wrong-
    length vectors are dropped (same rule as :func:`sq_train`)."""
    d = model.dim
    mn = F.array(*[F.lit(x) for x in model.mins])
    mx = F.array(*[F.lit(x) for x in model.maxs])

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")

        def code(x, i):
            lo = F.element_at(mn, i + 1)
            hi = F.element_at(mx, i + 1)
            q = F.round((x - lo) * F.lit(255.0) / (hi - lo)).cast("int")
            return F.when(hi == lo, F.lit(0)).otherwise(
                F.greatest(F.lit(0), F.least(F.lit(255), q)))

        return (df.where(v.isNotNull() & (F.size(v) == d)
                         & ~F.exists(v, lambda x: x.isNull()))
                  .withColumn(out, F.transform(v, code)))

    return Stage(fn, name=f"sq_encode(d={d})", seq_preserving=True)


def sq_search(model: SQModel, query, kk: int = 10, *,
              codes_col: str = "sq_codes", id_col: str = "vec_id",
              out: str = "approx_dist") -> Stage:
    """Asymmetric top-``kk`` over SQ codes (:func:`pq_search`'s ADC
    shape without the lookup table): each row scores
    ``sum_i (q_i - (mn_i + code_i * s_i))²`` with ``s_i =
    (mx_i - mn_i)/255`` — the float query against the AFFINE DECODE of
    the 1-byte codes, so vectors stay compressed end-to-end.  One
    whole-stage-codegen projection + exact TakeOrderedAndProject
    (dist asc rounded to 6dp, ties by id) — no shuffle, no Python.
    The expression shape (subtract-then-square in dimension order,
    sequential fold) is pinned so DuckDB replays bit-for-bit."""
    if kk < 1:
        raise ValueError(f"need kk >= 1, got kk={kk}")
    if len(query) != model.dim:
        raise ValueError(f"query dim {len(query)} != model dim "
                         f"{model.dim}")
    q = F.array(*[F.lit(float(x)) for x in query])
    mn = F.array(*[F.lit(x) for x in model.mins])
    sc = F.array(*[F.lit((hi - lo) / 255.0)
                   for lo, hi in zip(model.mins, model.maxs)])

    def fn(df: DataFrame) -> DataFrame:
        c = F.col(codes_col)

        def term(x, i):
            # explicit d*d, not pow(d, 2): libm pow parity across
            # engines is not guaranteed; multiplication is IEEE-exact
            d_ = (F.element_at(q, i + 1)
                  - (F.element_at(mn, i + 1)
                     + x.cast("double") * F.element_at(sc, i + 1)))
            return d_ * d_

        terms = F.transform(c, term)
        dist = F.round(F.aggregate(
            terms, F.lit(0.0), lambda a, t: a + t), 6)
        # rows not produced by sq_encode (NULL / wrong-width codes)
        # score NULL and ASC NULLS FIRST would fill the top-k with
        # them — mirror sq_encode's drop rule before scoring.  Fenced:
        # a plain .filter would be alias-substituted through
        # sq_encode's transform projection (the r8 giant-filter smell
        # — the whole 256-term encode expression re-inlined into an
        # interpreted per-row predicate).
        from conduino_spark.plans.core import fenced_where
        return (fenced_where(df, c.isNotNull() & (F.size(c) == model.dim))
                .select(F.col(id_col), dist.alias(out))
                .orderBy(out, id_col).limit(kk))

    return Stage(fn, name=f"sq_search({kk})", seq_preserving=False)


def sq_sql(kk: int = 10, *, table: str = "embeddings",
           id_col: str = "vec_id", vec_col: str = "embedding",
           query_id: int = 0) -> str:
    """DuckDB rendering of :func:`sq_train` + :func:`sq_encode` +
    :func:`sq_search` end-to-end (train min/max from the same table,
    encode every row, score against ``query_id``'s raw vector) —
    bit-identical: exact-selection bounds, the same
    round/clamp encode, the same subtract-then-square decode shape,
    list_sum over dimension order for the fold, and the same
    NULL-vector / NULL-element exclusions (mixed dimensions raise
    Spark-side, so the oracle need not model them)."""
    return f"""
        WITH e AS (SELECT {id_col} AS vid,
                          CAST({vec_col} AS DOUBLE[]) AS v
                   FROM {table}
                   WHERE {vec_col} IS NOT NULL
                     AND len(list_filter(CAST({vec_col} AS DOUBLE[]),
                                         x -> x IS NULL)) = 0),
        mm AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx
               FROM (SELECT unnest(v) AS x,
                            generate_subscripts(v, 1) AS i FROM e)
               GROUP BY i),
        q AS (SELECT v AS qv FROM e WHERE vid = {query_id}),
        term AS (SELECT e.vid, mm.i,
                        CASE WHEN mm.mx = mm.mn THEN 0
                             ELSE greatest(0, least(255,
                                  CAST(round((e.v[mm.i] - mm.mn) * 255.0
                                             / (mm.mx - mm.mn))
                                       AS INTEGER)))
                        END AS code
                 FROM e, mm),
        sco AS (SELECT term.vid,
                       round(list_sum(list(
                           (q.qv[term.i] - (mm.mn + term.code
                                            * ((mm.mx - mm.mn) / 255.0)))
                           * (q.qv[term.i] - (mm.mn + term.code
                                              * ((mm.mx - mm.mn) / 255.0)))
                           ORDER BY term.i)), 6) AS approx_dist
                FROM term JOIN mm USING (i), q
                GROUP BY term.vid)
        SELECT vid AS {id_col}, approx_dist FROM sco
        ORDER BY approx_dist, {id_col} LIMIT {kk}"""


def ivf_index_write(df: DataFrame, path: str, model: KMeansModel, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    cell_col: "Optional[str]" = None,
                    mode: str = "overwrite") -> None:
    """Materialize the IVF index ONCE — the dense twin of
    :func:`~conduino_spark.operators.search.bm25_index_write`: assign
    every vector to its nearest :class:`KMeansModel` centroid
    (broadcast literals, zero shuffle) and write the corpus
    ``partitionBy(cell)``, with the centroids stored alongside so
    probes rank cells from the SAME quantizer (in-band model — the
    n_shards rule; drift between assignment and ranking is
    impossible).  Probes then read only their nprobe cell directories
    (dynamic partition pruning, plan-asserted in tests) instead of
    scanning the corpus.

    The write repartitions BY cell first (the lsh_index_write
    file-churn rule: without it every input task writes a file into
    every cell directory).

    ``cell_col`` (r11, bring-your-own-partitioner): when the corpus
    already carries a cluster/cell id column, pass its name to bucket
    by it VERBATIM instead of nearest-centroid assignment — ``model``
    is then stored in-band purely for probe-time cell RANKING (the
    :func:`ann_join` ``centroids=`` contract: with centroids equal to
    the per-cell data means, the persisted probe is bit-equal to the
    in-memory ``ann_join(cell_col=...)``).  NULL cells are dropped
    (ann_join's universe rule)."""
    if cell_col is not None:
        assigned = (df.where(F.col(vec_col).isNotNull()
                             & F.col(cell_col).isNotNull())
                      .withColumn("cell", F.col(cell_col).cast("long")))
    else:
        assigned = kmeans_assign(model, vec_col=vec_col, out="cell")(
            df.where(F.col(vec_col).isNotNull()))
    (assigned.select(F.col(id_col), F.col(vec_col), F.col("cell"))
             .repartition(max(model.k, 1), "cell")
             .write.partitionBy("cell").mode(mode)
             .parquet(f"{path}/vectors"))
    # driver-side write (r11): the model is a driver dict; a Spark job
    # for a k-row table paid the ~4.3 s job-commit floor per cold build
    _driver_parquet_write(f"{path}/centroids",
                          _centroids_arrow(model.centroids), mode=mode)


def ivf_index_join(index_path: str, k: int = 10, *, nprobe: int = 2,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_self: bool = False,
                   kernel: str = "exact") -> Stage:
    """:func:`ann_join` against a persisted :func:`ivf_index_write`
    index: identical output (law-tested bit-equal), but cell ranking
    uses the stored quantizer (a k×d bounded model fetch — no
    corpus-wide mean scan at probe time) and the candidate join reads
    only the probed cell directories of the partitioned corpus."""

    def fn(queries: DataFrame) -> DataFrame:
        spark = queries.sparkSession
        # bounded model fetch, driver-side (r11 — no Spark read job)
        cents = {int(r["cell"]): [float(x) for x in r["centroid"]]
                 for r in _driver_parquet_read(f"{index_path}/centroids")}
        corpus = spark.read.parquet(f"{index_path}/vectors")
        return ann_join(corpus, k, nprobe=nprobe, vec_col=vec_col,
                        id_col=id_col, cell_col="cell",
                        exclude_self=exclude_self, kernel=kernel,
                        centroids=cents)(queries)

    return Stage(fn, name=f"ivf_index_join({k},nprobe={nprobe})",
                 seq_preserving=False)


def ivf_index_merge(new_vecs: DataFrame, path: str, *,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    cell_col: "Optional[str]" = None) -> None:
    """Fold a NEW vector batch into an existing :func:`ivf_index_write`
    index — incremental dense-index maintenance, the twin of
    :func:`~conduino_spark.operators.search.bm25_index_merge` (a daily
    embedding-ingest run appends here instead of rebuilding the index
    over the whole corpus).

    One append, no rewrite: new vectors are assigned under the STORED
    quantizer (the in-band ``centroids/`` table — assignment drift vs
    the cells probes rank by is impossible) and land as new files
    inside the cell directories they hash to.  The quantizer itself is
    never touched — an IVF index's centroids are FROZEN at build time
    (the Faiss posture: re-clustering would re-home existing vectors,
    forcing a full rewrite).  Because assignment is a pure function of
    (vector, stored centroids), a probe against the merged index is
    BIT-EQUAL to a from-scratch :func:`ivf_index_write` rebuild over
    the union corpus with the same model (law-tested, both kernels).
    Cost scales with the NEW batch only — the existing vectors are
    never read.

    Contract: append-only — caller guarantees new ids are not already
    indexed (anti-join upstream; checking here would scan the corpus,
    defeating the point).

    Cites reference semantics: conduino has no index maintenance; this
    is a north-star engine extension (SURVEY §7)."""
    spark = new_vecs.sparkSession
    try:
        cent_rows = _driver_parquet_read(f"{path}/centroids")
    except Exception as e:
        raise ValueError(
            f"no IVF index at {path} (missing centroids/): build one "
            f"with ivf_index_write before merging") from e
    if not cent_rows:
        raise ValueError(f"IVF index at {path} has an empty quantizer")
    model = KMeansModel({int(r["cell"]): [float(x) for x in r["centroid"]]
                         for r in cent_rows})
    if cell_col is not None:
        # bring-your-own-partitioner index (ivf_index_write cell_col
        # mode): the batch carries its cell id — bucket by it verbatim
        assigned = (new_vecs.where(F.col(vec_col).isNotNull()
                                   & F.col(cell_col).isNotNull())
                            .withColumn("cell",
                                        F.col(cell_col).cast("long")))
    else:
        assigned = kmeans_assign(model, vec_col=vec_col, out="cell")(
            new_vecs.where(F.col(vec_col).isNotNull()))
    (assigned.select(F.col(id_col), F.col(vec_col), F.col("cell"))
             .repartition(max(model.k, 1), "cell")
             .write.partitionBy("cell").mode("append")
             .parquet(f"{path}/vectors"))


def ivfpq_index_write(df: DataFrame, path: str, model: KMeansModel,
                      book: "dict[int, dict[int, list[float]]]", *,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      cell_col: "Optional[str]" = None,
                      mode: str = "overwrite") -> None:
    """Materialize the full compressed-ANN index ONCE — the persisted
    form of the :func:`ivfpq_search` production shape (Faiss
    IndexIVFPQ on disk): assign every vector to its nearest
    :class:`KMeansModel` centroid, :func:`pq_encode` it under the
    codebook, and write ONLY (id, pq_codes) ``partitionBy(cell)`` —
    m small codes per row on disk instead of dim×8-byte vectors, and
    probes read just their nprobe cell directories (partition pruning
    on the literal probe cells, plan-asserted in tests).

    BOTH models are stored in-band (``centroids/`` like
    :func:`ivf_index_write`, plus ``codebook/`` as (sub, code,
    centroid) rows), so cell ranking, ADC tables, and any later
    :func:`ivfpq_index_merge` all derive from the exact artifacts the
    codes were built with — drift between encode and scoring is
    impossible.

    ``cell_col`` (r11): bring-your-own-partitioner, as in
    :func:`ivf_index_write` — bucket by an existing cluster column,
    store ``model`` in-band for probe-time cell ranking only."""
    m = len(book)
    if cell_col is not None:
        assigned = (df.where(F.col(vec_col).isNotNull()
                             & F.col(cell_col).isNotNull())
                      .withColumn("cell", F.col(cell_col).cast("long")))
    else:
        assigned = kmeans_assign(model, vec_col=vec_col, out="cell")(
            df.where(F.col(vec_col).isNotNull()))
    coded = pq_encode(book, vec_col=vec_col, out="pq_codes")(assigned)
    (coded.select(F.col(id_col), F.col("pq_codes"), F.col("cell"))
          .repartition(max(model.k, 1), "cell")
          .write.partitionBy("cell").mode(mode)
          .parquet(f"{path}/codes"))
    # driver-side writes (r11): both models are driver dicts; two Spark
    # jobs here paid 2× the ~4.3 s job-commit floor per cold build
    import pyarrow as _pa
    _driver_parquet_write(f"{path}/centroids",
                          _centroids_arrow(model.centroids), mode=mode)
    rows = [(s, int(c), [float(x) for x in book[s][c]])
            for s in range(m) for c in sorted(book[s])]
    _driver_parquet_write(
        f"{path}/codebook",
        _pa.table({"sub": _pa.array([r[0] for r in rows], _pa.int32()),
                   "code": _pa.array([r[1] for r in rows], _pa.int32()),
                   "centroid": _pa.array([r[2] for r in rows],
                                         _pa.list_(_pa.float64()))}),
        mode=mode)


def ivfpq_index_read(spark, path: str):
    """Load a persisted :func:`ivfpq_index_write` index: returns
    ``(codes_df, book, centroids)`` — the corpus codes frame (lazy,
    partition-pruned when filtered on ``cell``) plus both in-band
    models as the driver-sized dicts :func:`ivfpq_search` takes.
    Compositional by design: ``ivfpq_search(book, cents, qv, kk,
    nprobe)(codes_df)`` is the probe, so the persisted path runs the
    SAME scan stage as the in-memory one (bit-equal, law-tested)."""
    try:
        # bounded model fetches, driver-side (r11 — no Spark read jobs)
        cent_rows = _driver_parquet_read(f"{path}/centroids")
        book_rows = _driver_parquet_read(f"{path}/codebook")
    except Exception as e:
        raise ValueError(
            f"no IVF-PQ index at {path} (missing centroids/ or "
            f"codebook/): build one with ivfpq_index_write") from e
    if not cent_rows or not book_rows:
        raise ValueError(f"IVF-PQ index at {path} has an empty model")
    cents = {int(r["cell"]): [float(x) for x in r["centroid"]]
             for r in cent_rows}
    book: dict[int, dict[int, list[float]]] = {}
    for r in book_rows:
        book.setdefault(int(r["sub"]), {})[int(r["code"])] = \
            [float(x) for x in r["centroid"]]
    return spark.read.parquet(f"{path}/codes"), book, cents


def ivfpq_index_merge(new_vecs: DataFrame, path: str, *,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      cell_col: "Optional[str]" = None) -> None:
    """Fold a NEW vector batch into a persisted
    :func:`ivfpq_index_write` index — the compressed twin of
    :func:`ivf_index_merge`: assign AND encode under the STORED
    (frozen) quantizer + codebook, append into the cell directories.
    One append; neither model is touched; probes against the merged
    index are BIT-EQUAL to a from-scratch rebuild over the union
    corpus under the same models (law-tested).  Cost scales with the
    new batch only.  Append-only contract as for the other merges."""
    spark = new_vecs.sparkSession
    _, book, cents = ivfpq_index_read(spark, path)
    model = KMeansModel(cents)
    if cell_col is not None:
        assigned = (new_vecs.where(F.col(vec_col).isNotNull()
                                   & F.col(cell_col).isNotNull())
                            .withColumn("cell",
                                        F.col(cell_col).cast("long")))
    else:
        assigned = kmeans_assign(model, vec_col=vec_col, out="cell")(
            new_vecs.where(F.col(vec_col).isNotNull()))
    coded = pq_encode(book, vec_col=vec_col, out="pq_codes")(assigned)
    (coded.select(F.col(id_col), F.col("pq_codes"), F.col("cell"))
          .repartition(max(model.k, 1), "cell")
          .write.partitionBy("cell").mode("append")
          .parquet(f"{path}/codes"))


def ann_join(corpus: DataFrame, k: int = 10, *, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             cell_col: str = "label", out_id: str = "neighbor_id",
             out_cos: str = "cosine", exclude_self: bool = False,
             kernel: str = "exact",
             centroids: "Optional[dict]" = None,
             cell_split: "int | str" = "auto",
             scale: int = 1_000_000_000) -> Stage:
    """Batched ANN JOIN: for EVERY query vector, its top-``k`` cosine
    neighbors from ``corpus`` — the all-rows counterpart of the
    single-query :func:`knn_lsh`/:func:`ivf_search` probes, and the
    workhorse of retrieval-augmented pipelines (nearest-passage lookup
    for a whole training batch) and kNN-graph construction.

    Output: one row per (query, neighbor) — (id_col, out_id, out_cos,
    rank), rank 1..k by (cosine desc, neighbor id).

    100 TB plan — never all-pairs: the corpus is bucketed by its coarse
    cells (``cell_col``, e.g. an :func:`ivf_build` assignment or any
    cluster id); per-(cell, dim) centroid means come from ONE hash
    aggregate of scaled-long partials (constant state per group — the
    r2 collect_list OOM fix); every query ranks the C cells via a
    BROADCAST join of the tiny (cell, dim, mean) table and probes only
    its ``nprobe`` best, so the candidate join moves each query
    ``nprobe`` times and each corpus row once per its cell — both
    equi-joins on the cell key.  Per-query top-k is one window over the
    candidate set.

    Deterministic across engines (DuckDB oracle in
    tests/test_round7.py): scaled-long centroid means/dots, cosine
    rounded to 6, ties by (cell) then (neighbor id).

    ``kernel``: "exact" (default) scores pairs with the JVM fold —
    bit-replayable in DuckDB, but interpreted per pair; "gemm" scores
    each cell as ONE numpy matrix product (queries-probing-the-cell ×
    cell corpus) via ``cogroup + applyInPandas`` — the Faiss-style
    blocked kernel a 100 TB batch actually runs (measured ~5-10×
    faster at sf0.1).  Same candidates, same per-cell-top-k ⊆
    global-top-k containment, same (cosine desc, id) tie rule; the
    only difference is summation order inside the dot product, so
    cosines can differ in the last ulp before the 6-decimal round
    (law-tested against "exact" in tests/test_round7.py).

    ``cell_split`` (r15 — found by the real-sf1 scale probe): the
    candidate join's key is the CELL id, so its parallelism is
    bounded by the number of cells, and AQE then coalesces the
    byte-small-but-compute-huge partitions further (the 6k-vector
    diagnosis ran the whole candidate stage in ONE task).  Each cell
    is therefore split into S deterministic sub-cells —
    ``pmod(hash(id), S)`` on the corpus side, probe replication on
    the query side — and the exact path repartitions BOTH join
    sides by (cell, sub) with an explicit partition count, which AQE
    may not coalesce.  The candidate SET is unchanged (every corpus
    row lives in exactly one sub, every probing query meets every
    sub), so results are bit-identical; only the parallelism
    changes.  "auto" sizes S ≈ defaultParallelism / n_cells (one
    tiny distinct-count when no ``centroids`` model is given);
    an int pins it; 1 disables."""
    if k < 1 or nprobe < 1:
        raise ValueError(f"need k >= 1 and nprobe >= 1, got k={k}, "
                         f"nprobe={nprobe}")
    if kernel not in ("exact", "gemm"):
        raise ValueError(f"kernel must be 'exact' or 'gemm', got {kernel!r}")
    if cell_split != "auto" and (not isinstance(cell_split, int)
                                 or cell_split < 1):
        raise ValueError(f"cell_split must be 'auto' or an int >= 1, "
                         f"got {cell_split!r}")
    from pyspark.sql import Window
    sc = float(scale)

    def fn(queries: DataFrame) -> DataFrame:
        cvec = F.col(vec_col).cast("array<double>")
        # NULL cells / NULL vectors are dropped up front so BOTH
        # kernels see the same universe: the exact path's equi-join on
        # __cell never matches NULLs anyway, while cogroup would pair
        # NULL-to-NULL (and np.asarray(None) crashes the gemm kernel).
        corp = (corpus.where(F.col(cell_col).isNotNull()
                             & F.col(vec_col).isNotNull())
                      .select(F.col(cell_col).alias("__cell"),
                              F.col(id_col).alias(out_id),
                              cvec.alias("__cv")))
        queries = queries.where(F.col(vec_col).isNotNull())
        # per-(cell, dim) centroid means — ivf_search's aggregate shape
        # (fresh scan, not derived from `corp`: sharing the lineage
        # makes the later corp-join ambiguous on __cell; same NULL
        # filter so both sides see the same universe).  When
        # ``centroids`` is given (a {cell: [d floats]} model, e.g.
        # :func:`cell_centroids`/:class:`KMeansModel` output, or the
        # in-band quantizer :func:`ivf_index_join` reads back), the
        # corpus-wide mean scan is SKIPPED — the model becomes a tiny
        # literal table and the only corpus access left is the pruned
        # candidate join.  Cells absent from the model are never
        # probed.  cell_n2 derives from the literal means through the
        # SAME expressions, so rankings stay bit-identical to the
        # data-derived path when the model equals the data means
        # (law-tested).
        if centroids is not None:
            means = queries.sparkSession.createDataFrame(
                [(int(c), i, float(x))
                 for c, v in centroids.items()
                 for i, x in enumerate(v)],
                "__cell long, __i int, __m double")
        else:
            ex = (corpus.where(F.col(cell_col).isNotNull())
                        .select(F.col(cell_col).alias("__cell"),
                                F.posexplode(cvec).alias("__i", "__x")))
            sv = F.round(F.col("__x") * scale).cast("long")
            means = (ex.groupBy("__cell", "__i")
                       .agg((_guarded_long_sum(sv, "ann_join means")
                              .cast("double")
                             / F.count(F.lit(1)).cast("double")
                             / F.lit(sc)).alias("__m")))
        # rank cells PER QUERY (r15 rewrite — found by the real-sf1
        # probe): the old path posexploded every query vector and
        # joined the means on the dim index, materializing n·d·C rows
        # through a shuffle aggregate — with cells scaling alongside
        # the corpus that is O(N²d/cell_size), and it dominated the
        # scaled-cell probe at 10x.  The means table is tiny (C·d
        # rows), so collect it once and score every query against all
        # cells in ONE Arrow pass.  BIT-IDENTICAL by construction:
        # the kernel reproduces the exact scaled-long formula —
        # per-term HALF_UP round (Spark's F.round, NOT numpy's
        # half-even) summed in int64 — so dots, ccos doubles, and the
        # (ccos desc, cell asc) ranking are the same numbers the SQL
        # aggregate produced (ann_join_emb / knn_methods gate pins
        # replay hash-green; DuckDB oracle unchanged).
        mrows = means.collect()
        qv = F.col(vec_col).cast("array<double>")
        cell_type = corpus.schema[cell_col].dataType
        from pyspark.sql.types import StructField, StructType
        probe_schema = StructType([
            StructField(id_col, queries.schema[id_col].dataType),
            StructField("__cell", cell_type),
        ])
        if not mrows:
            probes = queries.sparkSession.createDataFrame(
                [], probe_schema)
        else:
            cells_sorted = sorted({r["__cell"] for r in mrows})
            cidx = {c: j for j, c in enumerate(cells_sorted)}
            dmax = max(r["__i"] for r in mrows) + 1
            cmat = _np.zeros((len(cells_sorted), dmax))
            for r in mrows:
                cmat[cidx[r["__cell"]], r["__i"]] = r["__m"]

            def _half_up(a):
                # Spark round(double): HALF AWAY FROM ZERO
                return _np.sign(a) * _np.floor(_np.abs(a) + 0.5)

            nn2 = (_half_up(cmat * cmat * sc).astype(_np.int64)
                   .sum(axis=1) / sc)
            sq_n2 = _np.sqrt(nn2) + 1e-12
            cells_np = list(cells_sorted)
            npr = min(nprobe, len(cells_sorted))

            def rank_cells(batches):
                import pandas as _pd
                for pdf in batches:
                    if not len(pdf):
                        continue
                    Q = _np.array([_np.asarray(v, dtype=_np.float64)
                                   for v in pdf["__qv"]])
                    m = min(Q.shape[1], dmax)
                    ids, outc = [], []
                    qids = pdf[id_col].to_numpy()
                    C = cmat[:, :m]
                    if _np.abs(Q).max(initial=0.0) * \
                            _np.abs(C).max(initial=0.0) * sc * m \
                            >= float(2 ** 62):
                        raise ValueError(
                            "ann_join cell dot: scaled sum would "
                            "overflow long")
                    dots = _np.empty((len(Q), len(C)))
                    for j in range(len(C)):
                        # association matters: the SQL rounds
                        # (m * qx) * scale — keep that exact order
                        dots[:, j] = _half_up(
                            (C[j] * Q[:, :m]) * sc).astype(
                                _np.int64).sum(axis=1) / sc
                    cc = dots / sq_n2[None, :]
                    # (ccos desc, cell asc) — cells_sorted IS cell-
                    # ascending, and np.argsort stable keeps that
                    # order among ties
                    ordk = _np.argsort(-cc, axis=1, kind="stable")
                    for qi in range(len(Q)):
                        for j in ordk[qi, :npr]:
                            ids.append(qids[qi])
                            outc.append(cells_np[j])
                    yield _pd.DataFrame({id_col: ids,
                                         "__cell": outc})

            probes = (queries.select(F.col(id_col),
                                     qv.alias("__qv"))
                             .mapInPandas(rank_cells, probe_schema))
        wk = Window.partitionBy(id_col).orderBy(F.desc(out_cos),
                                                F.col(out_id))
        # r15 cell sub-split (docstring): same candidates, more tasks
        if cell_split == "auto":
            dp = queries.sparkSession.sparkContext.defaultParallelism
            nc = (len(centroids) if centroids is not None
                  else corp.select("__cell").distinct().count())
            S = max(1, min(64, -(-dp // max(int(nc), 1))))
        else:
            S = cell_split
        jkeys = ["__cell"]
        if S > 1:
            corp = corp.withColumn(
                "__sub", F.pmod(F.hash(F.col(out_id)), F.lit(S)))
            probes = probes.withColumn(
                "__sub", F.explode(F.array(
                    *[F.lit(i) for i in range(S)])))
            jkeys = ["__cell", "__sub"]
        if kernel == "gemm":
            qside = (queries.select(F.col(id_col), qv.alias("__qv"))
                            .join(probes, id_col))
            from pyspark.sql.types import (DoubleType, StructField,
                                           StructType)
            id_type = queries.schema[id_col].dataType
            cid_type = corpus.schema[id_col].dataType
            out_schema = StructType([
                StructField(id_col, id_type),
                StructField(out_id, cid_type),
                StructField(out_cos, DoubleType()),
            ])
            kk, excl = k, exclude_self

            def cell_topk(qpdf: "pd.DataFrame",
                          cpdf: "pd.DataFrame") -> "pd.DataFrame":
                import pandas as _pd
                if not len(qpdf) or not len(cpdf):
                    return _pd.DataFrame(
                        {id_col: [], out_id: [], out_cos: []})
                Q = _np.array([_np.asarray(v, dtype=_np.float64)
                               for v in qpdf["__qv"]])
                C = _np.array([_np.asarray(v, dtype=_np.float64)
                               for v in cpdf["__cv"]])
                qn = _np.sqrt((Q * Q).sum(axis=1))
                cn = _np.sqrt((C * C).sum(axis=1))
                cos = _np.round((Q @ C.T) / (qn[:, None] * cn[None, :]), 6)
                qids = qpdf[id_col].to_numpy()
                nids = cpdf[out_id].to_numpy()
                rows = []
                for qi in range(len(qids)):
                    row = cos[qi]
                    mask = _np.ones(len(nids), dtype=bool)
                    if excl:
                        mask = nids != qids[qi]
                    # per-cell top-k suffices: global top-k over the
                    # query's nprobe cells ⊆ union of per-cell top-k.
                    # (-cos, nid) lexsort = cosine desc, id asc ties
                    idx = _np.flatnonzero(mask)
                    order = idx[_np.lexsort((nids[idx], -row[idx]))][:kk]
                    for j in order:
                        rows.append((qids[qi], nids[j], row[j]))
                return _pd.DataFrame(rows,
                                     columns=[id_col, out_id, out_cos])

            percell = (qside.groupBy(*jkeys)
                       .cogroup(corp.groupBy(*jkeys))
                       .applyInPandas(cell_topk, out_schema))
            return (percell.withColumn("rank", F.row_number().over(wk))
                           .where(F.col("rank") <= k)
                           .select(id_col, out_id, out_cos, "rank"))
        # candidate equi-join on the (cell [, sub]) key + exact
        # rescoring; the explicit-count repartition of BOTH sides is
        # what AQE may not coalesce away (docstring)
        qcand = (queries.select(F.col(id_col), qv.alias("__qv"))
                        .join(probes, id_col))
        if S > 1:
            npart = int(queries.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
            qcand = qcand.repartition(npart, *jkeys)
            corp = corp.repartition(npart, *jkeys)
        cand = qcand.join(corp, jkeys)
        if exclude_self:
            cand = cand.where(F.col(id_col) != F.col(out_id))
        cos = F.round(_dot(F.col("__qv"), F.col("__cv"))
                      / (_norm(F.col("__qv")) * _norm(F.col("__cv"))), 6)
        return (cand.withColumn(out_cos, cos)
                    .withColumn("rank", F.row_number().over(wk))
                    .where(F.col("rank") <= k)
                    .select(id_col, out_id, out_cos, "rank"))

    return Stage(fn, name=f"ann_join(k={k},nprobe={nprobe})",
                 seq_preserving=False)


def mine_hard_negatives(corpus: DataFrame, positives: "DataFrame | None" = None,
                        k: int = 8, *, skip_top: int = 1,
                        fetch: "int | None" = None, nprobe: int = 2,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        cell_col: str = "label",
                        pos_query_col: str = "query_id",
                        pos_id_col: str = "pos_id",
                        kernel: str = "exact") -> Stage:
    """Hard-negative mining for contrastive / embedding training: for
    every query row, the ``k`` most-similar corpus items that are NOT
    known positives — ranks ``skip_top+1 .. skip_top+k`` of the
    filtered neighbor list.  ``skip_top`` drops the very nearest
    survivors (the standard guard against unlabeled true positives
    polluting the negative set); ``positives`` is a (query, item) pair
    table of known relevants to exclude, and the query row itself is
    always excluded.

    Plan: ONE :func:`ann_join` fetch of ``fetch`` candidates per query
    (default ``k + skip_top + 8`` — headroom so exclusions don't
    under-fill; raise it if queries can have many fetched positives),
    a broadcast-friendly ANTI join against the positive pairs, then a
    per-query re-rank window in ann_join's own (cosine desc, id)
    order.  Everything rides the IVF-bucketed candidate machinery —
    never all-pairs; ``nprobe >= n_cells`` makes the mining exact
    (law-tested via the ann_join containment)."""
    if k < 1 or skip_top < 0:
        raise ValueError(f"need k >= 1 and skip_top >= 0, "
                         f"got k={k}, skip_top={skip_top}")
    fetch = fetch if fetch is not None else k + skip_top + 8
    if fetch < k + skip_top:
        raise ValueError(f"fetch={fetch} < k+skip_top={k + skip_top}")
    ann = ann_join(corpus, fetch, nprobe=nprobe, vec_col=vec_col,
                   id_col=id_col, cell_col=cell_col,
                   exclude_self=True, kernel=kernel)
    from pyspark.sql import Window

    def fn(df: DataFrame) -> DataFrame:
        nb = ann(df)
        if positives is not None:
            pos = positives.select(
                F.col(pos_query_col).alias(id_col),
                F.col(pos_id_col).alias("neighbor_id"))
            nb = nb.join(pos, [id_col, "neighbor_id"], "left_anti")
        w = Window.partitionBy(id_col).orderBy(F.desc("cosine"),
                                               "neighbor_id")
        return (nb.withColumn("neg_rank", F.row_number().over(w))
                  .where((F.col("neg_rank") > skip_top)
                         & (F.col("neg_rank") <= skip_top + k))
                  .select(id_col,
                          F.col("neighbor_id").alias("neg_id"),
                          F.col("cosine").alias("neg_cosine"),
                          "neg_rank"))

    return Stage(fn, name="mine_hard_negatives", seq_preserving=False)


def ann_recall(truth: DataFrame, k: int, *,
               query_col: str = "vec_id",
               id_col: str = "neighbor_id") -> Stage:
    """Quality audit for the ANN family — recall@k of an approximate
    result against exact ground truth (the :func:`minhash_eval`
    pattern for dense retrieval: measure the approximation, don't
    guess).  Pipe the APPROXIMATE hits table through; ``truth`` is the
    exact one (e.g. :func:`ann_join` at ``nprobe >= cells``, or
    :func:`knn_brute` per query).  Both need (query_col, id_col,
    rank) rows.

    Returns one row per query — (query_col, n_truth, n_hit, recall) —
    plus queries the approximation missed entirely (recall 0.0 via the
    right join).  recall = |approx ∩ truth| / |truth| over rank <= k,
    rounded to 6dp; all-integer until the final division.

    One equi-join on (query, neighbor) + one per-query agg — scales as
    the hit tables, never touches vectors."""
    if k < 1:
        raise ValueError(f"need k >= 1, got k={k}")

    def fn(approx: DataFrame) -> DataFrame:
        a = approx.where(F.col("rank") <= k).select(
            F.col(query_col), F.col(id_col), F.lit(1).alias("__hit"))
        t = truth.where(F.col("rank") <= k).select(
            F.col(query_col), F.col(id_col))
        j = t.join(a, [query_col, id_col], "left")
        return (j.groupBy(query_col)
                .agg(F.count(F.lit(1)).alias("n_truth"),
                     F.sum(F.coalesce("__hit", F.lit(0)))
                      .cast("long").alias("n_hit"))
                .select(query_col, "n_truth", "n_hit",
                        F.round(F.col("n_hit")
                                / F.col("n_truth"), 6).alias("recall")))

    return Stage(fn, name=f"ann_recall({k})", seq_preserving=False)


def _ndcg_weights(k: int) -> "list[int]":
    """Scaled-long DCG discounts ``round(1e9 / log2(r + 1))`` for
    ranks 1..k, computed ONCE in Python and inlined as integer
    literals on both engines — rank-metric hashes can never drift on
    a libm log2 (the HLL linear-counting lesson)."""
    import math
    return [round(1e9 / math.log2(r + 1)) for r in range(1, k + 1)]


def rank_metrics(truth: DataFrame, k: int, *,
                 query_col: str = "vec_id",
                 id_col: str = "neighbor_id") -> Stage:
    """Full retrieval-quality audit — :func:`ann_recall`'s big
    sibling: per-query precision@k, MRR@k, and binary-relevance
    nDCG@k of an approximate hits table against exact truth (both
    ``(query_col, id_col, rank)``; truth rows with rank ≤ k are THE
    relevant set).  Queries the approximation missed entirely score 0
    via the truth-side group.

    Engine-exact by construction: hit counts and first-relevant
    ranks are integers; the DCG discounts are pre-scaled longs from
    :func:`_ndcg_weights` (inlined literals, no runtime log2), so
    ``dcg``/``idcg`` are exact integer sums and every emitted ratio
    is one integer division rounded to 6dp — bit-replayable through
    :func:`rank_metrics_sql`.

    Output: ``(query_col, n_rel, n_hit, prec, mrr, ndcg)``.  One
    equi-join + two per-query aggregates; never touches vectors."""
    if k < 1:
        raise ValueError(f"need k >= 1, got k={k}")
    w = _ndcg_weights(k)
    warr = F.array(*[F.lit(x).cast("long") for x in w])
    cum = [sum(w[:i + 1]) for i in range(k)]
    cumarr = F.array(*[F.lit(x).cast("long") for x in cum])

    def fn(approx: DataFrame) -> DataFrame:
        a = approx.where(F.col("rank") <= k).select(
            F.col(query_col), F.col(id_col), F.col("rank"))
        t = truth.where(F.col("rank") <= k).select(
            F.col(query_col), F.col(id_col))
        rel = (a.join(t.withColumn("__rel", F.lit(1)),
                      [query_col, id_col], "inner")
                .groupBy(query_col)
                .agg(F.count(F.lit(1)).cast("long").alias("n_hit"),
                     F.min("rank").alias("__first"),
                     F.sum(F.element_at(warr,
                                        F.col("rank").cast("int")))
                      .cast("long").alias("__dcg")))
        base = t.groupBy(query_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"))
        j = base.join(rel, query_col, "left")
        n_hit = F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
        idcg = F.element_at(cumarr, F.least(F.col("n_rel"),
                                            F.lit(k)).cast("int"))
        return j.select(
            query_col, "n_rel", n_hit.alias("n_hit"),
            F.round(n_hit / F.lit(float(k)), 6).alias("prec"),
            F.round(F.coalesce(
                F.round(F.lit(1_000_000_000)
                        / F.col("__first")).cast("long"),
                F.lit(0).cast("long")) / F.lit(1e9), 6).alias("mrr"),
            F.round(F.coalesce(F.col("__dcg"),
                               F.lit(0).cast("long")) / idcg, 6)
             .alias("ndcg"))

    return Stage(fn, name=f"rank_metrics({k})", seq_preserving=False)


def rank_metrics_sql(approx_sql: str, truth_sql: str, k: int, *,
                     query_col: str = "vec_id",
                     id_col: str = "neighbor_id") -> str:
    """DuckDB rendering of :func:`rank_metrics` — the SAME inlined
    discount literals, so the two engines share every integer."""
    if k < 1:
        raise ValueError("need k >= 1")
    w = _ndcg_weights(k)
    cum = [sum(w[:i + 1]) for i in range(k)]
    wlist = "[" + ", ".join(str(x) for x in w) + "]"
    clist = "[" + ", ".join(str(x) for x in cum) + "]"
    return f"""
        WITH __rm_a AS (SELECT {query_col}, {id_col}, rank
                        FROM ({approx_sql}) WHERE rank <= {k}),
        __rm_t AS (SELECT {query_col}, {id_col}
                   FROM ({truth_sql}) WHERE rank <= {k}),
        __rm_rel AS (
            SELECT a.{query_col} AS q,
                   CAST(COUNT(*) AS BIGINT) AS n_hit,
                   MIN(a.rank) AS first_rank,
                   CAST(SUM({wlist}[a.rank]) AS BIGINT) AS dcg
            FROM __rm_a a JOIN __rm_t t
              ON a.{query_col} = t.{query_col}
             AND a.{id_col} = t.{id_col}
            GROUP BY a.{query_col}),
        __rm_base AS (SELECT {query_col} AS q,
                             CAST(COUNT(*) AS BIGINT) AS n_rel
                      FROM __rm_t GROUP BY {query_col})
        SELECT b.q AS {query_col}, b.n_rel,
               COALESCE(r.n_hit, 0) AS n_hit,
               ROUND(COALESCE(r.n_hit, 0) / {float(k)!r}, 6) AS prec,
               ROUND(COALESCE(CAST(ROUND(1000000000 / r.first_rank)
                                   AS BIGINT), 0) / 1e9, 6) AS mrr,
               ROUND(COALESCE(r.dcg, 0)
                     / {clist}[LEAST(b.n_rel, {k})], 6) AS ndcg
        FROM __rm_base b LEFT JOIN __rm_rel r ON r.q = b.q"""


def ann_recall_sql(approx_sql: str, truth_sql: str, k: int, *,
                   query_col: str = "vec_id",
                   id_col: str = "neighbor_id") -> str:
    """DuckDB rendering of :func:`ann_recall` over two hit subqueries
    (each producing (query, neighbor, rank)); integer-exact."""
    return f"""
        WITH a AS (SELECT {query_col}, {id_col}
                   FROM ({approx_sql}) WHERE rank <= {k}),
        t AS (SELECT {query_col}, {id_col}
              FROM ({truth_sql}) WHERE rank <= {k})
        SELECT t.{query_col}, COUNT(*) AS n_truth,
               CAST(SUM(CASE WHEN a.{id_col} IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               ROUND(SUM(CASE WHEN a.{id_col} IS NOT NULL
                              THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 6) AS recall
        FROM t LEFT JOIN a
          ON a.{query_col} = t.{query_col} AND a.{id_col} = t.{id_col}
        GROUP BY t.{query_col}"""
