"""Embedding-matrix preprocessing: exact distributed moments, PCA,
and L2 normalization.

The training-data uses: PCA-whitened embeddings before clustering /
semantic dedup (SemDeDup preprocesses with PCA), low-rank projection
before ANN indexing (a 64->8 projection cuts the IVF/PQ scan bytes
8x), and per-corpus drift monitoring via the exact covariance.

Scale shape (the only one that survives 100 TB):

* ``vector_moments`` never shuffles a vector.  Each partition folds
  its rows into ONE integer d x d Gram partial inside an Arrow
  ``mapInPandas`` kernel (numpy, chunked), emitting d(d+1)/2 + d + 1
  tiny rows; the global combine is a hash aggregate over ~2k rows per
  partition.  This is the tree-aggregate Gram pattern every
  distributed PCA uses — but with per-row scaled-long rounding so the
  sums are ORDER-FREE EXACT integers (same convention as
  __spark_entry__._scaled_sum), hence bit-replayable in DuckDB.
* ``pca_fit`` collects only the moment rows (d=64 -> 2,145 rows) and
  eigendecomposes the d x d covariance on the driver — the matrix is
  model-sized, not data-sized.
* ``pca_transform`` broadcasts the k x d component matrix as literal
  arrays: the projection is a pure JVM column fold (zip_with +
  aggregate, whole-stage codegen), zero shuffle, zero Python.

Reference parity: the reference pipes vectors as plain element streams
(map / fold over rows — Combinators.hs:324,480); moments-as-fold is
`foldl` with a matrix accumulator, re-expressed as Spark partial
aggregation.  PCA itself is an engine addition (SURVEY §2.7 posture:
LLM-pipeline operators the reference lacks).

Determinism contract (gate rules): per-row products rounded
half-away-from-zero to scaled longs (matches Spark F.round and DuckDB
ROUND; numpy's rint would bankers-round — deliberately NOT used), sums
exact under the 2^53 representability guard, eigenvector sign pinned
by the largest-|coordinate| convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import Stage

MOMENT_SCALE = 1_000_000_000


def _round_away(v: np.ndarray) -> np.ndarray:
    """Half-away-from-zero to int64 — Spark F.round / DuckDB ROUND
    semantics (np.rint is half-to-even and WOULD diverge)."""
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def vector_moments(vec_col: str = "embedding", *, dim: Optional[int] = None,
                   scale: int = MOMENT_SCALE,
                   kernel: str = "exact") -> Stage:
    """Exact scaled-integer moments of the embedding matrix: one row
    ``(m, i, j, s)`` per statistic —

    * ``m=0, i=j=-1``: ``s`` = row count n
    * ``m=1, j=-1``:   ``s`` = sum over rows of round(x_i * scale)
    * ``m=2, i<=j``:   ``s`` = sum over rows of round(x_i * x_j * scale)

    NULL vectors, vectors of the wrong length, and vectors containing
    NULL elements are EXCLUDED (counted out of n as well, so the
    moments are self-consistent).  The NULL-element rule matters for
    cross-engine parity: a NULL element would reach the exact kernel
    as NaN, and ``round_away(NaN).astype(int64)`` is undefined
    (typically INT64_MIN) — a silent poisoning — while a SQL oracle's
    SUM would simply skip it.  Excluding the row keeps both engines on
    the same well-defined input set.

    Overflow posture: per-row |entry| <= scale * max|x|^2; with unit-ish
    embeddings and scale 1e9 the int64 partials wrap only past ~9e9
    rows PER STATISTIC — the driver-side combine re-checks the 2^53
    exactness bound and raises loudly (same policy as
    similarity._guarded_long_sum).

    ``kernel``: "exact" (default) = per-row scaled-long rounding, the
    bit-replayable gate path (O(n·d²) rounding work per partition);
    "gemm" = ONE blocked float64 ``X.T @ X`` per partition — the
    production shape at large d (d=1024: one BLAS call vs a million
    per-row roundings), emitting the SAME (m, i, j, s) rows with s
    pre-scaled.  Not bit-replayable (float partials, order-dependent
    merge); the covariance agrees with the exact path to ~1e-9
    (law-tested).
    """
    if kernel not in ("exact", "gemm"):
        raise ValueError(f"kernel must be 'exact' or 'gemm', got {kernel!r}")

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        base = (df.select(v.alias("__v"))
                  .where(F.col("__v").isNotNull()
                         & ~F.exists("__v", lambda x: x.isNull())))
        if dim is not None:
            base = base.where(F.size("__v") == dim)
        else:
            # pin to the MODAL length (ties to the smaller length) — a
            # ragged column would silently skew the Gram, and an
            # arbitrary first-row peek would make the pinned length
            # nondeterministic across partitionings
            top = (base.groupBy(F.size("__v").alias("d"))
                       .count()
                       .orderBy(F.col("count").desc(), F.col("d"))
                       .limit(1).collect())
            d0 = int(top[0]["d"]) if top else 0
            base = base.where(F.size("__v") == d0)

        def moment_kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            d = None
            n = 0
            s1 = None
            s2 = None
            for pdf in batches:
                col = pdf["__v"]
                if len(col) == 0:
                    continue
                x = np.asarray(list(col.values), dtype=np.float64)
                if d is None:
                    d = x.shape[1]
                    s1 = np.zeros(d, dtype=np.int64)
                    s2 = np.zeros((d, d), dtype=np.int64)
                n += x.shape[0]
                if kernel == "gemm":
                    # one BLAS product per batch; scaled at the end so
                    # the output schema matches the exact kernel's
                    s1 = s1.astype(np.float64) if s1.dtype != np.float64 else s1
                    s2 = s2.astype(np.float64) if s2.dtype != np.float64 else s2
                    s1 += x.sum(axis=0) * scale
                    s2 += (x.T @ x) * scale
                    continue
                # chunk the per-row outer products: 1k x d x d doubles
                # (d=64 -> 33 MB) caps kernel memory regardless of the
                # Arrow batch size
                for lo in range(0, x.shape[0], 1024):
                    xc = x[lo:lo + 1024]
                    s1 += _round_away(xc * scale).sum(axis=0)
                    outer = xc[:, :, None] * xc[:, None, :]
                    s2 += _round_away(outer * scale).sum(axis=0)
            rows = [(0, -1, -1, int(n))]
            if d is not None:
                rows += [(1, i, -1, int(round(s1[i]))) for i in range(d)]
                rows += [(2, i, j, int(round(s2[i, j])))
                         for i in range(d) for j in range(i, d)]
            yield pd.DataFrame(rows, columns=["m", "i", "j", "s"])

        partials = base.mapInPandas(moment_kernel,
                                    "m int, i int, j int, s long")
        return (partials.groupBy("m", "i", "j")
                        .agg(F.sum("s").alias("s"))
                        .select("m", "i", "j", "s"))

    return Stage(fn, name="vector_moments", seq_preserving=False)


@dataclass
class PCAModel:
    """Driver-sized PCA model (k x d doubles — broadcastable)."""
    n: int
    mean: List[float]                 # d
    components: List[List[float]]     # k rows, each d — orthonormal
    explained_variance: List[float]   # k, non-increasing

    @property
    def dim(self) -> int:
        return len(self.mean)

    @property
    def k(self) -> int:
        return len(self.components)


def pca_from_moments(rows, k: int, *, scale: int = MOMENT_SCALE) -> PCAModel:
    """Exact-moment -> model math, shared by the Spark and replay
    paths (the two-path law in tests feeds DuckDB-computed moments
    through this same function)."""
    if k < 1:
        raise ValueError(f"pca needs k >= 1, got {k}")
    n = 0
    s1: dict = {}
    s2: dict = {}
    for r in rows:
        m, i, j, s = int(r[0]), int(r[1]), int(r[2]), int(r[3])
        if m == 0:
            n = s
        elif m == 1:
            s1[i] = s
        else:
            s2[(i, j)] = s
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows, got {n}")
    d = len(s1)
    if any(abs(v) >= 2 ** 53 for v in list(s1.values()) + list(s2.values())):
        raise ValueError("pca moments exceed the 2^53 exactness bound; "
                         "reduce MOMENT_SCALE")
    # population covariance from exact integers: numerator in exact
    # Python int arithmetic, ONE float division at the end
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(i, d):
            num = n * s2[(i, j)] * scale - s1[i] * s1[j]
            cov[i, j] = cov[j, i] = num / (scale * scale * n * n)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    evs = []
    for idx in order:
        c = v[:, idx]
        # sign pin: the largest-|coordinate| entry is positive (ties
        # by lowest index via argmax)
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([float(x) for x in c])
        evs.append(float(max(w[idx], 0.0)))
    mean = [s1[i] / (scale * n) for i in range(d)]
    return PCAModel(n=n, mean=mean, components=comps,
                    explained_variance=evs)


def pca_fit(df: DataFrame, k: int = 8, *, vec_col: str = "embedding",
            dim: Optional[int] = None, scale: int = MOMENT_SCALE,
            kernel: str = "exact") -> PCAModel:
    """Fit PCA over an embedding column.  Driver function (returns a
    model, not a DataFrame): the distributed work is one
    :func:`vector_moments` pass; only ~d^2/2 moment rows ever reach
    the driver.  ``kernel="gemm"`` uses the BLAS partial-Gram kernel
    (production shape at large d; covariance agrees to ~1e-9 but is
    not bit-replayable — keep "exact" wherever an oracle watches)."""
    rows = [(r["m"], r["i"], r["j"], r["s"])
            for r in vector_moments(vec_col, dim=dim, scale=scale,
                                    kernel=kernel)
            .fn(df).collect()]
    return pca_from_moments(rows, k, scale=scale)


def pca_transform(model: PCAModel, *, vec_col: str = "embedding",
                  out: str = "pc", ndigits: Optional[int] = 6,
                  whiten: bool = False, eps: float = 1e-12) -> Stage:
    """Project ``vec_col`` onto the model's components:
    ``out[j] = (x - mean) . components[j]`` (divided by
    ``sqrt(explained_variance[j])`` when ``whiten=True`` — the
    SemDeDup-style preprocessing that equalizes component scales before
    cosine work).  The k x d matrix rides the plan as literal arrays —
    pure codegen fold, no shuffle, no Python."""
    mean = F.array(*[F.lit(float(m)) for m in model.mean])
    scales = [1.0 / max(ev, eps) ** 0.5 if whiten else 1.0
              for ev in model.explained_variance]

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        centered = F.zip_with(v, mean, lambda a, b: a - b)
        projs = []
        for comp, sc in zip(model.components, scales):
            carr = F.array(*[F.lit(float(x)) for x in comp])
            p = F.aggregate(F.zip_with(centered, carr, lambda a, b: a * b),
                            F.lit(0.0), lambda s, x: s + x)
            if whiten:
                p = p * F.lit(sc)
            projs.append(F.round(p, ndigits) if ndigits is not None else p)
        return df.withColumn(out, F.array(*projs))

    return Stage(fn, name=f"pca_transform(k={model.k})",
                 seq_preserving=True)


def normalize_vectors(vec_col: str = "embedding", *,
                      out: Optional[str] = None,
                      ndigits: Optional[int] = None) -> Stage:
    """L2-normalize an embedding column (pure projection; zero-norm
    and NULL vectors pass through as NULL output)."""
    target = out or vec_col

    def fn(df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
        unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm))
        if ndigits is not None:
            unit = F.transform(unit, lambda x: F.round(x, ndigits))
        return df.withColumn(target, unit)

    return Stage(fn, name="normalize_vectors", seq_preserving=True)
