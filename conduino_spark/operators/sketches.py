"""Distributed sketches with engine-portable determinism.

``kmv_distinct`` — K-Minimum-Values distinct-count sketch (the classic
bottom-k estimator): hash every value, keep the k smallest DISTINCT
hashes, estimate ``|D| ≈ (k-1) · M / h_(k)`` where ``M`` is the hash
space size and ``h_(k)`` the k-th minimum.  Standard in Theta-sketch
lineage; mergeable by construction (the k smallest of a union is a
function of each side's k smallest).

Scale shape: hashing is a projection; the distinct() is one shuffle on
a 4-byte hash (never the value); the bottom-k compiles to
TakeOrderedAndProject — a size-k heap per partition, k·partitions rows
to the driver-side merge.  State is O(k) regardless of data size.

Determinism: hashes are md5-derived (functions/hashing.h32), so a
DuckDB oracle replays the ESTIMATE bit-identically — unlike
approx_count_distinct (HLL++), whose sketch is engine-private.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conduino_spark.functions.hashing import h32, h32_sql
from conduino_spark.plans.core import Stage

#: h32 values live in [0, 2^32): first 8 hex digits of md5
KMV_SPACE = 4294967296.0


def kmv_distinct(expr: Union[str, Column], k: int = 256, *,
                 out: str = "approx_distinct") -> Stage:
    """Bottom-k distinct estimate of ``expr``; exact when fewer than k
    distinct values exist (the sketch saw everything)."""
    col = F.expr(expr) if isinstance(expr, str) else expr

    def fn(df: DataFrame) -> DataFrame:
        h = (df.select(h32(col).alias("__h"))
               .where(col.isNotNull())
               .distinct())
        smallest = h.orderBy("__h").limit(k)
        agg = smallest.agg(F.count(F.lit(1)).alias("__n"),
                           F.max("__h").alias("__kth"))
        est = F.when(F.col("__n") < k, F.col("__n").cast("double")) \
               .otherwise(F.round(F.lit((k - 1) * KMV_SPACE) / F.col("__kth"), 6))
        return agg.select(est.alias(out))

    return Stage(fn, name=f"kmv_distinct(k={k})", seq_preserving=False)


def kmv_distinct_sql(expr: str, k: int = 256, *,
                     out: str = "approx_distinct",
                     from_clause: str = "") -> str:
    """DuckDB rendering of :func:`kmv_distinct` — bit-identical."""
    return f"""
      WITH __h AS (SELECT DISTINCT {h32_sql(expr)} AS h {from_clause}
                   WHERE {expr} IS NOT NULL),
      __s AS (SELECT h FROM __h ORDER BY h LIMIT {k}),
      __a AS (SELECT count(*) AS n, max(h) AS kth FROM __s)
      SELECT CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                  ELSE round({float((k - 1) * KMV_SPACE)!r} / kth, 6)
             END AS {out} FROM __a"""
