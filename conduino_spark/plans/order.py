"""Chunked dense re-ranking: derive a fresh dense ``__seq`` from
arbitrary sort keys WITHOUT a global single-partition window.

The pattern (shared by scan/pairs/zip positional, SURVEY §7 hard #1):
range-partition by the keys, rank locally per partition, then add the
broadcast prefix-sum of per-partition row counts.  One range shuffle;
the only unpartitioned window runs over npart rows (one per partition),
which is driver-scale at any data size.

This replaces the former ``parent_seq * 2^20 + pos`` packing in
concat_map/concat, which silently overflowed a long once
``monotonically_increasing_id`` partition ids reached ~1024 (pid<<33
regime) and collided for parents with > 2^20 children.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from conduino_spark.plans.cachereg import track
from conduino_spark.plans.core import SEQ


def rerank(df: DataFrame, keys: Sequence[str], *, out: str = SEQ,
           npart: Optional[int] = None, drop_keys: bool = True) -> DataFrame:
    """Dense 0-based rank of rows ordered by ``keys`` → long column ``out``.

    Single key: the chunk id is a deterministic monotone bucket of the
    key (stateful._with_pid) — the ONLY full-data shuffle is the rank
    window's own hash exchange.  Multi-key: a range partition assigns
    chunks (buckets on the first key alone could not split a hot first
    key the way range boundaries on the full tuple can), costing one
    extra exchange — concat_map's (parent, pos) re-rank takes this path.

    The input is persisted via the cache registry so the local-rank
    branch and the per-chunk-count branch read one materialization (and,
    on the multi-key path, observe the same sampled range boundaries).
    """
    kcols = [F.col(k) for k in keys]
    if len(keys) == 1:
        from conduino_spark.operators.stateful import _with_pid
        part = _with_pid(df, npart, key=keys[0]) \
            .withColumnRenamed("__pid", "__rrpid")
    else:
        part = (df.repartitionByRange(npart, *kcols) if npart
                else df.repartitionByRange(*kcols))
        part = track(part.withColumn("__rrpid", F.spark_partition_id()))
    wloc = W.partitionBy("__rrpid").orderBy(*kcols)
    local = part.withColumn("__rrn", F.row_number().over(wloc))
    counts = part.groupBy("__rrpid").agg(F.count(F.lit(1)).alias("__rrc"))
    woff = W.orderBy("__rrpid").rowsBetween(W.unboundedPreceding, -1)
    offs = (counts
            .withColumn("__rroff", F.coalesce(F.sum("__rrc").over(woff), F.lit(0)))
            .select("__rrpid", "__rroff"))
    res = (local.join(F.broadcast(offs), "__rrpid")
                .withColumn(out, (F.col("__rrn") + F.col("__rroff") - 1).cast("long"))
                .drop("__rrpid", "__rrn", "__rroff"))
    if drop_keys:
        res = res.drop(*[k for k in keys if k != out])
    return res
