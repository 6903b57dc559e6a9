"""Reproducible sampling / splitting / sharding for training-data
pipelines.

All three operators key off the md5-derived ``h32`` hash
(functions/hashing.py), NOT an RNG: the decision for a row is a pure
function of its key, so samples are (a) stable across runs, engines,
partitionings and cluster sizes, (b) consistent between tables sharing
the key (sample users, get all their events), and (c) replayable by the
DuckDB oracle bit-for-bit — none of which holds for ``df.sample``'s
per-partition RNG streams.

Pure projections: no shuffle, full codegen, trivially 100 TB-safe
(``shard_by(repartition=True)`` shuffles by design — that's its job).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conduino_spark.functions.hashing import h32
from conduino_spark.plans.core import Stage

#: h32 range — [0, 2^32)
_SPACE = 1 << 32

ExprLike = Union[str, Column]


def _key(expr: ExprLike) -> Column:
    return F.expr(expr) if isinstance(expr, str) else expr


def hash_sample(key: ExprLike, fraction: float, *, salt: str = "",
                name: str = "hash_sample") -> Stage:
    """Keep rows whose ``h32(salt || key)`` falls in the first
    ``fraction`` of the hash space.  ``salt`` decorrelates independent
    samples over the same key.

    NULL keys are DROPPED (no hash → no sample membership) — the same
    rule :func:`hash_split` applies by emitting a NULL split label."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * _SPACE)

    def fn(df: DataFrame) -> DataFrame:
        h = h32(F.concat(F.lit(salt), _key(key).cast("string")))
        return df.where(_key(key).isNotNull() & (h < F.lit(cut)))

    return Stage(fn, name=name)


def hash_split(key: ExprLike, weights: Mapping[str, float], *,
               salt: str = "", out: str = "split",
               name: str = "hash_split") -> Stage:
    """Deterministic train/val/test assignment: label each row with the
    name of the weight bucket its key hashes into.  Weights are
    normalized; bucket boundaries are cumulative in dict order.

    NULL keys get a NULL split label (they belong to no bucket) —
    consistent with :func:`hash_sample` dropping them; previously they
    fell through the when-chain into the LAST bucket, skewing it."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    cuts, acc = [], 0.0
    for k, w in weights.items():
        acc += w / total
        cuts.append((k, int(acc * _SPACE)))
    cuts[-1] = (cuts[-1][0], _SPACE)  # float roundoff: last bucket closes

    def fn(df: DataFrame) -> DataFrame:
        h = h32(F.concat(F.lit(salt), _key(key).cast("string")))
        expr = F.lit(cuts[-1][0])
        for k, hi in reversed(cuts[:-1]):
            expr = F.when(h < F.lit(hi), F.lit(k)).otherwise(expr)
        # descending when-chain: first bucket wins the lowest range;
        # NULL key → NULL label (never the fall-through bucket)
        return df.withColumn(out, F.when(_key(key).isNotNull(), expr))

    return Stage(fn, name=name)


def shard_by(key: ExprLike, n_shards: int, *, out: str = "shard",
             repartition: bool = False, name: str = "shard_by") -> Stage:
    """Deterministic shard id in [0, n_shards): ``h32(key) % n``.
    ``repartition=True`` additionally moves rows so each shard is
    physically together (one hash shuffle — e.g. before a sharded
    write)."""

    def fn(df: DataFrame) -> DataFrame:
        res = df.withColumn(out, h32(_key(key).cast("string")) % F.lit(n_shards))
        return res.repartition(n_shards, out) if repartition else res

    return Stage(fn, name=name)
