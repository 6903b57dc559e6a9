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


def stratified_sample(strata: ExprLike, key: ExprLike,
                      fractions: Union[float, Mapping[str, float]], *,
                      default: float = 0.0, salt: str = "",
                      name: str = "stratified_sample") -> Stage:
    """Per-stratum deterministic sampling: a row is kept iff
    ``h32(salt || key)`` falls in the first ``fraction(stratum)`` of
    the hash space.  ``fractions`` is either one fraction for every
    stratum or a mapping ``stratum value → fraction`` (missing strata
    get ``default``) — the standard rebalancing move (e.g. downsample
    'en' to 10%, keep low-resource languages whole).

    Pure projection (no shuffle, no RNG): membership is a function of
    the key, so it is stable across runs/engines/partitionings and
    consistent across tables sharing the key.  NULL keys and NULL
    strata are dropped, matching :func:`hash_sample`."""
    if isinstance(fractions, Mapping):
        cut_map = {str(k): int(float(v) * _SPACE) for k, v in fractions.items()}
        for k, v in fractions.items():
            if not 0.0 <= float(v) <= 1.0:
                raise ValueError(f"fraction for {k!r} must be in [0, 1]")
        if not 0.0 <= default <= 1.0:
            raise ValueError("default fraction must be in [0, 1]")
        def_cut = int(default * _SPACE)
    else:
        if not 0.0 <= float(fractions) <= 1.0:
            raise ValueError("fraction must be in [0, 1]")
        cut_map, def_cut = {}, int(float(fractions) * _SPACE)

    def fn(df: DataFrame) -> DataFrame:
        h = h32(F.concat(F.lit(salt), _key(key).cast("string")))
        cut = F.lit(def_cut)
        for sv, c in cut_map.items():
            cut = F.when(_key(strata).cast("string") == sv, F.lit(c)).otherwise(cut)
        return df.where(_key(key).isNotNull()
                        & _key(strata).isNotNull() & (h < cut))

    return Stage(fn, name=name)


def reservoir_per_key(group_key: Union[str, Sequence[str]], n: int, *,
                      order_key: ExprLike = "doc_id", salt: str = "",
                      name: str = "reservoir_per_key") -> Stage:
    """Deterministic 'reservoir': keep exactly ``min(n, |group|)`` rows
    per group, chosen uniformly by smallest ``h32(salt || order_key)``
    (ties broken by the key itself) — e.g. cap any domain/source at N
    documents without an RNG, reproducibly.

    ONE shuffle on the group key (rank window).  Rows of a group must
    co-locate — inherent to any exact per-group selection; n is small
    and the window needs no full sort beyond each group's partition.
    A NULL order key is dropped (no hash → no membership); NULL group
    keys form their own group, like any groupBy."""
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    keys = [group_key] if isinstance(group_key, str) else list(group_key)

    def fn(df: DataFrame) -> DataFrame:
        h = h32(F.concat(F.lit(salt), _key(order_key).cast("string")))
        w = (Window.partitionBy(*keys)
                   .orderBy(h, _key(order_key).cast("string")))
        return (df.where(_key(order_key).isNotNull())
                  .withColumn("__rk", F.row_number().over(w))
                  .where(F.col("__rk") <= n)
                  .drop("__rk"))

    return Stage(fn, name=name)


def weighted_sample(key: ExprLike, weight: ExprLike, *, salt: str = "",
                    name: str = "weighted_sample") -> Stage:
    """Per-ROW deterministic sampling probability: keep a row iff
    ``h32(salt || key)`` falls in the first ``weight`` fraction of the
    hash space, where ``weight`` is a COLUMN (clamped to [0, 1]) — the
    per-document quality-weighted downsampling move ("keep high-quality
    docs with p=1.0, boilerplate with p=0.1") that fixed-fraction
    :func:`hash_sample` cannot express.

    Same determinism contract as every sampler here: membership is a
    pure function of (salt, key, weight), stable across runs, engines
    and partitionings, replayable by a DuckDB oracle.  Pure projection
    — no shuffle, no RNG.  NULL keys and NULL weights are DROPPED
    (no hash / no probability → no membership)."""

    def fn(df: DataFrame) -> DataFrame:
        w = _key(weight).cast("double")
        cut = (F.greatest(F.lit(0.0), F.least(F.lit(1.0), w))
               * F.lit(float(_SPACE)))
        h = h32(F.concat(F.lit(salt), _key(key).cast("string")))
        return df.where(_key(key).isNotNull() & w.isNotNull()
                        & (h.cast("double") < cut))

    return Stage(fn, name=name)


def mixture(sources: "Mapping[str, tuple[DataFrame, float]]", *,
            key: ExprLike = "doc_id", salt: str = "",
            out: str = "mix_source") -> DataFrame:
    """Deterministic training-mixture composer: for each named source,
    keep a ``fraction`` of its rows (``h32(salt || name || key)``-based,
    so per-source samples are independent even over shared keys) and
    union the survivors tagged with ``out`` = the source name — the
    "N parts web, M parts code" corpus-mixing step, reproducible across
    runs/engines/cluster sizes like every sampler here.

    Fractions may exceed 1 conceptually (epochs); this implementation
    caps at 1.0 and raises instead of silently duplicating rows —
    explicit replication belongs to the caller (a ``crossJoin`` with a
    replica index changes row identity, which dedup/training bookkeeping
    must see).

    NULL ``key`` rows are DROPPED from every source — even at
    fraction 1.0 — inheriting :func:`hash_sample`'s no-hash-no-
    membership rule; reconcile input vs mixed counts with that in
    mind, or assign surrogate keys upstream.

    Schemas must union by name; returns a DataFrame (a source-level
    combinator, not a Stage — it consumes several inputs)."""
    if not sources:
        raise ValueError("mixture: sources must be non-empty")
    parts = []
    for name, (df, fraction) in sources.items():
        if not 0.0 <= fraction <= 1.0:
            raise ValueError(
                f"mixture[{name}]: fraction {fraction} outside [0, 1]; "
                "replicate explicitly for multi-epoch weights")
        # both fields delimited: "{salt}{name}|" left (salt="a", name="b")
        # and (salt="", name="ab") colliding on identical hash salts
        sampled = hash_sample(key, fraction, salt=f"{salt}|{name}|")(df)
        parts.append(sampled.withColumn(out, F.lit(name)))
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def temperature_fractions(counts: "Mapping[str, int]", alpha: float, *,
                          budget: "int | None" = None) -> "dict[str, float]":
    """Temperature-sampling fractions for :func:`mixture`: source ``i``
    is drawn with probability ``q_i ∝ n_i^alpha`` (the multilingual /
    multi-domain rebalancing rule — ``alpha=1`` is proportional,
    ``alpha=0`` uniform, in between up-weights low-resource sources),
    and the returned per-source keep-fraction is ``min(1, B·q_i/n_i)``
    for a target corpus of ``budget`` rows (default: the largest
    feasible budget where no fraction exceeds 1).

    Pure driver arithmetic over the source-size dict — compose:
    ``mixture({k: (df_k, fr[k]) for k ...})`` for the deterministic
    sampling itself."""
    if not counts:
        raise ValueError("temperature_fractions: counts must be non-empty")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if any(n <= 0 for n in counts.values()):
        raise ValueError("every source count must be positive")
    w = {k: float(n) ** alpha for k, n in counts.items()}
    tot = sum(w.values())
    q = {k: v / tot for k, v in w.items()}
    if budget is None:
        # largest B with max_i B*q_i/n_i == 1
        budget = min(counts[k] / q[k] for k in counts)
    return {k: min(1.0, budget * q[k] / counts[k]) for k in counts}


def deterministic_shuffle(key: ExprLike, *, salt: str = "",
                          out: str = "shuffle_pos",
                          npart: "int | None" = None,
                          name: str = "deterministic_shuffle") -> Stage:
    """Reproducible global shuffle for training order: assign every row
    a dense 0-based position ``out`` = its rank under ``h32(salt ||
    key)`` (ties broken by the key string) — the "shuffle the corpus
    once, identically, on any cluster" step a training pipeline needs
    before sharded writes.  Different ``salt`` → independent orders
    (epoch reshuffles); no RNG anywhere, so the order is replayable by
    engine, run, and partitioning.

    Plan (the scale path, via plans.order.rerank): ONE range exchange
    on the hash + a partition-local rank window + a broadcast of
    per-partition counts — no global single-partition window at any
    size.  NULL keys are DROPPED (no hash → no position), the
    samplers' shared rule."""

    def fn(df: DataFrame) -> DataFrame:
        from conduino_spark.plans.order import rerank
        h = h32(F.concat(F.lit(salt), _key(key).cast("string")))
        d = (df.where(_key(key).isNotNull())
               .withColumn("__ds_h", h)
               .withColumn("__ds_k", _key(key).cast("string")))
        return rerank(d, ["__ds_h", "__ds_k"], out=out, npart=npart,
                      drop_keys=True)

    return Stage(fn, name=name, seq_preserving=False)


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
