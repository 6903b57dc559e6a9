"""Pipeline-scoped cache registry.

Operators that need a materialization barrier (two-branch prefix scans,
LSH signature tables — see stateful._with_pid, dedup.minhash_dedup_pairs)
register their persist() through :func:`track` instead of calling
``DataFrame.persist()`` directly.  Release points:

  * ``Pipeline.run`` releases the caches created DURING that run (it
    snapshots the registry with :func:`mark` before building the plan
    and releases only entries added past the mark) — a pipeline leaves
    no cached blocks behind, and caches owned by OTHER still-live lazy
    flows are untouched.  That scoping matters for correctness, not
    just recompute cost: rerank's multi-key path persists so both
    branches of the prefix scan observe the same repartitionByRange
    sample; a cross-pipeline release before the lazy DF's action would
    let the branches re-sample range boundaries independently.
  * Flows that hand a lazy DataFrame to the caller (``sink_df``, the
    driver's ``queries()`` contract) cannot release eagerly — the cache
    must survive until the caller's action.  Those callers invoke
    :func:`release_caches` between queries (bench.py does), which
    releases EVERYTHING tracked.

A long-lived session (the 100 TB posture is many queries per session)
therefore never accumulates orphaned cache blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """``persist()`` + register for release after the pipeline's action."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def mark() -> int:
    """Snapshot the registry: pass to ``release_caches(since=...)`` to
    release only caches tracked after this point (ownership scoping)."""
    return len(_TRACKED)


def release_caches(since: int = 0) -> int:
    """Unpersist tracked DataFrames added at registry position >= ``since``
    (LIFO); returns count released.  ``since=0`` (default) releases
    everything — the between-queries cleanup for lazy-DF callers.

    Safe to call at any time: an unpersisted-then-reused plan recomputes
    (correctness unaffected for single-action flows, which are the only
    ones that reach a release point)."""
    n = 0
    since = max(0, since)
    while len(_TRACKED) > since:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
