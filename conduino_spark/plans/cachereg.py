"""Pipeline-scoped cache registry.

Operators that need a materialization barrier (two-branch prefix scans,
LSH signature tables — see stateful._with_pid, dedup.minhash_dedup_pairs)
register their persist() through :func:`track` instead of calling
``DataFrame.persist()`` directly.  Release points:

  * ``Pipeline.run`` releases everything after a *materializing* sink's
    action completes (collect/agg/write) — a pipeline leaves no cached
    blocks behind.
  * Flows that hand a lazy DataFrame to the caller (``sink_df``, the
    driver's ``queries()`` contract) cannot release eagerly — the cache
    must survive until the caller's action, and unpersisting earlier
    would also break the branch-consistency guarantee the persist
    provides (range-partition sampling must happen once).  Those callers
    invoke :func:`release_caches` between queries (bench.py does).

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


def release_caches() -> int:
    """Unpersist every tracked DataFrame (LIFO); returns count released.

    Safe to call at any time: an unpersisted-then-reused plan recomputes
    (correctness unaffected for single-action flows, which are the only
    ones that reach a release point)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
