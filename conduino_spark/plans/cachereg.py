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

Scoped release is THREAD-OWNED (r15): gate pins overlap independent
arms from driver threads (guide §2.6), and a position-based
``release_caches(since=mark)`` would pop entries another thread tracked
in the interleaving — e.g. ``logreg_train`` finishing first would
unpersist a concurrently-running ``nb_train``'s token cache, silently
re-deriving the training explode per consumer.  ``mark`` therefore
snapshots a monotone sequence number, and a scoped release drops only
entries (seq >= mark) owned by the CALLING thread.  The global
``release_caches()`` (since<=0, the between-queries cleanup) still
releases everything regardless of owner.

A long-lived session (the 100 TB posture is many queries per session)
therefore never accumulates orphaned cache blocks.
"""

from __future__ import annotations

import threading
from itertools import count

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_SEQ = count(1)
# entries: (df, seqno, owner thread ident)
_TRACKED: list = []


def track(df: DataFrame) -> DataFrame:
    """``persist()`` + register for release after the pipeline's action."""
    df = df.persist()
    with _LOCK:
        _TRACKED.append((df, next(_SEQ), threading.get_ident()))
    return df


def mark() -> int:
    """Snapshot the registry: pass to ``release_caches(since=...)`` to
    release only caches THIS THREAD tracked after this point
    (ownership scoping — see module docstring)."""
    with _LOCK:
        return next(_SEQ)


def release_caches(since: int = 0) -> int:
    """Unpersist tracked DataFrames (LIFO); returns count released.

    ``since=0`` (default) releases everything — the between-queries
    cleanup for lazy-DF callers.  ``since=mark()`` releases only the
    calling thread's entries tracked at sequence >= ``since`` (scoped
    ownership: concurrent arms never pop each other's caches).

    Safe to call at any time: an unpersisted-then-reused plan recomputes
    (correctness unaffected for single-action flows, which are the only
    ones that reach a release point)."""
    me = threading.get_ident()
    full = since <= 0
    with _LOCK:
        drop = [e for e in _TRACKED
                if full or (e[1] >= since and e[2] == me)]
        if drop:
            dropset = {id(e) for e in drop}
            _TRACKED[:] = [e for e in _TRACKED if id(e) not in dropset]
    n = 0
    for df, _, _ in reversed(drop):
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
