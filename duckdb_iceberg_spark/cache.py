"""Scoped persist: mid-plan materialization fences that don't leak.

Operators that need a persist() fence (e.g. reusing one expensive
exploded stream across two consumers) have no "after the final
action" hook to unpersist — they return a lazy DataFrame and the
caller decides when it runs. Left alone, each invocation in a
long-lived session (a 150-entry oracle sweep, a bench loop) strands
its MEMORY_AND_DISK blocks forever, accumulating memory/disk
pressure.

The registry bounds that WITHOUT racing live plans: fences are kept
in a small FIFO (capacity ``_CAPACITY``) and only the OLDEST are
released when the cap is exceeded, so every fence registered by the
current query — and the last few queries — stays cached while the
tail from earlier entries is dropped. Releasing an old fence is
always safe for correctness — unpersist only drops cached blocks; a
consumer that runs afterwards simply recomputes — but releasing a
fence a still-running plan depends on would defeat its purpose
(preventing double computation / plan-divergent re-optimization), so
the FIFO never touches the most recent ``_CAPACITY`` fences. No
single query registers more than two fences today, so capacity 4
guarantees same-query fences survive.

Callers that want deterministic cleanup get a release token::

    df, release = scoped_persist_token(expensive)
    ...  # run final action
    release()

The registry is lock-protected, so concurrent driver threads cannot
corrupt it; the *eviction* policy is still heuristic under
concurrency (a fence from a query running in another thread could be
evicted early if > _CAPACITY fences are created meanwhile), which
only costs recomputation — the intended deployment is a
single-threaded driver loop (bench/sweep), and that assumption is
deliberate.
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_SCOPED: list[DataFrame] = []
_CAPACITY = 4


def _unpersist_quietly(d: DataFrame) -> None:
    try:
        d.unpersist(blocking=False)
    except Exception:  # session already stopped — nothing to free
        pass


def scoped_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default) and register it in
    the bounded fence FIFO; the oldest fences beyond capacity are
    released (they belong to long-finished queries)."""
    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    evicted: list[DataFrame] = []
    with _LOCK:
        _SCOPED.append(out)
        while len(_SCOPED) > _CAPACITY:
            evicted.append(_SCOPED.pop(0))
    for d in evicted:
        _unpersist_quietly(d)
    return out


def scoped_persist_token(
    df: DataFrame, level: StorageLevel | None = None
) -> tuple[DataFrame, Callable[[], None]]:
    """Like :func:`scoped_persist`, but also returns a ``release()``
    callable the caller invokes after its final action for
    deterministic cleanup (removes the fence from the FIFO too)."""
    out = scoped_persist(df, level)

    def release() -> None:
        with _LOCK:
            try:
                _SCOPED.remove(out)
            except ValueError:
                pass  # already evicted by the FIFO
        _unpersist_quietly(out)

    return out, release


def release_scoped() -> None:
    """Unpersist (non-blocking) every registered fence — end-of-run
    cleanup hook for sweeps/benches."""
    with _LOCK:
        drained = list(_SCOPED)
        _SCOPED.clear()
    for d in drained:
        _unpersist_quietly(d)
