"""Scoped persist: mid-plan materialization fences that don't leak.

Operators that need a persist() fence (e.g. reusing one expensive
exploded stream across two consumers) have no "after the final
action" hook to unpersist — they return a lazy DataFrame and the
caller decides when it runs. Left alone, each invocation in a
long-lived session (a 150-entry oracle sweep, a bench loop) strands
its MEMORY_AND_DISK blocks forever, accumulating memory/disk
pressure.

The registry bounds that: ``scoped_persist`` first releases every
previously registered fence, so at most the CURRENT query's fences
are cached at any time. Releasing early is always safe — unpersist
only drops cached blocks; a consumer that runs afterwards simply
recomputes (correctness unaffected). Callers that want explicit
cleanup can call :func:`release_scoped` after their final action.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default) after releasing all
    fences registered by earlier operator invocations."""
    release_scoped()
    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _SCOPED.append(out)
    return out


def release_scoped() -> None:
    """Unpersist (non-blocking) every registered fence."""
    while _SCOPED:
        d = _SCOPED.pop()
        try:
            d.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
