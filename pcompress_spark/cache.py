"""Tracked DataFrame persistence for the query surface.

Query-builder functions persist intermediate frames that are referenced
more than once in the plan they return (signature tables fanned out to
banding + both verify probes, ANN prep tables probed per method). Spark's
cache holds strong references, so in a long-lived driver session that
builds many queries (the driver's correctness gate iterates all of them;
bench.py runs a suite) untracked persists accumulate MEMORY_AND_DISK
entries for the life of the session — executor memory pressure and LRU
churn that evicts the caches that matter.

``persist(df)`` is a drop-in replacement for ``df.persist()`` that records
the frame in a module registry; harness loops call ``release_persisted()``
between queries once the previous result is fully consumed. Inside one
query's execution the persist behaves exactly as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist(df: DataFrame) -> DataFrame:
    """df.persist(), tracked for later release_persisted()."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame (blocking=False); returns how many.
    Call between queries in harness loops — never mid-query, while a
    returned DataFrame that references a tracked frame is still to be
    consumed."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _PERSISTED.clear()
    return n
