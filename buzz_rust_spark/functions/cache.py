"""Operator-scoped cache tracking.

Several operators persist intermediate relations that multiple plan branches
read within ONE action (posting-list buckets, hashed shingles, MinHash
signatures, n-gram count aggregates).  The persists are load-bearing *during*
that action — without them Spark re-evaluates expensive generator inputs per
branch — but they are garbage the moment the query's action completes.

Because operators return lazy DataFrames, they cannot unpersist "on exit"
themselves (the action happens later, in caller-land).  Instead every
operator registers its persists here, and:

- the query registry releases ALL tracked caches when the NEXT query is
  constructed (queries run strictly sequentially in the correctness driver
  and bench harness), bounding a long-lived session's cache footprint to one
  query's working set instead of accumulating across 50 queries;
- callers embedding operators directly can call
  :func:`release_operator_caches` whenever a query's results have been
  materialized.

``localCheckpoint`` relations are deliberately NOT tracked: checkpointing
truncates lineage, so unpersisting one would lose data that can no longer be
recomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """``df.persist()`` + register for later release via
    :func:`release_operator_caches`."""
    df = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every tracked relation; returns how many were released."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released
