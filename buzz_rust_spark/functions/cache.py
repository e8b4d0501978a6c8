"""Operator-scoped cache tracking.

Several operators persist intermediate relations that multiple plan branches
read within ONE action (posting-list buckets, hashed shingles, MinHash
signatures, n-gram count aggregates).  The persists are load-bearing *during*
that action — without them Spark re-evaluates expensive generator inputs per
branch — but they are garbage the moment the query's action completes.

Because operators return lazy DataFrames, they cannot unpersist "on exit"
themselves (the action happens later, in caller-land).  Instead every
operator registers its persists here.  The registry is SESSION-SCOPED
(keyed weakly by the owning ``SparkSession``) with an optional explicit
scope, so concurrent/library callers cannot release each other's persists:

- the query registry releases the calling session's tracked caches when the
  NEXT query is constructed (queries run strictly sequentially in the
  correctness driver and bench harness), bounding a long-lived session's
  cache footprint to one query's working set instead of accumulating across
  50 queries;
- callers embedding operators directly can call
  :func:`release_operator_caches` whenever a query's results have been
  materialized, or wrap each logical unit in
  ``with operator_cache_scope(): ...`` — persists registered inside the
  ``with`` body are released on exit (after the caller has materialized its
  results inside the block) and never leak into, or get released by, any
  other scope or the session registry.

``localCheckpoint`` relations are deliberately NOT tracked: checkpointing
truncates lineage, so unpersisting one would lose data that can no longer be
recomputed.
"""

from __future__ import annotations

import threading
import weakref
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

# Session registry: weak keys so a RELEASED session's (now empty) entry
# disappears with the session.  A session with UNRELEASED persists is
# intentionally pinned — its tracked DataFrames hold a strong reference back
# to the session (they must stay reachable to be unpersisted at all), so the
# weak key cannot fire until the caller releases; releasing is the contract
# (scope exit, release_operator_caches, or the registry's next-query hook).
_SESSIONS: "weakref.WeakKeyDictionary[SparkSession, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
_LOCK = threading.Lock()
# Explicit scope stack is thread-local: two threads composing operators
# concurrently each see only their own scopes.
_LOCAL = threading.local()


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_LOCAL, "stack", None)
    if stack is None:
        stack = []
        _LOCAL.stack = stack
    return stack


def persist_tracked(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """``df.persist()`` + register for later release.

    Registered to the innermost active :func:`operator_cache_scope` on this
    thread if one exists, else to the owning session's registry (released by
    :func:`release_operator_caches`)."""
    df = df.persist(level) if level is not None else df.persist()
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
    else:
        with _LOCK:
            _SESSIONS.setdefault(df.sparkSession, []).append(df)
    return df


def _release(dfs: list[DataFrame]) -> int:
    released = 0
    while dfs:
        df = dfs.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released


def release_operator_caches(spark: SparkSession | None = None) -> int:
    """Unpersist tracked relations; returns how many were released.

    With ``spark`` given, releases only that session's registry; with
    ``None``, releases every session's (the sequential driver/bench path).
    Explicit scopes are never touched — they release on scope exit."""
    released = 0
    with _LOCK:
        if spark is not None:
            targets = [_SESSIONS.pop(spark, [])]
        else:
            targets = [_SESSIONS.pop(s) for s in list(_SESSIONS.keys())]
    for dfs in targets:
        released += _release(dfs)
    return released


@contextmanager
def operator_cache_scope():
    """Scope operator persists to a ``with`` block.

    Every :func:`persist_tracked` on this thread inside the block registers
    to this scope (not the session registry) and is unpersisted on exit —
    materialize results inside the block.  Scopes nest; concurrent scopes on
    different threads are independent, so library callers composing
    operators in parallel can't release each other's persists."""
    scope: list[DataFrame] = []
    _scope_stack().append(scope)
    try:
        yield scope
    finally:
        _scope_stack().pop()
        _release(scope)
