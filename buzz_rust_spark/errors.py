"""Buzz error taxonomy, re-expressed as a Python exception hierarchy.

Mirrors the reference's error enum (reference: code/src/error.rs:16-50) so that
callers of the PySpark rebuild observe the same failure categories.  Engine
internals (Arrow/Parquet/IO variants) collapse into :class:`BuzzExecutionError`
because Spark surfaces them as execution failures.
"""

from __future__ import annotations


class BuzzError(Exception):
    """Base class for all engine errors (reference: code/src/error.rs:16)."""


class BuzzBadRequestError(BuzzError):
    """A malformed query/request (reference: error.rs BadRequest)."""


class BuzzNotImplementedError(BuzzError):
    """Known-but-unimplemented branch (reference: error.rs NotImplemented)."""


class BuzzInternalError(BuzzError):
    """Invariant violation inside the engine (reference: error.rs Internal)."""


class BuzzPlanError(BuzzError):
    """Invalid plan: bad casts, unresolved columns, bad step graph
    (reference: error.rs Plan; raised by the planner checks in
    query_planner.rs:66-71,104-109,149-166)."""


class BuzzExecutionError(BuzzError):
    """Failure while executing a planned query (reference: error.rs Execution)."""


class BuzzSchemaError(BuzzPlanError):
    """Declared catalog schema does not match the parquet footer schema
    (reference: code/src/execution_plan/parquet.rs:84-100 fails the stage on
    any name/type/nullability mismatch)."""


class BuzzCommitConflictError(BuzzExecutionError):
    """A concurrent writer claimed the commit filename first (Delta
    ``_delta_log/<N>.json`` put-if-absent, Iceberg ``v<N>.metadata.json``
    version promote).  RETRYABLE: the table advanced under the caller, who
    should re-read its state and re-attempt the commit at the new version —
    nothing was corrupted and nothing from the failed attempt is visible to
    readers.  The writers do this automatically (``max_commit_retries``):
    staged data files are reused and only the metadata claim re-runs."""

    retryable = True


class BuzzCommitAbortedError(BuzzExecutionError):
    """A lost commit race could NOT be safely retried: the concurrent
    winner invalidated this operation's basis — it rewrote or removed a
    file the operation matched, changed the schema or partition spec, or
    replaced the snapshot a compaction was built from.  NON-retryable at
    the commit layer; the operation must be re-run from its scan against
    the current table state."""

    retryable = False


class BuzzRebootstrapError(BuzzExecutionError):
    """An incremental window over a table's history cannot be read — the
    coordinates/snapshots it needs were rewritten or expired (a position
    delete landing after an in-range compaction rewrote its targets, a
    cursor pointing into expired/forked history).  The CURRENT state is
    fully intact: consumers recover by re-bootstrapping from a full
    snapshot read instead of the incremental feed.  Subclasses
    ``BuzzExecutionError`` so existing handlers keep matching."""


class BuzzConstraintError(BuzzExecutionError):
    """Staged rows violate a table-declared data rule — a Delta CHECK
    constraint (``delta.constraints.*``), a column invariant
    (``delta.invariants`` field metadata), or a generated column whose
    supplied values disagree with its ``delta.generationExpression``.
    The write is aborted BEFORE any commit; the table is untouched.
    Delta-parity semantics: a row satisfies a rule only when the
    expression evaluates to TRUE (false AND null both violate, matching
    delta-spark's CheckDeltaInvariant, which diverges from SQL-standard
    CHECK on nulls on purpose)."""

    retryable = False
