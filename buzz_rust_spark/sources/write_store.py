"""Write-side commit store: conditional-put primitives for table commits.

Both lakehouse writers commit by claiming a VERSIONED filename exactly once
— Delta's ``_delta_log/<N>.json`` (PROTOCOL.md: "Writers MUST only write a
given log entry once"; the reference implementation routes this through a
LogStore whose contract is put-if-absent) and Iceberg's
``v<N>.metadata.json`` (the version-filename claim is the compare-and-swap:
a writer that read version N may promote N+1 only if nobody else has).
Everything ELSE either writer emits — data files, manifests, delete files,
staging parquet — is written under fresh UUID names, so plain unconditional
puts are race-free for those and they stay on the ordinary filesystem path.

This module isolates the one primitive whose semantics differ per backing
store:

- :class:`LocalCommitStore` — the default.  ``put_if_absent`` stages the
  full content to a temp file and ``os.link``\\ s it into place: the link is
  atomic AND fails with EEXIST when the target exists, so a racing writer
  can never observe a torn or overwritten commit file.
- :class:`MemoryCommitStore` — an in-process dict store for contention
  tests (and a reference implementation of the contract).
- An S3 store would implement ``put_if_absent`` with a conditional PUT
  (``If-None-Match: *``, supported by S3 since 2024-08 and by GCS/Azure
  natively); it is not shipped here because this environment has no object
  store to test against, but every commit path already routes through the
  interface, so plugging one in touches no writer logic.

The loser of a race gets :class:`~..errors.BuzzCommitConflictError`, a
TYPED RETRYABLE error: the caller re-reads the table state (someone else's
commit landed) and re-attempts its own commit at the next version.

Both stores expose ``before_claim`` — a test seam invoked with the target
path right before the claim is attempted.  Contention tests park two
writers on a barrier there so both provably read the same table version
before either claims, making the race deterministic instead of schedule-
dependent.
"""

from __future__ import annotations

import os
import threading
import uuid

from ..errors import BuzzCommitConflictError


class LocalCommitStore:
    """Filesystem store: atomic claims via temp-file + ``os.link``."""

    def __init__(self) -> None:
        self.before_claim = None  # test seam: callable(path) | None

    def put_if_absent(self, path: str, data: bytes) -> None:
        """Atomically create ``path`` with ``data`` iff it does not exist;
        :class:`BuzzCommitConflictError` when another writer got there
        first (retryable: re-read table state and re-commit)."""
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        if self.before_claim is not None:
            self.before_claim(path)
        try:
            os.link(tmp, path)
        except FileExistsError as exc:
            raise BuzzCommitConflictError(
                f"concurrent commit detected: {os.path.basename(path)!r} "
                "already exists — re-read the table and retry the commit"
            ) from exc
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def put_atomic(self, path: str, data: bytes) -> None:
        """Unconditional atomic replace (advisory files: version hints)."""
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)


class MemoryCommitStore:
    """In-process store: the contract, minus the filesystem.  Thread-safe;
    used to unit-test the conditional-put semantics and by contention
    tests that want a store with no disk side effects."""

    def __init__(self) -> None:
        self._data: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.before_claim = None

    def put_if_absent(self, path: str, data: bytes) -> None:
        if self.before_claim is not None:
            self.before_claim(path)
        with self._lock:
            if path in self._data:
                raise BuzzCommitConflictError(
                    f"concurrent commit detected: {os.path.basename(path)!r} "
                    "already exists — re-read the table and retry the commit"
                )
            self._data[path] = bytes(data)

    def put_atomic(self, path: str, data: bytes) -> None:
        with self._lock:
            self._data[path] = bytes(data)

    def read(self, path: str) -> bytes:
        with self._lock:
            return self._data[path]

    def paths(self) -> list[str]:
        with self._lock:
            return sorted(self._data)


_DEFAULT_STORE = LocalCommitStore()


def default_store() -> LocalCommitStore:
    return _DEFAULT_STORE


def commit_with_retry(attempt, refresh, first_state, max_retries: int = 5):
    """Bounded optimistic-concurrency loop around a METADATA-ONLY commit.

    ``attempt(state)`` claims the versioned commit file — raising
    :class:`~..errors.BuzzCommitConflictError` on a lost race — and
    returns the operation summary.  On conflict, ``refresh()`` re-reads
    the table state and re-validates the operation's basis against it:
    it returns the fresh state for the next attempt, raises
    :class:`~..errors.BuzzCommitAbortedError` when the concurrent winner
    invalidated the basis (non-retryable — re-run the operation), or
    returns ``None`` when the operation became a no-op (e.g. a peer
    already committed the same idempotent txn marker) — the loop then
    returns ``None`` without further attempts.

    The point of the split: ``attempt`` must contain NO Spark job — data
    and delete files are staged ONCE before the loop under fresh UUID
    names and every attempt reuses them, so losing a race costs a
    metadata re-read and a new claim (milliseconds), never a recompute.
    ``max_retries`` bounds livelock under sustained contention; the final
    conflict propagates typed and retryable to the caller."""
    state = first_state
    for attempts_left in range(max_retries, -1, -1):
        try:
            return attempt(state)
        except BuzzCommitConflictError:
            if attempts_left == 0:
                raise
        state = refresh()
        if state is None:
            return None
    raise AssertionError("unreachable")  # pragma: no cover
