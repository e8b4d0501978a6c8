"""Streaming ingestion into a Delta table: ``foreachBatch`` + SetTransaction.

The reference engine has no sinks at all (SURVEY.md §2.A "Sinks: none"); this
is the rebuild's ingestion extension, the standard pattern for landing a
100 TB/day stream as an analyzable table: micro-batches append small commits,
:func:`~buzz_rust_spark.sources.optimize_delta` compacts them in the
background, and :func:`~buzz_rust_spark.sources.vacuum_delta` garbage-collects
the leftovers.

Exactly-once: Structured Streaming replays a micro-batch after a failure
(at-least-once delivery into ``foreachBatch``), so the sink records the batch
id as a Delta SetTransaction (``txn`` action) inside the SAME atomic commit as
the data.  On replay, ``write_delta`` sees the (appId, batchId) pair already
committed and skips — the log-commit atomicity turns at-least-once delivery
into exactly-once table content.  This is the same protocol Delta's own
streaming sink uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.delta_writer import write_delta


def delta_sink(
    stream_df: DataFrame,
    table_uri: str,
    checkpoint_dir: str,
    app_id: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming append into the Delta table at ``table_uri``.

    ``app_id`` identifies this sink in the table's transaction log — use a
    stable name per (stream, table) pair; restarting the stream with the same
    ``app_id`` and checkpoint resumes exactly-once.  ``available_now=True``
    drains all currently-available input then stops (the batch-parity test
    mode); ``False`` runs continuously.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty micro-batch: nothing to commit
            return
        write_delta(
            batch_df,
            table_uri,
            partition_by=partition_by,
            txn_app_id=app_id,
            txn_version=batch_id,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def delta_upsert_sink(
    stream_df: DataFrame,
    table_uri: str,
    keys: list[str],
    checkpoint_dir: str,
    app_id: str,
    matched_clauses: list[dict] | None = None,
    not_matched_condition: str | None = None,
    by_source_clauses: list[dict] | None = None,
    insert_values: dict[str, str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC UPSERT into a Delta table: each micro-batch runs ONE
    :func:`~buzz_rust_spark.sources.delta_writer.merge_delta` keyed on
    ``keys`` — whole-row upsert by default, or the conditional /
    partial-column clause form (``matched_clauses`` /
    ``not_matched_condition`` / ``by_source_clauses`` /
    ``insert_values``, see :mod:`~..sources.merge_clauses`) for real CDC
    shapes ("update only stale rows, delete tombstones, drop rows the
    snapshot no longer contains, keep the rest").

    Exactly-once: the merge commits a SetTransaction (``txn``) action
    with the batch id atomically with its data, so a replayed
    micro-batch after a crash is SKIPPED — the same protocol as
    :func:`delta_sink`, now on the mutation path.  NOTE the replay skip
    makes non-idempotent clause expressions (e.g. ``t.v + s.v``) safe
    too: the re-merge never runs.  One writer per ``app_id``; a batch
    carrying duplicate key rows is a typed error (merge's
    ambiguous-merge guard) — deduplicate upstream with
    ``dropDuplicates`` or a last-wins window."""
    from ..sources.delta_writer import merge_delta

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty micro-batch: nothing to commit
            return
        merge_delta(
            batch_df.sparkSession,
            table_uri,
            batch_df,
            keys,
            matched_clauses=matched_clauses,
            not_matched_condition=not_matched_condition,
            by_source_clauses=by_source_clauses,
            insert_values=insert_values,
            txn_app_id=app_id,
            txn_version=batch_id,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
