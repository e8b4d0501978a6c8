"""Streaming ingestion into an Iceberg table: ``foreachBatch`` +
snapshot-summary transactions.

The Iceberg twin of :mod:`~buzz_rust_spark.streaming.delta_sink` (the
reference engine has no sinks at all — SURVEY.md §2.A "Sinks: none"; both
sinks are rebuild extension surface).  Structured Streaming delivers each
micro-batch at-least-once into ``foreachBatch``; the sink passes the batch
id to :func:`~buzz_rust_spark.sources.iceberg_writer.write_iceberg` as
``txn_version``, which records the (app id, batch id) pair in the snapshot
SUMMARY — atomic with the data commit, Iceberg's analogue of Delta's
SetTransaction action (and the protocol Iceberg's own Spark streaming sink
uses).  A replayed batch finds its version already committed and skips, so
table content is exactly-once.

Maintenance composes the same way as the Delta side: micro-batches append
small files; :func:`~buzz_rust_spark.sources.iceberg_writer.
rewrite_iceberg` compacts them in the background without pausing the
stream (single-writer local-FS posture: schedule the rewrite between
batches)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.iceberg_writer import write_iceberg


def iceberg_sink(
    stream_df: DataFrame,
    table_uri: str,
    checkpoint_dir: str,
    app_id: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming append into the Iceberg table at ``table_uri``.

    ``app_id`` identifies this sink in the table's snapshot summaries —
    use a stable name per (stream, table) pair; restarting the stream
    with the same ``app_id`` and checkpoint resumes exactly-once.
    ``available_now=True`` drains all currently-available input then
    stops (the batch-parity test mode); ``False`` runs continuously."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty micro-batch: nothing to commit
            return
        write_iceberg(
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


def iceberg_upsert_sink(
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
    """Streaming CDC UPSERT into an Iceberg table: each micro-batch runs
    ONE :func:`~buzz_rust_spark.sources.iceberg_writer.merge_iceberg`
    keyed on ``keys`` — whole-row merge-on-read upsert by default (ONE
    commit of equality deletes + new data files, O(batch), no table
    scan), or the conditional / partial-column clause form
    (``matched_clauses`` / ``not_matched_condition`` /
    ``by_source_clauses`` / ``insert_values``, see
    :mod:`~..sources.merge_clauses`) for real CDC shapes.

    Exactly-once: the merge carries the (``app_id``, batch id) pair in
    its snapshot SUMMARY, committed atomically with the data — Iceberg's
    analogue of the Delta sink's SetTransaction
    (:func:`~.delta_sink.delta_upsert_sink`); the marker survives
    snapshot expiry as a ``buzz.txn.<app>`` table property.  A replayed
    micro-batch after a crash finds the marker BEFORE any staging and
    skips, making non-idempotent clause expressions (``t.v + s.v``) safe
    on replay too.  One writer per ``app_id``; a batch carrying
    duplicate key rows is a typed error (merge's ambiguous-merge
    guard) — deduplicate upstream with ``dropDuplicates`` or a
    last-wins window."""
    from ..sources.iceberg_writer import merge_iceberg

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty micro-batch: nothing to commit
            return
        merge_iceberg(
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
