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
