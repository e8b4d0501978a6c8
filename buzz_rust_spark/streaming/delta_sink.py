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
