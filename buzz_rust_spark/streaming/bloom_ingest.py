"""Streaming corpus ingestion with cross-batch Bloom dedup.

Composes the two stateful pieces this repo already has into the standard
100 TB ingestion loop:

- **Dedup state** = the Bloom filter of ``operators/bloom.py``, kept as an
  APPEND-ONLY parquet log of per-batch sketch deltas.  ``bit_or`` is
  idempotent and commutative, so the state is a CRDT: a replayed micro-batch
  appending its delta twice changes nothing, concurrent writers commute, and
  the reader just ``bloom_merge``-folds whatever rows exist.  No atomic
  rename, no lock, no compaction needed for correctness (compact whenever by
  rewriting the folded state — also idempotent).
- **Output** = the exactly-once Delta sink protocol: each batch's surviving
  documents commit together with a SetTransaction recording the batch id, so
  the at-least-once ``foreachBatch`` delivery yields exactly-once table rows.

Net guarantees across restarts/replays: a document whose normalized text was
seen in ANY earlier batch is dropped (no false negatives from the filter);
an fpp-fraction of new documents is also dropped (the bounded-state trade);
table content is exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, IntegerType, StructField, StructType

from ..operators.bloom import (
    DEFAULT_NUM_BITS,
    DEFAULT_NUM_HASHES,
    bloom_build,
    dedup_incremental_bloom,
)
from ..sources.delta_writer import write_delta

_STATE_SCHEMA = StructType(
    [
        StructField("word_idx", IntegerType()),
        StructField("bits", LongType()),
    ]
)


def read_bloom_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the append-only sketch-delta log into the current filter
    (empty filter when the log doesn't exist yet)."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        deltas = spark.read.schema(_STATE_SCHEMA).parquet(state_dir)
        deltas.schema  # force path resolution now, inside the try
    except AnalysisException as ex:
        # ONLY a genuinely absent log means "empty filter".  Any other
        # failure (permissions, throttling, corrupt footer) must propagate:
        # treating it as empty would silently drop ALL dedup history for
        # the batch and let every known duplicate through.
        if "PATH_NOT_FOUND" in str(ex) or "Path does not exist" in str(ex):
            return spark.createDataFrame([], _STATE_SCHEMA)
        raise
    return deltas.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_dedup_sink(
    stream_df: DataFrame,
    table_uri: str,
    state_dir: str,
    checkpoint_dir: str,
    app_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the dedup-ingest loop: per micro-batch, drop documents the
    Bloom state has seen (plus within-batch exact dups), commit survivors to
    the Delta table exactly-once, append the survivors' sketch delta to the
    state log."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = read_bloom_state(spark, state_dir)
        fresh = dedup_incremental_bloom(
            batch_df, state, text_col=text_col, id_col=id_col,
            num_bits=num_bits, num_hashes=num_hashes,
        ).persist()
        try:
            if not fresh.take(1):
                return
            write_delta(
                fresh.drop("text_hash"),
                table_uri,
                txn_app_id=app_id,
                txn_version=batch_id,
            )
            # State delta AFTER the data commit: if we crash between the
            # two, the replayed batch re-commits nothing (SetTransaction)
            # and re-appends the delta, which bit_or folds to a no-op.
            bloom_build(
                fresh.select("text_hash"), "text_hash",
                num_bits=num_bits, num_hashes=num_hashes,
            ).write.mode("append").parquet(state_dir)
        finally:
            fresh.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
