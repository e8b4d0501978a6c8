"""Incremental tail of an Iceberg table — the change-feed consumer loop.

Structured Streaming has no Iceberg source in this environment, but the
same loop a `readStream` would run is two primitives this repo already
has: :func:`~buzz_rust_spark.sources.iceberg.read_iceberg_changes` (the
net-new rows of a snapshot window) and the exactly-once commit protocol
(:func:`~.bloom_ingest.dedup_commit_batch`).  This module composes them
into a cursor-driven poll a scheduler loops:

- :func:`iceberg_changes_poll` — one poll: (net-new rows since the
  cursor, new cursor).  ``cursor=None`` bootstraps with the full current
  snapshot (a consumer starting from scratch must see existing rows).
- :func:`corpus_prep_tail` — one full incremental corpus-prep pass:
  poll → cleaning/quality gates → cross-batch Bloom dedup →
  exactly-once commit to the output table, with the SOURCE snapshot's
  sequence number as the transaction version, so re-running a poll whose
  commit already landed (crash between commit and cursor persistence) is
  a no-op on the table AND heals the dedup state through the shared
  skipped-write guard.

Scale: each poll costs O(new snapshots) manifest reads + one distributed
scan of exactly the new files; the gates are shuffle-free maps and dedup
is O(batch) against the bounded Bloom state — a 100 TB source table is
never rescanned.

Crash matrix (cursor persisted by the CALLER after the poll returns):
- crash before commit → re-poll re-reads the same window, commits once;
- crash after commit, before cursor save → re-poll re-reads the window,
  the txn (app_id, to_seq) skips the table write, the skipped-write
  guard re-derives the state delta from the table itself;
- snapshots expired past the cursor → read_iceberg_changes raises its
  typed re-bootstrap error instead of silently losing rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.classifier import TextClassifierModel, classifier_weights_df
from ..operators.corpus import CorpusPrepConfig
from ..sources.iceberg import IcebergCatalog, read_iceberg_changes
from .bloom_ingest import DEFAULT_NUM_BITS, DEFAULT_NUM_HASHES, dedup_commit_batch
from .corpus_ingest import _clean_batch


def iceberg_changes_poll(
    spark: SparkSession,
    source_uri: str,
    cursor: int | None,
    region: str | None = None,
) -> tuple[DataFrame | None, int | None, int]:
    """One incremental poll: ``(rows, new_cursor, to_seq)``.

    ``rows`` is None when the table has no snapshot yet or no snapshot
    newer than the cursor (nothing to do; keep the old cursor).  With
    ``cursor=None`` the FULL current snapshot is returned (bootstrap) —
    tagged with the current snapshot id in ``_snapshot_id`` for shape
    parity with the incremental path."""
    from pyspark.sql import functions as F

    cat = IcebergCatalog("_tail", source_uri, region=region)
    snaps = cat._snapshots
    if not snaps:
        return None, cursor, 0
    cur = max(snaps, key=lambda s: int(s.get("sequence-number", 0)))
    cur_id = cur["snapshot-id"]
    to_seq = int(cur.get("sequence-number", 0))
    if cursor is None:
        df = cat.to_dataframe(spark).withColumn(
            "_snapshot_id", F.lit(int(cur_id)).cast("long")
        )
        return df, cur_id, to_seq
    if cursor == cur_id:
        return None, cursor, to_seq
    df = read_iceberg_changes(spark, source_uri, cursor, cur_id, region=region)
    return df, cur_id, to_seq


def corpus_prep_tail(
    spark: SparkSession,
    source_uri: str,
    table_uri: str,
    state_dir: str,
    app_id: str,
    cursor: int | None = None,
    config: CorpusPrepConfig | None = None,
    model: TextClassifierModel | None = None,
    classifier_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    table_format: str = "iceberg",
) -> dict:
    """One incremental corpus-prep pass over an Iceberg source table.

    Returns ``{"cursor": <new cursor>, "polled": bool}`` — the caller
    persists the cursor (checkpoint file, table property, scheduler
    state) and loops.  See the module docstring for the crash matrix."""
    rows, new_cursor, to_seq = iceberg_changes_poll(
        spark, source_uri, cursor
    )
    if rows is None:
        return {"cursor": new_cursor, "polled": False}
    cfg = config or CorpusPrepConfig()
    if cfg.scrub_span is not None:
        from ..errors import BuzzBadRequestError

        raise BuzzBadRequestError(
            "scrub_span is a cross-document batch stage; run it as a "
            "post-pass, not inside the incremental tail"
        )
    wdf = classifier_weights_df(spark, model) if model is not None else None
    cleaned = _clean_batch(
        rows.drop("_snapshot_id"), cfg, text_col, id_col, model,
        classifier_threshold, wdf,
    )
    dedup_commit_batch(
        cleaned, to_seq, table_uri, state_dir, app_id,
        text_col=text_col, id_col=id_col,
        num_bits=num_bits, num_hashes=num_hashes,
        table_format=table_format,
    )
    return {"cursor": new_cursor, "polled": True}
