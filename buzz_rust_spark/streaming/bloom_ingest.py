"""Streaming corpus ingestion with cross-batch Bloom dedup.

Composes the two stateful pieces this repo already has into the standard
100 TB ingestion loop:

- **Dedup state** = the Bloom filter of ``operators/bloom.py``, kept as an
  APPEND-ONLY parquet log of per-batch sketch deltas.  ``bit_or`` is
  idempotent and commutative, so the state is a CRDT: a replayed micro-batch
  appending its delta twice changes nothing, concurrent writers commute, and
  the reader just ``bloom_merge``-folds whatever rows exist.  No atomic
  rename, no lock, no compaction needed for CORRECTNESS; for read cost,
  :func:`compact_bloom_state` log-structurally folds the deltas whenever
  (safe mid-stream by the same idempotence argument).
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
    import os

    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    # local-path fast probe: a bootstrap poll's not-yet-created state dir
    # would otherwise log a harmless-but-noisy FileNotFoundException stack
    # trace from a Spark listener before the typed catch below fires
    if "://" not in state_dir and not os.path.exists(state_dir):
        return spark.createDataFrame([], _STATE_SCHEMA)
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


def compact_bloom_state(
    spark: SparkSession, state_dir: str, min_deltas: int = 2,
    min_age_sec: float = 300.0,
) -> int:
    """Fold the append-only sketch-delta log into one delta; returns how many
    input delta files were removed (0 = nothing folded or all inputs still
    inside the deletion grace period).

    The log grows one parquet delta per micro-batch forever; reads fold the
    whole log, so an unbounded log makes every batch's state read O(history).
    Compaction is log-structured so it never loses APPENDER or READER state:

    1. snapshot the current delta file list;
    2. fold EXACTLY those files (``bit_or``) and append the folded result to
       the log as a new delta (any batch appended meanwhile is untouched and
       simply folds in later; a reader listing after this step sees a
       superset of the bits — idempotent under ``bit_or``);
    3. delete only snapshotted input files OLDER than ``min_age_sec``.

    The deletion grace is keyed to the FOLD time, not file age: inputs are
    recorded in a ``_pending-<uuid>.json`` sidecar stamped when their folded
    replacement lands, and deleted only once that stamp is ``min_age_sec``
    old — so a concurrent ``read_bloom_state`` that listed the directory
    any time before the fold has the full grace window to finish its read.
    Micro-batch state reads take seconds; the 5-minute default is orders of
    magnitude of headroom, and the stream's own ``foreachBatch`` loop is
    sequential, so compacting from the same driver between batches (as the
    test does) is always safe even with ``min_age_sec=0``.  Pending inputs
    are removed by a later call once aged — the log converges to one delta
    plus the most-recent grace window.  A crash at any step leaves the
    folded delta AND its inputs; the double-counted bits ``bit_or`` to the
    same state, and re-running compaction converges.  ``min_deltas`` is the
    retention knob: skip folding until the log has more than this many
    delta files, so a hot loop isn't rewriting a two-file log every call."""
    import glob
    import json as _json
    import os
    import time
    import uuid

    from pyspark.sql import functions as F

    from ..errors import BuzzBadRequestError

    local = state_dir
    for prefix in ("file://", "file:"):
        if local.startswith(prefix):
            local = local[len(prefix):]
            break
    if "://" in local:
        # silently returning 0 would be indistinguishable from
        # nothing-to-compact while the log grows forever
        raise BuzzBadRequestError(
            f"compact_bloom_state supports local state dirs only, got "
            f"{state_dir!r} (run it where the state filesystem is mounted)"
        )
    if not os.path.isdir(local):
        return 0

    def _delete_aged_pending() -> int:
        removed = 0
        cutoff = time.time() - min_age_sec
        for sidecar in glob.glob(os.path.join(local, "_pending-*.json")):
            try:
                rec = _json.loads(open(sidecar).read())
            except (OSError, ValueError):
                continue  # concurrent compactor mid-write/delete
            if rec.get("folded_at", float("inf")) > cutoff:
                continue
            for f in rec.get("inputs", []):
                try:
                    os.remove(os.path.join(local, f))
                    removed += 1
                except FileNotFoundError:
                    pass  # a concurrent compactor got it first — same bits
            try:
                os.remove(sidecar)
            except FileNotFoundError:
                pass
        return removed

    removed = _delete_aged_pending()

    # A compactor that crashed between its parquet write and rmtree leaves
    # a _compact-<uuid>.tmp directory behind; readers skip it ('_' prefix)
    # but nothing else would ever delete it.  Sweep stale ones by mtime —
    # min_age_sec guards a LIVE compactor's tmp dir from a concurrent sweep.
    import shutil as _shutil

    cutoff = time.time() - min_age_sec
    for stale in glob.glob(os.path.join(local, "_compact-*.tmp")):
        try:
            if os.path.isdir(stale) and os.path.getmtime(stale) <= cutoff:
                _shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # concurrent sweep got it first

    # Spark readers skip files starting with '_' or '.'; everything else in
    # the directory is a delta (appends write part-*; prior compactions write
    # compacted-*).  Files already recorded in a pending sidecar are folded
    # but awaiting deletion — exclude them from a re-fold (their bits are in
    # the compacted delta already; re-folding is harmless but pointless).
    pending_inputs: set[str] = set()
    for sidecar in glob.glob(os.path.join(local, "_pending-*.json")):
        try:
            pending_inputs.update(
                _json.loads(open(sidecar).read()).get("inputs", [])
            )
        except (OSError, ValueError):
            pass
    files = sorted(
        f
        for f in glob.glob(os.path.join(local, "*"))
        if os.path.isfile(f)
        and not os.path.basename(f).startswith(("_", "."))
        and os.path.basename(f) not in pending_inputs
    )
    if len(files) <= min_deltas:
        return removed
    folded = (
        spark.read.schema(_STATE_SCHEMA)
        .parquet(*files)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    tmp = os.path.join(local, f"_compact-{uuid.uuid4().hex}.tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(tmp)
    moved = 0
    for part in glob.glob(os.path.join(tmp, "part-*")):
        os.replace(
            part,
            os.path.join(local, f"compacted-{uuid.uuid4().hex}.parquet"),
        )
        moved += 1
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    if moved == 0:  # empty fold (log held only empty deltas) — keep inputs
        return removed
    # record the fold; the inputs become deletable min_age_sec from NOW
    sidecar = os.path.join(local, f"_pending-{uuid.uuid4().hex}.json")
    with open(sidecar + ".tmp", "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "folded_at": time.time(),
                    "inputs": [os.path.basename(f) for f in files],
                }
            )
        )
    os.replace(sidecar + ".tmp", sidecar)
    removed += _delete_aged_pending()
    return removed


def dedup_commit_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_uri: str,
    state_dir: str,
    app_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    table_format: str = "delta",
) -> None:
    """ONE copy of the exactly-once dedup-commit protocol, shared by every
    ingest sink (:func:`bloom_dedup_sink`, the streaming corpus prep):

    1. drop rows the Bloom state has seen (plus within-batch exact dups);
    2. commit survivors under SetTransaction ``(app_id, batch_id)``;
    3. ONLY IF step 2 actually committed, append the survivors' sketch
       delta to the state log.

    The step-3 guard is load-bearing.  A SKIPPED write (``write_delta``
    returns None) means one of two very different things:

    - a same-checkpoint replay after a crash between steps 2 and 3 — the
      batch's rows ARE in the table, and the state delta is the missing
      half that must be (re-)appended or future duplicates of those texts
      would pass the gate;
    - a fresh-checkpoint restart under the same app_id whose restarted
      batch ids collide with committed versions while carrying NEW data —
      those rows are NOT in the table, and appending their hashes would
      mark them seen without ever landing them: silent, permanent loss.

    The two cases are distinguished by the only ground truth there is — the
    table itself: after a skipped write, the state delta is appended ONLY
    for rows whose text digest is actually present in the table (a
    column-pruned scan + batch-sized semi-join, paid only on the rare
    skipped-write path).  Crashed replays heal exactly as before; colliding
    new data stays unmarked and commits under its later, non-colliding
    batch id.

    ``table_format`` picks the output table: ``"delta"`` commits under a
    SetTransaction, ``"iceberg"`` under a snapshot-summary transaction —
    both writers share the None-on-skip contract the protocol is built on,
    so the guard logic is format-agnostic."""
    from pyspark.sql import functions as F

    from ..functions.text import normalize_text

    if table_format not in ("delta", "iceberg"):
        raise ValueError(
            f"table_format must be delta|iceberg, got {table_format!r}"
        )
    spark = batch_df.sparkSession
    state = read_bloom_state(spark, state_dir)
    # persist the incoming relation: it feeds both sides of the membership
    # probe/join-back AND the keepers aggregate inside the dedup, and for
    # the corpus sink it carries the whole scrub/C4/quality/classifier
    # subtree — without this the expensive prep re-evaluates several times
    batch_df = batch_df.persist()
    fresh = dedup_incremental_bloom(
        batch_df, state, text_col=text_col, id_col=id_col,
        num_bits=num_bits, num_hashes=num_hashes,
    ).persist()
    try:
        if not fresh.take(1):
            return
        if table_format == "delta":
            committed = write_delta(
                fresh.drop("text_hash"),
                table_uri,
                txn_app_id=app_id,
                txn_version=batch_id,
            )
        else:
            from ..sources.iceberg_writer import write_iceberg

            committed = write_iceberg(
                fresh.drop("text_hash"),
                table_uri,
                txn_app_id=app_id,
                txn_version=batch_id,
            )
        advance = fresh
        if committed is None:
            # skipped write: advance the state only for rows the table
            # actually contains (see the protocol note above)
            if table_format == "delta":
                from ..sources import DeltaCatalog

                probe = DeltaCatalog("_dedup_probe", table_uri)
            else:
                from ..sources.iceberg import IcebergCatalog

                probe = IcebergCatalog("_dedup_probe", table_uri)
            table_hashes = (
                probe
                .to_dataframe(spark)
                .select(
                    F.md5(
                        F.encode(normalize_text(F.col(text_col)), "UTF-8")
                    ).alias("text_hash")
                )
            )
            advance = fresh.join(
                table_hashes,
                on=fresh["text_hash"].eqNullSafe(table_hashes["text_hash"]),
                how="left_semi",
            )
            if not advance.take(1):
                return
        bloom_build(
            advance.select("text_hash"), "text_hash",
            num_bits=num_bits, num_hashes=num_hashes,
        ).write.mode("append").parquet(state_dir)
    finally:
        fresh.unpersist()
        batch_df.unpersist()


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
    table_format: str = "delta",
) -> StreamingQuery:
    """Start the dedup-ingest loop: per micro-batch, drop documents the
    Bloom state has seen (plus within-batch exact dups), commit survivors to
    the output table (``table_format``: delta or iceberg) exactly-once,
    append the survivors' sketch delta to the state log (see
    :func:`dedup_commit_batch` for the protocol)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        dedup_commit_batch(
            batch_df, batch_id, table_uri, state_dir, app_id,
            text_col=text_col, id_col=id_col,
            num_bits=num_bits, num_hashes=num_hashes,
            table_format=table_format,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
