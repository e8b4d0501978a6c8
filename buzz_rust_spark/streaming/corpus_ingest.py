"""Streaming corpus preparation: the training-data pipeline as an ingest loop.

Production corpora are not built in one batch — crawls arrive continuously,
and every published pipeline (CCNet, C4, RefinedWeb, Dolma) eventually runs
as exactly this loop: new shards stream in, the NARROW cleaning/quality
stages run per micro-batch, dedup consults a bounded cross-batch state, and
survivors commit to the output table exactly once.

``corpus_prep_sink`` composes the already-tested batch pieces:

1. **Cleaning + quality gates** (PII redaction, C4 line rules, composite
   quality floor, Gopher rules) — all codegen projections/filters from
   ``operators/corpus.py``'s config, applied per micro-batch with no state.
2. **Quality-classifier gate** (optional) — a FROZEN
   :class:`~buzz_rust_spark.operators.classifier.TextClassifierModel`
   (train offline, persist via ``operators/artifacts.py``) scores each batch
   pure-JVM; rows under ``classifier_threshold`` drop.  The model is a
   parameter, not trained here: training inside an ingest loop would make
   acceptance drift with arrival order.
3. **Cross-batch Bloom dedup + exactly-once Delta commit** — identical
   mechanics (and crash-ordering argument) to
   :func:`~buzz_rust_spark.streaming.bloom_ingest.bloom_dedup_sink`: data
   commits under a SetTransaction before the state delta appends, so a
   crash between the two replays to a no-op.

Scale: stages 1-2 are shuffle-free maps; the only per-batch shuffles are the
dedup hash aggregate and the broadcast-join membership probe against the
bounded Bloom state — per-batch cost is O(batch), never O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.classifier import TextClassifierModel, classifier_scores
from ..operators.corpus import CorpusPrepConfig
from ..operators.bloom import dedup_incremental_bloom
from ..operators.text import (
    c4_clean_lines,
    gopher_passes_expr,
    quality_expr,
    redact_pii,
)
from ..sources.delta_writer import write_delta
from .bloom_ingest import DEFAULT_NUM_BITS, DEFAULT_NUM_HASHES, bloom_build, read_bloom_state


def _clean_batch(
    batch_df: DataFrame,
    cfg: CorpusPrepConfig,
    text_col: str,
    id_col: str,
    model: TextClassifierModel | None,
    classifier_threshold: float,
) -> DataFrame:
    """The stateless per-batch prep: scrub → C4 → quality → Gopher →
    classifier gate.  Mirrors prepare_training_corpus stages 1-2b (same
    expressions, same ordering) without the batch-only dedup stages."""
    out = redact_pii(batch_df, text_col=text_col)
    if cfg.c4_rules is not None:
        out = (
            c4_clean_lines(
                out, text_col=text_col, id_col=id_col,
                passthrough=True, **cfg.c4_rules,
            )
            .where(F.col("keep_doc"))
            .drop(text_col, "n_lines", "n_kept", "keep_doc")
            .withColumnRenamed("cleaned", text_col)
        )
    out = out.withColumn("quality", quality_expr(F.col(text_col))).where(
        F.col("quality") >= cfg.min_quality
    )
    if cfg.gopher_rules is not None:
        out = out.where(gopher_passes_expr(F.col(text_col), **cfg.gopher_rules))
    if model is not None:
        scores = classifier_scores(out, model, text_col=text_col, id_col=id_col)
        out = (
            out.join(scores, on=id_col)
            .where(F.col("score") >= classifier_threshold)
            .drop("score")
        )
    return out


def corpus_prep_sink(
    stream_df: DataFrame,
    table_uri: str,
    state_dir: str,
    checkpoint_dir: str,
    app_id: str,
    config: CorpusPrepConfig | None = None,
    model: TextClassifierModel | None = None,
    classifier_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming corpus-prep loop; returns the StreamingQuery.

    Output rows carry the cleaned ``text_col`` plus the ``quality`` score;
    documents dropped by any gate or seen by the cross-batch dedup state
    never reach the table.  Replaying a crashed/restarted stream cannot
    double-commit (SetTransaction) or corrupt the dedup state (bit_or folds
    idempotently)."""
    cfg = config or CorpusPrepConfig()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cleaned = _clean_batch(
            batch_df, cfg, text_col, id_col, model, classifier_threshold
        )
        state = read_bloom_state(spark, state_dir)
        fresh = dedup_incremental_bloom(
            cleaned, state, text_col=text_col, id_col=id_col,
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
            # state delta AFTER the data commit (same crash argument as
            # bloom_dedup_sink: replay re-commits nothing, re-appending the
            # delta bit_or-folds to a no-op)
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
