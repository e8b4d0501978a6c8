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
3. **Cross-batch Bloom dedup + exactly-once Delta commit** — the SAME
   shared protocol as
   :func:`~buzz_rust_spark.streaming.bloom_ingest.bloom_dedup_sink`
   (one implementation:
   :func:`~buzz_rust_spark.streaming.bloom_ingest.dedup_commit_batch`),
   including the skipped-write guard that keeps colliding batch ids from
   poisoning the dedup state with never-committed documents.

Scale: stages 1-2 are shuffle-free maps; the only per-batch shuffles are the
dedup hash aggregate and the broadcast-join membership probe against the
bounded Bloom state — per-batch cost is O(batch), never O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..errors import BuzzBadRequestError
from ..operators.classifier import (
    TextClassifierModel,
    classifier_scores,
    classifier_weights_df,
)
from ..operators.corpus import CorpusPrepConfig
from ..operators.text import (
    c4_clean_lines,
    gopher_passes_expr,
    gopher_repetition,
    quality_expr,
    redact_pii,
)
from .bloom_ingest import DEFAULT_NUM_BITS, DEFAULT_NUM_HASHES, dedup_commit_batch


def _clean_batch(
    batch_df: DataFrame,
    cfg: CorpusPrepConfig,
    text_col: str,
    id_col: str,
    model: TextClassifierModel | None,
    classifier_threshold: float,
    weights_df: DataFrame | None = None,
) -> DataFrame:
    """The stateless per-batch prep: scrub → C4 → quality → Gopher →
    repetition → classifier gate.  Mirrors prepare_training_corpus's
    per-document stages (same expressions, same ordering) without the
    cross-document batch-only stages (near-dup clusters, span scrub,
    split assignment)."""
    out = redact_pii(batch_df, text_col=text_col, counts=False)
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
    if cfg.repetition_rules is not None:
        # per-DOCUMENT metrics → identical semantics per micro-batch
        rep = gopher_repetition(
            out, text_col=text_col, id_col=id_col, **cfg.repetition_rules
        )
        out = out.join(
            rep.where(F.col("passes")).select(id_col), on=id_col, how="left_semi"
        )
    if model is not None:
        scores = classifier_scores(
            out, model, text_col=text_col, id_col=id_col, weights_df=weights_df
        )
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
    table_format: str = "delta",
) -> StreamingQuery:
    """Start the streaming corpus-prep loop; returns the StreamingQuery.

    Output rows carry the cleaned ``text_col`` plus the ``quality`` score;
    documents dropped by any gate or seen by the cross-batch dedup state
    never reach the table.  Replaying a crashed/restarted stream cannot
    double-commit (SetTransaction / Iceberg snapshot-summary txn, per
    ``table_format``) or corrupt the dedup state (bit_or folds
    idempotently)."""
    cfg = config or CorpusPrepConfig()
    if cfg.scrub_span is not None:
        # exact-substring scrubbing is a CROSS-document rewrite; running it
        # per micro-batch would silently weaken its semantics to
        # within-batch — refuse instead (run scrub_repeated_spans as a
        # batch post-pass over the committed table)
        raise BuzzBadRequestError(
            "scrub_span is a cross-document batch stage; run it as a "
            "post-pass, not inside the streaming sink"
        )
    # build the frozen model's serving relation ONCE for the whole stream
    wdf = (
        classifier_weights_df(stream_df.sparkSession, model)
        if model is not None
        else None
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = _clean_batch(
            batch_df, cfg, text_col, id_col, model, classifier_threshold, wdf
        )
        dedup_commit_batch(
            cleaned, batch_id, table_uri, state_dir, app_id,
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
