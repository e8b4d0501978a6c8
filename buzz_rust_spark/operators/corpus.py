"""End-to-end training-corpus preparation: the composed pipeline that turns a
raw document table into a deduplicated, decontaminated, split corpus.

Rebuild extension (no reference analog).  This is the capstone over the
individual operators — the order is the one production pipelines use, each
stage chosen so the whole run is a handful of well-shaped distributed passes:

1. **Scrub** (``redact_pii``) — narrow regexp map, no shuffle.
1b. *(optional)* **C4 line cleaning** (``c4_clean_lines``) — rewrite each
   document to its surviving lines before anything scores it.
2. **Quality gate** (``quality_score``) — narrow projection + filter.
2b. *(optional)* **Gopher rule gate** (``gopher_quality``) — the published
   MassiveText shape heuristics, fused as one inline boolean filter.
3. **Exact dedup** (``dedup_exact``) — one hash-agg shuffle on md5(text).
3b. *(optional)* **Gopher repetition gate** (``gopher_repetition``) — the
   published repetition heuristics as a semi-join on ``passes`` against the
   persisted stage-1-3 result.
4. **Near-dup removal** (``minhash_lsh_pairs`` → ``duplicate_clusters``) —
   banded LSH candidates, verified Jaccard, connected components; survivors
   are each cluster's minimum id.
4b. *(optional)* **Span scrub** (``scrub_repeated_spans``) — cut residual
   repeated boilerplate below the document-level threshold.
5. **Decontamination** (``contamination_flags``) — broadcast of the eval
   set's n-gram hashes; drops documents overlapping the benchmark.
6. **Split** (``hash_split``) — leakage-free train/val/test assignment,
   stable under reruns and retries.

Every stage is a DataFrame → DataFrame transform, so the composition stays
ONE lazy plan per materialization and Catalyst sees through the whole thing
(column pruning reaches the scan even from stage 6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    dedup_exact,
    duplicate_clusters,
    minhash_lsh_pairs,
    scrub_repeated_spans,
)
from .sampling import hash_split
from ..functions.cache import persist_tracked
from .text import (
    c4_clean_lines,
    contamination_flags,
    gopher_passes_expr,
    gopher_repetition,
    quality_expr,
    redact_pii,
)


@dataclass
class CorpusPrepConfig:
    min_quality: float = 0.5
    neardup_threshold: float = 0.8
    shingle_n: int = 3
    contamination_ngram: int = 8
    split_weights: dict[str, float] = field(
        default_factory=lambda: {"train": 98.0, "val": 1.0, "test": 1.0}
    )
    # Optional published-heuristic stages (None = stage skipped):
    # kwargs forwarded to c4_clean_lines — line-level cleaning BEFORE scoring
    c4_rules: dict | None = None
    # kwargs forwarded to gopher_quality — rule gate after the quality score
    gopher_rules: dict | None = None
    # kwargs forwarded to gopher_repetition — the MassiveText repetition
    # gate (dup lines/paragraphs, top/dup n-gram char fractions)
    repetition_rules: dict | None = None
    # window size for exact-substring scrub after near-dup removal
    scrub_span: int | None = None


def prepare_training_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: CorpusPrepConfig | None = None,
) -> DataFrame:
    """Run the full prep pipeline; returns surviving documents with
    ``quality``, ``split``, and the scrub audit counts attached.

    ``benchmark`` (optional) is the eval set to decontaminate against; when
    None, stage 5 is skipped.  Survivor rule for near-dup clusters: keep the
    minimum-id member (same convention as ``dedup_exact``)."""
    cfg = config or CorpusPrepConfig()

    # 1-2: scrub + quality (narrow; fused into one codegen stage by Catalyst)
    scrubbed = redact_pii(df, text_col=text_col)

    # 1b (optional): C4 line-level cleaning — rewrite text to surviving
    # lines, drop documents failing the document rules.  Runs BEFORE scoring
    # so quality sees the cleaned text (the C4 ordering).  passthrough keeps
    # this a narrow projection — no corpus self-join.
    if cfg.c4_rules is not None:
        scrubbed = (
            c4_clean_lines(
                scrubbed, text_col=text_col, id_col=id_col,
                passthrough=True, **cfg.c4_rules,
            )
            .where(F.col("keep_doc"))
            .drop(text_col, "n_lines", "n_kept", "keep_doc")
            .withColumnRenamed("cleaned", text_col)
        )

    # quality attaches as ONE inline expression (identical values to
    # quality_score) — no stats relation, no corpus self-join on id, and the
    # scrub/C4 subtree evaluates once, not twice.
    kept = scrubbed.withColumn(
        "quality", quality_expr(F.col(text_col))
    ).where(F.col("quality") >= cfg.min_quality)

    # 2b (optional): Gopher rule gate — fused as ONE inline boolean filter
    # (identical values to gopher_quality's `passes`), not a metrics
    # relation + semi-join: the join formulation evaluated the scrub/C4/
    # quality subtree once per side — the redundant-scan pattern this module
    # eliminates everywhere else.
    if cfg.gopher_rules is not None:
        kept = kept.where(gopher_passes_expr(F.col(text_col), **cfg.gopher_rules))

    # 3: exact dedup
    kept = dedup_exact(kept, text_col=text_col, id_col=id_col)

    # The stage 1-3 result feeds FOUR downstream evaluations (near-dup
    # pair generation, the cluster loser anti-join, both decontamination
    # branches) and duplicate_clusters runs eager driver-loop actions —
    # persist (scoped-cache-tracked) so the scrub/quality/dedup subtree
    # computes once, not ~4x.
    kept = persist_tracked(kept)

    # 3b (optional): Gopher repetition gate.  Unlike the shape rules this is
    # a RELATION-producing metric (its n-gram stats are per-doc hash
    # aggregates, not an inline expression), so it must run on the PERSISTED
    # stage-1-3 result and semi-join back on the id — placed here, its three
    # reads of `kept` all hit the cache instead of re-deriving the
    # scrub/C4/quality/dedup subtree.
    if cfg.repetition_rules is not None:
        rep = gopher_repetition(
            kept, text_col=text_col, id_col=id_col, **cfg.repetition_rules
        )
        kept = kept.join(
            rep.where(F.col("passes")).select(id_col), on=id_col, how="left_semi"
        )

    # 4: near-dup clusters → drop non-minimum members
    pairs = minhash_lsh_pairs(
        kept, text_col=text_col, id_col=id_col,
        n=cfg.shingle_n, threshold=cfg.neardup_threshold,
    )
    clusters = duplicate_clusters(pairs)  # (doc_id, cluster_id = min member)
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    kept = kept.join(losers, on=id_col, how="left_anti")

    # 4b (optional): exact-substring scrub — cut residual repeated spans
    # (boilerplate below the document-level near-dup threshold) and rewrite
    # the text; documents scrubbed to nothing are dropped.  passthrough
    # carries all columns and leaves UNCUT documents' text untouched
    # (byte-for-byte), so enabling this stage does not re-normalize the
    # whole corpus.
    if cfg.scrub_span is not None:
        kept = (
            scrub_repeated_spans(
                kept, text_col=text_col, id_col=id_col,
                span=cfg.scrub_span, passthrough=True,
            )
            .where(F.length(text_col) > 0)
            .drop("n_tokens", "n_removed")
        )

    # 5: decontamination (broadcast eval-set n-grams)
    if benchmark is not None:
        flags = contamination_flags(
            kept, benchmark, text_col=text_col, id_col=id_col,
            n=cfg.contamination_ngram,
        )
        kept = kept.join(
            flags.where(~F.col("contaminated")).select(id_col), on=id_col
        )

    # 6: split assignment (narrow, key-stable)
    return hash_split(kept, cfg.split_weights, key_cols=[id_col])
