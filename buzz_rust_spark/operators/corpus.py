"""End-to-end training-corpus preparation: the composed pipeline that turns a
raw document table into a deduplicated, decontaminated, split corpus.

Rebuild extension (no reference analog).  This is the capstone over the
individual operators — the order is the one production pipelines use, each
stage chosen so the whole run is a handful of well-shaped distributed passes:

1. **Scrub** (``redact_pii``) — narrow regexp map, no shuffle.
2. **Quality gate** (``quality_score``) — narrow projection + filter.
3. **Exact dedup** (``dedup_exact``) — one hash-agg shuffle on md5(text).
4. **Near-dup removal** (``minhash_lsh_pairs`` → ``duplicate_clusters``) —
   banded LSH candidates, verified Jaccard, connected components; survivors
   are each cluster's minimum id.
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

from .dedup import dedup_exact, duplicate_clusters, minhash_lsh_pairs
from .sampling import hash_split
from .text import contamination_flags, quality_score, redact_pii


@dataclass
class CorpusPrepConfig:
    min_quality: float = 0.5
    neardup_threshold: float = 0.8
    shingle_n: int = 3
    contamination_ngram: int = 8
    split_weights: dict[str, float] = field(
        default_factory=lambda: {"train": 98.0, "val": 1.0, "test": 1.0}
    )


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
    q = quality_score(scrubbed, text_col=text_col, id_col=id_col).select(
        id_col, "quality"
    )
    kept = scrubbed.join(q, on=id_col).where(F.col("quality") >= cfg.min_quality)

    # 3: exact dedup
    kept = dedup_exact(kept, text_col=text_col, id_col=id_col)

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
