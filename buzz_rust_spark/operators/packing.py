"""Sequence packing: bin documents into fixed token-budget training sequences.

Rebuild extension (no reference analog) for the training-data surface: LLM
pretraining consumes fixed-length contexts, and naive one-doc-per-sequence
batching wastes the budget on padding.  Packing is bin-packing; the exact
optimum is NP-hard, but first-fit-decreasing (FFD) is the standard
11/9-OPT-bounded heuristic and is what large pipelines use.

Scale shape: a global FFD would serialize the corpus through one task, so the
corpus is hash-partitioned into ``n_groups`` independent packing groups and
FFD runs per group inside ``applyInPandas`` — per-task memory is
O(|corpus| / n_groups), groups pack in parallel, and the grouping key is
content-derived (xxhash64 of the id) so reruns and task retries produce the
same packing.  The fill-ratio cost of partitioned FFD vs global FFD is
negligible when groups hold >> capacity/min_doc_tokens documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 16,
    truncate_oversize: bool = False,
) -> DataFrame:
    """Assign each document to a packed sequence of at most ``capacity`` tokens.

    Output: one row per document —
    ``(id_col, tokens_col, seq_id string, seq_slot int)`` where ``seq_id`` is
    ``"<group>-<bin>"`` (deterministic) and ``seq_slot`` is the document's
    position within its sequence.  Documents longer than ``capacity`` raise by
    default; with ``truncate_oversize=True`` they each get a dedicated
    sequence and keep their real token count (the caller truncates at
    tokenization time).

    Aggregate per-sequence stats with :func:`packing_stats`.
    """
    import pandas as pd

    if capacity <= 0:
        raise BuzzBadRequestError("capacity must be positive")
    if n_groups <= 0:
        raise BuzzBadRequestError("n_groups must be positive")

    out_schema = (
        docs.select(id_col, tokens_col)
        .withColumn("seq_id", F.lit("x"))
        .withColumn("seq_slot", F.lit(0))
        .schema
    )
    cap = int(capacity)
    truncate = bool(truncate_oversize)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        group = int(pdf["_grp"].iloc[0])
        # Null (NaN after Arrow) or negative token counts must fail with the
        # offending document named — int(NaN) is an opaque task error and a
        # negative count silently inflates its bin past the token budget.
        bad = pdf[pdf[tokens_col].isna() | (pdf[tokens_col] < 0)]
        if len(bad):
            raise ValueError(
                f"document {bad.iloc[0][id_col]!r} has null/negative token "
                f"count {bad.iloc[0][tokens_col]!r}; clean counts upstream"
            )
        oversize = pdf[pdf[tokens_col] > cap]
        if len(oversize) and not truncate:
            worst = oversize.iloc[0]
            raise ValueError(
                f"document {worst[id_col]!r} has {worst[tokens_col]} tokens > "
                f"capacity {cap}; pass truncate_oversize=True to give oversize "
                f"documents dedicated sequences"
            )
        # FFD: descending size, id tiebreak for determinism.
        pdf = pdf.sort_values(
            by=[tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        counts: list[int] = []  # documents placed per bin
        assign: list[int] = []
        slots: list[int] = []
        # Scan only ACTIVE bins (opening order preserved → identical
        # first-fit choices) and retire a bin once its remainder drops below
        # the group's smallest document — it can never fit anything again.
        # Each bin retires at most once; without retirement the naive scan
        # over every bin ever opened is O(n²) Python-loop work per group
        # (full bins near zero remainder get re-scanned forever).
        min_doc = int(min(int(pdf[tokens_col].min()), cap)) if len(pdf) else 0
        active: list[int] = []
        for t in pdf[tokens_col]:
            t = int(min(t, cap))
            placed = None
            for b in active:
                if bins[b] >= t:
                    placed = b
                    break
            if placed is None:
                bins.append(cap)
                counts.append(0)
                placed = len(bins) - 1
                active.append(placed)
            assign.append(placed)
            slots.append(counts[placed])
            counts[placed] += 1
            bins[placed] -= t
            if bins[placed] < min_doc:
                active.remove(placed)
        out = pdf[[id_col, tokens_col]].copy()
        out["seq_id"] = [f"{group}-{b}" for b in assign]
        out["seq_slot"] = slots
        return out

    grouped = docs.select(
        id_col, tokens_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).alias("_grp")
    )
    return grouped.groupBy("_grp").applyInPandas(ffd, schema=out_schema)


def packing_stats(
    packed: DataFrame,
    capacity: int,
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """One row per sequence: document count, token total, fill ratio — plus
    the corpus-wide padding waste as ``1 - avg(fill)`` downstream.  A plain
    two-phase aggregation (map-side partials, one shuffle on seq_id)."""
    cap = int(capacity)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.least(F.col(tokens_col), F.lit(cap))).alias("seq_tokens"),
        )
        .withColumn("fill", F.round(F.col("seq_tokens") / F.lit(float(cap)), 6))
    )
