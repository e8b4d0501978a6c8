"""Mergeable distinct-count state (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` family).

``approx_count_distinct`` (used by ``z04_approx_sketches``) answers one query;
these helpers make the SKETCH itself the artifact: a per-group binary state
that persists like any table, merges across batches/partitions with
``hll_union_agg``, and estimates on demand — the cardinality analog of the
Bloom (membership) and count-min (frequency) states in ``bloom.py``/``cms.py``.

The canonical 100 TB use: per-source distinct-token (or distinct-URL,
distinct-doc-hash) tracking over a rolling ingestion, where re-scanning
history per report is off the table.  Each batch contributes one tiny
(group, sketch) relation; the running state is a sum-shaped ``hll_union_agg``
over states — commutative, associative, one combinable shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 2^12 registers: ~1.6% relative standard error


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One (group..., sketch) row per group over ``df[key_col]``.

    ONE map-side-combinable shuffle; the shuffled payload is the sketch
    (≤ 2^lg_k registers), never the keys."""
    groups = group_cols or []
    # backtick-quote: key_col is a column NAME, not an expression — unquoted
    # interpolation breaks on spaces/reserved words and silently evaluates
    # names like "a+b" as arithmetic
    agg = F.expr(f"hll_sketch_agg(`{key_col}`, {int(lg_k)})").alias("sketch")
    return df.groupBy(*groups).agg(agg) if groups else df.agg(agg)


def hll_merge(
    *states: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union of sketch states built with the same lg_k (per group)."""
    groups = group_cols or []
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    agg = F.expr("hll_union_agg(sketch)").alias("sketch")
    return out.groupBy(*groups).agg(agg) if groups else out.agg(agg)


def hll_estimate(
    state: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., n_distinct) from a sketch state — a narrow projection."""
    groups = group_cols or []
    return state.select(
        *groups, F.expr("hll_sketch_estimate(sketch)").alias("n_distinct")
    )
