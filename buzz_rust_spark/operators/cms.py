"""Count-min sketch: bounded-memory frequency estimation over unbounded key
spaces (heavy hitters, token/domain frequencies at corpus scale).

The exact top-k path (``t05_top_ngrams``) shuffles one row per distinct key —
fine while the vocabulary fits a shuffle, but an open-ended key space (URLs,
n-grams at large n) wants the sketch: ``depth × width`` counters bound the
state no matter how many distinct keys stream through, with the classic
one-sided guarantee (Cormode & Muthukrishnan 2005): estimates never
UNDER-count, and over-count by more than ``e/width × total`` with probability
at most ``e^-depth``.

Same design stance as ``operators/bloom.py``: the sketch is a DataFrame —
a sparse ``(row_idx, col_idx, cnt)`` relation, one row per non-zero counter —
so it persists like any table, merges by summing counters, and builds with
ONE map-side-combinable shuffle bounded by depth×width rows per map task.
All hashing is JVM expressions; estimation joins the (broadcast-small)
sketch and takes the min across depth rows."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 5
DEFAULT_WIDTH = 1 << 14  # 16384 cols × 5 rows × 8B = 640 KiB of counters


def _cols(key: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` column indices for ``key`` (one seeded xxhash64
    per row — rows must be pairwise-independent, not cheap-derived)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(1000 + d)), F.lit(width).cast("long"))
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sparse counter relation ``(row_idx, col_idx, cnt)``.

    ``weight_col`` lets pre-aggregated inputs (key, count) feed the sketch
    without exploding back to unit rows."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    probes = df.select(
        w.alias("_w"),
        F.posexplode(_cols(F.col(key_col), depth, width)).alias("row_idx", "col_idx"),
    )
    return probes.groupBy("row_idx", "col_idx").agg(F.sum("_w").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum of sketches built with the same (depth, width) — counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "col_idx").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    out_col: str = "est_count",
) -> DataFrame:
    """``df`` plus the count-min estimate for each key: min over the depth
    rows of the addressed counters (missing counter = 0).

    The sketch is at most depth×width rows — broadcast it; the min-across-
    depth group-back is the only shuffle, keyed by the df's key."""
    probes = df.select(
        F.col(key_col).alias("_k"),
        F.posexplode(_cols(F.col(key_col), depth, width)).alias("row_idx", "col_idx"),
    )
    est = (
        probes.join(F.broadcast(sketch), on=["row_idx", "col_idx"], how="left")
        .groupBy("_k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(out_col))
    )
    return df.join(est.withColumnRenamed("_k", key_col), on=key_col, how="left")
