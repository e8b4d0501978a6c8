"""Skew mitigation: salted two-phase aggregation.

For group keys with pathological skew (one key owning a large fraction of all
rows), a plain ``groupBy`` sends the whole hot key to one reducer.  AQE's skew
handling covers joins; for aggregations the standard fix is salting: aggregate
on (key, salt) first — spreading the hot key over ``salt_buckets`` reducers —
then combine the partials on key alone.  The second shuffle carries only
``salt_buckets`` rows per key.

Only decomposable aggregates are supported (sum/count/min/max — avg as
sum+count): exactly the set whose partials re-combine losslessly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError

# count partial counts the COLUMN (null-skipping), matching F.count(col) in
# the plain groupBy the docstring promises equality with — COUNT(*) here
# would overcount nullable inputs.
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.col(c)),
    "min": F.min,
    "max": F.max,
}
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """``aggs`` maps output column → (input column, fn) with fn in
    sum|count|min|max.  Result equals ``df.groupBy(keys).agg(...)`` for any
    input, skewed or not."""
    for out, (col, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise BuzzBadRequestError(
                f"agg {out!r}: {fn!r} is not decomposable (use sum/count/min/max)"
            )
    # Salt derives from row CONTENT, not monotonically_increasing_id(): the
    # latter changes across task retries, so a recomputed map task could land
    # rows under different salts than its surviving shuffle output and the
    # partial aggregate would double-count or drop rows (the classic Spark
    # repartition-nondeterminism hazard).  Content hashing is retry-stable;
    # the trade is that fully identical rows share a salt (they spread only
    # if some column varies — true for any real fact table).  Hash ONLY the
    # columns the aggregation touches: xxhash64 rejects map-typed columns,
    # and an unrelated map column must not break the aggregate.
    hash_cols = list(dict.fromkeys([*keys, *[c for c, _ in aggs.values()]]))
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(salt_buckets)),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[fn](col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    # count must come back 0 (not NULL) for an empty global aggregation —
    # sum over zero partial rows is NULL, but groupBy().agg(count) is 0.
    def final(out, fn):
        expr = _FINAL[fn](f"__p_{out}")
        if fn == "count":
            expr = F.coalesce(expr, F.lit(0).cast("long"))
        return expr.alias(out)

    return partial.groupBy(*keys).agg(
        *[final(out, fn) for out, (col, fn) in aggs.items()]
    )


def skew_join(
    big: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    hot_keys: list | None = None,
    support: float = 0.01,
) -> DataFrame:
    """Big-big equi-join resilient to hot keys.

    AQE's skew handling splits oversized shuffle partitions, but still
    shuffles both full relations.  When a few keys dominate, the cheaper
    plan routes them around the shuffle entirely: rows with hot keys join
    against a *broadcast* of the right side's (small) hot-key subset, all
    other rows take the normal shuffle join, and the union is exact —
    every row lands in exactly one branch, so the result equals the plain
    join for any input.

    ``hot_keys`` can be given explicitly (e.g. known-degenerate IDs); when
    None they are detected with ``freqItems`` — a one-pass sketch whose
    false positives only cost a slightly larger broadcast, never
    correctness.  NOTE: detection runs EAGERLY at call time (one full scan
    of ``big`` before any action on the result) — pass ``hot_keys``
    explicitly to keep the call lazily composable.  Supports inner and left
    joins (the split is partition-exhaustive for the left side)."""
    if how not in ("inner", "left", "left_outer"):
        raise BuzzBadRequestError(f"skew_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = [k for k in big.stat.freqItems([on], support).first()[0] if k is not None]
    if not hot_keys:
        return big.join(right, on, how)
    is_hot = F.col(on).isin(hot_keys)
    hot = big.where(is_hot).join(F.broadcast(right.where(is_hot)), on, how)
    rest = big.where(~is_hot | F.col(on).isNull()).join(right, on, how)
    return hot.unionByName(rest)
