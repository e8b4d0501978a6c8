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

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
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
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[fn](col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _FINAL[fn](f"__p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
