"""Type-aware time/numeric normalization for range-keyed operators.

Spark 4 reads parquet TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ, and ANSI
type checking forbids a direct ``CAST(timestamp_ntz AS DOUBLE)`` — so any
operator that quantizes or differences a "range dimension" column (as-of
join tolerance, bucketed range join) must dispatch on the column's type
instead of blind-casting.  Timestamps normalize through ``unix_micros`` on a
TIMESTAMP cast (legal from NTZ, LTZ, and DATE alike); numerics cast straight
to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DateType, TimestampNTZType, TimestampType

_TIME_TYPES = (TimestampType, TimestampNTZType, DateType)


def is_time_type(dtype: DataType) -> bool:
    return isinstance(dtype, _TIME_TYPES)


def epoch_seconds(col: Column, dtype: DataType) -> Column:
    """``col`` as fractional epoch seconds (double), whatever its type.

    TIMESTAMP_NTZ is interpreted in the session time zone (the cast to
    TIMESTAMP); any consistent interpretation is correct for bucketing and
    distance computations because both sides of an operator convert the same
    way, so the zone offset cancels.
    """
    if is_time_type(dtype):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000.0)
    return col.cast("double")
