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

    Every branch is **session-time-zone independent**: TIMESTAMP_NTZ is
    decomposed into wall-clock components (``unix_date`` of the date part +
    hour/minute/fractional second — all zone-free extractions on NTZ; note
    ``timestamp_diff`` would NOT do: it implicitly casts NTZ operands through
    the session zone, off by an hour across DST transitions), DATE goes
    through ``unix_date`` (calendar days), and TIMESTAMP is already an
    instant.
    """
    if isinstance(dtype, TimestampNTZType):
        return (
            F.unix_date(col.cast("date")).cast("double") * F.lit(86400.0)
            + F.hour(col).cast("double") * F.lit(3600.0)
            + F.minute(col).cast("double") * F.lit(60.0)
            + F.date_part(F.lit("SECOND"), col).cast("double")
        )
    if isinstance(dtype, DateType):
        return F.unix_date(col).cast("double") * F.lit(86400.0)
    if isinstance(dtype, TimestampType):
        return F.unix_micros(col) / F.lit(1_000_000.0)
    return col.cast("double")
