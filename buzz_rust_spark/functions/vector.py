"""Vector column helpers — JVM-side (whole-stage codegen), no Python UDFs.

Dot products and norms are expressed with higher-order functions
(``zip_with``/``aggregate``), which Catalyst evaluates inside codegen.  All
arithmetic is done in DOUBLE with strict left-to-right accumulation so results
are bit-reproducible and match an oracle computing the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right Σ a_i*b_i in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) in double precision; 0.0 when either norm is zero."""
    a = as_double_array(a)
    b = as_double_array(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (zero vectors pass through unchanged)."""
    a = as_double_array(a)
    n = l2_norm(a)
    return F.when(n == 0.0, a).otherwise(F.transform(a, lambda x: x / n))


def max_abs(a: Column) -> Column:
    return F.array_max(F.transform(as_double_array(a), lambda x: F.abs(x)))


def int8_quantize(a: Column) -> Column:
    """Symmetric int8 quantization codes: round(x * 127/max|x|) as tinyint.

    The storage layout for 4×-smaller embedding tables (the standard ANN
    memory optimization); pair with the scale ``127/max_abs`` to dequantize.
    Zero vectors quantize to all-zero codes."""
    a = as_double_array(a)
    m = max_abs(a)
    return F.when(m == 0.0, F.transform(a, lambda x: x.cast("tinyint"))).otherwise(
        F.transform(a, lambda x: F.round(x * (127.0 / m)).cast("tinyint"))
    )


def int8_quantization_mae(a: Column) -> Column:
    """Mean absolute error of the int8 round trip — the measurable recall
    cost of quantized storage, computable without materializing codes."""
    a = as_double_array(a)
    m = max_abs(a)
    scale = 127.0 / m
    err = F.aggregate(
        F.transform(a, lambda x: F.abs(x - F.round(x * scale) / scale)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # size==0 guard: max_abs(empty) is NULL (not 0.0), so without it the
    # otherwise-branch divides by zero — a job-killing error under ANSI mode
    return F.when((m == 0.0) | (F.size(a) == 0), F.lit(0.0)).otherwise(
        err / F.size(a)
    )
