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
