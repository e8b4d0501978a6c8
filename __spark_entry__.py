"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes one
entry per implemented operator from SURVEY.md §2 (plus the pipeline
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (non-expressible ones — pandas-UDF signatures,
approximate LSH, synthesized media — are rows-only by design and omitted).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from buzz_rust_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's canonical two-step Buzz query through the
    BuzzQuery JSON front-end, on sf0.001."""
    from buzz_rust_spark.queries.pipeline import b01_buzz_two_step

    return b01_buzz_two_step(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in sorted(all_queries().items())
        if q.oracle is not None
    }
