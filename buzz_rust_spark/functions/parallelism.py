"""Input-parallelism guard for CPU-heavy operators.

A single large parquet row-group arrives as ONE input split, so every
downstream narrow transformation (shingling, hashing, decoding) runs on one
core no matter how many the cluster has.  ``ensure_parallelism`` round-robins
the input across the session's shuffle parallelism when (and only when) the
plan has fewer partitions than that — at real scale inputs already carry
thousands of splits and this is a no-op."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
