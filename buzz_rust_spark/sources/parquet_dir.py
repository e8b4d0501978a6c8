"""Directory-of-parquet catalog — rebuild extension (no reference analog).

The reference only reads explicit file lists (static) or Delta snapshots; a
plain partitioned directory is the idiomatic Spark source, so it is exposed as
a first-class catalog type.  Partition-column type inference is disabled
session-wide (session.py) so hive-style partition values stay strings, matching
reference semantics (README.md:113).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from ..errors import BuzzPlanError


@dataclass
class ParquetDirCatalog:
    name: str
    path: str
    schema: StructType | None = None

    def to_dataframe(
        self,
        spark: SparkSession,
        partition_filter: str | None = None,
        stats_filter: str | None = None,
    ) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.parquet(self.path)
        if stats_filter:
            # a directory scan has no catalog-level file list to prune:
            # Catalyst pushes the predicate into the parquet scan where
            # row-group min/max skipping does the equivalent work natively
            try:
                df = df.where(stats_filter)
            except AnalysisException as exc:
                raise BuzzPlanError(
                    f"invalid stats_filter for catalog {self.name!r}: "
                    f"{exc.getMessage() if hasattr(exc, 'getMessage') else exc}"
                ) from exc
        if partition_filter:
            # Catalyst turns this into directory-level partition pruning when
            # the filter hits hive-partition columns (PartitionFilters in the
            # scan node) — the built-in equivalent of catalog/mod.rs:43-99.
            try:
                df = df.where(partition_filter)
            except AnalysisException as exc:
                # typed-error parity with the Static/Delta catalogs: a filter
                # naming a column the table doesn't have must surface as a
                # plan error, not a raw Spark analysis exception
                raise BuzzPlanError(
                    f"invalid partition_filter for catalog {self.name!r}: "
                    f"{exc.getMessage() if hasattr(exc, 'getMessage') else exc}"
                ) from exc
        return df
