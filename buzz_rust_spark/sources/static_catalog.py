"""Static catalog: a declared schema + explicit file list + string partition values.

Reference: code/src/datasource/catalog/static_catalog.rs (CatalogFile list,
``split()`` = one worker table per file) and example_catalog.rs (the hard-coded
NYC-taxi catalogs).  In the rebuild, "split" is Spark's own file-split→task
mapping; what remains is pruning (manifest filter), strict schema verification,
and attaching partition values as string columns.

Scale design:
- Pruning happens *before* the read, on the manifest — the scan never lists or
  opens pruned files (the reference's catalog-level pruning, catalog/mod.rs:43-99).
- Partition values are attached by grouping files per distinct partition tuple
  and reading each group once with literal columns — no join, no shuffle, and
  the per-group read is still a single vectorized parquet scan.  With P distinct
  partition tuples the plan has P unioned scans, which matches how a
  hive-partitioned directory scan plans anyway.
- A declared schema is passed to every read: no footer-sniffing job at plan
  time, and column pruning/pushdown still apply.

The reference's static catalog hides partition columns from the map SQL
(static_catalog.rs:99-104 passes the data schema); this rebuild exposes them as
first-class string columns — a documented superset (SURVEY.md §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..errors import BuzzPlanError
from .manifest import CatalogFile, prune_manifest
from .schema_check import verify_files


@dataclass
class StaticCatalog:
    """reference: static_catalog.rs:40-55 ``new(schema, region, bucket,
    partition_cols, files)``; region/bucket collapse into the file URI."""

    name: str
    schema: StructType
    files: list[CatalogFile]
    partition_cols: list[str] = field(default_factory=list)
    verify_schemas: bool = False
    verify_max_files: int | None = 16

    def full_schema(self) -> StructType:
        """Data schema + partition columns as non-null strings
        (reference: catalog_schema, catalog/mod.rs:128-137)."""
        return StructType(
            list(self.schema.fields)
            + [StructField(c, StringType(), nullable=False) for c in self.partition_cols]
        )

    def pruned_files(
        self, spark: SparkSession, partition_filter: str | None
    ) -> list[CatalogFile]:
        return prune_manifest(
            spark, self.files, self.partition_cols, partition_filter, self.name
        )

    def to_dataframe(
        self, spark: SparkSession, partition_filter: str | None = None
    ) -> DataFrame:
        files = self.pruned_files(spark, partition_filter)
        if not files:
            # Empty split set → empty result with the full schema, not an error
            # (reference: query_planner.rs:85-90, fuse_service.rs:80-83).
            return spark.createDataFrame([], schema=self.full_schema())
        if self.verify_schemas:
            verify_files(self.schema, [f.key for f in files], self.verify_max_files)

        if not self.partition_cols:
            return spark.read.schema(self.schema).parquet(*[f.key for f in files])

        # Group files by partition tuple; one scan per distinct tuple.
        groups: dict[tuple[str, ...], list[str]] = {}
        for f in files:
            values = tuple(f.partition_value(c) for c in self.partition_cols)
            if any(v is None for v in values):
                raise BuzzPlanError(
                    f"file {f.key!r} lacks values for partition columns "
                    f"{self.partition_cols}"
                )
            groups.setdefault(values, []).append(f.key)
        scans = []
        for values, paths in sorted(groups.items()):
            df = spark.read.schema(self.schema).parquet(*paths)
            for col, value in zip(self.partition_cols, values):
                df = df.withColumn(col, F.lit(value).cast(StringType()))
            scans.append(df)
        return reduce(DataFrame.unionByName, scans)
