"""Write path (sink) — rebuild extension.

The reference has NO write path: results stream back to the caller and are
pretty-printed (fuse_service.rs:130-135; SURVEY.md §2.A "Sinks: none").  A
pipeline engine needs one, so this module adds the idiomatic Spark sinks plus
a manifest generator that closes the loop back into :class:`StaticCatalog`
(write → manifest → catalog → pruned read), mirroring the reference's
write-then-read test pattern (parquet.rs:273-355).

Scale notes baked in:
- ``partition_by`` produces hive-style directories → free partition pruning on
  read; partition values become strings, matching reference semantics.
- ``records_per_file`` bounds output file sizes (the knob that controls the
  map fan-out of whoever reads this data next — the reference's
  one-file-per-worker contract, static_catalog.rs:95-107).
- ``sort_by`` sorts within partitions → better parquet page/column-index
  pruning for readers filtering on those keys.
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql import DataFrame

from .manifest import CatalogFile
from .static_catalog import StaticCatalog


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    records_per_file: int | None = None,
) -> None:
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if records_per_file:
        writer = writer.option("maxRecordsPerFile", records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def scan_manifest(path: str, partition_cols: list[str] | None = None) -> list[CatalogFile]:
    """Build CatalogFile entries (key, length, string partition values) from a
    written parquet directory — the catalog side of the write→read loop."""
    partition_cols = partition_cols or []
    files: list[CatalogFile] = []
    pattern = os.path.join(path, *["*=*"] * len(partition_cols), "*.parquet")
    for f in sorted(glob(pattern)):
        rel = os.path.relpath(f, path)
        parts = {}
        for segment in rel.split(os.sep)[:-1]:
            if "=" in segment:
                k, v = segment.split("=", 1)
                parts[k] = v
        files.append(
            CatalogFile(
                key=f,
                length=os.path.getsize(f),
                partitions=tuple((c, parts[c]) for c in partition_cols),
            )
        )
    return files


def catalog_from_written(
    name: str, path: str, schema, partition_cols: list[str] | None = None
) -> StaticCatalog:
    return StaticCatalog(
        name=name,
        schema=schema,
        files=scan_manifest(path, partition_cols),
        partition_cols=partition_cols or [],
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (hash-partitioned into ``num_buckets`` files per
    write task's output, registered in the session catalog).

    This is the co-located-join primitive: two tables bucketed on the same key
    with the same bucket count join WITHOUT a shuffle (each task reads the
    matching bucket pair) — at 100 TB the single biggest join saving available,
    paid once at write time.  ``sort_cols`` additionally pre-sorts each bucket,
    letting sort-merge joins skip the sort too."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
