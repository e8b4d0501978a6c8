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
    from urllib.parse import unquote

    from ..errors import BuzzPlanError

    partition_cols = partition_cols or []
    files: list[CatalogFile] = []
    pattern = os.path.join(path, *["*=*"] * len(partition_cols), "*.parquet")
    for f in sorted(glob(pattern)):
        rel = os.path.relpath(f, path)
        parts = {}
        for segment in rel.split(os.sep)[:-1]:
            if "=" in segment:
                k, v = segment.split("=", 1)
                # Spark URL-encodes special chars in partition directory
                # names (date=2009%2F06); the manifest must carry the REAL
                # value or filters on it silently match nothing
                parts[k] = unquote(v)
        missing = [c for c in partition_cols if c not in parts]
        if missing:
            raise BuzzPlanError(
                f"file {rel!r} lacks hive-style directories for declared "
                f"partition columns {missing} — not a layout scan_manifest "
                f"can catalog"
            )
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


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) interleave of ``len(cols)`` numeric columns (names or
    Column expressions) as a single long sort key — entirely JVM-side
    expressions (no UDF).

    Inputs must already be non-negative ints < 2^bits (``write_zordered``
    auto-scales); they are bit-interleaved so that sorting by the result
    clusters rows that are close in EVERY dimension.  Written files then have
    tight min/max ranges on *all* z-order columns simultaneously —
    multi-dimensional row-group/file pruning, where a plain sort only prunes
    its leading column.  bits*len(cols) must be ≤ 63."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63 (long)")
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, e in enumerate(exprs):
            src = F.shiftright(e.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(src, b * n + i))
    return key


def scaled_zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Auto-scaled Z-order key over ``cols`` as a Column — one distributed
    min/max pass maps every dimension onto the full ``2^bits`` range (else
    the widest column's high bits dominate the curve), then
    :func:`zorder_key` interleaves.  A SINGLE column degrades to the column
    itself (linear clustering — the curve is the identity in 1-D).  NULLs
    produce a NULL key and cluster together at one end of the range
    partitioning.  Used by the lakehouse compaction ops
    (``rewrite_iceberg``/``optimize_delta`` with ``zorder_by``) and
    :func:`write_zordered`."""
    from pyspark.sql import functions as F

    if len(cols) == 1:
        return F.col(cols[0])
    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[
            F.min(F.col(c).cast("double")).alias(f"lo_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.col(c).cast("double")).alias(f"hi_{i}")
            for i, c in enumerate(cols)
        ],
    ).first()
    top = float(2**bits - 1)
    scaled = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"lo_{i}"], stats[f"hi_{i}"]
        span = max(1.0, (hi or 0.0) - (lo or 0.0))
        scaled.append(
            F.floor((F.col(c).cast("double") - F.lit(lo or 0.0)) * top / span)
        )
    return zorder_key(scaled, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    records_per_file: int | None = None,
    mode: str = "overwrite",
    auto_scale: bool = True,
) -> None:
    """Write parquet clustered by the Z-order curve over ``zorder_by``.

    ``repartitionByRange`` on the z-key splits the curve into contiguous
    segments (one per output task — a full shuffle, paid once at write time),
    then each file covers a compact hyper-rectangle of the key space.  Readers
    filtering on any z-order column skip whole files/row-groups via parquet
    min/max stats — the standard layout optimization for multi-dimensional
    scan-heavy workloads at 100 TB (same trick as Delta OPTIMIZE ZORDER BY).

    ``auto_scale`` (default) maps every dimension onto the full 2^bits range
    with one distributed min/max pass first — required whenever the columns
    have different scales, else the wider column's high bits dominate the
    curve and the narrow column gets no clustering at all."""
    if auto_scale:
        zkey = scaled_zorder_key(df, list(zorder_by), bits)
    else:
        zkey = zorder_key(list(zorder_by), bits)
    out = (
        df.withColumn("__zkey", zkey)
        .repartitionByRange("__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    # NB: dropping __zkey after the repartition keeps the files free of the
    # helper column while preserving the curve-segment clustering.
    writer = out.write.mode(mode)
    if records_per_file:
        writer = writer.option("maxRecordsPerFile", records_per_file)
    writer.parquet(path)
