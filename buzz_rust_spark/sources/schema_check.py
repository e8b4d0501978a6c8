"""Strict declared-schema-vs-footer verification.

Reference semantics (code/src/execution_plan/parquet.rs:84-100): before
scanning, the worker compares the catalog's declared Arrow schema
field-by-field (name, type, nullability) against the parquet footer schema and
fails the stage on any mismatch.  Spark's default behavior is to silently
reconcile; this module restores the strict check.

Scale note: footer reads are metadata-only (a few KiB per file).  When a
SparkSession is provided and more than ``DISTRIBUTE_THRESHOLD`` files need
checking, the check runs as a ``mapInPandas`` job over the file list — one
footer read per task row, so 100k-file catalogs verify at executor
parallelism instead of a driver-side loop.  Below the threshold (or without
a session) it is a driver-side pyarrow loop.  ``max_files`` SAMPLES the
check: only the first ``max_files`` paths are verified (StaticCatalog
defaults to 16 — a spot check, not a guarantee; pass
``verify_max_files=None`` for the full, distributed verification).
"""

from __future__ import annotations

import json as _json

import pyarrow.parquet as pq
from pyspark.sql.pandas.types import from_arrow_type
from pyspark.sql.types import DataType, NullType, StructType, TimestampNTZType, TimestampType

from ..errors import BuzzSchemaError


def _pyarrow_path(path: str) -> str:
    """Map Hadoop-only ``s3a://`` URIs to pyarrow's ``s3://`` so footer reads
    work on S3 catalogs (same normalization LogStore applies)."""
    return "s3://" + path[len("s3a://"):] if path.startswith("s3a://") else path


def arrow_to_spark_field(field) -> tuple[str, DataType, bool]:
    """Map one Arrow field to (name, spark_type, nullable) with the narrowing
    rules documented in SURVEY.md §1.3 (UInt64→Long, ns-timestamp→µs)."""
    try:
        spark_type = from_arrow_type(field.type, prefer_timestamp_ntz=True)
    except Exception as exc:
        raise BuzzSchemaError(
            f"unsupported parquet type {field.type} for column {field.name!r}: {exc}"
        ) from exc
    return field.name, spark_type, field.nullable


def _normalize(dt: DataType) -> DataType:
    # Parquet ns/ms/us timestamps all land in Spark's single timestamp type;
    # treat NTZ and LTZ as the same for footer comparison (the session-level
    # choice, not the file, decides which one Spark reads).
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return TimestampNTZType()
    return dt


def _footer_schema(path: str, fmt: str):
    """File-format footer/metadata schema via pyarrow — metadata-only reads
    for both formats (ORC holds its type description in the file footer,
    like parquet)."""
    if fmt == "orc":
        from pyarrow import fs as pa_fs
        from pyarrow import orc as pa_orc

        p = _pyarrow_path(path)
        if "://" in p:
            filesystem, inner = pa_fs.FileSystem.from_uri(p)
            with filesystem.open_input_file(inner) as fh:
                return pa_orc.ORCFile(fh).schema
        return pa_orc.ORCFile(p).schema
    return pq.read_schema(_pyarrow_path(path))


def verify_file_schema(
    declared: StructType, path: str, fmt: str = "parquet"
) -> None:
    """Raise :class:`BuzzSchemaError` if the file footer at ``path`` does not
    match ``declared`` by name/type (reference: parquet.rs:84-100; the same
    strict check applies to ORC footers).

    Nullability is checked one-way: a footer field marked required may feed a
    nullable declared column, but not the reverse (a nullable footer column
    under a non-null declaration can produce nulls the schema forbids)."""
    footer = _footer_schema(path, fmt)
    footer_fields = {f.name: f for f in footer}
    for declared_field in declared.fields:
        if isinstance(declared_field.dataType, NullType):
            # Reference catalogs declare all-null columns (example_catalog.rs:149);
            # any footer representation is acceptable.
            continue
        actual = footer_fields.get(declared_field.name)
        if actual is None:
            raise BuzzSchemaError(
                f"column {declared_field.name!r} declared in catalog schema is "
                f"missing from parquet file {path!r}"
            )
        name, spark_type, nullable = arrow_to_spark_field(actual)
        if _normalize(spark_type) != _normalize(declared_field.dataType):
            raise BuzzSchemaError(
                f"column {name!r} in {path!r} has type {spark_type.simpleString()} "
                f"but catalog declares {declared_field.dataType.simpleString()}"
            )
        if nullable and not declared_field.nullable:
            raise BuzzSchemaError(
                f"column {name!r} in {path!r} is nullable but catalog declares "
                f"it non-null"
            )


# file counts above this distribute the footer check over executors
DISTRIBUTE_THRESHOLD = 64


def verify_files(
    declared: StructType,
    paths: list[str],
    max_files: int | None = None,
    spark=None,
    fmt: str = "parquet",
) -> None:
    """Verify up to ``max_files`` footers (ALL when None — the first
    ``max_files`` paths otherwise, i.e. a sample).  With a ``spark`` session
    and more than :data:`DISTRIBUTE_THRESHOLD` files, verification runs
    distributed (one executor task batch per partition of the path list)."""
    to_check = paths if max_files is None else paths[:max_files]
    if spark is not None and len(to_check) > DISTRIBUTE_THRESHOLD:
        _verify_files_distributed(spark, declared, to_check, fmt)
        return
    for p in to_check:
        verify_file_schema(declared, p, fmt)


def _verify_files_distributed(
    spark, declared: StructType, paths: list[str], fmt: str = "parquet"
) -> None:
    """Footer check as a Spark job: ship the declared schema as JSON, read
    each footer executor-side with pyarrow, emit one row per failing file.
    Only error strings come back to the driver (capped), so the job moves
    KiB regardless of catalog size."""
    import pandas as pd  # noqa: F401 — executor dependency, fail fast on driver
    from pyspark.sql.types import StringType, StructField

    schema_json = declared.json()
    out_schema = StructType([StructField("error", StringType())])

    def check(batches):
        import pandas as pd

        decl = StructType.fromJson(_json.loads(schema_json))
        for pdf in batches:
            errs = []
            for p in pdf["path"]:
                try:
                    verify_file_schema(decl, p, fmt)
                except BuzzSchemaError as exc:
                    errs.append(str(exc))
                except Exception as exc:  # unreadable footer fails the check
                    # (reference parity: a worker that can't read the footer
                    # fails its stage, parquet.rs:84-100) — surfaced as a
                    # check error instead of an opaque task failure
                    errs.append(f"cannot read {fmt} footer at {p!r}: {exc}")
            yield pd.DataFrame({"error": errs})

    n_parts = min(
        len(paths), int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    errors = [
        r["error"]
        for r in spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(n_parts)
        .mapInPandas(check, out_schema)
        .limit(8)
        .collect()
    ]
    if errors:
        raise BuzzSchemaError(
            f"{len(errors)}+ file(s) failed the schema check; first errors:\n"
            + "\n".join(errors)
        )
