"""CSV / JSON-lines catalogs with the reference's strict-schema posture.

Rebuild extension: the reference reads only parquet (SURVEY.md §2.A A1 —
execution_plan/parquet.rs is its single leaf scan), but a real switch-over
corpus lands as CSV and JSONL too.  These catalogs keep the reference's
schema discipline (datasource/hbee/... declares the schema up front;
parquet.rs:84-100 fails the stage on mismatch):

- the schema is DECLARED, never inferred (no sampling scan, no drift);
- rows that do not parse fail the query (``mode=FAILFAST``) instead of
  silently nulling — the moral equivalent of the footer check for formats
  that carry no footer;
- ``permissive=True`` opts into quarantine instead: rows that fail parsing
  land in a ``_corrupt_record`` column the caller can route to a dead-letter
  sink — the standard large-ingest posture where one bad line must not kill
  a 100 TB backfill.

Scale notes: CSV/JSON scans are narrow and splittable (uncompressed or bzip2);
column pruning works for both (JSON schema pruning; CSV drops unused columns
after parse), but neither carries min/max stats, so filters CANNOT prune files
— the write path's job is to convert to parquet (sources/writer.py) as step
one of any pipeline.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyspark.errors import AnalysisException

from ..errors import BuzzBadRequestError, BuzzPlanError

_CORRUPT = "_corrupt_record"


def _failfast_reader(spark: SparkSession, schema: StructType, options: dict):
    reader = spark.read.schema(schema).option("mode", "FAILFAST")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def _parse_ddl(schema: StructType) -> str:
    """DDL string for from_csv/from_json with the quarantine column appended."""
    cols = [f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields]
    cols.append(f"`{_CORRUPT}` string")
    return ", ".join(cols)


def _permissive_scan(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str,
    options: dict,
    header_fields: list[str] | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Lazy permissive scan: read lines as text, parse with from_csv/from_json.

    Spark's native PERMISSIVE reader exposes ``_corrupt_record`` as a special
    internal column that the analyzer refuses to reference alone
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented workaround is
    ``cache()``, which is a non-starter for a 100 TB backfill.  Parsing with
    ``from_csv``/``from_json`` instead makes the quarantine column an ordinary
    struct field: no restriction, no materialization, one scan shared lazily
    by the clean and quarantined sides.
    """
    raw = spark.read.text(path)
    if header_fields is not None:
        # header=True CSVs: drop header lines by NORMALIZED field match —
        # split on the delimiter, strip a trailing \r (CRLF files), trim,
        # and unquote each field, then compare the field LIST to the schema
        # names.  A byte-exact compare against one reconstructed string
        # missed quoted ("a","b"), CRLF, and padded headers, letting them
        # parse as data rows.  Residual caveat (inherent to content-based
        # detection on a splittable text scan, where "first line per file"
        # is not observable): an all-string-schema DATA row whose fields
        # exactly equal the column names is also dropped.
        split_line = F.split(
            F.regexp_replace(F.col("value"), "\r$", ""), re.escape(delimiter)
        )
        norm_fields = F.transform(
            split_line,
            lambda x: F.regexp_replace(F.trim(x), '^"(.*)"$', "$1"),
        )
        names = F.array(*[F.lit(n) for n in header_fields])
        raw = raw.where(~(norm_fields == names))
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    opts.update(options)
    parse = F.from_csv if fmt == "csv" else F.from_json
    return raw.select(
        parse(F.col("value"), _parse_ddl(schema), opts).alias("r")
    ).select("r.*")


@dataclass
class CsvCatalog:
    """Header-optional CSV over a declared schema; FAILFAST by default."""

    name: str
    path: str
    schema: StructType
    header: bool = True
    delimiter: str = ","
    permissive: bool = False
    options: dict = field(default_factory=dict)

    def to_dataframe(
        self,
        spark: SparkSession,
        partition_filter: str | None = None,
        stats_filter: str | None = None,
    ) -> DataFrame:
        if self.schema is None or not self.schema.fields:
            raise BuzzBadRequestError(
                f"CSV catalog {self.name!r} requires a declared schema "
                f"(inference is disabled by design)"
            )
        if self.permissive:
            opts = {"sep": self.delimiter}
            opts.update(self.options)
            header_fields = (
                [f.name for f in self.schema.fields] if self.header else None
            )
            df = _permissive_scan(
                spark, self.path, self.schema, "csv", opts,
                header_fields, self.delimiter,
            )
        else:
            opts = {"header": str(self.header).lower(), "sep": self.delimiter}
            opts.update(self.options)
            df = _failfast_reader(spark, self.schema, opts).csv(self.path)
        if partition_filter:
            df = df.where(partition_filter)
        if stats_filter:
            # row formats carry no per-file column stats to prune on; the
            # predicate still applies exactly (Catalyst pushes it down)
            try:
                df = df.where(stats_filter)
            except AnalysisException as exc:
                raise BuzzPlanError(
                    f"invalid stats_filter for catalog {self.name!r}: "
                    f"{exc.getMessage() if hasattr(exc, 'getMessage') else exc}"
                ) from exc
        return df


@dataclass
class JsonLinesCatalog:
    """JSON-lines over a declared schema; FAILFAST by default."""

    name: str
    path: str
    schema: StructType
    permissive: bool = False
    options: dict = field(default_factory=dict)

    def to_dataframe(
        self,
        spark: SparkSession,
        partition_filter: str | None = None,
        stats_filter: str | None = None,
    ) -> DataFrame:
        if self.schema is None or not self.schema.fields:
            raise BuzzBadRequestError(
                f"JSON catalog {self.name!r} requires a declared schema "
                f"(inference is disabled by design)"
            )
        if self.permissive:
            df = _permissive_scan(
                spark, self.path, self.schema, "json", dict(self.options)
            )
        else:
            df = _failfast_reader(spark, self.schema, dict(self.options)).json(
                self.path
            )
        if partition_filter:
            df = df.where(partition_filter)
        if stats_filter:
            # row formats carry no per-file column stats to prune on; the
            # predicate still applies exactly (Catalyst pushes it down)
            try:
                df = df.where(stats_filter)
            except AnalysisException as exc:
                raise BuzzPlanError(
                    f"invalid stats_filter for catalog {self.name!r}: "
                    f"{exc.getMessage() if hasattr(exc, 'getMessage') else exc}"
                ) from exc
        return df


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a permissive read into (clean_rows, quarantined_rows).

    Clean rows drop the corrupt-record column; quarantined rows keep every
    column (the raw line rides in ``_corrupt_record``; whatever fields did
    parse stay for triage).  Both are lazy filters over the same text scan —
    no extra pass, no cache."""
    if _CORRUPT not in df.columns:
        raise BuzzBadRequestError(
            "quarantine_split expects a permissive-mode read "
            f"(no {_CORRUPT} column present)"
        )
    clean = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.where(F.col(_CORRUPT).isNotNull())
    return clean, bad
