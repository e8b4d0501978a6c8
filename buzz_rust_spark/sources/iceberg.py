"""Read-only Apache Iceberg table source (format v1/v2).

Iceberg is the other open table format a user pointing this engine at a
lakehouse will hold — the same role :class:`~buzz_rust_spark.sources.
delta_catalog.DeltaCatalog` plays for Delta, built the same way: parse the
table's own metadata (no external runtime), resolve the current snapshot's
file list, and delegate the scan to :class:`~buzz_rust_spark.sources.
static_catalog.StaticCatalog` so schema verification, empty-prune
semantics, and the engine integration are shared, not re-implemented.

The metadata chain is walked with in-repo codecs only:

- ``metadata/`` JSON (``version-hint.text`` → ``v<N>.metadata.json``, else
  the newest ``*.metadata.json``): format-version gate (1/2 accepted, >2 a
  typed refusal), current schema (Iceberg JSON types → Spark types),
  default partition spec, snapshot list (``snapshot_id=`` gives time
  travel).
- The snapshot's **manifest list** and each **manifest** are Avro OCF —
  decoded by ``sources/avro.py`` (named types and all), one more consumer
  of the same pure-python codec.
- **Partition pruning** happens at the manifest level: identity-transform
  partition values recorded per data file become ``CatalogFile`` partition
  tuples, pruned by the same ``partition_filter`` strings the static/Delta
  catalogs take.  Non-identity transforms (bucket/truncate/days/...) are
  not prunable here — a ``partition_filter`` against such a table is a
  typed BuzzPlanError (filterless reads work).  Unlike Delta/Hive layouts,
  Iceberg data files
  CONTAIN their partition columns, so the scan attaches nothing: pruning
  uses a partition-aware helper catalog, scanning a partition-free one.

Honest refusals (same posture as the Delta reader's protocol gates): v2
DELETE files — positional or equality (``content != 0`` anywhere in the
chain) — raise a typed error instead of silently resurrecting deleted rows;
format-version 3+ likewise.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..errors import (
    BuzzBadRequestError,
    BuzzExecutionError,
    BuzzPlanError,
    BuzzSchemaError,
)
from .avro import decode_avro_file
from .logstore import _SCHEME_RESOLVERS, LogStore
from .manifest import CatalogFile
from .static_catalog import StaticCatalog

_META = "metadata"


def _spark_uri(uri: str) -> str:
    """A manifest-recorded ABSOLUTE file path as Spark should read it:
    s3:// → s3a:// (stock Spark/Hadoop binds fs.s3a only — same
    normalization LogStore applies to table roots), registered test-seam
    schemes → their resolved local paths, file:// stripped."""
    if "://" not in uri:
        return uri
    scheme, rest = uri.split("://", 1)
    if scheme == "s3":
        return f"s3a://{rest}"
    if scheme == "file":
        return rest
    if scheme in _SCHEME_RESOLVERS:
        return _SCHEME_RESOLVERS[scheme](uri)
    return uri


def _partition_str(value, iceberg_type) -> str | None:
    """A manifest partition value (Avro PHYSICAL representation) as the
    SQL-comparable string the ``partition_filter`` surface uses: dates
    (days-since-epoch int) → ISO date, timestamps (micros) → ISO datetime,
    booleans → true/false, decimals (unscaled big-endian bytes) → scaled
    decimal string, uuid/fixed/binary → canonical uuid / hex — str() of the
    raw physical value would never match a user's filter."""
    if value is None:
        return None
    if iceberg_type == "date" and isinstance(value, int):
        import datetime

        return (
            datetime.date(1970, 1, 1) + datetime.timedelta(days=value)
        ).isoformat()
    if iceberg_type in ("timestamp", "timestamptz") and isinstance(value, int):
        import datetime

        return (
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=value)
        ).isoformat(sep=" ")
    if iceberg_type == "boolean" or isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (bytes, bytearray)):
        if isinstance(iceberg_type, str) and iceberg_type.startswith("decimal("):
            import decimal

            scale = int(iceberg_type[len("decimal(") : -1].split(",")[1])
            unscaled = int.from_bytes(bytes(value), "big", signed=True)
            return str(decimal.Decimal(unscaled).scaleb(-scale))
        if iceberg_type == "uuid" and len(value) == 16:
            import uuid

            return str(uuid.UUID(bytes=bytes(value)))
        return bytes(value).hex()
    return str(value)


def _iceberg_type(t) -> object:
    """Iceberg JSON type → Spark type (the types parquet tables actually
    use; ``uuid`` surfaces as string, ``timestamptz`` as timestamp)."""
    if isinstance(t, str):
        if t.startswith("decimal("):
            p, s = t[len("decimal(") : -1].split(",")
            return DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return BinaryType()
        prim = {
            "boolean": BooleanType(),
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "date": DateType(),
            "timestamp": TimestampType(),
            "timestamptz": TimestampType(),
            "string": StringType(),
            "uuid": StringType(),
            "binary": BinaryType(),
        }.get(t)
        if prim is None:
            raise BuzzSchemaError(f"unsupported iceberg type {t!r}")
        return prim
    kind = t.get("type")
    if kind == "struct":
        return StructType(
            [
                StructField(
                    f["name"], _iceberg_type(f["type"]), not f.get("required", False)
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return ArrayType(
            _iceberg_type(t["element"]), not t.get("element-required", False)
        )
    if kind == "map":
        return MapType(
            _iceberg_type(t["key"]),
            _iceberg_type(t["value"]),
            not t.get("value-required", False),
        )
    raise BuzzSchemaError(f"unsupported iceberg type {t!r}")


class IcebergCatalog:
    """Read-only Iceberg v1/v2 table: snapshot resolution + manifest-level
    partition pruning + StaticCatalog-delegated scanning."""

    def __init__(
        self,
        name: str,
        table_uri: str,
        snapshot_id: int | None = None,
        region: str | None = None,
    ):
        self.name = name
        self._store = LogStore(table_uri, region=region)
        self.table_uri = self._store.table_uri
        self.snapshot_id = snapshot_id
        self._load()

    # --- metadata chain ------------------------------------------------------

    def _metadata_path(self) -> str:
        store = self._store
        if not store.isdir(_META):
            raise BuzzExecutionError(f"no metadata dir at {self.table_uri!r}")
        hint = f"{_META}/version-hint.text"
        if store.exists(hint):
            v = store.read_text(hint).strip()
            cand = f"{_META}/v{v}.metadata.json"
            if store.exists(cand):
                return cand
        names = [
            n for n in store.list_names(_META) if n.endswith(".metadata.json")
        ]
        if not names:
            raise BuzzExecutionError(
                f"no *.metadata.json under {self.table_uri!r}/{_META}"
            )

        # A pure Hadoop v<N> layout orders by the name's number alone — zero
        # content reads (content-based ordering on a long-history object
        # store table is O(history) remote GETs per catalog load).  Only a
        # listing that MIXES naming layouts (UUID catalog names, or both
        # after a migration) needs the metadata's own last-updated-ms;
        # numeric v<N> then name break ties — lexicographic alone would rank
        # v9 over v10+ (silent stale reads).
        def vnum(n: str) -> int | None:
            m = re.match(r"v(\d+)\.metadata\.json$", n)
            return int(m.group(1)) if m else None

        if all(vnum(n) is not None for n in names):
            return f"{_META}/{max(names, key=vnum)}"

        def order(n: str):
            try:
                ts = json.loads(store.read_text(f"{_META}/{n}")).get(
                    "last-updated-ms", -1
                ) or -1
            except (ValueError, OSError):
                ts = -1
            v = vnum(n)
            return (ts, v if v is not None else -1, n)

        return f"{_META}/{max(names, key=order)}"

    def _load(self) -> None:
        store = self._store
        meta = json.loads(store.read_text(self._metadata_path()))
        fv = int(meta.get("format-version", 1))
        if fv > 2:
            raise BuzzExecutionError(
                f"iceberg format-version {fv} not supported (reader "
                "implements v1/v2; refusing is the spec-correct failure)"
            )
        self.format_version = fv

        # current schema: v2 = schemas[] + current-schema-id; v1 = schema
        if "schemas" in meta:
            sid = meta.get("current-schema-id", 0)
            candidates = [s for s in meta["schemas"] if s.get("schema-id") == sid]
            schema_json = candidates[0] if candidates else meta["schemas"][0]
        else:
            schema_json = meta["schema"]
        self.schema = _iceberg_type(
            {"type": "struct", "fields": schema_json["fields"]}
        )
        field_names = {f["id"]: f["name"] for f in schema_json["fields"]}

        # default partition spec: identity transforms become prunable columns
        specs = meta.get("partition-specs")
        if specs is not None:
            did = meta.get("default-spec-id", 0)
            spec_fields = next(
                (s["fields"] for s in specs if s.get("spec-id") == did),
                specs[0]["fields"] if specs else [],
            )
        else:
            spec_fields = meta.get("partition-spec", [])
        # partition tuple layout in manifests follows the spec field ORDER
        field_types = {f["id"]: f["type"] for f in schema_json["fields"]}
        self._spec_fields = [
            {
                "name": f["name"],
                "identity": f.get("transform") == "identity",
                "source_name": field_names.get(f.get("source-id")),
                "source_type": field_types.get(f.get("source-id")),
            }
            for f in spec_fields
        ]
        self.partition_cols = [
            f["source_name"]
            for f in self._spec_fields
            if f["identity"] and f["source_name"]
        ]

        snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        self._snapshots = meta.get("snapshots", [])
        sid = (
            self.snapshot_id
            if self.snapshot_id is not None
            else meta.get("current-snapshot-id")
        )
        if self.snapshot_id is not None and self.snapshot_id not in snaps:
            # an EXPLICIT time-travel request for a missing snapshot is an
            # error even on an empty table — silence would mask typos
            raise BuzzBadRequestError(
                f"snapshot {sid} not in table metadata (have {sorted(snaps)})"
            )
        if sid is None or sid == -1 or not snaps:
            self._files: list[CatalogFile] = []
            return
        if sid not in snaps:
            # corrupt/partially-committed metadata: current-snapshot-id
            # names a snapshot absent from the list
            raise BuzzExecutionError(
                f"current-snapshot-id {sid} missing from table metadata "
                f"(have {sorted(snaps)})"
            )
        self._files = self._resolve_snapshot(snaps[sid])

    def _read_meta_bytes(self, uri: str) -> bytes:
        """Manifest-list/manifest bytes by recorded (absolute) URI.

        Hadoop-written tables record s3a:// URIs, which pyarrow's
        FileSystem.from_uri does not recognize — normalize to s3:// first
        (the same fs; region auto-resolves as in LogStore's s3 path).
        Registered test-seam schemes resolve inside read_bytes_uri."""
        if uri.startswith("s3a://"):
            uri = "s3://" + uri[len("s3a://"):]
        return self._store.read_bytes_uri(uri)

    def _resolve_snapshot(self, snap: dict) -> list[CatalogFile]:
        if "manifest-list" in snap:
            _, manifests = decode_avro_file(
                self._read_meta_bytes(snap["manifest-list"])
            )
        elif "manifests" in snap:
            # legacy v1 form: manifest paths inline, no manifest-list file
            manifests = [{"manifest_path": p, "content": 0} for p in snap["manifests"]]
        else:
            raise BuzzExecutionError(
                "iceberg snapshot has neither manifest-list nor manifests"
            )
        files: list[CatalogFile] = []
        for m in manifests:
            if int(m.get("content") or 0) != 0:
                raise BuzzExecutionError(
                    "iceberg v2 delete manifests present; reading them as "
                    "data would resurrect deleted rows — refused (reader "
                    "supports append-only v2 tables)"
                )
            _, entries = decode_avro_file(
                self._read_meta_bytes(m["manifest_path"])
            )
            for e in entries:
                if int(e.get("status") or 0) == 2:  # DELETED entry
                    continue
                df_rec = e["data_file"]
                if int(df_rec.get("content") or 0) != 0:
                    raise BuzzExecutionError(
                        "iceberg v2 delete files present — refused (see "
                        "delete-manifest refusal)"
                    )
                fmt = str(df_rec.get("file_format", "")).upper()
                if fmt and fmt != "PARQUET":
                    raise BuzzExecutionError(
                        f"iceberg data file format {fmt!r} not supported "
                        "(parquet only)"
                    )
                part = df_rec.get("partition") or {}
                partitions = tuple(
                    (
                        f["source_name"],
                        _partition_str(part.get(f["name"]), f["source_type"]),
                    )
                    for f in self._spec_fields
                    if f["identity"] and f["source_name"]
                )
                files.append(
                    CatalogFile(
                        key=_spark_uri(df_rec["file_path"]),
                        length=int(df_rec.get("file_size_in_bytes") or 0),
                        partitions=partitions,
                    )
                )
        return files

    # --- scan ---------------------------------------------------------------

    def _pruning_catalog(self) -> StaticCatalog:
        return StaticCatalog(
            name=self.name,
            schema=self.schema,
            files=self._files,
            partition_cols=self.partition_cols,
        )

    def pruned_files(
        self, spark: SparkSession, partition_filter: str | None
    ) -> list[CatalogFile]:
        if not partition_filter:
            return list(self._files)
        if not self.partition_cols:
            # same posture as the static/Delta catalogs: a filter that can't
            # prune (non-identity transforms) is a typed error, not a silent
            # return of every row the filter should have excluded
            raise BuzzPlanError(
                "partition_filter given but the table has no identity-"
                "transform partition columns to prune on"
            )
        return self._pruning_catalog().pruned_files(spark, partition_filter)

    def to_dataframe(
        self, spark: SparkSession, partition_filter: str | None = None
    ) -> DataFrame:
        """Snapshot scan; ``partition_filter`` prunes at the manifest level.

        The scan catalog declares NO partition columns: Iceberg data files
        carry their (identity) partition values in-file, so attaching them
        would duplicate columns — pruning runs on a partition-aware helper,
        reading on the pruned plain file list."""
        files = self.pruned_files(spark, partition_filter)
        scan = StaticCatalog(
            name=self.name,
            schema=self.schema,
            files=[
                CatalogFile(key=f.key, length=f.length, partitions=())
                for f in files
            ],
            partition_cols=[],
        )
        return scan.to_dataframe(spark)

    def history(self) -> list[dict]:
        """Snapshot list (id, timestamp, operation) — from the metadata
        already loaded at construction (no re-read: a concurrent commit must
        not make history() disagree with the snapshot this catalog scans)."""
        return [
            {
                "snapshot_id": s["snapshot-id"],
                "timestamp_ms": s.get("timestamp-ms"),
                "operation": (s.get("summary") or {}).get("operation"),
            }
            for s in self._snapshots
        ]
