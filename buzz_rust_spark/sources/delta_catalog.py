"""Delta Lake catalog: snapshot of a Delta table as file list + partition values.

Reference: code/src/datasource/catalog/delta_catalog.rs — loads the Delta log
via delta-rs, builds the file list from ``add`` actions (with ``remove``
handling so overwritten files disappear from the snapshot,
delta_catalog.rs:150-177), partition values from ``partitionValues`` (always
strings, delta_catalog.rs:73-77), and the table schema from the Delta metadata
``schemaString`` (delta_catalog.rs:133-140).

This rebuild parses the ``_delta_log`` JSON directly (the log format is an
open spec) instead of depending on delta-spark, then delegates scanning to
:class:`StaticCatalog`.  Delta's ``schemaString`` *is* Spark StructType JSON,
so the schema conversion is exact.  Checkpoint parquet files are supported by
reading the ``_last_checkpoint`` pointer; JSON commits after the checkpoint are
replayed on top.

All log IO goes through :class:`~buzz_rust_spark.sources.logstore.LogStore`,
so tables can live on any filesystem pyarrow speaks — local paths, ``s3://``
/ ``s3a://`` buckets (``region`` maps to the reference's region-scoped S3
client, delta_catalog.rs:33-48 ``try_new(uri, region)``), or any
``FileSystem.from_uri`` scheme; data files keep their original URIs so the
distributed scan reads them through Spark's own connectors (S3A etc.).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..errors import BuzzExecutionError
from .logstore import LogStore
from .manifest import CatalogFile
from .static_catalog import StaticCatalog

_LOG = "_delta_log"


def _commit_versions(store: LogStore) -> list[tuple[int, str]]:
    """(version, log-relative path) for each JSON commit, ascending."""
    out = []
    for name in store.list_names(_LOG):
        stem = name.split(".", 1)[0]
        if name.endswith(".json") and stem.isdigit():
            out.append((int(stem), f"{_LOG}/{name}"))
    return sorted(out)


def _read_actions(store: LogStore, rel: str) -> list[dict]:
    return [
        json.loads(line)
        for line in store.read_text(rel).splitlines()
        if line.strip()
    ]


# Highest Delta protocol this implementation actually understands: reader 1
# (plain add/remove/metaData replay — no column mapping, no deletion
# vectors), writer 2 (appendOnly/invariants not enforced but representable).
_MAX_READER_VERSION = 1
_MAX_WRITER_VERSION = 2


def _check_protocol(action: dict, table_uri: str) -> None:
    """Delta spec requirement: a client MUST refuse tables whose protocol
    exceeds what it implements.  Silently replaying e.g. a deletion-vector
    table (reader 3) would resurrect logically-deleted rows."""
    proto = action.get("protocol") or {}
    reader = int(proto.get("minReaderVersion", 1))
    if reader > _MAX_READER_VERSION:
        from ..errors import BuzzNotImplementedError

        raise BuzzNotImplementedError(
            f"Delta table {table_uri!r} requires minReaderVersion={reader}; "
            f"this reader implements protocol {_MAX_READER_VERSION} "
            f"(no column mapping / deletion vectors)"
        )


def _replay_actions(
    actions, state: dict[str, dict], meta: dict, table_uri: str = ""
) -> None:
    for action in actions:
        if "protocol" in action:
            _check_protocol(action, table_uri)
        elif "metaData" in action:
            meta.update(action["metaData"])
        elif "add" in action:
            add = action["add"]
            state[add["path"]] = add
        elif "remove" in action:
            state.pop(action["remove"]["path"], None)


class DeltaCatalog:
    """reference: delta_catalog.rs:33-48 ``try_new(uri, region)``."""

    def __init__(
        self,
        name: str,
        table_uri: str,
        version: int | None = None,
        region: str | None = None,
    ):
        """``version`` enables time travel: replay the log only up to that
        commit (inclusive) — the snapshot a reader at that version saw.
        Extension over the reference (delta-rs in the reference always loads
        the latest snapshot, delta_catalog.rs:33-48).  ``region`` scopes the
        S3 client for ``s3://``/``s3a://`` URIs (reference parity)."""
        self.name = name
        self._store = LogStore(table_uri, region=region)
        self.table_uri = self._store.table_uri
        self.version = version
        self._load_snapshot()

    def _load_snapshot(self) -> None:
        store = self._store
        if not store.isdir(_LOG):
            raise BuzzExecutionError(f"no _delta_log at {self.table_uri!r}")

        live: dict[str, dict] = {}
        meta: dict = {}
        start_version = 0

        cp_version: int | None = None
        if store.exists(f"{_LOG}/_last_checkpoint"):
            cp_version = json.loads(store.read_text(f"{_LOG}/_last_checkpoint"))[
                "version"
            ]
            # time travel below the checkpoint needs a full JSON replay;
            # only use the checkpoint when it doesn't overshoot the target.
            if self.version is not None and cp_version > self.version:
                cp_version = None
        if cp_version is not None:
            table = store.read_parquet(
                f"{_LOG}/{cp_version:020d}.checkpoint.parquet"
            )

            def _demap(obj):
                # checkpoint map<string,string> columns (partitionValues,
                # format.options) arrive from to_pylist as [(k, v), ...]
                if isinstance(obj, list) and obj and all(
                    isinstance(i, tuple) and len(i) == 2 for i in obj
                ):
                    return dict(obj)
                if isinstance(obj, dict):
                    return {k: _demap(v) for k, v in obj.items()}
                return obj

            for row in table.to_pylist():
                action = {k: _demap(v) for k, v in row.items() if v is not None}
                _replay_actions([action], live, meta, self.table_uri)
            start_version = cp_version + 1

        max_seen = start_version - 1  # checkpoint (if used) covers ≤ this
        for version, rel in _commit_versions(store):
            if version < start_version:
                continue
            if self.version is not None and version > self.version:
                continue
            max_seen = max(max_seen, version)
            _replay_actions(_read_actions(store, rel), live, meta, self.table_uri)

        if self.version is not None and max_seen < self.version:
            raise BuzzExecutionError(
                f"Delta table {self.table_uri!r} has no version {self.version}"
                f" (latest commit seen: {max_seen})"
            )
        if not meta:
            raise BuzzExecutionError(
                f"Delta log at {self.table_uri!r} contains no metaData action"
            )

        full = StructType.fromJson(json.loads(meta["schemaString"]))
        self.partition_cols: list[str] = list(meta.get("partitionColumns", []))
        # Delta stores partition values in the log, not the data files — the
        # data schema (what the parquet files contain) excludes partition cols.
        self.schema = StructType(
            [f for f in full.fields if f.name not in self.partition_cols]
        )
        self.files = [
            CatalogFile(
                key=store.spark_path(add["path"]),
                length=int(add.get("size", 0)),
                partitions=tuple(
                    (c, str(add.get("partitionValues", {}).get(c)))
                    for c in self.partition_cols
                ),
            )
            for add in live.values()
        ]
        # per-file stats JSON from the add actions (data skipping without
        # footer reads — consumed by sources.zonemap.stats_from_delta_log)
        self._add_stats = {
            store.spark_path(add["path"]): add["stats"]
            for add in live.values()
            if add.get("stats")
        }

    def _static(self) -> StaticCatalog:
        return StaticCatalog(
            name=self.name,
            schema=self.schema,
            files=self.files,
            partition_cols=self.partition_cols,
        )

    def pruned_files(self, spark, partition_filter):
        return self._static().pruned_files(spark, partition_filter)

    def to_dataframe(
        self, spark: SparkSession, partition_filter: str | None = None
    ) -> DataFrame:
        return self._static().to_dataframe(spark, partition_filter)


def read_delta_changes(
    spark: SparkSession,
    table_uri: str,
    from_version: int,
    to_version: int | None = None,
    region: str | None = None,
) -> DataFrame:
    """Rows ADDED in commits ``(from_version, to_version]`` — incremental
    consumption of an append-history Delta table (change-data-feed-lite),
    the read side of the :func:`~buzz_rust_spark.streaming.delta_sink`
    ingestion loop: a downstream job remembers the last version it processed
    and reads only the new commits' files, never rescanning the table.

    Each row carries ``_commit_version``.  Layout-only commits (OPTIMIZE:
    ``dataChange=False``) are skipped — they change no content.  Commits that
    REMOVE data (overwrite) raise: row-level change semantics for overwrites
    need the full CDF protocol, and silently returning their adds would
    double-count rewritten rows.

    Scale: O(changed files) driver-side log replay; the data read is a plain
    distributed scan of exactly the new files, partition values re-attached
    from the log like any Delta scan."""
    from pyspark.sql import functions as F

    store = LogStore(table_uri, region=region)
    # isdir pre-check (same as DeltaCatalog): a missing directory must be the
    # typed error, not a raw pyarrow FileNotFoundError from the listing
    if not store.isdir(_LOG):
        raise BuzzExecutionError(f"not a Delta table: {table_uri!r}")
    commits = _commit_versions(store)
    if not commits:
        raise BuzzExecutionError(f"not a Delta table: {table_uri!r}")
    latest = commits[-1][0]
    to_version = latest if to_version is None else to_version
    if to_version > latest:
        raise BuzzExecutionError(
            f"Delta table {table_uri!r} has no version {to_version}"
            f" (latest: {latest})"
        )

    meta: dict = {}
    per_version: dict[int, list[dict]] = {}
    for version, rel in commits:
        # bound the replay at to_version: a long-lived table must not cost
        # O(full history) log reads per poll, and the schema applied must
        # not come from commits after the requested window
        if version > to_version:
            break
        actions = _read_actions(store, rel)
        for action in actions:
            if "metaData" in action:
                meta.update(action["metaData"])
        if version <= from_version:
            continue
        if any(
            a["remove"].get("dataChange", True)
            for a in actions
            if "remove" in a
        ):
            raise BuzzExecutionError(
                f"commit {version} removes data (overwrite); incremental"
                " changes are only defined over append-only history"
            )
        adds = [
            a["add"]
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        ]
        if adds:
            per_version[version] = adds

    if not meta:
        raise BuzzExecutionError(
            f"Delta log at {table_uri!r} contains no metaData action"
        )
    full = StructType.fromJson(json.loads(meta["schemaString"]))
    partition_cols = list(meta.get("partitionColumns", []))
    data_schema = StructType(
        [f for f in full.fields if f.name not in partition_cols]
    )

    out: DataFrame | None = None
    for version, adds in sorted(per_version.items()):
        cat = StaticCatalog(
            name="_changes",
            schema=data_schema,
            partition_cols=partition_cols,
            files=[
                CatalogFile(
                    key=store.spark_path(add["path"]),
                    length=int(add.get("size", 0)),
                    partitions=tuple(
                        (c, str(add.get("partitionValues", {}).get(c)))
                        for c in partition_cols
                    ),
                )
                for add in adds
            ],
        )
        part = cat.to_dataframe(spark).withColumn(
            "_commit_version", F.lit(version).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        # empty change set: SAME shape as a non-empty one (data columns,
        # then partition columns as strings — how StaticCatalog attaches
        # them — then the version tag), so downstream unionByName /
        # fixed-schema sinks behave identically either way
        from pyspark.sql.types import StringType, StructField

        empty = StructType(
            data_schema.fields[:]
            + [StructField(c, StringType()) for c in partition_cols]
        )
        df = spark.createDataFrame([], empty)
        return df.withColumn("_commit_version", F.lit(None).cast("long"))
    return out
