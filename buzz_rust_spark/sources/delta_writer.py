"""Delta Lake write path: commit-log writer producing open-spec ``_delta_log``
JSON (protocol / metaData / add / remove actions) plus periodic parquet
checkpoints with a ``_last_checkpoint`` pointer.

The reference has no write path at all (SURVEY.md §2.A "Sinks: none"); its
Delta support is read-only via delta-rs (delta_catalog.rs:33-48).  This module
is the rebuild's sink extension: tables written here are read back by
:class:`DeltaCatalog` — snapshot isolation (readers of version N never see a
torn write), ``mode="overwrite"`` emits ``remove`` actions so old files leave
the snapshot, and every commit is a time-travel point.

Scale notes: the data write is a plain distributed ``df.write.parquet`` (one
task per partition, no driver materialization); only the file *listing* —
O(files), kilobytes per commit — passes through the driver, which is exactly
how Delta's own commit protocol works.  Commits are optimistic: the versioned
JSON filename is claimed atomically with O_EXCL, so a concurrent writer loses
the race and errors instead of corrupting the log.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from glob import glob
from urllib.parse import unquote

from pyspark.sql import DataFrame

from ..errors import BuzzBadRequestError, BuzzExecutionError, BuzzSchemaError

PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _log_state(log_dir: str) -> tuple[int, dict[str, dict], dict]:
    """Replay the JSON log: (last_version, live add-actions by path, metaData).
    Returns (-1, {}, {}) for a fresh table.  Checkpoint parquet is *not*
    consulted here — the writer keeps all JSON commits, so a pure-JSON replay
    is always complete (readers may still use checkpoints)."""
    live: dict[str, dict] = {}
    meta: dict = {}
    last = -1
    for commit in sorted(glob(os.path.join(log_dir, "*.json"))):
        last = int(os.path.basename(commit).split(".")[0])
        with open(commit) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    return last, live, meta


def _file_stats_json(path: str) -> str:
    """Delta per-file ``stats`` JSON (numRecords / minValues / maxValues) from
    the parquet footer — what spec-conformant readers (delta-rs and the
    rebuild's own zone-map pruning) use for data skipping without opening the
    file.  Columns whose footer lacks usable min/max (or whose values don't
    JSON-serialize cleanly) are simply omitted — stats are advisory."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    mins: dict = {}
    maxs: dict = {}
    for idx, name in enumerate(md.schema.names):
        col_min, col_max = [], []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is None or not st.has_min_max:
                col_min = []
                break
            col_min.append(st.min)
            col_max.append(st.max)
        if col_min:
            lo, hi = min(col_min), max(col_max)
            if isinstance(lo, (int, float, str, bool)):
                mins[name], maxs[name] = lo, hi
    return json.dumps(
        {"numRecords": md.num_rows, "minValues": mins, "maxValues": maxs}
    )


def _partition_values(relpath: str, partition_by: list[str]) -> dict[str, str]:
    """Parse Hive-style ``col=value`` directories from a staged relative path.
    Values are the url-decoded directory strings — Delta stores partition
    values as strings in the log, matching the reference's string-typed
    partition semantics (delta_catalog.rs:73-77, README.md:113)."""
    values: dict[str, str] = {}
    for seg in relpath.split(os.sep)[:-1]:
        col, _, raw = seg.partition("=")
        if col in partition_by:
            values[col] = unquote(raw)
    missing = [c for c in partition_by if c not in values]
    if missing:
        raise BuzzExecutionError(
            f"staged file {relpath!r} lacks partition dirs for {missing}"
        )
    return values


def _txn_state(log_dir: str) -> dict[str, int]:
    """Latest committed ``txn`` version per appId (Delta SetTransaction replay
    — pure-JSON, like :func:`_log_state`, since the writer keeps all commits)."""
    seen: dict[str, int] = {}
    for commit in sorted(glob(os.path.join(log_dir, "*.json"))):
        with open(commit) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "txn" in action:
                    t = action["txn"]
                    seen[t["appId"]] = max(seen.get(t["appId"], -1), t["version"])
    return seen


def write_delta(
    df: DataFrame,
    table_uri: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    checkpoint_interval: int = 10,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """Write ``df`` as a Delta commit; returns the committed version.

    ``mode='append'`` adds files to the snapshot; ``mode='overwrite'``
    additionally emits ``remove`` for every previously-live file.  Appends
    validate the schema and partition columns against the table's metaData
    (Delta does not allow silent schema drift; the reference's strict-schema
    stance, parquet.rs:84-100, applies to the write side too).  Every
    ``checkpoint_interval`` commits a parquet checkpoint of the live snapshot
    is written so readers replay O(interval) JSON files, not O(history).

    ``txn_app_id``/``txn_version`` give Delta SetTransaction idempotence:
    when the pair has already been committed (a replayed micro-batch after a
    stream restart), the write is SKIPPED and the current table version is
    returned — this is how exactly-once streaming sinks are built on an
    at-least-once engine (see :func:`buzz_rust_spark.streaming.delta_sink`)."""
    if mode not in ("append", "overwrite"):
        raise BuzzBadRequestError(f"mode must be append|overwrite, got {mode!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise BuzzBadRequestError("txn_app_id and txn_version must be set together")
    partition_by = list(partition_by or [])
    for c in partition_by:
        if c not in df.columns:
            raise BuzzBadRequestError(f"partition column {c!r} not in DataFrame")

    table_dir = table_uri.removeprefix("file://")
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    last_version, live, meta = _log_state(log_dir)
    version = last_version + 1

    if txn_app_id is not None:
        # Idempotence check BEFORE staging: a replayed batch costs a log scan,
        # not a data write.
        if txn_version <= _txn_state(log_dir).get(txn_app_id, -1):
            return last_version

    if meta:
        existing_parts = list(meta.get("partitionColumns", []))
        if existing_parts != partition_by:
            raise BuzzBadRequestError(
                f"partition columns {partition_by} do not match table's"
                f" {existing_parts}"
            )
        from pyspark.sql.types import StructType

        declared = StructType.fromJson(json.loads(meta["schemaString"]))
        ours = {f.name: f.dataType for f in df.schema.fields}
        theirs = {f.name: f.dataType for f in declared.fields}
        if ours != theirs:
            raise BuzzSchemaError(
                f"schema mismatch vs table metaData: {sorted(ours)} vs"
                f" {sorted(theirs)}"
            )

    # 1. Stage the data write (distributed; nothing passes through the driver).
    staging = os.path.join(table_dir, f".staging-{version:020d}-{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    # 2. Promote staged files into the table directory (names are unique
    #    part-...-uuid, so moves cannot collide with live files).
    adds: list[dict] = []
    now_ms = int(time.time() * 1000)
    for fpath in sorted(
        glob(os.path.join(staging, "**", "*.parquet"), recursive=True)
    ):
        rel = os.path.relpath(fpath, staging)
        dest = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(fpath, dest)
        adds.append(
            {
                "path": rel.replace(os.sep, "/"),
                "size": os.path.getsize(dest),
                "partitionValues": _partition_values(rel, partition_by),
                "modificationTime": now_ms,
                "dataChange": True,
                "stats": _file_stats_json(dest),
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    if not adds:
        raise BuzzExecutionError("write produced no parquet files")

    # 3. Commit: claim the versioned filename exclusively (optimistic
    #    concurrency — a racing writer gets FileExistsError, not a torn log).
    actions: list[dict] = []
    if version == 0 or not meta:
        meta = {
            "id": uuid.uuid4().hex,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": partition_by,
            "createdTime": now_ms,
        }
        actions.append({"protocol": PROTOCOL})
        actions.append({"metaData": meta})
    if mode == "overwrite":
        actions.extend(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
            for path in sorted(live)
        )
    actions.extend({"add": a} for a in adds)
    if txn_app_id is not None:
        actions.append(
            {
                "txn": {
                    "appId": txn_app_id,
                    "version": txn_version,
                    "lastUpdated": now_ms,
                }
            }
        )

    commit_path = os.path.join(log_dir, f"{version:020d}.json")
    try:
        fd = os.open(commit_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError as exc:
        raise BuzzExecutionError(
            f"concurrent Delta commit detected at version {version}"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    if (version + 1) % checkpoint_interval == 0:
        _write_checkpoint(log_dir, version)
    return version


def _write_checkpoint(log_dir: str, version: int) -> None:
    """Materialize the live snapshot at ``version`` as a checkpoint parquet +
    ``_last_checkpoint`` pointer (the layout :class:`DeltaCatalog` replays:
    one action per row, non-null column = the action kind)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _, live, meta = _log_state(log_dir)

    # Explicit Arrow schema: the Delta spec requires `add.partitionValues` on
    # EVERY add action (an empty map<string,string> for unpartitioned tables)
    # and `format.options` likewise — struct inference from python dicts
    # cannot represent zero-field structs, so the previous implementation
    # dropped them, which spec-conformant readers (delta-rs — the reference's
    # own reader, delta_catalog.rs:33-48) may reject.  Maps solve it: empty
    # maps are first-class in parquet.
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [("provider", pa.string()), ("options", str_map)]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("size", pa.int64()),
                        ("partitionValues", str_map),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                    ]
                ),
            ),
            # Delta spec: checkpoints must carry SetTransaction state (one
            # `txn` row per appId) so streaming-sink idempotence survives a
            # checkpoint-truncated log in spec-conformant readers.
            pa.field(
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                        ("lastUpdated", pa.int64()),
                    ]
                ),
            ),
        ]
    )

    def map_items(d: dict | None) -> list:
        return sorted((d or {}).items())

    meta_row = dict(meta)
    fmt = dict(meta_row.get("format") or {})
    fmt["options"] = map_items(fmt.get("options"))
    meta_row["format"] = fmt
    none_row = {"protocol": None, "metaData": None, "add": None, "txn": None}
    rows = [{**none_row, "protocol": PROTOCOL}]
    rows.append({**none_row, "metaData": meta_row})
    rows.extend(
        {
            **none_row,
            "add": {**a, "partitionValues": map_items(a.get("partitionValues"))},
        }
        for a in live.values()
    )
    rows.extend(
        {**none_row, "txn": {"appId": app, "version": v, "lastUpdated": None}}
        for app, v in sorted(_txn_state(log_dir).items())
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, os.path.join(log_dir, f"{version:020d}.checkpoint.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)


def optimize_delta(
    spark,
    table_uri: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    checkpoint_interval: int = 10,
) -> int | None:
    """Bin-pack compaction (Delta OPTIMIZE): rewrite each partition's
    undersized files into ~``target_file_bytes`` files and commit the swap as
    one atomic remove+add transaction with ``dataChange=False`` — the snapshot
    content is identical, only the file layout changes, and every prior
    version stays time-travelable (old files are removed from the *snapshot*,
    not from disk — that is :func:`vacuum_delta`'s job).

    Returns the committed version, or None when nothing needed compaction.

    Scale: compaction is the standard fix for the small-file problem of
    incremental ingestion (many commits → many sub-row-group files → task
    overhead and poor scan locality).  The rewrite itself is a distributed
    ``spark.read.parquet(files).coalesce(n).write`` per partition; the driver
    only handles the O(files) listing, exactly like Delta's own OPTIMIZE."""
    table_dir = table_uri.removeprefix("file://")
    log_dir = os.path.join(table_dir, "_delta_log")
    last_version, live, meta = _log_state(log_dir)
    if last_version < 0:
        raise BuzzBadRequestError(f"not a Delta table: {table_uri!r}")

    # Group live files by partition tuple; a group compacts when it has ≥2
    # files and at least one is under half the target (rewriting a single
    # right-sized file would be pure churn).
    groups: dict[tuple[tuple[str, str], ...], list[dict]] = {}
    for add in live.values():
        key = tuple(sorted((add.get("partitionValues") or {}).items()))
        groups.setdefault(key, []).append(add)
    to_compact = {
        key: adds
        for key, adds in groups.items()
        if len(adds) >= 2 and any(a["size"] < target_file_bytes // 2 for a in adds)
    }
    if not to_compact:
        return None

    version = last_version + 1
    now_ms = int(time.time() * 1000)
    new_adds: list[dict] = []
    removed: list[str] = []
    staging = os.path.join(table_dir, f".optimize-{version:020d}-{uuid.uuid4().hex[:8]}")
    for key, adds in sorted(to_compact.items()):
        paths = [os.path.join(table_dir, a["path"]) for a in adds]
        total = sum(a["size"] for a in adds)
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        part_dir = os.path.dirname(adds[0]["path"])  # "" for unpartitioned
        out_dir = os.path.join(staging, part_dir) if part_dir else staging
        # Data files never contain partition columns (written via
        # partitionBy), so a plain read+coalesce round-trips them exactly.
        spark.read.parquet(*paths).coalesce(n_out).write.mode("overwrite").parquet(
            out_dir
        )
        for fpath in sorted(glob(os.path.join(out_dir, "*.parquet"))):
            rel = os.path.join(part_dir, os.path.basename(fpath)) if part_dir else (
                os.path.basename(fpath)
            )
            dest = os.path.join(table_dir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(fpath, dest)
            new_adds.append(
                {
                    "path": rel.replace(os.sep, "/"),
                    "size": os.path.getsize(dest),
                    "partitionValues": dict(key),
                    "modificationTime": now_ms,
                    "dataChange": False,
                    "stats": _file_stats_json(dest),
                }
            )
        removed.extend(a["path"] for a in adds)
    shutil.rmtree(staging, ignore_errors=True)

    actions = [
        {
            "remove": {
                "path": path,
                "deletionTimestamp": now_ms,
                "dataChange": False,
            }
        }
        for path in sorted(removed)
    ]
    actions.extend({"add": a} for a in new_adds)
    commit_path = os.path.join(log_dir, f"{version:020d}.json")
    try:
        fd = os.open(commit_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError as exc:
        raise BuzzExecutionError(
            f"concurrent Delta commit detected at version {version}"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    if (version + 1) % checkpoint_interval == 0:
        _write_checkpoint(log_dir, version)
    return version


def vacuum_delta(
    table_uri: str,
    retention_hours: float = 168.0,
    dry_run: bool = False,
) -> list[str]:
    """Garbage-collect data files no longer referenced by the CURRENT snapshot
    and older than ``retention_hours`` (Delta VACUUM; default 7 days, Delta's
    own default).  Returns the (relative) paths removed — or would-remove
    under ``dry_run``.

    Time travel to versions whose files were vacuumed stops working; that is
    the documented Delta trade (retention bounds the travel horizon).  The
    walk touches only file metadata — O(files) driver work, no data reads."""
    table_dir = table_uri.removeprefix("file://")
    log_dir = os.path.join(table_dir, "_delta_log")
    last_version, live, _ = _log_state(log_dir)
    if last_version < 0:
        raise BuzzBadRequestError(f"not a Delta table: {table_uri!r}")
    cutoff = time.time() - retention_hours * 3600.0
    doomed: list[str] = []
    for fpath in glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(fpath, table_dir).replace(os.sep, "/")
        if rel.startswith("_delta_log/") or rel in live:
            continue
        if os.path.getmtime(fpath) <= cutoff:
            doomed.append(rel)
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(table_dir, rel))
    return sorted(doomed)
