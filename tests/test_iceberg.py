"""Read-only Iceberg table source (sources/iceberg.py).

The fixture builder hand-constructs a spec-shaped Iceberg v2 (and v1) table:
pyarrow-written parquet data files, Avro manifest / manifest-list files via
the repo's own OCF writer, and metadata JSON — so every layer the reader
walks is exercised for real."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.errors import BuzzBadRequestError, BuzzExecutionError
from buzz_rust_spark.sources.avro import encode_avro_records
from buzz_rust_spark.sources.iceberg import IcebergCatalog

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102",
                    "fields": [{"name": "year", "type": ["null", "int"]}],
                }},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ],
        }},
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

ICEBERG_SCHEMA = {
    "type": "struct", "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "name", "required": False, "type": "string"},
        {"id": 3, "name": "year", "required": False, "type": "int"},
    ],
}


def _write_data_file(path, rows):
    table = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "name": pa.array([r[1] for r in rows], pa.string()),
            "year": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, path)
    return os.path.getsize(path)


def _manifest(meta_dir, tag, entries):
    path = os.path.join(meta_dir, f"{tag}-m0.avro")
    with open(path, "wb") as fh:
        fh.write(encode_avro_records(MANIFEST_ENTRY_SCHEMA, entries))
    return path


def _manifest_list(meta_dir, tag, manifest_paths, content=0, snap_id=1):
    path = os.path.join(meta_dir, f"snap-{tag}.avro")
    recs = [
        {
            "manifest_path": p,
            "manifest_length": os.path.getsize(p),
            "partition_spec_id": 0,
            "content": content,
            "added_snapshot_id": snap_id,
        }
        for p in manifest_paths
    ]
    with open(path, "wb") as fh:
        fh.write(encode_avro_records(MANIFEST_FILE_SCHEMA, recs))
    return path


def _entry(path, size, year, status=1, content=0, fmt="PARQUET", n=0):
    return {
        "status": status,
        "snapshot_id": 1,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": fmt,
            "partition": {"year": year},
            "record_count": n,
            "file_size_in_bytes": size,
        },
    }


def build_table(tmp_path, version=2, transform="identity"):
    """Two snapshots: snap 1 = two 2020 files, snap 2 = + two 2021 files."""
    root = tmp_path / "iceberg_tbl"
    data = root / "data"
    meta = root / "metadata"
    data.mkdir(parents=True)
    meta.mkdir()

    rows = {
        "a": [(1, "alpha", 2020), (2, "beta", 2020)],
        "b": [(3, "gamma", 2020)],
        "c": [(4, "delta", 2021), (5, "epsilon", 2021)],
        "d": [(6, "zeta", 2021)],
    }
    paths = {}
    for tag, rs in rows.items():
        p = str(data / f"{tag}.parquet")
        paths[tag] = (p, _write_data_file(p, rs), rs[0][2], len(rs))

    m1 = _manifest(
        str(meta), "m1",
        [_entry(p, sz, yr, n=n) for p, sz, yr, n in (paths["a"], paths["b"])],
    )
    m2 = _manifest(
        str(meta), "m2",
        [_entry(p, sz, yr, n=n) for p, sz, yr, n in (paths["c"], paths["d"])],
    )
    ml1 = _manifest_list(str(meta), "1", [m1], snap_id=1)
    ml2 = _manifest_list(str(meta), "2", [m1, m2], snap_id=2)

    spec_field = {
        "name": "year", "transform": transform, "source-id": 3, "field-id": 1000,
    }
    if version == 2:
        metadata = {
            "format-version": 2,
            "table-uuid": "0000-fixture",
            "location": str(root),
            "schemas": [ICEBERG_SCHEMA],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": [spec_field]}],
            "default-spec-id": 0,
            "snapshots": [
                {"snapshot-id": 1, "timestamp-ms": 1000, "manifest-list": ml1,
                 "summary": {"operation": "append"}},
                {"snapshot-id": 2, "timestamp-ms": 2000, "manifest-list": ml2,
                 "summary": {"operation": "append"}},
            ],
            "current-snapshot-id": 2,
        }
    else:
        metadata = {
            "format-version": 1,
            "location": str(root),
            "schema": ICEBERG_SCHEMA,
            "partition-spec": [spec_field],
            "snapshots": [
                {"snapshot-id": 2, "timestamp-ms": 2000, "manifest-list": ml2},
            ],
            "current-snapshot-id": 2,
        }
    (meta / "v3.metadata.json").write_text(json.dumps(metadata))
    (meta / "version-hint.text").write_text("3")
    return str(root)


def test_read_current_snapshot(spark, tmp_path):
    cat = IcebergCatalog("t", build_table(tmp_path))
    df = cat.to_dataframe(spark)
    assert {f.name for f in df.schema.fields} == {"id", "name", "year"}
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == [1, 2, 3, 4, 5, 6]
    assert rows[4]["name"] == "delta" and rows[4]["year"] == 2021


def test_time_travel_snapshot(spark, tmp_path):
    root = build_table(tmp_path)
    old = IcebergCatalog("t", root, snapshot_id=1)
    assert sorted(r["id"] for r in old.to_dataframe(spark).collect()) == [1, 2, 3]
    with pytest.raises(BuzzBadRequestError, match="snapshot 99"):
        IcebergCatalog("t", root, snapshot_id=99)
    hist = IcebergCatalog("t", root).history()
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[0]["operation"] == "append"


def test_partition_pruning(spark, tmp_path):
    cat = IcebergCatalog("t", build_table(tmp_path))
    assert cat.partition_cols == ["year"]
    pruned = cat.pruned_files(spark, "year = '2021'")
    assert len(pruned) == 2 and all("c" in f.key or "d" in f.key for f in pruned)
    df = cat.to_dataframe(spark, partition_filter="year = '2021'")
    assert sorted(r["id"] for r in df.collect()) == [4, 5, 6]


def test_nonidentity_transform_not_prunable_but_readable(spark, tmp_path):
    cat = IcebergCatalog("t", build_table(tmp_path, transform="void"))
    assert cat.partition_cols == []
    # filterless read still returns everything
    assert cat.to_dataframe(spark).count() == 6
    # a filter that CANNOT prune is a typed error — silently returning rows
    # the filter should exclude would corrupt engine results
    from buzz_rust_spark.errors import BuzzPlanError

    with pytest.raises(BuzzPlanError, match="identity"):
        cat.pruned_files(spark, "year = '2021'")
    # bucket tables are now prunable (= / IN via murmur3 ordinals) and a
    # FILTERLESS read stays unaffected
    bcat = IcebergCatalog("t", build_table(tmp_path / "b", transform="bucket[4]"))
    assert bcat.partition_cols == ["__bucket_year"]
    assert bcat.to_dataframe(spark).count() == 6


def test_v1_metadata_layout(spark, tmp_path):
    cat = IcebergCatalog("t", build_table(tmp_path, version=1))
    assert cat.format_version == 1
    assert cat.to_dataframe(spark).count() == 6


def test_delete_files_and_future_versions_refused(spark, tmp_path):
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())

    # v3 format refused at CONSTRUCTION (metadata-level gate)
    md3 = dict(md, **{"format-version": 3})
    open(md_path, "w").write(json.dumps(md3))
    with pytest.raises(BuzzExecutionError, match="format-version 3"):
        IcebergCatalog("t", root)

    # an equality delete file WITHOUT equality_ids cannot be applied —
    # typed refusal at scan planning (keyed equality deletes are supported,
    # see the MOR tests)
    open(md_path, "w").write(json.dumps(md))
    data_path = os.path.join(root, "data", "a.parquet")
    meq = _manifest(meta, "meq", [_entry(data_path, 10, 2020, content=2)])
    ml = _manifest_list(meta, "del", [meq], content=1)
    md_del = dict(md)
    md_del["snapshots"] = md["snapshots"] + [
        {"snapshot-id": 3, "timestamp-ms": 3000, "manifest-list": ml,
         "summary": {"operation": "delete"}}
    ]
    md_del["current-snapshot-id"] = 3
    open(md_path, "w").write(json.dumps(md_del))
    with pytest.raises(BuzzExecutionError, match="equality_ids"):
        IcebergCatalog("t", root).to_dataframe(spark)

    # a delete-coded file inside a DATA manifest is malformed metadata
    mdf = _manifest(meta, "mdf", [_entry(data_path, 10, 2020, content=2)])
    ml2 = _manifest_list(meta, "del2", [mdf], content=0)
    md_del["snapshots"][-1]["manifest-list"] = ml2
    open(md_path, "w").write(json.dumps(md_del))
    with pytest.raises(BuzzExecutionError, match="DATA manifest"):
        IcebergCatalog("t", root).to_dataframe(spark)

    # data file in a format outside parquet/orc refused
    mavro = _manifest(meta, "mavro", [_entry(data_path, 10, 2020, fmt="AVRO")])
    ml3 = _manifest_list(meta, "avrofmt", [mavro])
    md_del["snapshots"][-1]["manifest-list"] = ml3
    open(md_path, "w").write(json.dumps(md_del))
    with pytest.raises(BuzzExecutionError, match="AVRO"):
        IcebergCatalog("t", root).to_dataframe(spark)


def test_deleted_entries_skipped(spark, tmp_path):
    """status=2 (DELETED) manifest entries drop out of the snapshot."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())
    a = os.path.join(root, "data", "a.parquet")
    b = os.path.join(root, "data", "b.parquet")
    m = _manifest(
        meta, "mdrop",
        [
            _entry(a, os.path.getsize(a), 2020, status=2),  # deleted
            _entry(b, os.path.getsize(b), 2020, status=0),  # existing
        ],
    )
    ml = _manifest_list(meta, "drop", [m], snap_id=3)
    md["snapshots"].append(
        {"snapshot-id": 3, "timestamp-ms": 3000, "manifest-list": ml,
         "summary": {"operation": "overwrite"}}
    )
    md["current-snapshot-id"] = 3
    open(md_path, "w").write(json.dumps(md))
    df = IcebergCatalog("t", root).to_dataframe(spark)
    assert sorted(r["id"] for r in df.collect()) == [3]


def test_empty_table_and_missing_metadata(spark, tmp_path):
    root = build_table(tmp_path)
    md_path = os.path.join(root, "metadata", "v3.metadata.json")
    md = json.loads(open(md_path).read())
    md["current-snapshot-id"] = -1
    md["snapshots"] = []
    open(md_path, "w").write(json.dumps(md))
    df = IcebergCatalog("t", root).to_dataframe(spark)
    assert df.count() == 0
    assert {f.name for f in df.schema.fields} == {"id", "name", "year"}

    with pytest.raises(BuzzExecutionError, match="metadata"):
        IcebergCatalog("t", str(tmp_path / "not_a_table"))


def test_engine_query_over_iceberg(spark, tmp_path):
    """The BuzzQuery JSON surface reaches Iceberg tables: a strict two-step
    query over catalog type 'Iceberg' with catalog-level partition pruning."""
    from buzz_rust_spark import BuzzEngine, BuzzQuery

    table = build_table(tmp_path)
    engine = BuzzEngine(spark, strict=True)
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT year, COUNT(*) AS n FROM t GROUP BY year",
                    "name": "t_map",
                    "step_type": "HBee",
                    "partition_filter": "year = '2021'",
                },
                {
                    "sql": "SELECT year, SUM(n) AS n FROM t_map GROUP BY year",
                    "name": "t_reduce",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 1},
            "catalogs": [{"name": "t", "type": "Iceberg", "uri": table}],
        }
    )
    rows = {(r["year"], r["n"]) for r in engine.run(q).collect()}
    assert rows == {(2021, 3)}


def test_metadata_version_ordering_numeric(spark, tmp_path):
    """v10.metadata.json must beat v9 (numeric, not lexicographic) when the
    version hint is absent."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md = open(os.path.join(meta, "v3.metadata.json")).read()
    os.remove(os.path.join(meta, "version-hint.text"))
    # v9 = stale (current snapshot 1), v10 = fresh (current snapshot 2)
    stale = json.loads(md)
    stale["current-snapshot-id"] = 1
    open(os.path.join(meta, "v9.metadata.json"), "w").write(json.dumps(stale))
    open(os.path.join(meta, "v10.metadata.json"), "w").write(md)
    os.remove(os.path.join(meta, "v3.metadata.json"))
    cat = IcebergCatalog("t", root)
    assert sorted(r["id"] for r in cat.to_dataframe(spark).collect()) == [
        1, 2, 3, 4, 5, 6,
    ]


def test_date_partition_values_prune_as_iso_strings(spark, tmp_path):
    """A date-partitioned table stores days-since-epoch ints in manifests;
    the filter surface must see ISO dates."""
    root = tmp_path / "dt_tbl"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    p1 = str(root / "data" / "d1.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1], pa.int64()),
                  "event_date": pa.array([18628], pa.date32())}), p1
    )
    p2 = str(root / "data" / "d2.parquet")
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()),
                  "event_date": pa.array([18629], pa.date32())}), p2
    )
    entry_schema = {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": [{"name": "event_date", "type": ["null", "int"]}],
                    }},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            }},
        ],
    }

    def entry(p, day):
        return {"status": 1, "data_file": {
            "content": 0, "file_path": p, "file_format": "PARQUET",
            "partition": {"event_date": day}, "record_count": 1,
            "file_size_in_bytes": os.path.getsize(p)}}

    mpath = str(root / "metadata" / "m-0.avro")
    open(mpath, "wb").write(
        encode_avro_records(entry_schema, [entry(p1, 18628), entry(p2, 18629)])
    )
    ml = str(root / "metadata" / "snap-1.avro")
    open(ml, "wb").write(encode_avro_records(MANIFEST_FILE_SCHEMA, [{
        "manifest_path": mpath, "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}]))
    md = {
        "format-version": 2, "location": str(root),
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "event_date", "required": False, "type": "date"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "event_date", "transform": "identity",
             "source-id": 2, "field-id": 1000}]}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                       "manifest-list": ml}],
        "current-snapshot-id": 1,
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(md))
    (root / "metadata" / "version-hint.text").write_text("1")

    cat = IcebergCatalog("t", str(root))
    pruned = cat.pruned_files(spark, "event_date = '2021-01-01'")
    assert len(pruned) == 1 and pruned[0].partitions == (
        ("event_date", "2021-01-01"),
    )
    rows = cat.to_dataframe(spark, "event_date = '2021-01-01'").collect()
    assert [r["id"] for r in rows] == [1]


def test_v1_legacy_inline_manifests_field(spark, tmp_path):
    """v1 snapshots may carry 'manifests' (paths inline) with no
    manifest-list file."""
    root = build_table(tmp_path, version=1)
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())
    ml = md["snapshots"][0].pop("manifest-list")
    # recover the manifest paths from the manifest-list avro
    from buzz_rust_spark.sources.avro import decode_avro_file

    _, manifests = decode_avro_file(open(ml, "rb").read())
    md["snapshots"][0]["manifests"] = [m["manifest_path"] for m in manifests]
    open(md_path, "w").write(json.dumps(md))
    cat = IcebergCatalog("t", root)
    assert cat.to_dataframe(spark).count() == 6


def test_explicit_snapshot_on_empty_table_errors(spark, tmp_path):
    root = build_table(tmp_path)
    md_path = os.path.join(root, "metadata", "v3.metadata.json")
    md = json.loads(open(md_path).read())
    md["snapshots"] = []
    md["current-snapshot-id"] = -1
    open(md_path, "w").write(json.dumps(md))
    with pytest.raises(BuzzBadRequestError, match="snapshot 1"):
        IcebergCatalog("t", root, snapshot_id=1)


def test_dangling_current_snapshot_typed_error(spark, tmp_path):
    """current-snapshot-id naming a snapshot absent from the list must be a
    typed error, not a KeyError."""
    root = build_table(tmp_path)
    md_path = os.path.join(root, "metadata", "v3.metadata.json")
    md = json.loads(open(md_path).read())
    md["current-snapshot-id"] = 42
    open(md_path, "w").write(json.dumps(md))
    with pytest.raises(BuzzExecutionError, match="current-snapshot-id 42"):
        IcebergCatalog("t", root)


def test_binary_represented_partition_values():
    """decimal / uuid / fixed identity partition values stringify to their
    SQL-comparable forms, not bytes reprs."""
    from buzz_rust_spark.sources.iceberg import _partition_str

    # decimal(9,2): unscaled 1234 → '12.34'
    assert _partition_str((1234).to_bytes(3, "big", signed=True), "decimal(9,2)") == "12.34"
    assert _partition_str((-1234).to_bytes(3, "big", signed=True), "decimal(9,2)") == "-12.34"
    import uuid as _uuid

    u = _uuid.uuid5(_uuid.NAMESPACE_DNS, "x")
    assert _partition_str(u.bytes, "uuid") == str(u)
    assert _partition_str(b"\x01\xff", "fixed[2]") == "01ff"
    assert _partition_str(18628, "date") == "2021-01-01"
    assert _partition_str(86_400_000_000, "timestamp") == "1970-01-02 00:00:00"
    assert _partition_str(True, "boolean") == "true"


DELETE_SCHEMA = pa.schema(
    [pa.field("file_path", pa.string()), pa.field("pos", pa.int64())]
)


def _delete_parquet(path, pairs):
    """Spec-shaped position-delete parquet: (file_path, pos) rows."""
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([p for p, _ in pairs], pa.string()),
                "pos": pa.array([i for _, i in pairs], pa.int64()),
            },
            schema=DELETE_SCHEMA,
        ),
        path,
    )
    return os.path.getsize(path)


def _manifest_list_mixed(meta_dir, tag, path_content_pairs, snap_id=1):
    """Manifest list mixing data (content=0) and delete (content=1)
    manifests."""
    path = os.path.join(meta_dir, f"snap-{tag}.avro")
    recs = [
        {
            "manifest_path": p,
            "manifest_length": os.path.getsize(p),
            "partition_spec_id": 0,
            "content": c,
            "added_snapshot_id": snap_id,
        }
        for p, c in path_content_pairs
    ]
    with open(path, "wb") as fh:
        fh.write(encode_avro_records(MANIFEST_FILE_SCHEMA, recs))
    return path


def _mor_table(tmp_path, delete_pairs):
    """build_table + a position-delete snapshot removing ``delete_pairs``
    ((data-file tag, row ordinal) with 'gone' = a file not in the
    snapshot)."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    data = os.path.join(root, "data")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())

    dp = os.path.join(data, "del-1.parquet")
    resolved = [
        (os.path.join(data, f"{tag}.parquet"), pos)
        for tag, pos in delete_pairs
    ]
    size = _delete_parquet(dp, resolved)
    mdel = _manifest(meta, "mpos", [_entry(dp, size, None, content=1)])
    m1 = os.path.join(meta, "m1-m0.avro")
    m2 = os.path.join(meta, "m2-m0.avro")
    ml = _manifest_list_mixed(
        meta, "mor", [(m1, 0), (m2, 0), (mdel, 1)], snap_id=3
    )
    md["snapshots"].append(
        {"snapshot-id": 3, "timestamp-ms": 3000, "manifest-list": ml,
         "summary": {"operation": "delete"}}
    )
    md["current-snapshot-id"] = 3
    open(md_path, "w").write(json.dumps(md))
    return root


def test_position_deletes_applied(spark, tmp_path):
    """v2 merge-on-read: position-delete rows vanish from the scan; a stale
    delete targeting a file no longer in the snapshot is ignored (path
    mapping drops it — the reason sequence numbers need not be
    consulted)."""
    root = _mor_table(
        tmp_path, [("a", 0), ("c", 1), ("gone", 0)]
    )  # a@0 = id 1, c@1 = id 5
    df = IcebergCatalog("t", root).to_dataframe(spark)
    assert sorted(r["id"] for r in df.collect()) == [2, 3, 4, 6]
    # full schema survives the anti-join (no __path/__ridx leftovers)
    assert {f.name for f in df.schema.fields} == {"id", "name", "year"}


def test_position_deletes_with_partition_filter(spark, tmp_path):
    """Manifest pruning composes with delete application: the pruned scan
    still drops its deleted rows, and deletes for pruned-out files are
    inert."""
    root = _mor_table(tmp_path, [("a", 0), ("c", 1)])
    df = IcebergCatalog("t", root).to_dataframe(spark, "year = '2021'")
    assert sorted(r["id"] for r in df.collect()) == [4, 6]
    df20 = IcebergCatalog("t", root).to_dataframe(spark, "year = '2020'")
    assert sorted(r["id"] for r in df20.collect()) == [2, 3]


def build_renamed_table(tmp_path):
    """Schema evolution fixture: file f1 written under the ORIGINAL column
    name (parquet column 'name_old', field id 2), then the column is
    renamed to 'name' (metadata-only) and f2 written under the new name.
    Both files carry parquet field ids, as the Iceberg spec requires."""
    root = tmp_path / "ev_tbl"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()

    def write(path, name_col, ids, names):
        schema = pa.schema(
            [
                pa.field("id", pa.int64(),
                         metadata={b"PARQUET:field_id": b"1"}),
                pa.field(name_col, pa.string(),
                         metadata={b"PARQUET:field_id": b"2"}),
            ]
        )
        pq.write_table(
            pa.table(
                {"id": pa.array(ids, pa.int64()),
                 name_col: pa.array(names, pa.string())},
                schema=schema,
            ),
            path,
        )
        return os.path.getsize(path)

    f1 = str(root / "data" / "f1.parquet")
    s1 = write(f1, "name_old", [1, 2], ["alpha", "beta"])
    f2 = str(root / "data" / "f2.parquet")
    s2 = write(f2, "name", [3], ["gamma"])

    entry_schema = {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": []}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            }},
        ],
    }

    def entry(p, sz, n):
        return {"status": 1, "data_file": {
            "content": 0, "file_path": p, "file_format": "PARQUET",
            "partition": {}, "record_count": n, "file_size_in_bytes": sz}}

    mpath = str(root / "metadata" / "m-0.avro")
    open(mpath, "wb").write(
        encode_avro_records(entry_schema, [entry(f1, s1, 2), entry(f2, s2, 1)])
    )
    ml = _manifest_list(str(root / "metadata"), "ev", [mpath])
    md = {
        "format-version": 2, "location": str(root),
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "name_old", "required": False,
                 "type": "string"},
            ]},
            {"type": "struct", "schema-id": 1, "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "name", "required": False,
                 "type": "string"},
            ]},
        ],
        "current-schema-id": 1,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                       "manifest-list": ml}],
        "current-snapshot-id": 1,
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(md))
    (root / "metadata" / "version-hint.text").write_text("1")
    return str(root)


def test_schema_evolution_rename_reads_by_field_id(spark, tmp_path):
    """After a column rename, pre-rename data files carry the OLD parquet
    column name; a name-based scan silently null-fills them.  The reader
    must detect the rename in the schema history and resolve by field id."""
    cat = IcebergCatalog("t", build_renamed_table(tmp_path))
    assert cat._evolved is True
    df = cat.to_dataframe(spark)
    assert {f.name for f in df.schema.fields} == {"id", "name"}
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {1: "alpha", 2: "beta", 3: "gamma"}


def test_unevolved_table_keeps_name_resolution(tmp_path):
    """Single-schema tables stay on name-based reads (id-less parquet files
    from migrated tables remain readable there)."""
    cat = IcebergCatalog("t", build_table(tmp_path))
    assert cat._evolved is False
    assert cat._scan_schema == cat.schema


def build_transform_table(tmp_path, transform, part_avro_type, part_values,
                          source_field, files_rows):
    """A table partitioned by a non-identity transform: one data file per
    partition value; the partition record field is named 'pf'."""
    root = tmp_path / "tr_tbl"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()

    paths = []
    src_pa = {
        "timestamp": pa.timestamp("us"),
        "long": pa.int64(),
        "int": pa.int32(),
        "date": pa.date32(),
    }.get(source_field["type"], pa.string())
    for i, (pv, rows) in enumerate(zip(part_values, files_rows)):
        p = str(root / "data" / f"t{i}.parquet")
        cols = {"id": pa.array([r[0] for r in rows], pa.int64())}
        cols[source_field["name"]] = pa.array([r[1] for r in rows], src_pa)
        pq.write_table(pa.table(cols), p)
        paths.append((p, os.path.getsize(p), pv, len(rows)))

    entry_schema = {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": [
                            {"name": "pf", "type": ["null", part_avro_type]}
                        ]}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            }},
        ],
    }
    entries = [
        {"status": 1, "data_file": {
            "content": 0, "file_path": p, "file_format": "PARQUET",
            "partition": {"pf": pv}, "record_count": n,
            "file_size_in_bytes": sz}}
        for p, sz, pv, n in paths
    ]
    mpath = str(root / "metadata" / "m-0.avro")
    open(mpath, "wb").write(encode_avro_records(entry_schema, entries))
    ml = _manifest_list(str(root / "metadata"), "tr", [mpath])
    md = {
        "format-version": 2, "location": str(root),
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": source_field["name"], "required": False,
             "type": source_field["type"]},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "pf", "transform": transform, "source-id": 2,
             "field-id": 1000}]}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                       "manifest-list": ml}],
        "current-snapshot-id": 1,
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(md))
    (root / "metadata" / "version-hint.text").write_text("1")
    return str(root)


import datetime as _dt  # noqa: E402


@pytest.mark.parametrize(
    "transform,part_avro_type,part_values,flt,keep_ids",
    [
        ("day", "int", [18628, 18659], "pf = '2021-01-01'", [1]),
        ("days", "int", [18628, 18659], "pf >= '2021-02-01'", [2]),
        ("month", "int", [612, 614], "pf = '2021-03'", [2]),
        ("year", "int", [50, 51], "pf > '2020'", [2]),
        ("hour", "int", [447072, 447100], "pf = '2021-01-01 00'", [1]),
        ("truncate[3]", "string", ["alp", "gam"], "pf = 'gam'", [2]),
    ],
)
def test_transform_pruning(spark, tmp_path, transform, part_avro_type,
                           part_values, flt, keep_ids):
    """year/month/day/hour/truncate partition transforms prune on the
    partition FIELD name with human-comparable values — no bound decode of
    data, pure manifest metadata."""
    if part_avro_type == "int":
        source = {"name": "ts", "type": "timestamp"}
        rows = [[(1, _dt.datetime(2021, 1, 1))], [(2, _dt.datetime(2021, 3, 15))]]
    else:
        source = {"name": "name", "type": "string"}
        rows = [[(1, "alpha")], [(2, "gamma")]]
    root = build_transform_table(
        tmp_path, transform, part_avro_type, part_values, source, rows
    )
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["pf"]
    pruned = cat.pruned_files(spark, flt)
    assert len(pruned) == len(keep_ids)
    df = cat.to_dataframe(spark, flt)
    assert sorted(r["id"] for r in df.collect()) == keep_ids
    # the derived partition field is NOT attached as a data column
    assert "pf" not in {f.name for f in df.schema.fields}
    # filterless read unaffected
    assert IcebergCatalog("t", root).to_dataframe(spark).count() == 2


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B bucket-hash test vectors (int/long hash as
    longs; date as days; timestamp as micros; string as UTF-8)."""
    from buzz_rust_spark.sources.iceberg import _bucket_ordinal, _murmur3_32

    def h(v):  # hash of an 8-byte little-endian long
        return _murmur3_32(v.to_bytes(8, "little", signed=True))

    assert h(34) == 2017239379                       # int & long 34
    assert h(17486) == -653330422                    # date 2017-11-16
    assert h(1510871468000000) == -2047944441        # ts 2017-11-16T22:31:08
    assert _murmur3_32(b"iceberg") == 1210000089     # string
    assert _bucket_ordinal("34", False, "long", 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert _bucket_ordinal("iceberg", True, "string", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert _bucket_ordinal("2017-11-16", True, "date", 16) == (-653330422 & 0x7FFFFFFF) % 16


@pytest.mark.parametrize("source_type,v_keep,v_other,flt", [
    ("long",      34,                77,          "k = 34"),
    ("int",       34,                77,          "k IN (34)"),
    ("string",    "iceberg",         "other",     "k = 'iceberg'"),
    ("date",      _dt.date(2017, 11, 16), _dt.date(2019, 1, 5), "k = '2017-11-16'"),
    ("timestamp", _dt.datetime(2017, 11, 16, 22, 31, 8),
                  _dt.datetime(2020, 2, 2, 2, 2, 2), "k = '2017-11-16T22:31:08'"),
])
def test_bucket_transform_pruning(spark, tmp_path, source_type, v_keep,
                                  v_other, flt):
    """Equality/IN filters on a bucket[N]-partitioned SOURCE column prune to
    exactly the matching buckets — the non-matching bucket's file is never
    even opened (it is a ghost)."""
    from buzz_rust_spark.sources.iceberg import _bucket_ordinal

    def lit(v):
        if source_type in ("int", "long"):
            return str(v)
        return v.isoformat() if not isinstance(v, str) else v

    n = 8
    ord_keep = _bucket_ordinal(lit(v_keep), source_type == "string",
                               source_type, n)
    ord_other = (ord_keep + 3) % n  # any different bucket: file is a ghost
    root = build_transform_table(
        tmp_path, f"bucket[{n}]", "int", [ord_keep, ord_other],
        {"name": "k", "type": source_type},
        [[(1, v_keep)], [(2, v_other)]],
    )
    # make the non-matching file a ghost: pruning must never open it
    os.unlink(os.path.join(root, "data", "t1.parquet"))
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["__bucket_k"]
    assert len(cat.pruned_files(spark, flt)) == 1
    df = cat.to_dataframe(spark, flt)
    assert [r["id"] for r in df.collect()] == [1]


def test_bucket_range_filters_stay_refused(spark, tmp_path):
    from buzz_rust_spark.errors import BuzzPlanError
    from buzz_rust_spark.sources.iceberg import _bucket_ordinal

    root = build_transform_table(
        tmp_path, "bucket[8]", "int",
        [_bucket_ordinal("34", False, "long", 8)],
        {"name": "k", "type": "long"}, [[(1, 34)]],
    )
    cat = IcebergCatalog("t", root)
    with pytest.raises(BuzzPlanError, match="order-preserving"):
        cat.pruned_files(spark, "k > 10")
    with pytest.raises(BuzzPlanError, match="simple AND|= / IN"):
        cat.pruned_files(spark, "k = 34 OR k = 35")
    # a conjunction mixing a bucket term with a non-partition term keeps
    # the usual typed error for the latter, never a silent wrong prune
    with pytest.raises(BuzzPlanError):
        cat.pruned_files(spark, "k = 34 AND zzz = 1")
    # bare-numeric literal on a string bucket column: typed, not a misprune
    root2 = build_transform_table(
        tmp_path / "s", "bucket[8]", "int", [0],
        {"name": "k", "type": "string"}, [[(1, "x")]],
    )
    with pytest.raises(BuzzPlanError, match="quoted"):
        IcebergCatalog("t", root2).pruned_files(spark, "k = 42")


FIELD_SUMMARY_SCHEMA = {
    "type": "record", "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean"},
        {"name": "lower_bound", "type": ["null", "bytes"]},
        {"name": "upper_bound", "type": ["null", "bytes"]},
    ],
}

MANIFEST_FILE_SCHEMA_V2 = {
    "type": "record", "name": "manifest_file",
    "fields": MANIFEST_FILE_SCHEMA["fields"] + [
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": FIELD_SUMMARY_SCHEMA}]},
    ],
}


def test_manifest_skipping_never_opens_disjoint(spark, tmp_path):
    """With partitions summaries in the manifest list, a filter-disjoint
    manifest is never opened: its path can point at a file that does not
    exist and the filtered plan still succeeds."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())
    m1 = os.path.join(meta, "m1-m0.avro")  # 2020 files (exists)
    m2 = os.path.join(meta, "m2-m0.avro")  # 2021 files
    ghost = os.path.join(meta, "ghost-m0.avro")  # never written!

    def le(v):
        return (v).to_bytes(4, "little", signed=True)

    recs = [
        {"manifest_path": m1, "manifest_length": os.path.getsize(m1),
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 9,
         "partitions": [{"contains_null": False,
                         "lower_bound": le(2020), "upper_bound": le(2020)}]},
        {"manifest_path": m2, "manifest_length": os.path.getsize(m2),
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 9,
         "partitions": [{"contains_null": False,
                         "lower_bound": le(2021), "upper_bound": le(2021)}]},
        {"manifest_path": ghost, "manifest_length": 10,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 9,
         "partitions": [{"contains_null": False,
                         "lower_bound": le(1999), "upper_bound": le(1999)}]},
    ]
    ml = os.path.join(meta, "snap-sum.avro")
    open(ml, "wb").write(encode_avro_records(MANIFEST_FILE_SCHEMA_V2, recs))
    md["snapshots"].append(
        {"snapshot-id": 9, "timestamp-ms": 9000, "manifest-list": ml}
    )
    md["current-snapshot-id"] = 9
    open(md_path, "w").write(json.dumps(md))

    cat = IcebergCatalog("t", root)
    # ghost manifest (bounds 1999) is provably disjoint from year>='2020' —
    # plan succeeds without ever opening it
    df = cat.to_dataframe(spark, "year >= '2020' AND year <= '2020'")
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
    # a filter that CANNOT exclude it must try to open it and fail loudly
    with pytest.raises(Exception):
        IcebergCatalog("t", root).to_dataframe(spark)


def test_distributed_planning_many_manifests(spark, tmp_path):
    """Above DRIVER_PLAN_MAX_MANIFESTS the manifests decode in one
    distributed job: after construction, driver-side manifest reads are
    forbidden and planning still works."""
    root = tmp_path / "many_tbl"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    meta = str(root / "metadata")

    n = IcebergCatalog.DRIVER_PLAN_MAX_MANIFESTS + 2
    manifest_paths = []
    for i in range(n):
        p = str(root / "data" / f"f{i}.parquet")
        sz = _write_data_file(p, [(i, f"row{i}", 2020)])
        manifest_paths.append(
            _manifest(meta, f"mm{i}", [_entry(p, sz, 2020, n=1)])
        )
    ml = _manifest_list(meta, "many", manifest_paths)
    md = {
        "format-version": 2, "location": str(root),
        "schemas": [ICEBERG_SCHEMA], "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "year", "transform": "identity", "source-id": 3,
             "field-id": 1000}]}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                       "manifest-list": ml}],
        "current-snapshot-id": 1,
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(md))
    (root / "metadata" / "version-hint.text").write_text("1")

    cat = IcebergCatalog("t", str(root))

    def _no_driver_reads(uri):
        raise AssertionError(f"driver-side manifest read of {uri!r}")

    cat._read_meta_bytes = _no_driver_reads
    df = cat.to_dataframe(spark)
    assert sorted(r["id"] for r in df.collect()) == list(range(n))


def test_mixed_layout_picks_latest_by_last_updated(spark, tmp_path):
    """A v2.metadata.json older than a UUID-named metadata file must lose to
    it (ordering by last-updated-ms, not layout style)."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md = json.loads(open(os.path.join(meta, "v3.metadata.json")).read())
    os.remove(os.path.join(meta, "version-hint.text"))
    os.remove(os.path.join(meta, "v3.metadata.json"))
    stale = dict(md, **{"current-snapshot-id": 1, "last-updated-ms": 1000})
    fresh = dict(md, **{"last-updated-ms": 2000})
    open(os.path.join(meta, "v2.metadata.json"), "w").write(json.dumps(stale))
    open(os.path.join(meta, "00005-abc.metadata.json"), "w").write(
        json.dumps(fresh)
    )
    cat = IcebergCatalog("t", root)
    assert cat.to_dataframe(spark).count() == 6  # the 2-snapshot (fresh) view


def _write_orc_data_file(path, rows):
    from pyarrow import orc as pa_orc

    table = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "name": pa.array([r[1] for r in rows], pa.string()),
            "year": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pa_orc.write_table(table, path)
    return os.path.getsize(path)


def _swap_file_to_orc(root, tag, rows):
    """Replace data file <tag>.parquet with an ORC twin and rewrite its
    manifest entry as file_format=ORC."""
    data = os.path.join(root, "data")
    orc_path = os.path.join(data, f"{tag}.orc")
    size = _write_orc_data_file(orc_path, rows)
    return orc_path, size


def test_iceberg_orc_data_files(spark, tmp_path):
    """A snapshot mixing parquet and ORC data files reads both; pruning
    still works (format is per-file, partition tuples are format-blind)."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())

    a = os.path.join(root, "data", "a.parquet")  # 2020, ids 1-2 (parquet)
    orc_c, orc_sz = _swap_file_to_orc(
        root, "c", [(4, "delta", 2021), (5, "epsilon", 2021)]
    )
    m = _manifest(
        meta, "mixed",
        [
            _entry(a, os.path.getsize(a), 2020, n=2),
            _entry(orc_c, orc_sz, 2021, fmt="ORC", n=2),
        ],
    )
    ml = _manifest_list(meta, "mixed", [m], snap_id=5)
    md["snapshots"].append(
        {"snapshot-id": 5, "timestamp-ms": 5000, "manifest-list": ml}
    )
    md["current-snapshot-id"] = 5
    open(md_path, "w").write(json.dumps(md))

    cat = IcebergCatalog("t", root)
    df = cat.to_dataframe(spark)
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {1: "alpha", 2: "beta", 4: "delta", 5: "epsilon"}
    # pruning unaffected by format
    assert sorted(
        r["id"] for r in cat.to_dataframe(spark, "year = '2021'").collect()
    ) == [4, 5]
    assert sorted(
        r["id"] for r in cat.to_dataframe(spark, "year = '2020'").collect()
    ) == [1, 2]


def test_iceberg_orc_with_position_deletes_refused(spark, tmp_path):
    """Position deletes need _metadata.row_index (parquet-only) — an ORC
    data file in a deleted snapshot is a typed refusal, not resurrection."""
    root = _mor_table(tmp_path, [("a", 0)])
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())
    orc_e, orc_sz = _swap_file_to_orc(root, "e", [(9, "eta", 2021)])
    morc = _manifest(meta, "addorc", [_entry(orc_e, orc_sz, 2021, fmt="ORC")])
    # extend the MOR snapshot's manifest list with the ORC data manifest
    m1 = os.path.join(meta, "m1-m0.avro")
    m2 = os.path.join(meta, "m2-m0.avro")
    mdel = os.path.join(meta, "mpos-m0.avro")
    ml = _manifest_list_mixed(
        meta, "morc", [(m1, 0), (m2, 0), (morc, 0), (mdel, 1)], snap_id=4
    )
    md["snapshots"].append(
        {"snapshot-id": 4, "timestamp-ms": 4000, "manifest-list": ml}
    )
    md["current-snapshot-id"] = 4
    open(md_path, "w").write(json.dumps(md))
    with pytest.raises(BuzzExecutionError, match="ORC"):
        IcebergCatalog("t", root).to_dataframe(spark)


EQ_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102",
                    "fields": [{"name": "year", "type": ["null", "int"]}],
                }},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int"}]},
            ],
        }},
    ],
}

MANIFEST_FILE_SCHEMA_SEQ = {
    "type": "record", "name": "manifest_file",
    "fields": MANIFEST_FILE_SCHEMA["fields"] + [
        {"name": "sequence_number", "type": "long"},
    ],
}


def _eq_manifest(meta_dir, tag, del_path, eq_ids, year=None):
    entry = {
        "status": 1,
        "sequence_number": None,
        "data_file": {
            "content": 2, "file_path": del_path, "file_format": "PARQUET",
            "partition": {"year": year},
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(del_path),
            "equality_ids": eq_ids,
        },
    }
    path = os.path.join(meta_dir, f"{tag}-m0.avro")
    open(path, "wb").write(encode_avro_records(EQ_ENTRY_SCHEMA, [entry]))
    return path


def _manifest_list_seq(meta_dir, tag, entries, snap_id=1):
    """entries: [(manifest_path, content, sequence_number)]."""
    path = os.path.join(meta_dir, f"snap-{tag}.avro")
    recs = [
        {"manifest_path": p, "manifest_length": os.path.getsize(p),
         "partition_spec_id": 0, "content": c, "added_snapshot_id": snap_id,
         "sequence_number": sq}
        for p, c, sq in entries
    ]
    open(path, "wb").write(encode_avro_records(MANIFEST_FILE_SCHEMA_SEQ, recs))
    return path


def _name_delete_parquet(path, names):
    """Equality-delete parquet keyed on the 'name' column (field id 2)."""
    pq.write_table(
        pa.table({"name": pa.array(names, pa.string())}), path
    )
    return path


def test_equality_deletes_applied(spark, tmp_path):
    """Keyed equality deletes (the Flink-upsert shape) drop matching rows
    from data committed BEFORE the delete; null keys match null values
    (eqNullSafe)."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    data = os.path.join(root, "data")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())

    # extra data file with a NULL name (to prove null-key matching)
    e = os.path.join(data, "e.parquet")
    pq.write_table(
        pa.table({"id": pa.array([8], pa.int64()),
                  "name": pa.array([None], pa.string()),
                  "year": pa.array([2020], pa.int32())}), e
    )
    me = _manifest(meta, "me", [_entry(e, os.path.getsize(e), 2020, n=1)])

    dp = _name_delete_parquet(os.path.join(data, "eq-del-1.parquet"),
                              ["beta", "zeta", None])
    mdel = _eq_manifest(meta, "meqd", dp, [2])
    m1 = os.path.join(meta, "m1-m0.avro")
    m2 = os.path.join(meta, "m2-m0.avro")
    ml = _manifest_list_seq(
        meta, "eq",
        [(m1, 0, 1), (m2, 0, 1), (me, 0, 1), (mdel, 1, 2)],
        snap_id=7,
    )
    md["snapshots"].append(
        {"snapshot-id": 7, "timestamp-ms": 7000, "manifest-list": ml,
         "summary": {"operation": "overwrite"}}
    )
    md["current-snapshot-id"] = 7
    open(md_path, "w").write(json.dumps(md))

    df = IcebergCatalog("t", root).to_dataframe(spark)
    # beta (id 2), zeta (id 6), and the null-name row (id 8) are gone
    assert sorted(r["id"] for r in df.collect()) == [1, 3, 4, 5]
    assert {f.name for f in df.schema.fields} == {"id", "name", "year"}


def test_equality_delete_sequence_scoping(spark, tmp_path):
    """The spec's strict rule: an equality delete at sequence N hits only
    data with sequence < N — a re-insert of the same key in a LATER commit
    survives the delete."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    data = os.path.join(root, "data")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())

    # re-insert 'beta' as id 7 in a commit AFTER the delete (seq 3 > 2)
    f = os.path.join(data, "f.parquet")
    pq.write_table(
        pa.table({"id": pa.array([7], pa.int64()),
                  "name": pa.array(["beta"], pa.string()),
                  "year": pa.array([2022], pa.int32())}), f
    )
    mf = _manifest(meta, "mf", [_entry(f, os.path.getsize(f), 2022, n=1)])
    dp = _name_delete_parquet(os.path.join(data, "eq-del-2.parquet"), ["beta"])
    mdel = _eq_manifest(meta, "meqs", dp, [2])
    m1 = os.path.join(meta, "m1-m0.avro")
    m2 = os.path.join(meta, "m2-m0.avro")
    ml = _manifest_list_seq(
        meta, "eqseq",
        [(m1, 0, 1), (m2, 0, 1), (mdel, 1, 2), (mf, 0, 3)],
        snap_id=8,
    )
    md["snapshots"].append(
        {"snapshot-id": 8, "timestamp-ms": 8000, "manifest-list": ml}
    )
    md["current-snapshot-id"] = 8
    open(md_path, "w").write(json.dumps(md))

    rows = {r["id"]: r["name"]
            for r in IcebergCatalog("t", root).to_dataframe(spark).collect()}
    # old beta (id 2, seq 1) deleted; re-inserted beta (id 7, seq 3) alive
    assert sorted(rows) == [1, 3, 4, 5, 6, 7]
    assert rows[7] == "beta"


def test_position_and_equality_deletes_compose(spark, tmp_path):
    """Both delete kinds in one snapshot: each removes its rows
    independently."""
    root = _mor_table(tmp_path, [("a", 0), ("c", 1)])  # pos-deletes id 1, 5
    meta = os.path.join(root, "metadata")
    data = os.path.join(root, "data")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())

    dp = _name_delete_parquet(os.path.join(data, "eq-del-3.parquet"), ["zeta"])
    mdel = _eq_manifest(meta, "meqc", dp, [2])
    m1 = os.path.join(meta, "m1-m0.avro")
    m2 = os.path.join(meta, "m2-m0.avro")
    mpos = os.path.join(meta, "mpos-m0.avro")
    ml = _manifest_list_seq(
        meta, "both",
        [(m1, 0, 1), (m2, 0, 1), (mpos, 1, 2), (mdel, 1, 2)],
        snap_id=9,
    )
    md["snapshots"].append(
        {"snapshot-id": 9, "timestamp-ms": 9000, "manifest-list": ml}
    )
    md["current-snapshot-id"] = 9
    open(md_path, "w").write(json.dumps(md))

    df = IcebergCatalog("t", root).to_dataframe(spark)
    # pos removed ids 1, 5; equality removed zeta (id 6)
    assert sorted(r["id"] for r in df.collect()) == [2, 3, 4]


# --- manifest skipping: numeric-literal coercion consistency ---------------
# Spark coerces `string_col > 9` (bare numeric) to a DOUBLE comparison but
# `string_col > '9'` to a string one; manifest skipping must mirror that
# split or numeric filters silently skip matching manifests ('20' <= '9'
# lexicographically while 20 > 9 numerically).

def _fake_cat(spec_fields):
    cat = object.__new__(IcebergCatalog)
    cat._default_spec_id = 0
    cat._spec_fields = spec_fields
    cat._specs = {0: spec_fields}
    cat._derived = {0: {}}
    return cat


def _summary_manifest(lo: int, hi: int, width: int = 4):
    def le(v):
        return v.to_bytes(width, "little", signed=True)

    return {
        "partition_spec_id": 0, "content": 0,
        "partitions": [{"contains_null": False,
                        "lower_bound": le(lo), "upper_bound": le(hi)}],
    }


INT_IDENT = [{"name": "p", "kind": "identity", "prune_name": "p",
              "source_name": "p", "source_type": "int"}]
STR_IDENT = [{"name": "p", "kind": "identity", "prune_name": "p",
              "source_name": "p", "source_type": "string"}]


@pytest.mark.parametrize("flt,disjoint", [
    ("p > 9", False),      # ADVICE repro: '20' <= '9' lexicographic trap
    ("p >= 10", False),
    ("p = 15", False),
    ("p IN (9, 15)", False),
    ("p > 25", True),      # provably above hi=20
    ("p < 10", True),
    ("p <= 9", True),
    ("p = 5", True),
    ("p IN (5, 25)", True),
    ("p > '9'", True),     # QUOTED literal keeps the string domain:
                           # '10'..'20' all <= '9' lexicographically
])
def test_manifest_skipping_numeric_literals_int_identity(flt, disjoint):
    from buzz_rust_spark.sources.iceberg import _parse_conjuncts

    cat = _fake_cat(INT_IDENT)
    m = _summary_manifest(10, 20)
    assert cat._manifest_disjoint(m, _parse_conjuncts(flt)) is disjoint


def test_manifest_skipping_numeric_literal_string_partition_never_skips():
    """String-typed identity bounds are min/max in STRING order — a manifest
    holding {'10','20','9'} has bounds ['10','9'], which as numbers do NOT
    bracket 20.  Bare-numeric filters must never skip on string columns."""
    from buzz_rust_spark.sources.iceberg import _parse_conjuncts

    cat = _fake_cat(STR_IDENT)
    m = {
        "partition_spec_id": 0, "content": 0,
        "partitions": [{"contains_null": False,
                        "lower_bound": b"10", "upper_bound": b"9"}],
    }
    # numerically hi looks like 9 <= 15, but '20' is inside the manifest
    assert cat._manifest_disjoint(m, _parse_conjuncts("p > 15")) is False
    # quoted literals stay on the (sound) string domain
    assert cat._manifest_disjoint(m, _parse_conjuncts("p > 'zz'")) is True


def test_manifest_skipping_mixed_in_list_never_skips():
    from buzz_rust_spark.sources.iceberg import _parse_conjuncts

    cat = _fake_cat(INT_IDENT)
    m = _summary_manifest(10, 20)
    assert cat._manifest_disjoint(m, _parse_conjuncts("p IN ('5', 25)")) is False


@pytest.mark.parametrize("kind,lo,hi,flt,disjoint", [
    # year transform: ordinal 50 → rendered "2020" → parses back numerically
    ("year", 50, 51, "pf > 2021", True),
    ("year", 50, 51, "pf >= 2020", False),
    # month transform renders "2020-05" → double(null) at file level; the
    # term must simply never skip
    ("month", 600, 612, "pf > 9", False),
])
def test_manifest_skipping_numeric_literals_transforms(kind, lo, hi, flt, disjoint):
    from buzz_rust_spark.sources.iceberg import _parse_conjuncts

    cat = _fake_cat([{"name": "pf", "kind": kind, "prune_name": "pf",
                      "source_name": "ts", "source_type": "timestamp"}])
    m = _summary_manifest(lo, hi)
    assert cat._manifest_disjoint(m, _parse_conjuncts(flt)) is disjoint


def test_manifest_skipping_bare_numeric_end_to_end(spark, tmp_path):
    """Ghost-manifest variant of test_manifest_skipping_never_opens_disjoint
    with BARE numeric literals: a filter the numeric domain proves disjoint
    never opens the ghost; one it cannot exclude fails loudly; and the
    ADVICE repro (`> 9` over lexicographically-tricky bounds) keeps rows."""
    root = build_table(tmp_path)
    meta = os.path.join(root, "metadata")
    md_path = os.path.join(meta, "v3.metadata.json")
    md = json.loads(open(md_path).read())
    m1 = os.path.join(meta, "m1-m0.avro")  # 2020 files (exists)
    m2 = os.path.join(meta, "m2-m0.avro")  # 2021 files
    ghost = os.path.join(meta, "ghost-m0.avro")

    def le(v):
        return v.to_bytes(4, "little", signed=True)

    recs = [
        {"manifest_path": m1, "manifest_length": os.path.getsize(m1),
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 9,
         "partitions": [{"contains_null": False,
                         "lower_bound": le(2020), "upper_bound": le(2020)}]},
        {"manifest_path": m2, "manifest_length": os.path.getsize(m2),
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 9,
         "partitions": [{"contains_null": False,
                         "lower_bound": le(2021), "upper_bound": le(2021)}]},
        {"manifest_path": ghost, "manifest_length": 10,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 9,
         "partitions": [{"contains_null": False,
                         "lower_bound": le(1999), "upper_bound": le(1999)}]},
    ]
    ml = os.path.join(meta, "snap-num.avro")
    open(ml, "wb").write(encode_avro_records(MANIFEST_FILE_SCHEMA_V2, recs))
    md["snapshots"].append(
        {"snapshot-id": 9, "timestamp-ms": 9000, "manifest-list": ml}
    )
    md["current-snapshot-id"] = 9
    open(md_path, "w").write(json.dumps(md))

    # bare-numeric range provably disjoint from the ghost (1999) — skipped
    df = IcebergCatalog("t", root).to_dataframe(spark, "year >= 2020 AND year <= 2020")
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
    # `year > 1998` brackets 1999 → ghost must be opened → loud failure,
    # NOT a silent skip (the pre-fix lexicographic bug skipped here when
    # bounds/literal string-compare inverted)
    with pytest.raises(Exception):
        IcebergCatalog("t", root).to_dataframe(spark, "year > 1998").collect()


def test_manifest_skipping_truncate_bounds_source_typed():
    """Truncate fields store SOURCE-typed summary bounds (writer store_type
    keeps the source type for identity AND truncate).  A 4-byte UTF-8
    string bound must decode as a string — the pre-fix int decode rendered
    it as a digit string and skipped the live manifest (silent data loss);
    8-byte truncate-long bounds must decode as longs so skipping works."""
    from buzz_rust_spark.sources.iceberg import _parse_conjuncts

    cat = _fake_cat([{"name": "w_trunc", "kind": "truncate",
                      "prune_name": "w_trunc", "source_name": "w",
                      "source_type": "string"}])
    m = {
        "partition_spec_id": 0, "content": 0,
        "partitions": [{"contains_null": False,
                        "lower_bound": b"gamm", "upper_bound": b"gamm"}],
    }
    # ADVICE repro: bounds are exactly 4 bytes; the int misdecode rendered
    # '1835888999'-style digit strings, proved disjointness, and dropped
    # the 2 matching rows
    assert cat._manifest_disjoint(m, _parse_conjuncts("w_trunc = 'gamm'")) is False
    # and a genuinely-disjoint string filter still skips
    assert cat._manifest_disjoint(m, _parse_conjuncts("w_trunc = 'zeta'")) is True

    cat2 = _fake_cat([{"name": "v_trunc", "kind": "truncate",
                       "prune_name": "v_trunc", "source_name": "v",
                       "source_type": "long"}])
    m2 = _summary_manifest(100, 200, width=8)  # 8-byte long bounds
    # pre-fix the int decode failed on 8 bytes → skipping silently disabled
    assert cat2._manifest_disjoint(m2, _parse_conjuncts("v_trunc = '300'")) is True
    assert cat2._manifest_disjoint(m2, _parse_conjuncts("v_trunc = '100'")) is False
    assert cat2._manifest_disjoint(m2, _parse_conjuncts("v_trunc > 250")) is True
    assert cat2._manifest_disjoint(m2, _parse_conjuncts("v_trunc > 150")) is False


def test_truncate_string_prune_end_to_end(spark, tmp_path):
    """write_iceberg(truncate(4, w)) whose values truncate to exactly-4-byte
    strings: the filtered read must return the matching rows (the ADVICE
    silent-loss repro), and pruning must still drop disjoint files."""
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, "gamma"), (2, "gammy"), (3, "delta")], "id long, w string"
        ),
        root, partition_by=["truncate(4, w)"],
    )
    cat = IcebergCatalog("t", root)
    assert sorted(
        r.id for r in cat.to_dataframe(spark, "w_trunc = 'gamm'").collect()
    ) == [1, 2]
    assert len(cat.pruned_files(spark, "w_trunc = 'gamm'")) < 2 or sorted(
        r.id for r in cat.to_dataframe(spark, "w_trunc = 'delt'").collect()
    ) == [3]
    # truncate-over-long end-to-end (8-byte bounds)
    root2 = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame([(1, 130), (2, 990)], "id long, v long"),
        root2, partition_by=["truncate(100, v)"],
    )
    cat2 = IcebergCatalog("t", root2)
    assert sorted(
        r.id for r in cat2.to_dataframe(spark, "v_trunc = '900'").collect()
    ) == [2]


def test_equality_delete_single_join_per_keyset(spark, tmp_path):
    """≥20 equality-delete commits (Flink-CDC cadence) must plan exactly
    ONE anti-join for the key-set — not one per commit — with MOR results
    identical to the per-commit semantics, including re-insert survival."""
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg, write_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(i, 0) for i in range(5)], "id long, v long"),
        root,
    )
    # 21 upsert commits: keys cycle 0..4, values strictly increase
    for c in range(1, 22):
        merge_iceberg(
            spark, root,
            spark.createDataFrame([(c % 5, c)], "id long, v long"), ["id"],
        )
    # re-insert survival: key 99 upserted then upserted again — the newest
    # row postdates every delete matching its key and must survive
    merge_iceberg(spark, root,
                  spark.createDataFrame([(99, 1)], "id long, v long"), ["id"])
    merge_iceberg(spark, root,
                  spark.createDataFrame([(99, 2)], "id long, v long"), ["id"])

    df = IcebergCatalog("t", root).to_dataframe(spark)
    expect = {i: 0 for i in range(5)}
    for c in range(1, 22):
        expect[c % 5] = c
    expect[99] = 2
    assert {(r.id, r.v) for r in df.collect()} == set(expect.items())

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    anti_joins = plan.count("Join LeftAnti")
    assert anti_joins == 1, f"expected 1 anti-join for 23 delete commits, got {anti_joins}:\n{plan[:4000]}"


# --- incremental (changes) read ---------------------------------------------


def test_iceberg_changes_lifecycle(spark, tmp_path):
    """write→append→merge→rewrite: changes over each window return exactly
    the net new rows, tagged with the snapshot that added them; compaction
    contributes nothing; windows crossing a truncating overwrite refuse."""
    from buzz_rust_spark.sources.iceberg import read_iceberg_changes
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        rewrite_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    s1 = write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), root
    )["snapshot_id"]
    s2 = write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, v string"), root,
        mode="append",
    )["snapshot_id"]
    s3 = merge_iceberg(
        spark, root,
        spark.createDataFrame([(3, "C"), (4, "d")], "id long, v string"),
        ["id"],
    )["snapshot_id"]
    s4 = rewrite_iceberg(spark, root)["snapshot_id"]

    # (s1, s2]: just the append
    got = read_iceberg_changes(spark, root, s1, s2)
    assert {(r.id, r.v, r._snapshot_id) for r in got.collect()} == {(3, "c", s2)}

    # (s1, s3]: s2's row 3 was overwritten by the merge IN the window —
    # net new rows are the merge's upserts only... plus nothing from s2
    got = read_iceberg_changes(spark, root, s1, s3)
    assert {(r.id, r.v, r._snapshot_id) for r in got.collect()} == {
        (3, "C", s3), (4, "d", s3),
    }

    # (s1, s4]: the rewrite adds no logical rows
    got = read_iceberg_changes(spark, root, s1, s4)
    assert {(r.id, r.v, r._snapshot_id) for r in got.collect()} == {
        (3, "C", s3), (4, "d", s3),
    }

    # (s3, s4]: only compaction — empty, with the right schema
    got = read_iceberg_changes(spark, root, s3, s4)
    assert got.count() == 0
    assert got.columns == ["id", "v", "_snapshot_id"]

    # to defaults to current
    assert read_iceberg_changes(spark, root, s1).count() == 2

    # same-snapshot window is empty
    assert read_iceberg_changes(spark, root, s2, s2).count() == 0


def test_iceberg_changes_delete_and_refusals(spark, tmp_path):
    from buzz_rust_spark.errors import (
        BuzzBadRequestError,
        BuzzExecutionError,
    )
    from buzz_rust_spark.sources.iceberg import read_iceberg_changes
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        expire_iceberg_snapshots,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    s1 = write_iceberg(spark.range(4).selectExpr("id"), root)["snapshot_id"]
    s2 = write_iceberg(
        spark.createDataFrame([(10,), (11,)], "id long"), root, mode="append"
    )["snapshot_id"]
    # position-delete one in-range row (10) and one pre-range row (0)
    s3 = delete_iceberg(spark, root, "id IN (0, 10)")["snapshot_id"]

    got = read_iceberg_changes(spark, root, s1, s3)
    # net new rows: 11 survives; 10 was added then deleted IN range;
    # the deletion of pre-range row 0 is not expressible in an appends feed
    assert {(r.id, r._snapshot_id) for r in got.collect()} == {(11, s2)}

    # inverted window
    with pytest.raises(BuzzBadRequestError, match="precedes"):
        read_iceberg_changes(spark, root, s3, s1)
    # unknown cursor
    with pytest.raises(BuzzExecutionError, match="re-bootstrap"):
        read_iceberg_changes(spark, root, 424242, s3)

    # truncating overwrite in the window → typed refusal
    s4 = write_iceberg(
        spark.createDataFrame([(99,)], "id long"), root, mode="overwrite"
    )["snapshot_id"]
    with pytest.raises(BuzzExecutionError, match="truncating overwrite"):
        read_iceberg_changes(spark, root, s1, s4).collect()

    # expired history inside the window → typed gap error
    write_iceberg(spark.createDataFrame([(5,)], "id long"), root,
                  mode="append")
    expire_iceberg_snapshots(root, keep_last=1)
    with pytest.raises(BuzzExecutionError, match="re-bootstrap|not in table"):
        read_iceberg_changes(spark, root, s1)


# --- name mapping (id-less external data files) ------------------------------


def _add_idless_file(root: str, name_col: str, ids, names,
                     properties: dict | None = None) -> None:
    """Append an ID-LESS data file (external-writer shape) to the renamed
    fixture's manifest, optionally setting table properties."""
    p = os.path.join(root, "data", "f_noids.parquet")
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()),
                  name_col: pa.array(names, pa.string())}),
        p,
    )
    entry_schema = {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": []}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            }},
        ],
    }
    m2 = os.path.join(root, "metadata", "m-noids.avro")
    open(m2, "wb").write(encode_avro_records(entry_schema, [
        {"status": 1, "data_file": {
            "content": 0, "file_path": p, "file_format": "PARQUET",
            "partition": {}, "record_count": len(ids),
            "file_size_in_bytes": os.path.getsize(p)}}
    ]))
    md_path = os.path.join(root, "metadata", "v1.metadata.json")
    md = json.loads(open(md_path).read())
    ml = _manifest_list(os.path.join(root, "metadata"), "nm",
                        [os.path.join(root, "metadata", "m-0.avro"), m2])
    md["snapshots"] = [{"snapshot-id": 2, "timestamp-ms": 2,
                        "manifest-list": ml}]
    md["current-snapshot-id"] = 2
    if properties is not None:
        md["properties"] = properties
    open(md_path, "w").write(json.dumps(md))


def test_name_mapping_reads_idless_files(spark, tmp_path):
    """An evolved table with schema.name-mapping.default reads id-less
    external files by mapped name: f_noids carries the OLD column name and
    no parquet field ids, yet resolves under the CURRENT name."""
    root = build_renamed_table(tmp_path)
    _add_idless_file(root, "name_old", [7], ["delta"], properties={
        "schema.name-mapping.default": json.dumps([
            {"field-id": 1, "names": ["id"]},
            {"field-id": 2, "names": ["name_old", "name"]},
        ])
    })
    cat = IcebergCatalog("t", root)
    assert cat._evolved is True
    rows = {r["id"]: r["name"] for r in cat.to_dataframe(spark).collect()}
    assert rows == {1: "alpha", 2: "beta", 3: "gamma", 7: "delta"}


def test_name_mapping_unmapped_field_reads_null(spark, tmp_path):
    """A field id absent from the mapping (or whose names miss the file)
    reads NULL from id-less files — the spec's rule — while id-bearing
    files keep their values."""
    root = build_renamed_table(tmp_path)
    _add_idless_file(root, "name_old", [7], ["delta"], properties={
        "schema.name-mapping.default": json.dumps([
            {"field-id": 1, "names": ["id"]},  # field 2 unmapped
        ])
    })
    rows = {r["id"]: r["name"]
            for r in IcebergCatalog("t", root).to_dataframe(spark).collect()}
    assert rows == {1: "alpha", 2: "beta", 3: "gamma", 7: None}


def test_idless_file_without_mapping_fails_loudly(spark, tmp_path):
    """Without the property, the current refusal stands: the field-id scan
    fails LOUDLY on the id-less file instead of silently misreading it."""
    root = build_renamed_table(tmp_path)
    _add_idless_file(root, "name_old", [7], ["delta"], properties=None)
    with pytest.raises(Exception):
        IcebergCatalog("t", root).to_dataframe(spark).collect()


# --- CDC changelog (retractions) ---------------------------------------------


def _apply_changelog(from_df, cl):
    ins = cl.where("_change_type = 'insert'").drop("_change_type")
    dels = cl.where("_change_type = 'delete'").drop("_change_type")
    return from_df.unionAll(ins).exceptAll(dels)


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_iceberg_changelog_append_merge_delete(spark, tmp_path):
    """Oracle-style reconciliation: applying the changelog (multiset
    union/except) to a materialized from-snapshot copy reaches EXACTLY the
    to-snapshot content, across append → delete → merge history, including
    retractions of pre-range rows (the gap the appends feed documents)."""
    from buzz_rust_spark.sources.iceberg import read_iceberg_changelog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        root,
    )
    cat = IcebergCatalog("t", root)
    from_snap = cat.history()[-1]["snapshot_id"]
    write_iceberg(
        spark.createDataFrame([(4, "d")], "id long, v string"),
        root, mode="append",
    )
    delete_iceberg(spark, root, "id = 3")  # pos-delete of a PRE-range row
    merge_iceberg(
        spark, root,
        spark.createDataFrame([(2, "B"), (5, "e")], "id long, v string"),
        key_cols=["id"],
    )  # eq-delete retracts pre-range (2,'b'); upserts

    cl = read_iceberg_changelog(spark, root, from_snap)
    got = sorted(
        (r.id, r.v, r._change_type) for r in cl.collect()
    )
    assert got == [
        (2, "B", "insert"), (2, "b", "delete"), (3, "c", "delete"),
        (4, "d", "insert"), (5, "e", "insert"),
    ]
    from_df = IcebergCatalog(
        "t", root, snapshot_id=from_snap
    ).to_dataframe(spark)
    to_df = IcebergCatalog("t", root).to_dataframe(spark)
    assert _frames_equal(_apply_changelog(from_df, cl), to_df)


def test_iceberg_changelog_delete_only_and_empty_window(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg import read_iceberg_changelog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1,), (2,)], "id long"), root
    )
    from_snap = IcebergCatalog("t", root).history()[-1]["snapshot_id"]
    # empty window: no rows, stable schema
    cl0 = read_iceberg_changelog(spark, root, from_snap)
    assert cl0.count() == 0 and cl0.columns == ["id", "_change_type"]
    # delete-only window: pure retractions (the appends feed shows nothing)
    delete_iceberg(spark, root, "id = 1")
    cl = read_iceberg_changelog(spark, root, from_snap)
    assert [(r.id, r._change_type) for r in cl.collect()] == [(1, "delete")]
    from_df = IcebergCatalog(
        "t", root, snapshot_id=from_snap
    ).to_dataframe(spark)
    to_df = IcebergCatalog("t", root).to_dataframe(spark)
    assert _frames_equal(_apply_changelog(from_df, cl), to_df)


def test_iceberg_changelog_dedups_multi_hit_rows(spark, tmp_path):
    """A row matched by BOTH an in-range pos delete and an in-range eq
    delete retracts exactly once (coordinate dedup) — a double retraction
    would break the multiset contract."""
    from buzz_rust_spark.sources.iceberg import read_iceberg_changelog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"), root
    )
    from_snap = IcebergCatalog("t", root).history()[-1]["snapshot_id"]
    delete_iceberg(spark, root, "id = 1")  # pos delete hits (1, 10)
    merge_iceberg(
        spark, root,
        spark.createDataFrame([(1, 100)], "id long, v long"),
        key_cols=["id"],
    )  # eq delete ALSO covers key 1 (the from-row)
    cl = read_iceberg_changelog(spark, root, from_snap)
    assert sorted((r.id, r.v, r._change_type) for r in cl.collect()) == [
        (1, 10, "delete"), (1, 100, "insert"),
    ]
    from_df = IcebergCatalog(
        "t", root, snapshot_id=from_snap
    ).to_dataframe(spark)
    to_df = IcebergCatalog("t", root).to_dataframe(spark)
    assert _frames_equal(_apply_changelog(from_df, cl), to_df)


def test_changelog_zone_map_prunes_from_state(spark, tmp_path):
    """Equality retraction is zone-mapped: a from-file whose key-column
    bounds are provably disjoint from every in-range delete key is NEVER
    read (ghost-file proof) — the retraction scan is O(affected files),
    not O(from-state)."""
    from buzz_rust_spark.sources.iceberg import read_iceberg_changelog
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    # two disjoint key-range files: ids 1-10 and 1000-1010
    write_iceberg(
        spark.createDataFrame(
            [(i, i * 1.0) for i in range(1, 11)], "id long, v double"
        ).coalesce(1),
        root,
    )
    write_iceberg(
        spark.createDataFrame(
            [(i, i * 1.0) for i in range(1000, 1011)], "id long, v double"
        ).coalesce(1),
        root, mode="append",
    )
    from_snap = IcebergCatalog("t", root).history()[-1]["snapshot_id"]
    merge_iceberg(
        spark, root,
        spark.createDataFrame([(5, 500.0)], "id long, v double"),
        key_cols=["id"],
    )
    cat = IcebergCatalog("t", root)
    plan = cat._plan(spark, None)
    # ghost the high-range file: the zone map proves keys {5} can't be in
    # [1000, 1010], so the changelog never opens it
    high = next(
        rec for rec, _ in plan["pairs"]
        if "1000" in str(
            __import__("pyarrow.parquet", fromlist=["p"]).read_table(
                rec.removeprefix("file:"), columns=["id"]
            ).column("id")[0]
        )
    )
    os.rename(high, high + ".hidden")
    try:
        cl = read_iceberg_changelog(spark, root, from_snap)
        got = sorted((r.id, r.v, r._change_type) for r in cl.collect())
        assert got == [(5, 5.0, "delete"), (5, 500.0, "insert")]
    finally:
        os.rename(high + ".hidden", high)


def test_stats_filter_prunes_scan_files_and_stays_exact(spark, tmp_path):
    """to_dataframe(stats_filter=...): after a z-ordered rewrite, a band
    predicate on a clustered column scans FEWER files (observed via
    DataFrame.inputFiles) while returning exactly the rows a plain
    where() returns; predicates outside the prunable subset (OR) prune
    nothing but stay exact; a filter on an unclustered query still
    matches its where() twin."""
    from buzz_rust_spark.sources.iceberg_writer import (
        rewrite_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    rows = [(i, float(i % 100), float((i * 37) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    write_iceberg(df.repartition(4), root, target_file_rows=500)
    rewrite_iceberg(spark, root, target_file_rows=250, zorder_by=["x", "y"])

    cat = IcebergCatalog("t", root)
    full = cat.to_dataframe(spark)
    expect = sorted(
        (r.id, r.x, r.y) for r in full.where("x < 10.0").collect()
    )
    filt = cat.to_dataframe(spark, stats_filter="x < 10.0")
    assert len(filt.inputFiles()) < len(full.inputFiles())
    assert sorted((r.id, r.x, r.y) for r in filt.collect()) == expect

    # OR predicates are outside the conjunct subset: no pruning, exact rows
    pred = "x < 10.0 OR y >= 95.0"
    both = cat.to_dataframe(spark, stats_filter=pred)
    assert len(both.inputFiles()) == len(full.inputFiles())
    assert sorted((r.id,) for r in both.collect()) == sorted(
        (r.id,) for r in full.where(pred).collect()
    )

    # string-domain guard: a bare numeric against a string column must
    # not prune (Spark coerces to double; string bounds are string-ordered)
    cat2_root = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame(
            [(i, str(i)) for i in range(30)], "id long, s string"
        ).coalesce(1),
        cat2_root,
    )
    cat2 = IcebergCatalog("t", cat2_root)
    got = cat2.to_dataframe(spark, stats_filter="s > 9").collect()
    assert sorted(r.id for r in got) == sorted(
        r.id
        for r in cat2.to_dataframe(spark).where("s > 9").collect()
    )
    # quoted string literals DO prune in the string domain
    hit = cat2.to_dataframe(spark, stats_filter="s = 'zz'")
    assert hit.count() == 0
    # IN lists prune when NO candidate falls inside a file's bounds, and
    # stay exact when some do
    assert cat2.to_dataframe(spark, stats_filter="s IN ('zz', 'yy')").count() == 0
    sel = cat.to_dataframe(spark, stats_filter="x IN (1.0, 2.0)")
    assert len(sel.inputFiles()) < len(full.inputFiles())
    assert sorted((r.id,) for r in sel.collect()) == sorted(
        (r.id,) for r in full.where("x IN (1.0, 2.0)").collect()
    )
