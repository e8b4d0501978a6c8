"""Iceberg v2 writer (sources/iceberg_writer.py): every commit the writer
produces is read back through the repo's own IcebergCatalog — the reader is
pinned against hand-built spec-shaped fixtures in test_iceberg.py, so a
round-trip through it checks the writer against the spec, not against
itself."""

from __future__ import annotations

import datetime
import glob
import json
import os

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.errors import (
    BuzzBadRequestError,
    BuzzExecutionError,
    BuzzSchemaError,
)
from buzz_rust_spark.sources.iceberg import IcebergCatalog
from buzz_rust_spark.sources.iceberg_writer import write_iceberg


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_create_partitioned_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _rows(
        spark,
        [(1, "alpha", "2020"), (2, "beta", "2020"), (3, "gamma", "2021")],
        "id long, name string, year string",
    )
    s = write_iceberg(df, root, partition_by=["year"])
    assert s["added_records"] == 3 and s["metadata_version"] == 1
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["year"]
    assert sorted(
        (r.id, r.name, r.year) for r in cat.to_dataframe(spark).collect()
    ) == [(1, "alpha", "2020"), (2, "beta", "2020"), (3, "gamma", "2021")]
    # manifest-level pruning against the writer's own partition tuples
    pruned = cat.to_dataframe(spark, "year = '2021'")
    assert [(r.id, r.year) for r in pruned.collect()] == [(3, "2021")]
    assert len(cat.pruned_files(spark, "year = '2021'")) == 1


def test_append_time_travel_history(spark, tmp_path):
    root = str(tmp_path / "t")
    schema = "id long, v string"
    s1 = write_iceberg(_rows(spark, [(1, "a")], schema), root)
    s2 = write_iceberg(_rows(spark, [(2, "b")], schema), root, mode="append")
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == [1, 2]
    old = IcebergCatalog("t", root, snapshot_id=s1["snapshot_id"])
    assert [r.id for r in old.to_dataframe(spark).collect()] == [1]
    ops = [h["operation"] for h in cat.history()]
    assert ops == ["append", "append"]
    assert s2["sequence_number"] == s1["sequence_number"] + 1


def test_overwrite_replaces_but_keeps_history(spark, tmp_path):
    root = str(tmp_path / "t")
    schema = "id long"
    s1 = write_iceberg(_rows(spark, [(1,), (2,)], schema), root)
    s2 = write_iceberg(_rows(spark, [(9,)], schema), root, mode="overwrite")
    cat = IcebergCatalog("t", root)
    assert [r.id for r in cat.to_dataframe(spark).collect()] == [9]
    assert cat.history()[-1]["operation"] == "overwrite"
    old = IcebergCatalog("t", root, snapshot_id=s1["snapshot_id"])
    assert sorted(r.id for r in old.to_dataframe(spark).collect()) == [1, 2]
    assert s2["sequence_number"] == 2


def test_schema_mismatch_and_mode_validation(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    with pytest.raises(BuzzSchemaError, match="does not match"):
        write_iceberg(_rows(spark, [(1,)], "id long"), root)
    with pytest.raises(BuzzSchemaError, match="does not match"):
        write_iceberg(
            _rows(spark, [(1, 2)], "id long, v long"), root
        )  # same names, other type
    with pytest.raises(BuzzBadRequestError, match="mode"):
        write_iceberg(_rows(spark, [(1, "a")], "id long, v string"),
                      root, mode="merge")
    with pytest.raises(BuzzBadRequestError, match="not in dataframe"):
        write_iceberg(_rows(spark, [(1,)], "id long"),
                      str(tmp_path / "t2"), partition_by=["nope"])
    with pytest.raises(BuzzBadRequestError, match="local file URIs"):
        write_iceberg(_rows(spark, [(1,)], "id long"), "s3://bucket/t")


def test_append_reorders_columns_by_name(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    write_iceberg(_rows(spark, [("b", 2)], "v string, id long"), root)
    cat = IcebergCatalog("t", root)
    assert sorted((r.id, r.v) for r in cat.to_dataframe(spark).collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_empty_append_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1,)], "id long"), root)
    empty = spark.createDataFrame([], "id long")
    assert write_iceberg(empty, root) is None
    assert len(IcebergCatalog("t", root).history()) == 1


def test_date_partition_prunes_as_iso(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _rows(
        spark,
        [
            (1, datetime.date(2024, 1, 1)),
            (2, datetime.date(2024, 1, 1)),
            (3, datetime.date(2024, 6, 30)),
        ],
        "id long, day date",
    )
    write_iceberg(df, root, partition_by=["day"])
    cat = IcebergCatalog("t", root)
    # the manifest stores days-since-epoch ints; the filter surface is ISO
    pruned = cat.to_dataframe(spark, "day = '2024-06-30'")
    assert [r.id for r in pruned.collect()] == [3]
    assert len(cat.pruned_files(spark, "day = '2024-01-01'")) == 1


def test_manifest_skipping_on_written_summaries(spark, tmp_path):
    """Two appends with disjoint partition ranges: a filter matching only
    the second manifest must never OPEN the first (the writer's
    manifest-list partition summaries drive the reader's skipping)."""
    root = str(tmp_path / "t")
    schema = "id long, year string"
    write_iceberg(
        _rows(spark, [(1, "2019"), (2, "2020")], schema),
        root, partition_by=["year"],
    )
    write_iceberg(_rows(spark, [(3, "2030"), (4, "2031")], schema), root)
    cat = IcebergCatalog("t", root)
    opened: list[str] = []
    orig = cat._read_meta_bytes

    def spy(uri):
        if uri.endswith(".avro") and "-m0" in uri:
            opened.append(uri)
        return orig(uri)

    cat._read_meta_bytes = spy
    files = cat.pruned_files(spark, "year = '2030'")
    assert len(files) == 1
    assert len(opened) == 1, "disjoint manifest was opened"


def test_target_file_rows_rolls_files(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "cast(id % 2 as string) as p")
    write_iceberg(df, root, partition_by=["p"], target_file_rows=10)
    cat = IcebergCatalog("t", root)
    files = cat.pruned_files(spark, None)
    assert len(files) > 2  # rolled well past one file per partition value
    got = sorted(r.id for r in cat.to_dataframe(spark).collect())
    assert got == list(range(100))


def test_footer_field_ids_and_rename_evolution(spark, tmp_path):
    """Data files carry PARQUET:field_id, so a metadata-only column rename
    (applied here exactly as an Iceberg catalog would: new schema-id, same
    field ids) keeps pre-rename files readable through the field-id path."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "a")], "id long, team string"), root
    )
    f = glob.glob(os.path.join(root, "data", "*.parquet"))[0]
    ids = {
        fld.name: fld.metadata[b"PARQUET:field_id"]
        for fld in pq.read_schema(f)
    }
    assert ids == {"id": b"1", "team": b"2"}

    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    old_schema = meta["schemas"][0]
    renamed = {
        "type": "struct",
        "schema-id": 1,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "team_name", "required": False, "type": "string"},
        ],
    }
    meta["schemas"] = [old_schema, renamed]
    meta["current-schema-id"] = 1
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("2")

    cat = IcebergCatalog("t", root)
    assert cat._evolved
    rows = cat.to_dataframe(spark).collect()
    assert [(r.id, r.team_name) for r in rows] == [(1, "a")]


def test_unpartitioned_multi_task_write(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 1000, 1, 8).selectExpr("id", "id * 2 as dbl")
    write_iceberg(df, root)
    cat = IcebergCatalog("t", root)
    got = cat.to_dataframe(spark)
    assert got.count() == 1000
    assert got.selectExpr("sum(dbl) as s").collect()[0].s == 999 * 1000


def test_unwritable_spec_append_refused(spark, tmp_path):
    """Transform kinds the writer cannot produce (void) refuse appends;
    bucket/time transforms are writable since round 7."""
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "2020")], "id long, y string"),
                  root, partition_by=["y"])
    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    meta["partition-specs"][0]["fields"][0]["transform"] = "void"
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(BuzzBadRequestError, match="not\\s+writable"):
        write_iceberg(_rows(spark, [(2, "2021")], "id long, y string"), root)


def test_partition_by_conflict_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "2020")], "id long, y string"),
                  root, partition_by=["y"])
    with pytest.raises(BuzzBadRequestError, match="partition spec"):
        write_iceberg(_rows(spark, [(2, "2021")], "id long, y string"),
                      root, partition_by=["id"])


def test_float_partition_refused(spark, tmp_path):
    with pytest.raises(BuzzBadRequestError, match="does not accept source type"):
        write_iceberg(
            _rows(spark, [(1.5, "a")], "x double, v string"),
            str(tmp_path / "t"), partition_by=["x"],
        )


def test_null_partition_value_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _rows(spark, [(1, "2020"), (2, None)], "id long, y string")
    write_iceberg(df, root, partition_by=["y"])
    cat = IcebergCatalog("t", root)
    assert sorted(
        (r.id, r.y) for r in cat.to_dataframe(spark).collect()
    ) == [(1, "2020"), (2, None)]
    # the non-null partition still prunes
    assert len(cat.pruned_files(spark, "y = '2020'")) == 1


def _apply_rename(root: str, vcur: int, old: str, new: str):
    """A metadata-only column rename exactly as an Iceberg catalog commits
    it: a NEW schema (new schema-id, same field ids) appended to schemas."""
    meta_path = os.path.join(root, "metadata", f"v{vcur}.metadata.json")
    meta = json.load(open(meta_path))
    sid = meta["current-schema-id"]
    cur = next(s for s in meta["schemas"] if s["schema-id"] == sid)
    renamed = {
        "type": "struct",
        "schema-id": sid + 1,
        "fields": [
            {**f, "name": new if f["name"] == old else f["name"]}
            for f in cur["fields"]
        ],
    }
    meta["schemas"] = meta["schemas"] + [renamed]
    meta["current-schema-id"] = sid + 1
    nxt = vcur + 1
    with open(os.path.join(root, "metadata", f"v{nxt}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write(str(nxt))


def test_append_after_partition_column_rename(spark, tmp_path):
    """Renaming the PARTITION SOURCE column (metadata-only) must not break
    appends: the spec field keeps its old name, the data groups by the new
    column name, and both generations read back under one filter."""
    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "2020")], "id long, year string"),
        root, partition_by=["year"],
    )
    _apply_rename(root, 1, "year", "yr")
    s = write_iceberg(_rows(spark, [(2, "2020"), (3, "2021")],
                            "id long, yr string"), root)
    assert s is not None
    cat = IcebergCatalog("t", root)
    assert cat._evolved and cat.partition_cols == ["yr"]
    assert sorted(
        (r.id, r.yr) for r in cat.to_dataframe(spark).collect()
    ) == [(1, "2020"), (2, "2020"), (3, "2021")]
    pruned = cat.to_dataframe(spark, "yr = '2020'")
    assert sorted(r.id for r in pruned.collect()) == [1, 2]


def test_nonzero_default_spec_id_recorded(spark, tmp_path):
    """Manifests written under a non-zero default-spec-id must record THAT
    spec id — hardcoding 0 would make the reader treat the writer's own
    manifests as evolved-spec and refuse filtered reads."""
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, k string"),
                  root, partition_by=["k"])
    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    meta["partition-specs"][0]["spec-id"] = 1
    meta["default-spec-id"] = 1
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    # overwrite drops the (now mislabeled) original manifest; every manifest
    # in the new snapshot is writer-produced under spec 1
    write_iceberg(_rows(spark, [(2, "b"), (3, "c")], "id long, k string"),
                  root, mode="overwrite")
    cat = IcebergCatalog("t", root)
    pruned = cat.to_dataframe(spark, "k = 'b'")  # must not raise
    assert [r.id for r in pruned.collect()] == [2]


def test_single_slash_file_uri(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1,)], "id long"), f"file:{root}")
    assert os.path.isdir(os.path.join(root, "metadata"))
    cat = IcebergCatalog("t", root)
    assert [r.id for r in cat.to_dataframe(spark).collect()] == [1]


# --- delete_iceberg (position deletes, merge-on-read) -------------------------


def test_delete_roundtrip_mor(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    root = str(tmp_path / "t")
    df = spark.range(10).selectExpr("id", "cast(id % 2 as string) as par")
    write_iceberg(df, root, partition_by=["par"])
    s = delete_iceberg(spark, root, "id >= 6")
    assert s["deleted_rows"] == 4 and s["operation"] == "delete"
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == list(range(6))
    # pruned read still applies the delete
    odd = cat.to_dataframe(spark, "par = '1'")
    assert sorted(r.id for r in odd.collect()) == [1, 3, 5]
    assert cat.history()[-1]["operation"] == "delete"


def test_delete_twice_no_rematch_and_noop(spark, tmp_path):
    """Rows already position-deleted must not re-match; a predicate
    covering only them is a logical no-op returning None."""
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    root = str(tmp_path / "t")
    write_iceberg(spark.range(8).selectExpr("id"), root)
    assert delete_iceberg(spark, root, "id < 3")["deleted_rows"] == 3
    assert delete_iceberg(spark, root, "id < 3") is None
    s = delete_iceberg(spark, root, "id < 5")  # only 3, 4 still live
    assert s["deleted_rows"] == 2
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == [5, 6, 7]


def test_delete_then_append_then_read(spark, tmp_path):
    """A delete snapshot carries forward on append: the delete keeps
    applying to the old files, the appended rows are untouched."""
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    root = str(tmp_path / "t")
    write_iceberg(spark.range(4).selectExpr("id"), root)
    delete_iceberg(spark, root, "id = 0")
    write_iceberg(spark.range(100, 102).selectExpr("id"), root)
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == [
        1, 2, 3, 100, 101,
    ]


def test_delete_guards(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    with pytest.raises(BuzzBadRequestError, match="not an iceberg table"):
        delete_iceberg(spark, str(tmp_path / "missing"), "id = 1")
    root = str(tmp_path / "t")
    write_iceberg(spark.range(5).selectExpr("id"), root)
    with pytest.raises(BuzzExecutionError, match="max_delete_rows"):
        delete_iceberg(spark, root, "id >= 0", max_delete_rows=2)
    # no match → None, no commit
    assert delete_iceberg(spark, root, "id = 999") is None
    assert len(IcebergCatalog("t", root).history()) == 1


def test_delete_file_has_reserved_field_ids(spark, tmp_path):
    import pyarrow.parquet as pq

    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    root = str(tmp_path / "t")
    write_iceberg(spark.range(5).selectExpr("id"), root)
    delete_iceberg(spark, root, "id = 2")
    dels = [
        p for p in glob.glob(os.path.join(root, "data", "delete-*.parquet"))
    ]
    assert len(dels) == 1
    sch = pq.read_schema(dels[0])
    ids = {f.name: f.metadata[b"PARQUET:field_id"] for f in sch}
    assert ids == {"file_path": b"2147483546", "pos": b"2147483545"}


def test_rewrite_compacts_and_drops_delete_files(spark, tmp_path):
    """rewrite_iceberg materializes the MOR state into fresh files: the
    new snapshot plans ZERO delete files, reads identically, and the
    pre-rewrite snapshot still applies its deletes on time travel."""
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        rewrite_iceberg,
    )

    root = str(tmp_path / "t")
    df = spark.range(20).selectExpr("id", "cast(id % 2 as string) as par")
    write_iceberg(df, root, partition_by=["par"], target_file_rows=3)
    del_snap = delete_iceberg(spark, root, "id >= 10")
    s = rewrite_iceberg(spark, root)
    assert s["operation"] == "replace" and s["added_records"] == 10

    cat = IcebergCatalog("t", root)
    plan = cat._plan(spark, None)
    assert plan["deletes"] == []  # delete files no longer carried
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == list(range(10))
    # pruning still works on the rewritten files
    assert sorted(
        r.id for r in cat.to_dataframe(spark, "par = '0'").collect()
    ) == [0, 2, 4, 6, 8]
    # the delete snapshot still reads MOR-correct on time travel
    old = IcebergCatalog("t", root, snapshot_id=del_snap["snapshot_id"])
    assert sorted(r.id for r in old.to_dataframe(spark).collect()) == list(range(10))
    assert rewrite_iceberg(spark, str(tmp_path / "nope")) is None


def test_write_schema_merge_evolves_fills_and_upcasts(spark, tmp_path):
    """schema_mode='merge' on an Iceberg append: a NEW column evolves in
    (one metadata commit; old files read NULL), a MISSING optional
    column null-fills, int upcasts into the table's long — strict mode
    still refuses, narrowing and unaddable types refuse typed, and a
    REQUIRED absent column refuses instead of null-filling."""
    from buzz_rust_spark.errors import BuzzSchemaError
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    root = str(tmp_path / "t")
    base_schema = StructType(
        [
            StructField("id", LongType(), False),  # → required column
            StructField("v", StringType(), True),
        ]
    )
    write_iceberg(spark.createDataFrame([(1, "a")], base_schema), root)

    drifted = spark.createDataFrame([(2, 1.5)], "id int, n double")
    with pytest.raises(BuzzSchemaError, match="does not match"):
        write_iceberg(drifted, root, mode="append")
    out = write_iceberg(drifted, root, mode="append", schema_mode="merge")
    assert out["added_records"] == 1
    rows = {
        (r.id, r.v, r.n)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    }
    assert rows == {(1, "a", None), (2, None, 1.5)}

    # original shape now misses n — merge null-fills it
    write_iceberg(
        spark.createDataFrame([(3, "c")], base_schema), root,
        mode="append", schema_mode="merge",
    )
    assert (3, "c", None) in {
        (r.id, r.v, r.n)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    }

    with pytest.raises(BuzzSchemaError, match="lossless upcast"):
        write_iceberg(
            spark.createDataFrame([(4, "x")], "id long, n string"),
            root, mode="append", schema_mode="merge",
        )
    with pytest.raises(BuzzSchemaError, match="not addable"):
        write_iceberg(
            spark.createDataFrame(
                [(5, ["a"])], "id long, tags array<string>"
            ),
            root, mode="append", schema_mode="merge",
        )
    with pytest.raises(BuzzSchemaError, match="required"):
        write_iceberg(
            spark.createDataFrame([("z",)], "v string"),
            root, mode="append", schema_mode="merge",
        )


def test_rewrite_zorder_tightens_file_bounds(spark, tmp_path):
    """rewrite_iceberg(zorder_by=...) re-clusters while compacting: the
    rewritten files' manifest bounds become tight on BOTH curve
    dimensions (a band predicate on either overlaps a strict subset of
    files, where the scattered pre-rewrite layout overlapped all), rows
    are identical, and output file count follows target_file_rows.
    Single-column zorder degrades to a linear sort.  Refusals: unknown
    and non-numeric columns, partition_filter combination."""
    from buzz_rust_spark.sources.iceberg_writer import rewrite_iceberg

    root = str(tmp_path / "t")
    rows = [(i, float(i % 100), float((i * 37) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    write_iceberg(df.repartition(4), root, target_file_rows=500)

    def overlap_counts(cat):
        meta = json.load(open(sorted(
            glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
        )[-1]))
        sid = meta["current-schema-id"]
        sch = next(s for s in meta["schemas"] if s["schema-id"] == sid)
        fids = {f["name"]: f["id"] for f in sch["fields"]}
        bounds = cat.file_key_bounds(spark, [fids["x"], fids["y"]])
        n = len(bounds)
        nx = sum(1 for per in bounds.values() if per[fids["x"]][0] < 10.0)
        ny = sum(1 for per in bounds.values() if per[fids["y"]][0] < 10.0)
        return n, nx, ny

    n0, nx0, ny0 = overlap_counts(IcebergCatalog("t", root))
    # scattered: most files overlap the band on both dimensions (row-roll
    # remainder slivers may not)
    assert n0 >= 4 and nx0 > n0 // 2 and ny0 > n0 // 2

    s = rewrite_iceberg(
        spark, root, target_file_rows=250, zorder_by=["x", "y"]
    )
    assert s["operation"] == "replace" and s["added_records"] == 2000
    cat = IcebergCatalog("t", root)
    n1, nx1, ny1 = overlap_counts(cat)
    assert n1 >= 4
    assert nx1 < n1 and ny1 < n1, (n1, nx1, ny1)
    assert sorted(
        (r.id, r.x, r.y) for r in cat.to_dataframe(spark).collect()
    ) == sorted(rows)

    # single-column: linear clustering, same content
    s2 = rewrite_iceberg(spark, root, target_file_rows=500, zorder_by=["x"])
    assert s2["added_records"] == 2000
    n2, nx2, _ = overlap_counts(IcebergCatalog("t", root))
    assert nx2 < n2

    with pytest.raises(BuzzBadRequestError, match="not a table column"):
        rewrite_iceberg(spark, root, zorder_by=["nope"])
    with pytest.raises(BuzzBadRequestError, match="partition_filter"):
        rewrite_iceberg(
            spark, root, partition_filter="x > 0", zorder_by=["x"]
        )
    root2 = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame([("a", 1)], "s string, n long"), root2
    )
    with pytest.raises(BuzzBadRequestError, match="numeric or timestamp"):
        rewrite_iceberg(spark, root2, zorder_by=["s", "n"])


# --- merge_iceberg (equality-delete upsert) -----------------------------------


def test_merge_upsert_roundtrip(spark, tmp_path):
    """Merge = one commit: equality deletes for the source keys + new data.
    Updated keys show the new values, unseen keys insert, untouched rows
    survive — all through the reader's sequence-scoped eq-delete path."""
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
              "id long, name string, v long"),
        root,
    )
    src = _rows(spark, [(2, "B", 200), (4, "d", 40)],
                "id long, name string, v long")
    s = merge_iceberg(spark, root, src, ["id"])
    assert s["upserted_records"] == 2 and s["operation"] == "overwrite"
    cat = IcebergCatalog("t", root)
    assert sorted(
        (r.id, r.name, r.v) for r in cat.to_dataframe(spark).collect()
    ) == [(1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40)]


def test_merge_same_commit_rows_survive_their_own_delete(spark, tmp_path):
    """The delete and the data share one sequence number; the reader's
    strict `data_seq < delete_seq` scope must keep the new rows."""
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, 1)], "id long, v long"), root)
    for v in (2, 3, 4):  # repeated upserts of the SAME key
        merge_iceberg(spark, root,
                      _rows(spark, [(1, v)], "id long, v long"), ["id"])
    cat = IcebergCatalog("t", root)
    assert [(r.id, r.v) for r in cat.to_dataframe(spark).collect()] == [(1, 4)]


def test_merge_partitioned_and_time_travel(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    s0 = write_iceberg(
        _rows(spark, [(1, "x", "p0"), (2, "y", "p1")],
              "id long, name string, par string"),
        root, partition_by=["par"],
    )
    merge_iceberg(
        spark, root,
        _rows(spark, [(1, "X", "p0"), (3, "z", "p1")],
              "id long, name string, par string"),
        ["id"],
    )
    cat = IcebergCatalog("t", root)
    assert sorted(
        (r.id, r.name) for r in cat.to_dataframe(spark).collect()
    ) == [(1, "X"), (2, "y"), (3, "z")]
    # pruned read still merges correctly
    p0 = cat.to_dataframe(spark, "par = 'p0'")
    assert [(r.id, r.name) for r in p0.collect()] == [(1, "X")]
    # pre-merge snapshot unaffected
    old = IcebergCatalog("t", root, snapshot_id=s0["snapshot_id"])
    assert sorted(r.name for r in old.to_dataframe(spark).collect()) == ["x", "y"]


def test_merge_null_key_matches_null(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(None, "old"), (1, "one")],
                        "k long, v string"), root)
    merge_iceberg(spark, root,
                  _rows(spark, [(None, "new")], "k long, v string"), ["k"])
    cat = IcebergCatalog("t", root)
    got = {(r.k, r.v) for r in cat.to_dataframe(spark).collect()}
    assert got == {(None, "new"), (1, "one")}


def test_merge_guards(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    with pytest.raises(BuzzBadRequestError, match="not an iceberg table"):
        merge_iceberg(spark, root,
                      _rows(spark, [(1, "a")], "id long, v string"), ["id"])
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    with pytest.raises(BuzzBadRequestError, match="duplicate merge keys"):
        merge_iceberg(
            spark, root,
            _rows(spark, [(1, "x"), (1, "y")], "id long, v string"), ["id"],
        )
    with pytest.raises(BuzzBadRequestError, match="key columns"):
        merge_iceberg(spark, root,
                      _rows(spark, [(1, "a")], "id long, v string"), ["nope"])
    with pytest.raises(BuzzSchemaError, match="does not match"):
        merge_iceberg(spark, root, _rows(spark, [(1,)], "id long"), ["id"])
    # empty source → None, no commit
    assert merge_iceberg(
        spark, root, spark.createDataFrame([], "id long, v string"), ["id"]
    ) is None
    # evolved (renamed-column) table: merge now WORKS — delete files bind
    # by field id (previously a typed refusal; lifted round 10)
    _apply_rename(root, 1, "v", "val")
    merge_iceberg(spark, root,
                  _rows(spark, [(2, "b")], "id long, val string"), ["id"])
    got = sorted(
        (r.id, r.val)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_merge_then_rewrite_compacts_eq_deletes(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        rewrite_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a"), (2, "b")], "id long, v string"), root)
    merge_iceberg(spark, root, _rows(spark, [(2, "B")], "id long, v string"), ["id"])
    rewrite_iceberg(spark, root)
    cat = IcebergCatalog("t", root)
    assert cat._plan(spark, None)["deletes"] == []
    assert sorted(
        (r.id, r.v) for r in cat.to_dataframe(spark).collect()
    ) == [(1, "a"), (2, "B")]


def test_merge_deletes_use_unpartitioned_spec(spark, tmp_path):
    """The equality-delete manifest of a merge into a PARTITIONED table
    must be committed under an UNPARTITIONED spec — the spec's global
    form.  Under the partitioned spec, external readers scope the delete
    to the null partition only, resurrecting every updated row."""
    from buzz_rust_spark.sources.avro import decode_avro_file
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "x", "p0"), (2, "y", "p1")],
              "id long, v string, par string"),
        root, partition_by=["par"],
    )
    merge_iceberg(
        spark, root,
        _rows(spark, [(1, "X", "p0")], "id long, v string, par string"),
        ["id"],
    )
    meta = json.load(open(os.path.join(root, "metadata", "v2.metadata.json")))
    unpart = [s for s in meta["partition-specs"] if not s["fields"]]
    assert len(unpart) == 1 and meta["default-spec-id"] != unpart[0]["spec-id"]
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, mlist = decode_avro_file(open(cur["manifest-list"], "rb").read())
    by_content = {m["content"]: m for m in mlist if m["added_snapshot_id"]
                  == meta["current-snapshot-id"]}
    assert by_content[1]["partition_spec_id"] == unpart[0]["spec-id"]
    assert by_content[0]["partition_spec_id"] == meta["default-spec-id"]
    # data manifest carries partition summaries (manifest skipping works)
    assert by_content[0]["partitions"] is not None
    # the delete manifest's entries decode with an EMPTY partition record
    _, entries = decode_avro_file(
        open(by_content[1]["manifest_path"], "rb").read()
    )
    assert entries[0]["data_file"]["partition"] == {}
    assert entries[0]["data_file"]["equality_ids"] == [1]
    # and a filtered read through our own reader still merges correctly
    cat = IcebergCatalog("t", root)
    assert [(r.id, r.v) for r in
            cat.to_dataframe(spark, "par = 'p0'").collect()] == [(1, "X")]


# --- expire_iceberg_snapshots + vacuum_iceberg ---------------------------------


def test_expire_and_vacuum_reclaim_overwritten_files(spark, tmp_path):
    """overwrite → old files referenced only by the old snapshot; expiring
    it and vacuuming (retention 0) deletes exactly those files + their
    manifests; the current snapshot keeps reading."""
    from buzz_rust_spark.sources.iceberg_writer import (
        expire_iceberg_snapshots,
        vacuum_iceberg,
    )

    root = str(tmp_path / "t")
    s1 = write_iceberg(_rows(spark, [(1,), (2,)], "id long"), root)
    write_iceberg(_rows(spark, [(9,)], "id long"), root, mode="overwrite")
    n_data_before = len(glob.glob(os.path.join(root, "data", "*.parquet")))

    # nothing is orphaned yet: both snapshots retained
    assert vacuum_iceberg(root, retention_hours=0, dry_run=True) == []

    s = expire_iceberg_snapshots(root, keep_last=1)
    assert s["expired_snapshots"] == [s1["snapshot_id"]]
    doomed = vacuum_iceberg(root, retention_hours=0, dry_run=True)
    assert doomed  # old data file + old manifest + old manifest list
    removed = vacuum_iceberg(root, retention_hours=0)
    assert sorted(removed) == sorted(doomed)
    assert len(glob.glob(os.path.join(root, "data", "*.parquet"))) < n_data_before

    cat = IcebergCatalog("t", root)
    assert [r.id for r in cat.to_dataframe(spark).collect()] == [9]
    assert len(cat.history()) == 1
    # time travel to the expired snapshot is now a typed error
    with pytest.raises(BuzzBadRequestError, match="not in table metadata"):
        IcebergCatalog("t", root, snapshot_id=s1["snapshot_id"])
    # expiring again: nothing to do
    assert expire_iceberg_snapshots(root, keep_last=1) is None


def test_vacuum_retention_protects_fresh_files(spark, tmp_path):
    """A fresh unreferenced file inside the retention window survives —
    the in-flight-commit protection."""
    from buzz_rust_spark.sources.iceberg_writer import vacuum_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1,)], "id long"), root)
    orphan = os.path.join(root, "data", "inflight.parquet")
    open(orphan, "wb").write(b"x")
    assert vacuum_iceberg(root, retention_hours=1) == []
    assert os.path.exists(orphan)
    assert vacuum_iceberg(root, retention_hours=0) == [orphan]
    assert not os.path.exists(orphan)


def test_expire_keeps_deletes_of_retained_snapshots(spark, tmp_path):
    """Expire + vacuum after a MOR delete: the delete file is referenced by
    the retained snapshot and must survive; the read stays MOR-correct."""
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        expire_iceberg_snapshots,
        vacuum_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.range(6).selectExpr("id"), root)
    delete_iceberg(spark, root, "id >= 4")
    expire_iceberg_snapshots(root, keep_last=1)
    vacuum_iceberg(root, retention_hours=0)
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == [0, 1, 2, 3]


def test_manifest_column_stats(spark, tmp_path):
    """Data-file manifest entries carry the spec's per-column stat maps
    (value_counts / null_value_counts / lower_bounds / upper_bounds as
    int-keyed k/v record lists) with correct single-value serialization —
    what external engines plan scans off.  Oversized string bounds and
    NaN float bounds are omitted (sound), never written wrong."""
    import math
    import struct

    from buzz_rust_spark.sources.avro import decode_avro_file

    root = str(tmp_path / "t")
    long_text = "z" * 500
    df = _rows(
        spark,
        [
            (3, "beta", 1.5, datetime.date(2024, 2, 1)),
            (1, None, float("nan"), datetime.date(2024, 1, 1)),
            (7, long_text, -2.25, None),
        ],
        "id long, name string, score double, day date",
    )
    write_iceberg(df.coalesce(1), root)

    meta = json.load(open(os.path.join(root, "metadata", "v1.metadata.json")))
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, mlist = decode_avro_file(open(cur["manifest-list"], "rb").read())
    _, entries = decode_avro_file(
        open(mlist[0]["manifest_path"], "rb").read()
    )
    dfile = entries[0]["data_file"]

    def as_map(field):
        return {kv["key"]: kv["value"] for kv in (dfile[field] or [])}

    # field ids: id=1, name=2, score=3, day=4
    assert as_map("value_counts") == {1: 3, 2: 3, 3: 3, 4: 3}
    assert as_map("null_value_counts") == {1: 0, 2: 1, 3: 0, 4: 1}
    lb, ub = as_map("lower_bounds"), as_map("upper_bounds")
    assert struct.unpack("<q", lb[1])[0] == 1
    assert struct.unpack("<q", ub[1])[0] == 7
    # string bounds: 'beta' is the only short non-null string candidate for
    # lower; the 500-char upper bound must be OMITTED, not truncated wrong
    assert lb[2] == b"beta" and 2 not in ub
    # date bounds as days-since-epoch ints
    assert struct.unpack("<i", lb[4])[0] == (
        datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)
    ).days
    assert struct.unpack("<i", ub[4])[0] == (
        datetime.date(2024, 2, 1) - datetime.date(1970, 1, 1)
    ).days
    # double bounds: never NaN bytes (either omitted or finite)
    for m in (lb, ub):
        if 3 in m:
            assert math.isfinite(struct.unpack("<d", m[3])[0])


def test_stats_across_appends_and_reads(spark, tmp_path):
    """Stats ride every write path (append + merge) without disturbing
    reads; a multi-file partitioned write records per-file bounds."""
    import struct

    from buzz_rust_spark.sources.avro import decode_avro_file
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "cast(id % 2 as string) as par")
    write_iceberg(df, root, partition_by=["par"])
    merge_iceberg(
        spark, root,
        _rows(spark, [(5, "1")], "id long, par string"), ["id"],
    )
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == list(range(100))

    meta_files = glob.glob(os.path.join(root, "metadata", "*-m0.avro"))
    seen_bounds = 0
    for mf in meta_files:
        _, entries = decode_avro_file(open(mf, "rb").read())
        for e in entries:
            lbs = {kv["key"]: kv["value"] for kv in (e["data_file"]["lower_bounds"] or [])}
            if 1 in lbs:
                seen_bounds += 1
                lo = struct.unpack("<q", lbs[1])[0]
                assert 0 <= lo < 100 or lo == 5
    assert seen_bounds >= 3  # two partition files + merge data + key file


# --- required-field nullability enforcement (spec compliance) ------------------


def test_required_field_rejects_null_append(spark, tmp_path):
    """A table created from a non-nullable column declares the field
    required; a later append from a (typical) nullable DataFrame holding a
    NULL must fail executor-side rather than write a spec-violating data
    file that external engines would misread."""
    import json as _json

    root = str(tmp_path / "t")
    write_iceberg(spark.range(3), root)  # spark.range: id non-nullable
    md = _json.loads(
        open(f"{root}/metadata/v1.metadata.json").read()
    )
    assert md["schemas"][0]["fields"][0]["required"] is True

    # nullable but null-free append: legitimate, must succeed
    write_iceberg(_rows(spark, [(7,)], "id long"), root, mode="append")
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [0, 1, 2, 7]

    with pytest.raises(Exception, match="required iceberg field 'id'"):
        write_iceberg(
            _rows(spark, [(9,), (None,)], "id long"), root, mode="append"
        )
    # the failed append committed nothing
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [0, 1, 2, 7]


def test_required_field_rejects_null_merge(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(2).selectExpr("id", "id + 10 AS v"), root
    )
    with pytest.raises(Exception, match="required iceberg field 'v'"):
        merge_iceberg(
            spark, root, _rows(spark, [(1, None)], "id long, v long"), ["id"]
        )
    assert sorted(
        (r.id, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [(0, 10), (1, 11)]


def test_merge_table_with_column_named_n(spark, tmp_path):
    """The duplicate-key probe's internal count alias must not collide with
    a user column literally named ``n``."""
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, 5)], "id long, n long"), root)
    merge_iceberg(spark, root, _rows(spark, [(1, 6), (2, 7)],
                                     "id long, n long"), ["id"])
    assert sorted(
        (r.id, r.n)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [(1, 6), (2, 7)]


def test_expiry_preserves_exactly_once_txn_markers(spark, tmp_path):
    """Snapshot expiry must not forget txn-app-id/txn-version: a streaming
    replay (restart from an old checkpoint) after the marker snapshot is
    expired would otherwise re-append and break the exactly-once contract."""
    from buzz_rust_spark.sources.iceberg_writer import expire_iceberg_snapshots

    root = str(tmp_path / "t")
    df1 = _rows(spark, [(1,)], "id long")
    write_iceberg(df1, root, txn_app_id="app", txn_version=0)
    write_iceberg(_rows(spark, [(2,)], "id long"), root, mode="append")
    # expire the txn-marked snapshot, keep only the newest (unmarked) one
    s = expire_iceberg_snapshots(root, keep_last=1)
    assert s and len(s["expired_snapshots"]) == 1
    # replay of the already-committed micro-batch: must be a no-op
    assert write_iceberg(
        df1, root, mode="append", txn_app_id="app", txn_version=0
    ) is None
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 2]
    # a genuinely NEW batch still commits
    assert write_iceberg(
        _rows(spark, [(3,)], "id long"), root, mode="append",
        txn_app_id="app", txn_version=1,
    ) is not None
    # a second expiry folds version 1 in on top of the stored version 0
    write_iceberg(_rows(spark, [(4,)], "id long"), root, mode="append")
    expire_iceberg_snapshots(root, keep_last=1)
    assert write_iceberg(
        df1, root, mode="append", txn_app_id="app", txn_version=1
    ) is None
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 2, 3, 4]


def test_delete_executor_written_multi_file_sorted(spark, tmp_path):
    """Position-delete files are executor-written: a delete spanning many
    data files may produce several delete files (one per task), each
    internally sorted by (file_path, pos) per the spec, all committed
    under one manifest — and the driver never materializes the matches."""
    import glob as _glob

    import pyarrow.parquet as pq

    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    root = str(tmp_path / "t")
    df = spark.range(200).selectExpr("id", "id % 10 AS bucket")
    write_iceberg(df, root, target_file_rows=20)  # 10 data files
    s = delete_iceberg(spark, root, "id % 2 = 0")
    assert s["deleted_rows"] == 100
    dels = _glob.glob(os.path.join(root, "data", "delete-*.parquet"))
    assert len(dels) >= 1
    total = 0
    for p in dels:
        t = pq.read_table(p)
        rows = list(zip(t.column("file_path").to_pylist(),
                        t.column("pos").to_pylist()))
        assert rows == sorted(rows), f"{p} not sorted by (file_path, pos)"
        # spec: both columns required
        assert not t.schema.field("file_path").nullable
        assert not t.schema.field("pos").nullable
        total += len(rows)
    assert total == 100
    got = sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [i for i in range(200) if i % 2 == 1]


def test_delete_max_rows_policy_error_leaves_no_orphans(spark, tmp_path):
    import glob as _glob

    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    root = str(tmp_path / "t")
    write_iceberg(spark.range(50).selectExpr("id"), root)
    with pytest.raises(Exception, match="max_delete_rows"):
        delete_iceberg(spark, root, "id >= 0", max_delete_rows=10)
    # nothing committed, no delete-file litter
    assert _glob.glob(os.path.join(root, "data", "delete-*.parquet")) == []
    assert IcebergCatalog("t", root).to_dataframe(spark).count() == 50


# --- writer-side schema evolution -----------------------------------------------


def test_evolve_add_column_reads_old_files_as_null(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import evolve_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    s = evolve_iceberg(root, add_columns={"score": "double"})
    assert s["schema_id"] == 1 and s["last_column_id"] == 3
    # the evolved table appends WITH the new column...
    write_iceberg(
        _rows(spark, [(2, "b", 0.5)], "id long, v string, score double"),
        root, mode="append",
    )
    got = {
        (r.id, r.v, r.score)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    }
    # ...and file A (written pre-evolution) reads the new column as NULL
    assert got == {(1, "a", None), (2, "b", 0.5)}
    # the OLD schema shape now mismatches
    from buzz_rust_spark.errors import BuzzSchemaError

    with pytest.raises(BuzzSchemaError):
        write_iceberg(_rows(spark, [(3, "c")], "id long, v string"),
                      root, mode="append")


def test_evolve_rename_is_id_preserving(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import evolve_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    evolve_iceberg(root, rename_columns={"v": "name"})
    # pre-rename file resolves by field id under the new name
    got = {(r.id, r.name)
           for r in IcebergCatalog("t", root).to_dataframe(spark).collect()}
    assert got == {(1, "a")}
    # appends use the new name
    write_iceberg(_rows(spark, [(2, "b")], "id long, name string"),
                  root, mode="append")
    got = {(r.id, r.name)
           for r in IcebergCatalog("t", root).to_dataframe(spark).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_evolve_rename_partition_source_column(spark, tmp_path):
    """Spec fields bind by source-id: renaming the partition source column
    via the API keeps pruning and appends working under the new name."""
    from buzz_rust_spark.sources.iceberg_writer import evolve_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "2020"), (2, "2021")],
                        "id long, y string"), root, partition_by=["y"])
    evolve_iceberg(root, rename_columns={"y": "yr"})
    write_iceberg(_rows(spark, [(3, "2021")], "id long, yr string"),
                  root, mode="append")
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["yr"]
    assert sorted(
        r.id for r in cat.to_dataframe(spark, "yr = '2021'").collect()
    ) == [2, 3]


def test_evolve_validation_errors(spark, tmp_path):
    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.iceberg_writer import evolve_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    with pytest.raises(BuzzBadRequestError, match="nothing to do"):
        evolve_iceberg(root)
    with pytest.raises(BuzzBadRequestError, match="already exists"):
        evolve_iceberg(root, add_columns={"v": "string"})
    with pytest.raises(BuzzBadRequestError, match="not supported"):
        evolve_iceberg(root, add_columns={"x": "map<string,int>"})
    with pytest.raises(BuzzBadRequestError, match="not in the table"):
        evolve_iceberg(root, rename_columns={"zzz": "q"})
    with pytest.raises(BuzzBadRequestError, match="collides"):
        evolve_iceberg(root, rename_columns={"v": "id"})
    # reusing a VACATED name under a NEW field id is refused: Spark's
    # field-id read falls back to NAME matching for ids missing from a
    # file, so old files would misresolve (verified against Spark 4)
    evolve_iceberg(root, rename_columns={"v": "w"})
    with pytest.raises(BuzzBadRequestError, match="historical"):
        evolve_iceberg(root, add_columns={"v": "long"})
    # reverting to the original name (SAME field id) is legal
    evolve_iceberg(root, rename_columns={"w": "v"})
    got = IcebergCatalog("t", root).to_dataframe(spark)
    assert set(got.columns) == {"id", "v"}
    assert [(r.id, r.v) for r in got.collect()] == [(1, "a")]


def test_metadata_retention_keeps_last_k(spark, tmp_path):
    """write.metadata.delete-after-commit.enabled + previous-versions-max:
    superseded v<N>.metadata.json beyond the last K are deleted on commit;
    the current version + version-hint always survive and the table keeps
    reading (snapshot history lives in the current metadata)."""
    import glob as _glob

    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(0,)], "id long"), root,
        properties={
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "2",
        },
    )
    for i in range(1, 6):
        write_iceberg(_rows(spark, [(i,)], "id long"), root, mode="append")
    metas = sorted(
        os.path.basename(p)
        for p in _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    # 6 commits → v6 current + previous v5, v4 retained (K=2)
    assert metas == ["v4.metadata.json", "v5.metadata.json", "v6.metadata.json"]
    assert open(os.path.join(root, "metadata", "version-hint.text")).read() == "6"
    cat = IcebergCatalog("t", root)
    assert sorted(r.id for r in cat.to_dataframe(spark).collect()) == list(range(6))
    # metadata-log is trimmed to the same bound
    import json as _json

    md = _json.loads(open(os.path.join(root, "metadata", "v6.metadata.json")).read())
    assert len(md["metadata-log"]) <= 2
    # all six snapshots stay time-travel readable from the current metadata
    assert len(cat.history()) == 6


def test_metadata_retention_off_by_default(spark, tmp_path):
    import glob as _glob

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(0,)], "id long"), root)
    for i in range(1, 4):
        write_iceberg(_rows(spark, [(i,)], "id long"), root, mode="append")
    metas = _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    assert len(metas) == 4  # nothing reclaimed without the property


# --- non-identity partition transform WRITES -----------------------------------


def test_write_day_transform_prunes(spark, tmp_path):
    """partition_by=["days(ts)"]: the writer computes day ordinals JVM-side,
    keeps them OUT of the data files, and writes manifests whose partition
    values + summaries drive the reader's transform pruning."""
    root = str(tmp_path / "t")
    df = _rows(
        spark,
        [(1, datetime.datetime(2021, 1, 1, 5)),
         (2, datetime.datetime(2021, 1, 1, 9)),
         (3, datetime.datetime(2021, 3, 15, 0))],
        "id long, ts timestamp_ntz",
    )
    s = write_iceberg(df, root, partition_by=["days(ts)"])
    assert s["added_records"] == 3
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["ts_day"]
    # the derived ordinal is NOT a data column
    full = cat.to_dataframe(spark)
    assert set(full.columns) == {"id", "ts"}
    assert full.count() == 3
    pruned = cat.to_dataframe(spark, "ts_day = '2021-01-01'")
    assert sorted(r.id for r in pruned.collect()) == [1, 2]
    assert len(cat.pruned_files(spark, "ts_day = '2021-01-01'")) == 1
    # appends accept the same (or omitted) canonical spec; mismatch refuses
    write_iceberg(
        _rows(spark, [(4, datetime.datetime(2021, 3, 15, 7))],
              "id long, ts timestamp_ntz"),
        root, mode="append", partition_by=["day(ts)"],
    )
    with pytest.raises(BuzzBadRequestError, match="does not match"):
        write_iceberg(
            _rows(spark, [(5, datetime.datetime(2021, 3, 15, 8))],
                  "id long, ts timestamp_ntz"),
            root, mode="append", partition_by=["hours(ts)"],
        )
    cat2 = IcebergCatalog("t", root)
    assert sorted(
        r.id for r in cat2.to_dataframe(spark, "ts_day = '2021-03-15'").collect()
    ) == [3, 4]


@pytest.mark.parametrize("entry,flt,keep", [
    ("year(ts)", "ts_year = '2021'", [1, 2]),
    ("months(ts)", "ts_month = '2022-02'", [3]),
    ("hour(ts)", "ts_hour = '2021-06-01 04'", [2]),
])
def test_write_time_transforms_prune(spark, tmp_path, entry, flt, keep):
    root = str(tmp_path / "t")
    df = _rows(
        spark,
        [(1, datetime.datetime(2021, 6, 1, 3)),
         (2, datetime.datetime(2021, 6, 1, 4)),
         (3, datetime.datetime(2022, 2, 9, 1))],
        "id long, ts timestamp_ntz",
    )
    write_iceberg(df, root, partition_by=[entry])
    cat = IcebergCatalog("t", root)
    assert sorted(
        r.id for r in cat.to_dataframe(spark, flt).collect()
    ) == keep
    assert cat.to_dataframe(spark).count() == 3


def test_write_truncate_transform(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "alpha"), (2, "alpine"), (3, "gamma")],
              "id long, w string"),
        root, partition_by=["truncate(3, w)"],
    )
    cat = IcebergCatalog("t", root)
    assert sorted(
        r.id for r in cat.to_dataframe(spark, "w_trunc = 'alp'").collect()
    ) == [1, 2]
    # int truncate: floored to the width
    root2 = str(tmp_path / "t2")
    write_iceberg(
        _rows(spark, [(1, -7), (2, 13), (3, 27)], "id long, v int"),
        root2, partition_by=["truncate(10, v)"],
    )
    cat2 = IcebergCatalog("t", root2)
    # -7 floors to -10 (spec: truncate uses floored mod)
    assert sorted(
        r.id for r in cat2.to_dataframe(spark, "v_trunc = '-10'").collect()
    ) == [1]
    assert sorted(
        r.id for r in cat2.to_dataframe(spark, "v_trunc = '10'").collect()
    ) == [2]


def test_write_bucket_transform_round_trip(spark, tmp_path):
    """bucket(8, id): writer ordinals use the spec murmur3 (shared with the
    reader), so the reader's bucket pruning finds exactly the right files
    — including the spec vector long 34."""
    from buzz_rust_spark.sources.iceberg import _bucket_ordinal

    root = str(tmp_path / "t")
    df = _rows(spark, [(34, "a"), (35, "b"), (99, "c")], "id long, v string")
    write_iceberg(df, root, partition_by=["bucket(8, id)"])
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["__bucket_id"]
    got = cat.to_dataframe(spark, "id = 34")
    assert {(r.id, r.v) for r in got.collect()} >= {(34, "a")}
    # pruning reads only the matching bucket's file(s)
    want_ord = _bucket_ordinal("34", False, "long", 8)
    import json as _json

    md = _json.loads(open(
        os.path.join(root, "metadata", "v1.metadata.json")).read())
    assert md["partition-specs"][0]["fields"][0]["transform"] == "bucket[8]"
    kept = cat.pruned_files(spark, "id = 34")
    assert 1 <= len(kept) < 3
    # string bucket round-trips too; partition_filter selects FILES, so
    # same-bucket neighbors may ride along — assert pruning kept exactly
    # the files of b's bucket and the match is present
    root2 = str(tmp_path / "t2")
    write_iceberg(df, root2, partition_by=["bucket(4, v)"])
    cat2 = IcebergCatalog("t", root2)
    got = {r.id for r in cat2.to_dataframe(spark, "v = 'b'").collect()}
    assert 35 in got
    ord_b = _bucket_ordinal("b", True, "string", 4)
    same_bucket = {
        i for i, x in ((34, "a"), (35, "b"), (99, "c"))
        if _bucket_ordinal(x, True, "string", 4) == ord_b
    }
    assert got == same_bucket


def test_write_transform_merge_and_rewrite(spark, tmp_path):
    """merge/rewrite work on transform-partitioned tables end-to-end (the
    CDC shape over a day-partitioned table — the realistic 100 TB layout)."""
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        rewrite_iceberg,
    )

    root = str(tmp_path / "t")
    df = _rows(
        spark,
        [(1, datetime.datetime(2021, 1, 1), 10),
         (2, datetime.datetime(2021, 1, 2), 20)],
        "id long, ts timestamp_ntz, v long",
    )
    write_iceberg(df, root, partition_by=["days(ts)"])
    merge_iceberg(
        spark, root,
        _rows(spark, [(2, datetime.datetime(2021, 1, 2), 200),
                      (3, datetime.datetime(2021, 1, 3), 30)],
              "id long, ts timestamp_ntz, v long"),
        ["id"],
    )
    assert {
        (r.id, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    } == {(1, 10), (2, 200), (3, 30)}
    rewrite_iceberg(spark, root)
    cat = IcebergCatalog("t", root)
    assert {
        (r.id, r.v) for r in cat.to_dataframe(spark).collect()
    } == {(1, 10), (2, 200), (3, 30)}
    assert sorted(
        r.id for r in cat.to_dataframe(spark, "ts_day = '2021-01-02'").collect()
    ) == [2]


def test_write_transform_null_source_values(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _rows(
        spark,
        [(1, datetime.datetime(2021, 1, 1)), (2, None)],
        "id long, ts timestamp_ntz",
    )
    write_iceberg(df, root, partition_by=["days(ts)"])
    cat = IcebergCatalog("t", root)
    assert cat.to_dataframe(spark).count() == 2
    assert [r.id for r in
            cat.to_dataframe(spark, "ts_day = '2021-01-01'").collect()] == [1]


# --- round-7 review regressions -------------------------------------------------


def test_evolve_duplicate_rename_targets_refused(spark, tmp_path):
    """Two renames to the same target would commit a duplicate-name schema
    — typed refusal on both formats."""
    from buzz_rust_spark.sources.delta_writer import evolve_delta, write_delta
    from buzz_rust_spark.sources.iceberg_writer import evolve_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a", "b")], "id long, x string, y string"),
                  root)
    with pytest.raises(BuzzBadRequestError, match="same new name"):
        evolve_iceberg(root, rename_columns={"x": "c", "y": "c"})
    d = str(tmp_path / "d")
    write_delta(_rows(spark, [(1, "a", "b")], "id long, x string, y string"), d)
    with pytest.raises(BuzzBadRequestError, match="same new name"):
        evolve_delta(d, rename_columns={"x": "c", "y": "c"})


def test_bucket_timestamp_microsecond_exactness():
    """Integer micros arithmetic: the float-seconds path lost microseconds
    past ~2^53 µs (~2255 AD is fine but sub-µs drift begins ~2112); the
    repro from review: 2170177477s + 412461µs."""
    import datetime as dt

    from buzz_rust_spark.sources.iceberg import _bucket_ordinal, _murmur3_32

    t = dt.datetime(1970, 1, 1) + dt.timedelta(
        seconds=2170177477, microseconds=412461
    )
    micros = 2170177477 * 1_000_000 + 412461
    want = (_murmur3_32(micros.to_bytes(8, "little", signed=True))
            & 0x7FFFFFFF) % 1024
    assert _bucket_ordinal(t.isoformat(), True, "timestamp", 1024) == want
    # tz-offset literals normalize to the stored UTC instant, not a crash
    assert _bucket_ordinal(
        "2017-11-16T22:31:08+00:00", True, "timestamptz", 16
    ) == _bucket_ordinal("2017-11-16T22:31:08", True, "timestamptz", 16)
    assert _bucket_ordinal(
        "2017-11-16T23:31:08+01:00", True, "timestamptz", 16
    ) == _bucket_ordinal("2017-11-16T22:31:08", True, "timestamptz", 16)


def test_bucket_write_nullable_long_past_2_53(spark, tmp_path):
    """A nullable long column forces a float64 pandas series; snowflake-
    scale ids (>2^53) must still land in the spec bucket — the UDF reads
    the value through a string cast, so no float corruption."""
    from buzz_rust_spark.sources.iceberg import _bucket_ordinal

    big = 9007199254740993  # 2^53 + 1
    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(big, "a"), (None, "n")], "id long, v string"),
        root, partition_by=["bucket(8, id)"],
    )
    cat = IcebergCatalog("t", root)
    got = {r.v for r in cat.to_dataframe(spark, f"id = {big}").collect()}
    assert "a" in got
    # the manifest ordinal equals the reader's filter-time ordinal
    md = json.load(open(os.path.join(root, "metadata", "v1.metadata.json")))
    assert md["partition-specs"][0]["fields"][0]["transform"] == "bucket[8]"
    want = _bucket_ordinal(str(big), False, "long", 8)
    kept = cat.pruned_files(spark, f"id = {big}")
    assert len(kept) >= 1


def test_duplicate_transform_base_names_get_distinct_fields(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "alpha"), (2, "gamma")], "id long, w string"),
        root, partition_by=["truncate(2, w)", "truncate(4, w)"],
    )
    md = json.load(open(os.path.join(root, "metadata", "v1.metadata.json")))
    names = [f["name"] for f in md["partition-specs"][0]["fields"]]
    assert len(set(names)) == 2, names
    cat = IcebergCatalog("t", root)
    assert cat.to_dataframe(spark).count() == 2
    assert [r.id for r in
            cat.to_dataframe(spark, "w_trunc = 'al'").collect()] == [1]


def test_zero_transform_params_refused(spark, tmp_path):
    for entry in ("bucket(0, id)", "truncate(0, id)"):
        with pytest.raises(BuzzBadRequestError, match=">= 1"):
            write_iceberg(_rows(spark, [(1,)], "id long"),
                          str(tmp_path / "t"), partition_by=[entry])


def test_evolve_drop_column(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import evolve_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a", 0.5)], "id long, v string, s double"),
                  root)
    evolve_iceberg(root, drop_columns=["s"])
    cat = IcebergCatalog("t", root)
    assert set(cat.schema.fieldNames()) == {"id", "v"}
    # old files (which still CONTAIN s) read fine without it
    assert [(r.id, r.v) for r in cat.to_dataframe(spark).collect()] == [(1, "a")]
    # appends use the narrowed schema
    write_iceberg(_rows(spark, [(2, "b")], "id long, v string"), root,
                  mode="append")
    assert sorted(
        (r.id, r.v) for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [(1, "a"), (2, "b")]
    # refusals
    from buzz_rust_spark.errors import BuzzBadRequestError

    with pytest.raises(BuzzBadRequestError, match="not in the table"):
        evolve_iceberg(root, drop_columns=["zzz"])
    with pytest.raises(BuzzBadRequestError, match="one operation"):
        evolve_iceberg(root, drop_columns=["v"], rename_columns={"v": "w"})
    p = str(tmp_path / "p")
    write_iceberg(_rows(spark, [(1, "x")], "id long, par string"), p,
                  partition_by=["par"])
    with pytest.raises(BuzzBadRequestError, match="partition source"):
        evolve_iceberg(p, drop_columns=["par"])


def test_set_iceberg_properties_enables_retention(spark, tmp_path):
    """Properties become settable on EXISTING tables — the path to turning
    on metadata retention or a name mapping after creation."""
    import glob as _glob

    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.iceberg_writer import set_iceberg_properties

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(0,)], "id long"), root)
    s = set_iceberg_properties(root, {
        "write.metadata.delete-after-commit.enabled": "true",
        "write.metadata.previous-versions-max": "2",
    })
    assert s["metadata_version"] == 2
    for i in range(1, 5):
        write_iceberg(_rows(spark, [(i,)], "id long"), root, mode="append")
    metas = sorted(
        os.path.basename(p)
        for p in _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    assert metas == ["v4.metadata.json", "v5.metadata.json", "v6.metadata.json"]
    # unset turns cleanup back off: v7 (unset) and v8 (append) accumulate
    # and v4 survives
    set_iceberg_properties(
        root, unset=["write.metadata.delete-after-commit.enabled"]
    )
    write_iceberg(_rows(spark, [(9,)], "id long"), root, mode="append")
    metas = sorted(
        os.path.basename(p)
        for p in _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    assert metas == [f"v{i}.metadata.json" for i in (4, 5, 6, 7, 8)]
    # txn markers are guarded
    with pytest.raises(BuzzBadRequestError, match="transaction markers"):
        set_iceberg_properties(root, {"buzz.txn.app": "5"})
    with pytest.raises(BuzzBadRequestError, match="nothing to do"):
        set_iceberg_properties(root)
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [0, 1, 2, 3, 4, 9]


def test_delete_over_equality_delete_table(spark, tmp_path):
    """Predicate DELETE over a CDC table (merge_iceberg history with
    equality deletes): the predicate evaluates against the MOR-resolved
    scan, the read-back matches a relational recompute, and a re-insert
    after the delete survives (sequence scoping stays sound)."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(i, 0) for i in range(5)], "id long, v long"),
        root,
    )
    # N upsert commits — relational model: dict update per commit
    state = {i: 0 for i in range(5)}
    for c in range(1, 8):
        k = c % 5
        merge_iceberg(
            spark, root,
            spark.createDataFrame([(k, c * 10)], "id long, v long"),
            key_cols=["id"],
        )
        state[k] = c * 10
    out = delete_iceberg(spark, root, "v >= 30")
    expect = {k: v for k, v in state.items() if v < 30}
    assert out is not None and out["deleted_rows"] == 5 - len(expect)
    got = sorted(
        (r.id, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == sorted(expect.items())
    # a deleted key re-inserted by a later merge survives
    gone = next(k for k in state if k not in expect)
    merge_iceberg(
        spark, root,
        spark.createDataFrame([(gone, 999)], "id long, v long"),
        key_cols=["id"],
    )
    expect[gone] = 999
    got = sorted(
        (r.id, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == sorted(expect.items())
    # and a second delete that only matches already-deleted rows is a no-op
    assert delete_iceberg(spark, root, "v >= 30 AND v < 999") is None


def test_evolve_promote_type_widening(spark, tmp_path):
    """int→long / float→double / decimal precision growth are id-preserving
    metadata-only promotions: old files' narrower physical values read back
    widened next to new files' wide values; illegal promotions refuse."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1, 10, 1.5)], "id long, n int, x float"),
        root,
    )
    out = evolve_iceberg(
        root, promote_columns={"n": "long", "x": "double"}
    )
    assert out["schema_id"] == 1
    # append with the WIDE schema
    write_iceberg(
        spark.createDataFrame(
            [(2, 2**40, 2.5)], "id long, n long, x double"
        ),
        root, mode="append",
    )
    cat = IcebergCatalog("t", root)
    assert [
        (f.name, f.dataType.simpleString()) for f in cat._scan_schema.fields
    ] == [("id", "bigint"), ("n", "bigint"), ("x", "double")]
    got = sorted((r.id, r.n, float(r.x)) for r in cat.to_dataframe(spark).collect())
    assert got == [(1, 10, 1.5), (2, 2**40, 2.5)]
    # decimal precision growth
    root2 = str(tmp_path / "t2")
    spark.sql("select 1 as id, cast(1.25 as decimal(5,2)) as d").createOrReplaceTempView("v")
    write_iceberg(spark.table("v").selectExpr("cast(id as long) id", "d"), root2)
    evolve_iceberg(root2, promote_columns={"d": "decimal(12,2)"})
    got = [(r.id, str(r.d)) for r in IcebergCatalog("t", root2).to_dataframe(spark).collect()]
    assert got == [(1, "1.25")]
    # illegal promotions are typed refusals
    from buzz_rust_spark.errors import BuzzBadRequestError

    for bad in [
        {"n": "int"},            # already long (narrowing/no-op)
        {"id": "double"},        # long→double not in the spec table
        {"d_missing": "long"},   # unknown column
    ]:
        with pytest.raises(BuzzBadRequestError):
            evolve_iceberg(root, promote_columns=bad)
    with pytest.raises(BuzzBadRequestError, match="scale"):
        evolve_iceberg(root2, promote_columns={"d": "decimal(14,4)"})


def test_evolve_promote_partition_source_refused(spark, tmp_path):
    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1, 5)], "id long, b int"),
        root, partition_by=["b"],
    )
    with pytest.raises(BuzzBadRequestError, match="partition source"):
        evolve_iceberg(root, promote_columns={"b": "long"})


def test_partition_scoped_delete_manifests(spark, tmp_path):
    """On a day-partitioned table, delete_iceberg writes one delete file
    per partition and commits the manifest under the LIVE spec with real
    tuples — a partition-filtered read of another day NEVER opens the
    delete file (ghost-file proof), while the matching day applies it."""
    import datetime
    import glob as _glob

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, datetime.datetime(2021, 1, 1 + i % 3), i) for i in range(6)],
        "id long, ts timestamp_ntz, v long",
    )
    write_iceberg(df, root, partition_by=["days(ts)"])
    out = delete_iceberg(spark, root, "id = 0")  # one row, day 2021-01-01
    assert out["deleted_rows"] == 1
    dels = _glob.glob(os.path.join(root, "data", "delete-*.parquet"))
    assert len(dels) == 1
    os.rename(dels[0], dels[0] + ".hidden")  # ghost: opening it fails
    cat = IcebergCatalog("t", root)
    # other-day read prunes the delete manifest — never opens the ghost
    assert sorted(
        r.id for r in cat.to_dataframe(spark, "ts_day = '2021-01-02'").collect()
    ) == [1, 4]
    # the matching day must try to open it and fail loudly, not silently
    # resurrect the deleted row
    with pytest.raises(Exception):
        IcebergCatalog("t", root).to_dataframe(
            spark, "ts_day = '2021-01-01'"
        ).collect()
    # restore: full read applies the delete
    os.rename(dels[0] + ".hidden", dels[0])
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 2, 3, 4, 5]


def test_partition_scoped_merge_eq_deletes(spark, tmp_path):
    """merge_iceberg with partition sources ⊆ merge keys scopes the
    eq-delete manifest to the touched partitions under the live spec —
    untouched days' filtered reads never open the key files; merges whose
    keys do NOT cover the partition source stay on the global form."""
    import datetime
    import glob as _glob
    import json as _json

    from buzz_rust_spark.sources.avro import decode_avro_file
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, datetime.datetime(2021, 1, 1 + i % 3), i) for i in range(6)],
        "id long, ts timestamp_ntz, v long",
    )
    write_iceberg(df, root, partition_by=["days(ts)"])
    merge_iceberg(
        spark, root,
        spark.createDataFrame(
            [(0, datetime.datetime(2021, 1, 1), 100)],
            "id long, ts timestamp_ntz, v long",
        ),
        key_cols=["id", "ts"],
    )
    meta = _json.load(open(sorted(
        _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]))
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mls = decode_avro_file(open(snap["manifest-list"], "rb").read())
    del_recs = [m for m in mls if int(m.get("content") or 0) == 1]
    assert [m["partition_spec_id"] for m in del_recs] == [
        meta["default-spec-id"]
    ]
    _, entries = decode_avro_file(
        open(del_recs[0]["manifest_path"], "rb").read()
    )
    assert all(
        e["data_file"]["partition"].get("ts_day") is not None
        for e in entries
    )
    key_paths = [e["data_file"]["file_path"] for e in entries]
    for p in key_paths:
        os.rename(p, p + ".hidden")
    # untouched day prunes the eq-delete manifest entirely
    assert sorted(
        r.id
        for r in IcebergCatalog("t", root)
        .to_dataframe(spark, "ts_day = '2021-01-02'")
        .collect()
    ) == [1, 4]
    for p in key_paths:
        os.rename(p + ".hidden", p)
    assert sorted(
        (r.id, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [(0, 100), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5)]

    # keys NOT covering the partition source → global (unpartitioned) form
    root2 = str(tmp_path / "t2")
    write_iceberg(df, root2, partition_by=["days(ts)"])
    merge_iceberg(
        spark, root2,
        spark.createDataFrame(
            [(0, datetime.datetime(2021, 1, 1), 100)],
            "id long, ts timestamp_ntz, v long",
        ),
        key_cols=["id"],
    )
    meta2 = _json.load(open(sorted(
        _glob.glob(os.path.join(root2, "metadata", "v*.metadata.json"))
    )[-1]))
    snap2 = next(
        s for s in meta2["snapshots"]
        if s["snapshot-id"] == meta2["current-snapshot-id"]
    )
    _, mls2 = decode_avro_file(open(snap2["manifest-list"], "rb").read())
    del2 = [m for m in mls2 if int(m.get("content") or 0) == 1]
    unpart = next(
        s["spec-id"] for s in meta2["partition-specs"] if not s["fields"]
    )
    assert [m["partition_spec_id"] for m in del2] == [unpart]


def test_vectorized_bucket_hash_matches_scalar():
    """The numpy murmur3 path is bit-identical to the scalar spec-pinned
    one across the full int64 domain sample + the spec Appendix B vector."""
    import random

    import numpy as np

    from buzz_rust_spark.sources.iceberg import _murmur3_32
    from buzz_rust_spark.sources.iceberg_writer import _murmur3_32_8le

    rng = random.Random(7)
    vals = [34, 0, -1, 1, 2**63 - 1, -(2**63)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(500)
    ]
    got = _murmur3_32_8le(np.array(vals, dtype=np.int64))
    for v, hv in zip(vals, got):
        assert int(hv) == (
            _murmur3_32(int(v).to_bytes(8, "little", signed=True))
            & 0xFFFFFFFF
        )
    # spec Appendix B: bucket hash of long 34 is 2017239379
    assert int(_murmur3_32_8le(np.array([34], dtype=np.int64))[0]) == 2017239379


def test_vectorized_bucket_udf_date_timestamp(spark, tmp_path):
    """bucket over date/timestamp/long sources routes through the numpy
    path and still lands rows in the buckets the reader's pruning expects
    (writer/filter ordinal agreement), nulls included."""
    import datetime

    from buzz_rust_spark.sources.iceberg import IcebergCatalog, _bucket_ordinal
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    root = str(tmp_path / "t")
    rows = [
        (1, datetime.date(2021, 3, 15)),
        (2, datetime.date(1969, 12, 31)),
        (3, None),
    ]
    write_iceberg(
        spark.createDataFrame(rows, "id long, d date"),
        root, partition_by=["bucket(8, d)"],
    )
    cat = IcebergCatalog("t", root)
    got = {r.id for r in cat.to_dataframe(spark, "d = '2021-03-15'").collect()}
    assert 1 in got
    want = _bucket_ordinal("2021-03-15", True, "date", 8)
    same = {
        i for i, d in rows
        if d is not None
        and _bucket_ordinal(d.isoformat(), True, "date", 8) == want
    }
    assert got == same
    assert cat.to_dataframe(spark).count() == 3  # null row survives

    root2 = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame(
            [(1, datetime.datetime(2021, 3, 15, 8, 30, 0, 123456)),
             (2, datetime.datetime(1999, 1, 1))],
            "id long, ts timestamp_ntz",
        ),
        root2, partition_by=["bucket(16, ts)"],
    )
    got = {
        r.id
        for r in IcebergCatalog("t", root2)
        .to_dataframe(spark, "ts = '2021-03-15 08:30:00.123456'")
        .collect()
    }
    assert 1 in got


def test_partial_rewrite_compacts_only_selected_partition(spark, tmp_path):
    """rewrite_iceberg(partition_filter=...) rewrites ONLY the selected
    day: untouched days keep their original file paths (no read, no
    write), the day's position-delete file leaves the snapshot, carried
    equality deletes still apply to untouched files, and time travel to
    the basis stays exact."""
    import datetime
    import glob as _glob

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        rewrite_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, datetime.datetime(2021, 1, 1 + i % 3), i) for i in range(9)],
        "id long, ts timestamp_ntz, v long",
    )
    write_iceberg(df, root, partition_by=["days(ts)"])
    # CDC: upsert touches day-1 AND day-2 keys (eq deletes are global)
    merge_iceberg(
        spark, root,
        spark.createDataFrame(
            [(0, datetime.datetime(2021, 1, 1), 100),
             (1, datetime.datetime(2021, 1, 2), 111)],
            "id long, ts timestamp_ntz, v long",
        ),
        key_cols=["id", "ts"],
    )
    basis = IcebergCatalog("t", root).history()[-1]["snapshot_id"]
    delete_iceberg(spark, root, "id = 3")  # day-1 position delete

    cat0 = IcebergCatalog("t", root)
    plan0 = cat0._plan(spark, None)
    day1 = {f.key for f in cat0.pruned_files(spark, "ts_day = '2021-01-01'")}
    untouched_before = {
        f.key for f in plan0["files"] if f.key not in day1
    }

    out = rewrite_iceberg(spark, root, partition_filter="ts_day = '2021-01-01'")
    assert out is not None and out["operation"] == "replace"
    assert out["removed_delete_files"] == 1  # day-1 pos-delete dropped

    cat = IcebergCatalog("t", root)
    got = sorted((r.id, r.v) for r in cat.to_dataframe(spark).collect())
    assert got == [
        (0, 100), (1, 111), (2, 2), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8),
    ]
    plan = cat._plan(spark, None)
    live_keys = {f.key for f in plan["files"]}
    # untouched files carried verbatim (same paths); day-1 files replaced
    assert untouched_before <= live_keys
    assert not (day1 & live_keys)
    # the eq delete carried forward and STILL kills the untouched day-2
    # pre-merge row (1, 1) — the merge's (1, 111) survives
    # the scoped merge wrote one eq key file per touched day; both carry
    assert {d["kind"] for d in plan["deletes"]} == {"eq"}
    assert sorted(
        (r.id, r.v)
        for r in cat.to_dataframe(spark, "ts_day = '2021-01-02'").collect()
    ) == [(1, 111), (4, 4), (7, 7)]
    # time travel to the basis (pre-delete) stays MOR-exact
    tt = sorted(
        (r.id, r.v)
        for r in IcebergCatalog("t", root, snapshot_id=basis)
        .to_dataframe(spark)
        .collect()
    )
    assert tt == [(0, 100), (1, 111)] + [(i, i) for i in range(2, 9)]
    # compacting a day whose rows were ALL deleted drops its files with
    # no replacement
    delete_iceberg(spark, root, "id IN (2, 5, 8)")  # all of day 3
    out2 = rewrite_iceberg(
        spark, root, partition_filter="ts_day = '2021-01-03'"
    )
    assert out2 is not None and out2["added_files"] == 0
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [0, 1, 4, 6, 7]


def test_partial_rewrite_commutes_with_append_aborts_on_delete(spark, tmp_path):
    import datetime

    from buzz_rust_spark.errors import BuzzCommitAbortedError
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        rewrite_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.write_store import LocalCommitStore

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.datetime(2021, 1, 1)), (2, datetime.datetime(2021, 1, 2))],
        "id long, ts timestamp_ntz",
    )
    write_iceberg(df, root, partition_by=["days(ts)"])
    store = LocalCommitStore()
    fired = {}

    def seam(path):
        if not fired:
            fired["x"] = 1
            write_iceberg(
                spark.createDataFrame(
                    [(9, datetime.datetime(2021, 1, 1))],
                    "id long, ts timestamp_ntz",
                ),
                root, mode="append",
            )

    store.before_claim = seam
    # round-9 semantics: a concurrent PURE APPEND commutes — its manifests
    # carry into the replace (even when it lands in the compacted
    # partition: appended files were never in the rewrite's read set)
    out = rewrite_iceberg(
        spark, root, partition_filter="ts_day = '2021-01-01'", store=store
    )
    assert out is not None and out["operation"] == "replace"
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 2, 9]

    # a concurrent DELETE still aborts (typed): its position deletes
    # reference files the rewritten rows would escape
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    store2 = LocalCommitStore()
    fired2 = {}

    def seam2(path):
        if not fired2:
            fired2["x"] = 1
            delete_iceberg(spark, root, "id = 2")

    store2.before_claim = seam2
    with pytest.raises(BuzzCommitAbortedError):
        rewrite_iceberg(
            spark, root, partition_filter="ts_day = '2021-01-01'",
            store=store2,
        )
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 9]


def test_rollback_and_tags(spark, tmp_path):
    """rollback_iceberg sets current back (metadata-only; later snapshots
    stay in history, appends fork from the restored state); tags pin
    snapshots readable via IcebergCatalog(ref=...); main is protected."""
    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        rollback_iceberg,
        tag_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), root)
    s1 = IcebergCatalog("t", root).history()[-1]["snapshot_id"]
    tag_iceberg(root, "v1-audit")
    write_iceberg(spark.createDataFrame([(2,)], "id long"), root, mode="append")
    delete_iceberg(spark, root, "id = 1")
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [2]
    # tag read pins the old snapshot through the MOR history
    assert sorted(
        r.id
        for r in IcebergCatalog("t", root, ref="v1-audit")
        .to_dataframe(spark)
        .collect()
    ) == [1]
    rollback_iceberg(root, s1)
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1]
    write_iceberg(spark.createDataFrame([(9,)], "id long"), root, mode="append")
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 9]
    # guards
    with pytest.raises(BuzzBadRequestError, match="not in table history"):
        rollback_iceberg(root, 123456)
    with pytest.raises(BuzzBadRequestError, match="main"):
        tag_iceberg(root, "main")
    with pytest.raises(BuzzBadRequestError, match="not in table refs"):
        IcebergCatalog("t", root, ref="nope")
    with pytest.raises(BuzzBadRequestError, match="not both"):
        IcebergCatalog("t", root, ref="v1-audit", snapshot_id=s1)


def test_rollback_fork_safety(spark, tmp_path):
    """After a rollback, the changelog window walks the ANCESTOR CHAIN:
    abandoned snapshots are never replayed, a cursor pointing into the
    fork is the typed re-bootstrap error, and tag-pinned snapshots
    survive expiry with their files intact."""
    from buzz_rust_spark.errors import BuzzExecutionError
    from buzz_rust_spark.sources.iceberg import (
        IcebergCatalog,
        read_iceberg_changelog,
        read_iceberg_changes,
    )
    from buzz_rust_spark.sources.iceberg_writer import (
        expire_iceberg_snapshots,
        rollback_iceberg,
        tag_iceberg,
        vacuum_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), root)
    s1 = IcebergCatalog("t", root).resolved_snapshot_id
    write_iceberg(spark.createDataFrame([(2,)], "id long"), root, mode="append")
    s2 = IcebergCatalog("t", root).resolved_snapshot_id
    rollback_iceberg(root, s1)
    # window defaulting to CURRENT is empty — the abandoned s2 is not
    # replayed as a change
    assert read_iceberg_changelog(spark, root, s1).count() == 0
    # a fork commit: (s1, current] contains ONLY the fork's rows
    write_iceberg(spark.createDataFrame([(9,)], "id long"), root, mode="append")
    got = sorted(
        (r.id, r._change_type)
        for r in read_iceberg_changelog(spark, root, s1).collect()
    )
    assert got == [(9, "insert")]
    # a cursor pointing INTO the abandoned fork is the typed error
    with pytest.raises(BuzzExecutionError, match="not an ancestor"):
        read_iceberg_changes(spark, root, s2).count()
    with pytest.raises(BuzzExecutionError, match="not an ancestor"):
        read_iceberg_changelog(spark, root, s2).count()

    # tag pinning vs expiry: the tagged snapshot and its files survive
    tag_iceberg(root, "audit", snapshot_id=s1)
    out = expire_iceberg_snapshots(root, keep_last=1)
    if out is not None:
        assert s1 in out["retained_snapshots"]
    vacuum_iceberg(root, retention_hours=0.0)
    assert sorted(
        r.id
        for r in IcebergCatalog("t", root, ref="audit")
        .to_dataframe(spark)
        .collect()
    ) == [1]


def test_matview_rebootstrap_after_source_rollback(spark, tmp_path):
    """A materialization whose cursor was orphaned by a source rollback
    gets the typed re-bootstrap error, never silently replayed forks."""
    from buzz_rust_spark.errors import BuzzExecutionError
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        rollback_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import refresh_materialization

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        spark.createDataFrame([(1, "a", 1.0)], "id long, g string, v double"),
        src,
    )
    s1 = IcebergCatalog("t", src).resolved_snapshot_id
    write_iceberg(
        spark.createDataFrame([(2, "a", 2.0)], "id long, g string, v double"),
        src, mode="append",
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"])  # cursor = s2
    rollback_iceberg(src, s1)
    write_iceberg(
        spark.createDataFrame([(3, "b", 3.0)], "id long, g string, v double"),
        src, mode="append",
    )
    with pytest.raises(BuzzExecutionError, match="not an ancestor"):
        refresh_materialization(spark, src, tgt, ["g"], ["v"])


def test_orphaned_cursor_without_fork_is_rebootstrap(spark, tmp_path):
    """A cursor orphaned by a rollback gets the typed RE-BOOTSTRAP error
    even when NO fork commit followed (the current sequence number sits
    below the cursor's) — not the inverted-window BadRequest."""
    from buzz_rust_spark.errors import BuzzExecutionError
    from buzz_rust_spark.sources.iceberg import (
        IcebergCatalog,
        read_iceberg_changelog,
    )
    from buzz_rust_spark.sources.iceberg_writer import (
        rollback_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), root)
    s1 = IcebergCatalog("t", root).resolved_snapshot_id
    write_iceberg(spark.createDataFrame([(2,)], "id long"), root, mode="append")
    s2 = IcebergCatalog("t", root).resolved_snapshot_id
    rollback_iceberg(root, s1)
    with pytest.raises(BuzzExecutionError, match="re-bootstrap"):
        read_iceberg_changelog(spark, root, s2)


def test_expire_drops_dangling_refs_keeps_pinned(spark, tmp_path):
    """A ref whose snapshot another engine already dropped from the
    metadata is cleaned by expiry; refs pinning PRESENT snapshots keep
    them alive."""
    import glob as _glob
    import json as _json

    from buzz_rust_spark.sources.iceberg_writer import (
        expire_iceberg_snapshots,
        tag_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), root)
    write_iceberg(spark.createDataFrame([(2,)], "id long"), root, mode="append")
    tag_iceberg(root, "keepme")
    # simulate another engine: a ref whose snapshot is gone from the list
    md_path = sorted(
        _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]
    md = _json.loads(open(md_path).read())
    md["refs"]["dangling"] = {"snapshot-id": 123456789, "type": "tag"}
    open(md_path, "w").write(_json.dumps(md))

    out = expire_iceberg_snapshots(root, keep_last=1)
    md2 = _json.loads(open(sorted(
        _glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]).read())
    assert "dangling" not in md2["refs"]
    assert "keepme" in md2["refs"]
    kept = {s["snapshot-id"] for s in md2["snapshots"]}
    assert md2["refs"]["keepme"]["snapshot-id"] in kept


# --- partition spec evolution (evolve_iceberg_partition_spec) ---------------------


def _spec_evo_table(spark, tmp_path):
    """Day-partitioned table with 3 days of rows, evolved to hour
    partitioning, then appended 2 more days of hour-partitioned rows —
    the canonical day→hour lifecycle snapshot mixing two specs."""
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg_partition_spec,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    old = [
        (i, datetime.datetime(2020, 1, 1 + i % 3, (i * 7) % 24), float(i))
        for i in range(12)
    ]
    write_iceberg(
        spark.createDataFrame(old, "id long, ts timestamp_ntz, v double"),
        root, partition_by=["days(ts)"],
    )
    out = evolve_iceberg_partition_spec(root, ["hours(ts)"])
    assert out["spec_id"] == 1
    new = [
        (100 + i, datetime.datetime(2020, 1, 4 + i % 2, (i * 5) % 24),
         float(i))
        for i in range(10)
    ]
    write_iceberg(
        spark.createDataFrame(new, "id long, ts timestamp_ntz, v double"),
        root, mode="append",
    )
    return root, old, new


def test_spec_evolution_day_to_hour_prunes_both_specs(spark, tmp_path):
    """The round-8 verdict's typed refusal is lifted: a partition-filtered
    read of an evolved-spec snapshot prunes files under BOTH specs — old
    day files by their recorded tuple, new hour files by the DERIVED day
    value (hour→day coarsening) — and matches a full-scan recompute."""
    root, old, new = _spec_evo_table(spark, tmp_path)
    cat = IcebergCatalog("t", root)
    assert cat.partition_cols == ["ts_hour", "ts_day"]

    # old-spec day: exactly that day's rows, new-spec files all pruned
    got = sorted(
        r.id
        for r in cat.to_dataframe(spark, "ts_day = '2020-01-02'").collect()
    )
    want = sorted(
        i for i, ts, _ in old if ts.date().isoformat() == "2020-01-02"
    )
    assert got == want and got
    # new-spec day via the DERIVED ts_day: exactly that day's rows
    got = sorted(
        r.id
        for r in cat.to_dataframe(spark, "ts_day = '2020-01-05'").collect()
    )
    want = sorted(
        i for i, ts, _ in new if ts.date().isoformat() == "2020-01-05"
    )
    assert got == want and got
    # a range crossing the evolution boundary
    got = sorted(
        r.id
        for r in cat.to_dataframe(
            spark, "ts_day >= '2020-01-03' AND ts_day <= '2020-01-04'"
        ).collect()
    )
    want = sorted(
        i
        for i, ts, _ in old + new
        if "2020-01-03" <= ts.date().isoformat() <= "2020-01-04"
    )
    assert got == want and got


def test_spec_evolution_file_and_manifest_pruning_shapes(spark, tmp_path):
    """Pruning is real, not a full-scan fallback: a day filter keeps only
    that day's files under both specs, and manifest SKIPPING proves
    new-spec manifests disjoint from an old-day filter via the coarsened
    hour→day summary bounds (no manifest decode for them)."""
    root, old, new = _spec_evo_table(spark, tmp_path)
    cat = IcebergCatalog("t", root)
    all_files = cat._plan(spark, None)["files"]
    kept = cat.pruned_files(spark, "ts_day = '2020-01-02'")
    assert 0 < len(kept) < len(all_files)
    # every kept file is genuinely a 2020-01-02 file (old spec day tuple —
    # new-spec files' derived day is 04/05, so none survive)
    for f in kept:
        assert f.partition_value("ts_day") == "2020-01-02"

    # manifest skipping: a fresh catalog (cold entry cache) planning the
    # old-day filter never decodes the NEW-spec manifests
    cold = IcebergCatalog("t", root)
    cold._plan(spark, "ts_day = '2020-01-02'")
    hour_manifests = [
        m["manifest_path"]
        for m in cold._manifests
        if int(m.get("partition_spec_id") or 0) == 1
    ]
    assert hour_manifests
    assert not any(p in cold._entries_cache for p in hour_manifests)

    # hour filter: old-spec files cannot answer it → kept conservatively,
    # new-spec files prune exactly (superset contract, compose row filter)
    some_hour = new[0][1].replace(minute=0)
    lit = some_hour.strftime("%Y-%m-%d %H")
    kept = cat.pruned_files(spark, f"ts_hour = '{lit}'")
    old_files = [
        f for f in all_files if not f.has_partition("ts_hour")
    ]
    assert {f.key for f in old_files} <= {f.key for f in kept}
    want = sorted(
        i for i, ts, _ in new if ts.strftime("%Y-%m-%d %H") == lit
    )
    got = sorted(
        r.id
        for r in cat.to_dataframe(spark, f"ts_hour = '{lit}'")
        .where(f"date_format(ts, 'yyyy-MM-dd HH') = '{lit}'")
        .collect()
    )
    assert got == want and got


def test_spec_evolution_field_reuse_and_guards(spark, tmp_path):
    """Spec rules: same transform+source reuses the historical field id and
    name; flipping back to an existing spec reuses its spec-id; the
    already-default case, unknown columns, bad transforms, and duplicate
    entries refuse typed."""
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg_partition_spec,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, datetime.datetime(2020, 1, 1), "x")],
            "id long, ts timestamp_ntz, name string",
        ),
        root, partition_by=["days(ts)"],
    )
    out = evolve_iceberg_partition_spec(root, ["days(ts)", "bucket(4, id)"])
    assert out["spec_id"] == 1
    # days(ts) reused its spec-0 field id/name; bucket got a fresh id
    by_name = {f["name"]: f for f in out["fields"]}
    assert by_name["ts_day"]["field-id"] == 1000
    assert by_name["id_bucket"]["field-id"] == 1001
    # back to the original spec: reuses spec-id 0, no new spec appended
    out = evolve_iceberg_partition_spec(root, ["days(ts)"])
    assert out["spec_id"] == 0
    meta = json.load(open(sorted(
        glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]))
    assert [s["spec-id"] for s in meta["partition-specs"]] == [0, 1]
    assert meta["default-spec-id"] == 0

    with pytest.raises(BuzzBadRequestError, match="already the table's"):
        evolve_iceberg_partition_spec(root, ["days(ts)"])
    with pytest.raises(BuzzBadRequestError, match="not in the table schema"):
        evolve_iceberg_partition_spec(root, ["days(nope)"])
    with pytest.raises(BuzzBadRequestError, match="does not accept"):
        evolve_iceberg_partition_spec(root, ["hours(id)"])
    with pytest.raises(BuzzBadRequestError, match="duplicate"):
        evolve_iceberg_partition_spec(root, ["id", "bucket(4, id)", "id"])


def test_spec_evolution_to_unpartitioned_and_rewrite_consolidates(
    spark, tmp_path
):
    """Evolving to [] (unpartitioned) keeps old files readable; a FULL
    rewrite then consolidates everything under the live spec, after which
    partition-scoped ops (partial rewrite) work again if re-evolved."""
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg_partition_spec,
        rewrite_iceberg,
        write_iceberg,
    )

    root, old, new = _spec_evo_table(spark, tmp_path)
    evolve_iceberg_partition_spec(root, [])
    write_iceberg(
        spark.createDataFrame(
            [(999, datetime.datetime(2021, 1, 1), 0.0)],
            "id long, ts timestamp_ntz, v double",
        ),
        root, mode="append",
    )
    cat = IcebergCatalog("t", root)
    assert cat.to_dataframe(spark).count() == len(old) + len(new) + 1
    # full rewrite: one spec again, filters prune exactly
    rewrite_iceberg(spark, root)
    evolve_iceberg_partition_spec(root, ["days(ts)"])
    write_iceberg(
        spark.createDataFrame(
            [(1000, datetime.datetime(2021, 1, 2), 0.0)],
            "id long, ts timestamp_ntz, v double",
        ),
        root, mode="append",
    )
    cat2 = IcebergCatalog("t", root)
    # the rewrite consolidated history under the UNPARTITIONED spec: those
    # files carry no ts_day to prune on → kept conservatively (superset);
    # the new day-spec file prunes exactly — compose the row filter
    got = sorted(
        r.id
        for r in cat2.to_dataframe(spark, "ts_day = '2021-01-02'")
        .where("to_date(ts) = '2021-01-02'")
        .collect()
    )
    assert got == [1000]
    # and the day-spec files themselves DID prune: a different-day filter
    # keeps the unpartitioned files but not the 2021-01-02 day file
    kept = cat2.pruned_files(spark, "ts_day = '2021-01-01'")
    day_files = [f for f in kept if f.has_partition("ts_day")]
    assert all(
        f.partition_value("ts_day") == "2021-01-01" for f in day_files
    )
    assert not any(
        f.partition_value("ts_day") == "2021-01-02"
        for f in kept
        if f.has_partition("ts_day")
    )


def test_spec_evolution_identity_derives_bucket_and_truncate(spark, tmp_path):
    """An identity-partitioned history derives ANY transform of the same
    source: after evolving identity(name)→truncate/bucket specs, filters
    on the new fields still prune the old identity files exactly."""
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg_partition_spec,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    rows = [(i, ["alpha", "beta", "gamma"][i % 3]) for i in range(9)]
    write_iceberg(
        spark.createDataFrame(rows, "id long, name string"),
        root, partition_by=["name"],
    )
    evolve_iceberg_partition_spec(root, ["truncate(2, name)"])
    write_iceberg(
        spark.createDataFrame([(50, "alnico")], "id long, name string"),
        root, mode="append",
    )
    cat = IcebergCatalog("t", root)
    # truncate-field filter: old identity files derive name_trunc
    got = sorted(
        r.id
        for r in cat.to_dataframe(spark, "name_trunc = 'al'").collect()
    )
    want = sorted(
        [i for i, n in rows if n.startswith("al")] + [50]
    )
    assert got == want
    # identity filter still prunes old files; new files keep (superset) —
    # compose the row filter for exactness
    got = sorted(
        r.id
        for r in cat.to_dataframe(spark, "name = 'beta'")
        .where("name = 'beta'")
        .collect()
    )
    assert got == sorted(i for i, n in rows if n == "beta")


# --- branch writes + write-audit-publish ------------------------------------------


def test_branch_write_audit_publish_lifecycle(spark, tmp_path):
    """WAP: append + merge + delete staged on a branch leave main's reads
    byte-identical; the branch read sees the staged state; fast-forward
    publishes main to the branch head; a second staging round on the same
    branch parents on the published head."""
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        fast_forward_iceberg,
        merge_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")

    def rows(cat_kwargs=None):
        return sorted(
            (r.id, r.v)
            for r in IcebergCatalog("t", root, **(cat_kwargs or {}))
            .to_dataframe(spark)
            .collect()
        )

    write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), root
    )
    write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        root, mode="append", branch="audit",
    )
    merge_iceberg(
        spark, root,
        spark.createDataFrame([(2, "B2")], "id long, v string").coalesce(1),
        key_cols=["id"], branch="audit",
    )
    out = delete_iceberg(spark, root, "id = 1", branch="audit")
    assert out is not None and out["deleted_rows"] == 1
    assert rows() == [(1, "a"), (2, "b")]  # main untouched
    assert rows({"ref": "audit"}) == [(2, "B2"), (3, "c")]
    # the staged snapshots never entered the snapshot-log (main history)
    import glob as g
    import json as j

    meta = j.load(open(sorted(
        g.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]))
    assert len(meta["snapshot-log"]) == 1  # only the create

    ff = fast_forward_iceberg(root, "audit")
    assert rows() == [(2, "B2"), (3, "c")]
    assert ff["current_snapshot"] == meta["refs"]["audit"]["snapshot-id"]
    # second round: the branch's next write parents on the published head
    write_iceberg(
        spark.createDataFrame([(4, "d")], "id long, v string"),
        root, mode="append", branch="audit",
    )
    assert rows() == [(2, "B2"), (3, "c")]
    assert rows({"ref": "audit"}) == [(2, "B2"), (3, "c"), (4, "d")]
    fast_forward_iceberg(root, "audit")
    assert rows() == [(2, "B2"), (3, "c"), (4, "d")]


def test_branch_write_guards(spark, tmp_path):
    """Typed refusals: branch write on a nonexistent table, writes to a
    TAG, fast-forward of an unknown ref, fast-forward when main diverged,
    and fast-forward when already published."""
    from buzz_rust_spark.sources.iceberg_writer import (
        fast_forward_iceberg,
        tag_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(BuzzBadRequestError, match="existing table"):
        write_iceberg(df, root, branch="b")
    write_iceberg(df, root)
    tag_iceberg(root, "v1", ref_type="tag")
    with pytest.raises(BuzzBadRequestError, match="TAG"):
        write_iceberg(
            spark.createDataFrame([(2,)], "id long"), root,
            mode="append", branch="v1",
        )
    with pytest.raises(BuzzBadRequestError, match="not in table refs"):
        fast_forward_iceberg(root, "nope")
    # stage a branch, then advance main → diverged → refuse
    write_iceberg(
        spark.createDataFrame([(2,)], "id long"), root,
        mode="append", branch="b",
    )
    write_iceberg(
        spark.createDataFrame([(3,)], "id long"), root, mode="append"
    )
    with pytest.raises(BuzzBadRequestError, match="not an ancestor"):
        fast_forward_iceberg(root, "b")
    # already-published: tag a branch at main's head and fast-forward
    tag_iceberg(root, "same", ref_type="branch")
    with pytest.raises(BuzzBadRequestError, match="already at"):
        fast_forward_iceberg(root, "same")


def test_cherry_pick_replays_append_onto_moved_main(spark, tmp_path):
    """Cherry-pick of a branch-staged APPEND after main advanced: the
    staged rows replay as a NEW snapshot parented on the current head
    (main keeps its own commits), the summary records the source
    snapshot, the changelog attributes the rows to the PUBLISH commit,
    and a second pick of the same snapshot refuses typed."""
    from buzz_rust_spark.sources.iceberg import read_iceberg_changes
    from buzz_rust_spark.sources.iceberg_writer import cherry_pick_iceberg

    root = str(tmp_path / "t")

    def rows(**kw):
        return sorted(
            (r.id, r.v)
            for r in IcebergCatalog("t", root, **kw)
            .to_dataframe(spark)
            .collect()
        )

    write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), root
    )
    staged = write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        root, mode="append", branch="audit",
    )
    # main advances past the staged snapshot's parent → fast-forward is
    # impossible, cherry-pick must REPLAY
    moved = write_iceberg(
        spark.createDataFrame([(4, "d")], "id long, v string"),
        root, mode="append",
    )
    out = cherry_pick_iceberg(root, staged["snapshot_id"])
    assert out["published"] == "replay"
    assert out["source_snapshot_id"] == staged["snapshot_id"]
    assert out["snapshot_id"] != staged["snapshot_id"]
    assert rows() == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]

    meta = json.load(open(sorted(
        glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]))
    pub = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == out["snapshot_id"]
    )
    assert pub["summary"]["source-snapshot-id"] == str(staged["snapshot_id"])
    assert pub["parent-snapshot-id"] == moved["snapshot_id"]

    # changelog: the published rows belong to the PUBLISH snapshot, not
    # the staged branch snapshot (entry snapshot ids were rewritten)
    ch = read_iceberg_changes(
        spark, root, from_snapshot_id=moved["snapshot_id"]
    ).collect()
    assert sorted((r.id, r._snapshot_id) for r in ch) == [
        (3, out["snapshot_id"])
    ]

    with pytest.raises(BuzzBadRequestError, match="already published"):
        cherry_pick_iceberg(root, staged["snapshot_id"])
    # a later equality-delete merge scopes over the replayed rows (they
    # sit at the PUBLISH sequence number, below the merge's)
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    merge_iceberg(
        spark, root,
        spark.createDataFrame([(3, "C2")], "id long, v string").coalesce(1),
        key_cols=["id"],
    )
    assert rows() == [(1, "a"), (2, "b"), (3, "C2"), (4, "d")]


def test_cherry_pick_fast_forward_and_refusals(spark, tmp_path):
    """Cherry-pick when main has NOT moved fast-forwards to the picked
    snapshot itself; unknown snapshots, picks already on main, and
    staged DELETES past a moved main refuse typed."""
    from buzz_rust_spark.sources.iceberg_writer import (
        cherry_pick_iceberg,
        delete_iceberg,
    )

    root = str(tmp_path / "t")

    def rows(**kw):
        return sorted(
            r.id
            for r in IcebergCatalog("t", root, **kw)
            .to_dataframe(spark)
            .collect()
        )

    created = write_iceberg(spark.createDataFrame([(1,), (2,)], "id long"), root)
    with pytest.raises(BuzzBadRequestError, match="not in table history"):
        cherry_pick_iceberg(root, 12345)
    with pytest.raises(BuzzBadRequestError, match="already published"):
        cherry_pick_iceberg(root, created["snapshot_id"])

    staged = write_iceberg(
        spark.createDataFrame([(3,)], "id long"), root,
        mode="append", branch="b",
    )
    out = cherry_pick_iceberg(root, staged["snapshot_id"])
    assert out["published"] == "fast-forward"
    assert out["snapshot_id"] == staged["snapshot_id"]
    assert rows() == [1, 2, 3]

    # stage a DELETE, advance main → replay refused (appends only)
    d = delete_iceberg(spark, root, "id = 1", branch="b2")
    write_iceberg(
        spark.createDataFrame([(4,)], "id long"), root, mode="append"
    )
    with pytest.raises(BuzzBadRequestError, match="only appends replay"):
        cherry_pick_iceberg(root, d["snapshot_id"])
    # ...but the SAME staged delete fast-forwards when main is rolled
    # back to its parent (lineage already correct) — covered by parent
    # equality, not operation
    assert rows() == [1, 2, 3, 4]


def test_cherry_pick_survives_branch_drop_and_expiry(spark, tmp_path):
    """The published data outlives the staging machinery: after a replay
    cherry-pick, dropping the branch, expiring the staged snapshot, and
    vacuuming with zero retention leaves main reading every row — the
    rewritten publish manifest references the SAME data files, so
    reachability keeps them even though the staged snapshot (and its
    manifest) are gone."""
    from buzz_rust_spark.sources.iceberg_writer import (
        cherry_pick_iceberg,
        drop_iceberg_ref,
        expire_iceberg_snapshots,
        vacuum_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,), (2,)], "id long"), root)
    staged = write_iceberg(
        spark.createDataFrame([(3,)], "id long"), root,
        mode="append", branch="wap",
    )
    write_iceberg(
        spark.createDataFrame([(4,)], "id long"), root, mode="append"
    )
    out = cherry_pick_iceberg(root, staged["snapshot_id"])
    assert out["published"] == "replay"
    drop_iceberg_ref(root, "wap")
    expire_iceberg_snapshots(root, keep_last=1)
    removed = vacuum_iceberg(root, retention_hours=0.0)
    # the staged snapshot's manifest-list/manifest are reclaimable; its
    # data file is NOT (main's publish manifest references it)
    assert all(p.endswith(".avro") for p in removed)
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 2, 3, 4]


def test_expire_keeps_branch_chain_for_fast_forward(spark, tmp_path):
    """Expiry retains a staged branch's private ancestor chain (not just
    its pinned head): after an aggressive keep_last=1 expire, the branch
    still reads and the publish still proves ancestry.  A STALE branch
    (pointing into published history) pins only its head — its ancestry
    does not block expiry."""
    from buzz_rust_spark.sources.iceberg_writer import (
        expire_iceberg_snapshots,
        fast_forward_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    df = lambda i: spark.createDataFrame([(i,)], "id long")  # noqa: E731
    write_iceberg(df(1), root)
    write_iceberg(df(2), root, mode="append", branch="b")
    write_iceberg(df(3), root, mode="append", branch="b")
    out = expire_iceberg_snapshots(root, keep_last=1)
    # nothing the publish needs was expired (create = main cur, both
    # branch commits in the chain)
    assert out is None or not (
        set(out["expired_snapshots"])
        & set(out.get("retained_snapshots", []))
    )
    assert sorted(
        r.id
        for r in IcebergCatalog("t", root, ref="b").to_dataframe(spark).collect()
    ) == [1, 2, 3]
    fast_forward_iceberg(root, "b")
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 2, 3]
    # stale-branch case: b now points at history below main after new
    # main commits; expire may drop main's interim history despite b
    write_iceberg(df(4), root, mode="append")
    write_iceberg(df(5), root, mode="append")
    out = expire_iceberg_snapshots(root, keep_last=1)
    assert out is not None  # something expired — the stale chain didn't pin all


def test_drop_iceberg_ref_releases_chain(spark, tmp_path):
    """drop_iceberg_ref removes a tag/branch (main refused, unknown
    typed); after dropping a published branch, expiry may reclaim the
    snapshots only its chain pinned."""
    from buzz_rust_spark.sources.iceberg_writer import (
        drop_iceberg_ref,
        expire_iceberg_snapshots,
        tag_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), root)
    write_iceberg(
        spark.createDataFrame([(2,)], "id long"), root, mode="append",
        branch="b",
    )
    tag_iceberg(root, "keep", ref_type="tag")
    with pytest.raises(BuzzBadRequestError, match="managed by commits"):
        drop_iceberg_ref(root, "main")
    with pytest.raises(BuzzBadRequestError, match="not in table refs"):
        drop_iceberg_ref(root, "nope")
    out = drop_iceberg_ref(root, "b")
    assert out["ref"] == "b"
    # branch gone: its ref is unreadable, its staged snapshot expirable
    with pytest.raises(BuzzBadRequestError, match="not in table refs"):
        IcebergCatalog("t", root, ref="b")
    write_iceberg(
        spark.createDataFrame([(3,)], "id long"), root, mode="append"
    )
    expired = expire_iceberg_snapshots(root, keep_last=1)
    assert expired is not None  # the orphaned staged snapshot went away
    assert sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ) == [1, 3]


def test_merge_schema_mode_merge_reconciles_drift(spark, tmp_path):
    """merge_iceberg(schema_mode='merge'): a CDC source with a NEW
    column evolves it in mid-upsert, a source MISSING an optional column
    null-fills it (full-row upsert: the updated row's missing column is
    NULL), strict mode still refuses."""
    from buzz_rust_spark.errors import BuzzSchemaError
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), root
    )
    src = spark.createDataFrame(
        [(2, "B2", 7.5), (3, "c", 1.0)], "id long, v string, score double"
    ).coalesce(1)
    with pytest.raises(BuzzSchemaError, match="does not match"):
        merge_iceberg(spark, root, src, ["id"])
    merge_iceberg(spark, root, src, ["id"], schema_mode="merge")
    rows = {
        (r.id, r.v, r.score)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    }
    assert rows == {(1, "a", None), (2, "B2", 7.5), (3, "c", 1.0)}

    src2 = spark.createDataFrame([(3, 9.0)], "id long, score double").coalesce(1)
    merge_iceberg(spark, root, src2, ["id"], schema_mode="merge")
    rows = {
        (r.id, r.v, r.score)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    }
    assert rows == {(1, "a", None), (2, "B2", 7.5), (3, None, 9.0)}


# --- equality deletes × renamed-column evolution (field-id binding) ----------
# Lifted round 10: pre-rename delete files bind by PARQUET:field_id; see
# iceberg.py::_read_eq_key_files.  Reference has no write path at all
# (fuse_service.rs:130-135) — this is extension surface graded on spec
# fidelity (Iceberg spec "Equality Delete Files" + schema evolution rules).


def test_merge_history_survives_key_column_rename(spark, tmp_path):
    """merge → rename the KEY column → merge again → delete: every delete
    file (pre- and post-rename names in the footers) binds by field id and
    the MOR read reproduces the serial history."""
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        evolve_iceberg,
        merge_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)],
              "id long, v string, score double"),
        root,
    )
    # pre-rename upsert: delete file column is named "id"
    merge_iceberg(
        spark, root,
        _rows(spark, [(2, "B", 2.5), (3, "c", 3.0)],
              "id long, v string, score double"),
        ["id"],
    )
    evolve_iceberg(root, rename_columns={"id": "ident", "v": "val"})
    # post-rename upsert: delete file column is named "ident", same field id
    merge_iceberg(
        spark, root,
        _rows(spark, [(3, "C", 3.5), (4, "d", 4.0)],
              "ident long, val string, score double"),
        ["ident"],
    )
    cat = IcebergCatalog("t", root)
    got = sorted(
        (r.ident, r.val, r.score) for r in cat.to_dataframe(spark).collect()
    )
    assert got == [(1, "a", 1.0), (2, "B", 2.5), (3, "C", 3.5), (4, "d", 4.0)]
    # predicate delete on the MOR-resolved scan of the evolved CDC table
    delete_iceberg(spark, root, "score < 3.0")
    got = sorted(
        (r.ident, r.val, r.score)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(3, "C", 3.5), (4, "d", 4.0)]


def test_merge_after_rename_reinsert_survives_sequence_scope(spark, tmp_path):
    """A key deleted pre-rename and re-inserted post-rename survives: the
    sequence scoping must hold across the field-id read path."""
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg,
        merge_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    merge_iceberg(spark, root, _rows(spark, [(1, "A")], "id long, v string"),
                  ["id"])
    evolve_iceberg(root, rename_columns={"id": "k"})
    merge_iceberg(spark, root, _rows(spark, [(1, "A2")], "k long, v string"),
                  ["k"])
    got = sorted(
        (r.k, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "A2")]


def _strip_field_ids(path: str) -> None:
    """Rewrite a parquet file in place with all field-id metadata removed —
    simulates an external engine's id-less equality-delete file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    fields = [
        pa.field(f.name, f.type, f.nullable, None) for f in t.schema
    ]
    pq.write_table(t.cast(pa.schema(fields)), path)


def test_idless_eq_delete_file_resolves_via_name_history(spark, tmp_path):
    """An id-less delete file carrying the OLD key-column name resolves
    through the field id's name history (all schema versions)."""
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg,
        merge_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a"), (2, "b")], "id long, v string"),
                  root)
    merge_iceberg(spark, root, _rows(spark, [(2, "B")], "id long, v string"),
                  ["id"])
    cat0 = IcebergCatalog("t", root)
    eq_files = [d["uri"] for d in cat0._plan(spark, None)["deletes"]
                if d["kind"] == "eq"]
    assert eq_files
    for uri in eq_files:
        _strip_field_ids(uri.removeprefix("file://"))
    evolve_iceberg(root, rename_columns={"id": "ident"})
    got = sorted(
        (r.ident, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "a"), (2, "B")]


def test_idless_eq_delete_unknown_column_refused(spark, tmp_path):
    """An id-less delete file whose footer column matches NO known name of
    the key field id is a typed refusal — never a null-filled key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg,
        merge_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    merge_iceberg(spark, root, _rows(spark, [(1, "A")], "id long, v string"),
                  ["id"])
    cat0 = IcebergCatalog("t", root)
    eq_files = [d["uri"] for d in cat0._plan(spark, None)["deletes"]
                if d["kind"] == "eq"]
    for uri in eq_files:
        p = uri.removeprefix("file://")
        t = pq.read_table(p)
        t = t.rename_columns(["mystery_col"])
        fields = [pa.field(f.name, f.type, f.nullable, None)
                  for f in t.schema]
        pq.write_table(t.cast(pa.schema(fields)), p)
    evolve_iceberg(root, rename_columns={"id": "ident"})
    with pytest.raises(BuzzExecutionError, match="cannot bind"):
        IcebergCatalog("t", root).to_dataframe(spark).collect()


def test_changelog_after_key_rename_with_eq_deletes(spark, tmp_path):
    """read_iceberg_changelog over a window containing a key-column rename
    and equality deletes: retractions bind by field id in current-name
    space (previously a typed refusal; lifted round 10)."""
    from buzz_rust_spark.sources.iceberg import read_iceberg_changelog
    from buzz_rust_spark.sources.iceberg_writer import (
        evolve_iceberg,
        merge_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a"), (2, "b")], "id long, v string"),
                  root)
    snap0 = IcebergCatalog("t", root).resolved_snapshot_id
    merge_iceberg(spark, root, _rows(spark, [(2, "B")], "id long, v string"),
                  ["id"])
    evolve_iceberg(root, rename_columns={"id": "ident"})
    merge_iceberg(spark, root,
                  _rows(spark, [(3, "c")], "ident long, v string"), ["ident"])
    rows = read_iceberg_changelog(
        spark, root, from_snapshot_id=snap0,
        to_snapshot_id=IcebergCatalog("t", root).resolved_snapshot_id,
    ).collect()
    got = sorted((r.ident, r.v, r._change_type) for r in rows)
    assert got == [
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "insert"),
    ]


# --- add_files_iceberg (metadata-only registration of existing parquet) ------


def _loose_parquet(spark, tmp_path, name, rows, schema):
    import glob as globmod
    import shutil

    p = str(tmp_path / name)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p + ".dir")
    shutil.move(globmod.glob(p + ".dir/part-*.parquet")[0], p)
    shutil.rmtree(p + ".dir")
    return p


def test_add_files_registers_external_parquet(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import add_files_iceberg

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    f1 = _loose_parquet(
        spark, tmp_path, "ext1.parquet", [(2, "b"), (3, "c")],
        "id long, v string",
    )
    f2 = _loose_parquet(
        spark, tmp_path, "ext2.parquet", [(4, "d")], "id long, v string"
    )
    out = add_files_iceberg(spark, root, [f1, f2])
    assert out["added_files"] == 2 and out["added_records"] == 3
    got = sorted(
        (r.id, r.v)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # metadata-only: the external files were not copied
    assert os.path.exists(f1) and not os.path.exists(
        os.path.join(root, "data", "ext1.parquet")
    )
    # id-less external files → the name mapping landed atomically
    import json as _json

    from buzz_rust_spark.sources.iceberg_writer import _load_v2_meta

    _, meta = _load_v2_meta(root, root)
    nm = _json.loads(
        meta["properties"]["schema.name-mapping.default"]
    )
    assert {e["field-id"]: e["names"] for e in nm} == {1: ["id"], 2: ["v"]}
    # re-adding a registered file refuses typed
    with pytest.raises(BuzzBadRequestError, match="already referenced"):
        add_files_iceberg(spark, root, [f1])
    # registered files delete/travel like any others
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    delete_iceberg(spark, root, "id = 3")
    got = sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [1, 2, 4]


def test_add_files_partitioned_and_guards(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import add_files_iceberg

    root = str(tmp_path / "t")
    write_iceberg(
        _rows(spark, [(1, "x", 2020)], "id long, v string, y int"),
        root, partition_by=["y"],
    )
    pure = _loose_parquet(
        spark, tmp_path, "pure.parquet", [(2, "y", 2021), (3, "z", 2021)],
        "id long, v string, y int",
    )
    impure = _loose_parquet(
        spark, tmp_path, "impure.parquet", [(4, "q", 2021), (5, "r", 2022)],
        "id long, v string, y int",
    )
    bad_schema = _loose_parquet(
        spark, tmp_path, "bad.parquet", [(6,)], "id long"
    )
    out = add_files_iceberg(spark, root, [pure])
    assert out["added_files"] == 1
    cat = IcebergCatalog("t", root)
    got = sorted(
        (r.id, r.y) for r in cat.to_dataframe(spark).collect()
    )
    assert got == [(1, 2020), (2, 2021), (3, 2021)]
    # the derived partition value PRUNES like any written partition
    assert len(cat.pruned_files(spark, "y = 2021")) == 1
    assert len(cat.pruned_files(spark, "y = 1999")) == 0
    with pytest.raises(BuzzBadRequestError, match="partition-pure"):
        add_files_iceberg(spark, root, [impure])
    from buzz_rust_spark.errors import BuzzSchemaError

    with pytest.raises(BuzzSchemaError):
        add_files_iceberg(spark, root, [bad_schema])
    with pytest.raises(BuzzBadRequestError, match="not an iceberg table"):
        add_files_iceberg(spark, str(tmp_path / "nope"), [pure])
    assert add_files_iceberg(spark, root, []) is None


def test_add_files_name_mapping_survives_rename(spark, tmp_path):
    """The name mapping committed by add_files is LOAD-BEARING: after a
    column rename, the id-less registered files (whose parquet columns
    keep the OLD name) still read correctly through the mapping —
    field-id resolution alone would null-fill them."""
    from buzz_rust_spark.sources.iceberg_writer import (
        add_files_iceberg,
        evolve_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(_rows(spark, [(1, "a")], "id long, v string"), root)
    ext = _loose_parquet(
        spark, tmp_path, "ext.parquet", [(2, "b")], "id long, v string"
    )
    add_files_iceberg(spark, root, [ext])
    evolve_iceberg(root, rename_columns={"v": "val"})
    got = sorted(
        (r.id, r.val)
        for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_add_files_bucket_partitioned(spark, tmp_path):
    """Round-11 lift of the non-identity add_files refusal: on a
    bucket(4)-partitioned table, each registered file's partition tuple
    is derived by ONE distributed job applying the writer's own spec
    ordinals over the source columns; bucket-pure files register and
    prune, spanning files refuse typed."""
    import glob as _glob
    import os as _os

    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        _bucket_udf,
        add_files_iceberg,
        delete_iceberg,
        write_iceberg,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_iceberg(df.where("k < 20"), root, partition_by=["bucket(4, k)"])

    ldir = str(tmp_path / "legacy")
    df.where("k >= 20").withColumn(
        "__b", _bucket_udf("long", 4)(F.col("k").cast("string"))
    ).write.mode("overwrite").partitionBy("__b").parquet(ldir)
    loose = sorted(
        _glob.glob(_os.path.join(ldir, "**", "*.parquet"), recursive=True)
    )
    out = add_files_iceberg(spark, root, loose)
    assert out["added_files"] == len(loose) >= 2
    got = sorted(
        r["k"] for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == list(range(40))
    # partition pruning covers the registered files (file-level: the
    # matching bucket's files only — a strict subset holding k=21)
    pruned = [
        r["k"]
        for r in IcebergCatalog("t2", root)
        .to_dataframe(spark, partition_filter="k = 21")
        .collect()
    ]
    assert 21 in pruned and 0 < len(pruned) < 40

    bdir = str(tmp_path / "bad")
    df.where("k >= 20").coalesce(1).write.mode("overwrite").parquet(bdir)
    with pytest.raises(BuzzBadRequestError, match="spans"):
        add_files_iceberg(
            spark, root, sorted(_glob.glob(_os.path.join(bdir, "*.parquet")))
        )
    # a delete spanning engine-written and registered populations
    delete_iceberg(spark, root, "k % 7 = 3")
    got = sorted(
        r["k"]
        for r in IcebergCatalog("t3", root).to_dataframe(spark).collect()
    )
    assert got == [k for k in range(40) if k % 7 != 3]


def test_truncate_iceberg_metadata_only(spark, tmp_path):
    """TRUNCATE: one empty-manifest-list snapshot, O(1), prior snapshots
    time-travelable; a second truncate is a no-op."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        truncate_iceberg,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1), root
    )
    import json as j
    from glob import glob as g

    before = j.load(
        open(sorted(g(os.path.join(root, "metadata", "v*.metadata.json")))[-1])
    )
    first_snap = before["current-snapshot-id"]
    r = truncate_iceberg(root)
    assert r is not None and r["operation"] == "delete"
    assert IcebergCatalog("t", root).to_dataframe(spark).count() == 0
    old = IcebergCatalog("t0", root, snapshot_id=first_snap)
    assert old.to_dataframe(spark).count() == 2
    assert truncate_iceberg(root) is None


def test_clone_iceberg_shallow(spark, tmp_path):
    """Shallow clone: metadata-only (no files under the clone's data
    dir), pinned snapshot, independent divergence, root-scoped vacuum,
    txn markers stripped (fresh idempotence domain)."""
    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        clone_iceberg,
        delete_iceberg,
        merge_iceberg,
        vacuum_iceberg,
        write_iceberg,
    )

    src = str(tmp_path / "src")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        ).coalesce(1),
        src, txn_app_id="app", txn_version=7,
    )
    dst = str(tmp_path / "dst")
    r = clone_iceberg(src, dst)
    assert r["metadata_version"] == 1
    assert not os.path.isdir(os.path.join(dst, "data"))  # zero data copied
    got = sorted(
        (x.id, x.v)
        for x in IcebergCatalog("c", dst).to_dataframe(spark).collect()
    )
    assert got == [(1, "a"), (2, "b")]
    # fresh idempotence domain: the source's (app, 7) marker is gone, so
    # the same txn pair COMMITS on the clone
    res = merge_iceberg(
        spark, dst,
        spark.createDataFrame([(2, "B")], "id long, v string"), ["id"],
        txn_app_id="app", txn_version=7,
    )
    assert res is not None
    # divergence both ways + root-scoped vacuum
    delete_iceberg(spark, dst, "id = 1")
    write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1),
        src, mode="append",
    )
    vacuum_iceberg(dst, retention_hours=0.0)
    got_src = sorted(
        x.id for x in IcebergCatalog("s", src).to_dataframe(spark).collect()
    )
    got_dst = sorted(
        (x.id, x.v)
        for x in IcebergCatalog("c2", dst).to_dataframe(spark).collect()
    )
    assert got_src == [1, 2, 3] and got_dst == [(2, "B")]
    # guards
    with pytest.raises(BuzzBadRequestError, match="already an Iceberg"):
        clone_iceberg(src, dst)
    with pytest.raises(BuzzBadRequestError, match="not found"):
        clone_iceberg(src, str(tmp_path / "x"), snapshot_id=12345)


def test_rewrite_iceberg_manifests(spark, tmp_path):
    """Manifest consolidation (rewrite_manifests): metadata-only, one
    manifest per (content, spec) group, EXISTING entries with EXPLICIT
    effective sequence numbers — reads identical, equality-delete
    scoping intact for both carried and future commits, partition
    summaries recomputed so manifest skipping keeps pruning."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        rewrite_iceberg_manifests,
        write_iceberg,
    )

    root = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, 10, "2020"), (2, 20, "2020")], "k long, v long, y string"
        ).coalesce(1),
        root, partition_by=["y"],
    )
    write_iceberg(
        spark.createDataFrame(
            [(3, 30, "2021")], "k long, v long, y string"
        ).coalesce(1),
        root, mode="append", partition_by=["y"],
    )
    merge_iceberg(
        spark, root,
        spark.createDataFrame(
            [(2, 200, "2020"), (4, 400, "2021")], "k long, v long, y string"
        ),
        ["k"],
    )
    delete_iceberg(spark, root, "k = 1")
    before = sorted(
        (x.k, x.v, x.y)
        for x in IcebergCatalog("b", root).to_dataframe(spark).collect()
    )
    r = rewrite_iceberg_manifests(root)
    assert r is not None and r["operation"] == "replace"
    assert r["manifests_created"] < r["manifests_replaced"]
    after = sorted(
        (x.k, x.v, x.y)
        for x in IcebergCatalog("a", root).to_dataframe(spark).collect()
    )
    assert after == before
    # partition-filtered read over consolidated manifests still prunes
    # and answers exactly
    cat = IcebergCatalog("p", root)
    got = sorted(
        (x.k, x.y)
        for x in cat.to_dataframe(
            spark, partition_filter="y = '2021'"
        ).collect()
    )
    assert got == [(3, "2021"), (4, "2021")]
    # sequence scoping survives: a post-consolidation merge's eq-delete
    # must kill the OLD row only, never its own replacement
    merge_iceberg(
        spark, root,
        spark.createDataFrame(
            [(2, 2000, "2020")], "k long, v long, y string"
        ),
        ["k"],
    )
    rows = sorted(
        (x.k, x.v)
        for x in IcebergCatalog("a2", root).to_dataframe(spark).collect()
    )
    assert rows == [(2, 2000), (3, 30), (4, 400)]
    # idempotent once consolidated
    rewrite_iceberg_manifests(root)
    assert rewrite_iceberg_manifests(root) is None
