"""Object-store (S3) catalog semantics.

The reference is S3-native: every table description carries region + bucket
(datasource/hbee/s3_parquet.rs:16-37), file entries are bare object keys
(``SizedFile{key,length}``, models/mod.rs:13-16), and S3 clients are
region-scoped (clients/s3.rs:19-55).  These tests exercise the rebuild's
equivalent — relative keys resolved against ``{scheme}://{bucket}/`` — using
``scheme='file'`` with a local directory as the bucket (a faithful filesystem
mock; the hadoop-aws jars are not shipped in this container).
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow

from pyspark.sql.types import LongType, StringType, StructField, StructType

from buzz_rust_spark import BuzzPlanError, CatalogFile, StaticCatalog

SCHEMA = StructType([StructField("data_col", LongType())])


def _write_files(spark, tmp_path, n=3):
    """n single-file parquet objects named obj_i.parquet under tmp_path."""
    files = []
    for i in range(1, n + 1):
        path = str(tmp_path / f"obj_{i}.parquet")
        tmpdir = path + ".tmpdir"
        spark.createDataFrame(
            [(i * 10 + j,) for j in range(3)], schema=SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(tmpdir)
        shutil.move(globmod.glob(tmpdir + "/part-*.parquet")[0], path)
        shutil.rmtree(tmpdir)
        files.append(
            CatalogFile(
                key=f"obj_{i}.parquet",
                length=os.path.getsize(path),
                partitions=(("part_key", f"part_value_{i:03d}"),),
            )
        )
    return files


def test_resolve_key_s3_uri_form():
    cat = StaticCatalog(
        name="taxi",
        schema=SCHEMA,
        files=[CatalogFile(key="year=2009/file.parquet", length=1)],
        region="us-east-2",
        bucket="my-data-bucket",
    )
    assert cat.resolve_key("year=2009/file.parquet") == (
        "s3a://my-data-bucket/year=2009/file.parquet"
    )
    # bucket-less catalogs keep absolute paths untouched
    plain = StaticCatalog(name="t", schema=SCHEMA, files=[])
    assert plain.resolve_key("/abs/path.parquet") == "/abs/path.parquet"


def test_bucketed_catalog_reads_relative_keys(spark, tmp_path):
    files = _write_files(spark, tmp_path)
    cat = StaticCatalog(
        name="t",
        schema=SCHEMA,
        files=files,
        partition_cols=["part_key"],
        bucket=str(tmp_path),
        scheme="file",
        verify_schemas=True,  # footer check must also resolve relative keys
    )
    df = cat.to_dataframe(spark)
    assert df.count() == 9
    assert set(df.select("part_key").distinct().toPandas()["part_key"]) == {
        "part_value_001",
        "part_value_002",
        "part_value_003",
    }


def test_bucketed_catalog_partition_pruning(spark, tmp_path):
    files = _write_files(spark, tmp_path)
    cat = StaticCatalog(
        name="t",
        schema=SCHEMA,
        files=files,
        partition_cols=["part_key"],
        bucket=str(tmp_path),
        scheme="file",
    )
    # pruning runs over bare object keys (the manifest is metadata — no URIs)
    survivors = cat.pruned_files(spark, "part_key >= 'part_value_002'")
    assert sorted(f.key for f in survivors) == ["obj_2.parquet", "obj_3.parquet"]
    df = cat.to_dataframe(spark, partition_filter="part_key = 'part_value_002'")
    assert sorted(r["data_col"] for r in df.collect()) == [20, 21, 22]


def test_bucketed_catalog_join_attach_strategy(spark, tmp_path):
    """The scan + broadcast-manifest join path must normalize the resolved
    URI (not the bare key) so it equals input_file_name()."""
    files = _write_files(spark, tmp_path)
    cat = StaticCatalog(
        name="t",
        schema=SCHEMA,
        files=files,
        partition_cols=["part_key"],
        bucket=str(tmp_path),
        scheme="file",
        attach_strategy="join",
    )
    rows = cat.to_dataframe(spark).collect()
    assert len(rows) == 9
    # every row found its partition value through the URI join — no nulls
    assert all(r["part_key"] is not None for r in rows)
    by_part = {r["part_key"] for r in rows}
    assert by_part == {f"part_value_{i:03d}" for i in (1, 2, 3)}


def test_bucketed_catalog_missing_object_is_plan_error(spark, tmp_path):
    files = _write_files(spark, tmp_path, n=1) + [
        CatalogFile(key="missing.parquet", length=10)
    ]
    cat = StaticCatalog(
        name="t",
        schema=SCHEMA,
        files=files,
        bucket=str(tmp_path),
        scheme="file",
        verify_schemas=True,
        verify_max_files=None,
    )
    with pytest.raises(Exception):
        cat.to_dataframe(spark).collect()


def test_distributed_schema_check_full_catalog(spark, tmp_path):
    """verify_max_files=None checks EVERY footer; above DISTRIBUTE_THRESHOLD
    files the check runs as a mapInPandas job, so the one bad file past the
    old 16-file sample window is caught (VERDICT r3 #5)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from buzz_rust_spark.errors import BuzzSchemaError
    from buzz_rust_spark.sources import CatalogFile, StaticCatalog
    from buzz_rust_spark.sources.schema_check import DISTRIBUTE_THRESHOLD, verify_files

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.types import LongType, StructField, StructType

    n_files = DISTRIBUTE_THRESHOLD + 6
    declared = StructType([StructField("v", LongType(), True)])
    good_tbl = pa.table({"v": pa.array([0, 1], type=pa.int64())})
    paths = []
    for i in range(n_files - 1):
        p = str(tmp_path / f"f{i:03d}.parquet")
        pq.write_table(good_tbl, p)
        paths.append(p)
    bad = str(tmp_path / "zz_bad.parquet")
    pq.write_table(pa.table({"v": pa.array(["0", "1"])}), bad)
    paths.append(bad)

    # full distributed check finds the mismatch (sorted last, past any sample)
    with _pytest.raises(BuzzSchemaError, match="zz_bad"):
        verify_files(declared, paths, max_files=None, spark=spark)
    # all-good catalog passes the distributed path
    verify_files(declared, paths[:-1], max_files=None, spark=spark)
    # the 16-file sample (catalog default) does NOT see the bad file — the
    # documented sampling trade-off
    verify_files(declared, paths, max_files=16, spark=spark)

    # end-to-end: StaticCatalog with verify_max_files=None refuses the scan
    cat = StaticCatalog(
        name="t",
        schema=declared,
        files=[CatalogFile(key=p, length=1) for p in paths],
        verify_schemas=True,
        verify_max_files=None,
    )
    with _pytest.raises(BuzzSchemaError):
        cat.to_dataframe(spark)


def test_logstore_s3_uri_normalizes_to_s3a_for_spark():
    """Data-file keys from an s3:// table URI must come back as s3a:// —
    stock Spark binds fs.s3a only (code-review r4).  Construction must not
    touch the network."""
    from unittest import mock

    from buzz_rust_spark.sources import LogStore

    with mock.patch("pyarrow.fs.S3FileSystem") as fake:
        fake.return_value = object()
        store = LogStore("s3://bkt/tbl", region="eu-west-1")
    assert store.spark_path("part-0.parquet") == "s3a://bkt/tbl/part-0.parquet"
    fake.assert_called_once_with(region="eu-west-1")


def _write_orc(path, ids, names):
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    pa_orc.write_table(
        pa.table(
            {"id": pa.array(ids, pa.int64()),
             "name": pa.array(names, pa.string())}
        ),
        path,
    )


def test_static_catalog_orc_format(spark, tmp_path):
    """fmt='orc' scans ORC files through every strategy surface: plain,
    partition-union attach, and the declared schema still prunes/projects."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from buzz_rust_spark.sources.manifest import CatalogFile
    from buzz_rust_spark.sources.static_catalog import StaticCatalog

    p1 = str(tmp_path / "a.orc")
    p2 = str(tmp_path / "b.orc")
    _write_orc(p1, [1, 2], ["x", "y"])
    _write_orc(p2, [3], ["z"])
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    plain = StaticCatalog(
        name="t", schema=schema,
        files=[CatalogFile(key=p1, length=1), CatalogFile(key=p2, length=1)],
        fmt="orc",
    )
    assert sorted(
        (r["id"], r["name"]) for r in plain.to_dataframe(spark).collect()
    ) == [(1, "x"), (2, "y"), (3, "z")]

    parts = StaticCatalog(
        name="t", schema=schema,
        files=[
            CatalogFile(key=p1, length=1, partitions=(("ds", "d1"),)),
            CatalogFile(key=p2, length=1, partitions=(("ds", "d2"),)),
        ],
        partition_cols=["ds"],
        fmt="orc",
    )
    rows = {r["id"]: r["ds"] for r in parts.to_dataframe(spark).collect()}
    assert rows == {1: "d1", 2: "d1", 3: "d2"}
    pruned = parts.to_dataframe(spark, partition_filter="ds = 'd2'")
    assert [r["id"] for r in pruned.collect()] == [3]


def test_static_catalog_orc_schema_verification(spark, tmp_path):
    """verify_schemas reads ORC footers: a type mismatch is a typed
    BuzzSchemaError, not silent nulls."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from buzz_rust_spark.errors import BuzzSchemaError
    from buzz_rust_spark.sources.manifest import CatalogFile
    from buzz_rust_spark.sources.static_catalog import StaticCatalog

    p1 = str(tmp_path / "v.orc")
    _write_orc(p1, [1], ["x"])
    good = StaticCatalog(
        name="t",
        schema=StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        ),
        files=[CatalogFile(key=p1, length=1)],
        fmt="orc",
        verify_schemas=True,
    )
    assert good.to_dataframe(spark).count() == 1
    bad = StaticCatalog(
        name="t",
        schema=StructType(
            [StructField("id", StringType()), StructField("name", StringType())]
        ),
        files=[CatalogFile(key=p1, length=1)],
        fmt="orc",
        verify_schemas=True,
    )
    with pytest.raises(BuzzSchemaError, match="id"):
        bad.to_dataframe(spark).count()


def test_static_catalog_unknown_format_typed_error(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from buzz_rust_spark.errors import BuzzPlanError
    from buzz_rust_spark.sources.manifest import CatalogFile
    from buzz_rust_spark.sources.static_catalog import StaticCatalog

    cat = StaticCatalog(
        name="t",
        schema=StructType([StructField("id", LongType())]),
        files=[CatalogFile(key=str(tmp_path / "x.bin"), length=1)],
        fmt="csv",
    )
    with pytest.raises(BuzzPlanError, match="format"):
        cat.to_dataframe(spark)


def test_engine_static_clone_keeps_catalog_settings(spark, tmp_path):
    """Resolving a registered Static catalog by query JSON must keep ALL its
    settings (fmt/bucket/scheme were silently dropped by the field-by-field
    clone)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from buzz_rust_spark import BuzzEngine, BuzzQuery
    from buzz_rust_spark.sources.manifest import CatalogFile
    from buzz_rust_spark.sources.static_catalog import StaticCatalog

    p1 = str(tmp_path / "e.orc")
    _write_orc(p1, [1, 2, 3], ["x", "y", "z"])
    engine = BuzzEngine(spark)
    engine.register_static(
        StaticCatalog(
            name="orct",
            schema=StructType(
                [StructField("id", LongType()), StructField("name", StringType())]
            ),
            files=[CatalogFile(key=p1, length=1)],
            fmt="orc",
        )
    )
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {"sql": "SELECT COUNT(*) AS n FROM orct", "name": "s",
                 "step_type": "HBee"},
            ],
            "catalogs": [{"name": "orct", "type": "Static", "uri": "orct"}],
        }
    )
    assert engine.run(q).collect()[0]["n"] == 3
