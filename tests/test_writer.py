"""Write→manifest→catalog→pruned-read round-trip (reference test pattern:
parquet.rs:273-355 'write then read', plus partition pruning on the result)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from buzz_rust_spark import BuzzEngine, BuzzQuery
from buzz_rust_spark.sources.writer import catalog_from_written, write_parquet


def test_write_read_roundtrip_with_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i) * 1.5, f"g{i % 3}") for i in range(300)],
        ["id", "val", "grp"],
    )
    path = str(tmp_path / "out")
    write_parquet(
        df, path, partition_by=["grp"], sort_by=["id"], records_per_file=100
    )

    data_schema = StructType(
        [StructField("id", LongType()), StructField("val", DoubleType())]
    )
    cat = catalog_from_written("t", path, data_schema, partition_cols=["grp"])
    assert len(cat.files) >= 3  # at least one file per partition value
    assert {f.partition_value("grp") for f in cat.files} == {"g0", "g1", "g2"}

    back = cat.to_dataframe(spark)
    assert back.count() == 300
    assert back.select(F.sum("val")).collect()[0][0] == df.select(
        F.sum("val")
    ).collect()[0][0]

    engine = BuzzEngine(spark, strict=True)
    engine.register_source(cat)
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT id, val FROM t",
                    "name": "m",
                    "step_type": "HBee",
                    "partition_filter": "grp='g1'",
                },
                {
                    "sql": "SELECT COUNT(*) AS n, SUM(val) AS s FROM m",
                    "name": "r",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 1},
            "catalogs": [],
        }
    )
    row = engine.run(q).collect()[0]
    expect = df.where(F.col("grp") == "g1")
    assert row["n"] == expect.count()
    assert row["s"] == expect.select(F.sum("val")).collect()[0][0]
