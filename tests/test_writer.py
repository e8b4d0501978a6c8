"""Write→manifest→catalog→pruned-read round-trip (reference test pattern:
parquet.rs:273-355 'write then read', plus partition pruning on the result)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from buzz_rust_spark import BuzzEngine, BuzzQuery
from buzz_rust_spark.queries.registry import load
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


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must hash-join with no Exchange on
    either side (the co-located join contract)."""
    from buzz_rust_spark.sources.writer import write_bucketed

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_b", str(tmp_path / "orders_b"), ["o_orderkey"], 8
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", str(tmp_path / "lineitem_b"), ["o_orderkey"], 8,
    )
    try:
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        # disable broadcast so the shuffle (if any) would be visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, on="o_orderkey").select("o_orderkey", "l_quantity")
            plan = joined._sc._jvm.PythonSQLUtils.explainString(
                joined._jdf.queryExecution(), "formatted"
            )
            assert "Exchange" not in plan, plan
            # and it is still correct
            expected = (
                orders.join(
                    lineitem, orders.o_orderkey == lineitem.l_orderkey
                ).count()
            )
            assert joined.count() == expected
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
