"""CSV / JSON-lines catalogs: declared schema, FAILFAST parity with the
reference's strict scan check, permissive quarantine path."""

from __future__ import annotations

import os

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from buzz_rust_spark.errors import BuzzBadRequestError
from buzz_rust_spark.sources import CsvCatalog, JsonLinesCatalog, quarantine_split

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("qty", IntegerType(), True),
    ]
)


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,qty\n1,alpha,10\n2,beta,20\n3,gamma,30\n")
    return str(p)


@pytest.fixture()
def bad_csv_dir(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,qty\n1,alpha,10\n2,beta,NOT_A_NUMBER\n3,gamma,30\n")
    return str(p)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "alpha", "qty": 10}\n'
        '{"id": 2, "name": "beta", "qty": 20}\n'
    )
    return str(p)


def test_csv_reads_with_declared_schema(spark, csv_dir):
    cat = CsvCatalog(name="t", path=csv_dir, schema=SCHEMA)
    df = cat.to_dataframe(spark)
    assert df.schema == SCHEMA
    assert df.count() == 3
    assert df.where("qty > 15").count() == 2


def test_csv_failfast_on_bad_row(spark, bad_csv_dir):
    cat = CsvCatalog(name="t", path=bad_csv_dir, schema=SCHEMA)
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        cat.to_dataframe(spark).collect()


def test_csv_permissive_quarantines(spark, bad_csv_dir):
    cat = CsvCatalog(name="t", path=bad_csv_dir, schema=SCHEMA, permissive=True)
    clean, bad = quarantine_split(cat.to_dataframe(spark))
    assert clean.count() == 2
    assert bad.count() == 1
    assert "NOT_A_NUMBER" in bad.first()["_corrupt_record"]
    assert "_corrupt_record" not in clean.columns


def test_csv_requires_schema(spark, csv_dir):
    with pytest.raises(BuzzBadRequestError, match="schema"):
        CsvCatalog(name="t", path=csv_dir, schema=StructType([])).to_dataframe(spark)


def test_jsonl_reads_and_failfast(spark, jsonl_dir, tmp_path):
    cat = JsonLinesCatalog(name="t", path=jsonl_dir, schema=SCHEMA)
    df = cat.to_dataframe(spark)
    assert df.count() == 2
    assert {r["name"] for r in df.collect()} == {"alpha", "beta"}

    badp = tmp_path / "bad.jsonl"
    badp.write_text('{"id": 1, "name": "ok", "qty": 1}\n{totally broken\n')
    bad_cat = JsonLinesCatalog(name="t", path=str(badp), schema=SCHEMA)
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        bad_cat.to_dataframe(spark).collect()
    # permissive: broken line lands in quarantine, good line survives
    clean, bad = quarantine_split(
        JsonLinesCatalog(
            name="t", path=str(badp), schema=SCHEMA, permissive=True
        ).to_dataframe(spark)
    )
    assert clean.count() == 1 and bad.count() == 1


def test_partition_filter_applies(spark, csv_dir):
    cat = CsvCatalog(name="t", path=csv_dir, schema=SCHEMA)
    assert cat.to_dataframe(spark, partition_filter="qty >= 20").count() == 2


def test_engine_accepts_text_catalog(spark, csv_dir):
    """The engine front-end runs a two-step query over a CSV catalog —
    format is a catalog concern, invisible to the query surface."""
    from buzz_rust_spark.engine import BuzzEngine
    from buzz_rust_spark.models import BuzzQuery

    eng = BuzzEngine(spark)
    eng.register_source(CsvCatalog(name="items", path=csv_dir, schema=SCHEMA))
    out = eng.run(
        BuzzQuery.from_dict(
            {
                "steps": [
                    {
                        "sql": "SELECT name, qty FROM items WHERE qty > 5",
                        "name": "m",
                        "step_type": "HBee",
                    },
                    {
                        "sql": "SELECT COUNT(*) AS n, SUM(qty) AS total FROM m",
                        "name": "r",
                        "step_type": "HComb",
                    },
                ],
                "capacity": {"zones": 1},
                "catalogs": [],
            }
        )
    ).collect()
    assert out[0]["n"] == 3 and out[0]["total"] == 60


def test_csv_permissive_drops_quoted_and_crlf_headers(spark, tmp_path):
    """Review fix: quoted ("a","b") and CRLF headers are recognized as
    headers (normalized field match) instead of parsing as data rows."""
    from buzz_rust_spark.sources.text_formats import CsvCatalog
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = tmp_path / "csv"
    d.mkdir()
    (d / "a.csv").write_text('"id","name"\r\n1,alpha\r\n2,beta\r\n')
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    cat = CsvCatalog(name="t", path=str(d), schema=schema, permissive=True)
    rows = cat.to_dataframe(spark).where("_corrupt_record is null").collect()
    got = sorted((r["id"], r["name"]) for r in rows)
    assert got == [(1, "alpha"), (2, "beta")]


def test_csv_json_accept_stats_filter(spark, csv_dir):
    """Row-format catalogs take the engine's stats_filter kwarg (no
    per-file stats to prune, but the predicate applies exactly and an
    unknown column is the typed plan error — the CatalogSource contract
    every source must satisfy now that BuzzStep carries stats_filter)."""
    from buzz_rust_spark.errors import BuzzPlanError

    cat = CsvCatalog(name="t", path=csv_dir, schema=SCHEMA)
    assert cat.to_dataframe(spark, stats_filter="qty > 15").count() == 2
    with pytest.raises(BuzzPlanError, match="stats_filter"):
        cat.to_dataframe(spark, stats_filter="no_such < 1")
