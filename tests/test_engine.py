"""End-to-end + planner-shaped tests for the BuzzEngine front-end.

Mirrors the reference's planner unit tests (query_planner.rs:186-373) and the
catalog filtering tests (catalog/mod.rs:151-178) over the driver testdata and
a MockSplittableTable-shaped fixture (FIXTURES.md F1/F2).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from buzz_rust_spark import (
    BuzzEngine,
    BuzzBadRequestError,
    BuzzPlanError,
    BuzzQuery,
    CatalogFile,
    StaticCatalog,
)


def lineitem_catalog(sf_dir: str) -> StaticCatalog:
    path = os.path.join(sf_dir, "lineitem.parquet")
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_type

    footer = pq.read_schema(path)
    schema = StructType(
        [
            StructField(f.name, from_arrow_type(f.type, prefer_timestamp_ntz=True), True)
            for f in footer
        ]
    )
    return StaticCatalog(
        name="lineitem",
        schema=schema,
        files=[CatalogFile(key=path, length=os.path.getsize(path))],
        verify_schemas=True,
    )


CANONICAL_QUERY = {
    "steps": [
        {
            "sql": (
                "SELECT l_returnflag, COUNT(l_returnflag) AS cnt, "
                "SUM(l_extendedprice) AS price_sum "
                "FROM lineitem GROUP BY l_returnflag"
            ),
            "name": "lineitem_map",
            "step_type": "HBee",
        },
        {
            "sql": (
                "SELECT l_returnflag, SUM(cnt) AS cnt, SUM(price_sum) AS price_sum "
                "FROM lineitem_map GROUP BY l_returnflag"
            ),
            "name": "lineitem_reduce",
            "step_type": "HComb",
        },
    ],
    "capacity": {"zones": 1},
    "catalogs": [],
}


def test_two_step_query_matches_single_step(spark, sf_dir):
    """The reference's manual map/reduce split must equal the direct group-by
    (SURVEY.md §4 'manual two-phase aggregation')."""
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(lineitem_catalog(sf_dir))
    result = engine.run(BuzzQuery.from_dict(CANONICAL_QUERY))
    rows = {r["l_returnflag"]: (r["cnt"], r["price_sum"]) for r in result.collect()}

    direct = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag")
        .agg({"l_returnflag": "count", "l_extendedprice": "sum"})
        .collect()
    )
    expect = {
        r["l_returnflag"]: (r["count(l_returnflag)"], r["sum(l_extendedprice)"])
        for r in direct
    }
    assert rows.keys() == expect.keys()
    for k in rows:
        assert rows[k][0] == expect[k][0]
        assert rows[k][1] == pytest.approx(expect[k][1], rel=1e-9)


def mock_split_catalog(spark, tmp_path, n_files=5):
    """FIXTURES.md F1: N files, partition values part_value_001..N.
    Keys are single parquet FILES (the reference's SizedFile contract)."""
    import glob as globmod
    import shutil

    files = []
    for i in range(1, n_files + 1):
        path = str(tmp_path / f"file_{i}.parquet")
        tmpdir = path + ".tmpdir"
        spark.createDataFrame(
            [(i * 10 + j,) for j in range(3)],
            schema=StructType([StructField("data_col", LongType())]),
        ).coalesce(1).write.mode("overwrite").parquet(tmpdir)
        shutil.move(globmod.glob(tmpdir + "/part-*.parquet")[0], path)
        shutil.rmtree(tmpdir)
        files.append(
            CatalogFile(
                key=path,
                length=1,
                partitions=(("part_key_1", f"part_value_{i:03d}"),),
            )
        )
    return StaticCatalog(
        name="mock_split",
        schema=StructType([StructField("data_col", LongType())]),
        files=files,
        partition_cols=["part_key_1"],
    )


def run_two_step(spark, catalog, partition_filter=None):
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(catalog)
    q = {
        "steps": [
            {
                "sql": "SELECT data_col FROM mock_split",
                "name": "map_step",
                "step_type": "HBee",
                "partition_filter": partition_filter,
            },
            {
                "sql": "SELECT COUNT(data_col) AS n FROM map_step",
                "name": "reduce_step",
                "step_type": "HComb",
            },
        ],
        "capacity": {"zones": 1},
        "catalogs": [],
    }
    return engine.run(BuzzQuery.from_dict(q))


def test_partition_filter_prunes(spark, tmp_path):
    cat = mock_split_catalog(spark, tmp_path)
    assert run_two_step(spark, cat).collect()[0]["n"] == 15  # no filter → 5 files
    assert (
        run_two_step(spark, cat, "part_key_1='part_value_002'").collect()[0]["n"] == 3
    )
    assert (
        run_two_step(
            spark,
            cat,
            "part_key_1>='part_value_001' AND part_key_1<='part_value_003'",
        ).collect()[0]["n"]
        == 9
    )


def test_empty_prune_is_empty_result_not_error(spark, tmp_path):
    """reference: fuse_service.rs:80-83 / query_planner.rs:278-308."""
    cat = mock_split_catalog(spark, tmp_path)
    out = run_two_step(spark, cat, "part_key_1='no_such_value'")
    assert out.collect()[0]["n"] == 0


def test_partition_filter_on_unknown_column_errors(spark, tmp_path):
    cat = mock_split_catalog(spark, tmp_path)
    with pytest.raises(BuzzPlanError):
        run_two_step(spark, cat, "not_a_column='x'")


def test_parquet_dir_partition_filter_unknown_column_typed(spark, sf_dir):
    """ParquetDir catalogs must match the Static/Delta typed-error taxonomy:
    a partition_filter naming a nonexistent column is a BuzzPlanError, not a
    raw AnalysisException leaking through run_json (r5 verify-drive find)."""
    import json

    engine = BuzzEngine(spark)
    q = {
        "steps": [
            {
                "sql": "SELECT COUNT(*) AS n FROM lineitem",
                "name": "m",
                "step_type": "HBee",
                "partition_filter": "no_such_col = 'x'",
            },
            {
                "sql": "SELECT SUM(n) AS n FROM m",
                "name": "r",
                "step_type": "HComb",
            },
        ],
        "capacity": {"zones": 1},
        "catalogs": [
            {
                "name": "lineitem",
                "type": "ParquetDir",
                "uri": f"{sf_dir}/lineitem.parquet",
            }
        ],
    }
    with pytest.raises(BuzzPlanError, match="partition_filter"):
        engine.run_json(json.dumps(q))


def test_strict_requires_two_steps(spark, sf_dir):
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(lineitem_catalog(sf_dir))
    q = BuzzQuery.from_dict(
        {
            "steps": [CANONICAL_QUERY["steps"][0]],
            "capacity": {"zones": 1},
            "catalogs": [],
        }
    )
    with pytest.raises(BuzzBadRequestError):
        engine.run(q)


def test_hcomb_reading_catalog_rejected(spark, sf_dir):
    """reference: query_planner.rs:104-109 + test 345-373."""
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(lineitem_catalog(sf_dir))
    q = BuzzQuery.from_dict(
        {
            "steps": [
                CANONICAL_QUERY["steps"][0],
                {
                    "sql": "SELECT COUNT(*) AS n FROM lineitem",
                    "name": "bad_reduce",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 1},
            "catalogs": [],
        }
    )
    with pytest.raises(BuzzPlanError):
        engine.run(q)


def test_unknown_table_rejected(spark):
    engine = BuzzEngine(spark)
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT * FROM no_such_table",
                    "name": "s1",
                    "step_type": "HBee",
                }
            ],
            "capacity": {"zones": 1},
            "catalogs": [],
        }
    )
    with pytest.raises(BuzzPlanError):
        engine.run(q)


def test_multi_step_generalization(spark, sf_dir):
    """Non-strict mode: N chained steps (SURVEY.md §7 order-after-slice #4)."""
    engine = BuzzEngine(spark)
    engine.register_source(lineitem_catalog(sf_dir))
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT l_returnflag, l_extendedprice FROM lineitem",
                    "name": "s1",
                    "step_type": "HBee",
                },
                {
                    "sql": (
                        "SELECT l_returnflag, SUM(l_extendedprice) AS s FROM s1 "
                        "GROUP BY l_returnflag"
                    ),
                    "name": "s2",
                    "step_type": "HComb",
                },
                {
                    "sql": "SELECT COUNT(*) AS n FROM s2",
                    "name": "s3",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 1},
            "catalogs": [],
        }
    )
    assert engine.run(q).collect()[0]["n"] == 3


def test_partition_attach_join_strategy_matches_union(spark, tmp_path):
    """The broadcast-manifest join path must produce the same rows as the
    per-tuple union path (it is the plan-size-bounded variant for catalogs
    with many partitions)."""
    from buzz_rust_spark import StaticCatalog

    base = mock_split_catalog(spark, tmp_path, n_files=5)
    union_cat = StaticCatalog(
        name="m1", schema=base.schema, files=base.files,
        partition_cols=base.partition_cols, attach_strategy="union",
    )
    join_cat = StaticCatalog(
        name="m2", schema=base.schema, files=base.files,
        partition_cols=base.partition_cols, attach_strategy="join",
    )
    u = {tuple(r) for r in union_cat.to_dataframe(spark).collect()}
    j = {tuple(r) for r in join_cat.to_dataframe(spark).collect()}
    assert u == j and len(u) == 15
    # pruning works identically through the join path
    ju = {
        tuple(r)
        for r in join_cat.to_dataframe(
            spark, partition_filter="part_key_1='part_value_002'"
        ).collect()
    }
    assert len(ju) == 3 and all(row[1] == "part_value_002" for row in ju)


def test_runtime_task_failure_surfaces_typed_error(spark, tmp_path):
    """FAIL-action parity (flight_service.rs:147-160): a mid-query task
    failure — a corrupt file in the manifest, undetectable at plan time —
    aborts the query as a typed BuzzExecutionError carrying the root cause,
    not a raw Py4J stack."""
    from buzz_rust_spark import BuzzExecutionError

    cat = mock_split_catalog(spark, tmp_path, n_files=3)
    corrupt = str(tmp_path / "file_2.parquet")
    with open(corrupt, "wb") as fh:
        fh.write(b"PAR1 this is not a real parquet footer")

    engine = BuzzEngine(spark, strict=True)
    engine.register_source(cat)
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT data_col FROM mock_split",
                    "name": "m",
                    "step_type": "HBee",
                },
                {
                    "sql": "SELECT COUNT(data_col) AS n FROM m",
                    "name": "r",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 1},
            "catalogs": [],
        }
    )
    df = engine.run(q)  # planning succeeds: no footer sniffing at plan time
    with pytest.raises(BuzzExecutionError) as info:
        engine.execute(df)
    msg = str(info.value)
    assert "query execution failed" in msg
    # root cause, not the whole server stack: a single line naming the failure
    assert len(msg.splitlines()) == 1

    # healthy manifests still collect fine through the same action boundary
    healthy = mock_split_catalog(spark, tmp_path / "ok", n_files=2)
    engine2 = BuzzEngine(spark, strict=True)
    engine2.register_source(healthy)
    assert engine2.run_collect(q)[0]["n"] == 6


def zones_query(zones, hcomb_sql="SELECT COUNT(data_col) AS n FROM map_step"):
    return BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT data_col FROM mock_split",
                    "name": "map_step",
                    "step_type": "HBee",
                },
                {"sql": hcomb_sql, "name": "reduce_step", "step_type": "HComb"},
            ],
            "capacity": {"zones": zones},
            "catalogs": [],
        }
    )


def test_multi_zone_comb_by_comb_results(spark, tmp_path):
    """reference: query_planner.rs:111-132 round-robins hbee splits across
    min(zones, nb_hbee) hcombs and fuse_service.rs:130-135 emits results comb
    by comb — one reduce output per zone, concatenated."""
    cat = mock_split_catalog(spark, tmp_path, n_files=5)
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(cat)

    single = engine.run(zones_query(1)).collect()
    assert [r["n"] for r in single] == [15]

    two = engine.run(zones_query(2)).collect()
    # round-robin over 5 files: zone0 = files {0,2,4} (9 rows), zone1 = {1,3} (6)
    assert sorted(r["n"] for r in two) == [6, 9]
    assert sum(r["n"] for r in two) == 15

    # more zones than hbee splits → one zone per split (used_hcomb =
    # min(nb_hcomb, nb_hbee), query_planner.rs:112)
    many = engine.run(zones_query(99)).collect()
    assert sorted(r["n"] for r in many) == [3, 3, 3, 3, 3]


def test_multi_zone_partition_filter_prunes_before_split(spark, tmp_path):
    cat = mock_split_catalog(spark, tmp_path, n_files=5)
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(cat)
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT data_col FROM mock_split",
                    "name": "map_step",
                    "step_type": "HBee",
                    "partition_filter": "part_key_1>='part_value_004'",
                },
                {
                    "sql": "SELECT COUNT(data_col) AS n FROM map_step",
                    "name": "reduce_step",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 2},
            "catalogs": [],
        }
    )
    out = engine.run(q).collect()
    assert sorted(r["n"] for r in out) == [3, 3]


def test_multi_zone_group_by_is_per_zone(spark, tmp_path):
    """Zone semantics are the reference's, not a global shuffle: a group key
    spanning zones appears once per zone (the reference client sees exactly
    the per-comb batches)."""
    cat = mock_split_catalog(spark, tmp_path, n_files=4)
    engine = BuzzEngine(spark, strict=True)
    engine.register_source(cat)
    q = zones_query(
        2, "SELECT COUNT(*) AS n, SUM(data_col) AS s FROM map_step GROUP BY 'all'"
    )
    out = engine.run(q).collect()
    assert len(out) == 2  # one output row per zone
    assert sum(r["n"] for r in out) == 12


def test_reference_example_queries_parse_verbatim():
    """The reference's shipped example query JSONs (code/examples/*.json)
    must parse unchanged through the BuzzQuery front-end — the user-facing
    artifact a migrating user would bring along (models/query.rs:3-41
    field-for-field)."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from buzz_rust_spark.models import BuzzCatalogType, BuzzQuery

    examples = "/root/reference/code/examples"
    if not _os.path.isdir(examples):
        _pytest.skip("reference checkout not present")
    expected = {
        "query.json": BuzzCatalogType.STATIC,
        "query-delta-taxi.json": BuzzCatalogType.DELTA_LAKE,
        "query-static-sample.json": BuzzCatalogType.STATIC,
    }
    for fname, cat_type in expected.items():
        with open(_os.path.join(examples, fname)) as fh:
            q = BuzzQuery.from_json(fh.read())
        assert [s.step_type.value for s in q.steps] == ["HBee", "HComb"]
        assert q.steps[0].partition_filter  # every example prunes partitions
        assert q.catalogs[0].type is cat_type
        assert q.capacity.zones == 1
    # steps.json is the bare hbee-test step list (not a full BuzzQuery);
    # its steps parse through the same step model
    from buzz_rust_spark.models import BuzzStep

    with open(_os.path.join(examples, "steps.json")) as fh:
        steps = [BuzzStep.from_dict(s) for s in _json.load(fh)]
    assert steps and steps[0].step_type.value == "HBee"


def test_malformed_capacity_is_bad_request():
    import pytest as _pytest

    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.models import BuzzQuery

    step = {"name": "s0", "step_type": "HBee", "sql": "SELECT 1"}
    with _pytest.raises(BuzzBadRequestError, match="capacity"):
        BuzzQuery.from_dict({"steps": [step], "capacity": "big"})
    with _pytest.raises(BuzzBadRequestError, match="capacity"):
        BuzzQuery.from_dict({"steps": [step], "capacity": {"zones": "two"}})


def test_zoned_falls_back_when_reduce_reads_catalog_tables(spark, tmp_path):
    """Review fix: a reduce step referencing a catalog table under zones>1
    must fall back to single-zone execution (per-zone resolution would see
    only that zone's file subset) — and produce the single-zone result."""
    from buzz_rust_spark import BuzzEngine, BuzzQuery
    from buzz_rust_spark.queries.registry import load
    from buzz_rust_spark.sources.writer import catalog_from_written, write_parquet

    events = load(spark, "/root/testdata/sf0.001", "events").limit(200)
    path = str(tmp_path / "ev")
    # several files so zones>1 is actually viable
    write_parquet(events.repartition(4), path)
    cat = catalog_from_written("ev", path, events.schema)
    eng = BuzzEngine(spark)
    eng.register_source(cat)
    q = {
        "steps": [
            {"name": "s0", "step_type": "HBee",
             "sql": "SELECT user_id, COUNT(*) AS n FROM ev GROUP BY user_id"},
            # reduce ALSO reads 'ev' — correct only in single-zone execution
            {"name": "s1", "step_type": "HComb",
             "sql": "SELECT COUNT(*) AS users, (SELECT COUNT(*) FROM ev) AS raw "
                    "FROM s0"},
        ],
        "capacity": {"zones": 3},
    }
    rows = eng.run(BuzzQuery.from_dict(q)).collect()
    assert len(rows) == 1 and rows[0]["raw"] == 200


def test_stats_filter_on_query_json(spark, sf_dir):
    """stats_filter in the query JSON: applied to the catalog scan as a
    row predicate (result ≡ the same predicate in the step SQL), refused
    on HComb steps, and an unknown column surfaces as the typed plan
    error — on both the Static and ParquetDir catalog types."""
    import json

    engine = BuzzEngine(spark)
    engine.register_source(lineitem_catalog(sf_dir))

    def q(**step0_extra):
        return {
            "steps": [
                {
                    "sql": (
                        "SELECT l_returnflag, COUNT(*) AS n, "
                        "SUM(l_quantity) AS qty FROM lineitem "
                        "GROUP BY l_returnflag"
                    ),
                    "name": "m",
                    "step_type": "HBee",
                    **step0_extra,
                },
                {
                    "sql": (
                        "SELECT l_returnflag, SUM(n) AS n, SUM(qty) AS qty "
                        "FROM m GROUP BY l_returnflag ORDER BY l_returnflag"
                    ),
                    "name": "r",
                    "step_type": "HComb",
                },
            ],
        }

    expect = [
        (r.l_returnflag, r.n, r.qty)
        for r in engine.run_json(json.dumps({
            "steps": [
                {
                    "sql": (
                        "SELECT l_returnflag, COUNT(*) AS n, "
                        "SUM(l_quantity) AS qty FROM lineitem "
                        "WHERE l_quantity < 10 GROUP BY l_returnflag "
                        "ORDER BY l_returnflag"
                    ),
                    "name": "m",
                    "step_type": "HBee",
                },
            ],
        })).collect()
    ]
    got = [
        (r.l_returnflag, r.n, r.qty)
        for r in engine.run_json(
            json.dumps(q(stats_filter="l_quantity < 10"))
        ).collect()
    ]
    assert got == expect and len(got) == 3

    # ParquetDir catalog type takes the same surface
    pd_query = q(stats_filter="l_quantity < 10")
    pd_query["catalogs"] = [{
        "name": "lineitem", "type": "ParquetDir",
        "uri": os.path.join(sf_dir, "lineitem.parquet"),
    }]
    got_pd = [
        (r.l_returnflag, r.n, r.qty)
        for r in engine.run_json(json.dumps(pd_query)).collect()
    ]
    assert got_pd == expect

    # HComb steps cannot carry it
    bad = q()
    bad["steps"][1]["stats_filter"] = "n > 0"
    with pytest.raises(BuzzPlanError, match="stats_filter"):
        engine.run_json(json.dumps(bad))

    # unknown column → typed plan error, not a raw AnalysisException
    with pytest.raises(BuzzPlanError, match="stats_filter"):
        engine.run_json(json.dumps(q(stats_filter="no_such_col < 10")))
