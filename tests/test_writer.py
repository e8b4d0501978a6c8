"""Write→manifest→catalog→pruned-read round-trip (reference test pattern:
parquet.rs:273-355 'write then read', plus partition pruning on the result)."""

from __future__ import annotations

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


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


def test_zorder_key_matches_python_reference(spark):
    """The JVM bit-interleave must equal a Python Morton-code reference."""
    from buzz_rust_spark.sources.writer import zorder_key

    def morton(x, y, bits=8):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out

    rows = [(x, y) for x in (0, 1, 5, 77, 255) for y in (0, 2, 9, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key(["x", "y"], bits=8)
    )
    for r in df.collect():
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Files written on the z-curve must have tight min/max on BOTH columns:
    a point-ish filter on either dimension skips most files, which a plain
    single-column sort cannot achieve for its trailing column."""
    import pyarrow.parquet as pq

    from buzz_rust_spark.queries.registry import load
    from buzz_rust_spark.sources.writer import write_zordered

    sf_dir = "/root/testdata/sf0.01"
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .where("l_partkey < 4096 AND l_suppkey < 4096")
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], bits=8, records_per_file=2000)

    from glob import glob

    files = sorted(glob(zpath + "/*.parquet"))
    assert len(files) >= 8, "need multiple files for a pruning statement"

    def files_hit(col, lo, hi):
        hit = 0
        for f in files:
            md = pq.read_metadata(f)
            fmin = min(md.row_group(i).column(md.schema.names.index(col)).statistics.min
                       for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(md.schema.names.index(col)).statistics.max
                       for i in range(md.num_row_groups))
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit

    n = len(files)
    # A narrow band on EITHER dimension must skip at least half the files.
    assert files_hit("l_partkey", 100, 120) <= n // 2
    assert files_hit("l_suppkey", 40, 42) <= n // 2
    # and the data survives intact
    assert spark.read.parquet(zpath).count() == li.count()


def test_zonemap_prunes_zordered_catalog(spark, tmp_path):
    """Zone-map pruning over a Z-ordered layout: a band predicate on either
    clustered dimension shrinks the catalog's file list, and the pruned scan
    plus the real filter returns exactly the full scan's matching rows."""
    import os
    from glob import glob

    from buzz_rust_spark.queries.registry import load
    from buzz_rust_spark.sources import CatalogFile, StaticCatalog
    from buzz_rust_spark.sources.writer import write_zordered
    from buzz_rust_spark.sources.zonemap import (
        collect_file_stats,
        prune_catalog_by_stats,
    )

    li = (
        load(spark, "/root/testdata/sf0.01", "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .where("l_partkey < 4096 AND l_suppkey < 4096")
    )
    zpath = str(tmp_path / "zmap")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], bits=8, records_per_file=2000)
    paths = sorted(glob(zpath + "/*.parquet"))
    cat = StaticCatalog(
        name="li",
        schema=spark.read.parquet(zpath).schema,
        files=[CatalogFile(key=p, length=os.path.getsize(p)) for p in paths],
    )

    pruned = prune_catalog_by_stats(cat, [("l_partkey", "between", (100, 120))])
    assert len(pruned.files) <= len(cat.files) // 2  # real skipping
    got = (
        pruned.to_dataframe(spark)
        .where("l_partkey BETWEEN 100 AND 120")
        .groupBy()
        .sum("l_quantity")
        .first()[0]
    )
    want = (
        li.where("l_partkey BETWEEN 100 AND 120").groupBy().sum("l_quantity").first()[0]
    )
    assert got == want

    # stats reuse + unprunable column always survives
    stats = collect_file_stats(paths, ["l_partkey", "nope"])
    survivors = prune_catalog_by_stats(
        cat, [("nope", ">", 1_000_000)], stats=stats
    )
    assert len(survivors.files) == len(cat.files)

    # equality and open-ended ops
    few = prune_catalog_by_stats(cat, [("l_suppkey", "=", 41)], stats=None)
    assert 0 < len(few.files) < len(cat.files)
    rows = few.to_dataframe(spark).where("l_suppkey = 41").count()
    assert rows == li.where("l_suppkey = 41").count()


def test_scan_manifest_decodes_partition_values_and_rejects_bad_layout(spark, tmp_path):
    """Review fix: Spark URL-encodes special chars in partition dirs
    (date=2009%2F06); the manifest must carry the decoded value or filters
    silently match nothing.  A non-hive layout raises a typed error."""
    import pytest

    from buzz_rust_spark.errors import BuzzPlanError
    from buzz_rust_spark.sources.writer import scan_manifest, write_parquet

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "2009/06"), (2, "2009/07")], ["v", "date"])
    write_parquet(df, path, partition_by=["date"])
    files = scan_manifest(path, ["date"])
    vals = sorted(dict(f.partitions)["date"] for f in files)
    assert vals == ["2009/06", "2009/07"]  # decoded, not 2009%2F06
    # a hive dir named for a DIFFERENT column than declared is a typed error
    wrong = str(tmp_path / "wrong")
    spark.createDataFrame([(1, "x")], ["v", "other"]).write.partitionBy(
        "other"
    ).parquet(wrong)
    with pytest.raises(BuzzPlanError, match="hive-style"):
        scan_manifest(wrong, ["date"])


def test_join_attach_matches_url_encoded_paths(spark, tmp_path):
    """Review fix: input_file_name() percent-encodes special path chars; the
    join-attach strategy must still match manifest keys (and a real miss now
    raises instead of yielding silent NULL partition values)."""
    import shutil

    from buzz_rust_spark.sources import CatalogFile, StaticCatalog

    d = tmp_path / "dir with space"
    d.mkdir()
    spark.createDataFrame([(1,), (2,)], ["v"]).coalesce(1).write.parquet(str(d / "p"))
    part = next((d / "p").glob("*.parquet"))
    target = d / "data file.parquet"
    shutil.copy(part, target)
    cat = StaticCatalog(
        name="t",
        schema=spark.createDataFrame([(1,)], ["v"]).schema,
        files=[CatalogFile(key=str(target), length=target.stat().st_size,
                           partitions=(("pcol", "A"),))],
        partition_cols=["pcol"],
        attach_strategy="join",
    )
    rows = cat.to_dataframe(spark).collect()
    assert sorted(r["v"] for r in rows) == [1, 2]
    assert all(r["pcol"] == "A" for r in rows)


def test_zonemap_tolerates_null_and_cross_type_stats():
    """Review fix: half-open intervals (external logs with null min/max) and
    cross-type comparisons keep the file instead of raising."""
    from buzz_rust_spark.sources.manifest import CatalogFile
    from buzz_rust_spark.sources.zonemap import prune_files_by_stats

    files = [CatalogFile(key="a", length=1), CatalogFile(key="b", length=1)]
    stats = {"a": {"x": (None, 10)}, "b": {"x": ("str", "str")}}
    # int predicate: file a has a null bound, file b has string stats —
    # both must survive conservatively
    kept = prune_files_by_stats(files, stats, [("x", "=", 5)])
    assert [f.key for f in kept] == ["a", "b"]


def test_stats_conjunct_extraction_domains():
    """The zone-map conjunct extraction keeps integer literals EXACT
    (float() rounds past 2^53 — a rounded equality bound could wrongly
    prune the file holding the matching long), maps IN lists to the
    any-candidate op, and drops mixed-domain terms."""
    from buzz_rust_spark.sources.zonemap import (
        _may_match,
        stats_conjuncts_from_sql,
    )

    big = 2**53 + 1  # 9007199254740993; float() collapses it to 2^53
    conjs = stats_conjuncts_from_sql(f"id = {big}")
    assert conjs == [("id", "=", big)] and isinstance(conjs[0][2], int)
    assert _may_match((big, big), "=", conjs[0][2]) is True
    assert _may_match((big, big), "=", float(big)) is False  # the old bug

    assert stats_conjuncts_from_sql("x IN (1, 2.5)") == [
        ("x", "in", [1, 2.5])
    ]  # ints and floats share the numeric domain
    assert stats_conjuncts_from_sql("x IN (1, 'a')") == []  # mixed domains
    assert stats_conjuncts_from_sql("x < 10 OR y < 2") == []  # not a conjunction


def test_delta_stats_filter_never_prunes_temporal_columns(spark, tmp_path):
    """The Delta zone-map domain guard: quoted literals on TIMESTAMP
    columns never prune (external logs serialize temporal stats as ISO
    strings whose lexicographic order diverges from the casted
    comparison) — the scan result still equals the plain where()."""
    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog
    from buzz_rust_spark.sources.delta_writer import write_delta

    table = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, timestampadd(HOUR, CAST(id AS INT), "
        "TIMESTAMP'2024-06-15 00:00:00') AS ts FROM range(48)"
    )
    write_delta(df.repartition(4), table)
    cat = DeltaCatalog("t", table)
    full = cat.to_dataframe(spark)
    pred = "ts < '2024-06-15 23:00:00'"
    got = cat.to_dataframe(spark, stats_filter=pred)
    # no pruning on the temporal column — every file still scanned...
    assert len(got.inputFiles()) == len(full.inputFiles())
    # ...and the rows are exactly the where() rows
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in full.where(pred).collect()
    )


def test_zonemap_stats_collection_is_concurrent(spark, tmp_path, monkeypatch):
    """Round-10: collect_file_stats overlaps footer reads past SERIAL_MAX.
    Seam: _footer_stats blocks on a 2-party barrier — concurrent calls
    release each other; a serial regression deadlocks the barrier and the
    test fails with BrokenBarrierError."""
    import threading

    from buzz_rust_spark.sources import zonemap

    d = tmp_path / "files"
    d.mkdir()
    paths = []
    for i in range(zonemap.SERIAL_MAX + 4):
        p = str(d / f"f{i}.parquet")
        spark.createDataFrame([(i,)], "x long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + ".dir")
        import glob as g
        import shutil

        shutil.move(g.glob(p + ".dir/part-*.parquet")[0], p)
        shutil.rmtree(p + ".dir")
        paths.append(p)

    barrier = threading.Barrier(2, timeout=30)
    real = zonemap._footer_stats

    def gated(path, cols):
        barrier.wait()  # raises BrokenBarrierError if never 2-concurrent
        return real(path, cols)

    monkeypatch.setattr(zonemap, "_footer_stats", gated)
    zonemap._STATS_CACHE.clear()
    stats = zonemap.collect_file_stats(paths, ["x"])
    assert all(stats[p].get("x") is not None for p in paths)


def test_zonemap_stats_cache_and_distributed_job(spark, tmp_path, monkeypatch):
    """The per-path memo makes the second collection footer-free, and the
    distributed path (forced via SPARK_JOB_MIN=1) returns identical stats
    with exact type fidelity."""
    from buzz_rust_spark.sources import zonemap

    d = tmp_path / "files2"
    d.mkdir()
    paths = []
    for i in range(4):
        p = str(d / f"g{i}.parquet")
        spark.createDataFrame(
            [(i * 10, f"s{i}")], "x long, s string"
        ).coalesce(1).write.mode("overwrite").parquet(p + ".dir")
        import glob as g
        import shutil

        shutil.move(g.glob(p + ".dir/part-*.parquet")[0], p)
        shutil.rmtree(p + ".dir")
        paths.append(p)

    zonemap._STATS_CACHE.clear()
    first = zonemap.collect_file_stats(paths, ["x", "s"])
    assert first[paths[1]]["x"] == (10, 10)
    assert first[paths[2]]["s"] == ("s2", "s2")

    # second call: memoized — the footer reader must not run at all
    def boom(path, cols):
        raise AssertionError("footer re-read despite cache")

    monkeypatch.setattr(zonemap, "_footer_stats", boom)
    again = zonemap.collect_file_stats(paths, ["x", "s"])
    assert again == first
    monkeypatch.undo()

    # distributed job (forced low threshold): same stats, exact types
    zonemap._STATS_CACHE.clear()
    monkeypatch.setattr(zonemap, "SPARK_JOB_MIN", 1)
    dist = zonemap.collect_file_stats(paths, ["x", "s"], spark=spark)
    assert dist == first
    assert isinstance(dist[paths[0]]["x"][0], int)
