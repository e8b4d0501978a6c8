"""Delta deletion vectors (reader protocol 3): codec + snapshot semantics.

The tables are synthesized per the published spec (delta-spark is not a
dependency): parquet data files + hand-written ``_delta_log`` commits whose
``add`` actions carry DV descriptors, with the ``.bin`` sidecars framed
exactly as PROTOCOL.md describes (version byte, BE size, bitmap, CRC-32).
The reference never met DVs (delta-rs 0.2, delta_catalog.rs:33-48) — this is
parity with the CURRENT Delta ecosystem, not the reference snapshot."""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark import DeltaCatalog
from buzz_rust_spark.errors import BuzzExecutionError
from buzz_rust_spark.sources.deletion_vectors import (
    decode_bitmap_array,
    dv_relative_path,
    encode_bitmap_array,
    write_dv_file,
    z85_decode,
    z85_encode,
)

from test_delta import _schema_string, _write_commit, _write_part


# --- codec ------------------------------------------------------------------


def test_z85_spec_vector():
    # the ZeroMQ Z85 reference test case (spec 32)
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_bitmap_array_roundtrip_all_container_kinds():
    import random

    rng = random.Random(7)
    cases = [
        [],
        [0],
        [0, 1, 2, 4095, 4096, 65535, 65536, 70000],
        rng.sample(range(200_000), 9000),  # bitset containers (card > 4096)
        [5, (1 << 32) + 3, (3 << 32) + 11],  # multiple 32-bit bitmaps
    ]
    for case in cases:
        assert decode_bitmap_array(encode_bitmap_array(case)) == sorted(set(case))


def test_decode_run_containers():
    """The encoder never emits run containers, but real writers do —
    hand-build a SERIAL_COOKIE stream with one run container."""
    # bitmap with containers: key=0 run container of [10..14] + [100..100]
    body = struct.pack("<I", 12347 | (0 << 16))  # cookie, 1 container
    body += b"\x01"  # run flag bitset: container 0 is a run container
    body += struct.pack("<HH", 0, 5)  # key 0, cardinality-1 = 5
    # < NO_OFFSET_THRESHOLD containers with run cookie -> no offset header
    body += struct.pack("<H", 2)  # 2 runs
    body += struct.pack("<HH", 10, 4)  # 10..14
    body += struct.pack("<H", 100) + struct.pack("<H", 0)  # 100..100
    data = struct.pack("<iQ", 1681511377, 1) + body
    assert decode_bitmap_array(data) == [10, 11, 12, 13, 14, 100]


# --- table fixtures ----------------------------------------------------------


def _meta_action(partitioned: bool = False) -> dict:
    return {
        "metaData": {
            "id": "dv-table",
            "schemaString": _schema_string(partitioned=partitioned),
            "partitionColumns": ["year"] if partitioned else [],
            "format": {"provider": "parquet"},
        }
    }


_PROTO_DV = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}


def _add(path: str, dv: dict | None = None, pv: dict | None = None) -> dict:
    a = {"path": path, "size": 1, "partitionValues": pv or {}, "dataChange": True}
    if dv is not None:
        a["deletionVector"] = dv
    return {"add": a}


def make_dv_table(spark, root: str, storage: str = "p") -> str:
    """rows eng..ops x4 in one file; delete row indexes 1 and 3."""
    table = os.path.join(root, f"delta-dv-{storage}")
    os.makedirs(table, exist_ok=True)
    rows = [("keep0", 0), ("drop1", 1), ("keep2", 2), ("drop3", 3)]
    _write_part(spark, os.path.join(table, "f0.parquet"), rows)
    positions = [1, 3]
    if storage == "p":
        dv = write_dv_file(os.path.join(table, "dv0.bin"), positions)
    elif storage == "u":
        u = uuid.uuid4()
        dv_name = f"deletion_vector_{u}.bin"
        dv = dict(
            write_dv_file(os.path.join(table, dv_name), positions),
            storageType="u",
            pathOrInlineDv=z85_encode(u.bytes),
        )
    else:  # inline
        data = encode_bitmap_array(positions)
        dv = {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data),
            "offset": None,
            "sizeInBytes": len(data),
            "cardinality": len(positions),
        }
    log = os.path.join(table, "_delta_log")
    _write_commit(log, 0, [_meta_action(), _add("f0.parquet")])
    _write_commit(
        log, 1, [_PROTO_DV, _add("f0.parquet", dv), {"remove": {"path": "f0.parquet", "dataChange": True}}]
    )
    return table


@pytest.mark.parametrize("storage", ["p", "u", "i"])
def test_dv_filters_deleted_rows(spark, tmp_path, storage):
    table = make_dv_table(spark, str(tmp_path), storage)
    df = DeltaCatalog("t", table).to_dataframe(spark)
    assert sorted(r.dept_name for r in df.collect()) == ["keep0", "keep2"]
    # schema identical to a DV-less read (helper columns dropped)
    assert df.columns == ["dept_name", "dept_staff"]


def test_dv_update_commit_add_before_remove(spark, tmp_path):
    """A DV delete commit may order [add(path, dv), remove(path)] — the
    replay must apply removes before adds within the commit (the spec keys
    entries by (path, dvId)), or the file vanishes entirely."""
    table = make_dv_table(spark, str(tmp_path), "p")
    # make_dv_table writes add-then-remove already; assert rows survived
    df = DeltaCatalog("t", table).to_dataframe(spark)
    assert df.count() == 2


def test_dv_time_travel_sees_pre_delete_snapshot(spark, tmp_path):
    table = make_dv_table(spark, str(tmp_path), "p")
    assert DeltaCatalog("t", table, version=0).to_dataframe(spark).count() == 4
    assert DeltaCatalog("t", table, version=1).to_dataframe(spark).count() == 2


def test_dv_uuid_path_resolution():
    u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
    enc = z85_encode(u.bytes)
    assert dv_relative_path({"pathOrInlineDv": enc}) == f"deletion_vector_{u}.bin"
    assert (
        dv_relative_path({"pathOrInlineDv": "ab" + enc})
        == f"ab/deletion_vector_{u}.bin"
    )


def test_dv_partitioned_with_pruning(spark, tmp_path):
    table = os.path.join(str(tmp_path), "dv-part")
    os.makedirs(table, exist_ok=True)
    _write_part(spark, os.path.join(table, "f2020.parquet"), [("a", 1), ("b", 2)])
    _write_part(spark, os.path.join(table, "f2021.parquet"), [("c", 3), ("d", 4)])
    dv = write_dv_file(os.path.join(table, "dv2020.bin"), [0])  # drops ("a",1)
    log = os.path.join(table, "_delta_log")
    _write_commit(
        log,
        0,
        [
            _meta_action(partitioned=True),
            _PROTO_DV,
            _add("f2020.parquet", dv, {"year": "2020"}),
            _add("f2021.parquet", None, {"year": "2021"}),
        ],
    )
    cat = DeltaCatalog("t", table)
    full = cat.to_dataframe(spark)
    assert sorted((r.dept_name, r.year) for r in full.collect()) == [
        ("b", "2020"),
        ("c", "2021"),
        ("d", "2021"),
    ]
    pruned = cat.to_dataframe(spark, partition_filter="year = '2020'")
    assert [r.dept_name for r in pruned.collect()] == ["b"]
    pruned_other = cat.to_dataframe(spark, partition_filter="year = '2021'")
    assert sorted(r.dept_name for r in pruned_other.collect()) == ["c", "d"]


def test_dv_crc_corruption_is_typed_error(spark, tmp_path):
    table = make_dv_table(spark, str(tmp_path), "p")
    with open(os.path.join(table, "dv0.bin"), "r+b") as fh:
        fh.seek(7)  # inside the bitmap data
        b = fh.read(1)
        fh.seek(7)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(BuzzExecutionError, match="checksum"):
        DeltaCatalog("t", table).to_dataframe(spark).collect()


def test_dv_cardinality_mismatch_is_typed_error(spark, tmp_path):
    table = os.path.join(str(tmp_path), "dv-card")
    os.makedirs(table, exist_ok=True)
    _write_part(spark, os.path.join(table, "f0.parquet"), [("a", 1), ("b", 2)])
    dv = write_dv_file(os.path.join(table, "dv0.bin"), [0])
    dv["cardinality"] = 7
    log = os.path.join(table, "_delta_log")
    _write_commit(log, 0, [_meta_action(), _PROTO_DV, _add("f0.parquet", dv)])
    with pytest.raises(BuzzExecutionError, match="cardinality"):
        DeltaCatalog("t", table).to_dataframe(spark).collect()


def test_dv_size_tamper_is_typed_error(spark, tmp_path):
    table = make_dv_table(spark, str(tmp_path), "p")
    # descriptor sizeInBytes inflated vs the file's BE size field
    log_path = os.path.join(table, "_delta_log", "00000000000000000001.json")
    lines = [json.loads(l) for l in open(log_path) if l.strip()]
    for a in lines:
        if "add" in a:
            a["add"]["deletionVector"]["sizeInBytes"] += 4
    with open(log_path, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(BuzzExecutionError, match="size mismatch|overruns"):
        DeltaCatalog("t", table).to_dataframe(spark).collect()


def test_dv_changes_window_refused(spark, tmp_path):
    """An add carrying a DV inside the change window is a row-level delete —
    the append-only incremental feed must refuse it loudly."""
    from buzz_rust_spark.sources.delta_catalog import read_delta_changes

    table = os.path.join(str(tmp_path), "dv-changes")
    os.makedirs(table, exist_ok=True)
    _write_part(spark, os.path.join(table, "f0.parquet"), [("a", 1), ("b", 2)])
    dv = write_dv_file(os.path.join(table, "dv0.bin"), [0])
    log = os.path.join(table, "_delta_log")
    _write_commit(log, 0, [_meta_action(), _PROTO_DV, _add("f0.parquet")])
    _write_commit(log, 1, [_add("f0.parquet", dv)])
    # window before the DV commit is fine
    assert read_delta_changes(spark, table, from_version=-1, to_version=0).count() == 2
    with pytest.raises(BuzzExecutionError, match="deletion vectors"):
        read_delta_changes(spark, table, from_version=0).count()


def test_dv_large_bitmap_positions(spark, tmp_path):
    """A DV whose bitmap needs a bitset container (cardinality > 4096)
    decodes and filters correctly end-to-end."""
    table = os.path.join(str(tmp_path), "dv-big")
    os.makedirs(table, exist_ok=True)
    n = 12000
    rows = [(f"r{i}", i) for i in range(n)]
    _write_part(spark, os.path.join(table, "f0.parquet"), rows)
    deleted = list(range(0, n, 2))  # 6000 > 4096 in one 16-bit container
    dv = write_dv_file(os.path.join(table, "dv0.bin"), deleted)
    log = os.path.join(table, "_delta_log")
    _write_commit(log, 0, [_meta_action(), _PROTO_DV, _add("f0.parquet", dv)])
    got = DeltaCatalog("t", table).to_dataframe(spark)
    survivors = set(range(n)) - set(deleted)
    assert got.count() == len(survivors)
    assert {r.dept_staff for r in got.collect()} == survivors


# --- writer-side DV deletes --------------------------------------------------


def _fresh_table(spark, root, name, n=8, partitioned=False):
    from buzz_rust_spark.sources import write_delta

    table = os.path.join(root, name)
    # coalesce: multi-row files, so DV deletes are partial (a fresh
    # spark.range on local[32] would write one single-row file per row)
    df = spark.range(n).coalesce(2).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS par"
    )
    write_delta(df, table, partition_by=["par"] if partitioned else None)
    return table


def test_delete_dv_end_to_end(spark, tmp_path):
    """mode='dv' deletes rows without rewriting any data file, upgrades the
    protocol, and our own writer keeps working on the upgraded table."""
    import glob as g

    from buzz_rust_spark.sources import write_delta
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    before = sorted(g.glob(os.path.join(table, "*.parquet")))
    v = delete_delta(spark, table, "k IN (1, 5)", mode="dv")
    assert v == 1
    # no data file rewritten or added
    assert sorted(g.glob(os.path.join(table, "*.parquet"))) == before
    assert g.glob(os.path.join(table, "deletion_vector_*.bin"))
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [0, 2, 3, 4, 6, 7]
    # time travel to the pre-delete snapshot still sees all rows
    assert DeltaCatalog("t", table, version=0).to_dataframe(spark).count() == 8
    # writer still accepts the table after its own protocol upgrade
    write_delta(
        spark.range(100, 102).selectExpr("id AS k", "'x' AS par"), table, mode="append"
    )
    assert DeltaCatalog("t", table).to_dataframe(spark).count() == 8


def test_delete_dv_second_delete_merges_positions(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k = 1", mode="dv") == 1
    assert delete_delta(spark, table, "k = 3", mode="dv") == 2
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [0, 2, 4, 5, 6, 7]


def test_delete_dv_already_deleted_is_noop(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k = 2", mode="dv") == 1
    assert delete_delta(spark, table, "k = 2", mode="dv") is None
    assert delete_delta(spark, table, "k = 99", mode="dv") is None


def test_delete_dv_full_file_leaves_snapshot(spark, tmp_path):
    """Deleting every row of a file removes it outright — no add with an
    all-rows DV lingers."""
    from buzz_rust_spark.sources.delta_writer import _log_state, delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=6)
    assert delete_delta(spark, table, "k >= 0", mode="dv") == 1
    _, live, _ = _log_state(os.path.join(table, "_delta_log"))
    assert live == {}
    assert DeltaCatalog("t", table).to_dataframe(spark).count() == 0


def test_cow_delete_on_dv_table_purges(spark, tmp_path):
    """A copy-on-write delete on a DV-carrying table applies the existing
    vectors before rewriting — no resurrection."""
    from buzz_rust_spark.sources.delta_writer import _log_state, delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k = 1", mode="dv") == 1
    assert delete_delta(spark, table, "k = 2", mode="cow") == 2
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [0, 3, 4, 5, 6, 7]
    _, live, _ = _log_state(os.path.join(table, "_delta_log"))
    assert not any(
        (a.get("deletionVector") or {}).get("storageType") for a in live.values()
    )


def test_optimize_purges_dv_and_vacuum_reclaims(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import (
        _log_state,
        delete_delta,
        optimize_delta,
        vacuum_delta,
    )

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k IN (0, 7)", mode="dv") == 1
    assert optimize_delta(spark, table) == 2
    _, live, _ = _log_state(os.path.join(table, "_delta_log"))
    assert live and not any(
        (a.get("deletionVector") or {}).get("storageType") for a in live.values()
    )
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [1, 2, 3, 4, 5, 6]
    removed = vacuum_delta(table, retention_hours=0.0)
    # the now-unreferenced sidecar ages out with the replaced parquet files
    assert any(r.startswith("deletion_vector_") for r in removed)
    assert sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect()) == got


def test_vacuum_keeps_live_sidecar(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import delete_delta, vacuum_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k = 3", mode="dv") == 1
    removed = vacuum_delta(table, retention_hours=0.0)
    assert not any(r.startswith("deletion_vector_") for r in removed)
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [0, 1, 2, 4, 5, 6, 7]


def test_checkpoint_preserves_dv(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import _write_checkpoint, delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k IN (2, 6)", mode="dv") == 1
    _write_checkpoint(os.path.join(table, "_delta_log"), 1)
    # DeltaCatalog replays FROM the checkpoint (no JSON commits after it) —
    # the DV must survive the parquet round-trip
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [0, 1, 3, 4, 5, 7]


def test_delete_dv_partitioned_predicate(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8, partitioned=True)
    assert delete_delta(spark, table, "par = '1' AND k < 4", mode="dv") == 1
    got = sorted(r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect())
    assert got == [0, 2, 4, 5, 6, 7]


def test_delete_dv_bulk_guard(spark, tmp_path):
    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    with pytest.raises(BuzzBadRequestError, match="cow"):
        delete_delta(spark, table, "k >= 0", mode="dv", max_dv_rows=3)


def test_writer_gate_refuses_unknown_writer_features(spark, tmp_path):
    from buzz_rust_spark.errors import BuzzNotImplementedError
    from buzz_rust_spark.sources import write_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=4)
    _write_commit(
        os.path.join(table, "_delta_log"),
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors", "collations"],
                }
            }
        ],
    )
    with pytest.raises(BuzzNotImplementedError, match="collations"):
        write_delta(spark.range(1).selectExpr("id AS k", "'x' AS par"), table, mode="append")


# --- review-fix regressions --------------------------------------------------


def test_writer_log_state_add_before_remove(spark, tmp_path):
    """The WRITER's replay must also apply removes before adds within a
    commit — a stale path-keyed in-order replay would mark a live file dead
    and vacuum would delete it (data loss)."""
    from buzz_rust_spark.sources.delta_writer import _log_state, vacuum_delta

    table = make_dv_table(spark, str(tmp_path), "p")  # commit 1: [add, remove]
    _, live, _ = _log_state(os.path.join(table, "_delta_log"))
    assert set(live) == {"f0.parquet"}
    assert vacuum_delta(table, retention_hours=0.0) == []  # live file protected


def test_truncated_bitmap_is_typed_error():
    data = encode_bitmap_array([1, 5, 70000])
    with pytest.raises(BuzzExecutionError, match="truncated|corrupt"):
        decode_bitmap_array(data[:-3])
    with pytest.raises(BuzzExecutionError, match="truncated|corrupt|magic|short"):
        decode_bitmap_array(data[:13])


def test_dv_changes_realistic_commit_gets_dv_error(spark, tmp_path):
    """A real DV DELETE commit (remove + re-add with DV) must produce the
    deletion-vector diagnosis, not the generic 'overwrite' one."""
    from buzz_rust_spark.sources.delta_catalog import read_delta_changes

    table = make_dv_table(spark, str(tmp_path), "p")
    with pytest.raises(BuzzExecutionError, match="deletion vectors"):
        read_delta_changes(spark, table, from_version=0).count()


def test_dv_many_partition_groups_uses_manifest_join(spark, tmp_path):
    """A DV table with more distinct partition tuples than the union cap
    still returns correct rows (manifest-join fallback)."""
    n_parts = 40
    table = os.path.join(str(tmp_path), "dv-many")
    os.makedirs(table, exist_ok=True)
    actions = [_meta_action(partitioned=True), _PROTO_DV]
    for i in range(n_parts):
        rel = f"f{i}.parquet"
        _write_part(
            spark, os.path.join(table, rel), [(f"a{i}", i), (f"b{i}", 1000 + i)]
        )
        dv = write_dv_file(os.path.join(table, f"dv{i}.bin"), [0])  # drop a{i}
        actions.append(_add(rel, dv, {"year": str(2000 + i)}))
    _write_commit(os.path.join(table, "_delta_log"), 0, actions)
    cat = DeltaCatalog("t", table)
    assert cat.DV_UNION_MAX_GROUPS < n_parts
    df = cat.to_dataframe(spark)
    rows = sorted((r.dept_name, r.year) for r in df.collect())
    assert rows == sorted((f"b{i}", str(2000 + i)) for i in range(n_parts))
    # plan stays bounded: ONE parquet scan node, not one per partition
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2


def test_column_mapped_table_with_dv(spark, tmp_path):
    """Modern tables combine columnMapping AND deletionVectors: the DV
    filter applies on the physical scan, the rename presents logical names,
    and both compose through one snapshot read."""
    from test_delta import _make_column_mapped_table

    table = _make_column_mapped_table(spark, str(tmp_path))
    # delete row 0 of f1.parquet ("eng") via a DV update commit
    dv = write_dv_file(os.path.join(table, "dv1.bin"), [0])
    _write_commit(
        os.path.join(table, "_delta_log"),
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping", "deletionVectors"],
                    "writerFeatures": ["columnMapping", "deletionVectors"],
                }
            },
            {"remove": {"path": "f1.parquet", "dataChange": True}},
            {
                "add": {
                    "path": "f1.parquet",
                    "size": 1,
                    "dataChange": True,
                    "partitionValues": {},
                    "deletionVector": dv,
                }
            },
        ],
    )
    df = DeltaCatalog("cm", table).to_dataframe(spark)
    assert df.columns == ["team_name", "staff"]
    rows = {r.team_name: r.staff for r in df.collect()}
    assert rows == {"ops": 5, "sci": 12}  # "eng" deleted, names logical
    # time travel below the DV commit still sees all rows
    assert DeltaCatalog("cm", table, version=0).to_dataframe(spark).count() == 3


def test_dv_table_through_engine_query_json(spark, tmp_path):
    """A deletion-vector table consumed through the reference's two-step
    BuzzQuery JSON front-end: the aggregate sees only the live rows."""
    from buzz_rust_spark import BuzzEngine, BuzzQuery
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=8)
    assert delete_delta(spark, table, "k IN (0, 1, 2)", mode="dv") == 1
    engine = BuzzEngine(spark, strict=True)
    q = BuzzQuery.from_dict(
        {
            "steps": [
                {
                    "sql": "SELECT par, SUM(k) AS total FROM t GROUP BY par",
                    "name": "map",
                    "step_type": "HBee",
                },
                {
                    "sql": "SELECT par, SUM(total) AS total FROM map GROUP BY par",
                    "name": "reduce",
                    "step_type": "HComb",
                },
            ],
            "capacity": {"zones": 1},
            "catalogs": [{"name": "t", "type": "DeltaLake", "uri": table}],
        }
    )
    rows = {(r["par"], r["total"]) for r in engine.run(q).collect()}
    # survivors: k in 3..7 → par '1': 3+5+7=15, par '0': 4+6=10
    assert rows == {("1", 15), ("0", 10)}


def test_dv_executor_side_construction_multi_file(spark, tmp_path):
    """The DV build is distributed: matched coordinates repartition by file
    and tasks write their own sidecars — a delete spanning several files
    commits per-file descriptors that read back exactly, the policy guard
    counts NEW matches only, and a refused delete unlinks its staged
    sidecars."""
    from glob import glob

    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.sources.delta_writer import delete_delta, write_delta

    root = str(tmp_path / "t")
    # 4 files × 25 rows (repartition by a file-aligned key)
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "k long, g long"
    ).repartition(4, "g")
    write_delta(df, root)

    # delete k % 5 == 0 → 20 rows across all 4 files
    assert delete_delta(spark, root, "k % 5 = 0", mode="dv") == 1
    got = sorted(
        r.k for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == sorted(k for k in range(100) if k % 5)

    # second DV delete MERGES with the existing vectors; new_rows counts
    # only the fresh matches (8 rows: k%5!=0 and k%12==0 → 12,24,36,48,...)
    assert delete_delta(spark, root, "k % 12 = 0", mode="dv") == 2
    got = sorted(
        r.k for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == sorted(k for k in range(100) if k % 5 and k % 12)

    # policy refusal unlinks the staged sidecars (nothing references them)
    before = set(glob(os.path.join(root, "deletion_vector_*.bin")))
    with pytest.raises(BuzzBadRequestError, match="cow"):
        delete_delta(spark, root, "k >= 0", mode="dv", max_dv_rows=3)
    assert set(glob(os.path.join(root, "deletion_vector_*.bin"))) == before
    # and the guard counts NEW matches, not merged cardinality: deleting 2
    # more rows under max_dv_rows=3 succeeds even though the merged
    # vectors hold far more
    assert delete_delta(
        spark, root, "k IN (1, 2)", mode="dv", max_dv_rows=3
    ) == 3
    got = sorted(
        r.k for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == sorted(k for k in range(3, 100) if k % 5 and k % 12)


def test_delete_dv_never_decodes_existing_dvs_on_driver(
    spark, tmp_path, monkeypatch
):
    """Verdict regression (round-8 weak flag): a DV delete over a table
    with ACCUMULATED deletion vectors must not decode any existing vector
    on the driver — after N un-compacted deletes the accumulated positions
    are O(N × matched rows).  Seam: read_dv_positions poisoned in the
    DRIVER process only (executor python workers import the real module),
    so any driver-side decode fails loudly.  The delete must still merge
    old + new positions correctly."""
    import buzz_rust_spark.sources.deletion_vectors as dvmod
    from buzz_rust_spark.sources.delta_writer import delete_delta

    table = _fresh_table(spark, str(tmp_path), "t", n=12)
    assert delete_delta(spark, table, "k = 1", mode="dv") == 1
    assert delete_delta(spark, table, "k = 3", mode="dv") == 2

    # the seam travels into executor closures by value (cloudpickle), so
    # gate on the DRIVER's pid: executor python workers are separate
    # processes and fall through to the real decode
    driver_pid = os.getpid()
    real_fn = dvmod.read_dv_positions

    def _boom(store, dv):
        if os.getpid() == driver_pid:
            raise AssertionError(
                "read_dv_positions called on the DRIVER — existing-DV "
                "decode must be executor-side"
            )
        return real_fn(store, dv)

    monkeypatch.setattr(dvmod, "read_dv_positions", _boom)
    assert delete_delta(spark, table, "k IN (5, 7)", mode="dv") == 3
    # noop re-delete: already-deleted rows anti-joined without driver decode
    assert delete_delta(spark, table, "k = 1", mode="dv") is None
    monkeypatch.undo()
    got = sorted(
        r.k for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    )
    assert got == [0, 2, 4, 6, 8, 9, 10, 11]


def test_optimize_group_selection_membership_only(spark, tmp_path, monkeypatch):
    """optimize_delta's group selection needs only DV MEMBERSHIP: with no
    group selected for compaction it must return None without decoding a
    single vector (driver or otherwise); with a DV group selected it
    decodes ONLY the compacted files' vectors."""
    import buzz_rust_spark.sources.delta_writer as dw
    from buzz_rust_spark.sources import write_delta
    from buzz_rust_spark.sources.delta_writer import delete_delta, optimize_delta

    # table A: one big-enough single file per partition, no DVs → None,
    # and _dv_positions_by_rel must not be reached at all
    table = os.path.join(str(tmp_path), "a")
    write_delta(spark.range(4).coalesce(1).selectExpr("id AS k"), table)
    calls = []
    real = dw._dv_positions_by_rel

    def counting(table_dir, live):
        calls.append(dict(live))
        return real(table_dir, live)

    monkeypatch.setattr(dw, "_dv_positions_by_rel", counting)
    assert optimize_delta(spark, table, target_file_bytes=10) is None
    assert calls == []  # no compaction candidates → zero decode work

    # table B: two partitions, DV on one — only that partition's files decode
    table_b = _fresh_table(spark, str(tmp_path), "b", n=8, partitioned=True)
    delete_delta(spark, table_b, "k = 2", mode="dv")  # k=2 → par '0'
    calls.clear()
    v = optimize_delta(spark, table_b, target_file_bytes=1)  # only DV group
    assert v is not None
    assert len(calls) == 1
    assert all("par=0" in rel for rel in calls[0])
    got = sorted(
        r.k for r in DeltaCatalog("b", table_b).to_dataframe(spark).collect()
    )
    assert got == [0, 1, 3, 4, 5, 6, 7]
