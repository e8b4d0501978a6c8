"""Delta Change Data Feed on-disk writes (delta_writer) + the recorded-CDF
changelog read path (delta_catalog.read_delta_changelog).

PROTOCOL.md "Change Data Files": on a `delta.enableChangeDataFeed=true`
table, merge/delete commits emit `_change_data/` parquet carrying the data
columns plus `_change_type` (insert / delete / update_preimage /
update_postimage) and reference them with `cdc` actions
(`{path, partitionValues, size, dataChange: false}`).  The changelog
prefers the recorded files — minimal (no survivor churn) and cheaper (no
re-read of rewritten data files) — and falls back to the net per-file diff
whenever a window isn't fully expressible from the record.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.errors import BuzzBadRequestError
from buzz_rust_spark.sources.delta_catalog import (
    DeltaCatalog,
    read_delta_changelog,
)
from buzz_rust_spark.sources.delta_writer import (
    delete_delta,
    merge_delta,
    set_delta_properties,
    write_delta,
)

CDF_CONF = {"delta.enableChangeDataFeed": "true"}


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _actions(root: str, version: int) -> list[dict]:
    with open(os.path.join(root, "_delta_log", f"{version:020d}.json")) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _history(spark, root, configuration=None):
    """base write → merge (update 2 + insert 4) → cow delete 1 → dv delete 3."""
    write_delta(
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1),
        root, configuration=configuration,
    )  # v0
    merge_delta(
        spark, root, _df(spark, [(2, "B"), (4, "d")]).coalesce(1), on=["id"]
    )  # v1
    delete_delta(spark, root, "id = 1")  # v2 (cow)
    delete_delta(spark, root, "id = 3", mode="dv")  # v3 (dv)


def test_cdf_writes_change_files_and_actions(spark, tmp_path):
    """Every mutation commit on a CDF table carries cdc actions whose files
    parse as PLAIN parquet with the spec's columns (data + _change_type);
    the create protocol declares the changeDataFeed writer feature."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    _history(spark, root, configuration=CDF_CONF)

    proto = next(a["protocol"] for a in _actions(root, 0) if "protocol" in a)
    assert "changeDataFeed" in (proto.get("writerFeatures") or [])
    meta = next(a["metaData"] for a in _actions(root, 0) if "metaData" in a)
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"

    types_by_version = {}
    for v in (1, 2, 3):
        cdcs = [a["cdc"] for a in _actions(root, v) if "cdc" in a]
        assert cdcs, f"commit {v} lacks cdc actions"
        seen = set()
        for c in cdcs:
            assert c["path"].startswith("_change_data/")
            assert c["dataChange"] is False
            assert c["partitionValues"] == {}
            fpath = os.path.join(root, c["path"])
            assert c["size"] == os.path.getsize(fpath)
            tbl = pq.read_table(fpath)  # plain parquet, no delta machinery
            assert tbl.schema.names == ["id", "v", "_change_type"]
            seen |= set(tbl.column("_change_type").to_pylist())
        types_by_version[v] = seen
    assert types_by_version[1] == {
        "update_preimage", "update_postimage", "insert",
    }
    assert types_by_version[2] == {"delete"}
    assert types_by_version[3] == {"delete"}


def test_cdf_changelog_equals_netdiff_and_is_minimal(spark, tmp_path):
    """The recorded-CDF changelog and the net-diff changelog (same history
    on a non-CDF twin) both satisfy the MULTISET contract — and the CDF
    feed is MINIMAL: a cow rewrite's surviving rows never churn."""
    cdf_root = str(tmp_path / "cdf")
    raw_root = str(tmp_path / "raw")
    _history(spark, cdf_root, configuration=CDF_CONF)
    _history(spark, raw_root)

    def applied(root):
        cl = read_delta_changelog(spark, root, 0)
        base = DeltaCatalog("t", root, version=0).to_dataframe(spark)
        ins = cl.where("_change_type = 'insert'").drop("_change_type")
        dels = cl.where("_change_type = 'delete'").drop("_change_type")
        return sorted(
            (r.id, r.v)
            for r in base.unionAll(ins).exceptAll(dels).collect()
        )

    want = sorted(
        (r.id, r.v)
        for r in DeltaCatalog("t", cdf_root).to_dataframe(spark).collect()
    )
    assert applied(cdf_root) == want
    assert applied(raw_root) == want
    # minimality: exactly the logical changes, no survivor churn
    cdf_rows = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(spark, cdf_root, 0).collect()
    )
    assert cdf_rows == [
        (1, "a", "delete"),
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]
    # the net-diff twin carries churn where a rewrite has survivors: the
    # merge-only window rewrote the 3-row base file to update one row, so
    # the net diff surfaces 3 deletes + 4 inserts (survivors churned)
    # while the record carries exactly pre+post+insert = 3 rows
    assert read_delta_changelog(spark, raw_root, 0, to_version=1).count() == 7
    cdf_merge = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(
            spark, cdf_root, 0, to_version=1
        ).collect()
    )
    assert cdf_merge == [
        (2, "B", "insert"), (2, "b", "delete"), (4, "d", "insert"),
    ]


def test_cdf_window_with_plain_append_derives_inserts(spark, tmp_path):
    """A pure-add commit inside a CDF window has no cdc action (spec:
    derivable) — the recorded path surfaces its rows as inserts."""
    root = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), root,
                configuration=CDF_CONF)  # v0
    write_delta(_df(spark, [(2, "b")]).coalesce(1), root, mode="append")  # v1
    delete_delta(spark, root, "id = 1")  # v2 with cdc
    assert not any("cdc" in a for a in _actions(root, 1))
    rows = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(spark, root, 0).collect()
    )
    assert rows == [(1, "a", "delete"), (2, "b", "insert")]


def test_cdf_window_with_overwrite_falls_back_to_netdiff(spark, tmp_path):
    """An overwrite (remove+add, no cdc action) is not expressible from
    the record — the changelog must fall back to the net diff and stay
    multiset-correct."""
    root = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), root,
                configuration=CDF_CONF)  # v0
    delete_delta(spark, root, "id = 1")  # v1 with cdc
    write_delta(_df(spark, [(9, "z")]).coalesce(1), root, mode="overwrite")  # v2
    cl = read_delta_changelog(spark, root, 0)
    base = DeltaCatalog("t", root, version=0).to_dataframe(spark)
    ins = cl.where("_change_type = 'insert'").drop("_change_type")
    dels = cl.where("_change_type = 'delete'").drop("_change_type")
    got = sorted(
        (r.id, r.v) for r in base.unionAll(ins).exceptAll(dels).collect()
    )
    assert got == [(9, "z")]


def test_cdf_partitioned_actions_and_changelog(spark, tmp_path):
    """Partitioned CDF: change files partition like the table, cdc actions
    carry real partitionValues, and the recorded changelog re-attaches the
    partition column."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "p0"), (2, "b", "p1"), (3, "c", "p0")],
        "id long, v string, par string",
    )
    write_delta(df.coalesce(1), root, partition_by=["par"],
                configuration=CDF_CONF)  # v0
    delete_delta(spark, root, "par = 'p0' AND id = 1")  # v1
    cdcs = [a["cdc"] for a in _actions(root, 1) if "cdc" in a]
    assert cdcs and all(c["partitionValues"] == {"par": "p0"} for c in cdcs)
    rows = sorted(
        (r.id, r.v, r.par, r._change_type)
        for r in read_delta_changelog(spark, root, 0).collect()
    )
    assert rows == [(1, "a", "p0", "delete")]


def test_set_delta_properties_enables_cdf_with_protocol_upgrade(
    spark, tmp_path
):
    """Enabling CDF on an EXISTING legacy table commits the configuration
    AND the writer-4 protocol upgrade atomically; mutations from then on
    emit cdc.  Guards: columnMapping keys refused, empty call refused,
    create-time configuration drift refused on write_delta."""
    root = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), root)  # v0
    v = set_delta_properties(root, CDF_CONF)
    assert v == 1
    acts = _actions(root, 1)
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minWriterVersion"] == 4
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"
    delete_delta(spark, root, "id = 1")  # v2: emits cdc now
    assert any("cdc" in a for a in _actions(root, 2))
    rows = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(spark, root, 1).collect()
    )
    assert rows == [(1, "a", "delete")]
    # the upgraded table still reads and writes
    write_delta(_df(spark, [(5, "e")]).coalesce(1), root, mode="append")
    assert DeltaCatalog("t", root).to_dataframe(spark).count() == 2

    with pytest.raises(BuzzBadRequestError, match="columnMapping"):
        set_delta_properties(root, {"delta.columnMapping.mode": "name"})
    with pytest.raises(BuzzBadRequestError, match="nothing to do"):
        set_delta_properties(root)
    with pytest.raises(BuzzBadRequestError, match="creation-time|CREATE"):
        write_delta(
            _df(spark, [(9, "x")]).coalesce(1), root, mode="append",
            configuration={"delta.enableChangeDataFeed": "false"},
        )
    # a no-op restatement of the existing configuration passes
    write_delta(
        _df(spark, [(9, "x")]).coalesce(1), root, mode="append",
        configuration=CDF_CONF,
    )


def test_merge_delete_clause_records_delete_changes(spark, tmp_path):
    """when_matched='delete' records the dropped rows as _change_type
    'delete' (no pre/post images)."""
    root = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), root,
                configuration=CDF_CONF)
    merge_delta(
        spark, root, _df(spark, [(2, "anything")]).coalesce(1), on=["id"],
        when_matched="delete", when_not_matched=None,
    )
    rows = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(spark, root, 0).collect()
    )
    assert rows == [(2, "b", "delete")]


def test_writer_gate_refuses_constraints_and_invariants(spark, tmp_path):
    """Round-11 flip of the old refusal test: legacy tables USING CHECK
    constraints (v3, delta.constraints.*) or field invariants (v2) are now
    WRITABLE — the rules are ENFORCED on every staged frame
    (_enforce_table_rules): conforming rows commit, violating rows abort
    typed naming the rule, the table untouched."""
    from buzz_rust_spark.errors import BuzzConstraintError

    def mk(root, protocol, meta_extra=None, field_meta=None):
        os.makedirs(os.path.join(root, "_delta_log"))
        schema = {
            "type": "struct",
            "fields": [{
                "name": "id", "type": "long", "nullable": True,
                "metadata": field_meta or {},
            }],
        }
        actions = [
            {"protocol": protocol},
            {"metaData": {
                "id": "m", "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                **(meta_extra or {}),
            }},
        ]
        with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
            fh.writelines(json.dumps(a) + "\n" for a in actions)

    # v4 + CHECK constraint in use → ENFORCED: violating rows abort typed
    # (naming the constraint), conforming rows commit
    r1 = str(tmp_path / "t1")
    mk(r1, {"minReaderVersion": 1, "minWriterVersion": 4},
       {"configuration": {"delta.constraints.pos": "id > 0",
                          "delta.enableChangeDataFeed": "true"}})
    with pytest.raises(BuzzConstraintError, match="'pos'"):
        write_delta(
            spark.createDataFrame([(-1,)], "id long").coalesce(1), r1,
            mode="append",
        )
    assert write_delta(
        spark.createDataFrame([(5,)], "id long").coalesce(1), r1,
        mode="append",
    ) == 1

    # v2 + field invariant in use → ENFORCED the same way (null violates,
    # Delta's CheckDeltaInvariant null semantics)
    r2 = str(tmp_path / "t2")
    mk(r2, {"minReaderVersion": 1, "minWriterVersion": 2},
       field_meta={"delta.invariants": '{"expression":{"expression":"id > 0"}}'})
    with pytest.raises(BuzzConstraintError, match="invariant"):
        write_delta(
            spark.createDataFrame([(None,)], "id long").coalesce(1), r2,
            mode="append",
        )
    assert write_delta(
        spark.createDataFrame([(3,)], "id long").coalesce(1), r2,
        mode="append",
    ) == 1

    # v4 CDF-only (no constraints/invariants) still writes fine
    r3 = str(tmp_path / "t3")
    mk(r3, {"minReaderVersion": 1, "minWriterVersion": 4},
       {"configuration": {"delta.enableChangeDataFeed": "true"}})
    v = write_delta(
        spark.createDataFrame([(1,)], "id long").coalesce(1), r3,
        mode="append",
    )
    assert v == 1


def test_dv_upgrade_keeps_implied_changedatafeed(spark, tmp_path):
    """Review regression: a DV delete on a legacy-v4 CDF table upgrades to
    writer 7 — the implied changeDataFeed capability must be enumerated in
    writerFeatures, or external v7 writers stop emitting cdc actions
    while delta.enableChangeDataFeed stays set."""
    root = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, "a"), (2, "b")]).coalesce(1), root,
    )  # v0: plain writer-2
    set_delta_properties(root, CDF_CONF)  # v1: legacy writer-4 upgrade
    delete_delta(spark, root, "id = 1", mode="dv")  # v2: DV → writer 7
    proto = next(
        a["protocol"] for a in _actions(root, 2) if "protocol" in a
    )
    assert proto["minWriterVersion"] == 7
    assert "changeDataFeed" in proto["writerFeatures"]
    assert "deletionVectors" in proto["writerFeatures"]
    # and the DV delete itself recorded its change data
    assert any("cdc" in a for a in _actions(root, 2))


def test_changelog_recorded_path_skips_driver_dv_decode(
    spark, tmp_path, monkeypatch
):
    """Review regression: when the window is fully recorded (cdc actions),
    read_delta_changelog must not decode ANY deletion vector on the
    driver — the net-diff DV comparison is fallback-only work."""
    import buzz_rust_spark.sources.deletion_vectors as dvmod

    root = str(tmp_path / "t")
    _history(spark, root, configuration=CDF_CONF)  # includes a DV delete

    driver_pid = os.getpid()
    real = dvmod.read_dv_positions

    def _boom(store, dv):
        if os.getpid() == driver_pid:
            raise AssertionError(
                "read_dv_positions called on the DRIVER during a recorded "
                "CDF changelog read"
            )
        return real(store, dv)

    monkeypatch.setattr(dvmod, "read_dv_positions", _boom)
    rows = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(spark, root, 0).collect()
    )
    assert rows == [
        (1, "a", "delete"),
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]


def test_append_only_tables_enforced_not_refused(spark, tmp_path):
    """Review regression: delta.appendOnly is ENFORCED at the operation
    level — appends and insert-only merges stay legal on a legacy
    writer-2 append-only table, while delete / matched-merge / overwrite
    / restore refuse typed instead of silently emitting removes; and a
    clean legacy writer-3 table (constraint since dropped) is writable."""
    from buzz_rust_spark.sources.delta_writer import restore_delta

    root = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, "a")]).coalesce(1), root,
        configuration={"delta.appendOnly": "true"},
    )  # v0
    write_delta(_df(spark, [(2, "b")]).coalesce(1), root, mode="append")
    merge_delta(
        spark, root, _df(spark, [(3, "c")]).coalesce(1), on=["id"],
        when_matched=None, when_not_matched="insert",
    )  # insert-only merge: adds only — legal
    assert DeltaCatalog("t", root).to_dataframe(spark).count() == 3
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root, "id = 1")
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root, "id = 1", mode="dv")
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        merge_delta(
            spark, root, _df(spark, [(1, "A")]).coalesce(1), on=["id"]
        )
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        write_delta(
            _df(spark, [(9, "z")]).coalesce(1), root, mode="overwrite"
        )
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        restore_delta(spark, root, 0)
    assert DeltaCatalog("t", root).to_dataframe(spark).count() == 3

    # legacy writer-3 with NO constraint in use: accepted for writes
    r2 = str(tmp_path / "t3")
    os.makedirs(os.path.join(r2, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 3}},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {},
        }},
    ]
    with open(os.path.join(r2, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    assert write_delta(
        spark.createDataFrame([(1,)], "id long").coalesce(1), r2,
        mode="append",
    ) == 1


def test_dv_bulk_refusal_stages_no_change_files(spark, tmp_path):
    """Review regression: the max_dv_rows policy refusal runs BEFORE the
    change-data staging — a refused bulk DV delete on a CDF table leaves
    no orphaned _change_data files (and never pays the change scan)."""
    root = str(tmp_path / "t")
    write_delta(
        spark.range(10).selectExpr("id AS k").coalesce(1), root,
        configuration=CDF_CONF,
    )
    with pytest.raises(BuzzBadRequestError, match="max_dv_rows"):
        delete_delta(spark, root, "k >= 0", mode="dv", max_dv_rows=3)
    assert not glob.glob(os.path.join(root, "_change_data", "**", "*"),
                         recursive=True)
    assert not glob.glob(os.path.join(root, "deletion_vector_*.bin"))


def test_append_only_feature_form_and_v7_protocols(spark, tmp_path):
    """Third-review regressions: (a) a modern v7 appendOnly-feature table
    is accepted for appends and operation-enforced for removes; (b) a
    create with CDF+appendOnly lists BOTH features on its v7 protocol;
    (c) enabling appendOnly on an existing v7 table adds the feature."""
    # (a) handcrafted v7 feature-form appendOnly table
    root = str(tmp_path / "t7")
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["appendOnly"],
        }},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.appendOnly": "true"},
        }},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    ids = spark.createDataFrame([(1,)], "id long").coalesce(1)
    assert write_delta(ids, root, mode="append") == 1
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root, "id = 1")

    # (b) CDF + appendOnly at create → both features enumerated
    root2 = str(tmp_path / "t2")
    write_delta(
        _df(spark, [(1, "a")]).coalesce(1), root2,
        configuration={**CDF_CONF, "delta.appendOnly": "true"},
    )
    proto = next(a["protocol"] for a in _actions(root2, 0) if "protocol" in a)
    assert set(proto["writerFeatures"]) >= {"changeDataFeed", "appendOnly"}

    # (c) appendOnly set later on a v7 CDF table → feature added atomically
    root3 = str(tmp_path / "t3")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), root3,
                configuration=CDF_CONF)
    v = set_delta_properties(root3, {"delta.appendOnly": "true"})
    proto = next(a["protocol"] for a in _actions(root3, v) if "protocol" in a)
    assert "appendOnly" in proto["writerFeatures"]
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root3, "id = 1")


def test_append_only_create_race_overwrite_refused(spark, tmp_path):
    """Third-review regression: an overwrite that loses a CREATE race to
    an append-only winner must refuse typed in the retry — the entry gate
    never saw the winner's configuration."""
    from buzz_rust_spark.sources.write_store import LocalCommitStore

    root = str(tmp_path / "t")
    store = LocalCommitStore()
    fired = {}

    def seam(path):
        if not fired:
            fired["x"] = 1
            write_delta(
                _df(spark, [(1, "a")]).coalesce(1), root,
                configuration={"delta.appendOnly": "true"},
            )

    store.before_claim = seam
    from buzz_rust_spark.errors import BuzzCommitAbortedError

    # refresh-time concurrency refusals all carry the retry-abort type
    with pytest.raises(BuzzCommitAbortedError, match="APPEND-ONLY"):
        write_delta(
            _df(spark, [(9, "z")]).coalesce(1), root, mode="overwrite",
            store=store,
        )
    got = sorted(
        (r.id, r.v) for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "a")]  # the winner's append-only data survived


def test_nested_invariant_refused(spark, tmp_path):
    """Third-review regression: an invariant on a NESTED struct member is
    still an unenforceable hazard — the recursive scan must find it."""
    from buzz_rust_spark.errors import BuzzNotImplementedError

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "s", "nullable": True, "metadata": {}, "type": {
            "type": "struct", "fields": [
                {"name": "x", "type": "long", "nullable": True,
                 "metadata": {"delta.invariants":
                              '{"expression":{"expression":"x > 0"}}'}},
            ],
        }},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 3}},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {},
        }},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    with pytest.raises(BuzzNotImplementedError, match="invariants"):
        write_delta(
            spark.createDataFrame([((1,),)], "s struct<x: long>").coalesce(1),
            root, mode="append",
        )


def test_v7_mints_enumerate_active_capabilities_everywhere(spark, tmp_path):
    """Fourth-review regressions: every v7 protocol mint enumerates the
    capabilities the table keeps active — evolve_delta's typeWidening
    upgrade on a legacy appendOnly+CDF table must list both, and a
    FOREIGN v7 table whose delta.appendOnly property lacks the feature is
    INACTIVE: unrelated property changes must not activate it, and
    deletes must be allowed (spec conformance)."""
    from buzz_rust_spark.sources.delta_writer import evolve_delta

    root = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, 2)], "id long, n integer").coalesce(1),
        root,
        configuration={"delta.appendOnly": "true"},
    )  # legacy v2, property ACTIVE
    set_delta_properties(root, CDF_CONF)  # legacy v4 upgrade
    v = evolve_delta(root, promote_columns={"n": "long"})  # v7 typeWidening
    proto = next(a["protocol"] for a in _actions(root, v) if "protocol" in a)
    assert proto["minWriterVersion"] == 7
    assert set(proto["writerFeatures"]) >= {
        "typeWidening", "appendOnly", "changeDataFeed",
    }
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root, "id = 1")

    # foreign v7: property present, feature NOT listed → inactive
    root2 = str(tmp_path / "foreign")
    os.makedirs(os.path.join(root2, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["changeDataFeed"],
        }},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.appendOnly": "true",
                              "delta.enableChangeDataFeed": "true"},
        }},
    ]
    with open(os.path.join(root2, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    ids = spark.createDataFrame([(1,)], "id long").coalesce(1)
    write_delta(ids, root2, mode="append")
    # an unrelated property change must NOT activate the inactive flag
    v2 = set_delta_properties(root2, {"delta.checkpointInterval": "20"})
    protos = [a for a in _actions(root2, v2) if "protocol" in a]
    assert protos == []  # metadata-only commit, no protocol action
    # and the delete is LEGAL (inactive per the v7 feature rule)
    assert delete_delta(spark, root2, "id = 1") is not None
    # explicitly ACTIVATING it adds the feature and enforcement starts
    v3 = set_delta_properties(root2, {"delta.appendOnly": "true"})
    proto = next(a["protocol"] for a in _actions(root2, v3) if "protocol" in a)
    assert "appendOnly" in proto["writerFeatures"]
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root2, "id IS NOT NULL")


def test_map_key_nested_invariant_refused(spark, tmp_path):
    """Fourth-review regression: hazard metadata on a struct nested inside
    a map KEY is still unenforceable — the walk must descend key types."""
    from buzz_rust_spark.errors import BuzzNotImplementedError

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "m", "nullable": True, "metadata": {}, "type": {
            "type": "map",
            "keyType": {
                "type": "struct", "fields": [
                    {"name": "x", "type": "long", "nullable": False,
                     "metadata": {"delta.invariants":
                                  '{"expression":{"expression":"x > 0"}}'}},
                ],
            },
            "valueType": "long",
            "valueContainsNull": True,
        }},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 3}},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {},
        }},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    with pytest.raises(BuzzNotImplementedError, match="invariants"):
        write_delta(
            spark.createDataFrame(
                [({(1,): 2},)], "m map<struct<x: long>, long>"
            ).coalesce(1),
            root, mode="append",
        )


def _foreign_table(tmp_path, name, protocol, configuration):
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": protocol},
        {"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": configuration,
        }},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    return root


def test_rename_after_cdf_upgrade_mints_mapping_protocol(spark, tmp_path):
    """Fifth-review regression: a rename on a legacy writer-4 table (the
    set_delta_properties CDF upgrade) must mint the cumulative rv2/wv5
    protocol — leaving wv4 would let reader-1 engines resolve renamed
    logical names against old physical columns (silent nulls)."""
    from buzz_rust_spark.sources.delta_writer import evolve_delta

    root = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), root)  # v0 legacy wv2
    set_delta_properties(root, CDF_CONF)  # v1: legacy wv4
    v = evolve_delta(root, rename_columns={"v": "w"})  # mapping upgrade
    proto = next(a["protocol"] for a in _actions(root, v) if "protocol" in a)
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (2, 5)
    got = sorted(
        (r.id, r.w) for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert got == [(1, "a")]


def test_inactive_cdf_property_not_activated_or_recorded(spark, tmp_path):
    """Fifth-review regressions: a foreign table whose CDF property lacks
    protocol backing (v7 without the feature, or legacy wv2) is INACTIVE —
    an unrelated set_delta_properties call must not mint an activating
    protocol, and mutations must not emit cdc actions / change files."""
    for name, protocol in (
        ("v7", {"minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["deletionVectors"]}),
        ("v2", {"minReaderVersion": 1, "minWriterVersion": 2}),
    ):
        root = _foreign_table(
            tmp_path, name, protocol,
            {"delta.enableChangeDataFeed": "true"},
        )
        ids = spark.createDataFrame([(1,), (2,)], "id long").coalesce(1)
        write_delta(ids, root, mode="append")  # v1
        v = set_delta_properties(root, {"delta.checkpointInterval": "20"})
        assert not [a for a in _actions(root, v) if "protocol" in a]
        dv = delete_delta(spark, root, "id = 1")  # v3
        assert dv is not None
        assert not [a for a in _actions(root, dv) if "cdc" in a]
        assert not glob.glob(
            os.path.join(root, "_change_data", "**", "*"), recursive=True
        )


def test_delete_retry_aborts_on_concurrent_append_only_activation(
    spark, tmp_path
):
    """Fifth-review regression: appendOnly activation can be a
    PROTOCOL-only commit (feature added, property already set) that the
    metaData basis check cannot see — a lost-race delete must abort typed
    instead of committing removes on the newly-activated table."""
    from buzz_rust_spark.errors import BuzzCommitAbortedError
    from buzz_rust_spark.sources.write_store import LocalCommitStore

    root = _foreign_table(
        tmp_path, "t",
        {"minReaderVersion": 1, "minWriterVersion": 7,
         "writerFeatures": ["deletionVectors"]},
        {"delta.appendOnly": "true"},  # property set, feature absent
    )
    write_delta(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1),
        root, mode="append",
    )
    store = LocalCommitStore()
    fired = {}

    def seam(path):
        if not fired:
            fired["x"] = 1
            # activates append-only: protocol-only change
            set_delta_properties(root, {"delta.appendOnly": "true"})

    store.before_claim = seam
    # surfaces as the general protocol-drift abort (which subsumes the
    # appendOnly activation case)
    with pytest.raises(BuzzCommitAbortedError, match="protocol changed"):
        delete_delta(spark, root, "id = 1", store=store)
    assert DeltaCatalog("t", root).to_dataframe(spark).count() == 2
    # and once activated, a fresh delete refuses typed at entry
    with pytest.raises(BuzzBadRequestError, match="APPEND-ONLY"):
        delete_delta(spark, root, "id = 1")


def test_dv_delete_retry_aborts_on_concurrent_protocol_change(
    spark, tmp_path
):
    """Sixth-review regression (execution-confirmed): a dv-delete stages a
    protocol upgrade computed from the pre-race protocol; losing its claim
    to a concurrent PROTOCOL-only commit (e.g. a CDF activation) must
    abort — a retry would re-commit the stale protocol and roll back the
    winner's activation."""
    from buzz_rust_spark.errors import BuzzCommitAbortedError
    from buzz_rust_spark.sources.write_store import LocalCommitStore

    root = _foreign_table(
        tmp_path, "t",
        {"minReaderVersion": 1, "minWriterVersion": 7, "writerFeatures": []},
        {"delta.enableChangeDataFeed": "true"},  # property set, INACTIVE
    )
    write_delta(
        spark.createDataFrame([(1,), (2,)], "id long").coalesce(1),
        root, mode="append",
    )
    store = LocalCommitStore()
    fired = {}

    def seam(path):
        if not fired:
            fired["x"] = 1
            set_delta_properties(
                root, {"delta.enableChangeDataFeed": "true"}
            )  # protocol-only activation

    store.before_claim = seam
    with pytest.raises(BuzzCommitAbortedError, match="protocol changed"):
        delete_delta(spark, root, "id = 1", mode="dv", store=store)
    # the winner's activation SURVIVED
    import glob as g

    last = sorted(g.glob(os.path.join(root, "_delta_log", "*.json")))[-1]
    protos = [
        json.loads(ln)["protocol"]
        for ln in open(last)
        if '"protocol"' in ln
    ]
    assert protos and "changeDataFeed" in protos[0]["writerFeatures"]
    # re-run records change data now that CDF is active
    v = delete_delta(spark, root, "id = 1", mode="dv")
    assert any("cdc" in a for a in _actions(root, v))


def test_rename_on_reader1_writer6_bumps_reader_version(spark, tmp_path):
    """Sixth-review regression (execution-confirmed): a mapping upgrade on
    a foreign rv1/wv6 table must bump minReaderVersion to 2 — reader-1
    engines don't implement column mapping and would silently null-fill
    renamed columns."""
    from buzz_rust_spark.sources.delta_writer import evolve_delta

    root = _foreign_table(
        tmp_path, "t",
        {"minReaderVersion": 1, "minWriterVersion": 6},
        {},
    )
    ids = spark.createDataFrame([(1,)], "id long").coalesce(1)
    write_delta(ids, root, mode="append")
    v = evolve_delta(root, rename_columns={"id": "ident"})
    proto = next(a["protocol"] for a in _actions(root, v) if "protocol" in a)
    assert proto["minReaderVersion"] == 2
    assert proto["minWriterVersion"] == 6
    got = [r.ident for r in DeltaCatalog("t", root).to_dataframe(spark).collect()]
    assert got == [1]


# --- round 10: recorded CDF on column-mapped tables ---------------------------


def test_cdf_on_name_mapped_table_with_rename(spark, tmp_path):
    """Recorded CDF on a mode=name table with a rename mid-history: change
    files carry PHYSICAL column names (the reader maps them back), the
    feed stays MINIMAL (no survivor churn), and applying it over the base
    reproduces the final state — the net-diff fallback is gone."""
    from buzz_rust_spark.sources.delta_writer import evolve_delta

    root = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, "a"), (2, "b"), (3, "c")]), root,
        configuration=CDF_CONF,
    )
    # upgrade to columnMapping.mode=name via rename (v -> val)
    evolve_delta(root, rename_columns={"v": "val"})
    merge_delta(
        spark, root,
        spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
        .coalesce(1),
        on=["id"],
    )
    delete_delta(spark, root, "id = 1")
    cl = read_delta_changelog(spark, root, 0)
    rows = sorted((r.id, r.val, r._change_type) for r in cl.collect())
    # minimal: update pre+post for id 2, insert 4, delete 1 — id 3 (the
    # cow rewrite's survivor) never churns, proving the RECORDED path ran
    assert rows == [
        (1, "a", "delete"),
        (2, "B", "insert"),
        (2, "b", "delete"),
        (4, "d", "insert"),
    ]
    # the staged change files are physical-named
    import pyarrow.parquet as pq

    cfiles = glob.glob(os.path.join(root, "_change_data", "**", "*.parquet"),
                       recursive=True)
    assert cfiles
    meta_lines = []
    for cf in sorted(glob.glob(os.path.join(root, "_delta_log", "*.json"))):
        meta_lines += [json.loads(l) for l in open(cf) if l.strip()]
    sch_json = json.loads(
        [a["metaData"] for a in meta_lines if "metaData" in a][-1]
        ["schemaString"]
    )
    phys = {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in sch_json["fields"]
    }
    for cf in cfiles:
        names = set(pq.read_schema(cf).names)
        assert phys["val"] in names and "_change_type" in names
        assert "val" not in names or phys["val"] == "val"


def test_cdf_on_id_mapped_table(spark, tmp_path):
    """Recorded CDF on a mode=id table: change files re-stamp parquet
    field ids; the changelog resolves them by id and stays minimal."""
    import json as _json

    root = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root,
                configuration=CDF_CONF)
    # hand-flip to mode=id (physical == logical names, ids 1..2), then
    # stamp footer ids on the existing data files — spec-conformant shape
    logd = os.path.join(root, "_delta_log")
    lp = os.path.join(
        logd, sorted(f for f in os.listdir(logd) if f.endswith(".json"))[-1]
    )
    acts = [_json.loads(l) for l in open(lp) if l.strip()]
    for a in acts:
        if "metaData" in a:
            sch = _json.loads(a["metaData"]["schemaString"])
            for i, f in enumerate(sch["fields"], start=1):
                f["metadata"] = {
                    "delta.columnMapping.id": i,
                    "delta.columnMapping.physicalName": f["name"],
                }
            a["metaData"]["schemaString"] = _json.dumps(sch)
            cfg = dict(a["metaData"].get("configuration") or {})
            cfg.update({
                "delta.columnMapping.mode": "id",
                "delta.columnMapping.maxColumnId": "2",
            })
            a["metaData"]["configuration"] = cfg
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 2, "minWriterVersion": 5}
    open(lp, "w").write("".join(_json.dumps(a) + "\n" for a in acts))
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(root, "*.parquet")):
        t = pq.read_table(f)
        fields = [
            fld.with_metadata({b"PARQUET:field_id": str(i + 1).encode()})
            for i, fld in enumerate(t.schema)
        ]
        pq.write_table(t.cast(pa.schema(fields)), f)

    merge_delta(
        spark, root,
        _df(spark, [(2, "B"), (4, "d")]).coalesce(1),
        on=["id"],
    )
    delete_delta(spark, root, "id = 3")
    rows = sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changelog(spark, root, 0).collect()
    )
    assert rows == [
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]
    # staged change files carry footer field ids
    cfiles = glob.glob(os.path.join(root, "_change_data", "**", "*.parquet"),
                       recursive=True)
    assert cfiles
    for cf in cfiles:
        sch = pq.read_schema(cf)
        ids = {f.metadata.get(b"PARQUET:field_id") for f in sch if f.metadata}
        assert {b"1", b"2"} <= ids, f"{cf} lost ids"
