"""MERGE INTO / DELETE on the Delta write path (copy-on-write rewrites).

The reference's Delta support is read-only (delta_catalog.rs:33-48); merge and
delete are rebuild sink extensions — the mutation primitives behind
incremental pipelines.  These tests check upsert/delete semantics, that only
files containing matching keys are rewritten (stats-pruned copy-on-write),
and that every prior version stays time-travelable.
"""

from __future__ import annotations

import json
import os
from glob import glob

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.errors import BuzzBadRequestError, BuzzSchemaError
from buzz_rust_spark.sources import (
    DeltaCatalog,
    delete_delta,
    merge_delta,
    write_delta,
)


def _rows(spark, table_uri, version=None):
    df = DeltaCatalog("t", table_uri, version=version).to_dataframe(spark)
    return sorted((r["k"], r["v"]) for r in df.collect())


def _mk(spark, rows, parts=1):
    return spark.createDataFrame(rows, "k INT, v STRING").coalesce(parts)


def _live_paths(table_uri):
    log_dir = os.path.join(table_uri, "_delta_log")
    live = {}
    for commit in sorted(glob(os.path.join(log_dir, "*.json"))):
        with open(commit) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
    return live


@pytest.fixture()
def two_file_table(spark, tmp_path):
    """Two commits → two files with disjoint key ranges (1-3 and 10-12)."""
    uri = str(tmp_path / "t")
    write_delta(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), uri)
    write_delta(_mk(spark, [(10, "x"), (11, "y"), (12, "z")]), uri)
    return uri


def test_merge_upsert_updates_and_inserts(spark, two_file_table):
    src = _mk(spark, [(2, "B!"), (99, "new")])
    v = merge_delta(spark, two_file_table, src, on=["k"])
    assert v == 2
    assert _rows(spark, two_file_table) == [
        (1, "a"),
        (2, "B!"),
        (3, "c"),
        (10, "x"),
        (11, "y"),
        (12, "z"),
        (99, "new"),
    ]
    # the pre-merge snapshot is still readable
    assert _rows(spark, two_file_table, version=1) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (10, "x"),
        (11, "y"),
        (12, "z"),
    ]


def test_merge_rewrites_only_touched_files(spark, two_file_table):
    before = _live_paths(two_file_table)
    # keys 2,99 overlap only the first file's [1,3] stats range
    merge_delta(spark, two_file_table, _mk(spark, [(2, "B!"), (99, "n")]), on=["k"])
    after = _live_paths(two_file_table)
    untouched = [p for p in before if p in after]
    assert untouched, "the 10-12 file must survive the merge unrewritten"
    st = json.loads(after[untouched[0]]["stats"])
    assert st["minValues"]["k"] == 10  # the surviving file is the cold one


def test_merge_matched_delete(spark, two_file_table):
    v = merge_delta(
        spark,
        two_file_table,
        _mk(spark, [(1, "?"), (11, "?")]),
        on=["k"],
        when_matched="delete",
        when_not_matched=None,
    )
    assert v == 2
    assert _rows(spark, two_file_table) == [(2, "b"), (3, "c"), (10, "x"), (12, "z")]


def test_merge_insert_only_does_not_rewrite(spark, two_file_table):
    before = set(_live_paths(two_file_table))
    v = merge_delta(
        spark,
        two_file_table,
        _mk(spark, [(2, "ignored"), (50, "new")]),
        on=["k"],
        when_matched=None,
        when_not_matched="insert",
    )
    assert v == 2
    # matched row untouched, unmatched inserted, no file removed
    assert _rows(spark, two_file_table)[:2] == [(1, "a"), (2, "b")]
    assert (50, "new") in _rows(spark, two_file_table)
    assert before <= set(_live_paths(two_file_table))


def test_merge_no_match_no_insert_is_noop(spark, two_file_table):
    v = merge_delta(
        spark,
        two_file_table,
        _mk(spark, [(77, "nope")]),
        on=["k"],
        when_not_matched=None,
    )
    assert v is None
    assert len(_rows(spark, two_file_table)) == 6


def test_merge_duplicate_source_keys_rejected(spark, two_file_table):
    with pytest.raises(BuzzBadRequestError, match="duplicate"):
        merge_delta(
            spark, two_file_table, _mk(spark, [(5, "a"), (5, "b")]), on=["k"]
        )


def test_merge_schema_mismatch_rejected(spark, two_file_table):
    bad = spark.createDataFrame([(1, 2)], "k INT, v INT")
    with pytest.raises(BuzzSchemaError):
        merge_delta(spark, two_file_table, bad, on=["k"])


def test_merge_partitioned_roundtrips_partition_values(spark, tmp_path):
    uri = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "us", "a"), (2, "eu", "b"), (3, "us", "c")], "k INT, region STRING, v STRING"
    )
    write_delta(df, uri, partition_by=["region"])
    src = spark.createDataFrame(
        [(1, "us", "A!"), (9, "eu", "new")], "k INT, region STRING, v STRING"
    )
    merge_delta(spark, uri, src, on=["k"])
    got = sorted(
        (r["k"], r["region"], r["v"])
        for r in DeltaCatalog("p", uri).to_dataframe(spark).collect()
    )
    assert got == [(1, "us", "A!"), (2, "eu", "b"), (3, "us", "c"), (9, "eu", "new")]
    # partition values present on every live add action
    for add in _live_paths(uri).values():
        assert "region" in add["partitionValues"]


def test_delete_removes_matching_rows(spark, two_file_table):
    v = delete_delta(spark, two_file_table, "k >= 11")
    assert v == 2
    assert _rows(spark, two_file_table) == [(1, "a"), (2, "b"), (3, "c"), (10, "x")]
    # pre-delete version still travels
    assert len(_rows(spark, two_file_table, version=1)) == 6


def test_delete_leaves_cold_files_alone(spark, two_file_table):
    before = _live_paths(two_file_table)
    delete_delta(spark, two_file_table, "k = 1")
    after = _live_paths(two_file_table)
    survivors = [p for p in before if p in after]
    assert survivors, "the file without matches must not be rewritten"
    st = json.loads(after[survivors[0]]["stats"])
    assert st["minValues"]["k"] == 10


def test_delete_no_match_is_noop(spark, two_file_table):
    assert delete_delta(spark, two_file_table, "k = 1000") is None
    assert len(_rows(spark, two_file_table)) == 6


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    uri = str(tmp_path / "n")
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "k INT, v STRING")
    write_delta(df.coalesce(1), uri)
    delete_delta(spark, uri, "v = 'a'")
    # the NULL-evaluating row (v IS NULL → predicate NULL) must survive
    assert _rows(spark, uri) == [(2, None), (3, "c")]


def test_delete_bad_predicate_rejected(spark, two_file_table):
    with pytest.raises(BuzzBadRequestError, match="predicate"):
        delete_delta(spark, two_file_table, "no_such_column = 1")


def test_merge_schema_mode_merge_reconciles_drift(spark, tmp_path):
    """merge_delta(schema_mode='merge'): a CDC source carrying a NEW
    column evolves it into the table mid-upsert (pre-existing rows read
    NULL), and a source MISSING a nullable column null-fills it — with
    the documented full-row semantics: the updated row's missing column
    becomes NULL.  Strict mode still refuses the same drift."""
    import pytest

    from buzz_rust_spark.errors import BuzzSchemaError
    from buzz_rust_spark.sources import merge_delta, write_delta
    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog

    table = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        ).coalesce(1),
        table,
    )
    src = spark.createDataFrame(
        [(2, "B2", 7.5), (3, "c", 1.0)], "id long, v string, score double"
    ).coalesce(1)
    with pytest.raises(BuzzSchemaError, match="mismatch"):
        merge_delta(spark, table, src, on=["id"])
    merge_delta(spark, table, src, on=["id"], schema_mode="merge")
    rows = {
        (r.id, r.v, r.score)
        for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    }
    assert rows == {(1, "a", None), (2, "B2", 7.5), (3, "c", 1.0)}

    # source missing v: the updated row's v becomes NULL (full-row upsert)
    src2 = spark.createDataFrame([(3, 9.0)], "id long, score double").coalesce(1)
    merge_delta(spark, table, src2, on=["id"], schema_mode="merge")
    rows = {
        (r.id, r.v, r.score)
        for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    }
    assert rows == {(1, "a", None), (2, "B2", 7.5), (3, None, 9.0)}
