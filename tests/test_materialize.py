"""Incremental materialized aggregates (sources/materialize.py): the
changelog consumer — bootstrap, retractable refresh, exactly-once cursor,
drift detection, and the delta-source path."""

from __future__ import annotations

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from buzz_rust_spark.errors import (
    BuzzBadRequestError,
    BuzzExecutionError,
)
from buzz_rust_spark.sources.materialize import (
    read_materialization,
    refresh_materialization,
)


def _rows(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _state(spark, tgt):
    return sorted(
        (r.g, r.n_rows, r.sum_v)
        for r in read_materialization(spark, tgt).collect()
    )


def test_matview_iceberg_lifecycle(spark, tmp_path):
    """Bootstrap → append/merge/delete refreshes → group death (tombstone
    filtered) → revival, each state equal to a full recompute."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        _rows(spark, [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
              "id long, g string, v double"),
        src,
    )
    out = refresh_materialization(spark, src, tgt, ["g"], ["v"])
    assert out["bootstrapped"] is True
    assert _state(spark, tgt) == [("a", 2, 30.0), ("b", 1, 30.0)]
    # unchanged source: no commit
    assert refresh_materialization(spark, src, tgt, ["g"], ["v"]) is None

    write_iceberg(
        _rows(spark, [(4, "b", 40.0)], "id long, g string, v double"),
        src, mode="append",
    )
    merge_iceberg(
        spark, src,
        _rows(spark, [(1, "a", 100.0)], "id long, g string, v double"),
        ["id"],
    )
    delete_iceberg(spark, src, "id = 3")
    out = refresh_materialization(spark, src, tgt, ["g"], ["v"])
    assert out["groups_updated"] == 2
    assert _state(spark, tgt) == [("a", 2, 120.0), ("b", 1, 40.0)]

    # every refresh must equal the full recompute of the source
    full = sorted(
        (r.g, r.n, r.s)
        for r in IcebergCatalog("s", src)
        .to_dataframe(spark)
        .groupBy("g")
        .agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count("*")
            .cast("long").alias("n"),
            __import__("pyspark.sql.functions", fromlist=["F"]).sum("v")
            .alias("s"),
        )
        .collect()
    )
    assert _state(spark, tgt) == full

    # group death: delete all of b → tombstone, filtered from reads
    delete_iceberg(spark, src, "id = 4")
    refresh_materialization(spark, src, tgt, ["g"], ["v"])
    assert _state(spark, tgt) == [("a", 2, 120.0)]
    # revival from the tombstone
    write_iceberg(
        _rows(spark, [(7, "b", 7.0)], "id long, g string, v double"),
        src, mode="append",
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"])
    assert _state(spark, tgt) == [("a", 2, 120.0), ("b", 1, 7.0)]


def test_matview_delta_source(spark, tmp_path):
    from buzz_rust_spark.sources.delta_writer import (
        delete_delta,
        merge_delta,
        write_delta,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_delta(
        _rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "b", 3.0)],
              "id long, g string, v double"),
        src,
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"], source_format="delta")
    assert _state(spark, tgt) == [("a", 1, 1.0), ("b", 2, 5.0)]
    merge_delta(
        spark, src,
        _rows(spark, [(2, "b", 200.0), (9, "a", 9.0)],
              "id long, g string, v double"),
        on=["id"],
    )
    delete_delta(spark, src, "id = 3")
    refresh_materialization(spark, src, tgt, ["g"], ["v"], source_format="delta")
    assert _state(spark, tgt) == [("a", 2, 10.0), ("b", 1, 200.0)]


def test_matview_spec_and_drift_guards(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import (
        set_iceberg_properties,
        write_iceberg,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        _rows(spark, [(1, "a", 1.0)], "id long, g string, v double"), src
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"])
    # a different spec against the same target is refused
    with pytest.raises(BuzzBadRequestError, match="spec mismatch"):
        refresh_materialization(spark, src, tgt, ["g"])
    # group/sum overlap refused
    with pytest.raises(BuzzBadRequestError, match="both"):
        refresh_materialization(spark, src, str(tmp_path / "mv2"), ["g"], ["g"])
    # a non-materialization iceberg table is refused as a target
    with pytest.raises(BuzzExecutionError, match="cursor"):
        refresh_materialization(spark, src, src, ["g"], ["v"])
    # cursor drift: rewind the cursor so the changelog replays rows the
    # state already counted in the OTHER direction — a delete of rows
    # never counted must trip the negative-count guard, not go silent
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import delete_iceberg

    first = IcebergCatalog("s", src).history()[-1]["snapshot_id"]
    delete_iceberg(spark, src, "id = 1")
    refresh_materialization(spark, src, tgt, ["g"], ["v"])  # state: a dead
    set_iceberg_properties(tgt, {"buzz.matview.cursor": str(first)})
    with pytest.raises(BuzzExecutionError, match="drift"):
        refresh_materialization(spark, src, tgt, ["g"], ["v"])


def test_matview_cursor_atomic_with_merge(spark, tmp_path):
    """The cursor advances in the SAME commit as the state merge: after a
    refresh, the target's current metadata carries both; a replayed
    refresh (same source position) is a no-op."""
    import glob
    import json as _json
    import os

    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        _rows(spark, [(1, "a", 1.0)], "id long, g string, v double"), src
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"])
    write_iceberg(
        _rows(spark, [(2, "a", 2.0)], "id long, g string, v double"),
        src, mode="append",
    )
    out = refresh_materialization(spark, src, tgt, ["g"], ["v"])
    meta = _json.load(open(sorted(
        glob.glob(os.path.join(tgt, "metadata", "v*.metadata.json"))
    )[-1]))
    assert meta["properties"]["buzz.matview.cursor"] == out["cursor"]
    # the merge snapshot and the cursor landed in ONE metadata version:
    # the previous version's properties still hold the OLD cursor
    prev = _json.load(open(sorted(
        glob.glob(os.path.join(tgt, "metadata", "v*.metadata.json"))
    )[-2]))
    assert prev["properties"]["buzz.matview.cursor"] != out["cursor"]
    assert refresh_materialization(spark, src, tgt, ["g"], ["v"]) is None


def test_matview_pins_reads_at_recorded_cursor(spark, tmp_path, monkeypatch):
    """Review regression: reads are pinned at the position the refresh
    RECORDS — a source commit landing between the position read and the
    scan must be applied exactly once (by the NEXT refresh), never twice.
    Simulated by pinning _source_position one commit behind."""
    import buzz_rust_spark.sources.materialize as mat
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        _rows(spark, [(1, "a", 1.0)], "id long, g string, v double"), src
    )
    snap1 = IcebergCatalog("s", src).history()[-1]["snapshot_id"]
    write_iceberg(
        _rows(spark, [(2, "a", 2.0)], "id long, g string, v double"),
        src, mode="append",
    )

    real = mat._source_position
    monkeypatch.setattr(
        mat, "_source_position", lambda *a, **k: snap1
    )
    out = mat.refresh_materialization(spark, src, tgt, ["g"], ["v"])
    # bootstrap pinned at snap1: the later commit must NOT be in the state
    assert out["cursor"] == str(snap1)
    assert _state(spark, tgt) == [("a", 1, 1.0)]
    monkeypatch.setattr(mat, "_source_position", real)
    # the later commit applies exactly once on the next refresh
    mat.refresh_materialization(spark, src, tgt, ["g"], ["v"])
    assert _state(spark, tgt) == [("a", 2, 3.0)]
    # and it never applies again
    assert mat.refresh_materialization(spark, src, tgt, ["g"], ["v"]) is None
    assert _state(spark, tgt) == [("a", 2, 3.0)]


def test_matview_concurrent_refresh_cannot_double_apply(spark, tmp_path):
    """Advice regression: two refreshes that both read cursor C must not
    both apply the (C, pos] window.  Reproduced deterministically: the
    second refresh's changelog read fires a NESTED full refresh first
    (advancing the cursor), so its merge commits against a moved cursor —
    the expect_properties CAS must raise the typed abort instead of
    double-counting."""
    import buzz_rust_spark.sources.materialize as mat
    from buzz_rust_spark.errors import BuzzCommitAbortedError
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        _rows(spark, [(1, "a", 1.0)], "id long, g string, v double"), src
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"])
    write_iceberg(
        _rows(spark, [(2, "a", 2.0)], "id long, g string, v double"),
        src, mode="append",
    )

    real = mat._read_source_changelog
    state = {"fired": False}

    def interleaved(spark_, source_uri, source_format, cursor, upto):
        if not state["fired"]:
            state["fired"] = True
            # the concurrent refresh wins the window while we hold cursor C
            refresh_materialization(spark, src, tgt, ["g"], ["v"])
        return real(spark_, source_uri, source_format, cursor, upto)

    mat._read_source_changelog = interleaved
    try:
        with pytest.raises(BuzzCommitAbortedError, match="buzz.matview.cursor"):
            refresh_materialization(spark, src, tgt, ["g"], ["v"])
    finally:
        mat._read_source_changelog = real
    # applied exactly once, and the table is settled
    assert _state(spark, tgt) == [("a", 2, 3.0)]
    assert refresh_materialization(spark, src, tgt, ["g"], ["v"]) is None


def test_matview_concurrent_zero_delta_refresh_cas(spark, tmp_path):
    """The zero-delta cursor advance takes the same CAS: a concurrent
    refresh that already moved the cursor aborts the stale one's
    metadata-only advance too (a blind set could leap the cursor past a
    window whose delta was applied by the winner, un-anchoring the next
    window)."""
    import buzz_rust_spark.sources.materialize as mat
    from buzz_rust_spark.errors import BuzzCommitAbortedError
    from buzz_rust_spark.sources.iceberg_writer import (
        rewrite_iceberg,
        write_iceberg,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        _rows(spark, [(1, "a", 1.0)], "id long, g string, v double"), src
    )
    refresh_materialization(spark, src, tgt, ["g"], ["v"])
    # an EMPTY-changelog window: a compaction-only (replace) commit — the
    # changelog skips replace snapshots, so the delta frame has NO rows
    # and the refresh takes the metadata-only cursor-advance path
    rewrite_iceberg(spark, src)

    real = mat._read_source_changelog
    state = {"fired": False}

    def interleaved(spark_, source_uri, source_format, cursor, upto):
        if not state["fired"]:
            state["fired"] = True
            refresh_materialization(spark, src, tgt, ["g"], ["v"])
        return real(spark_, source_uri, source_format, cursor, upto)

    mat._read_source_changelog = interleaved
    try:
        with pytest.raises(BuzzCommitAbortedError, match="buzz.matview.cursor"):
            refresh_materialization(spark, src, tgt, ["g"], ["v"])
    finally:
        mat._read_source_changelog = real
    assert _state(spark, tgt) == [("a", 1, 1.0)]
    assert refresh_materialization(spark, src, tgt, ["g"], ["v"]) is None


def test_matview_minmax_hybrid_lifecycle(spark, tmp_path):
    """min/max maintenance: incremental under inserts, targeted rescan
    when a retraction touches the extremum, duplicate-extremum deletes,
    tombstone NULLing, and revival — each state equal to a recompute."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])

    def state():
        return sorted(
            (r.g, r.n_rows, r.min_v, r.max_v)
            for r in read_materialization(spark, tgt).collect()
        )

    def recompute():
        return sorted(
            (r.g, r.n, r.mn, r.mx)
            for r in IcebergCatalog("s", src)
            .to_dataframe(spark)
            .groupBy("g")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
            .collect()
        )

    # duplicate extremum: two rows share min 5.0 in group a
    write_iceberg(
        _rows(spark, [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 9.0),
                      (4, "b", 7.0)],
              "id long, g string, v double"),
        src,
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert state() == recompute()
    # insert-only window: incremental least/greatest (no rescan needed)
    write_iceberg(
        _rows(spark, [(5, "a", 1.0)], "id long, g string, v double"),
        src, mode="append",
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert state() == recompute() == [
        ("a", 4, 1.0, 9.0), ("b", 1, 7.0, 7.0),
    ]
    # delete ONE of the duplicate minima after deleting the new min: the
    # rescan must find min still 5.0 (the surviving duplicate)
    delete_iceberg(spark, src, "id IN (5, 1)")
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert state() == recompute() == [
        ("a", 2, 5.0, 9.0), ("b", 1, 7.0, 7.0),
    ]
    # CDC update moving the max down (delete 9 + insert 2 in the window)
    merge_iceberg(
        spark, src,
        _rows(spark, [(3, "a", 2.0)], "id long, g string, v double")
        .coalesce(1),
        ["id"],
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert state() == recompute() == [
        ("a", 2, 2.0, 5.0), ("b", 1, 7.0, 7.0),
    ]
    # group death then revival
    delete_iceberg(spark, src, "g = 'b'")
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert state() == [("a", 2, 2.0, 5.0)]
    write_iceberg(
        _rows(spark, [(9, "b", 4.0)], "id long, g string, v double"),
        src, mode="append",
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert state() == recompute()
    # spec compatibility: a min/max target refuses a plain refresh
    with pytest.raises(BuzzBadRequestError, match="spec mismatch"):
        refresh_materialization(spark, src, tgt, ["g"], ["v"])


def test_matview_minmax_rescan_is_targeted(spark, tmp_path, monkeypatch):
    """The rescan reads the pinned source ONLY when some group's extremum
    was retracted — an insert-only window must not touch the source."""
    import buzz_rust_spark.sources.materialize as mat
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        write_iceberg,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    kw = dict(min_cols=["v"], max_cols=["v"])
    write_iceberg(
        _rows(spark, [(1, "a", 5.0), (2, "a", 9.0)],
              "id long, g string, v double"),
        src,
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)

    real = mat._pinned_source
    calls = []

    def counting(spark_, uri, fmt, pos):
        calls.append(uri)
        return real(spark_, uri, fmt, pos)

    monkeypatch.setattr(mat, "_pinned_source", counting)
    # insert above the max: maintainable incrementally — no source read
    write_iceberg(
        _rows(spark, [(3, "a", 11.0)], "id long, g string, v double"),
        src, mode="append",
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert calls == []
    # delete the max: rescan fires exactly once
    delete_iceberg(spark, src, "id = 3")
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert calls == [src]
    got = sorted(
        (r.g, r.min_v, r.max_v)
        for r in read_materialization(spark, tgt).collect()
    )
    assert got == [("a", 5.0, 9.0)]


def test_join_matview_lifecycle_and_guards(spark, tmp_path):
    """Two-table join materialization: bootstrap, left-only window,
    right-only window (CDC dimension update), dual-side window — every
    state equals the full re-join recompute; ambiguous/missing column
    and spec-mismatch guards refuse typed."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        refresh_join_materialization,
    )
    from pyspark.sql import functions as F

    dim = str(tmp_path / "dim")
    fact = str(tmp_path / "fact")
    tgt = str(tmp_path / "jmv")
    write_iceberg(
        spark.createDataFrame([(1, "red"), (2, "blue")], "k long, color string"),
        dim,
    )
    write_iceberg(
        spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, amt double"
        ),
        fact,
    )

    def refresh():
        return refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"], ["amt"]
        )

    def state():
        return sorted(
            (r.color, r.n_rows, r.sum_amt)
            for r in read_materialization(spark, tgt).collect()
        )

    def recompute():
        return sorted(
            (r.color, r.n, r.s)
            for r in IcebergCatalog("f", fact)
            .to_dataframe(spark)
            .join(IcebergCatalog("d", dim).to_dataframe(spark), "k")
            .groupBy("color")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("amt").alias("s"),
            )
            .collect()
        )

    out = refresh()
    assert out["bootstrapped"] is True
    assert state() == recompute()
    assert refresh() is None  # neither source moved

    # left-only window: fact append + delete
    write_iceberg(
        spark.createDataFrame([(2, 7.0)], "k long, amt double"),
        fact, mode="append",
    )
    delete_iceberg(spark, fact, "amt = 10.0")
    refresh()
    assert state() == recompute()
    # right-only window: dimension CDC update (red→green for k=1)
    merge_iceberg(
        spark, dim,
        spark.createDataFrame([(1, "green")], "k long, color string")
        .coalesce(1),
        ["k"],
    )
    refresh()
    assert state() == recompute()
    # dual-side window: new dim key + facts on old and new keys
    write_iceberg(
        spark.createDataFrame([(3, "gold")], "k long, color string"),
        dim, mode="append",
    )
    write_iceberg(
        spark.createDataFrame([(3, 100.0), (1, 1.0)], "k long, amt double"),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()

    # guards
    with pytest.raises(BuzzBadRequestError, match="spec mismatch"):
        refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"]
        )
    with pytest.raises(BuzzBadRequestError, match="neither join side"):
        refresh_join_materialization(
            spark, fact, dim, str(tmp_path / "x"), ["k"], ["nope"], ["amt"]
        )
    with pytest.raises(BuzzBadRequestError, match="both sides"):
        refresh_join_materialization(
            spark, fact, dim, str(tmp_path / "x2"), ["color"], ["k"]
        )


def test_join_matview_delta_side(spark, tmp_path):
    """A Delta-format side works through the same identity (its changelog
    and version-pinned reads slot into ΔL⋈R_new ∪ L_old⋈ΔR)."""
    from buzz_rust_spark.sources.delta_writer import delete_delta, write_delta
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg
    from buzz_rust_spark.sources.materialize import (
        refresh_join_materialization,
    )
    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog
    from pyspark.sql import functions as F

    fact = str(tmp_path / "fact_delta")
    dim = str(tmp_path / "dim_ice")
    tgt = str(tmp_path / "jmv")
    write_delta(
        spark.createDataFrame(
            [(1, 3.0), (2, 4.0), (2, 6.0)], "k long, amt double"
        ).coalesce(1),
        fact,
    )
    write_iceberg(
        spark.createDataFrame([(1, "x"), (2, "y")], "k long, color string"),
        dim,
    )

    def refresh():
        return refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"], ["amt"],
            left_format="delta",
        )

    refresh()
    write_delta(
        spark.createDataFrame([(1, 7.0)], "k long, amt double").coalesce(1),
        fact, mode="append",
    )
    delete_delta(spark, fact, "amt = 4.0")
    refresh()
    got = sorted(
        (r.color, r.n_rows, r.sum_amt)
        for r in read_materialization(spark, tgt).collect()
    )
    want = sorted(
        (r.color, r.n, r.s)
        for r in DeltaCatalog("f", fact)
        .to_dataframe(spark)
        .join(IcebergCatalog("d", dim).to_dataframe(spark), "k")
        .groupBy("color")
        .agg(F.count("*").cast("long").alias("n"), F.sum("amt").alias("s"))
        .collect()
    )
    assert got == want == [("x", 2, 10.0), ("y", 1, 6.0)]


def test_matview_minmax_new_group_insert_then_delete_raw_feed(spark, tmp_path):
    """Review regression: a RAW per-commit feed (Delta recorded CDF — no
    intra-window netting) can retract a NEW group's inserted extremum in
    the same refresh window; the danger test must fire with NO current
    state row, or the retracted value survives as the stored min."""
    from buzz_rust_spark.sources.delta_writer import (
        delete_delta,
        write_delta,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    kw = dict(min_cols=["v"], max_cols=["v"], source_format="delta")
    write_delta(
        _rows(spark, [(0, "z", 0.0)], "id long, g string, v double")
        .coalesce(1),
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    # window: new group g='a' gets rows 1.0 and 5.0, then 1.0 is deleted —
    # the recorded feed carries insert(1), insert(5), delete(1) un-netted
    write_delta(
        _rows(spark, [(1, "a", 1.0), (2, "a", 5.0)],
              "id long, g string, v double").coalesce(1),
        src, mode="append",
    )
    delete_delta(spark, src, "id = 1")
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    got = sorted(
        (r.g, r.n_rows, r.min_v, r.max_v)
        for r in read_materialization(spark, tgt).collect()
    )
    assert got == [("a", 1, 5.0, 5.0), ("z", 1, 0.0, 0.0)]


def test_join_matview_overlap_guard(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg
    from buzz_rust_spark.sources.materialize import (
        refresh_join_materialization,
    )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_iceberg(spark.createDataFrame([(1, 2.0)], "k long, v double"), a)
    write_iceberg(spark.createDataFrame([(1, "x")], "k long, g string"), b)
    with pytest.raises(BuzzBadRequestError, match="both"):
        refresh_join_materialization(
            spark, a, b, str(tmp_path / "mv"), ["k"], ["g"], ["g"]
        )


def test_refresh_rebootstraps_over_unmappable_window(spark, tmp_path):
    """A refresh window containing compactions that rewrote the files a
    later position delete targets is unmappable (the changelog's typed
    BuzzRebootstrapError) — refresh_materialization recovers with a
    pinned full recompute committed as ONE overwrite carrying the new
    cursor (CAS on the old), and the state equals the relational
    recompute.  (Deterministic pin of the hypothesis-found sequence
    merge → rewrite → rewrite → delete with a single trailing refresh.)"""
    from pyspark.sql import functions as F

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        rewrite_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        read_materialization,
        refresh_materialization,
    )

    src, tgt = str(tmp_path / "src"), str(tmp_path / "mv")
    write_iceberg(
        spark.createDataFrame(
            [(0, "a", 3.0), (1, "b", 8.0)], "id long, g string, v double"
        ),
        src,
    )
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    refresh_materialization(spark, src, tgt, ["g"], **kw)
    merge_iceberg(
        spark, src,
        spark.createDataFrame(
            [(0, "a", 0.0)], "id long, g string, v double"
        ).coalesce(1),
        ["id"],
    )
    rewrite_iceberg(spark, src)
    rewrite_iceberg(spark, src)
    delete_iceberg(spark, src, "v = 0.0")
    out = refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert out["bootstrapped"] is True and "rebootstrap" in out
    got = sorted(
        (r.g, r.n_rows, r.sum_v, r.min_v, r.max_v)
        for r in read_materialization(spark, tgt).collect()
    )
    want = sorted(
        (r.g, r.n, r.s, r.mn, r.mx)
        for r in IcebergCatalog("s", src)
        .to_dataframe(spark)
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.coalesce(F.sum("v"), F.lit(0.0)).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    )
    assert got == want
    # a subsequent ordinary incremental refresh still works off the new cursor
    write_iceberg(
        spark.createDataFrame([(9, "a", 5.0)], "id long, g string, v double"),
        src, mode="append",
    )
    out2 = refresh_materialization(spark, src, tgt, ["g"], **kw)
    assert out2 is not None and "rebootstrap" not in out2
    assert ("a", 1, 5.0, 5.0, 5.0) in {
        (r.g, r.n_rows, r.sum_v, r.min_v, r.max_v)
        for r in read_materialization(spark, tgt).collect()
    }


# --- round 10: join min/max, left-outer join, N-table chains ------------------


def _jm_env(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    dim = str(tmp_path / "dim")
    fact = str(tmp_path / "fact")
    write_iceberg(
        spark.createDataFrame(
            [(1, "red"), (2, "blue")], "k long, color string"
        ),
        dim,
    )
    write_iceberg(
        spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, amt double"
        ),
        fact,
    )
    return fact, dim


def test_join_matview_minmax_lifecycle(spark, tmp_path):
    """min/max over a two-table join: incremental under inserts, targeted
    rescan of the pinned RE-JOIN when a retraction kills the extremum;
    state equals the re-join recompute at every step."""
    from pyspark.sql import functions as F

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        read_materialization,
        refresh_join_materialization,
    )

    fact, dim = _jm_env(spark, tmp_path)
    tgt = str(tmp_path / "jmv")

    def refresh():
        return refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"], ["amt"],
            min_cols=["amt"], max_cols=["amt"],
        )

    def state():
        return sorted(
            (r.color, r.n_rows, r.sum_amt, r.min_amt, r.max_amt)
            for r in read_materialization(spark, tgt).collect()
        )

    def recompute():
        return sorted(
            (r.color, r.n, r.s, r.mn, r.mx)
            for r in IcebergCatalog("f", fact)
            .to_dataframe(spark)
            .join(IcebergCatalog("d", dim).to_dataframe(spark), "k")
            .groupBy("color")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("amt").alias("s"),
                F.min("amt").alias("mn"),
                F.max("amt").alias("mx"),
            )
            .collect()
        )

    assert refresh()["bootstrapped"] is True
    assert state() == recompute()
    # insert-only window: incremental least/greatest path
    write_iceberg(
        spark.createDataFrame([(1, 99.0), (2, 0.5)], "k long, amt double"),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()
    # retraction killing a group's max (99 for red) → targeted rescan
    delete_iceberg(spark, fact, "amt = 99.0")
    refresh()
    assert state() == recompute()
    # dimension-side CDC: k=1 flips color — whole group migrates
    merge_iceberg(
        spark, dim,
        spark.createDataFrame([(1, "green")], "k long, color string")
        .coalesce(1),
        ["k"],
    )
    refresh()
    assert state() == recompute()


def test_left_join_matview_lifecycle(spark, tmp_path):
    """LEFT OUTER join matview: unmatched left rows contribute with NULL
    right columns; a right-side insert that creates a key's FIRST match
    retracts the null-extension, a right-side delete that removes the
    LAST match restores it.  State ≡ re-join recompute throughout."""
    from pyspark.sql import functions as F

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        read_materialization,
        refresh_join_materialization,
    )

    fact, dim = _jm_env(spark, tmp_path)
    # fact rows with NO dim match (k=9): the null-extended population
    write_iceberg(
        spark.createDataFrame(
            [(9, 1.0), (9, 2.0)], "k long, amt double"
        ),
        fact, mode="append",
    )
    tgt = str(tmp_path / "ljmv")

    def refresh():
        return refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"], ["amt"], how="left"
        )

    def state():
        return sorted(
            (
                (r.color, r.n_rows, r.sum_amt)
                for r in read_materialization(spark, tgt).collect()
            ),
            key=repr,
        )

    def recompute():
        return sorted(
            (
                (r.color, r.n, r.s)
                for r in IcebergCatalog("f", fact)
                .to_dataframe(spark)
                .join(
                    IcebergCatalog("d", dim).to_dataframe(spark), "k", "left"
                )
                .groupBy("color")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("amt").alias("s"),
                )
                .collect()
            ),
            key=repr,
        )

    assert refresh()["bootstrapped"] is True
    assert state() == recompute()
    # left-only window: new unmatched key + new matched rows
    write_iceberg(
        spark.createDataFrame([(7, 3.0), (1, 4.0)], "k long, amt double"),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()
    # right-side insert giving k=9 its FIRST match: null-extension flips
    write_iceberg(
        spark.createDataFrame([(9, "gray")], "k long, color string"),
        dim, mode="append",
    )
    refresh()
    assert state() == recompute()
    # right-side delete removing k=2's LAST match: null-extension returns
    delete_iceberg(spark, dim, "k = 2")
    refresh()
    assert state() == recompute()
    # dual-side window: facts move AND a dim CDC update in one refresh
    write_iceberg(
        spark.createDataFrame([(9, 50.0)], "k long, amt double"),
        fact, mode="append",
    )
    merge_iceberg(
        spark, dim,
        spark.createDataFrame([(9, "silver")], "k long, color string")
        .coalesce(1),
        ["k"],
    )
    refresh()
    assert state() == recompute()


def test_chain_matview_three_tables(spark, tmp_path):
    """3-table chain (fact ⋈ dim1 ⋈ dim2) through interleaved windows on
    ALL THREE sources ≡ full re-join recompute; min/max ride the same
    hybrid."""
    from pyspark.sql import functions as F

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        read_materialization,
        refresh_chain_materialization,
    )

    fact = str(tmp_path / "fact")
    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    tgt = str(tmp_path / "cmv")
    write_iceberg(
        spark.createDataFrame(
            [(1, 10, 9.0), (1, 20, 4.0), (2, 10, 2.5)],
            "k1 long, k2 long, amt double",
        ),
        fact,
    )
    write_iceberg(
        spark.createDataFrame(
            [(1, "red"), (2, "blue")], "k1 long, color string"
        ),
        d1,
    )
    write_iceberg(
        spark.createDataFrame(
            [(10, "EU"), (20, "US")], "k2 long, region string"
        ),
        d2,
    )
    sources = [
        {"uri": fact, "format": "iceberg"},
        {"uri": d1, "format": "iceberg", "join_cols": ["k1"]},
        {"uri": d2, "format": "iceberg", "join_cols": ["k2"]},
    ]

    def refresh():
        return refresh_chain_materialization(
            spark, sources, tgt, ["color", "region"], ["amt"],
            min_cols=["amt"], max_cols=["amt"],
        )

    def state():
        return sorted(
            (r.color, r.region, r.n_rows, r.sum_amt, r.min_amt, r.max_amt)
            for r in read_materialization(spark, tgt).collect()
        )

    def recompute():
        f = IcebergCatalog("f", fact).to_dataframe(spark)
        a = IcebergCatalog("a", d1).to_dataframe(spark)
        b = IcebergCatalog("b", d2).to_dataframe(spark)
        return sorted(
            (r.color, r.region, r.n, r.s, r.mn, r.mx)
            for r in f.join(a, "k1").join(b, "k2")
            .groupBy("color", "region")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("amt").alias("s"),
                F.min("amt").alias("mn"),
                F.max("amt").alias("mx"),
            )
            .collect()
        )

    assert refresh()["bootstrapped"] is True
    assert state() == recompute()
    assert refresh() is None  # nothing moved

    # window 1: fact-only (append + extremum-killing delete)
    write_iceberg(
        spark.createDataFrame(
            [(2, 20, 8.0), (1, 10, 0.5)], "k1 long, k2 long, amt double"
        ),
        fact, mode="append",
    )
    delete_iceberg(spark, fact, "amt = 9.0")
    refresh()
    assert state() == recompute()
    # window 2: middle-table CDC (color flip) while fact also moves
    merge_iceberg(
        spark, d1,
        spark.createDataFrame([(1, "green")], "k1 long, color string")
        .coalesce(1),
        ["k1"],
    )
    write_iceberg(
        spark.createDataFrame(
            [(2, 10, 6.0)], "k1 long, k2 long, amt double"
        ),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()
    # window 3: tail-table append giving new region + facts referencing it
    write_iceberg(
        spark.createDataFrame([(30, "APAC")], "k2 long, region string"),
        d2, mode="append",
    )
    write_iceberg(
        spark.createDataFrame(
            [(1, 30, 7.0)], "k1 long, k2 long, amt double"
        ),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()
    # window 4: all three move at once
    write_iceberg(
        spark.createDataFrame([(3, "gold")], "k1 long, color string"),
        d1, mode="append",
    )
    merge_iceberg(
        spark, d2,
        spark.createDataFrame([(10, "LATAM")], "k2 long, region string")
        .coalesce(1),
        ["k2"],
    )
    write_iceberg(
        spark.createDataFrame(
            [(3, 10, 1.0), (3, 30, 2.0)], "k1 long, k2 long, amt double"
        ),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()


def test_chain_matview_guards(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg
    from buzz_rust_spark.sources.materialize import (
        refresh_chain_materialization,
    )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_iceberg(spark.createDataFrame([(1, 2.0)], "k long, v double"), a)
    write_iceberg(spark.createDataFrame([(1, "x")], "k long, g string"), b)
    srcs = [
        {"uri": a, "format": "iceberg"},
        {"uri": b, "format": "iceberg", "join_cols": ["k"]},
    ]
    with pytest.raises(BuzzBadRequestError, match="at least 2"):
        refresh_chain_materialization(
            spark, srcs[:1], str(tmp_path / "m1"), ["g"], ["v"]
        )
    with pytest.raises(BuzzBadRequestError, match="no join_cols"):
        refresh_chain_materialization(
            spark,
            [{"uri": a, "format": "iceberg", "join_cols": ["k"]},
             srcs[1]],
            str(tmp_path / "m2"), ["g"], ["v"],
        )
    with pytest.raises(BuzzBadRequestError, match="needs join_cols"):
        refresh_chain_materialization(
            spark, [srcs[0], {"uri": b, "format": "iceberg"}],
            str(tmp_path / "m3"), ["g"], ["v"],
        )
    with pytest.raises(BuzzBadRequestError, match="no chain table"):
        refresh_chain_materialization(
            spark, srcs, str(tmp_path / "m4"), ["nope"], ["v"]
        )
    # duplicate non-key column across tables → typed
    c = str(tmp_path / "c")
    write_iceberg(
        spark.createDataFrame([(1, 3.0)], "k long, v double"), c
    )
    with pytest.raises(BuzzBadRequestError, match="rename"):
        refresh_chain_materialization(
            spark,
            srcs + [{"uri": c, "format": "iceberg", "join_cols": ["k"]}],
            str(tmp_path / "m5"), ["g"], ["v"],
        )


def test_join_matview_how_guard_and_spec(spark, tmp_path):
    from buzz_rust_spark.sources.materialize import (
        refresh_join_materialization,
    )

    fact, dim = _jm_env(spark, tmp_path)
    tgt = str(tmp_path / "jmv")
    with pytest.raises(BuzzBadRequestError, match="inner|left"):
        refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"], ["amt"], how="full"
        )
    # an inner-built target refuses a left refresh (spec mismatch)
    refresh_join_materialization(
        spark, fact, dim, tgt, ["k"], ["color"], ["amt"]
    )
    with pytest.raises(BuzzBadRequestError, match="spec mismatch"):
        refresh_join_materialization(
            spark, fact, dim, tgt, ["k"], ["color"], ["amt"], how="left"
        )


def test_matview_null_group_key(spark, tmp_path):
    """A NULL group key is a real SQL group: the state joins must be
    null-safe or the NULL group's current state silently drops on every
    refresh (round-10 fix, found via the left-join null-extension)."""
    from pyspark.sql import functions as F

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        read_materialization,
        refresh_materialization,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "mv")
    write_iceberg(
        spark.createDataFrame(
            [(None, 1.0), (None, 5.0), ("a", 2.0)], "g string, v double"
        ),
        src,
    )

    def refresh():
        return refresh_materialization(
            spark, src, tgt, ["g"], ["v"], min_cols=["v"], max_cols=["v"]
        )

    def state():
        return sorted(
            (
                (r.g, r.n_rows, r.sum_v, r.min_v, r.max_v)
                for r in read_materialization(spark, tgt).collect()
            ),
            key=repr,
        )

    def recompute():
        return sorted(
            (
                (r.g, r.n, r.s, r.mn, r.mx)
                for r in IcebergCatalog("s", src)
                .to_dataframe(spark)
                .groupBy("g")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("v").alias("s"),
                    F.min("v").alias("mn"),
                    F.max("v").alias("mx"),
                )
                .collect()
            ),
            key=repr,
        )

    refresh()
    assert state() == recompute()
    # insert into the NULL group, then retract its max (rescan path)
    write_iceberg(
        spark.createDataFrame([(None, 9.0)], "g string, v double"),
        src, mode="append",
    )
    refresh()
    assert state() == recompute()
    delete_iceberg(spark, src, "v = 9.0")
    refresh()
    assert state() == recompute()


def test_chain_matview_left_steps_and_mixed_formats(spark, tmp_path):
    """Chain with a LEFT step (fact ⟕ dim1) plus an inner tail (⋈ dim2),
    dim1 stored as DELTA (mixed formats): null-extension flips both ways
    through dim1 CDC windows, and the state equals the re-join recompute
    at every step."""
    from pyspark.sql import functions as F

    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog
    from buzz_rust_spark.sources.delta_writer import (
        delete_delta,
        write_delta,
    )
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        delete_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.sources.materialize import (
        read_materialization,
        refresh_chain_materialization,
    )

    fact = str(tmp_path / "fact")
    d1 = str(tmp_path / "d1")  # delta, LEFT-joined
    d2 = str(tmp_path / "d2")  # iceberg, inner tail
    tgt = str(tmp_path / "mv")
    write_iceberg(
        spark.createDataFrame(
            # k1=9 has NO dim1 row: the null-extended population
            [(1, 10, 5.0), (2, 20, 7.0), (9, 10, 1.0), (9, 20, 2.0)],
            "k1 long, k2 long, amt double",
        ),
        fact,
    )
    write_delta(
        spark.createDataFrame(
            [(1, "red"), (2, "blue")], "k1 long, color string"
        ).coalesce(1),
        d1,
    )
    write_iceberg(
        spark.createDataFrame(
            [(10, "EU"), (20, "US")], "k2 long, region string"
        ),
        d2,
    )
    sources = [
        {"uri": fact, "format": "iceberg"},
        {"uri": d1, "format": "delta", "join_cols": ["k1"], "how": "left"},
        {"uri": d2, "format": "iceberg", "join_cols": ["k2"]},
    ]

    def refresh():
        return refresh_chain_materialization(
            spark, sources, tgt, ["color", "region"], ["amt"],
            min_cols=["amt"],
        )

    def state():
        return sorted(
            (
                (r.color, r.region, r.n_rows, r.sum_amt, r.min_amt)
                for r in read_materialization(spark, tgt).collect()
            ),
            key=repr,
        )

    def recompute():
        f = IcebergCatalog("f", fact).to_dataframe(spark)
        a = DeltaCatalog("a", d1).to_dataframe(spark)
        b = IcebergCatalog("b", d2).to_dataframe(spark)
        return sorted(
            (
                (r.color, r.region, r.n, r.s, r.mn)
                for r in f.join(a, "k1", "left").join(b, "k2")
                .groupBy("color", "region")
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("amt").alias("s"),
                    F.min("amt").alias("mn"),
                )
                .collect()
            ),
            key=repr,
        )

    assert refresh()["bootstrapped"] is True
    assert state() == recompute()
    # fact window: new unmatched + matched rows, extremum-killing delete
    write_iceberg(
        spark.createDataFrame(
            [(9, 10, 0.5), (1, 20, 9.0)], "k1 long, k2 long, amt double"
        ),
        fact, mode="append",
    )
    delete_iceberg(spark, fact, "amt = 1.0")
    refresh()
    assert state() == recompute()
    # LEFT-dim insert: k1=9 gains its FIRST match — null-extension flips
    write_delta(
        spark.createDataFrame([(9, "gray")], "k1 long, color string")
        .coalesce(1),
        d1, mode="append",
    )
    refresh()
    assert state() == recompute()
    # LEFT-dim delete: k1=2 loses its LAST match — null-extension returns
    delete_delta(spark, d1, "k1 = 2")
    refresh()
    assert state() == recompute()
    # tail-dim + fact move together while the left dim holds still
    write_iceberg(
        spark.createDataFrame([(30, "APAC")], "k2 long, region string"),
        d2, mode="append",
    )
    write_iceberg(
        spark.createDataFrame(
            [(9, 30, 4.0)], "k1 long, k2 long, amt double"
        ),
        fact, mode="append",
    )
    refresh()
    assert state() == recompute()
    # spec guard: an inner-built chain refuses a left refresh
    sources2 = [dict(s) for s in sources]
    sources2[1].pop("how")
    with pytest.raises(BuzzBadRequestError, match="spec mismatch"):
        refresh_chain_materialization(
            spark, sources2, tgt, ["color", "region"], ["amt"],
            min_cols=["amt"],
        )
