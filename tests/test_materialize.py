"""Incremental materialized aggregates (sources/materialize.py): the
changelog consumer — bootstrap, retractable refresh, exactly-once cursor,
drift detection, and the delta-source path."""

from __future__ import annotations

import pytest

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
