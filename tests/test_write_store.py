"""Commit-store conditional-put protocol (sources/write_store.py).

The lakehouse writers' one store-dependent primitive is the commit claim:
put-if-absent of a versioned filename (Delta ``_delta_log/<N>.json`` per
PROTOCOL.md's write-once rule; Iceberg's ``v<N>.metadata.json`` version
promote as a compare-and-swap).  These tests pin the store contract itself
and then race two REAL writers deterministically: a barrier parked on the
store's ``before_claim`` seam guarantees both read the same table version
before either claims, so the race is reproduced on every run instead of
depending on thread scheduling."""

from __future__ import annotations

import threading

import pytest

from buzz_rust_spark.errors import BuzzCommitConflictError
from buzz_rust_spark.sources.write_store import (
    LocalCommitStore,
    MemoryCommitStore,
)


# --- store contract -------------------------------------------------------------


@pytest.mark.parametrize("make", [
    lambda tmp: (LocalCommitStore(), str(tmp / "f")),
    lambda tmp: (MemoryCommitStore(), "mem/f"),
], ids=["local", "memory"])
def test_put_if_absent_second_writer_conflicts(tmp_path, make):
    store, path = make(tmp_path)
    store.put_if_absent(path, b"winner")
    with pytest.raises(BuzzCommitConflictError) as exc:
        store.put_if_absent(path, b"loser")
    assert exc.value.retryable is True
    # the winner's content is untouched
    if isinstance(store, MemoryCommitStore):
        assert store.read(path) == b"winner"
    else:
        assert open(path, "rb").read() == b"winner"


@pytest.mark.parametrize("make", [
    lambda tmp: (LocalCommitStore(), str(tmp / "f")),
    lambda tmp: (MemoryCommitStore(), "mem/f"),
], ids=["local", "memory"])
def test_put_if_absent_threads_exactly_one_winner(tmp_path, make):
    store, path = make(tmp_path)
    n = 8
    barrier = threading.Barrier(n, timeout=30)
    results: list = [None] * n

    def attempt(i):
        try:
            barrier.wait()
            store.put_if_absent(path, f"writer-{i}".encode())
            results[i] = "won"
        except BuzzCommitConflictError:
            results[i] = "conflict"

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert results.count("won") == 1
    assert results.count("conflict") == n - 1
    content = (
        store.read(path)
        if isinstance(store, MemoryCommitStore)
        else open(path, "rb").read()
    )
    assert content == f"writer-{results.index('won')}".encode()


def test_put_atomic_replaces(tmp_path):
    store = LocalCommitStore()
    p = str(tmp_path / "hint")
    store.put_atomic(p, b"1")
    store.put_atomic(p, b"2")
    assert open(p, "rb").read() == b"2"
    # no tmp litter
    assert [f for f in tmp_path.iterdir()] == [tmp_path / "hint"]


def _racing_store(parties: int = 2):
    """A LocalCommitStore whose claims rendezvous on a barrier: both racers
    provably read the table at the same version before either claims."""
    store = LocalCommitStore()
    barrier = threading.Barrier(parties, timeout=60)

    def before_claim(path):
        try:
            barrier.wait()
        except threading.BrokenBarrierError:
            pass  # partner already finished (retry path) — proceed alone

    store.before_claim = before_claim
    return store


def _race(fn_a, fn_b):
    """Run two callables concurrently; return their outcomes
    ('won' | exception instance)."""
    out: list = [None, None]

    def run(i, fn):
        try:
            fn()
            out[i] = "won"
        except Exception as exc:  # noqa: BLE001 — the assertion types it
            out[i] = exc

    ta = threading.Thread(target=run, args=(0, fn_a))
    tb = threading.Thread(target=run, args=(1, fn_b))
    ta.start(); tb.start()
    ta.join(300); tb.join(300)
    return out


# --- real-writer contention -------------------------------------------------------


def test_delta_concurrent_commit_one_winner(spark, tmp_path):
    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog
    from buzz_rust_spark.sources.delta_writer import write_delta

    root = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(0,)], "id long"), root)
    store = _racing_store()

    def writer(v):
        return lambda: write_delta(
            spark.createDataFrame([(v,)], "id long"), root, store=store
        )

    out = _race(writer(1), writer(2))
    assert out.count("won") == 1
    loser = next(o for o in out if o != "won")
    assert isinstance(loser, BuzzCommitConflictError) and loser.retryable
    # the log is intact: exactly versions 0 and 1, readable snapshot
    winner_id = 1 if out[0] == "won" else 2
    rows = sorted(
        r.id
        for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert rows == [0, winner_id]
    # the loser retries against the advanced table and succeeds
    write_delta(
        spark.createDataFrame([(3,)], "id long"), root, store=LocalCommitStore()
    )
    rows = sorted(
        r.id for r in DeltaCatalog("t", root).to_dataframe(spark).collect()
    )
    assert rows == [0, winner_id, 3]


def test_iceberg_concurrent_commit_one_winner(spark, tmp_path):
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    root = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(0,)], "id long"), root)
    store = _racing_store()

    def writer(v):
        return lambda: write_iceberg(
            spark.createDataFrame([(v,)], "id long"), root, mode="append",
            store=store,
        )

    out = _race(writer(1), writer(2))
    assert out.count("won") == 1
    loser = next(o for o in out if o != "won")
    assert isinstance(loser, BuzzCommitConflictError) and loser.retryable
    winner_id = 1 if out[0] == "won" else 2
    rows = sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert rows == [0, winner_id]
    # retry lands at the NEXT version; nothing from the failed attempt is
    # visible (the loser's orphaned data files are vacuum's job)
    write_iceberg(
        spark.createDataFrame([(3,)], "id long"), root, mode="append",
    )
    rows = sorted(
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    )
    assert rows == [0, winner_id, 3]


def test_iceberg_concurrent_create_one_winner(spark, tmp_path):
    """Both racers CREATE the same fresh table — both build v1; one wins."""
    import os

    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg

    root = str(tmp_path / "t")
    store = _racing_store()

    def writer(v):
        return lambda: write_iceberg(
            spark.createDataFrame([(v,)], "id long"), root, store=store
        )

    out = _race(writer(1), writer(2))
    assert out.count("won") == 1
    assert isinstance(next(o for o in out if o != "won"), BuzzCommitConflictError)
    winner_id = 1 if out[0] == "won" else 2
    assert [
        r.id for r in IcebergCatalog("t", root).to_dataframe(spark).collect()
    ] == [winner_id]
    metas = [
        f for f in os.listdir(os.path.join(root, "metadata"))
        if f.endswith(".metadata.json")
    ]
    assert metas == ["v1.metadata.json"]
