"""Structured Streaming parity: the incremental execution of the windowed
operators must equal their batch execution (the batch result is the oracle)."""

from __future__ import annotations

import shutil

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from buzz_rust_spark.queries.registry import load
from buzz_rust_spark.streaming.windows import sessionize, windowed_event_counts


def test_streaming_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in windowed_event_counts(events, "1 hour").collect()
    }

    # Stage the events as a file-source stream (split into several files so
    # multiple micro-batches actually run).
    src = tmp_path / "stream_src"
    events.repartition(4).write.parquet(str(src))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windowed_event_counts(
        stream, "1 hour", watermark="10 days"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    shutil.rmtree(src, ignore_errors=True)
    assert got == batch


def test_sessionize_batch(spark, sf_dir):
    events = load(spark, sf_dir, "events").where(F.col("user_id") == 1)
    sessions = sessionize(events, gap="30 minutes").collect()
    assert sessions
    total = sum(r["n_events"] for r in sessions)
    assert total == events.count()
    for r in sessions:
        assert r["session_end"] > r["session_start"]


def test_stateful_running_counts(spark, sf_dir, tmp_path):
    """applyInPandasWithState accumulates across micro-batches; the final
    per-key total must equal the batch group-by count."""
    from buzz_rust_spark.streaming.stateful import stateful_running_counts

    events = load(spark, sf_dir, "events").where(F.col("user_id") < 10)
    expected = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    src = tmp_path / "state_src"
    events.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful_running_counts(stream, "user_id")
        .writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    rows = spark.sql("SELECT * FROM state_test").collect()
    # update mode appends one row per key per batch; the last row per key
    # carries the final running total
    final = {}
    for r in rows:
        prev = final.get(r["key"])
        if prev is None or r["total_batches"] > prev[1]:
            final[r["key"]] = (r["total_events"], r["total_batches"])
    assert {k: v[0] for k, v in final.items()} == expected
    assert max(v[1] for v in final.values()) >= 2  # state crossed batches


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream time-bounded join must equal the same join run in batch."""
    from buzz_rust_spark.streaming.windows import click_purchase_stream_join

    events = load(spark, sf_dir, "events").where(F.col("user_id") < 40)
    clicks_b = events.where(F.col("event_type") == "click")
    purchases_b = events.where(F.col("event_type") == "purchase")
    expected = {
        (r["click_id"], r["purchase_id"])
        for r in click_purchase_stream_join(clicks_b, purchases_b).collect()
    }
    assert expected  # non-degenerate fixture

    cdir, pdir = tmp_path / "clicks", tmp_path / "purchases"
    clicks_b.repartition(3).write.parquet(str(cdir))
    purchases_b.repartition(3).write.parquet(str(pdir))
    cs = (
        spark.readStream.schema(clicks_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(cdir))
    )
    ps = (
        spark.readStream.schema(purchases_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(pdir))
    )
    # Watermark must exceed the fixture's full time span: files arrive
    # unordered, so any tighter watermark may legitimately drop cross-batch
    # matches as late — batch equivalence only holds when nothing is late.
    q = (
        click_purchase_stream_join(cs, ps, watermark="365 days")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=240)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    assert got == expected


def test_stream_dedup_matches_batch(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a stream with injected duplicate
    deliveries must recover exactly the batch-distinct event set."""
    from buzz_rust_spark.streaming.windows import dedup_events

    events = load(spark, sf_dir, "events").where(F.col("user_id") < 30)
    # Simulate at-least-once delivery: every 3rd event is delivered twice.
    dup_feed = events.unionAll(events.where(F.col("event_id") % 3 == 0))
    expected = {r["event_id"] for r in dedup_events(events).collect()}
    assert dedup_events(dup_feed).count() == len(expected)

    src = tmp_path / "dedup_src"
    dup_feed.repartition(4).write.parquet(str(src))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # Watermark spans the fixture's full time range: files arrive unordered,
    # so a tighter watermark could age out keys before their duplicate shows
    # up — only then is batch equivalence exact.
    q = (
        dedup_events(stream, watermark="365 days")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_test").collect()]
    assert len(got) == len(set(got)), "stream emitted a duplicate event_id"
    assert set(got) == expected


def test_delta_sink_exactly_once(spark, sf_dir, tmp_path):
    """Streaming ingestion into Delta: the drained stream's table content
    equals the batch source, micro-batches land as separate commits, and a
    replayed (appId, batchId) pair is a no-op — the SetTransaction protocol
    that turns at-least-once foreachBatch delivery into exactly-once rows."""
    from buzz_rust_spark.sources import DeltaCatalog, write_delta
    from buzz_rust_spark.streaming.delta_sink import delta_sink

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = tmp_path / "sink_src"
    events.repartition(3).write.parquet(str(src))

    table = str(tmp_path / "delta_table")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = delta_sink(
        stream, table, checkpoint_dir=str(tmp_path / "ckpt"), app_id="ingest-events"
    )
    q.awaitTermination(timeout=120)

    got = DeltaCatalog("events", table).to_dataframe(spark)
    assert got.count() == events.count()
    assert {r["event_id"] for r in got.select("event_id").collect()} == {
        r["event_id"] for r in events.select("event_id").collect()
    }

    # Replay: same appId + an already-committed batch id must be skipped.
    pre_version = write_delta(
        events.limit(1), table, txn_app_id="probe", txn_version=0
    )
    replay_version = write_delta(
        events.limit(1), table, txn_app_id="probe", txn_version=0
    )
    assert replay_version is None  # skip is SIGNALED, not silent — a
    # caller appending dedup state after a skipped write would lose data
    assert DeltaCatalog("events", table).to_dataframe(spark).count() == (
        events.count() + 1
    )
    # A NEW batch id for the same appId commits normally.
    v2 = write_delta(events.limit(1), table, txn_app_id="probe", txn_version=1)
    assert v2 == pre_version + 1


def test_quality_filters_stream_equals_batch(spark, sf_dir, tmp_path):
    """gopher_quality and c4_clean_lines are pure narrow projections, so
    they run unchanged on a stream and the incremental result equals the
    batch result — quality filtering drops into an ingestion stream with
    no operator changes."""
    from buzz_rust_spark.operators.text import c4_clean_lines, gopher_quality

    docs = load(spark, sf_dir, "documents")
    batch_g = {
        r["doc_id"]: (r["n_words"], r["mean_word_len"], r["passes"])
        for r in gopher_quality(docs, min_stopwords=1).collect()
    }
    batch_c = {
        r["doc_id"]: (r["n_kept"], r["keep_doc"])
        for r in c4_clean_lines(
            docs, min_words_per_line=20, require_terminal_punct=False,
            min_kept_lines=1,
        ).collect()
    }

    src = tmp_path / "doc_stream_src"
    docs.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    gq = (
        gopher_quality(stream, min_stopwords=1)
        .writeStream.format("memory").queryName("gq_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    gq.awaitTermination(timeout=120)
    cq = (
        c4_clean_lines(
            stream, min_words_per_line=20, require_terminal_punct=False,
            min_kept_lines=1,
        )
        .writeStream.format("memory").queryName("c4_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    cq.awaitTermination(timeout=120)

    got_g = {
        r["doc_id"]: (r["n_words"], r["mean_word_len"], r["passes"])
        for r in spark.sql("SELECT * FROM gq_stream").collect()
    }
    got_c = {
        r["doc_id"]: (r["n_kept"], r["keep_doc"])
        for r in spark.sql("SELECT * FROM c4_stream").collect()
    }
    shutil.rmtree(src, ignore_errors=True)
    assert got_g == batch_g
    assert got_c == batch_c


def test_bloom_dedup_sink_cross_batch(spark, tmp_path):
    """Streamed documents dedup against the Bloom state across micro-batches:
    a text seen in an earlier batch is dropped from later batches, survivors
    land exactly-once in the Delta table, and the state log folds
    idempotently (re-appending a delta changes nothing)."""
    from buzz_rust_spark.sources import DeltaCatalog
    from buzz_rust_spark.streaming.bloom_ingest import (
        bloom_dedup_sink,
        read_bloom_state,
    )

    src = tmp_path / "src"
    table = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # three files -> three micro-batches (maxFilesPerTrigger=1); dup texts
    # across files and within file 2
    rows_by_file = [
        [(1, "the quick brown fox"), (2, "unique text alpha")],
        [(3, "the quick brown fox"), (4, "unique text beta"), (5, "unique text beta")],
        [(6, "unique text beta"), (7, "unique text gamma")],
    ]
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
            str(src / f"f{i}"),
        )
    # stage files under one dir for the stream source
    import shutil as _sh

    merged = tmp_path / "stream_in"
    merged.mkdir()
    import os as _os
    import time as _time

    base = _time.time() - 1000
    for i in range(3):
        for p in (src / f"f{i}").glob("*.parquet"):
            dst = merged / f"{i}.parquet"
            _sh.copy(p, dst)
            # distinct mtimes pin micro-batch order to file order (the file
            # source orders by timestamp; same-second copies tie)
            _os.utime(dst, (base + i * 10, base + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(merged))
    )
    q = bloom_dedup_sink(stream, table, state, ckpt, app_id="t-bloom")
    q.awaitTermination(timeout=180)

    got = sorted(
        r["doc_id"] for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    )
    # batches arrive in file order 0,1,2: doc 3 dups doc 1's text, doc 5
    # dups doc 4 within-batch, doc 6 dups doc 4 cross-batch
    assert got == [1, 2, 4, 7]
    # CRDT state: re-appending the whole current log is a no-op after folding
    folded_before = {
        (r["word_idx"], r["bits"])
        for r in read_bloom_state(spark, state).collect()
    }
    spark.read.parquet(state).write.mode("append").parquet(state)
    folded_after = {
        (r["word_idx"], r["bits"])
        for r in read_bloom_state(spark, state).collect()
    }
    assert folded_before == folded_after


def test_bloom_state_compaction_mid_stream(spark, tmp_path):
    """compact_bloom_state mid-stream: the delta-file count drops, the folded
    filter is bit-identical, and dedup behavior across a restart is exactly
    what the uncompacted log would produce (r4 VERDICT #9)."""
    import glob
    import os
    import time

    from buzz_rust_spark.sources import DeltaCatalog
    from buzz_rust_spark.streaming.bloom_ingest import (
        bloom_dedup_sink,
        compact_bloom_state,
        read_bloom_state,
    )

    table = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    merged = tmp_path / "stream_in"
    merged.mkdir()
    base = time.time() - 1000

    def add_file(i, rows):
        tmp = str(tmp_path / f"f{i}")
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        dst = str(merged / f"{i}.parquet")
        os.replace(part, dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    add_file(0, [(1, "the quick brown fox"), (2, "unique text alpha")])
    add_file(1, [(3, "the quick brown fox"), (4, "unique text beta"),
                 (5, "unique text beta")])

    def run_sink():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(merged))
        )
        bloom_dedup_sink(stream, table, state, ckpt, app_id="t-bloom-c").awaitTermination(
            timeout=180
        )

    run_sink()  # two micro-batches -> two state deltas

    def delta_files():
        return [
            f
            for f in glob.glob(os.path.join(state, "*"))
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        ]

    before = {
        (r["word_idx"], r["bits"]) for r in read_bloom_state(spark, state).collect()
    }
    n_before = len(delta_files())
    assert n_before >= 2
    # retention knob: min_deltas at/above the log size is a no-op
    assert compact_bloom_state(spark, state, min_deltas=n_before) == 0
    # default grace period: inputs are folded and recorded in a pending
    # sidecar but the fold is too RECENT to delete them — state unchanged,
    # log grew by the folded delta, nothing removed
    assert compact_bloom_state(spark, state, min_deltas=1) == 0
    assert len(delta_files()) == n_before + 1
    assert {
        (r["word_idx"], r["bits"]) for r in read_bloom_state(spark, state).collect()
    } == before
    # same driver between batches → min_age_sec=0 deletes the pending inputs
    assert (
        compact_bloom_state(spark, state, min_deltas=1, min_age_sec=0)
        == n_before
    )
    assert len(delta_files()) == 1
    after = {
        (r["word_idx"], r["bits"]) for r in read_bloom_state(spark, state).collect()
    }
    assert after == before  # bit-identical fold
    # idempotent: re-running converges (nothing above the retention floor)
    assert compact_bloom_state(spark, state, min_deltas=1, min_age_sec=0) == 0

    # dedup continues against the compacted state exactly as before: doc 6
    # dups doc 4 cross-batch (pre-compaction knowledge), doc 7 is new
    add_file(2, [(6, "unique text beta"), (7, "unique text gamma")])
    run_sink()
    got = sorted(
        r["doc_id"] for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    )
    assert got == [1, 2, 4, 7]


def test_compaction_sweeps_stale_tmp_dirs(spark, tmp_path):
    """A compactor crash between the parquet write and rmtree leaves a
    _compact-<uuid>.tmp directory that nothing else deletes; the next
    compaction sweeps aged ones but leaves a LIVE (recent) compactor's."""
    import os
    import time

    from buzz_rust_spark.streaming.bloom_ingest import compact_bloom_state

    state = tmp_path / "state"
    state.mkdir()
    stale = state / "_compact-deadbeef.tmp"
    stale.mkdir()
    (stale / "part-0.parquet").write_bytes(b"leftover")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    live = state / "_compact-cafebabe.tmp"
    live.mkdir()

    assert compact_bloom_state(spark, str(state)) == 0
    assert not stale.exists()  # aged crash debris removed
    assert live.exists()  # a concurrent compactor's fresh tmp survives


def test_corpus_prep_sink_end_to_end(spark, tmp_path):
    """Streaming corpus prep composes cleaning + quality + classifier gate +
    cross-batch dedup + exactly-once Delta: PII is redacted in committed
    text, low-quality and classifier-rejected docs never land, cross-batch
    dup texts are dropped, and a full replay (fresh checkpoint, same app_id)
    commits nothing new."""
    from buzz_rust_spark.operators.classifier import train_text_classifier
    from buzz_rust_spark.operators.corpus import CorpusPrepConfig
    from buzz_rust_spark.sources import DeltaCatalog
    from buzz_rust_spark.streaming.corpus_ingest import corpus_prep_sink

    good = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    spamy = "buy buy buy casino casino pills pills click click now now now win win win"

    # frozen classifier: plain prose vs spam-vocab
    rows = []
    for i in range(60):
        rows.append((i, good + f" variant {i}", 1))
        rows.append((100 + i, spamy + f" variant {i}", 0))
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_text_classifier(labeled, dim=1 << 12, iters=25, lr=2.0)

    # three micro-batches: batch0 good docs (one with PII), batch1 a
    # cross-batch dup + a spam doc + a fresh good doc, batch2 a low-quality doc
    b0 = [
        (1, good + " reach me at jane.doe@example.com please"),
        (2, good + " second distinct document body flows calmly onward"),
    ]
    b1 = [
        (3, good + " second distinct document body flows calmly onward"),  # dup of 2
        (4, spamy + " extra spam terms"),  # classifier gate
        (5, good + " a third body of reasonable prose for the corpus"),
    ]
    b2 = [
        (6, "x x x x x x x x x x x x x x x x"),  # repetitive → low quality
        (7, good + " final fresh document in the last batch arrives"),
    ]
    import os as _os
    import time as _time

    src = tmp_path / "cin"
    src.mkdir()
    base = _time.time() - 1000
    for i, rows_i in enumerate([b0, b1, b2]):
        tmp_dir = tmp_path / f"cb{i}"
        spark.createDataFrame(rows_i, ["doc_id", "text"]).coalesce(1).write.parquet(
            str(tmp_dir)
        )
        import shutil as _sh

        for p in tmp_dir.glob("*.parquet"):
            dst = src / f"{i}.parquet"
            _sh.copy(p, dst)
            _os.utime(dst, (base + i * 10, base + i * 10))

    table = str(tmp_path / "ctbl")
    state = str(tmp_path / "cstate")
    ckpt = str(tmp_path / "cckpt")

    def run(checkpoint):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = corpus_prep_sink(
            stream, table, state, checkpoint, app_id="t-corpus",
            model=model, classifier_threshold=0.5,
        )
        q.awaitTermination(120)

    run(ckpt)
    out = DeltaCatalog("c", table).to_dataframe(spark).toPandas().set_index("doc_id")
    # survivors: 1 (PII redacted), 2, 5, 7; dropped: 3 (dup), 4 (spam), 6 (quality)
    assert sorted(out.index) == [1, 2, 5, 7]
    assert "<EMAIL>" in out.loc[1, "text"] and "@" not in out.loc[1, "text"]
    assert (out["quality"] >= 0.5).all()

    # replay with a FRESH checkpoint: SetTransaction versions already
    # committed + Bloom state make the rerun a no-op
    run(str(tmp_path / "cckpt2"))
    out2 = DeltaCatalog("c", table).to_dataframe(spark).toPandas()
    assert sorted(out2["doc_id"]) == [1, 2, 5, 7]


def test_dedup_commit_protocol_skipped_write_paths(spark, tmp_path):
    """The exactly-once protocol's two skipped-write cases, driven directly:
    (a) crash between data commit and state append → the replay re-appends
    state ONLY for rows the table really has (heal); (b) a colliding batch
    id carrying NEW data must NOT mark those docs seen (no poison), and they
    commit under a later batch id."""
    import shutil

    from buzz_rust_spark.sources import DeltaCatalog
    from buzz_rust_spark.streaming.bloom_ingest import (
        dedup_commit_batch,
        read_bloom_state,
    )

    table = str(tmp_path / "ptbl")
    state = str(tmp_path / "pstate")
    df0 = spark.createDataFrame(
        [(1, "first document body"), (2, "second document body")],
        ["doc_id", "text"],
    )
    dedup_commit_batch(df0, 0, table, state, app_id="proto")
    assert DeltaCatalog("p", table).to_dataframe(spark).count() == 2

    # (a) simulate the crash: state append lost, batch replays with the
    # same (app_id, batch_id) — write skips, heal re-appends from the table
    shutil.rmtree(state)
    dedup_commit_batch(df0, 0, table, state, app_id="proto")
    assert DeltaCatalog("p", table).to_dataframe(spark).count() == 2  # no dup
    healed = read_bloom_state(spark, state)
    assert healed.count() > 0  # state restored
    # ...and the healed state actually gates a future duplicate
    df_dup = spark.createDataFrame([(3, "first document body")], ["doc_id", "text"])
    dedup_commit_batch(df_dup, 1, table, state, app_id="proto")
    assert DeltaCatalog("p", table).to_dataframe(spark).count() == 2

    # (b) NEW data under a COLLIDING batch id: write skips, state must not
    # learn the unseen text
    df_new = spark.createDataFrame([(4, "a brand new document")], ["doc_id", "text"])
    dedup_commit_batch(df_new, 0, table, state, app_id="proto")
    got = {r["doc_id"] for r in DeltaCatalog("p", table).to_dataframe(spark).collect()}
    assert got == {1, 2}  # nothing landed...
    # ...and the doc is NOT poisoned: a later non-colliding batch commits it
    dedup_commit_batch(df_new, 2, table, state, app_id="proto")
    got = {r["doc_id"] for r in DeltaCatalog("p", table).to_dataframe(spark).collect()}
    assert got == {1, 2, 4}


def test_corpus_sink_config_surface(spark, tmp_path):
    """Config parity with the batch pipeline: repetition rules apply per
    micro-batch (per-document semantics), and the cross-document scrub_span
    stage is an explicit refusal, not a silent skip."""
    import pytest as _pytest

    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.operators.corpus import CorpusPrepConfig
    from buzz_rust_spark.streaming.corpus_ingest import _clean_batch, corpus_prep_sink

    # scrub_span must refuse up front (before any stream starts)
    empty_src = tmp_path / "empty_src"
    empty_src.mkdir()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(empty_src))
    )
    with _pytest.raises(BuzzBadRequestError, match="scrub_span"):
        corpus_prep_sink(
            stream, str(tmp_path / "t"), str(tmp_path / "s"), str(tmp_path / "c"),
            app_id="x", config=CorpusPrepConfig(scrub_span=50),
        )

    # repetition gate drops the dup-line document in a plain batch call
    clean = "the quick brown fox jumps over the lazy dog and wanders far away"
    repetitive = "\n".join(["same line repeated here"] * 12)
    df = spark.createDataFrame(
        [(1, clean), (2, repetitive)], ["doc_id", "text"]
    )
    cfg = CorpusPrepConfig(min_quality=0.0, repetition_rules={})
    out = _clean_batch(df, cfg, "text", "doc_id", None, 0.5)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_iceberg_sink_exactly_once(spark, sf_dir, tmp_path):
    """Streaming ingestion into Iceberg: drained stream content equals the
    batch source, each micro-batch is one snapshot, and a replayed
    (appId, batchId) pair is a skip — the snapshot-summary transaction
    protocol, Iceberg's analogue of Delta's SetTransaction."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg
    from buzz_rust_spark.streaming.iceberg_sink import iceberg_sink

    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = tmp_path / "ice_sink_src"
    events.repartition(3).write.parquet(str(src))

    table = str(tmp_path / "ice_table")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = iceberg_sink(
        stream, table, checkpoint_dir=str(tmp_path / "ice_ckpt"),
        app_id="ingest-events",
    )
    q.awaitTermination(timeout=120)

    cat = IcebergCatalog("events", table)
    got = cat.to_dataframe(spark)
    assert got.count() == events.count()
    assert {r["event_id"] for r in got.select("event_id").collect()} == {
        r["event_id"] for r in events.select("event_id").collect()
    }
    # one snapshot per non-empty micro-batch, all appends
    assert all(h["operation"] == "append" for h in cat.history())
    assert len(cat.history()) >= 3

    # Replay: same appId + an already-committed batch id must SKIP (None)
    one = events.limit(1)
    s1 = write_iceberg(one, table, txn_app_id="probe", txn_version=0)
    assert s1 is not None
    assert write_iceberg(one, table, txn_app_id="probe", txn_version=0) is None
    # ...and an OLDER batch id too (replays are monotone)
    s2 = write_iceberg(one, table, txn_app_id="probe", txn_version=5)
    assert s2 is not None
    assert write_iceberg(one, table, txn_app_id="probe", txn_version=3) is None
    # a new higher batch id commits; another app id is independent
    assert write_iceberg(one, table, txn_app_id="probe", txn_version=6) is not None
    assert write_iceberg(one, table, txn_app_id="other", txn_version=0) is not None


def test_bloom_dedup_sink_iceberg_target(spark, tmp_path):
    """The shared dedup-commit protocol with table_format='iceberg':
    cross-batch dups drop, survivors land exactly-once in an Iceberg
    table (one snapshot per committing batch), and a direct replay of a
    committed (app, batch) pair skips without touching the state."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.streaming.bloom_ingest import (
        bloom_dedup_sink,
        dedup_commit_batch,
        read_bloom_state,
    )

    table = str(tmp_path / "ice_tbl")
    state = str(tmp_path / "ice_state")
    merged = tmp_path / "ice_in"
    merged.mkdir()
    import os as _os
    import time as _time

    rows_by_file = [
        [(1, "the quick brown fox"), (2, "unique text alpha")],
        [(3, "the quick brown fox"), (4, "unique text beta")],
    ]
    base = _time.time() - 1000
    for i, rows in enumerate(rows_by_file):
        tmp_dir = tmp_path / f"ice_f{i}"
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
            str(tmp_dir)
        )
        for p in tmp_dir.glob("*.parquet"):
            dst = merged / f"{i}.parquet"
            p.rename(dst)
            _os.utime(dst, (base + i * 10, base + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(merged))
    )
    q = bloom_dedup_sink(
        stream, table, state, str(tmp_path / "ice_ckpt"),
        app_id="t-ice", table_format="iceberg",
    )
    q.awaitTermination(timeout=180)

    cat = IcebergCatalog("t", table)
    got = sorted(r.doc_id for r in cat.to_dataframe(spark).collect())
    assert got == [1, 2, 4]  # doc 3 dups doc 1's text cross-batch
    assert len(cat.history()) == 2  # one snapshot per committing batch

    # replayed (app, batch) pair: skipped write; state heals only for rows
    # the table actually holds (all of batch 0 here) — content unchanged
    state_before = {
        (r["word_idx"], r["bits"])
        for r in read_bloom_state(spark, state).collect()
    }
    dedup_commit_batch(
        spark.createDataFrame(rows_by_file[0], ["doc_id", "text"]),
        0, table, state, "t-ice", table_format="iceberg",
    )
    cat2 = IcebergCatalog("t", table)
    assert sorted(r.doc_id for r in cat2.to_dataframe(spark).collect()) == [1, 2, 4]
    state_after = {
        (r["word_idx"], r["bits"])
        for r in read_bloom_state(spark, state).collect()
    }
    assert state_before == state_after  # replay folds idempotently


def test_delta_tail_incremental_corpus_prep(spark, tmp_path):
    """Version-cursor tail of a DELTA source (parity with the Iceberg
    tail): bootstrap processes the full snapshot, later polls read only
    the new commits' files, dups across polls drop via the shared Bloom
    state, a crash re-poll with the previous cursor cannot double-commit,
    no-change and missing-table polls are no-ops."""
    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog
    from buzz_rust_spark.sources.delta_writer import write_delta
    from buzz_rust_spark.streaming.delta_tail import (
        corpus_prep_tail_delta,
        delta_changes_poll,
    )

    good = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")

    # missing source: no-op poll, cursor unchanged
    rows, cur, _ = delta_changes_poll(spark, src, None)
    assert rows is None and cur is None

    write_delta(
        spark.createDataFrame(
            [(1, good + " first body"), (2, good + " second body")],
            "doc_id long, text string",
        ).coalesce(1),
        src,
    )
    r1 = corpus_prep_tail_delta(spark, src, out, state, app_id="dtail")
    assert r1["polled"] is True and r1["cursor"] == 0
    got = {r.doc_id for r in
           DeltaCatalog("o", out).to_dataframe(spark).collect()}
    assert got == {1, 2}

    # append: one fresh doc + one cross-poll duplicate text
    write_delta(
        spark.createDataFrame(
            [(3, good + " second body"), (4, good + " third body")],
            "doc_id long, text string",
        ).coalesce(1),
        src, mode="append",
    )
    r2 = corpus_prep_tail_delta(spark, src, out, state, app_id="dtail",
                                cursor=r1["cursor"])
    assert r2["polled"] is True and r2["cursor"] == 1
    got = {r.doc_id for r in
           DeltaCatalog("o", out).to_dataframe(spark).collect()}
    assert got == {1, 2, 4}  # 3 deduped against poll-1's state

    # crash replay: previous cursor → same window, same txn version →
    # output unchanged (exactly-once)
    n_before = DeltaCatalog("o", out).to_dataframe(spark).count()
    r2b = corpus_prep_tail_delta(spark, src, out, state, app_id="dtail",
                                 cursor=r1["cursor"])
    assert r2b["cursor"] == r2["cursor"]
    assert DeltaCatalog("o", out).to_dataframe(spark).count() == n_before

    # no new commits: no-op poll
    r3 = corpus_prep_tail_delta(spark, src, out, state, app_id="dtail",
                                cursor=r2["cursor"])
    assert r3 == {"cursor": r2["cursor"], "polled": False}


def test_iceberg_tail_incremental_corpus_prep(spark, tmp_path):
    """Cursor-driven incremental tail of an Iceberg source: the bootstrap
    poll processes the full snapshot, later polls only the net-new rows
    (appends and CDC upserts), dups across polls drop via the shared Bloom
    state, a cursor-less re-poll after a crash cannot double-commit, and
    no-change polls are no-ops."""
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import merge_iceberg, write_iceberg
    from buzz_rust_spark.streaming.iceberg_tail import corpus_prep_tail

    good = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")

    write_iceberg(
        spark.createDataFrame(
            [(1, good + " first body"), (2, good + " second body")],
            "doc_id long, text string",
        ),
        src,
    )
    # bootstrap: full snapshot
    r1 = corpus_prep_tail(spark, src, out, state, app_id="tail")
    assert r1["polled"] is True
    got = {r.doc_id for r in
           IcebergCatalog("o", out).to_dataframe(spark).collect()}
    assert got == {1, 2}

    # append: one fresh doc + one cross-poll duplicate text
    write_iceberg(
        spark.createDataFrame(
            [(3, good + " second body"), (4, good + " third body")],
            "doc_id long, text string",
        ),
        src, mode="append",
    )
    r2 = corpus_prep_tail(spark, src, out, state, app_id="tail",
                          cursor=r1["cursor"])
    assert r2["polled"] is True
    got = {r.doc_id for r in
           IcebergCatalog("o", out).to_dataframe(spark).collect()}
    assert got == {1, 2, 4}  # 3 deduped against poll-1's state

    # CDC upsert in the source: only the net-new version flows
    merge_iceberg(
        spark, src,
        spark.createDataFrame([(4, good + " third body revised")],
                              "doc_id long, text string"),
        ["doc_id"],
    )
    r3 = corpus_prep_tail(spark, src, out, state, app_id="tail",
                          cursor=r2["cursor"])
    assert r3["polled"] is True
    rows = {(r.doc_id, r.text.endswith("revised"))
            for r in IcebergCatalog("o", out).to_dataframe(spark).collect()}
    assert (4, True) in rows  # the revision landed (output is append-log)

    # crash replay: re-poll with the PREVIOUS cursor — same window, same
    # txn version → table unchanged (exactly-once)
    n_before = IcebergCatalog("o", out).to_dataframe(spark).count()
    r3b = corpus_prep_tail(spark, src, out, state, app_id="tail",
                           cursor=r2["cursor"])
    assert r3b["cursor"] == r3["cursor"]
    assert IcebergCatalog("o", out).to_dataframe(spark).count() == n_before

    # no new snapshots: no-op poll
    r4 = corpus_prep_tail(spark, src, out, state, app_id="tail",
                          cursor=r3["cursor"])
    assert r4 == {"cursor": r3["cursor"], "polled": False}


def test_delta_upsert_sink_cdc_clauses(spark, sf_dir, tmp_path):
    """Round-11 streaming CDC upsert: micro-batches MERGE into the table
    (conditional clauses included), each batch committing its
    SetTransaction atomically — a replayed batch id is a no-op even for
    non-idempotent clause expressions."""
    from buzz_rust_spark.sources import DeltaCatalog, write_delta
    from buzz_rust_spark.sources.delta_writer import merge_delta
    from buzz_rust_spark.streaming.delta_sink import delta_upsert_sink
    from pyspark.sql import functions as F

    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.lit("keep").alias("tag"),
    )
    table = str(tmp_path / "tbl")
    write_delta(base, table)

    # CDC batches: one parquet file per micro-batch (maxFilesPerTrigger=1)
    cdc = spark.createDataFrame(
        [(3, 999, "x"), (4, 40, "tomb"), (11, 111, "new")],
        "k long, v long, tag string",
    )
    src = tmp_path / "cdc_src"
    cdc.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema(cdc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = delta_upsert_sink(
        stream, table, ["k"], checkpoint_dir=str(tmp_path / "ckpt"),
        app_id="cdc-upsert",
        matched_clauses=[
            {"action": "delete", "condition": "s.tag = 'tomb'"},
            {"action": "update", "condition": "s.v > t.v",
             "set": {"v": "s.v + t.v"}},
        ],
        not_matched_condition="s.tag <> 'tomb'",
    )
    q.awaitTermination(timeout=120)

    got = {
        r["k"]: (r["v"], r["tag"])
        for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    }
    assert got[3] == (1029, "keep")  # conditional partial update
    assert 4 not in got              # conditional delete
    assert got[11] == (111, "new")   # conditional insert
    assert len(got) == 10

    # replayed batch id on the MERGE path: skipped, signaled as None —
    # the non-idempotent "s.v + t.v" expression never re-runs
    replay = merge_delta(
        spark, table,
        spark.createDataFrame([(3, 999, "x")], "k long, v long, tag string"),
        ["k"],
        matched_clauses=[
            {"action": "update", "set": {"v": "s.v + t.v"}}],
        when_not_matched=None,
        txn_app_id="cdc-upsert", txn_version=0,
    )
    assert replay is None
    assert {
        r["k"]: r["v"]
        for r in DeltaCatalog("t", table).to_dataframe(spark).collect()
    }[3] == 1029  # unchanged


def test_iceberg_upsert_sink_cdc_clauses(spark, sf_dir, tmp_path):
    """Round-12 Iceberg streaming CDC upsert (the delta_upsert_sink twin):
    micro-batches MERGE into the table with the (app, batch) idempotence
    marker riding the snapshot summary atomically — a replayed batch id
    is a no-op before any staging, even for non-idempotent clause
    expressions; a crash between staging and commit leaves the table
    unchanged and the retry commits exactly once."""
    from buzz_rust_spark.sources import iceberg_writer
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        write_iceberg,
    )
    from buzz_rust_spark.streaming.iceberg_sink import iceberg_upsert_sink
    from pyspark.sql import functions as F

    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.lit("keep").alias("tag"),
    )
    table = str(tmp_path / "tbl")
    write_iceberg(base, table)

    cdc = spark.createDataFrame(
        [(3, 999, "x"), (4, 40, "tomb"), (11, 111, "new")],
        "k long, v long, tag string",
    )
    src = tmp_path / "cdc_src"
    cdc.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema(cdc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = iceberg_upsert_sink(
        stream, table, ["k"], checkpoint_dir=str(tmp_path / "ckpt"),
        app_id="cdc-upsert",
        matched_clauses=[
            {"action": "delete", "condition": "s.tag = 'tomb'"},
            {"action": "update", "condition": "s.v > t.v",
             "set": {"v": "s.v + t.v"}},
        ],
        not_matched_condition="s.tag <> 'tomb'",
    )
    q.awaitTermination(timeout=120)

    got = {
        r["k"]: (r["v"], r["tag"])
        for r in IcebergCatalog("t", table).to_dataframe(spark).collect()
    }
    assert got[3] == (1029, "keep")  # conditional partial update
    assert 4 not in got              # conditional delete
    assert got[11] == (111, "new")   # conditional insert
    assert len(got) == 10

    # replayed batch id on the MERGE path: skipped BEFORE staging, the
    # non-idempotent "s.v + t.v" never re-runs
    replay = merge_iceberg(
        spark, table,
        spark.createDataFrame([(3, 999, "x")], "k long, v long, tag string"),
        ["k"],
        matched_clauses=[{"action": "update", "set": {"v": "s.v + t.v"}}],
        txn_app_id="cdc-upsert", txn_version=0,
    )
    assert replay is None
    assert {
        r["k"]: r["v"]
        for r in IcebergCatalog("t2", table).to_dataframe(spark).collect()
    }[3] == 1029  # unchanged

    # crash BETWEEN staging and commit: the attempted merge stages data
    # files but never promotes a snapshot — table unchanged — and the
    # retried batch commits exactly once
    real = iceberg_writer._finish_commit
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("injected crash before commit")

    batch2 = spark.createDataFrame(
        [(5, 5000, "x")], "k long, v long, tag string"
    )
    iceberg_writer._finish_commit = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            merge_iceberg(
                spark, table, batch2, ["k"],
                matched_clauses=[
                    {"action": "update", "set": {"v": "s.v + t.v"}}],
                txn_app_id="cdc-upsert", txn_version=100,
            )
    finally:
        iceberg_writer._finish_commit = real
    assert calls["n"] == 1
    assert {
        r["k"]: r["v"]
        for r in IcebergCatalog("t3", table).to_dataframe(spark).collect()
    }[5] == 50  # unchanged: no snapshot committed
    # the replayed delivery (same batch id) now lands exactly once
    r = merge_iceberg(
        spark, table, batch2, ["k"],
        matched_clauses=[{"action": "update", "set": {"v": "s.v + t.v"}}],
        txn_app_id="cdc-upsert", txn_version=100,
    )
    assert r is not None
    assert {
        r["k"]: r["v"]
        for r in IcebergCatalog("t4", table).to_dataframe(spark).collect()
    }[5] == 5050


def test_upsert_sink_full_sync_by_source(spark, sf_dir, tmp_path):
    """The full-sync CDC idiom through BOTH upsert sinks: one snapshot
    micro-batch updates stale rows, inserts new ones, and — via the
    by-source clauses — deletes every row the snapshot no longer
    contains, all in ONE atomic commit per format."""
    from buzz_rust_spark.sources import DeltaCatalog, write_delta
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import write_iceberg
    from buzz_rust_spark.streaming.delta_sink import delta_upsert_sink
    from buzz_rust_spark.streaming.iceberg_sink import iceberg_upsert_sink
    from pyspark.sql import functions as F

    base = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    snap = spark.createDataFrame(
        [(1, 10), (3, 333), (9, 90)], "k long, v long"
    )
    src = tmp_path / "snap_src"
    snap.coalesce(1).write.parquet(str(src))
    expect = [(1, 10), (3, 333), (9, 90)]

    dt = str(tmp_path / "d")
    write_delta(base, dt)
    q = delta_upsert_sink(
        spark.readStream.schema(snap.schema).parquet(str(src)),
        dt, ["k"], checkpoint_dir=str(tmp_path / "dckpt"),
        app_id="sync-d",
        matched_clauses=[
            {"action": "update", "condition": "s.v <> t.v",
             "set": {"v": "s.v"}}],
        by_source_clauses=[{"action": "delete", "condition": None}],
    )
    q.awaitTermination(timeout=120)
    got = sorted(
        (r.k, r.v)
        for r in DeltaCatalog("d", dt).to_dataframe(spark).collect()
    )
    assert got == expect

    it = str(tmp_path / "i")
    write_iceberg(base, it)
    q = iceberg_upsert_sink(
        spark.readStream.schema(snap.schema).parquet(str(src)),
        it, ["k"], checkpoint_dir=str(tmp_path / "ickpt"),
        app_id="sync-i",
        matched_clauses=[
            {"action": "update", "condition": "s.v <> t.v",
             "set": {"v": "s.v"}}],
        by_source_clauses=[{"action": "delete", "condition": None}],
    )
    q.awaitTermination(timeout=120)
    got = sorted(
        (r.k, r.v)
        for r in IcebergCatalog("i", it).to_dataframe(spark).collect()
    )
    assert got == expect
