"""Incremental materialized aggregates over the CDC changelogs.

The natural consumer of :func:`~.iceberg.read_iceberg_changelog` /
:func:`~.delta_catalog.read_delta_changelog`: a grouped COUNT/SUM
materialization of a big source table, maintained by applying only each
refresh window's retractable delta instead of re-aggregating the source —
classic self-maintainable incremental view maintenance (Gupta & Mumick,
"Maintenance of Materialized Views", IEEE Data Eng. Bull. 1995).

Why only count/sum (and avg, derivable as sum/count at read time): they
are the SELF-MAINTAINABLE aggregates — an insert contributes ``+value``
and a delete ``-value`` with no need to look at the rest of the group.
min/max are not maintainable under deletion without the group's full
multiset (deleting the current min needs the runner-up), so they are a
typed refusal, not a silent wrong answer.

Scale shape (the point at 100 TB):

- a refresh reads O(changed files) from the source (the changelog's
  contract), aggregates the delta map-side, and joins it against ONLY the
  affected groups of the materialization (broadcast semi-join selects
  them) — never the full source, never the full materialization;
- the state upsert is :func:`~.iceberg_writer.merge_iceberg` — equality
  deletes, O(delta), no table scan;
- the cursor (last materialized source snapshot/version) commits in the
  SAME metadata promote as the merge (``set_properties``), so a crash
  either lands both or neither: refresh is exactly-once without a
  coordinator.

Groups whose row count reaches zero stay as ``n_rows = 0`` tombstone rows
(a merge cannot delete, and a per-refresh predicate DELETE would cost a
commit per refresh); :func:`read_materialization` filters them and
``rewrite_iceberg`` drops them physically at compaction time.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..errors import BuzzBadRequestError, BuzzExecutionError

CURSOR_PROP = "buzz.matview.cursor"
SPEC_PROP = "buzz.matview.spec"


def _agg_delta(cl: DataFrame, group_cols: list[str], sum_cols: list[str]):
    """The changelog window's per-group delta: each insert row weighs +1,
    each delete row −1; sums weigh ±value (NULL values contribute 0 to
    the sum but ±1 to the count, matching SQL SUM/COUNT(*))."""
    from pyspark.sql import functions as F

    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    aggs = [F.sum(w).cast("long").alias("n_rows")]
    for c in sum_cols:
        aggs.append(
            F.sum(
                w.cast("double") * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
            ).alias(f"sum_{c}")
        )
    return cl.groupBy(*group_cols).agg(*aggs)


def _read_source_changelog(
    spark: SparkSession,
    source_uri: str,
    source_format: str,
    cursor: str,
    upto: str,
):
    """The changelog window (cursor, upto] — BOTH ends pinned: an
    unbounded read would apply commits landing after the position the
    refresh records as its cursor, double-counting them next refresh."""
    if source_format == "iceberg":
        from .iceberg import read_iceberg_changelog

        return read_iceberg_changelog(
            spark, source_uri, int(cursor), to_snapshot_id=int(upto)
        )
    from .delta_catalog import read_delta_changelog

    return read_delta_changelog(
        spark, source_uri, int(cursor), to_version=int(upto)
    )


def _source_position(spark: SparkSession, source_uri: str, source_format: str):
    """The source's current position (Iceberg snapshot id / Delta version),
    or None for an empty table.  The Iceberg position is the CURRENT
    snapshot, never the newest-by-order entry: after rollback_iceberg the
    log still lists abandoned snapshots whose changes the table no longer
    contains (the changelog's ancestor-chain walk then raises the typed
    re-bootstrap error if a recorded cursor points into the fork)."""
    if source_format == "iceberg":
        from .iceberg import IcebergCatalog

        return IcebergCatalog("_matview_src", source_uri).resolved_snapshot_id
    from .delta_catalog import _commit_versions
    from .logstore import LogStore

    commits = _commit_versions(LogStore(source_uri))
    return commits[-1][0] if commits else None


def refresh_materialization(
    spark: SparkSession,
    source_uri: str,
    target_uri: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    source_format: str = "iceberg",
) -> dict | None:
    """Create or incrementally refresh a grouped COUNT/SUM materialization
    of ``source_uri`` at ``target_uri`` (an Iceberg table).

    First call BOOTSTRAPS: one full aggregate of the source, written with
    the source cursor in the table properties.  Later calls read the
    source CHANGELOG from the recorded cursor, aggregate the ±delta, join
    it with only the AFFECTED groups' current state, and upsert the new
    state — one atomic commit carrying the advanced cursor.  A refresh
    with no source changes returns None without committing.

    Columns in the target: ``group_cols``, ``n_rows`` (long), and one
    ``sum_<col>`` (double) per requested sum column.  ``avg`` is
    ``sum/n_rows`` at read time.  min/max are refused (not maintainable
    under deletion).  Returns the commit summary plus the new cursor.

    Failure contract: a crash between nothing and everything — the cursor
    commits atomically with the merge, and the commit CASes on the cursor
    the window was computed from (``expect_properties``), so two
    concurrent refreshes cannot double-apply a window: the loser raises
    the typed non-retryable abort.  If the source's history was
    cleaned/expired past the cursor, the changelog read raises its typed
    re-bootstrap error; drop the target (or pass a fresh ``target_uri``)
    and bootstrap again."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from .iceberg import IcebergCatalog
    from .iceberg_writer import _load_meta, merge_iceberg, write_iceberg

    sum_cols = list(sum_cols or [])
    if not group_cols:
        raise BuzzBadRequestError("refresh_materialization: no group_cols")
    if source_format not in ("iceberg", "delta"):
        raise BuzzBadRequestError(
            f"source_format must be iceberg|delta, got {source_format!r}"
        )
    overlap = set(group_cols) & set(sum_cols)
    if overlap:
        raise BuzzBadRequestError(
            f"columns {sorted(overlap)} appear in both group_cols and "
            "sum_cols"
        )

    pos = _source_position(spark, source_uri, source_format)
    if pos is None:
        return None  # empty source: nothing to materialize yet

    spec = {
        "source": source_format,
        "group_cols": list(group_cols),
        "sum_cols": sum_cols,
    }

    from .iceberg_writer import _local_table_dir

    existing = _load_meta(_local_table_dir(target_uri))
    if existing is None:
        # --- bootstrap: one full aggregate of the current source state ---
        # pinned at `pos`: a concurrent commit between the position read
        # and this scan must not leak into a state recorded AS OF `pos`
        if source_format == "iceberg":
            src = IcebergCatalog(
                "_matview_src", source_uri, snapshot_id=int(pos)
            ).to_dataframe(spark)
        else:
            from .delta_catalog import DeltaCatalog

            src = DeltaCatalog(
                "_matview_src", source_uri, version=int(pos)
            ).to_dataframe(spark)
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
            F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in sum_cols
        ]
        state = src.groupBy(*group_cols).agg(*aggs)
        # sum of an all-NULL group is NULL in SQL; store 0 so the ±delta
        # arithmetic stays closed (read_materialization reports the sums
        # as stored — COUNT drives liveness)
        for c in sum_cols:
            state = state.withColumn(
                f"sum_{c}", F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
            )
        out = write_iceberg(
            state,
            target_uri,
            properties={
                CURSOR_PROP: str(pos),
                SPEC_PROP: json.dumps(spec, sort_keys=True),
            },
        )
        return {**(out or {}), "cursor": str(pos), "bootstrapped": True}

    # --- incremental refresh ---
    _, meta = existing
    props = meta.get("properties") or {}
    cursor = props.get(CURSOR_PROP)
    recorded = props.get(SPEC_PROP)
    if cursor is None or recorded is None:
        raise BuzzExecutionError(
            f"{target_uri!r} exists but carries no materialization "
            "cursor/spec properties — not a materialization target"
        )
    if json.loads(recorded) != spec:
        raise BuzzBadRequestError(
            "materialization spec mismatch: the target was built with "
            f"{recorded}, refresh asked for {json.dumps(spec, sort_keys=True)}"
            " — use a new target_uri"
        )
    if str(pos) == cursor:
        return None  # source unchanged since the cursor

    cl = _read_source_changelog(
        spark, source_uri, source_format, cursor, str(pos)
    )
    delta = _agg_delta(cl, group_cols, sum_cols).persist()
    try:
        if delta.limit(1).count() == 0:
            # commits existed but netted to zero rows (e.g. compactions):
            # still advance the cursor so polls stay O(new history).
            # expect_props CASes on the cursor this window was computed
            # FROM — a concurrent refresh that already advanced it must
            # abort this one, or the cursor could leap past a window whose
            # delta was never applied (see the merge path's CAS below)
            from .iceberg_writer import set_iceberg_properties

            set_iceberg_properties(
                target_uri,
                {CURSOR_PROP: str(pos)},
                expect_props={CURSOR_PROP: cursor},
            )
            return {"cursor": str(pos), "groups_updated": 0}

        # affected groups' current state — broadcast semi-join keeps the
        # read O(delta), never a full materialization scan
        cat = IcebergCatalog("_matview", target_uri)
        current = cat.to_dataframe(spark).join(
            broadcast(delta.select(*group_cols)), on=group_cols, how="left_semi"
        )
        joined = delta.alias("__d").join(
            current.alias("__c"), on=group_cols, how="left"
        )
        new_state = joined.select(
            *group_cols,
            (
                F.coalesce(F.col("__c.n_rows"), F.lit(0))
                + F.col("__d.n_rows")
            ).cast("long").alias("n_rows"),
            *[
                (
                    F.coalesce(F.col(f"__c.sum_{c}"), F.lit(0.0))
                    + F.col(f"__d.sum_{c}")
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        # one pass for both checks (a separate limit(1) + count would
        # re-execute the state join twice); the merge's own evaluation
        # reuses the persisted frame
        new_state = new_state.persist()
        try:
            stats = new_state.agg(
                F.min("n_rows").alias("__mn"),
                F.count(F.lit(1)).alias("__n"),
            ).collect()[0]
            if stats["__mn"] is not None and int(stats["__mn"]) < 0:
                raise BuzzExecutionError(
                    "materialization drift: a group's row count went "
                    "negative — the changelog retracted rows the state "
                    "never counted (cursor mismatch or out-of-band source "
                    "rewrite); re-bootstrap with a fresh target_uri"
                )
            n_groups = int(stats["__n"])
            # expect_properties CASes the commit on the cursor this delta
            # was computed from: two concurrent refreshes that both read
            # cursor C cannot both apply the (C, pos] window — the loser's
            # commit (original claim or retry) sees the advanced cursor
            # and raises the typed non-retryable abort instead of
            # double-counting
            out = merge_iceberg(
                spark,
                target_uri,
                new_state,
                key_cols=list(group_cols),
                set_properties={CURSOR_PROP: str(pos)},
                expect_properties={CURSOR_PROP: cursor},
            )
        finally:
            new_state.unpersist()
        return {**(out or {}), "cursor": str(pos), "groups_updated": n_groups}
    finally:
        delta.unpersist()


def read_materialization(spark: SparkSession, target_uri: str) -> DataFrame:
    """The materialization's LIVE groups (``n_rows > 0``; zero-count
    tombstones awaiting compaction are filtered)."""
    from .iceberg import IcebergCatalog

    return (
        IcebergCatalog("_matview", target_uri)
        .to_dataframe(spark)
        .where("n_rows > 0")
    )
