"""Incremental materialized aggregates over the CDC changelogs.

The natural consumer of :func:`~.iceberg.read_iceberg_changelog` /
:func:`~.delta_catalog.read_delta_changelog`: a grouped COUNT/SUM
materialization of a big source table, maintained by applying only each
refresh window's retractable delta instead of re-aggregating the source —
classic self-maintainable incremental view maintenance (Gupta & Mumick,
"Maintenance of Materialized Views", IEEE Data Eng. Bull. 1995).

count/sum (and avg, derivable as sum/count at read time) are the
SELF-MAINTAINABLE aggregates — an insert contributes ``+value`` and a
delete ``-value`` with no need to look at the rest of the group.
min/max are not maintainable under deletion without the group's full
multiset (deleting the current min needs the runner-up), so they take a
HYBRID strategy: incremental under inserts, and a targeted rescan of
ONLY the groups whose retractions touch their current extremum.  Join
materializations (:func:`refresh_join_materialization`, inner AND left
outer, with min/max via the same hybrid) maintain a two-table join's
aggregate from the classical signed-delta identity
``Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR`` — each side's changelog joined to the
other's pinned state, weights multiplying — never re-joining the full
tables; :func:`refresh_chain_materialization` applies the rule
associatively across an N-table inner chain (one Δ-term per moved
source, prefix states pinned OLD, suffix states pinned NEW).

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


def _agg_delta(
    cl: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    weight_col: str | None = None,
):
    """The changelog window's per-group delta: each insert row weighs +1,
    each delete row −1; sums weigh ±value (NULL values contribute 0 to
    the sum but ±1 to the count, matching SQL SUM/COUNT(*)).

    ``min_cols``/``max_cols`` additionally gather the window's INSERTED
    extremes (``__insmin_/__insmax_``, the incremental half of min/max
    maintenance) and the DELETED extremes (``__delmin_/__delmax_``, the
    danger test: a retraction at or past the group's current extremum
    forces a targeted rescan).  ``weight_col`` replaces the ±1 with an
    arbitrary signed weight — the join materialization's changelog×state
    products; there a positive weight is an insertion (its values are
    extremum candidates) and a negative one a retraction (danger test),
    regardless of multiplicity."""
    from pyspark.sql import functions as F

    if weight_col is not None:
        w = F.col(weight_col).cast("long")
        ins = F.col(weight_col) > 0
    else:
        w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        ins = F.col("_change_type") == "insert"
    aggs = [F.sum(w).cast("long").alias("n_rows")]
    for c in sum_cols:
        aggs.append(
            F.sum(
                w.cast("double") * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
            ).alias(f"sum_{c}")
        )
    for c in min_cols:
        aggs.append(F.min(F.when(ins, F.col(c))).alias(f"__insmin_{c}"))
        aggs.append(F.min(F.when(~ins, F.col(c))).alias(f"__delmin_{c}"))
    for c in max_cols:
        aggs.append(F.max(F.when(ins, F.col(c))).alias(f"__insmax_{c}"))
        aggs.append(F.max(F.when(~ins, F.col(c))).alias(f"__delmax_{c}"))
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


def _pinned_source(
    spark: SparkSession, source_uri: str, source_format: str, pos
) -> DataFrame:
    """The source AS OF ``pos`` — every read a refresh takes is pinned at
    the position it records, so a concurrent source commit can never leak
    into a state recorded as of an earlier cursor."""
    if source_format == "iceberg":
        from .iceberg import IcebergCatalog

        return IcebergCatalog(
            "_matview_src", source_uri, snapshot_id=int(pos)
        ).to_dataframe(spark)
    from .delta_catalog import DeltaCatalog

    return DeltaCatalog(
        "_matview_src", source_uri, version=int(pos)
    ).to_dataframe(spark)


def _signed_changelog(cl: DataFrame) -> DataFrame:
    """Changelog rows → signed weight column ``__w`` (+1 insert / −1
    delete) — the multiset form the join identities multiply through."""
    from pyspark.sql import functions as F

    return cl.withColumn(
        "__w",
        F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        ),
    ).drop("_change_type")


def _bootstrap_state(
    joined: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
) -> DataFrame:
    """Full-aggregate bootstrap state over a (joined) source frame; the
    sum of an all-NULL group stores 0 so the ±delta arithmetic stays
    closed (COUNT drives liveness)."""
    from pyspark.sql import functions as F

    aggs = (
        [F.count(F.lit(1)).cast("long").alias("n_rows")]
        + [
            F.sum(F.col(c).cast("double")).alias(f"sum_{c}")
            for c in sum_cols
        ]
        + [F.min(c).alias(f"min_{c}") for c in min_cols]
        + [F.max(c).alias(f"max_{c}") for c in max_cols]
    )
    state = joined.groupBy(*group_cols).agg(*aggs)
    for c in sum_cols:
        state = state.withColumn(
            f"sum_{c}", F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
        )
    return state


def _apply_delta(
    spark: SparkSession,
    target_uri: str,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
    rescan_source,
    cursor_expect: str,
    cursor_new: str,
) -> dict:
    """The shared incremental tail: join the persisted ±delta with ONLY the
    affected groups' current state (broadcast semi-join), apply the min/max
    hybrid (incremental under inserts; targeted rescan of ``rescan_source()``
    — the pinned single table OR the pinned re-join — for exactly the
    groups whose retractions touch their extremum), guard against negative
    counts (cursor drift), and merge with the cursor CAS.  Returns the
    commit summary with ``groups_updated``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from functools import reduce

    from .iceberg import IcebergCatalog
    from .iceberg_writer import merge_iceberg

    def _nullsafe_on(left_alias: str, right_alias: str):
        # group keys can be NULL (e.g. a LEFT-join view's null-extended
        # rows; SQL GROUP BY groups NULLs): plain on=group_cols would
        # silently drop those groups' current state and over-write them
        return reduce(
            lambda a, b: a & b,
            [
                F.col(f"{left_alias}.{g}").eqNullSafe(
                    F.col(f"{right_alias}.{g}")
                )
                for g in group_cols
            ],
        )

    cat = IcebergCatalog("_matview", target_uri)
    current = (
        cat.to_dataframe(spark)
        .alias("__s")
        .join(
            broadcast(delta.select(*group_cols).alias("__k")),
            on=_nullsafe_on("__s", "__k"),
            how="left_semi",
        )
    )
    joined = delta.alias("__d").join(
        current.alias("__c"), on=_nullsafe_on("__d", "__c"), how="left"
    )
    group_exprs = [F.col(f"__d.{g}").alias(g) for g in group_cols]
    new_n = (
        F.coalesce(F.col("__c.n_rows"), F.lit(0)) + F.col("__d.n_rows")
    ).cast("long")

    # min/max maintenance (the hybrid strategy): under inserts alone
    # the new extremum is least/greatest(current, window's inserted
    # extremum) — self-maintainable.  A RETRACTION at or past the
    # current extremum (__delmin ≤ min / __delmax ≥ max) means the
    # runner-up is unknown from the state: flag the group for a
    # TARGETED rescan of the pinned source (semi-join on exactly the
    # flagged groups — never a full re-aggregate).  A group whose
    # count reaches zero stores NULL extremes (tombstone).
    danger_terms = []
    minmax_cols = []
    for c in min_cols:
        cur_v, dmin, imin = (
            F.col(f"__c.min_{c}"),
            F.col(f"__d.__delmin_{c}"),
            F.col(f"__d.__insmin_{c}"),
        )
        # ANY retraction at/below the current extremum — or against a
        # group with NO current extremum (new group or tombstone: a
        # raw per-commit feed like recorded Delta CDF surfaces
        # insert-then-delete pairs un-netted, so the inserted extremum
        # may itself be retracted in-window) — forces the rescan
        danger_terms.append(
            dmin.isNotNull() & (cur_v.isNull() | (dmin <= cur_v))
        )
        minmax_cols.append(
            F.when(new_n <= 0, F.lit(None))
            .otherwise(F.least(cur_v, imin))
            .alias(f"min_{c}")
        )
    for c in max_cols:
        cur_v, dmax, imax = (
            F.col(f"__c.max_{c}"),
            F.col(f"__d.__delmax_{c}"),
            F.col(f"__d.__insmax_{c}"),
        )
        danger_terms.append(
            dmax.isNotNull() & (cur_v.isNull() | (dmax >= cur_v))
        )
        minmax_cols.append(
            F.when(new_n <= 0, F.lit(None))
            .otherwise(F.greatest(cur_v, imax))
            .alias(f"max_{c}")
        )
    rescan_flag = F.lit(False)
    for t in danger_terms:
        rescan_flag = rescan_flag | F.coalesce(t, F.lit(False))
    rescan_flag = rescan_flag & (new_n > 0)

    new_state = joined.select(
        *group_exprs,
        new_n.alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"__c.sum_{c}"), F.lit(0.0))
                + F.col(f"__d.sum_{c}")
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
        *minmax_cols,
        rescan_flag.alias("__rescan"),
    )
    # one pass for all checks (a separate limit(1) + count would
    # re-execute the state join twice); the merge's own evaluation
    # reuses the persisted frame.  The persisted HANDLE is kept apart:
    # the rescan branch rebinds new_state to a derived plan, and
    # unpersisting the derivative would leave the original cached
    # relation registered forever (one leak per refresh)
    persisted_state = new_state.persist()
    new_state = persisted_state
    try:
        stats = new_state.agg(
            F.min("n_rows").alias("__mn"),
            F.count(F.lit(1)).alias("__n"),
            F.max(F.col("__rescan").cast("int")).alias("__any_rescan"),
        ).collect()[0]
        if stats["__mn"] is not None and int(stats["__mn"]) < 0:
            raise BuzzExecutionError(
                "materialization drift: a group's row count went "
                "negative — the changelog retracted rows the state "
                "never counted (cursor mismatch or out-of-band source "
                "rewrite); re-bootstrap with a fresh target_uri"
            )
        n_groups = int(stats["__n"])
        if int(stats["__any_rescan"] or 0):
            flagged = new_state.where("__rescan").select(*group_cols)
            src = rescan_source()
            rescan = (
                src.alias("__v")
                .join(
                    broadcast(flagged.alias("__f")),
                    on=_nullsafe_on("__v", "__f"),
                    how="left_semi",
                )
                .groupBy(*group_cols)
                .agg(
                    *[F.min(c).alias(f"__rs_min_{c}") for c in min_cols],
                    *[F.max(c).alias(f"__rs_max_{c}") for c in max_cols],
                )
            )
            new_state = new_state.alias("__n").join(
                rescan.alias("__r"),
                on=_nullsafe_on("__n", "__r"),
                how="left",
            )
            new_state = new_state.select(
                *[F.col(f"__n.{g}").alias(g) for g in group_cols],
                "n_rows",
                *[f"sum_{c}" for c in sum_cols],
                *[
                    F.when(
                        F.col("__rescan"), F.col(f"__rs_min_{c}")
                    ).otherwise(F.col(f"min_{c}")).alias(f"min_{c}")
                    for c in min_cols
                ],
                *[
                    F.when(
                        F.col("__rescan"), F.col(f"__rs_max_{c}")
                    ).otherwise(F.col(f"max_{c}")).alias(f"max_{c}")
                    for c in max_cols
                ],
            )
        else:
            new_state = new_state.drop("__rescan")
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
            set_properties={CURSOR_PROP: cursor_new},
            expect_properties={CURSOR_PROP: cursor_expect},
        )
    finally:
        persisted_state.unpersist()
    return {**(out or {}), "cursor": cursor_new, "groups_updated": n_groups}


def refresh_materialization(
    spark: SparkSession,
    source_uri: str,
    target_uri: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
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

    Columns in the target: ``group_cols``, ``n_rows`` (long), one
    ``sum_<col>`` (double) per sum column, and one ``min_<col>`` /
    ``max_<col>`` (source-typed) per requested extremum column.  ``avg``
    is ``sum/n_rows`` at read time.  min/max take the HYBRID strategy:
    incremental under inserts (least/greatest with the window's inserted
    extremum), and a TARGETED rescan of only the groups whose retractions
    touch their current extremum (the runner-up is not derivable from the
    state — the classical non-self-maintainability of MIN/MAX under
    deletes, handled by rescan instead of refusal).  Returns the commit
    summary plus the new cursor.

    Failure contract: a crash between nothing and everything — the cursor
    commits atomically with the merge, and the commit CASes on the cursor
    the window was computed from (``expect_properties``), so two
    concurrent refreshes cannot double-apply a window: the loser raises
    the typed non-retryable abort.  A window whose COORDINATES are
    unmappable but whose current state is intact (an in-range compaction
    rewrote files a later position delete targets —
    :class:`~..errors.BuzzRebootstrapError`) RECOVERS automatically: a
    pinned full recompute commits as one overwrite carrying the new
    cursor, CASed on the old.  History cleaned/EXPIRED past the cursor
    still refuses (rows may be unrecoverable-silently otherwise): drop
    the target (or pass a fresh ``target_uri``) and bootstrap again."""
    from pyspark.sql import functions as F

    from .iceberg_writer import _load_meta, write_iceberg

    sum_cols = list(sum_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    if not group_cols:
        raise BuzzBadRequestError("refresh_materialization: no group_cols")
    if source_format not in ("iceberg", "delta"):
        raise BuzzBadRequestError(
            f"source_format must be iceberg|delta, got {source_format!r}"
        )
    overlap = set(group_cols) & (
        set(sum_cols) | set(min_cols) | set(max_cols)
    )
    if overlap:
        raise BuzzBadRequestError(
            f"columns {sorted(overlap)} appear in both group_cols and "
            "sum/min/max cols"
        )

    pos = _source_position(spark, source_uri, source_format)
    if pos is None:
        return None  # empty source: nothing to materialize yet

    spec = {
        "source": source_format,
        "group_cols": list(group_cols),
        "sum_cols": sum_cols,
    }
    # back-compat: pre-min/max targets recorded specs without these keys;
    # an empty list and an absent key must compare equal
    if min_cols:
        spec["min_cols"] = min_cols
    if max_cols:
        spec["max_cols"] = max_cols

    from .iceberg_writer import _local_table_dir

    existing = _load_meta(_local_table_dir(target_uri))
    if existing is None:
        # --- bootstrap: one full aggregate of the current source state ---
        # pinned at `pos`: a concurrent commit between the position read
        # and this scan must not leak into a state recorded AS OF `pos`
        src = _pinned_source(spark, source_uri, source_format, pos)
        aggs = (
            [F.count(F.lit(1)).cast("long").alias("n_rows")]
            + [
                F.sum(F.col(c).cast("double")).alias(f"sum_{c}")
                for c in sum_cols
            ]
            + [F.min(c).alias(f"min_{c}") for c in min_cols]
            + [F.max(c).alias(f"max_{c}") for c in max_cols]
        )
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

    from ..errors import BuzzRebootstrapError

    try:
        cl = _read_source_changelog(
            spark, source_uri, source_format, cursor, str(pos)
        )
        delta = _agg_delta(cl, group_cols, sum_cols, min_cols, max_cols)
        delta = delta.persist()
        delta_rows = delta.limit(1).count()
    except BuzzRebootstrapError:
        # The window's coordinates are unmappable (e.g. a position delete
        # landed after an in-range compaction rewrote its targets) but the
        # CURRENT source state is fully intact — recover with a pinned
        # full recompute committed as ONE overwrite that carries the new
        # cursor atomically and CASes on the old one, so a concurrent
        # refresh that already advanced it wins and this recovery aborts
        # typed instead of clobbering newer state.
        src = _pinned_source(spark, source_uri, source_format, pos)
        aggs = (
            [F.count(F.lit(1)).cast("long").alias("n_rows")]
            + [
                F.sum(F.col(c).cast("double")).alias(f"sum_{c}")
                for c in sum_cols
            ]
            + [F.min(c).alias(f"min_{c}") for c in min_cols]
            + [F.max(c).alias(f"max_{c}") for c in max_cols]
        )
        state = src.groupBy(*group_cols).agg(*aggs)
        for c in sum_cols:
            state = state.withColumn(
                f"sum_{c}", F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
            )
        out = write_iceberg(
            state,
            target_uri,
            mode="overwrite",
            set_properties={CURSOR_PROP: str(pos)},
            expect_properties={CURSOR_PROP: cursor},
        )
        return {
            **(out or {}),
            "cursor": str(pos),
            "bootstrapped": True,
            "rebootstrap": "unmappable incremental window",
        }
    try:
        if delta_rows == 0:
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

        return _apply_delta(
            spark,
            target_uri,
            delta,
            group_cols,
            sum_cols,
            min_cols,
            max_cols,
            lambda: _pinned_source(spark, source_uri, source_format, pos),
            cursor_expect=cursor,
            cursor_new=str(pos),
        )
    finally:
        delta.unpersist()


def _resolve_join_columns(
    l_cols: list[str],
    r_cols: list[str],
    join_cols: list[str],
    wanted: list[str],
) -> None:
    """Typed validation that every wanted (group/sum) column resolves
    UNAMBIGUOUSLY across the two join sides: join keys live on both by
    construction; any other column must exist on exactly one side."""
    for k in join_cols:
        if k not in l_cols or k not in r_cols:
            raise BuzzBadRequestError(
                f"join column {k!r} must exist on both sides "
                f"(left has {sorted(l_cols)}, right has {sorted(r_cols)})"
            )
    for c in wanted:
        if c in join_cols:
            continue
        in_l, in_r = c in l_cols, c in r_cols
        if in_l and in_r:
            raise BuzzBadRequestError(
                f"column {c!r} exists on BOTH join sides — rename one "
                "(the materialization cannot disambiguate)"
            )
        if not in_l and not in_r:
            raise BuzzBadRequestError(
                f"column {c!r} exists on neither join side"
            )


def refresh_join_materialization(
    spark: SparkSession,
    left_uri: str,
    right_uri: str,
    target_uri: str,
    join_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    left_format: str = "iceberg",
    right_format: str = "iceberg",
    how: str = "inner",
) -> dict | None:
    """Create or incrementally refresh a grouped COUNT/SUM/MIN/MAX
    materialization of ``left ⋈ right`` on ``join_cols`` — the join-view
    extension of :func:`refresh_materialization`.  ``how`` is ``inner``
    or ``left`` (LEFT OUTER: unmatched left rows contribute with NULL
    right columns, exactly SQL's null-extension).

    INNER maintenance uses the classical signed delta identity
    ``Δ(L⋈R) = ΔL ⋈ R_new ∪ L_old ⋈ ΔR``: each source's changelog window
    (weights ±1) joins the OTHER side's pinned state — ``R_new`` at the
    new right cursor, ``L_old`` at the OLD left cursor — and the weighted
    products aggregate into the same ±delta merge as the single-table
    view.  Cost is O(Δ × matching state), never a re-join of the full
    tables.

    LEFT OUTER is linear in its LEFT argument only, so the identity
    splits: ``ΔL ⟕ R_new`` stays exact for the left window (an inserted
    left row with no match emits its null-extended form), while the
    right window takes a KEY-RESTRICTED recompute — for K = the join
    keys appearing in ΔR (the only keys whose null-extension status can
    flip), emit ``(L_old∣K) ⟕ (R_new∣K)`` with weight +1 and
    ``(L_old∣K) ⟕ (R_old∣K)`` with weight −1.  Keys outside K cancel
    exactly; cost is O(affected keys × their fan-in), never a full
    re-join.

    min/max reuse the single-table HYBRID: incremental under inserted
    extremes, targeted rescan of the pinned RE-JOIN restricted to only
    the flagged groups.  Duplicate join keys multiply per join
    semantics — the identities stay exact for multisets.  Both cursors
    commit atomically with the merge and are CAS-validated, so
    concurrent refreshes cannot double-apply.  Returns the summary +
    new cursors, or None when neither source moved."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from .iceberg_writer import (
        _load_meta,
        _local_table_dir,
        set_iceberg_properties,
        write_iceberg,
    )

    sum_cols = list(sum_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    join_cols = list(join_cols)
    if not group_cols or not join_cols:
        raise BuzzBadRequestError(
            "refresh_join_materialization: group_cols and join_cols required"
        )
    if how not in ("inner", "left"):
        raise BuzzBadRequestError(
            f"how must be inner|left, got {how!r}"
        )
    value_cols = sum_cols + min_cols + max_cols
    overlap = set(group_cols) & set(value_cols)
    if overlap:
        raise BuzzBadRequestError(
            f"columns {sorted(overlap)} appear in both group_cols and "
            "sum/min/max cols"
        )
    for fmt in (left_format, right_format):
        if fmt not in ("iceberg", "delta"):
            raise BuzzBadRequestError(
                f"source format must be iceberg|delta, got {fmt!r}"
            )
    posL = _source_position(spark, left_uri, left_format)
    posR = _source_position(spark, right_uri, right_format)
    if posL is None or posR is None:
        return None  # an empty side: nothing to build yet

    spec = {
        "kind": "join",
        "left": left_format,
        "right": right_format,
        "join_cols": join_cols,
        "group_cols": list(group_cols),
        "sum_cols": sum_cols,
    }
    # back-compat: pre-extension targets recorded specs without these keys
    if min_cols:
        spec["min_cols"] = min_cols
    if max_cols:
        spec["max_cols"] = max_cols
    if how != "inner":
        spec["how"] = how
    cursor_val = json.dumps(
        {"left": str(posL), "right": str(posR)}, sort_keys=True
    )

    def _pinned_join(pL, pR) -> DataFrame:
        L = _pinned_source(spark, left_uri, left_format, pL)
        R = _pinned_source(spark, right_uri, right_format, pR)
        _resolve_join_columns(
            L.columns, R.columns, join_cols, list(group_cols) + value_cols
        )
        return L.join(R, on=join_cols, how=how)

    existing = _load_meta(_local_table_dir(target_uri))
    if existing is None:
        state = _bootstrap_state(
            _pinned_join(posL, posR), group_cols, sum_cols, min_cols,
            max_cols,
        )
        out = write_iceberg(
            state,
            target_uri,
            properties={
                CURSOR_PROP: cursor_val,
                SPEC_PROP: json.dumps(spec, sort_keys=True),
            },
        )
        return {**(out or {}), "cursor": cursor_val, "bootstrapped": True}

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
    cur = json.loads(cursor)
    curL, curR = cur["left"], cur["right"]
    if str(posL) == curL and str(posR) == curR:
        return None  # neither source moved

    def _side(df: DataFrame, own: list[str]) -> DataFrame:
        keep = join_cols + [
            c
            for c in dict.fromkeys(list(group_cols) + value_cols)
            if c in own and c not in join_cols
        ]
        extra = ["__w"] if "__w" in df.columns else []
        return df.select(*keep, *extra)

    frames: list[DataFrame] = []
    # ΔL ⋈ R_new: the left window's signed rows against the right state at
    # its NEW cursor.  Exact for BOTH join kinds: inner by the classical
    # identity, left-outer because the join is linear in its left argument
    # (each left row's contribution — matches or null-extension — is
    # independent of the rest of L).
    if str(posL) != curL:
        dL = _signed_changelog(
            _read_source_changelog(
                spark, left_uri, left_format, curL, str(posL)
            )
        )
        R_new = _pinned_source(spark, right_uri, right_format, posR)
        _resolve_join_columns(
            dL.columns, R_new.columns, join_cols,
            list(group_cols) + value_cols,
        )
        frames.append(
            _side(dL, dL.columns).join(
                _side(R_new, R_new.columns), on=join_cols, how=how
            )
        )
    if str(posR) != curR:
        dR = _signed_changelog(
            _read_source_changelog(
                spark, right_uri, right_format, curR, str(posR)
            )
        )
        L_old = _pinned_source(spark, left_uri, left_format, curL)
        _resolve_join_columns(
            L_old.columns, dR.columns, join_cols,
            list(group_cols) + value_cols,
        )
        if how == "inner":
            # L_old ⋈ ΔR: the identity's second term — using L_new here
            # would double-count ΔL⋈ΔR
            frames.append(
                _side(L_old, L_old.columns).join(
                    _side(dR, dR.columns), on=join_cols, how="inner"
                )
            )
        else:
            # left-outer is NOT linear in R (a key's first match retracts
            # its null-extended row): recompute restricted to K = ΔR's
            # keys — new state +1, old state −1; keys outside K cancel
            K = broadcast(dR.select(*join_cols).distinct())
            L_k = _side(L_old, L_old.columns).join(
                K, on=join_cols, how="left_semi"
            )
            R_new = _pinned_source(spark, right_uri, right_format, posR)
            R_old = _pinned_source(spark, right_uri, right_format, curR)
            R_new_k = _side(R_new, R_new.columns).join(
                K, on=join_cols, how="left_semi"
            )
            R_old_k = _side(R_old, R_old.columns).join(
                K, on=join_cols, how="left_semi"
            )
            frames.append(
                L_k.join(R_new_k, on=join_cols, how="left").withColumn(
                    "__w", F.lit(1)
                )
            )
            frames.append(
                L_k.join(R_old_k, on=join_cols, how="left").withColumn(
                    "__w", F.lit(-1)
                )
            )
    from functools import reduce

    delta_rows = reduce(DataFrame.unionByName, frames)
    delta = _agg_delta(
        delta_rows, group_cols, sum_cols, min_cols, max_cols,
        weight_col="__w",
    ).persist()
    try:
        if delta.limit(1).count() == 0:
            set_iceberg_properties(
                target_uri,
                {CURSOR_PROP: cursor_val},
                expect_props={CURSOR_PROP: cursor},
            )
            return {"cursor": cursor_val, "groups_updated": 0}
        return _apply_delta(
            spark,
            target_uri,
            delta,
            group_cols,
            sum_cols,
            min_cols,
            max_cols,
            lambda: _pinned_join(posL, posR),
            cursor_expect=cursor,
            cursor_new=cursor_val,
        )
    finally:
        delta.unpersist()


def refresh_chain_materialization(
    spark: SparkSession,
    sources: list[dict],
    target_uri: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> dict | None:
    """Create or incrementally refresh a grouped COUNT/SUM/MIN/MAX
    materialization of an N-table INNER-join chain
    ``S0 ⋈ S1 ⋈ … ⋈ S(N−1)`` — the multi-table generalization of
    :func:`refresh_join_materialization` (star and snowflake layouts:
    fact ⋈ dim1 ⋈ dim2 …).

    ``sources`` is ordered: ``[{"uri": …, "format": "iceberg"|"delta",
    "join_cols": […], "how": "inner"|"left"}, …]`` where ``join_cols``
    of table i (i ≥ 1) are the equi-join keys linking it to the
    ACCUMULATED prefix ``S0 ⋈ … ⋈ S(i−1)`` (left-deep, Spark ``on=``
    semantics: key columns merge) and ``how`` (default inner) joins that
    table LEFT OUTER when requested — unmatched prefix rows contribute
    with NULL columns from that table, SQL's null-extension.  Table 0
    takes no join_cols/how.

    Maintenance applies the two-table signed-delta rule associatively —
    term i of the delta is

        ``S0_old ⋈ … ⋈ S(i−1)_old ⋈ ΔSi ⋈ S(i+1)_new ⋈ … ⋈ S(N−1)_new``

    (prefix states pinned at their OLD cursors, suffix states at their
    NEW positions, exactly one Δ per term), which telescopes to
    ``chain_new − chain_old`` for multisets — each pairwise step is the
    proven two-table identity.  A term whose slot sits on the RIGHT of a
    LEFT step is not linear (the first/last match flips null-extension):
    that bracket is computed explicitly as the ± pair of chains with the
    table pinned NEW vs OLD, key-restricted to ΔSi's join keys (outside
    them the pair cancels exactly).  Every prefix/suffix table that
    carries term i's join keys is SEMI-JOIN RESTRICTED to ΔSi's key set
    before joining (broadcast), so a term costs O(Δ's fan-in across the
    chain), never a full re-join; unchanged tables contribute no term at
    all.
    min/max reuse the hybrid: incremental under inserted extremes, a
    targeted rescan of the pinned FULL CHAIN restricted to only the
    flagged groups.  All N cursors commit atomically with the merge and
    are CAS-validated (concurrent refreshes cannot double-apply).
    Returns the summary + new cursors, or None when no source moved."""
    from functools import reduce

    from pyspark.sql import functions as F  # noqa: F401 (parity w/ siblings)
    from pyspark.sql.functions import broadcast

    from .iceberg_writer import (
        _load_meta,
        _local_table_dir,
        set_iceberg_properties,
        write_iceberg,
    )

    sum_cols = list(sum_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    value_cols = sum_cols + min_cols + max_cols
    if len(sources) < 2:
        raise BuzzBadRequestError(
            "refresh_chain_materialization: need at least 2 sources "
            "(use refresh_materialization for one table)"
        )
    if not group_cols:
        raise BuzzBadRequestError("refresh_chain_materialization: no group_cols")
    overlap = set(group_cols) & set(value_cols)
    if overlap:
        raise BuzzBadRequestError(
            f"columns {sorted(overlap)} appear in both group_cols and "
            "sum/min/max cols"
        )
    n = len(sources)
    uris, fmts, join_specs, hows = [], [], [], []
    for i, s in enumerate(sources):
        uri, fmt = s.get("uri"), s.get("format", "iceberg")
        jc = list(s.get("join_cols") or [])
        how = s.get("how", "inner")
        if not uri:
            raise BuzzBadRequestError(f"sources[{i}] has no uri")
        if fmt not in ("iceberg", "delta"):
            raise BuzzBadRequestError(
                f"sources[{i}] format must be iceberg|delta, got {fmt!r}"
            )
        if how not in ("inner", "left"):
            raise BuzzBadRequestError(
                f"sources[{i}] how must be inner|left, got {how!r}"
            )
        if i == 0 and jc:
            raise BuzzBadRequestError(
                "sources[0] takes no join_cols (it is the chain's head)"
            )
        if i > 0 and not jc:
            raise BuzzBadRequestError(
                f"sources[{i}] needs join_cols linking it to the prefix"
            )
        uris.append(uri)
        fmts.append(fmt)
        join_specs.append(jc)
        hows.append(how)

    positions = [
        _source_position(spark, uris[i], fmts[i]) for i in range(n)
    ]
    if any(p is None for p in positions):
        return None  # an empty table: the chain join is empty

    spec = {
        "kind": "chain",
        "tables": [
            {"format": fmts[i], "join_cols": join_specs[i]}
            if hows[i] == "inner"
            else {
                "format": fmts[i],
                "join_cols": join_specs[i],
                "how": hows[i],
            }
            for i in range(n)
        ],
        "group_cols": list(group_cols),
        "sum_cols": sum_cols,
    }
    if min_cols:
        spec["min_cols"] = min_cols
    if max_cols:
        spec["max_cols"] = max_cols
    cursor_val = json.dumps(
        {"chain": [str(p) for p in positions]}, sort_keys=True
    )

    all_join_cols = set().union(*[set(j) for j in join_specs[1:]])
    wanted = [
        c for c in dict.fromkeys(list(group_cols) + value_cols)
        if c not in all_join_cols
    ]

    def _kept(cols: list[str]) -> list[str]:
        return [c for c in cols if c in all_join_cols or c in wanted]

    def _validate(cols_per_table: list[list[str]]) -> list[list[str]]:
        """Typed validation of the left-deep chain; returns per-table kept
        column lists.  At each step the prefix∩table overlap must be
        EXACTLY the step's join keys (anything else would be an ambiguous
        duplicate after the join)."""
        for c in wanted:
            owners = [
                i for i, cols in enumerate(cols_per_table) if c in cols
            ]
            if len(owners) == 0:
                raise BuzzBadRequestError(
                    f"column {c!r} exists on no chain table"
                )
            if len(owners) > 1:
                raise BuzzBadRequestError(
                    f"column {c!r} exists on chain tables {owners} — "
                    "rename (the materialization cannot disambiguate)"
                )
        kept = [_kept(cols) for cols in cols_per_table]
        available = set(kept[0])
        for i in range(1, n):
            for k in join_specs[i]:
                if k not in cols_per_table[i]:
                    raise BuzzBadRequestError(
                        f"join column {k!r} of sources[{i}] not in that "
                        f"table (has {sorted(cols_per_table[i])})"
                    )
                if k not in available:
                    raise BuzzBadRequestError(
                        f"join column {k!r} of sources[{i}] not available "
                        "from the joined prefix — order the chain so each "
                        "table's keys are already present"
                    )
            dup = (set(kept[i]) & available) - set(join_specs[i])
            if dup:
                raise BuzzBadRequestError(
                    f"columns {sorted(dup)} exist on sources[{i}] AND the "
                    "joined prefix without being that step's join keys — "
                    "rename them"
                )
            available |= set(kept[i])
        return kept

    def _chain(frames: list[DataFrame]) -> DataFrame:
        acc = frames[0]
        for i in range(1, n):
            acc = acc.join(frames[i], on=join_specs[i], how=hows[i])
        return acc

    def _pinned_chain(pins: list) -> DataFrame:
        dfs = [
            _pinned_source(spark, uris[i], fmts[i], pins[i])
            for i in range(n)
        ]
        kept = _validate([d.columns for d in dfs])
        return _chain(
            [dfs[i].select(*kept[i]) for i in range(n)]
        )

    existing = _load_meta(_local_table_dir(target_uri))
    if existing is None:
        state = _bootstrap_state(
            _pinned_chain(positions), group_cols, sum_cols, min_cols,
            max_cols,
        )
        out = write_iceberg(
            state,
            target_uri,
            properties={
                CURSOR_PROP: cursor_val,
                SPEC_PROP: json.dumps(spec, sort_keys=True),
            },
        )
        return {**(out or {}), "cursor": cursor_val, "bootstrapped": True}

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
    cursors = json.loads(cursor)["chain"]
    if len(cursors) != n:
        raise BuzzExecutionError(
            f"recorded chain cursor has {len(cursors)} positions, spec has "
            f"{n} tables — corrupt target properties"
        )
    moved = [i for i in range(n) if str(positions[i]) != cursors[i]]
    if not moved:
        return None  # no source moved

    terms: list[DataFrame] = []
    for i in moved:
        d = _signed_changelog(
            _read_source_changelog(
                spark, uris[i], fmts[i], cursors[i], str(positions[i])
            )
        )
        if i > 0 and hows[i] == "left":
            # a LEFT-joined table is NOT a linear slot (its first/last
            # match flips the prefix rows' null-extension): the
            # telescoping bracket C(old_<i, new_i, new_>i) −
            # C(old_<i, old_i, new_>i) is computed EXPLICITLY, restricted
            # to K = ΔSi's join keys — outside K the two chains are
            # identical and cancel, so the cost is O(affected keys'
            # fan-in).  Restricting any table that CARRIES those key
            # columns is sound: validation forces shared columns to be
            # join keys, so matching rows agree on them, and dropped
            # rows cancel between the ± terms.
            K = broadcast(d.select(*join_specs[i]).distinct())
            for sign, pin_i in ((1, positions[i]), (-1, cursors[i])):
                frames = []
                cols_per_table = []
                for j in range(n):
                    pin = (
                        pin_i if j == i
                        else (cursors[j] if j < i else positions[j])
                    )
                    frames.append(
                        _pinned_source(spark, uris[j], fmts[j], pin)
                    )
                    cols_per_table.append(frames[j].columns)
                kept = _validate(cols_per_table)
                projected = [
                    frames[j].select(*kept[j]) for j in range(n)
                ]
                for j in range(n):
                    if set(join_specs[i]) <= set(kept[j]):
                        projected[j] = projected[j].join(
                            K, on=join_specs[i], how="left_semi"
                        )
                terms.append(
                    _chain(projected).withColumn("__w", F.lit(sign))
                )
            continue
        frames: list[DataFrame] = []
        cols_per_table: list[list[str]] = []
        for j in range(n):
            if j == i:
                frames.append(d)
                cols_per_table.append(
                    [c for c in d.columns if c != "__w"]
                )
            else:
                pin = cursors[j] if j < i else positions[j]
                frames.append(
                    _pinned_source(spark, uris[j], fmts[j], pin)
                )
                cols_per_table.append(frames[j].columns)
        kept = _validate(cols_per_table)
        projected = [
            frames[j].select(
                *kept[j], *(["__w"] if j == i else [])
            )
            for j in range(n)
        ]
        # semi-join restrict every OTHER table that carries Δi's join
        # keys to Δi's key set — the term then costs O(Δ's fan-in),
        # never a full chain re-join.  Table 0 has no own keys; when Δ
        # is table 0, the downstream tables restrict through their own
        # step keys if Δ carries them.  Restricting the right side of a
        # LEFT step is equally sound: every dropped row's step keys are
        # outside the term's rows (validation makes shared columns join
        # keys), so no match — and hence no null-extension flip — is
        # lost.
        if join_specs[i]:
            keys = broadcast(d.select(*join_specs[i]).distinct())
            for j in range(n):
                if j != i and set(join_specs[i]) <= set(kept[j]):
                    projected[j] = projected[j].join(
                        keys, on=join_specs[i], how="left_semi"
                    )
        else:
            d_cols = set(kept[i])
            # restricting the right side of a LEFT step by Δ0's keys is
            # sound here too: Δ0 IS the term's left spine, so every term
            # row's keys come from Δ0 and no null-extension flip is lost
            for j in range(1, n):
                if set(join_specs[j]) <= d_cols:
                    keys = broadcast(
                        d.select(*join_specs[j]).distinct()
                    )
                    projected[j] = projected[j].join(
                        keys, on=join_specs[j], how="left_semi"
                    )
        terms.append(_chain(projected))

    delta_rows = reduce(DataFrame.unionByName, terms)
    delta = _agg_delta(
        delta_rows, group_cols, sum_cols, min_cols, max_cols,
        weight_col="__w",
    ).persist()
    try:
        if delta.limit(1).count() == 0:
            set_iceberg_properties(
                target_uri,
                {CURSOR_PROP: cursor_val},
                expect_props={CURSOR_PROP: cursor},
            )
            return {"cursor": cursor_val, "groups_updated": 0}
        return _apply_delta(
            spark,
            target_uri,
            delta,
            group_cols,
            sum_cols,
            min_cols,
            max_cols,
            lambda: _pinned_chain(positions),
            cursor_expect=cursor,
            cursor_new=cursor_val,
        )
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
