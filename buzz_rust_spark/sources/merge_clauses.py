"""Conditional / partial-column MERGE clause algebra, shared by the Delta
and Iceberg writers.

The reference has no write path at all (fuse_service.rs:130-135 only streams
results back), so MERGE is rebuild-extension surface; the semantics followed
here are Delta Lake's SQL MERGE (first-match-wins over ordered WHEN MATCHED
clauses, ``UPDATE SET`` subsets leaving unlisted columns at their TARGET
values) because both lakehouse formats' reference engines implement that
contract.

A *matched clause* is ``{"action": "update"|"delete", "condition":
str | None, "set": {column: sql_expr} | None}``:

- Clauses are evaluated PER MATCHED (target, source) ROW PAIR, in list
  order; the FIRST clause whose condition holds fires, later clauses are
  not consulted (Delta MERGE precedence).  A pair matching no clause leaves
  the target row unchanged.
- ``condition`` (and every ``set`` expression) is a Spark SQL expression
  over two struct columns: ``t`` (the target row) and ``s`` (the source
  row) — ``"s.len > t.len"``.  Bare column names do not resolve, which
  makes every reference explicit instead of silently ambiguous.
- ``action='update'`` with ``set=None`` replaces the target row with the
  source row wholesale (the legacy whole-row upsert).  With ``set``, only
  the listed columns take their expressions; every other column keeps the
  TARGET value.  ``action='delete'`` drops the pair's target row; a
  ``set`` alongside it is a typed error.

Everything here is pure column algebra — one chained ``CASE`` per output —
so the whole clause evaluation stays inside whole-stage codegen; no Python
runs per row, and the plan shape (one equi-join on the merge keys) is
identical to the unconditional merge's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError

_ACTIONS = ("update", "delete")


def validate_matched_clauses(
    clauses: list[dict], table_cols: list[str], key_cols: list[str]
) -> list[dict]:
    """Typed validation of a matched-clause list; returns a normalized copy.

    Refused: unknown actions, ``set`` on a delete clause, ``set`` keys that
    are not table columns, and ``set`` on a MERGE KEY column (the key is the
    match identity — rewriting it mid-merge would make the operation's own
    matched/not-matched partition self-inconsistent; stage a key change as
    a delete + insert instead).  An unconditional clause anywhere but last
    is also refused: every later clause would be dead, which is always a
    caller bug, never intent."""
    out: list[dict] = []
    for i, c in enumerate(clauses):
        if not isinstance(c, dict):
            raise BuzzBadRequestError(
                f"matched clause #{i} must be a dict, got {type(c).__name__}"
            )
        action = c.get("action")
        if action not in _ACTIONS:
            raise BuzzBadRequestError(
                f"matched clause #{i} action must be update|delete, "
                f"got {action!r}"
            )
        cond = c.get("condition")
        if cond is not None and not isinstance(cond, str):
            raise BuzzBadRequestError(
                f"matched clause #{i} condition must be a SQL string or None"
            )
        cset = c.get("set")
        if cset is not None:
            if action != "update":
                raise BuzzBadRequestError(
                    f"matched clause #{i}: 'set' is only valid with "
                    "action='update'"
                )
            bad = sorted(set(cset) - set(table_cols))
            if bad:
                raise BuzzBadRequestError(
                    f"matched clause #{i} sets unknown columns {bad}"
                )
            keyed = sorted(set(cset) & set(key_cols))
            if keyed:
                raise BuzzBadRequestError(
                    f"matched clause #{i} sets merge key columns {keyed} — "
                    "the key is the match identity; delete + insert instead"
                )
            cset = {str(k): str(v) for k, v in cset.items()}
        if cond is None and i < len(clauses) - 1:
            raise BuzzBadRequestError(
                f"matched clause #{i} has no condition but is not last — "
                "every later clause is unreachable (first-match-wins)"
            )
        out.append({"action": action, "condition": cond, "set": cset})
    return out


def _cond(clause: dict) -> Column:
    return (
        F.expr(clause["condition"])
        if clause["condition"] is not None
        else F.lit(True)
    )


def clause_action_column(clauses: list[dict]) -> Column:
    """First-match-wins action per (t, s) pair: a chained CASE yielding
    'update' / 'delete' / NULL (no clause fired)."""
    col = None
    for c in clauses:
        branch = (_cond(c), F.lit(c["action"]))
        col = F.when(*branch) if col is None else col.when(*branch)
    if col is None:
        return F.lit(None).cast("string")
    return col


def clause_row_column(clauses: list[dict], fields) -> Column:
    """The pair's OUTPUT row (a struct over the table columns) under the
    first firing clause: update/set → listed columns take their expressions
    (cast to the declared types), unlisted keep the TARGET value; update
    without set → the source row wholesale; no clause fired (and delete,
    whose rows the caller filters out) → the target row unchanged."""
    t_row = F.struct(
        *[F.col("t").getField(f.name).alias(f.name) for f in fields]
    )
    col = None
    for c in clauses:
        if c["action"] == "update":
            cset = c["set"]
            members = []
            for f in fields:
                if cset is None:
                    e = F.col("s").getField(f.name)
                elif f.name in cset:
                    e = F.expr(cset[f.name])
                else:
                    e = F.col("t").getField(f.name)
                members.append(e.cast(f.dataType).alias(f.name))
            out = F.struct(*members)
        else:
            out = t_row
        col = (
            F.when(_cond(c), out) if col is None else col.when(_cond(c), out)
        )
    return t_row if col is None else col.otherwise(t_row)


def legacy_clauses(when_matched: str | None) -> list[dict]:
    """The clause list equivalent of the legacy ``when_matched`` scalar."""
    if when_matched is None:
        return []
    return [{"action": when_matched, "condition": None, "set": None}]


def validate_by_source_clauses(
    clauses: list[dict], table_cols: list[str], key_cols: list[str]
) -> list[dict]:
    """Typed validation of a ``WHEN NOT MATCHED BY SOURCE`` clause list —
    ordered update/delete clauses over TARGET rows with no source key
    match (Delta SQL's third MERGE clause family, the full-sync CDC
    idiom: "delete everything the snapshot no longer contains").

    Same first-match-wins shape and refusals as
    :func:`validate_matched_clauses`, with two differences forced by the
    missing source row: conditions and ``set`` expressions may reference
    ``t.<col>`` ONLY (there is no ``s`` in scope — a reference to it is
    refused at plan time with a typed error by the writers), and an
    ``update`` clause REQUIRES ``set`` (there is no source row to take
    wholesale)."""
    out = validate_matched_clauses(clauses, table_cols, key_cols)
    for i, c in enumerate(out):
        if c["action"] == "update" and c["set"] is None:
            raise BuzzBadRequestError(
                f"by-source clause #{i}: update requires 'set' — there "
                "is no source row to take wholesale"
            )
    return out


def check_target_only(df_t, clauses: list[dict], what: str) -> None:
    """Refuse (typed, at plan time, no job) a by-source clause whose
    condition or ``set`` expression references anything but the target
    row — ``df_t`` carries only the ``t`` struct, so any ``s.<col>`` (or
    stray bare name) fails Spark analysis."""
    from pyspark.errors import AnalysisException

    for i, c in enumerate(clauses):
        exprs = ([c["condition"]] if c["condition"] else []) + list(
            (c["set"] or {}).values()
        )
        for e in exprs:
            try:
                df_t.select(F.expr(e))  # analysis only — no job runs
            except AnalysisException:
                raise BuzzBadRequestError(
                    f"{what} clause #{i} expression {e!r} does not "
                    "resolve against the target row alone — by-source "
                    "clauses may reference t.<col> only (no source row "
                    "is in scope for unmatched target rows)"
                )


def validate_insert_values(
    insert_values: dict, table_cols: list[str]
) -> dict[str, str]:
    """Typed validation of a ``WHEN NOT MATCHED THEN INSERT (cols) VALUES
    (exprs)`` map — column → SQL expression over ``s.<col>`` / bare
    source names.  Unknown columns are refused; unlisted columns insert
    NULL (or their generation expression on Delta generated-column
    tables)."""
    if not isinstance(insert_values, dict) or not insert_values:
        raise BuzzBadRequestError(
            "insert_values must be a non-empty {column: sql_expr} dict"
        )
    bad = sorted(set(insert_values) - set(table_cols))
    if bad:
        raise BuzzBadRequestError(
            f"insert_values lists unknown columns {bad}"
        )
    return {str(k): str(v) for k, v in insert_values.items()}


def build_insert_rows(
    df, names: list[str], insert_values: dict[str, str], fields,
    generated: dict[str, str] | None = None,
):
    """The INSERT rows of a column-expression insert clause: listed
    columns take their expressions (over ``s.<col>`` or bare source
    names, cast to the declared types), unlisted columns are NULL —
    except columns in ``generated`` (Delta generated columns), which are
    COMPUTED from their generation expression over the BUILT row (the
    spec's write rule applied to the post-insert values, not the source
    row).  Pure column algebra, codegen end to end."""
    with_s = df.select(
        "*", F.struct(*[F.col(c) for c in names]).alias("s")
    )
    types = {f.name: f.dataType for f in fields}
    built = with_s.select(
        *[
            (
                F.expr(insert_values[c])
                if c in insert_values
                else F.lit(None)
            )
            .cast(types[c])
            .alias(c)
            for c in names
        ]
    )
    for c, expr in (generated or {}).items():
        if c not in insert_values:
            built = built.withColumn(c, F.expr(expr).cast(types[c]))
    return built.select(*names)


def insert_filter(df, names: list[str], not_matched_condition: str):
    """Filter not-matched SOURCE rows by a condition over ``s.<col>``
    (bare source column names resolve too — the insert side has only one
    row in scope)."""
    return (
        df.select("*", F.struct(*[F.col(c) for c in names]).alias("s"))
        .where(F.expr(not_matched_condition))
        .drop("s")
    )
