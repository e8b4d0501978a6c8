"""Property test: the generalized MERGE (matched clauses + WHEN NOT
MATCHED BY SOURCE + conditional/expression INSERT) must equal a pure
Python reference model of Delta SQL MERGE semantics on BOTH formats, for
hypothesis-generated random tables and clause lists — the strongest pin
on the clause algebra: first-match-wins ordering, SET subsets keeping
unlisted columns, target-only by-source evaluation, and NULL-filled
insert expressions all have to agree however the draw interleaves.

Each example drives real Delta + Iceberg commits (~seconds), so the
budget is small; the deterministic matrices in test_merge_clauses.py pin
the known edges."""

from __future__ import annotations

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# conditions are (side, col, op, literal) over small integer domains so
# every generated expression is valid SQL on both engines
_COND_COLS = ["v", "w"]


@st.composite
def merge_case(draw):
    base = draw(
        st.lists(
            st.tuples(
                st.integers(0, 7),          # key (dups allowed: appends)
                st.integers(-3, 9),         # v
                st.integers(-3, 9),         # w
            ),
            min_size=0, max_size=8,
        )
    )
    src_keys = draw(st.lists(st.integers(0, 9), min_size=0, max_size=5,
                             unique=True))
    src = [
        (k, draw(st.integers(-3, 9)), draw(st.integers(-3, 9)))
        for k in src_keys
    ]

    def cond(side):
        col = draw(st.sampled_from(_COND_COLS))
        op = draw(st.sampled_from(["<", ">", "<=", ">=", "="]))
        lit = draw(st.integers(-2, 8))
        return f"{side}.{col} {op} {lit}", (col, op, lit)

    def clauses(side, require_set):
        out = []
        for i in range(draw(st.integers(0, 2))):
            action = draw(st.sampled_from(["update", "delete"]))
            c_sql, c_model = cond(side)
            cset = None
            if action == "update" and (require_set or draw(st.booleans())):
                tgt = draw(st.sampled_from(_COND_COLS))
                cset = {tgt: f"{side}.{tgt} + 1"}
            out.append(
                {"action": action, "condition": c_sql, "set": cset,
                 "_model": (c_model, cset)}
            )
        return out

    matched = clauses("s", require_set=False)
    by_source = clauses("t", require_set=True)
    insert_on = draw(st.booleans())
    ins_cond = None
    ins_vals = None
    if insert_on and draw(st.booleans()):
        ins_cond = cond("s")
    if insert_on and draw(st.booleans()):
        ins_vals = {"k": "s.k", "v": "s.v + 10"}  # w unlisted → NULL
    return base, src, matched, by_source, insert_on, ins_cond, ins_vals


def _holds(row: dict, model) -> bool:
    (col, op, lit), _ = model
    x = row[col]
    if x is None:
        return False
    return {
        "<": x < lit, ">": x > lit, "<=": x <= lit, ">=": x >= lit,
        "=": x == lit,
    }[op]


def _reference(base, src, matched, by_source, insert_on, ins_cond,
               ins_vals):
    """Pure-Python Delta MERGE semantics: per target row, first matching
    clause of the applicable family fires; inserts per source row."""
    src_by_key = {r[0]: {"k": r[0], "v": r[1], "w": r[2]} for r in src}
    out = []
    for k, v, w in base:
        t = {"k": k, "v": v, "w": w}
        s = src_by_key.get(k)
        fams = matched if s is not None else by_source
        fired = None
        for c in fams:
            row = s if s is not None else t
            # matched conditions are over s.<col>; by-source over t.<col>
            if _holds(row, c["_model"]):
                fired = c
                break
        if fired is None:
            out.append(t)
        elif fired["action"] == "delete":
            pass
        else:
            cset = fired["set"]
            new = dict(t)
            if cset is None:
                new = dict(s)  # whole-row update
            else:
                for col in cset:
                    # expr is "<side>.<col> + 1"
                    basis = s if s is not None else t
                    new[col] = basis[col] + 1
            out.append(new)
    if insert_on:
        base_keys = {r[0] for r in base}
        for k in sorted(src_by_key):
            if k in base_keys:
                continue
            s = src_by_key[k]
            if ins_cond is not None and not _holds(s, (ins_cond[1], None)):
                continue
            if ins_vals is not None:
                out.append({"k": s["k"], "v": s["v"] + 10, "w": None})
            else:
                out.append(dict(s))
    return sorted((r["k"], r["v"], r["w"]) for r in out)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(case=merge_case())
def test_generalized_merge_matches_reference_model(spark, tmp_path_factory,
                                                   case):
    base, src, matched, by_source, insert_on, ins_cond, ins_vals = case
    from buzz_rust_spark.sources.delta_catalog import DeltaCatalog
    from buzz_rust_spark.sources.delta_writer import merge_delta, write_delta
    from buzz_rust_spark.sources.iceberg import IcebergCatalog
    from buzz_rust_spark.sources.iceberg_writer import (
        merge_iceberg,
        write_iceberg,
    )

    if not matched and not by_source and not insert_on:
        return  # no-op merge is a typed error by construction
    expect = _reference(
        base, src, matched, by_source, insert_on, ins_cond, ins_vals
    )
    schema = "k long, v long, w long"
    tmp = tmp_path_factory.mktemp("mergeprop")
    base_df = (
        spark.createDataFrame(base, schema)
        if base
        else spark.createDataFrame([], schema)
    )
    src_df = (
        spark.createDataFrame(src, schema)
        if src
        else spark.createDataFrame([], schema)
    )
    kw = dict(
        matched_clauses=[
            {k: v for k, v in c.items() if k != "_model"} for c in matched
        ],
        by_source_clauses=[
            {k: v for k, v in c.items() if k != "_model"} for c in by_source
        ] or None,
        not_matched_condition=ins_cond[0] if ins_cond else None,
        insert_values=ins_vals,
    )

    d = str(tmp / "d")
    write_delta(base_df, d)
    merge_delta(
        spark, d, src_df, ["k"],
        when_not_matched="insert" if insert_on else None, **kw,
    )
    got_d = sorted(
        (r.k, r.v, r.w)
        for r in DeltaCatalog("d", d).to_dataframe(spark).collect()
    )
    assert got_d == expect, ("delta", matched, by_source, ins_cond, ins_vals)

    i = str(tmp / "i")
    write_iceberg(base_df, i)
    merge_iceberg(
        spark, i, src_df, ["k"],
        not_matched_condition=(
            ins_cond[0] if ins_cond
            else ("true" if insert_on else "false")
        ),
        **{k: v for k, v in kw.items() if k != "not_matched_condition"},
    )
    got_i = sorted(
        (r.k, r.v, r.w)
        for r in IcebergCatalog("i", i).to_dataframe(spark).collect()
    )
    assert got_i == expect, ("iceberg", matched, by_source, ins_cond,
                             ins_vals)
