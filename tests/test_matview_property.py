"""Property test: the incremental materialization must equal a full
relational recompute after EVERY refresh, for hypothesis-generated random
op sequences (append / CDC merge / predicate delete / compaction) with a
randomized refresh cadence — the single strongest pin on the IVM engine:
count, sum, AND the hybrid min/max (incremental + targeted rescan) all
have to agree with SQL semantics no matter how the history interleaves.

Each example drives real Iceberg commits, so the budget is small
(hypothesis finds interleaving bugs with few, structurally varied
sequences; the deterministic lifecycle tests pin the known edges)."""

from __future__ import annotations

import pytest
# Long-running integration suite: deselected by default (see pyproject
# [tool.pytest.ini_options]); run with `pytest -m ""` to include it.
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GROUPS = ["a", "b"]


@st.composite
def op_sequence(draw):
    """(ops, refresh_points): 4-6 table mutations; refresh after the ops
    whose index is in refresh_points (always after the last)."""
    n = draw(st.integers(4, 6))
    ops = []
    for _ in range(n):
        kind = draw(st.sampled_from(["append", "merge", "delete", "rewrite"]))
        if kind == "append":
            rows = draw(
                st.lists(
                    st.tuples(
                        st.sampled_from(GROUPS),
                        st.integers(-5, 15),
                    ),
                    min_size=1,
                    max_size=3,
                )
            )
            ops.append(("append", rows))
        elif kind == "merge":
            # upsert existing-or-new ids with fresh values
            ops.append(
                (
                    "merge",
                    draw(st.integers(0, 6)),  # target id slot
                    draw(st.sampled_from(GROUPS)),
                    draw(st.integers(-5, 15)),
                )
            )
        elif kind == "delete":
            ops.append(("delete", draw(st.integers(-5, 15))))
        else:
            ops.append(("rewrite",))
    refreshes = sorted(
        set(draw(st.lists(st.integers(0, n - 1), max_size=2))) | {n - 1}
    )
    return ops, refreshes


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(op_sequence())
def test_matview_always_equals_recompute(spark, tmp_path_factory, seq):
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

    ops, refreshes = seq
    d = tmp_path_factory.mktemp("mvprop")
    src, tgt = str(d / "src"), str(d / "mv")
    next_id = [100]

    def rows_df(rows):
        out = []
        for g, v in rows:
            out.append((next_id[0], g, float(v)))
            next_id[0] += 1
        return spark.createDataFrame(out, "id long, g string, v double")

    write_iceberg(
        spark.createDataFrame(
            [(0, "a", 3.0), (1, "b", 8.0)], "id long, g string, v double"
        ),
        src,
    )
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    refresh_materialization(spark, src, tgt, ["g"], **kw)

    def check():
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
        assert got == want, f"ops={ops} refreshes={refreshes}"

    check()
    for i, op in enumerate(ops):
        if op[0] == "append":
            write_iceberg(rows_df(op[1]), src, mode="append")
        elif op[0] == "merge":
            _, slot, g, v = op
            merge_iceberg(
                spark,
                src,
                spark.createDataFrame(
                    [(slot, g, float(v))], "id long, g string, v double"
                ).coalesce(1),
                ["id"],
            )
        elif op[0] == "delete":
            delete_iceberg(spark, src, f"v = {float(op[1])}")
        else:
            rewrite_iceberg(spark, src)
        if i in refreshes:
            refresh_materialization(spark, src, tgt, ["g"], **kw)
            check()
