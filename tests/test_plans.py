"""Physical-plan regression gate: the headline queries must keep their
scale-critical plan shapes (no cartesian products, no accidental nested-loop
joins, no Python eval nodes outside the documented pandas-UDF operators)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from explain_audit import BNLJ_OK, PANDAS_UDF_OK, audit, formatted_plan  # noqa: E402

from buzz_rust_spark.queries import all_queries  # noqa: E402


def headline_names():
    return [n for n, q in sorted(all_queries().items()) if q.headline]


@pytest.mark.parametrize("name", headline_names())
def test_headline_plan_shape(spark, sf_dir, name):
    q = all_queries()[name]
    plan = formatted_plan(q.fn(spark, sf_dir))
    warnings = audit(name, plan)
    assert not warnings, f"{name}: {warnings}\n{plan[:2000]}"
    # pushdown sanity: parquet scans must not read every column unless the
    # query genuinely needs them (ReadSchema appears for every scan)
    assert "Scan parquet" in plan or name.startswith("m0")


def cheap_nonheadline_names():
    """The SQL-surface and text/event queries whose plan builds are pure
    (no sampling/fitting/checkpointing during construction) — the dedup/ANN
    operators that execute work while building are covered by the headline
    gate and tools/explain_audit.py."""
    heavy_prefixes = ("d0", "s0", "m0", "p0")
    return [
        n
        for n, q in sorted(all_queries().items())
        if not q.headline and not n.startswith(heavy_prefixes)
    ]


@pytest.mark.parametrize("name", cheap_nonheadline_names())
def test_sql_surface_plan_shape(spark, sf_dir, name):
    """Every oracle'd SQL-surface query keeps a scale-safe plan: no cartesian
    products, no unintended nested-loop joins, no Python nodes outside the
    documented pandas-UDF entries, and a SortMergeJoin-free shape (all dims
    broadcast at these sizes)."""
    q = all_queries()[name]
    plan = formatted_plan(q.fn(spark, sf_dir))
    warnings = audit(name, plan)
    assert not warnings, f"{name}: {warnings}\n{plan[:2000]}"
    if name.startswith("q"):
        assert "SortMergeJoin" not in plan, f"{name}: missed broadcast\n{plan[:2000]}"


def test_corpus_prep_plan_shapes(spark, sf_dir):
    """New corpus-prep operators keep scale-safe shapes: the PII scrub and
    hash sampling are pure narrow plans (no Exchange at all), and the
    contamination join broadcasts the benchmark side (never shuffles the
    corpus by n-gram)."""
    from buzz_rust_spark.operators.sampling import hash_split, stratified_sample
    from buzz_rust_spark.operators.text import contamination_flags, redact_pii
    from buzz_rust_spark.queries.registry import load

    docs = load(spark, sf_dir, "documents")

    for name, df in [
        ("redact_pii", redact_pii(docs)),
        ("hash_split", hash_split(docs, {"train": 9, "val": 1}, key_cols=["doc_id"])),
        (
            "stratified_sample",
            stratified_sample(
                docs.withColumn("lang", F.lit("en")), "lang", {"en": 0.5}
            ),
        ),
    ]:
        plan = formatted_plan(df)
        assert "Exchange" not in plan, f"{name} must stay narrow:\n{plan[:1500]}"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    plan = formatted_plan(
        contamination_flags(docs, docs.limit(5).select("doc_id", "text"), n=5)
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
