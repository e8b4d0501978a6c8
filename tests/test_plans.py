"""Physical-plan regression gate: the headline queries must keep their
scale-critical plan shapes (no cartesian products, no accidental nested-loop
joins, no Python eval nodes outside the documented pandas-UDF operators)."""

from __future__ import annotations

import os
import sys

import pytest

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
