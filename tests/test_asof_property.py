"""Property test: asof_join must agree with pandas.merge_asof on random
inputs (hypothesis generates the cases; pandas is the independent oracle)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from buzz_rust_spark.operators.asof import asof_join

ts_strategy = st.integers(min_value=0, max_value=10_000)
BASE = datetime(2024, 1, 1)
LEFT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("key", StringType()),
        StructField("t", TimestampType()),
    ]
)
RIGHT_SCHEMA = StructType(
    [
        StructField("rid", LongType()),
        StructField("key", StringType()),
        StructField("t", TimestampType()),
    ]
)


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 15))
    n_right = draw(st.integers(0, 15))
    keys = ["a", "b"]
    left = [
        (
            i,
            draw(st.sampled_from(keys)),
            BASE + timedelta(seconds=draw(ts_strategy)),
        )
        for i in range(n_left)
    ]
    right = [
        (
            100 + i,
            draw(st.sampled_from(keys)),
            BASE + timedelta(seconds=draw(ts_strategy)),
        )
        for i in range(n_right)
    ]
    # merge_asof is undefined on duplicate (key, ts) on the right — dedup
    seen = set()
    right = [
        r for r in right if (r[1], r[2]) not in seen and not seen.add((r[1], r[2]))
    ]
    return left, right


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(asof_case())
def test_asof_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, schema=LEFT_SCHEMA)
    right = spark.createDataFrame(right_rows, schema=RIGHT_SCHEMA)
    got = {
        r["id"]: r["r_rid"]
        for r in asof_join(
            left, right, left_ts="t", right_ts="t", by=["key"], right_prefix="r_"
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["id", "key", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["rid", "key", "t"]).sort_values("t")
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, on="t", by="key", direction="backward", allow_exact_matches=True
        )
        expect = {
            int(row.id): (None if pd.isna(row.rid) else int(row.rid))
            for row in merged.itertuples()
        }
    else:
        expect = {int(i): None for i in lp["id"]}
    assert got == expect


@st.composite
def range_case(draw):
    n_points = draw(st.integers(1, 20))
    n_intervals = draw(st.integers(0, 10))
    points = [(i, float(draw(st.integers(0, 500)))) for i in range(n_points)]
    intervals = []
    for i in range(n_intervals):
        s = draw(st.integers(0, 500))
        length = draw(st.integers(0, 120))
        intervals.append((100 + i, float(s), float(s + length)))
    width = float(draw(st.sampled_from([7, 50, 130])))
    return points, intervals, width


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(range_case())
def test_range_join_property(spark, case):
    """Bucketed range join ≡ brute-force python filter on random inputs,
    independent of bucket width."""
    points, intervals, width = case
    p = spark.createDataFrame(points, ["pid", "x"])
    iv = spark.createDataFrame(
        intervals, ["iid", "s", "e"]
    ) if intervals else spark.createDataFrame([], "iid long, s double, e double")

    from buzz_rust_spark.operators.range_join import range_join

    got = {
        (r["pid"], r["iid"])
        for r in range_join(p, iv, "x", "s", "e", bucket_width=width).collect()
    }
    want = {
        (pid, iid)
        for pid, x in points
        for iid, s, e in intervals
        if s <= x < e
    }
    assert got == want


def test_asof_ignores_null_timestamps(spark):
    """Review fix: a null-ts right row must not act as a universal match
    (NULLS FIRST under the backward ordering), and a null-ts left row gets a
    null match by definition."""
    from buzz_rust_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5.0), (2, None)], ["lid", "lts"])
    right = spark.createDataFrame([(None, 42), (4.0, 7)], ["rts", "val"])
    out = {r["lid"]: r for r in asof_join(
        left, right, left_ts="lts", right_ts="rts"
    ).collect()}
    assert out[1]["right_val"] == 7  # matches the real row, not the null-ts one
    assert out[2]["right_val"] is None  # null left ts -> no match


def test_asof_equal_ts_tiebreak_deterministic(spark):
    """Review fix: among equal right timestamps the largest payload struct
    wins, independent of partitioning."""
    from buzz_rust_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10.0)], ["lid", "lts"])
    right = spark.createDataFrame(
        [(5.0, "a"), (5.0, "z"), (5.0, "m")], ["rts", "val"]
    )
    for parts in (1, 7):
        out = asof_join(
            left, right.repartition(parts), left_ts="lts", right_ts="rts"
        ).collect()
        assert out[0]["right_val"] == "z"
