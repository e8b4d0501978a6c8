"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference engine has no streaming state at all (SURVEY.md §1.1); these are
the rebuild's extension for incremental pipelines.  State is per-key and
store-backed (RocksDB/HDFS state store on a real cluster), so the pattern
scales with keys × state-size, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

RUNNING_COUNT_OUTPUT = StructType(
    [
        StructField("key", LongType(), False),
        StructField("total_events", LongType(), False),
        StructField("total_batches", LongType(), False),
    ]
)
RUNNING_COUNT_STATE = StructType(
    [
        StructField("total_events", LongType(), False),
        StructField("total_batches", LongType(), False),
    ]
)


def stateful_running_counts(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key cumulative event counts across micro-batches (update mode).

    Works on a streaming DataFrame grouped by ``key_col``; each trigger emits
    the updated running totals for keys present in the batch.  The same
    callable also runs on a batch DataFrame (state seen once), which the test
    uses as the degenerate-case check.

    The output ``key`` field takes ``key_col``'s actual type — a hard-coded
    long key would fail Arrow conversion for string (or any non-bigint)
    keys despite the generic signature."""
    key_type = df.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField("key", key_type, False),
            StructField("total_events", LongType(), False),
            StructField("total_batches", LongType(), False),
        ]
    )

    def update(key, pdfs, state: GroupState):
        count = 0
        for pdf in pdfs:
            count += len(pdf)
        if state.exists:
            (total, batches) = state.get
        else:
            total, batches = 0, 0
        total += count
        batches += 1
        state.update((total, batches))
        import pandas as pd

        yield pd.DataFrame(
            {"key": [key[0]], "total_events": [total], "total_batches": [batches]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
