"""Custom stateful streaming operator via applyInPandasWithState.

The reference's rotation logic (T3) is per-partition mutable state: a
writer counts rows and rotates its file when `threshold_lines` is hit
(s3logd-stream/src/output.rs:1031-1106). Spark's file sink owns actual
rotation here; this operator re-expresses the *stateful decision* as an
arbitrary-stateful-processing example the engine supports: per group
(e.g. bucket, or bucket+window) it maintains a running row count across
micro-batches and emits one record per batch with the cumulative count
and how many rotation boundaries have been crossed.

This is the template for any custom stateful op (sessionization,
running aggregates, CDC merge): groupBy → applyInPandasWithState with
an explicit state schema, GroupStateTimeout for eviction.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("n_rows", LongType(), False)])

OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType(), False),
        StructField("batch_rows", LongType(), False),
        StructField("total_rows", LongType(), False),
        StructField("rotations", IntegerType(), False),
    ]
)


def running_counts_with_rotation(
    grouped, threshold_lines: int = 10_000_000
) -> DataFrame:
    """Attach to a streaming groupBy:  df.groupBy(key).pipe(...) —

        running_counts_with_rotation(df.groupBy("Bucket"), threshold)

    Emits per (group, micro-batch): rows in this batch, cumulative
    rows, and cumulative rotation count = total // threshold.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
        (prev,) = state.get if state.exists else (0,)
        total = prev + batch_rows
        state.update((total,))
        yield pd.DataFrame(
            [
                {
                    "group_key": str(key[0]),
                    "batch_rows": batch_rows,
                    "total_rows": total,
                    "rotations": int(total // threshold_lines),
                }
            ]
        )

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
