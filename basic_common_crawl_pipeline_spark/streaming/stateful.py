"""Custom stateful streaming operator via ``applyInPandasWithState``
(G1 north-rule addition; the reference's only state is queue redelivery).

``stateful_user_totals`` keeps running per-user (event count, value sum)
across micro-batches — the streaming analog of a crawl's per-host fetch
accounting. State is a per-key (count, sum) pair; every micro-batch emits
the updated totals for the keys it touched (output mode ``update``), so
the final row per key (highest count) is the complete aggregate —
order-insensitive, hence comparable to a plain GROUP BY oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def stateful_user_totals(events_stream: DataFrame) -> DataFrame:
    """streaming events → running (count, sum(value)) per user_id."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
