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


# ---------------------------------------------------------------------------
# streaming URL-seen dedup: the crawl's J2 seen-set as a streaming operator
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import ArrayType, IntegerType, StringType  # noqa: E402

DEDUP_OUTPUT_SCHEMA = StructType([StructField("url", StringType())])
DEDUP_STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(StringType()))]
)


def _dedup_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdfs:
        for u in pdf["url"]:
            if u not in seen:
                seen.add(u)
                fresh.append(u)
    state.update((sorted(seen),))
    yield pd.DataFrame({"url": fresh})


def stateful_seen_dedup(
    urls_stream: DataFrame, url_col: str = "url", partitions: int = 16
) -> DataFrame:
    """Streaming first-occurrence URL dedup: state is a per-partition
    seen set, hash-partitioned by ``pmod(xxhash64(url), partitions)`` —
    the same layout as the crawl's partitioned Bloom seen-set
    (operators/seen.py), but incremental across micro-batches. Each URL
    is emitted exactly once (append mode), whichever batch it first
    arrives in; the emitted SET is order-independent, hence comparable
    to a ``SELECT DISTINCT`` oracle. At 10^10 URLs the in-state set
    swaps for the bloom blob under the identical keying."""
    keyed = urls_stream.select(F.col(url_col).alias("url")).withColumn(
        "__part",
        F.pmod(F.xxhash64("url"), F.lit(partitions)).cast(IntegerType()),
    )
    return keyed.groupBy("__part").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
