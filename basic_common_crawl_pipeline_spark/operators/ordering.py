"""Deterministic global sequence assignment (SURVEY.md §2.5 B3).

Spark makes no cross-partition ordering promises, so crawl-order sequence
numbers are assigned with a two-phase scheme that is exact under any
parallelism and any partition-boundary placement:

1. range-repartition + sort on the total ORDER_KEY (global sort);
2. count rows per sorted partition, prefix-sum the counts on the driver
   (one tiny collect of ≤ #partitions longs — NOT the data);
3. second pass adds ``offset[partition] + local_rank``.

Because the key is total, the resulting ``seq`` is independent of where
range boundaries fall — ``local[8]`` and ``local[32]`` produce identical
sequences (tested in test_determinism.py). This replaces the
single-partition ``Window.orderBy()`` anti-pattern, which serializes the
whole dataset through one task at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    start: int = 1,
    return_total: bool = False,
    cache_sorted: list | None = None,
):
    """Add ``seq_col`` = global rank (start, start+1, …) in the total order
    of ``order_cols``. The key must be total (no ties) for determinism.
    ``return_total=True`` → (df, row_count): the count is a free byproduct
    of the offsets pass, saving callers a separate count() job.
    ``cache_sorted``: pass a list to persist the sorted intermediate (the
    offsets pass then materializes it, so consuming the output does NOT
    re-run the global sort); the persisted handle is appended to the list
    and the caller owns unpersisting it."""
    names = [f.name for f in df.schema.fields]
    # StructType.add mutates in place — build a fresh copy for the output.
    schema = StructType(list(df.schema.fields) + [StructField(seq_col, LongType())])
    sorted_df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    sorted_df = sorted_df.withColumn("__pid", F.spark_partition_id())
    if cache_sorted is not None:
        sorted_df = sorted_df.persist()
        cache_sorted.append(sorted_df)
    counts = (
        sorted_df.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets = {}
    acc = start
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Rows of one physical partition arrive across possibly several
        # batches, in sorted order; number them consecutively.
        local = 0
        for batch in batches:
            if len(batch) == 0:
                continue
            pid = int(batch["__pid"].iloc[0])
            base = offsets[pid] + local
            out = batch[names].copy()
            out[seq_col] = range(base, base + len(batch))
            local += len(batch)
            yield out

    # NB: mapInPandas preserves the per-partition sort because it is a
    # narrow (partition-local) transformation.
    out = sorted_df.mapInPandas(assign, schema=schema)
    if return_total:
        return out, acc - start
    return out
