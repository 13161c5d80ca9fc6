"""Temporal joins (north-rule additions; no reference analog — the
reference processes a static index snapshot). The crawl-shaped use is
"policy in effect at fetch time": join each capture to the latest
robots/config snapshot with ``snapshot_ts <= capture_ts``.

``asof_join`` is the canonical distributed AS-OF shape: union both
sides with a side tag, ONE range shuffle on (key, ts), sort within
partitions, and carry the last-observed right row forward
(last-observation-carried-forward). The naive alternative — theta-join
on ``r.ts <= l.ts`` then rank — materializes O(|L|·|R|) pairs per key
before pruning; the union form moves each row exactly once. Right rows
sort BEFORE left rows at equal timestamps, so a snapshot taken at T
applies to a probe at T (inclusive semantics).

Skew (10^10 rows): a per-key window (``Window.partitionBy(key)``) would
serialize a pathologically hot key through ONE task, and LOCF cannot be
salted the way top-k can (state crosses salt boundaries). The
implementation instead RANGE-partitions the union on (key, ts, …) — a
hot key spreads over many contiguous partitions — and repairs the
partition boundaries with per-boundary carry state, the same two-phase
shape as operators/ordering.py: a first partition-local pass collects
one tiny summary row per partition (first/last key + last right row),
the driver prefix-scans those into per-partition carry-in packs (≤
#partitions rows collected, never data), and a second partition-local
Arrow pass fills left rows. Both passes are narrow; the only wide op is
the single range shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_ROLLUP_LEVELS = ("minute", "hour", "day")


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value_units",
    levels: tuple[str, ...] = _ROLLUP_LEVELS,
) -> DataFrame:
    """Hierarchical time-bucket rollup (the hypertable continuous-
    aggregate shape, the third brief-named operator class): one frame
    holding (level, bucket, key, n, sum_units, min_units, max_units)
    for every level, where each COARSER level re-aggregates the next
    finer one — the raw table is scanned exactly once and the minute
    level's output (tiny relative to raw) feeds hour, hour feeds day.
    At 100 TB that is the difference between one full scan and one per
    level. Requires mergeable aggregates and an EXACT value domain:
    ``value_col`` must be integral (count/sum/min/max of BIGINTs are
    associative, so sum-of-sums equals the direct sum bit-for-bit —
    double sums would differ between the re-aggregated and direct
    forms). ``levels`` must go finest → coarsest.

    The finest level is eagerly materialized (localCheckpoint — it runs
    a job at call time): the union references it once per level, and
    without a leaf the physical plan scans RAW once per level (verified:
    3 parquet scans, no exchange reuse across AQE union branches) —
    exactly the cost this operator exists to avoid."""
    finest = (
        events.groupBy(
            F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_units"),
            F.min(value_col).alias("min_units"),
            F.max(value_col).alias("max_units"),
        )
        .localCheckpoint(eager=True)
    )
    out = finest.withColumn("level", F.lit(levels[0]))
    prev = finest
    for lvl in levels[1:]:
        prev = (
            prev.groupBy(
                F.date_trunc(lvl, F.col("bucket")).alias("bucket"), "key"
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_units").alias("sum_units"),
                F.min("min_units").alias("min_units"),
                F.max("max_units").alias("max_units"),
            )
        )
        out = out.unionByName(prev.withColumn("level", F.lit(lvl)))
    return out.select(
        "level", "bucket", "key", "n", "sum_units", "min_units", "max_units"
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval RANGE join (a brief-named operator Spark lacks
    natively), as an exact equi-join rewrite: every interval is exploded
    to the fixed-width grid cells it overlaps, each point lives in
    exactly ONE cell, and the equi-join on (key, cell) + the residual
    ``start <= point <= end`` filter returns precisely the theta-join
    result — no duplicates (a pair can only meet in the point's own
    cell) and no O(|P|·|I|)-per-key expansion: shuffle volume is
    |P| + Σ⌈len/width⌉ per interval. Pick ``bucket_width`` ≈ the typical
    interval length so intervals land in 1-2 cells.

    ``point_col``/``start_col``/``end_col`` must be integral (e.g.
    microsecond epochs) with ``start <= end``; all comparisons stay in
    exact integer arithmetic. Column names must be disjoint apart from
    ``on``."""
    p = points.withColumn(
        "__cell", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(i, [on, "__cell"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__cell")
    )


_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    right_order: str | None = None,
    suffix: str = "_asof",
    cache: list | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    latest ``right`` row of the same ``on`` key with
    ``right_ts <= left_ts`` (null when no such row). Among right rows
    sharing (key, ts), the greatest ``right_order`` wins — pass one to
    make the pick total; defaults to the first value column. All carried
    values come from that ONE winning right row (a null in one of its
    value columns stays null — it is never backfilled from an older
    row).

    Two-phase scale-safe shape (module docstring): range-partition the
    tagged union on (key, ts, side, ord), summarize each partition
    (one tiny row), prefix-scan carry-in state on the driver, then fill
    left rows in a partition-local Arrow pass. No per-key window exists
    in the physical plan, so a hot key costs nothing beyond its share of
    the range shuffle. Runs one small summary action at call time; the
    sorted union is persisted (pass a list as ``cache`` to own
    unpersisting it, as with operators/ordering.py).

    Integer columns (left AND value) travel through the Arrow passes as
    STRINGS: every column of the tagged union contains nulls for the
    other side's rows, and Arrow→pandas coerces nullable int64 to
    float64 — which silently rounds values past 2⁵³ (e.g. this repo's
    own 60-bit md5-derived ids). Decimal-string round-tripping is
    exact at any width; the final select casts back to the declared
    types. Known limitation: a genuine NaN in a DOUBLE value column is
    indistinguishable from NULL after the pandas crossing and comes
    back as NULL."""
    if right_order is None:
        right_order = value_cols[0]
    left_cols = left.columns
    out_vals = [f"{c}{suffix}" for c in value_cols]
    int_vals = {
        o for c, o in zip(value_cols, out_vals)
        if isinstance(right.schema[c].dataType, _INT_TYPES)
    }
    int_lefts = {
        c for c in left_cols
        if c != on and isinstance(left.schema[c].dataType, _INT_TYPES)
    }

    def _t(col, name, ints):
        return col.cast("string") if name in ints else col

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_order).alias("__ord"),
        *[_t(F.col(c), o, int_vals).alias(o)
          for c, o in zip(value_cols, out_vals)],
        *[_t(F.lit(None).cast(left.schema[c].dataType), c, int_lefts).alias(c)
          for c in left_cols if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_order].dataType).alias("__ord"),
        *[_t(F.lit(None).cast(right.schema[c].dataType), o, int_vals).alias(o)
          for c, o in zip(value_cols, out_vals)],
        *[_t(F.col(c), c, int_lefts).alias(c)
          for c in left_cols if c != on],
    )
    un = r.unionByName(l)
    sorted_un = (
        un.repartitionByRange(on, "__ts", "__side", "__ord")
        .sortWithinPartitions(on, "__ts", "__side", "__ord")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    if cache is not None:
        cache.append(sorted_un)

    key_t = un.schema[on].dataType
    val_fields = [
        T.StructField(
            o,
            T.StringType() if o in int_vals else right.schema[c].dataType,
        )
        for c, o in zip(value_cols, out_vals)
    ]

    def _clean(v):
        """pandas null (None/NaN/NaT) → None."""
        if v is None or v != v:
            return None
        return v

    summ_schema = T.StructType(
        [
            T.StructField("__pid", T.LongType()),
            T.StructField("first_key", key_t),
            T.StructField("last_key", key_t),
            T.StructField("has_pack", T.BooleanType()),
        ]
        + val_fields
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per partition: first/last key in sort order, plus the last
        # right row FOR the last key (the carry-out candidate).
        pid = first_key = None
        cur_key, cur_pack = None, None
        for b in batches:
            if len(b) == 0:
                continue
            if pid is None:
                pid = int(b["__pid"].iloc[0])
                first_key = b[on].iloc[0]
            new_key = b[on].iloc[-1]
            rk = b[(b["__side"] == 0) & (b[on] == new_key)]
            if len(rk):
                cur_pack = tuple(
                    _clean(rk[o].iloc[-1]) for o in out_vals
                )
            elif not (cur_key is not None and new_key == cur_key):
                cur_pack = None  # key changed with no right rows for it
            cur_key = new_key
        if pid is None:
            return
        row = {"__pid": pid, "first_key": first_key, "last_key": cur_key,
               "has_pack": cur_pack is not None}
        for i, o in enumerate(out_vals):
            row[o] = cur_pack[i] if cur_pack is not None else None
        yield pd.DataFrame([row])

    summaries = sorted(
        sorted_un.mapInPandas(summarize, schema=summ_schema).collect(),
        key=lambda s: s["__pid"],
    )
    # Driver prefix-scan (≤ #partitions rows): carry-in pack for each
    # partition = the latest right row of its FIRST key from any earlier
    # partition. Keys are range-contiguous, so only the boundary-
    # straddling key can carry, and state threads through partitions
    # that contain the key without right rows.
    carry: dict[int, tuple] = {}
    state_key, state_pack = None, None
    for s in summaries:
        if (
            state_pack is not None
            and state_key is not None
            and s["first_key"] == state_key
        ):
            carry[s["__pid"]] = state_pack
        if s["has_pack"]:
            state_key = s["last_key"]
            state_pack = tuple(s[o] for o in out_vals)
        elif not (state_key is not None and s["last_key"] == state_key):
            state_key, state_pack = s["last_key"], None

    left_fields = [
        T.StructField(
            f.name,
            T.StringType() if f.name in int_lefts else f.dataType,
            f.nullable,
        )
        for f in left.schema.fields
    ]
    out_schema = T.StructType(left_fields + val_fields)

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state_key, state_pack, inited = None, None, False
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            if not inited:
                pack = carry.get(int(b["__pid"].iloc[0]))
                if pack is not None:
                    state_key, state_pack = b[on].iloc[0], pack
                inited = True
            keys = b[on].to_numpy()
            is_right = (b["__side"] == 0).to_numpy()
            # src[i] = row index of the latest right row at/before i with
            # the same key (vectorized per-key LOCF of row indices)
            idx = np.where(is_right, np.arange(n, dtype=float), np.nan)
            src = pd.Series(idx).groupby(keys).ffill().to_numpy()
            no_src = np.isnan(src)
            carry_mask = (
                no_src & (keys == state_key)
                if state_pack is not None
                else np.zeros(n, dtype=bool)
            )
            valid = ~no_src
            vi = src[valid].astype(np.int64)

            lmask = ~is_right
            out = b.loc[lmask, left_cols].copy()
            for i, o in enumerate(out_vals):
                colarr = b[o].to_numpy(dtype=object)
                filled = np.full(n, None, dtype=object)
                filled[valid] = colarr[vi]
                if state_pack is not None:
                    filled[carry_mask] = state_pack[i]
                out[o] = [_clean(v) for v in filled[lmask]]
            yield out

            new_key = keys[-1]
            rmask = is_right & (keys == new_key)
            if rmask.any():
                j = int(np.where(rmask)[0][-1])
                state_key = new_key
                state_pack = tuple(
                    _clean(b[o].iloc[j]) for o in out_vals
                )
            elif not (state_key is not None and new_key == state_key):
                state_key, state_pack = new_key, None

    filled_df = sorted_un.mapInPandas(fill, schema=out_schema)
    # cast the string-transported integer columns back to their real types
    return filled_df.select(
        *[
            F.col(c).cast(left.schema[c].dataType).alias(c)
            if c in int_lefts
            else F.col(c)
            for c in left_cols
        ],
        *[
            F.col(o).cast(right.schema[c].dataType).alias(o)
            if o in int_vals
            else F.col(o)
            for c, o in zip(value_cols, out_vals)
        ],
    )
