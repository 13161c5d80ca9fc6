"""Temporal joins (north-rule additions; no reference analog — the
reference processes a static index snapshot). The crawl-shaped use is
"policy in effect at fetch time": join each capture to the latest
robots/config snapshot with ``snapshot_ts <= capture_ts``.

``asof_join`` is the canonical distributed AS-OF shape: union both
sides with a side tag, ONE shuffle by key, sort within partitions by
(ts, side, tiebreak), and carry the last-observed right-hand values
forward with an ``ignorenulls`` window ``last``. The naive alternative —
theta-join on ``r.ts <= l.ts`` then rank — materializes O(|L|·|R|)
pairs per key before pruning; the union form moves each row exactly
once. Right rows sort BEFORE left rows at equal timestamps, so a
snapshot taken at T applies to a probe at T (inclusive semantics).

Skew note (10^10 rows): the window partitions by key — a pathologically
hot key serializes through one task. LOCF cannot be salted the way
top-k can (state crosses salt boundaries); the production refinement is
range-partitioning (key, ts) with per-boundary state carry, the same
two-phase shape as operators/ordering.py. Keys here are hosts/users —
hot but bounded; AQE skew handling stays on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    latest ``right`` row of the same ``on`` key with
    ``right_ts <= left_ts`` (null when no such row). Among right rows
    sharing (key, ts), the greatest ``right_order`` wins — pass one to
    make the pick total; defaults to the first value column."""
    if right_order is None:
        right_order = value_cols[0]
    left_cols = left.columns
    out_vals = [f"{c}{suffix}" for c in value_cols]

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_order).alias("__ord"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_order].dataType).alias("__ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o)
          for c, o in zip(value_cols, out_vals)],
        *[F.col(c) for c in left_cols if c != on],
    )
    un = r.unionByName(l)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = un.select(
        "*",
        *[
            F.last(o, ignorenulls=True).over(w).alias(f"__c_{o}")
            for o in out_vals
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"__c_{o}").alias(o) for o in out_vals],
    )
