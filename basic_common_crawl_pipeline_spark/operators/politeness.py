"""Per-host politeness budget as a salted, two-phase windowed top-k
(SURVEY.md §2.5 B4 + §4 "per-host skew").

A naive ``row_number() OVER (PARTITION BY host ORDER BY ...) <= budget``
funnels every candidate of a mega-host through one task. Instead:

- phase 1 ranks within ``(host, salt)`` where ``salt =
  pmod(xxhash64(canon_url), S)`` and keeps ranks ≤ budget — a salt group
  can contribute at most ``budget`` survivors, so phase 2 sees at most
  ``S × budget`` rows per host regardless of host size;
- phase 2 re-ranks the survivors within ``host`` and keeps ranks ≤ budget.

Top-k is distributive, so the result is exactly the global per-host top-k
by the total ORDER_KEY — identical to the oracle's sort-and-slice, at any
parallelism. AQE skew-join handling stays on as a second line of defense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_per_host_topk(
    eligible: DataFrame,
    budget_col: str = "budget",
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "surt", "canon_url"),
    salt_partitions: int = 8,
) -> DataFrame:
    """``eligible`` + boolean ``__selected`` column: True for the per-host
    top-``budget`` rows by ``order_cols``, False for the rest. Returning
    BOTH partitions from one ranking pass lets the caller derive
    selected AND deferred without an anti-join (one shuffle less than
    select-then-subtract). ``budget_col`` may vary per row (it is
    host-constant).

    ``salt_partitions <= 1`` skips phase 1 entirely (one shuffle+sort
    stage less) — the right physical choice for small waves where no
    host can be a hot key; top-k is distributive, so both shapes return
    the identical set (asserted in tests)."""
    order = [F.col(c).asc() for c in order_cols]
    names = eligible.columns
    phase1_def = None
    if salt_partitions > 1:
        salted = eligible.withColumn(
            "__salt", F.pmod(F.xxhash64("canon_url"), F.lit(salt_partitions))
        )
        w1 = Window.partitionBy(host_col, "__salt").orderBy(*order)
        r1 = salted.withColumn("__r1", F.row_number().over(w1))
        # a salt group contributes at most `budget` survivors, so rows
        # ranked past the budget within their salt group can never make
        # the host's global top-k: deferred, no second ranking needed
        phase1_def = (
            r1.filter(F.col("__r1") > F.col(budget_col))
            .select(*names)
            .withColumn("__selected", F.lit(False))
        )
        eligible = r1.filter(F.col("__r1") <= F.col(budget_col)).select(*names)
    w2 = Window.partitionBy(host_col).orderBy(*order)
    ranked = (
        eligible.withColumn("__r2", F.row_number().over(w2))
        .withColumn("__selected", F.col("__r2") <= F.col(budget_col))
        .drop("__r2")
    )
    return ranked if phase1_def is None else ranked.unionByName(phase1_def)


def select_per_host_topk(
    eligible: DataFrame,
    budget_col: str = "budget",
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "surt", "canon_url"),
    salt_partitions: int = 8,
) -> DataFrame:
    """Filter ``eligible`` to the per-host top-``budget`` rows by
    ``order_cols`` (the selected half of ``rank_per_host_topk``)."""
    return (
        rank_per_host_topk(
            eligible, budget_col, host_col, order_cols, salt_partitions
        )
        .filter(F.col("__selected"))
        .drop("__selected")
    )
