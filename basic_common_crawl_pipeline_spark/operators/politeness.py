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


def select_per_host_topk(
    eligible: DataFrame,
    budget_col: str = "budget",
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "surt", "canon_url"),
    salt_partitions: int = 8,
) -> DataFrame:
    """Filter ``eligible`` to the per-host top-``budget`` rows by
    ``order_cols``. ``budget_col`` may vary per row (it is host-constant).

    ``salt_partitions <= 1`` skips phase 1 entirely (one shuffle+sort
    stage less) — the right physical choice for small waves where no
    host can be a hot key; top-k is distributive, so both shapes return
    the identical set (asserted in tests)."""
    order = [F.col(c).asc() for c in order_cols]
    if salt_partitions > 1:
        salted = eligible.withColumn(
            "__salt", F.pmod(F.xxhash64("canon_url"), F.lit(salt_partitions))
        )
        w1 = Window.partitionBy(host_col, "__salt").orderBy(*order)
        eligible = (
            salted.withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= F.col(budget_col))
            .drop("__r1", "__salt")
        )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        eligible.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= F.col(budget_col))
        .drop("__r2")
    )
