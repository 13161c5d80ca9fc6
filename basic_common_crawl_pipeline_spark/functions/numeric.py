"""Cross-engine-deterministic numeric helpers.

``round()`` differs across engines on exact ties (HALF_UP in Spark,
half-away-from-zero or banker's elsewhere) — and ratio columns like
``stops/32`` DO hit exact ties at the 4th decimal. ``round4`` instead
computes ``floor(x·10⁴ + 0.5)/10⁴``: identical IEEE-double operations on
both sides of the oracle comparison → identical results whenever the
inputs are identical. The DuckDB oracle uses the same formula verbatim
(see SQL_ROUND4 template)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SQL_ROUND4 = "floor(({expr}) * 10000 + 0.5) / 10000"

# Exact-cents conversion (double → BIGINT) for queries whose correctness
# claim depends on an EXACT value domain (e.g. the hypertable rollup,
# where sum-of-sums must be bit-equal to the direct sum). Same
# half-up-via-floor discipline as round4; the oracle uses SQL_CENTS
# verbatim so both engines run identical IEEE ops.
SQL_CENTS = "CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


def round4(col: Column) -> Column:
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def to_cents(col: Column) -> Column:
    return F.floor(col * 100 + F.lit(0.5)).cast("long")
