"""Shared primitives of the experimentation (A/B analysis) queries.

Every experimentation query in the catalog — CUPED, MDE power
analysis, quantile treatment effects, the Pocock sequential test, the
Poisson bootstrap, CUSUM — derives the SAME two columns from the raw
events:

- the arm assignment: a deterministic 50/50 user hash, and
- the metric in exact integer micro-units (floor(x·10⁶ + 0.5)), the
  convention that makes every downstream moment sum exact in int64 /
  DECIMAL headroom and therefore bit-identical across engines and
  partition orders.

Both used to be re-spelled inline per query; a one-character drift in
the arm hash (or the rounding convention) between two queries would
silently compare different experiment populations. One definition,
many call sites — the oracles mirror these literally as
`CAST(user_id % 2 AS BIGINT)` and
`CAST(floor(value * 1000000 + 0.5) AS BIGINT)`.

Pure column expressions: JVM-side, codegen'd, no shuffle of their own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The arm hash's modulus. 2 = a 50/50 split keyed on the user id; the
# SQL oracles spell the same literal, so changing this means
# regenerating every experimentation oracle in plans/catalog.py.
ARM_MODULUS = 2

# Micro-unit scale for the value metric (6 decimal places).
MICRO_SCALE = 1_000_000


def arm_assignment(user_col: str = "user_id") -> Column:
    """Deterministic 50/50 arm id (long): ``user_id % 2``.

    A stand-in for a real platform's salted-hash bucketing; what
    matters here is that it is engine-neutral and IDENTICAL across all
    experimentation queries, so arm populations can never drift
    between, say, the CUPED estimate and the MDE power analysis run on
    the same events."""
    return (F.col(user_col) % ARM_MODULUS).cast("long")


def micro_units(col: str = "value", scale: int = MICRO_SCALE) -> Column:
    """Exact integer micro-units: ``floor(x·scale + 0.5)`` as long.

    floor(x+0.5) instead of round(): round() half-ulp behavior differs
    between Spark (shortest-decimal HALF_UP) and DuckDB (binary value),
    while floor is exact everywhere — the repo-wide rounding
    convention (see e.g. the Welch/CUPED/conformal queries)."""
    return F.floor(F.col(col) * scale + F.lit(0.5)).cast("long")
