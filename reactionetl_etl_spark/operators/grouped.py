"""Per-group transforms: the applyInPandas (grouped-map) surface.

SURVEY.md §2.12: the reference has no UDFs; its closest analogue is the
pydantic row validator. The engine's per-group story is Spark's grouped
map — one shuffle on the group key, then each group arrives as a whole
pandas DataFrame in an Arrow batch. The canonical use here is
per-simulation normalization of sensor traces (README.md:33's planned
"sensitivity analysis" shape), exposed generically.

When the transform is expressible as window functions (like z-score),
prefer those — they stay in whole-stage codegen. applyInPandas earns
its shuffle when the per-group logic is genuinely imperative
(curve fitting, scipy, model scoring). Both implementations live here
so callers can pick, and the oracle gate proves they agree.

Scale: group count must exceed parallelism for even utilization, and a
single group must fit in one task's memory — at 100 TB, groups are
simulations (thousands of rows each), so both hold. Skewed group sizes
are handled by AQE only between tasks, not within one giant group; for
pathological groups, pre-split on a salt and merge statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_per_group_pandas(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Grouped-map z-score via applyInPandas (Arrow-batched).

    Demonstrates the imperative per-group path; semantically identical
    to :func:`zscore_per_group_window` (the oracle gate checks this).
    """
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{out_fields}, {out_col} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf[out_col] = (pdf[value_col] - mean) / sd if sd and sd > 0 else None
        return pdf

    return df.groupBy(*group_cols).applyInPandas(norm, schema=schema)


def ewma_per_group_pandas(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.2,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per group, ordered by
    ``order_cols`` — the canonical GENUINE applyInPandas case: an EWMA
    is a sequential recurrence (y_t = α·x_t + (1−α)·y_{t−1}, y_0 = x_0;
    pandas adjust=False), which no Catalyst window frame expresses
    (frames aggregate, they don't recurse). Each group sorts in-task
    and runs pandas' vectorized `ewm`; one shuffle on the group key,
    Arrow both ways.

    Determinism requires ``order_cols`` to totally order each group.
    """
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"
    order_list = list(order_cols)

    def ew(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_list, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*group_cols).applyInPandas(ew, schema=schema)


def zscore_per_group_window(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Same semantics as the pandas version, as window expressions —
    whole-stage-codegen'd, no Python in the path. Prefer this one."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mean) / sd)
    return df.withColumn(out_col, z)
