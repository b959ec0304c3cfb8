"""Z-order (Morton) clustering: multi-column data layout for pruning.

Day-partitioning prunes ONE dimension. Queries that filter on two or
more columns at once (user_id AND time, lat AND lon, key AND value
band) still scan every row group whose single sort column overlaps —
sorting by (a, b) gives perfect locality on `a` and none on `b`. The
lakehouse answer (Delta/Iceberg `OPTIMIZE ZORDER BY`) is to sort by
the INTERLEAVED BITS of the clustering columns: points close in the
Morton curve are close in every dimension, so parquet row-group
min/max stats become tight ranges on ALL clustered columns
simultaneously and multi-dimensional predicates skip most row groups.

This module is that optimization on plain parquet, as expressions:

    1. quantize each clustering column to ``n_bits`` integer buckets
       (min-max linear scaling — one aggregation pass for the bounds;
       heavy skew can pre-transform with log/rank upstream);
    2. Morton-interleave the bucket bits into one bigint `__z`
       (pure bit arithmetic, whole-stage codegen);
    3. range-partition + sort by `__z` and write — each output file /
       row group covers a small hyper-rectangle of the key space.

Everything is one extra narrow column and one range shuffle at WRITE
time; reads need no code change — pruning happens in the parquet
reader via the tightened statistics. `tests/test_zorder.py` measures
the effect directly on row-group stats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, n_bits: int) -> Column:
    """Value → integer bucket in [0, 2^n_bits): linear min-max scaling,
    NULLs to bucket 0 (they sort together, which is what pruning
    wants)."""
    n_buckets = (1 << n_bits) - 1
    # lo/hi are None when the column is entirely NULL — degenerate
    # dimension, everything lands in bucket 0 (same as hi == lo)
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.coalesce(
        F.least(
            F.greatest(F.floor(scaled * n_buckets), F.lit(0)), F.lit(n_buckets)
        ).cast("long"),
        F.lit(0).cast("long"),
    )


def morton_code(quantized: list[Column], n_bits: int) -> Column:
    """Interleave the low ``n_bits`` of each quantized column into one
    bigint: bit i of column d lands at position i * n_cols + d. Total
    bits must fit a signed 64-bit value."""
    d = len(quantized)
    if d * n_bits > 62:
        raise ValueError(f"{d} cols × {n_bits} bits exceeds the 62-bit budget")
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j)
        for j, c in enumerate(quantized)
        for i in range(n_bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_bits: int = 12,
    num_partitions: int | None = None,
    keep_code: bool = False,
) -> DataFrame:
    """Return ``df`` clustered on the Morton curve of ``cols`` (numeric
    or timestamp), ready to write: range-partitioned and sorted within
    partitions by the interleaved code. ``keep_code=True`` retains the
    ``__z`` column for inspection. One bounds aggregation (driver gets
    2×len(cols) scalars) + one range shuffle."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 columns; sort for 1")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    ).first()
    quantized = [
        _quantize(F.col(c), bounds[f"__lo_{c}"], bounds[f"__hi_{c}"], n_bits)
        for c in cols
    ]
    z = df.withColumn("__z", morton_code(quantized, n_bits))
    n_parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out = z.repartitionByRange(int(n_parts), "__z").sortWithinPartitions("__z")
    return out if keep_code else out.drop("__z")
