"""Vector math over ``array<float|double>`` columns.

All of these are pure Catalyst expressions (higher-order functions
``zip_with`` / ``aggregate``), so they run JVM-side inside whole-stage
codegen — no Python UDF, no serialization boundary. That is the
difference between a similarity scan that saturates executor cores and
one that bottlenecks on pickle.

Folds are sequential left-to-right over the array, which makes the
floating-point result deterministic for a given row (important for the
DuckDB oracle comparison).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> so accumulation happens in f64."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (f64 accumulate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)
