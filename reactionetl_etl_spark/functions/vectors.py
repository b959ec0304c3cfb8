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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def non_null_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Rows whose ``vec_col`` is not NULL — the one shared guard every
    embedding consumer applies before a numpy matrix build or a
    similarity scan.

    Convention (uniform across the engine, r10/r11): a NULL embedding
    scores nothing, trains nothing, and is never anyone's neighbor —
    search/pair/train paths EXCLUDE such rows up front (a bare
    ``list(None)`` otherwise crashes the Arrow/collect numpy builds,
    and NULL cosines silently pollute top-k windows); column-appending
    transforms (quantize, PQ encode, PCA projection) instead map
    NULL → NULL so row counts are preserved."""
    return df.filter(F.col(vec_col).isNotNull())


def lit_double_array(values) -> Column:
    """A literal ``array<double>`` column built as ONE parsed expression.

    `F.array(*[F.lit(w) for w in values])` costs one py4j round-trip
    per element (~1.2 ms each) — a 64-dim centroid literal costs ~80 ms
    of pure driver RPC at plan-construction time, and an IVF assignment
    over 16 centroids pays that 16×, per builder call (measured: the
    expr-string form is ~50× faster to construct). `repr(float)` is the
    shortest round-trip decimal, and SQL double literals parse with
    correct rounding, so the parsed value is bit-identical to the
    py4j-shipped one; non-finite values fall back to the per-element
    path (SQL has no inf/nan literals).
    """
    vals = [float(v) for v in values]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


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
