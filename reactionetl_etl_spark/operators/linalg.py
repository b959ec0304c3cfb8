"""Distributed linear algebra: PCA over ``array<float>`` embedding columns.

Extension beyond the reference (which has no vector analytics —
SURVEY.md §2.13 north-star scope): dimensionality reduction is the
standard preprocessing step for embedding-space curation (SemDeDup runs
on PCA-reduced vectors in the paper; cluster visualization, drift
monitoring and ANN index build all want it), so the engine grows a
first-class PCA.

Spark shape, and why it holds at 100 TB:

- the only full-data pass is the Gram/mean accumulation
  (`gram_partials`): an Arrow-batched `mapInPandas` that folds each
  batch into d(d+1)/2 upper-triangle partial sums + d mean sums + a
  count, emitting a FEW THOUSAND tiny rows per batch regardless of row
  count. The shuffle that merges partials moves O(d^2 x batches) rows
  of (int, int, decimal) — metadata-sized. Nothing row-scale ever
  reaches the driver.
- the eigensolve happens on the driver over the d x d covariance
  (64 x 64 here; fine to a few thousand dims — past that you'd switch
  to randomized-projection sketches, which compose with the same
  partial-fold plumbing).
- projection is a pure Catalyst expression per component (`dot` fold
  over the array column minus a precomputed constant): JVM-side,
  whole-stage-codegen, zero Python in the per-row path.

Determinism (the property the correctness gate leans on): float sums
are NOT associative, so a plain double Gram would drift in the low
bits whenever the partition/batch layout changes (local[32] vs the
driver's local[6] — exactly the failure class behind r6's one red
row). The accumulation here is FIXED-POINT: each component is scaled
to an integer (round(x * scale)), per-batch partials are exact integer
sums (chunked so int64 matmuls cannot overflow, folded into Python
bigints), and the cross-batch merge is a DECIMAL(38,0) sum — exact and
order-independent. The covariance the driver factors is therefore
bit-identical for ANY partitioning, so components, projections, and
the pinned oracle are stable by construction, not by luck.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.functions.vectors import as_double_array, dot, lit_double_array

_PARTIAL_SCHEMA = "i int, j int, partial string"


def gram_partials(df: DataFrame, vec_col: str, dim: int, scale: int = 1_000_000) -> DataFrame:
    """Per-batch exact fixed-point partial sums for the Gram matrix.

    Emits rows ``(i, j, partial)`` with the upper-triangle integer
    Gram partials (i <= j), the scaled per-dimension sums as
    ``(i, -1)``, and the row count as ``(-1, -1)`` — partials are
    decimal strings (Python bigints survive any magnitude). One
    emission per Arrow batch: the output is O(d^2) per batch, never
    O(rows).

    NULL vectors are excluded up front (shared `non_null_vectors`
    guard): they carry no coordinates to accumulate and would crash
    the per-batch ``np.stack``, so PCA and every downstream consumer
    (Mahalanobis, projections) is fit over the non-null rows — and the
    fitted model therefore maps NULL → NULL at projection time rather
    than poisoning the covariance.
    """
    from reactionetl_etl_spark.functions.vectors import non_null_vectors

    df = non_null_vectors(df, vec_col)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(dim)
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.rint(M * scale).astype(np.int64)
            # chunk so the int64 matmul cannot overflow: per-entry
            # |partial| <= rows * max_scaled^2 must stay under 2^62
            m = int(np.abs(Q).max()) or 1
            rows_per_chunk = max(1, (1 << 62) // (m * m))
            G = np.zeros((dim, dim), dtype=object)
            for lo in range(0, len(Q), rows_per_chunk):
                C = Q[lo : lo + rows_per_chunk]
                G += C.T @ C  # int64-safe by chunking; folded into bigints
            s = Q.sum(axis=0, dtype=object)
            i_idx = list(iu[0]) + list(range(dim)) + [-1]
            j_idx = list(iu[1]) + [-1] * dim + [-1]
            vals = [str(G[a, b]) for a, b in zip(iu[0], iu[1])]
            vals += [str(v) for v in s]
            vals += [str(len(Q))]
            yield pd.DataFrame({"i": np.int32(i_idx), "j": np.int32(j_idx), "partial": vals})

    return df.select(vec_col).mapInPandas(fold, schema=_PARTIAL_SCHEMA)


class PCAModel(NamedTuple):
    """Driver-side PCA model: per-dim means, row-major components
    (k x d, unit-norm, sign-fixed), eigenvalues, total variance."""

    mean: list[float]
    components: list[list[float]]
    eigenvalues: list[float]
    total_variance: float


def fit_pca(
    df: DataFrame, vec_col: str, dim: int, k: int, scale: int = 1_000_000
) -> PCAModel:
    """Fit PCA: one distributed exact-Gram pass + a driver eigensolve.

    The merge of per-batch partials is a DECIMAL(38,0) groupBy sum —
    exact integer arithmetic end-to-end, so the covariance (and hence
    the model) is bit-identical under any partitioning. Eigenvector
    signs are fixed so each component's largest-|coordinate| entry is
    positive (eigh's sign is otherwise arbitrary).
    """
    merged = (
        gram_partials(df, vec_col, dim, scale)
        .groupBy("i", "j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("total"))
        .collect()
    )
    G = np.zeros((dim, dim), dtype=np.float64)
    s = np.zeros(dim, dtype=np.float64)
    n = 0
    for row in merged:
        i, j, total = row["i"], row["j"], int(row["total"])
        if i == -1:
            n = total
        elif j == -1:
            s[i] = float(total)
        else:
            G[i, j] = float(total)
            G[j, i] = float(total)
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    sc2 = float(scale) * float(scale)
    mean = s / (n * float(scale))
    # sample covariance: (G - s s^T / n) / (n - 1), descaled
    cov = (G - np.outer(s, s) / n) / ((n - 1) * sc2)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    top = []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        top.append(max(float(evals[idx]), 0.0))
    return PCAModel(
        mean=[float(x) for x in mean],
        components=comps,
        eigenvalues=top,
        total_variance=float(max(np.sum(np.clip(evals, 0.0, None)), 0.0)),
    )


def project_expr(vec_col: str | Column, model: PCAModel, component: int) -> Column:
    """Centered projection onto one component as a pure Catalyst
    expression: ``dot(vec, comp) - dot(mean, comp)`` with the mean term
    folded to a literal constant. JVM-side; deterministic per row."""
    comp = model.components[component]
    const = float(np.dot(model.mean, comp))
    v = as_double_array(vec_col)
    c = lit_double_array(comp)
    return dot(v, c) - F.lit(const)


def pca_project(
    df: DataFrame, vec_col: str, model: PCAModel, prefix: str = "pc"
) -> DataFrame:
    """Append one ``{prefix}{n}`` double column per model component —
    all pure expressions, no shuffle, no Python."""
    out = df
    for idx in range(len(model.components)):
        out = out.withColumn(f"{prefix}{idx + 1}", project_expr(vec_col, model, idx))
    return out


def mahalanobis_exprs(
    vec_col: str | Column, model: PCAModel, eps: float = 1e-12
) -> tuple[Column, Column]:
    """(subspace Mahalanobis², residual leverage) as pure expressions.

    The first term is Σ_j proj_j² / λ_j over the model's k components —
    the squared Mahalanobis distance within the retained subspace
    (large ⇒ extreme along directions the corpus actually varies in).
    The second is the centered norm² MINUS the explained Σ proj_j² —
    energy orthogonal to the subspace (large ⇒ the vector lives off
    the corpus manifold entirely; classic PCA outlier residual).
    Both are per-row folds over literal arrays: JVM-side, no shuffle,
    deterministic — composing the bit-stable model keeps pinned
    oracles stable."""
    v = as_double_array(vec_col)
    mu = lit_double_array(model.mean)
    centered_sq = dot(F.zip_with(v, mu, lambda x, m: x - m), F.zip_with(v, mu, lambda x, m: x - m))
    maha = F.lit(0.0)
    explained = F.lit(0.0)
    for idx, ev in enumerate(model.eigenvalues):
        p = project_expr(vec_col, model, idx)
        maha = maha + (p * p) / F.lit(float(ev) + eps)
        explained = explained + p * p
    return maha, centered_sq - explained
