"""PCA (operators/linalg.py): numpy parity, partitioning invariance,
fixed-point overflow chunking, and projection-expression correctness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.linalg import (
    fit_pca,
    gram_partials,
    pca_project,
)

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_pca(M: np.ndarray, k: int):
    """Reference PCA over the same 1e-6 fixed-point quantization the
    distributed pass applies."""
    Q = np.rint(M * 1_000_000) / 1_000_000
    cov = np.cov(Q, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps, tops = [], []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v)
        tops.append(float(evals[idx]))
    return tops, comps


def test_fit_pca_matches_numpy(spark, emb):
    model = fit_pca(emb, "embedding", DIM, k=4)
    M = np.stack(emb.toPandas()["embedding"].to_numpy()).astype(np.float64)
    evals, comps = _numpy_pca(M, 4)
    assert np.allclose(model.eigenvalues, evals, rtol=1e-9)
    for got, want in zip(model.components, comps):
        assert np.allclose(got, want, atol=1e-9)


def test_fit_pca_partitioning_invariant(spark, emb):
    """The decimal merge of integer partials is exact, so ANY
    partition/batch layout yields a bit-identical model — the property
    that keeps the pinned oracle stable between local[32] and the
    driver's session."""
    a = fit_pca(emb, "embedding", DIM, k=3)
    b = fit_pca(emb.repartition(13), "embedding", DIM, k=3)
    assert a.mean == b.mean
    assert a.components == b.components
    assert a.eigenvalues == b.eigenvalues


def test_gram_partials_overflow_chunking(spark):
    """Components large enough that an unchunked int64 matmul would
    overflow still sum exactly (the chunked bigint fold)."""
    big = 3000.0  # scaled: 3e9; squared: 9e18 ~ int64 max — forces chunks
    rows = [([big] * 4,) for _ in range(50)]
    df = spark.createDataFrame(rows, "v array<double>")
    merged = {
        (r["i"], r["j"]): int(r["total"])
        for r in gram_partials(df, "v", 4)
        .groupBy("i", "j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("total"))
        .collect()
    }
    want = 50 * (3_000_000_000 ** 2)
    assert merged[(0, 0)] == want
    assert merged[(0, 3)] == want
    assert merged[(-1, -1)] == 50


def test_pca_project_expression_matches_numpy(spark, emb):
    model = fit_pca(emb, "embedding", DIM, k=2)
    out = (
        pca_project(emb.select("vec_id", "embedding"), "embedding", model)
        .select("vec_id", "pc1", "pc2")
        .toPandas()
        .sort_values("vec_id")
    )
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    C = np.array(model.components).T
    want = (M - np.array(model.mean)) @ C
    got = out[["pc1", "pc2"]].to_numpy()
    assert np.allclose(got, want, atol=1e-9)


def test_mahalanobis_matches_numpy(spark, emb):
    """Subspace Mahalanobis + residual must equal the straightforward
    numpy computation over the same model."""
    from reactionetl_etl_spark.operators.linalg import mahalanobis_exprs

    model = fit_pca(emb, "embedding", DIM, k=8)
    maha_c, resid_c = mahalanobis_exprs("embedding", model)
    got = (
        emb.select("vec_id", maha_c.alias("m"), resid_c.alias("r"))
        .toPandas()
        .sort_values("vec_id")
    )
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    C = np.array(model.components).T
    X = M - np.array(model.mean)
    P = X @ C
    maha = (P**2 / (np.array(model.eigenvalues) + 1e-12)).sum(axis=1)
    resid = (X**2).sum(axis=1) - (P**2).sum(axis=1)
    assert np.allclose(got["m"].to_numpy(), maha, atol=1e-8)
    assert np.allclose(got["r"].to_numpy(), resid, atol=1e-8)
