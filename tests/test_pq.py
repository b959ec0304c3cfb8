"""Product quantization: codes, compression, ADC recall, determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.pq import (
    pq_cosine_topk,
    pq_encode,
    train_pq_codebook,
)


def _fixture(spark, n=400, dim=32, seed=9):
    rng = np.random.default_rng(seed)
    # clustered data so PQ has structure to exploit
    centers = rng.normal(0, 1, (8, dim))
    rows = []
    for i in range(n):
        v = centers[i % 8] + rng.normal(0, 0.3, dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_pq_codebook_and_codes_shape(spark):
    df, _ = _fixture(spark)
    book = train_pq_codebook(df, dim=32, m=8, k=16)
    assert len(book) == 8 and len(book[0]) == 16 and len(book[0][0]) == 4
    codes = pq_encode(df, book).collect()
    assert all(len(r["pq_code"]) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["pq_code"])
    # determinism: same sample, same seed → same codebook
    assert train_pq_codebook(df, dim=32, m=8, k=16) == book


def test_pq_topk_recall_with_rerank(spark):
    df, rows = _fixture(spark)
    book = train_pq_codebook(df, dim=32, m=8, k=16)
    coded = pq_encode(df, book).localCheckpoint(eager=True)
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:6]], "query_id long, embedding array<double>"
    )
    got = pq_cosine_topk(qs, coded, book, k=5, refine=8)
    by_q: dict = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))

    # exact ground truth
    x = np.array([r[1] for r in rows])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    hits = total = 0
    for qid in range(6):
        sims = xn @ xn[qid]
        sims[qid] = -2
        truth = set(np.argsort(-sims)[:5])
        pred = {v for _, v in by_q[qid]}
        assert len(pred) == 5
        hits += len(truth & pred)
        total += 5
    assert hits / total >= 0.8, hits / total  # two-stage recall@5 (refine=8)

    # raw ADC (no re-rank) still returns k well-formed rows per query
    raw = pq_cosine_topk(qs, coded, book, k=5, refine=None)
    counts = {r["query_id"]: 1 for r in raw.collect()}
    assert raw.count() == 30 and len(counts) == 6
    assert "approx_cosine" in raw.columns


def test_pq_rejects_bad_dims(spark):
    df, _ = _fixture(spark)
    try:
        train_pq_codebook(df, dim=32, m=5, k=8)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
