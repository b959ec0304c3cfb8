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


def test_pq_index_probe_full_matches_inplan_adc(spark, tmp_path):
    """probe_pq_index(n_probe=None) over a persisted index must equal
    pq_cosine_topk(refine=None) on the same data — the probe≡in-plan
    parity contract the LSH/IVF indexes carry."""
    from reactionetl_etl_spark.operators.pq import (
        probe_pq_index,
        read_pq_codebook,
        write_pq_index,
    )

    df, rows = _fixture(spark)
    path = str(tmp_path / "pq_idx")
    book = write_pq_index(df, dim=32, path=path, m=8, k=16)
    assert read_pq_codebook(spark, path) == book

    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:6]], "query_id long, embedding array<double>"
    )
    index = spark.read.parquet(f"{path}/codes")
    got = probe_pq_index(qs, index, book, k=5, n_probe=None)
    coded = pq_encode(df, book)
    want = pq_cosine_topk(qs, coded, book, k=5, refine=None)
    g = sorted(map(tuple, got.collect()))
    w_ = sorted(
        map(tuple, want.select("query_id", "vec_id", "approx_cosine", "rank").collect())
    )
    assert g == w_


def test_pq_index_partition_pruned_probe(spark, tmp_path):
    """A bounded-n_probe probe only considers candidates from the
    queries' probed pq_cells, and still returns k ranked rows/query."""
    from reactionetl_etl_spark.operators.pq import probe_pq_index, write_pq_index

    df, rows = _fixture(spark)
    path = str(tmp_path / "pq_idx")
    book = write_pq_index(df, dim=32, path=path, m=8, k=16)
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:4]], "query_id long, embedding array<double>"
    )
    index = spark.read.parquet(f"{path}/codes")
    got = probe_pq_index(qs, index, book, k=5, n_probe=4).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2, 3}
    assert all(1 <= r["rank"] <= 5 for r in got)
    # every candidate's subspace-0 cell is one of its query's probed cells
    codes = {
        r["vec_id"]: r["pq_code"][0]
        for r in pq_encode(df, book).select("vec_id", "pq_code").collect()
    }
    import numpy as np

    books = [np.array(b) for b in book]
    x = np.array([r[1] for r in rows[:4]], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for r in got:
        q0 = xn[r["query_id"]][:4]
        d0 = ((q0[None, :] - books[0]) ** 2).sum(axis=1)
        probed = set(np.argsort(d0)[:4])
        assert codes[r["vec_id"]] in probed


def test_pq_index_append_requires_codebook_and_stays_consistent(spark, tmp_path):
    """Append without the stored codebook raises; append WITH it codes
    the new batch identically to a one-shot build with that codebook."""
    import pytest

    from reactionetl_etl_spark.operators.pq import (
        probe_pq_index,
        read_pq_codebook,
        write_pq_index,
    )

    df, rows = _fixture(spark)
    half1 = df.filter(F.col("vec_id") < 200)
    half2 = df.filter(F.col("vec_id") >= 200)
    path = str(tmp_path / "pq_idx")
    book = write_pq_index(half1, dim=32, path=path, m=8, k=16)
    with pytest.raises(ValueError, match="stored codebook"):
        write_pq_index(half2, dim=32, path=path, mode="append")
    write_pq_index(
        half2, dim=32, path=path, codebook=read_pq_codebook(spark, path), mode="append"
    )
    # one-shot build of the union with the SAME codebook at another path
    path2 = str(tmp_path / "pq_idx2")
    write_pq_index(df, dim=32, path=path2, codebook=book)
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:4]], "query_id long, embedding array<double>"
    )
    a = probe_pq_index(qs, spark.read.parquet(f"{path}/codes"), book, k=5, n_probe=None)
    b = probe_pq_index(qs, spark.read.parquet(f"{path2}/codes"), book, k=5, n_probe=None)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pq_index_probe_prunes_partitions(spark, tmp_path):
    """The PQ probe must touch only the pq_cell partitions the queries'
    subspace-0 distances select — the executed plan carries dynamic-
    pruning/partition filters on pq_cell rather than scanning all k
    cells (the same contract as the LSH/IVF probes)."""
    from reactionetl_etl_spark.operators.pq import probe_pq_index, write_pq_index

    df, rows = _fixture(spark)
    path = str(tmp_path / "pq_prune")
    book = write_pq_index(df, dim=32, path=path, m=8, k=16)
    qs = spark.createDataFrame(
        [(rows[0][0], rows[0][1])], "query_id long, embedding array<double>"
    )
    out = probe_pq_index(qs, spark.read.parquet(f"{path}/codes"), book, k=5, n_probe=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan
