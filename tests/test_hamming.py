"""Sign-bit Hamming ANN (operators/hamming.py).

Covers the packing kernel against a numpy reference (including the
non-multiple-of-64 tail-word case the catalog's 64-dim data never
exercises), the integer distance, the batch top-k contract, the
two-stage rerank's shortlist containment, and the NULL-vector
convention shared with the cosine paths.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators import hamming as H


def _np_sign_bits(vec: list[float]) -> list[int]:
    words = [0] * ((len(vec) + 63) // 64)
    for j, v in enumerate(vec):
        if v > 0:
            words[j // 64] |= 1 << (j % 64)
    # two's-complement to signed int64 to match Spark's LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _np_hamming(a: list[float], b: list[float]) -> int:
    return sum((x > 0) != (y > 0) for x, y in zip(a, b))


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    # dim 70: exercises the tail word (6 live bits, 58 dead high bits)
    return [(i, [float(x) for x in rng.normal(size=70)]) for i in range(40)]


def test_sign_bits_matches_numpy_reference(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: list(r.bits)
        for r in df.select("vec_id", H.sign_bits("embedding").alias("bits")).collect()
    }
    for vid, v in vecs:
        assert out[vid] == _np_sign_bits(v), f"vec {vid}"
        assert len(out[vid]) == 2  # ceil(70/64)


def test_sign_bits_high_bit_word(spark):
    # component 63 positive -> bit 63 -> negative int64; xor/bit_count
    # must still see exactly one differing bit
    v1 = [0.0] * 63 + [1.0]
    v2 = [0.0] * 64
    df = spark.createDataFrame([(1, v1), (2, v2)], "vec_id long, embedding array<double>")
    bits = {r.vec_id: list(r.bits) for r in df.select("vec_id", H.sign_bits("embedding").alias("bits")).collect()}
    assert bits[1] == [-(1 << 63)]
    assert bits[2] == [0]
    d = (
        df.select(H.sign_bits("embedding").alias("a"))
        .crossJoin(df.select(H.sign_bits("embedding").alias("b")))
        .select(H.hamming_distance("a", "b").alias("d"))
        .collect()
    )
    assert sorted(r.d for r in d) == [0, 0, 1, 1]


def test_hamming_topk_batch_matches_bruteforce(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r.query_id, r.vec_id): r.hamming_dist
        for r in H.hamming_topk_batch(q, df, k=4).collect()
    }
    by_q: dict[int, list[tuple[int, int]]] = {}
    for qid, qv in vecs[:3]:
        cand = sorted(
            (( _np_hamming(qv, cv), cid) for cid, cv in vecs if cid != qid),
        )[:4]
        by_q[qid] = [(cid, d) for d, cid in cand]
    assert len(got) == 12
    for qid, pairs in by_q.items():
        for cid, d in pairs:
            assert got[(qid, cid)] == d


def test_hamming_topk_excludes_self_and_is_k_deep(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = H.hamming_topk_batch(q, df, k=6).toPandas()
    assert (out.groupby("query_id").size() == 6).all()
    assert not (out["query_id"] == out["vec_id"]).any()


def test_hamming_topk_plans_window_group_limit(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    plan = H.hamming_topk_batch(q, df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # map-side partial top-k
    assert "BroadcastNestedLoopJoin" in plan  # queries broadcast, corpus never shuffles


def test_rerank_subset_of_shortlist_and_cosine_ordered(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    short = H.hamming_topk_batch(q, df, k=10)
    shortlist = {(r.query_id, r.vec_id) for r in short.collect()}
    rr = H.hamming_rerank_topk(q, df, k=5, shortlist=10).toPandas()
    assert (rr.groupby("query_id").size() == 5).all()
    assert all((r.query_id, r.vec_id) in shortlist for r in rr.itertuples())
    for _, g in rr.groupby("query_id"):
        sims = list(g["cosine_sim"])
        assert sims == sorted(sims, reverse=True)


def test_null_query_vector_retrieves_nothing(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, vecs[0][1]), (1, None)], "query_id long, embedding array<double>"
    )
    out = H.hamming_topk_batch(q, df, k=3).toPandas()
    assert set(out["query_id"]) == {0}
    out2 = H.hamming_rerank_topk(q, df, k=3, shortlist=6).toPandas()
    assert set(out2["query_id"]) == {0}


def test_empty_vector_packs_to_single_zero_word(spark):
    # r13 ADVICE: ceil(0/64)-1 = -1 made sequence(0,-1) descend and
    # emit a bogus two-word [0, 0]; the clamp pins empty -> one word
    df = spark.createDataFrame(
        [(1, []), (2, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    bits = {
        r.vec_id: list(r.bits)
        for r in df.select("vec_id", H.sign_bits("embedding").alias("bits")).collect()
    }
    assert bits[1] == [0]
    assert len(bits[2]) == 1


def test_malformed_corpus_vector_never_outranks_real_neighbors(spark, vecs):
    # r13 ADVICE: a dim-mismatched corpus row hamming-distances to NULL
    # (zip_with pads) — asc_nulls_last must keep it out of the top-k
    rows = vecs + [(999, [1.0] * 200)]  # 4 words vs the 70-dim corpus's 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = H.hamming_topk_batch(q, df, k=5).toPandas()
    assert 999 not in set(out["vec_id"])
    assert out["hamming_dist"].notna().all()


def test_hamming_max_query_rows_refusal(spark, vecs):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_query_rows"):
        H.hamming_topk_batch(q, df, k=3, max_query_rows=10)
    # under the cap: unchanged behavior
    ok = H.hamming_topk_batch(q.limit(2), df, k=3, max_query_rows=10).toPandas()
    assert len(ok) == 6


def test_probe_bits_index_max_query_rows_refusal(spark, vecs, tmp_path):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    path = str(tmp_path / "bits")
    H.write_bits_index(df, path)
    q = df.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_query_rows"):
        H.probe_bits_index(spark, path, q, k=3, max_query_rows=10)


def test_null_corpus_vector_never_a_candidate(spark, vecs):
    rows = vecs + [(999, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = H.hamming_topk_batch(q, df, k=len(rows)).toPandas()
    assert 999 not in set(out["vec_id"])


# ---------------------------------------------------------------------------
# corpus_cluster_map (catalog) — semantic invariants at the test scale
# (the VALUE contract is the sf0.01/sf0.1 pin; these check structure)
# ---------------------------------------------------------------------------


def test_corpus_cluster_map_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from reactionetl_etl_spark.plans.catalog import all_queries
    from reactionetl_etl_spark.sources.tables import load_table

    out = all_queries()["corpus_cluster_map"].builder(spark, sf_dir).toPandas()
    assert sorted(out["cell"]) == list(range(8))  # every cell reported once
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_mappable = emb.join(docs, "doc_id").count()
    assert int(out["n_docs"].sum()) == n_mappable  # partition of the universe
    assert (out["top_source_share_milli"] <= 1000).all()
    assert (out["top_source_share_milli"] >= 1).all()
    assert (out["mean_sim_q4"] <= 10000).all()
    assert (out["n_docs"] > 0).all()


# ---------------------------------------------------------------------------
# persisted bits index
# ---------------------------------------------------------------------------


def test_bits_index_probe_equals_in_plan_scan(spark, vecs, tmp_path):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    path = str(tmp_path / "bits")
    H.write_bits_index(df, path)
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probe = sorted(
        tuple(r) for r in H.probe_bits_index(spark, path, q, k=5).collect()
    )
    inplan = sorted(tuple(r) for r in H.hamming_topk_batch(q, df, k=5).collect())
    assert probe == inplan  # round trip is value-invisible


def test_bits_index_append_is_stateless_consistent(spark, vecs, tmp_path):
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    whole = str(tmp_path / "whole")
    split = str(tmp_path / "split")
    H.write_bits_index(df, whole)
    H.write_bits_index(df.filter(F.col("vec_id") % 2 == 0), split)
    H.write_bits_index(df.filter(F.col("vec_id") % 2 != 0), split, mode="append")
    q = df.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    a = sorted(tuple(r) for r in H.probe_bits_index(spark, whole, q, k=4).collect())
    b = sorted(tuple(r) for r in H.probe_bits_index(spark, split, q, k=4).collect())
    assert a == b


def test_bits_index_drops_null_vectors(spark, vecs, tmp_path):
    rows = vecs + [(999, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "bits")
    H.write_bits_index(df, path)
    stored = {r.vec_id for r in H.read_bits_index(spark, path).collect()}
    assert 999 not in stored and len(stored) == len(vecs)


def test_dedup_method_agreement_internal_consistency(spark, sf_dir):
    """Every method's total flagged count must be identical across all
    of its rows (both + only_a for method_a rows, both + only_b for
    method_b rows) — the 2x2 cells are all views of the same four flag
    sets, so any drift means the one-pass aggregate miscounted."""
    from reactionetl_etl_spark.plans.catalog import all_queries

    pdf = (
        all_queries()["dedup_method_agreement"].builder(spark, sf_dir).toPandas()
    )
    assert len(pdf) == 6
    totals: dict[str, set[int]] = {}
    for r in pdf.itertuples():
        totals.setdefault(r.method_a, set()).add(int(r.n_both + r.n_only_a))
        totals.setdefault(r.method_b, set()).add(int(r.n_both + r.n_only_b))
        assert r.n_both + r.n_only_a <= r.n_universe
        assert r.n_both + r.n_only_b <= r.n_universe
    for m, tots in totals.items():
        assert len(tots) == 1, f"method {m} disagrees across rows: {tots}"


def test_kmeans_elbow_curve_monotone_and_partitioned(spark, sf_dir):
    """More cells can only tighten the best-of-k fit on the same data
    (inertia non-increasing in k — each larger trained set is a better
    quantizer here), every cell is used, and cell counts partition the
    non-NULL universe at every k."""
    from reactionetl_etl_spark.plans.catalog import all_queries
    from reactionetl_etl_spark.sources.tables import load_table

    pdf = (
        all_queries()["kmeans_elbow_curve"].builder(spark, sf_dir)
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert list(pdf["k"]) == [2, 4, 8, 16]
    assert (pdf["inertia_q4"].diff().dropna() <= 0).all()
    assert (pdf["n_cells_used"] == pdf["k"]).all()
    n = load_table(spark, sf_dir, "embeddings").filter("embedding IS NOT NULL").count()
    assert (pdf["max_cell_rows"] >= (n + pdf["k"] - 1) // pdf["k"]).all()
    assert (pdf["min_cell_rows"] >= 1).all()
