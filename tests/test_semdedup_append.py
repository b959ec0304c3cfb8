"""Incremental SemDeDup maintenance (operators/semdedup.py::semdedup_append).

Controlled geometry: 4 axis-aligned unit centroids in dim 8 passed
explicitly (no training), so cell membership and every cosine are
hand-checkable. Near-dup construction: perturbations small enough to
stay within the 0.9 threshold of their seed and inside its cell.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.semdedup import semantic_dedup, semdedup_append

DIM = 8
CENTS = [[1.0 if i == c else 0.0 for i in range(DIM)] for c in range(4)]
THRESH = 0.9


def _vec(axis: int, jitter: float, seed: int) -> list[float]:
    rng = np.random.default_rng(seed)
    v = np.zeros(DIM)
    v[axis] = 1.0
    v = v + jitter * rng.normal(size=DIM)
    return [float(x) for x in (v / np.linalg.norm(v))]


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    # corpus: two docs per axis, mutually distinct (jitter 0.45 keeps
    # same-cell cosines below 0.9)
    corpus = [(100 + i, _vec(i % 4, 0.45, seed=i)) for i in range(8)]
    # batch: a near-copy of corpus row 100 (corpus_dup), two near-copies
    # of each other but far from the corpus (batch near-dup pair), two
    # unique rows, and a NULL embedding
    dup_of_corpus = [float(x) for x in (np.array(corpus[0][1]) + 0.01)]
    pair_seed = _vec(2, 0.45, seed=991)
    pair_twin = [float(x) for x in (np.array(pair_seed) + 0.01)]
    batch = [
        (200, dup_of_corpus),
        (201, pair_seed),
        (202, pair_twin),
        (203, _vec(1, 0.45, seed=777)),
        (204, _vec(3, 0.45, seed=778)),
        (205, None),
    ]
    kept = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    bat = spark.createDataFrame(batch, "vec_id long, embedding array<double>")
    return kept, bat


def test_append_verdicts_partition_the_batch(spark, corpus_and_batch):
    kept, bat = corpus_and_batch
    out = semdedup_append(kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
    pdf = out.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert sorted(pdf["vec_id"]) == [200, 201, 202, 203, 204, 205]
    by = dict(zip(pdf["vec_id"], pdf["origin"]))
    assert by[200] == "corpus_dup"
    assert {by[201], by[202]} == {"unique", "batch_dup"}  # one keeper
    assert by[203] == "unique" and by[204] == "unique"
    assert by[205] == "unique"  # NULL embedding keeps by convention
    null_row = pdf[pdf.vec_id == 205].iloc[0]
    assert null_row["keep"] and null_row["cell"] is None or np.isnan(null_row["cell"])


def test_append_provenance_points_at_real_duplicates(spark, corpus_and_batch):
    kept, bat = corpus_and_batch
    pdf = (
        semdedup_append(kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
        .toPandas()
    )
    row = pdf[pdf.vec_id == 200].iloc[0]
    assert row["dup_of"] == 100 and not row["keep"]
    dropped_twin = pdf[pdf.origin == "batch_dup"].iloc[0]
    keeper = pdf[(pdf.origin == "unique") & pdf.vec_id.isin([201, 202])].iloc[0]
    assert dropped_twin["dup_of"] == keeper["vec_id"]


def test_append_is_deterministic(spark, corpus_and_batch):
    kept, bat = corpus_and_batch
    cols = ["vec_id", "cell", "centroid_sim", "origin", "dup_of", "keep"]
    a = (
        semdedup_append(kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
        .toPandas()[cols].sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        semdedup_append(kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
        .toPandas()[cols].sort_values("vec_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_no_within_cell_threshold_pair_survives(spark, corpus_and_batch):
    kept, bat = corpus_and_batch
    pdf = (
        semdedup_append(kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
        .toPandas()
    )
    kept_batch = pdf[pdf.keep & pdf.cell.notna()]
    vecs = {r.vec_id: np.array(r.embedding) for r in kept.collect()}
    vecs.update(
        {r.vec_id: np.array(r.embedding) for r in bat.collect() if r.embedding}
    )
    cents = np.array(CENTS)

    def cell_of(v):
        u = v / np.linalg.norm(v)
        return int((cents @ u).argmax())

    final = list(vecs)  # corpus ids + all batch ids with vectors
    kept_final = [int(r.vec_id) for r in kept.collect()] + list(
        kept_batch["vec_id"].astype(int)
    )
    for i in kept_batch["vec_id"].astype(int):
        for j in kept_final:
            if i == j:
                continue
            vi, vj = vecs[i], vecs[j]
            if cell_of(vi) != cell_of(vj):
                continue  # SemDeDup compares within a cell only
            cos = float(vi @ vj / (np.linalg.norm(vi) * np.linalg.norm(vj)))
            assert cos < THRESH, f"kept pair {i},{j} at cosine {cos}"


def test_maintenance_loop_reappend_drops_everything(spark, corpus_and_batch):
    """Union kept batch rows into the corpus (the maintenance step),
    re-append the same batch: every row with a vector must now be a
    corpus_dup of its own kept copy (or of the keeper that shadowed
    it), so a replayed batch adds nothing — at-least-once delivery of
    append batches is safe."""
    kept, bat = corpus_and_batch
    first = semdedup_append(kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
    kept_ids = [int(r.vec_id) for r in first.filter("keep AND cell IS NOT NULL").collect()]
    corpus2 = kept.unionByName(bat.filter(F.col("vec_id").isin(kept_ids)))
    replay = semdedup_append(corpus2, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
    pdf = replay.toPandas()
    with_vec = pdf[pdf.cell.notna()]
    assert (with_vec["origin"] == "corpus_dup").all()
    assert not with_vec["keep"].any()


def test_full_dedup_unchanged_by_helper_refactor(spark, corpus_and_batch):
    """`_celled_frame` must be expression-identical to semantic_dedup's
    inline construction: verdicts under explicit centroids agree with
    the documented keeper rule on the controlled fixture."""
    kept, bat = corpus_and_batch
    allv = kept.unionByName(bat).filter(F.col("embedding").isNotNull())
    v = semantic_dedup(allv, dim=DIM, centroids=CENTS, threshold=THRESH)
    pdf = v.toPandas()
    assert len(pdf) == 13
    # the three near-dup relations (100~200, 201~202) resolve to one
    # keeper each; everything else is unique
    assert int((~pdf["keep"]).sum()) == 2


def test_append_cell_guard_refuses_loudly(spark, corpus_and_batch):
    """max_cell_rows must raise BEFORE scheduling the probe join when a
    cell exceeds the bound — the same instructive-refusal contract as
    semantic_dedup's guard."""
    kept, bat = corpus_and_batch
    with pytest.raises(ValueError, match="max_cell_rows"):
        semdedup_append(
            kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH, max_cell_rows=1
        )
    # generous bound passes through untouched
    out = semdedup_append(
        kept, bat, dim=DIM, centroids=CENTS, threshold=THRESH, max_cell_rows=1000
    )
    assert out.count() == 6


def test_arrow_cell_assignment_bit_identical_to_expression_path(spark, sf_dir):
    """r14: the celling stage moved from interpreted HOF folds to an
    Arrow/numpy pass (_cell_assign_arrow). The claim is BIT-identity,
    not approximate equality: the SQL folds are strict left-to-right
    IEEE accumulations, which np.add.accumulate reproduces exactly.
    Pin it by rebuilding the retired expression formulation inline and
    comparing every (cell, centroid_sim) AND every unit-vector
    component bit for bit on the real fixture embeddings."""
    import math
    import os

    from reactionetl_etl_spark.functions.vectors import dot, lit_double_array
    from reactionetl_etl_spark.operators.semdedup import _cell_assign_arrow
    from reactionetl_etl_spark.operators.similarity import train_ivf_centroids

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    centroids = train_ivf_centroids(emb, 8, "embedding", seed=42, max_iter=10)

    # retired formulation, verbatim
    norm = F.expr(
        "sqrt(aggregate(cast(embedding as array<double>),"
        " cast(0.0 as double), (a, y) -> a + y * y))"
    )
    v = F.expr("transform(cast(embedding as array<double>), x -> x / __n)")
    scores = F.array(*[dot(F.col("__v"), lit_double_array(c)) for c in centroids])
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    centroid_sim = F.round(F.array_max(scores), 6)
    old = (
        emb.filter(F.col("embedding").isNotNull())
        .select(F.col("vec_id").alias("__id"), norm.alias("__n"), F.col("embedding"))
        .select(F.col("__id"), v.alias("__v"))
        .select("__id", "__v", cell.alias("cell"), centroid_sim.alias("centroid_sim"))
    )
    new = _cell_assign_arrow(emb, centroids, "vec_id", "embedding")

    old_rows = {r["__id"]: r for r in old.collect()}
    new_rows = {r["__id"]: r for r in new.collect()}
    assert set(old_rows) == set(new_rows) and old_rows
    for k, o in old_rows.items():
        n = new_rows[k]
        assert o["cell"] == n["cell"], k
        assert (
            math.isnan(o["centroid_sim"]) and math.isnan(n["centroid_sim"])
        ) or o["centroid_sim"] == n["centroid_sim"], k
        assert all(
            a == b or (math.isnan(a) and math.isnan(b))
            for a, b in zip(o["__v"], n["__v"])
        ), k


def test_degenerate_embeddings_get_null_cell(spark):
    """r15 (ADVICE item): zero-norm, NULL-element, and NaN-element
    embeddings cannot sit on the unit sphere — the celling stage emits
    NULL cell / NULL centroid_sim / all-NULL unit vector for them, they
    are excluded from pair joins, and semantic_dedup keeps them (the
    NULL-vector convention). The retired HOF expression offered no
    usable alternative: under Spark 4 ANSI its x/0.0 RAISES
    DIVIDE_BY_ZERO on the zero-norm row, and NULL elements NULLed the
    row's scores anyway."""
    from reactionetl_etl_spark.operators.semdedup import _cell_assign_arrow

    emb = spark.createDataFrame(
        [
            (1, [0.0] * DIM),                       # zero norm
            (2, [1.0] + [None] * (DIM - 1)),        # NULL element
            (3, [float("nan")] + [1.0] * (DIM - 1)),  # NaN element
            (4, _vec(0, 0.1, seed=5)),              # healthy control
            (5, None),                               # NULL vector
        ],
        "vec_id long, embedding array<double>",
    )
    celled = {r["__id"]: r for r in _cell_assign_arrow(emb, CENTS, "vec_id", "embedding").collect()}
    assert set(celled) == {1, 2, 3, 4}  # NULL vector filtered upstream
    for bad in (1, 2, 3):
        assert celled[bad]["cell"] is None
        assert celled[bad]["centroid_sim"] is None
        assert all(x is None for x in celled[bad]["__v"])
        assert len(celled[bad]["__v"]) == DIM
    assert celled[4]["cell"] == 0 and celled[4]["centroid_sim"] is not None

    verdicts = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, dim=DIM, centroids=CENTS, threshold=THRESH
        ).collect()
    }
    assert set(verdicts) == {1, 2, 3, 4, 5}
    for vid in (1, 2, 3, 5):
        v = verdicts[vid]
        assert v["keep"] is True and v["cell"] is None and v["component"] is None
    assert verdicts[4]["keep"] is True and verdicts[4]["cell"] == 0


def test_append_against_persisted_state_matches_inline_celling(
    spark, corpus_and_batch, tmp_path
):
    """r15: `write_semdedup_state` + `kept_celled=` must produce
    verdicts identical to celling the kept frame inline — the persisted
    state is the same celled table (parquet round-trips doubles
    exactly; the partition column casts back to its int), so the probe
    join sees bit-identical incumbents. Degenerate incumbents (NULL
    cell) are dropped at write: a NULL key can never match the cell
    equi-join, so their absence is unobservable."""
    from reactionetl_etl_spark.operators.semdedup import (
        read_semdedup_state,
        write_semdedup_state,
    )

    kept, bat = corpus_and_batch
    # a degenerate incumbent exercises the drop-at-write rule
    kept_plus = kept.unionByName(
        spark.createDataFrame(
            [(900, [0.0] * DIM)], "vec_id long, embedding array<double>"
        )
    )
    path = str(tmp_path / "state")
    write_semdedup_state(kept_plus, path, CENTS)
    state = read_semdedup_state(spark, path)
    assert dict(state.dtypes)["cell"] == "int"

    cols = ["vec_id", "cell", "centroid_sim", "origin", "dup_of", "keep"]
    inline = (
        semdedup_append(kept_plus, bat, dim=DIM, centroids=CENTS, threshold=THRESH)
        .toPandas()[cols].sort_values("vec_id").reset_index(drop=True)
    )
    via_state = (
        semdedup_append(
            None, bat, dim=DIM, centroids=CENTS, threshold=THRESH,
            kept_celled=state,
        )
        .toPandas()[cols].sort_values("vec_id").reset_index(drop=True)
    )
    assert inline.equals(via_state)


def test_degenerate_batch_rows_survive_append(spark, corpus_and_batch):
    """Degenerate rows in an APPEND batch flow through both stages as
    unique keeps with NULL cell — never joined, never crashing the
    gram builds."""
    kept, _ = corpus_and_batch
    batch = spark.createDataFrame(
        [
            (300, [0.0] * DIM),
            (301, [None] * DIM),
            (302, _vec(2, 0.1, seed=31)),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in semdedup_append(
            kept, batch, dim=DIM, centroids=CENTS, threshold=THRESH
        ).collect()
    }
    assert set(out) == {300, 301, 302}
    for vid in (300, 301):
        assert out[vid]["origin"] == "unique" and out[vid]["keep"] is True
        assert out[vid]["cell"] is None and out[vid]["dup_of"] is None
