"""Geometry re-sign lifecycle for trained vector indexes (r14).

The train-once-append-forever sinks (`pq.write_ivfpq_index` +
`ivfpq_append_batch_writer`, `semdedup.semdedup_append`) deliberately
FREEZE their k-means geometry: appends must cell and code new batches
exactly like the existing partitions, so retraining on append is
forbidden. The cost of that discipline is drift — a corpus whose
distribution moves away from the trained sample piles rows into a few
cells (blowing up SemDeDup's per-cell quadratic term and IVF probe
selectivity) and pushes residuals beyond the codebook's trained
spread (silently degrading IVF-PQ recall). Three refusal guards in
this engine end with "re-sign the geometry with more cells"
(`semdedup.semantic_dedup`, `semdedup.semdedup_append`); this module
is the operator that actually performs it, plus the measurement that
tells users WHEN:

- `ivfpq_index_stats` — the drift tripwire: per-index occupancy skew
  and quantized-residual energy, computed from the CODES ALONE (one
  column-pruned scan of the m-bytes-per-vector index; the float
  corpus is never touched). Pure built-in expressions — the per-row
  decoded residual norm is m lookups into a literal norm table.
- `resign_ivfpq_index` — retrain at a new cell count under the SAME
  deterministic sample discipline as the original trainer, re-encode
  the full corpus, and write a complete new index (codes + both
  geometry sidecars + a version sidecar that records the lineage).
  The old index stays readable until the caller swaps paths — the
  atomic-publish discipline of `etl/commit.py`, applied to indexes.
- `resign_semdedup_verdicts` — the SemDeDup half: retrain the cell
  geometry on the KEPT corpus and re-cell an existing verdict table
  WITHOUT touching its keep/origin/dup_of columns — provenance is
  keyed by row id and ids survive a re-sign, so the keep-first
  monotonicity contract (`semdedup_append`) carries forward intact.

No reference analogue (`/root/reference/` is a CSV→PostgreSQL ETL,
SURVEY.md §2.13) — north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decoded_residual_norm_q4",
    "ivfpq_index_stats",
    "read_index_version",
    "resign_ivfpq_index",
    "resign_semdedup_verdicts",
]


def decoded_residual_norm_q4(codebook: list) -> Column:
    """⌊10⁴·‖decode(pq_code)‖² + 0.5⌋ as BIGINT — the squared norm of
    the reconstructed residual, per row, from the codes alone.

    PQ subspaces are disjoint, so ‖Σ_s book_s[code_s]‖² =
    Σ_s ‖book_s[code_s]‖²: precompute the m×k norm table once
    driver-side (a few KB of literals) and the per-row cost is m
    `element_at` lookups inside whole-stage codegen — no UDF, no
    Arrow, no float vectors read. Quantized to integer 10⁻⁴ units per
    ROW before any aggregation so downstream means are exact integer
    arithmetic (partition-order-independent, pinnable — the engine's
    standard protocol)."""
    norm_rows = []
    for book in codebook:
        norm_rows.append([float(sum(x * x for x in cent)) for cent in book])
    m = len(norm_rows)
    norms_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{v!r}D" for v in row) + ")" for row in norm_rows
        )
        + ")"
    )
    return F.expr(
        f"cast(floor(aggregate(sequence(0, {m - 1}), 0D,"
        f" (acc, s) -> acc + element_at(element_at({norms_lit}, s + 1),"
        f" element_at(pq_code, s + 1) + 1)) * 10000 + 0.5) as bigint)"
    )


def ivfpq_index_stats(spark, path: str, codebook: list | None = None) -> DataFrame:
    """One-row drift report over a persisted IVF-PQ index: occupancy
    skew (``imbalance_milli`` = 1000·max_cell/mean_cell — 1000 means
    perfectly balanced) and mean decoded-residual energy
    (``mean_resid_q4`` — grows as appends land farther from their
    trained centroids than the training sample did). Read these two
    numbers after each append wave; when imbalance or residual energy
    has grown materially past the post-train baseline, it is time for
    `resign_ivfpq_index` — this is the missing WHEN half of the
    train-once-append-forever contract.

    Cost: ONE scan of the codes table (m bytes/vector), all stats
    associative integer aggregates over ≤ n_cells groups. At 100 TB of
    floats the codes are ~0.8 TB and this is a narrow column scan."""
    from reactionetl_etl_spark.operators.pq import read_pq_codebook

    if codebook is None:
        codebook = read_pq_codebook(spark, path)
    codes = spark.read.parquet(f"{path}/codes").select(
        F.col("ivf_cell").cast("int").alias("ivf_cell"),
        decoded_residual_norm_q4(codebook).alias("__resid_q4"),
    )
    per_cell = codes.groupBy("ivf_cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__resid_q4").cast("bigint").alias("__resid_sum"),
    )
    return per_cell.agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells_used"),
        F.max("__n").cast("bigint").alias("max_cell_rows"),
        F.min("__n").cast("bigint").alias("min_cell_rows"),
        F.floor(1000.0 * F.max("__n") / (F.sum("__n") / F.count(F.lit(1))))
        .cast("bigint")
        .alias("imbalance_milli"),
        F.floor(F.sum("__resid_sum") / F.sum("__n")).cast("bigint").alias("mean_resid_q4"),
    )


def read_index_version(spark, path: str) -> int:
    """Version of a `resign_ivfpq_index` lineage: 0 for a fresh
    `write_ivfpq_index` layout (no version sidecar), else the stored
    version number."""
    try:
        rows = spark.read.parquet(f"{path}/version").collect()
    except Exception:
        return 0
    return int(rows[0]["version"]) if rows else 0


def resign_ivfpq_index(
    embeddings: DataFrame,
    dim: int,
    src_path: str,
    dest_path: str,
    n_cells: int,
    m: int | None = None,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list, list]:
    """Re-sign a persisted IVF-PQ index at a new cell count: retrain
    BOTH the coarse centroids and the residual codebook on
    ``embeddings`` (the source-of-truth vectors — PQ codes are lossy,
    so geometry can never be retrained from the index itself) with the
    SAME deterministic bounded-sample discipline as the original
    trainer (`pq.train_ivfpq_geometry`: TakeOrdered sample, fixed
    seed), re-encode the full corpus, and write a COMPLETE new index
    at ``dest_path`` — codes partitioned by the new cells plus both
    geometry sidecars, so every existing reader
    (`read_ivfpq_geometry`, `probe_ivfpq_index`, the append writers)
    works on the result unchanged.

    ``m``/``k`` default to the source index's stored codebook shape —
    a re-sign changes the PARTITIONING dial, not the code budget,
    unless explicitly asked. A ``version`` sidecar records lineage
    (source version + 1, the source path, and the geometry dials) so
    operational tooling can tell a re-signed index from a fresh one.

    The source index is NOT touched: publish-then-swap is the caller's
    move (point probes/appends at ``dest_path``, then delete the old
    lineage), mirroring `etl/commit.py`'s staged-commit discipline —
    a crash mid-re-sign leaves the old index fully serviceable.

    Determinism: same corpus + same dials ⇒ bit-identical geometry to
    a fresh `write_ivfpq_index` at those dials (the roundtrip parity
    test pins probe-result equality), so a re-sign is exactly "what a
    fresh train would have built", never a third kind of index.
    """
    import pandas as pd

    from reactionetl_etl_spark.operators.pq import (
        read_pq_codebook,
        write_ivfpq_index,
    )

    spark = embeddings.sparkSession
    src_book = read_pq_codebook(spark, src_path)
    if m is None:
        m = len(src_book)
    if k is None:
        k = len(src_book[0])
    centroids, codebook = write_ivfpq_index(
        embeddings,
        dim,
        dest_path,
        n_cells=n_cells,
        m=m,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        mode="overwrite",
    )
    version = read_index_version(spark, src_path) + 1
    meta = pd.DataFrame(
        [
            {
                "version": version,
                "parent_path": src_path,
                "n_cells": n_cells,
                "m": m,
                "k": k,
            }
        ]
    )
    spark.createDataFrame(meta).select(
        F.col("version").cast("int"),
        F.col("parent_path").cast("string"),
        F.col("n_cells").cast("int"),
        F.col("m").cast("int"),
        F.col("k").cast("int"),
    ).repartition(1).write.mode("overwrite").parquet(f"{dest_path}/version")
    return centroids, codebook


def resign_semdedup_verdicts(
    verdicts: DataFrame,
    embeddings: DataFrame,
    dim: int,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[list, DataFrame]:
    """Re-sign the SemDeDup cell geometry while carrying keep/drop
    provenance forward — the move `semdedup_append`'s refusal guard
    instructs ("re-sign the geometry with more cells") when a cell's
    kept population outgrows ``max_cell_rows``.

    Trains new centroids on the KEPT rows only (the live corpus —
    dropped rows are gone from every future probe, so they should not
    pull centroids), then re-cells EVERY verdict row under the new
    geometry: ``cell`` and ``centroid_sim`` are recomputed
    (`semdedup._celled_frame`, the same expression the dedup paths
    use, so future `semdedup_append(centroids=new)` calls agree
    bit-for-bit), while ``keep``/``origin``/``dup_of`` pass through
    untouched — provenance is keyed by id and ids survive a re-sign,
    so corpus membership stays exactly as shipped (the keep-first
    monotonicity contract is preserved by construction, not re-derived).

    Returns (new_centroids, re-celled verdicts with the same schema).
    Rows whose embedding is NULL (or absent from ``embeddings``) keep
    NULL cell/centroid_sim — `semantic_dedup`'s convention."""
    from reactionetl_etl_spark.operators.semdedup import _celled_frame
    from reactionetl_etl_spark.operators.similarity import train_ivf_centroids

    kept_ids = verdicts.filter(F.col("keep")).select(F.col(id_col))
    kept_vecs = embeddings.join(kept_ids, on=id_col, how="left_semi")
    centroids = train_ivf_centroids(
        kept_vecs, n_cells=n_cells, vec_col=vec_col, seed=seed
    )
    recelled = _celled_frame(embeddings, centroids, id_col, vec_col).select(
        F.col("__id").alias(id_col),
        F.col("cell").alias("__new_cell"),
        F.col("centroid_sim").alias("__new_sim"),
    )
    out = (
        verdicts.drop("cell", "centroid_sim")
        .join(recelled, on=id_col, how="left")
        .withColumnRenamed("__new_cell", "cell")
        .withColumnRenamed("__new_sim", "centroid_sim")
    )
    # restore the verdict schema's column order
    cols = [id_col, "cell", "centroid_sim"] + [
        c for c in verdicts.columns if c not in (id_col, "cell", "centroid_sim")
    ]
    return centroids, out.select(*cols)
