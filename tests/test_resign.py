"""Geometry re-sign lifecycle (operators/resign.py, r14).

The r13 verdict's item 4: three refusal guards instruct "re-sign the
geometry with more cells" but nothing performed it. These tests pin
the contracts the module ships:

- re-sign ≡ fresh train (probe-result parity at equal recall budget),
- versioned lineage sidecar,
- drift tripwire readings move the documented direction under a
  distribution-shifted append,
- SemDeDup provenance (keep/origin/dup_of) carries through a re-sign
  untouched while cells re-derive under the new geometry.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.pq import (
    read_ivfpq_geometry,
    write_ivfpq_index,
)
from reactionetl_etl_spark.operators.resign import (
    ivfpq_index_stats,
    read_index_version,
    resign_ivfpq_index,
    resign_semdedup_verdicts,
)


def _clustered(spark, n=240, dim=32, seed=11, n_centers=4, spread=0.25, offset=0.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_centers, dim)) + offset
    rows = [
        (
            i,
            [float(x) for x in centers[i % n_centers] + rng.normal(0, spread, dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_resign_equals_fresh_train_probe_parity(spark, tmp_path):
    """resign_ivfpq_index(corpus, ..., n_cells=C) must build the SAME
    index a fresh write_ivfpq_index(corpus, n_cells=C) would — same
    deterministic trainer, same sample discipline — so probe results
    are identical row-for-row at any probe budget."""
    from reactionetl_etl_spark.operators.pq import probe_ivfpq_index

    df, rows = _clustered(spark)
    src = str(tmp_path / "v0")
    fresh = str(tmp_path / "fresh")
    dst = str(tmp_path / "v1")
    write_ivfpq_index(df, dim=32, path=src, n_cells=4, m=8, k=16)
    resign_ivfpq_index(df, dim=32, src_path=src, dest_path=dst, n_cells=8)
    write_ivfpq_index(df, dim=32, path=fresh, n_cells=8, m=8, k=16)

    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[:6]], "query_id long, embedding array<double>"
    )
    outs = []
    for path in (dst, fresh):
        cents, book = read_ivfpq_geometry(spark, path)
        outs.append(
            sorted(
                map(
                    tuple,
                    probe_ivfpq_index(
                        qs, spark.read.parquet(f"{path}/codes"), cents, book,
                        k=5, n_probe=3,
                    ).collect(),
                )
            )
        )
    assert outs[0] == outs[1]


def test_resign_version_lineage_and_mk_defaults(spark, tmp_path):
    df, _ = _clustered(spark, n=150)
    src = str(tmp_path / "v0")
    dst = str(tmp_path / "v1")
    dst2 = str(tmp_path / "v2")
    write_ivfpq_index(df, dim=32, path=src, n_cells=4, m=8, k=16)
    assert read_index_version(spark, src) == 0
    cents, book = resign_ivfpq_index(df, dim=32, src_path=src, dest_path=dst, n_cells=8)
    assert read_index_version(spark, dst) == 1
    # m/k default to the SOURCE codebook's shape
    assert len(book) == 8 and len(book[0]) == 16
    assert len(cents) == 8
    resign_ivfpq_index(df, dim=32, src_path=dst, dest_path=dst2, n_cells=16)
    assert read_index_version(spark, dst2) == 2
    meta = spark.read.parquet(f"{dst2}/version").collect()[0]
    assert meta["parent_path"] == dst and meta["n_cells"] == 16
    # the source index is untouched (publish-then-swap discipline)
    assert read_index_version(spark, src) == 0
    assert spark.read.parquet(f"{src}/codes").count() == 150


def test_drift_stats_move_under_shifted_append_and_recover(spark, tmp_path):
    """The tripwire direction: a distribution-shifted append under
    stored geometry raises BOTH occupancy skew and residual energy;
    a re-sign at more cells brings residual energy back down and uses
    the new cells (the skew a tight real cluster keeps is correct)."""
    base, _ = _clustered(spark, n=200, seed=11)
    shifted_raw, _ = _clustered(spark, n=100, seed=12, offset=3.0, spread=0.1)
    shifted = shifted_raw.select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    src = str(tmp_path / "v0")
    dst = str(tmp_path / "v1")
    write_ivfpq_index(base, dim=32, path=src, n_cells=4, m=8, k=16)
    trained = ivfpq_index_stats(spark, src).collect()[0]
    cents, book = read_ivfpq_geometry(spark, src)
    write_ivfpq_index(
        shifted, dim=32, path=src, centroids=cents, codebook=book, mode="append"
    )
    after = ivfpq_index_stats(spark, src).collect()[0]
    assert after["n_rows"] == 300
    assert after["imbalance_milli"] > trained["imbalance_milli"]
    assert after["mean_resid_q4"] > trained["mean_resid_q4"]

    resign_ivfpq_index(
        base.unionByName(shifted), dim=32, src_path=src, dest_path=dst, n_cells=8
    )
    resigned = ivfpq_index_stats(spark, dst).collect()[0]
    assert resigned["n_cells_used"] > after["n_cells_used"]
    assert resigned["mean_resid_q4"] < after["mean_resid_q4"]


def test_resign_semdedup_carries_provenance_and_recells(spark):
    """Keep/origin/dup_of survive a re-sign bit-for-bit; cell and
    centroid_sim re-derive under the new geometry; the kept set is
    EXACTLY the pre-resign kept set (monotonicity carried, not
    re-elected)."""
    from reactionetl_etl_spark.operators.semdedup import semantic_dedup

    df, _ = _clustered(spark, n=160, dim=16, seed=5, spread=0.6)
    verdicts = semantic_dedup(df, dim=16, n_cells=2, threshold=0.97).localCheckpoint()
    before = {
        r["vec_id"]: (r["keep"], r["origin"] if "origin" in verdicts.columns else None)
        for r in verdicts.select("vec_id", "keep", *[
            c for c in ("origin",) if c in verdicts.columns
        ]).collect()
    }
    new_cents, recelled = resign_semdedup_verdicts(verdicts, df, dim=16, n_cells=8)
    assert len(new_cents) == 8
    assert recelled.columns == verdicts.columns
    after = {r["vec_id"]: r for r in recelled.collect()}
    assert set(after) == set(before)
    for vid, (keep, _origin) in before.items():
        assert after[vid]["keep"] == keep, vid
    # cells re-derived under the new geometry: every non-null cell is
    # a valid index into the 8-cell geometry, and >2 cells are in use
    cells = {after[v]["cell"] for v in after if after[v]["cell"] is not None}
    assert cells <= set(range(8)) and len(cells) > 2
    # re-celling agrees with the celling expression future appends use
    from reactionetl_etl_spark.operators.semdedup import _celled_frame

    expect = {
        r["__id"]: (r["cell"], r["centroid_sim"])
        for r in _celled_frame(df, new_cents, "vec_id", "embedding").collect()
    }
    for vid, (cell, sim) in expect.items():
        assert after[vid]["cell"] == cell
        assert after[vid]["centroid_sim"] == pytest.approx(sim)
