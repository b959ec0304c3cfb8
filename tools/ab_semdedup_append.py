"""Interleaved A/B for the r15 semdedup_append change: OLD timed region
(cell the kept corpus inline + re-cell survivors, the r14 bench scope)
vs NEW (probe the persisted celled state, batch celled once). Alternates
arms within one session so both see identical host load.

Usage: python tools/ab_semdedup_append.py [pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reactionetl_etl_spark.operators import similarity as S
from reactionetl_etl_spark.operators.semdedup import (
    read_semdedup_state,
    semantic_dedup,
    semdedup_append,
    write_semdedup_state,
)
from reactionetl_etl_spark.session import get_spark

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("ab-semdedup-append", **{"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
base = emb.filter(F.col("vec_id") % 4 != 0)
batch = emb.filter(F.col("vec_id") % 4 == 0)
cents = S.train_ivf_centroids(base, 8)
base_v = semantic_dedup(base, dim=64, n_cells=8, threshold=0.40, centroids=cents)
kept = base.join(
    base_v.filter(F.col("keep")).select("vec_id"), "vec_id"
).localCheckpoint(eager=True)

work = tempfile.mkdtemp(prefix="ab_semdedup_")
state_path = os.path.join(work, "state")
write_semdedup_state(kept, state_path, cents)
state = read_semdedup_state(spark, state_path)


def _append_r14(kept, batch, dim, centroids, threshold, id_col="vec_id", vec_col="embedding"):
    """The r14 semdedup_append body, verbatim: cells the kept corpus
    inline AND re-cells survivors inside the inner semantic_dedup."""
    from reactionetl_etl_spark.functions.vectors import dot
    from reactionetl_etl_spark.operators.semdedup import _celled_frame

    kc = _celled_frame(kept, centroids, id_col, vec_col).localCheckpoint(eager=True)
    bc = _celled_frame(batch, centroids, id_col, vec_col).localCheckpoint(eager=True)
    hits = (
        bc.select(F.col("__id").alias("__bid"), F.col("__v").alias("__bv"), "cell")
        .join(
            kc.select(F.col("__id").alias("__kid"), F.col("__v").alias("__kv"), "cell"),
            on="cell",
        )
        .withColumn("__sim", dot(F.col("__bv"), F.col("__kv")))
        .filter(F.col("__sim") >= threshold)
    )
    corpus_dups = hits.groupBy("__bid").agg(
        F.max_by("__kid", F.struct(F.col("__sim"), (-F.col("__kid")).alias("__nk")))
        .alias("dup_of")
    )
    survivors = batch.join(
        corpus_dups.select(F.col("__bid").alias(id_col)), on=id_col, how="left_anti"
    )
    inner = semantic_dedup(
        survivors, dim=dim, centroids=centroids, threshold=threshold,
        id_col=id_col, vec_col=vec_col,
    )
    keepers = (
        inner.filter(F.col("keep") & F.col("component").isNotNull())
        .select("component", F.col(id_col).alias("__keeper"))
    )
    inner_v = (
        inner.join(keepers, on="component", how="left")
        .select(
            F.col(id_col), "cell", "centroid_sim",
            F.when(F.col("keep"), F.lit("unique")).otherwise(F.lit("batch_dup")).alias("origin"),
            F.when(F.col("keep"), F.lit(None).cast("long"))
            .otherwise(F.col("__keeper").cast("long")).alias("dup_of"),
            "keep",
        )
    )
    corpus_v = (
        bc.join(corpus_dups, bc["__id"] == corpus_dups["__bid"], "inner")
        .select(
            F.col("__id").alias(id_col), "cell", "centroid_sim",
            F.lit("corpus_dup").alias("origin"),
            F.col("dup_of").cast("long"), F.lit(False).alias("keep"),
        )
    )
    return inner_v.unionByName(corpus_v)


def run_old():
    _append_r14(kept, batch, dim=64, centroids=cents, threshold=0.40).write.format(
        "noop"
    ).mode("overwrite").save()


def run_new():
    semdedup_append(
        None, batch, dim=64, centroids=cents, threshold=0.40, kept_celled=state
    ).write.format("noop").mode("overwrite").save()


run_old(); run_new()  # untimed warmup of both shapes
old_t, new_t = [], []
for _ in range(PAIRS):
    t0 = time.perf_counter(); run_old(); old_t.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run_new(); new_t.append(time.perf_counter() - t0)
print("old:", [round(t, 3) for t in old_t], "median", round(statistics.median(old_t), 3))
print("new:", [round(t, 3) for t in new_t], "median", round(statistics.median(new_t), 3))
import shutil

shutil.rmtree(work, ignore_errors=True)
spark.stop()
