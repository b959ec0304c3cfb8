"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169 — public method, used to pick pretraining data that
matches a target distribution, e.g. "more like Wikipedia").

The estimator is deliberately cheap at 100 TB: documents are reduced to
HASHED BIGRAM features (a bag of buckets), the target and raw corpora
each get a smoothed unigram-over-buckets distribution, and a document's
importance weight is the sum of per-bucket log-likelihood ratios

    log w(doc) = Σ_{g ∈ bigrams(doc)} [ log p_target(bucket(g))
                                      − log p_raw(bucket(g)) ]

Selection then keeps documents with the highest weights (or resamples
proportionally; `split.weighted_sample_hash` composes for that step).

Spark shape: two bucket-keyed counts (the feature tables are at most
``n_buckets`` rows — broadcastable by construction, independent of
corpus size), then one gram-explode over the corpus joined against the
broadcast ratio table and a doc-keyed sum. Shuffles are keyed on
bucket ids and doc ids only; text never moves. Deterministic: the
bucket hash is the md5-prefix convention every cross-engine operator
here uses (`split.split_bucket`), so weights reproduce bit-for-bit
across sessions and engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.text import token_ngrams


def _bucketed_grams(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    g = token_ngrams(df.select(id_col, text_col), text_col, 2)
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )
    return g.select(F.col(id_col), bucket.alias("bucket"))


def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    smoothing: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, log_weight) per corpus document — higher means
    "more like the target distribution". ``smoothing`` is the additive
    (Lidstone) pseudo-count per bucket, so unseen buckets contribute a
    finite, constant ratio instead of -inf."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    tg = _bucketed_grams(target, id_col, text_col, n_buckets)
    rg = _bucketed_grams(corpus, id_col, text_col, n_buckets)

    tc = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    rc = rg.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    # scalar totals: two tiny actions over bucket-sized aggregates
    t_total = tc.agg(F.sum("tc")).first()[0] or 0
    r_total = rc.agg(F.sum("rc")).first()[0] or 0
    t_den = math.log(t_total + smoothing * n_buckets)
    r_den = math.log(r_total + smoothing * n_buckets)

    ratio = (
        tc.join(rc, on="bucket", how="full_outer")
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(smoothing))
                - F.lit(t_den)
                - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(smoothing))
                + F.lit(r_den)
            ).alias("log_ratio"),
        )
    )
    # buckets observed in NEITHER corpus contribute log(s)-t_den-log(s)+r_den
    default_ratio = r_den - t_den
    return (
        rg.join(F.broadcast(ratio), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("log_ratio"), F.lit(default_ratio))).alias(
                "log_weight"
            ),
        )
    )


def write_dsir_model(
    corpus: DataFrame,
    target: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    smoothing: float = 0.5,
    mode: str = "overwrite",
) -> None:
    """Persist the per-bucket log-likelihood-ratio table (plus the
    unseen-bucket default as a bucket=-1 sentinel row) — the trained
    DSIR model. The sign-once discipline every persisted index here
    follows: the target/raw distributions are estimated ONCE at build
    time, then any stream of new documents scores against the stored
    n_buckets-row table without touching either corpus again."""
    tg = _bucketed_grams(target, id_col, text_col, n_buckets)
    rg = _bucketed_grams(corpus, id_col, text_col, n_buckets)
    tc = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    rc = rg.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    t_total = tc.agg(F.sum("tc")).first()[0] or 0
    r_total = rc.agg(F.sum("rc")).first()[0] or 0
    t_den = math.log(t_total + smoothing * n_buckets)
    r_den = math.log(r_total + smoothing * n_buckets)
    ratio = tc.join(rc, on="bucket", how="full_outer").select(
        "bucket",
        (
            F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(smoothing))
            - F.lit(t_den)
            - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(smoothing))
            + F.lit(r_den)
        ).alias("log_ratio"),
    )
    default = corpus.sparkSession.createDataFrame(
        [(-1, r_den - t_den)], "bucket bigint, log_ratio double"
    )
    ratio.unionByName(default).write.mode(mode).parquet(path)


def score_with_dsir_model(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Score NEW documents against a persisted DSIR model — one gram
    explode joined to the broadcast n_buckets-row table, doc-keyed
    sum. ``n_buckets`` must match the model's build value (the bucket
    hash is part of the model contract). Scores for documents whose
    grams all existed at build time equal `dsir_log_weights` exactly;
    genuinely new grams fall back to the model's unseen-bucket row."""
    g = _bucketed_grams(df, id_col, text_col, n_buckets)
    default = model.filter(F.col("bucket") == -1).select(
        F.col("log_ratio").alias("__default")
    )
    real = model.filter(F.col("bucket") != -1)
    return (
        g.join(F.broadcast(real), on="bucket", how="left")
        .join(F.broadcast(default))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("log_ratio"), F.col("__default"))).alias("log_weight"),
        )
    )
