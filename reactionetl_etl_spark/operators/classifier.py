"""fastText-style linear text classifier, trained INSIDE Spark.

Extension beyond the reference (SURVEY.md §2.13 north-star scope): the
standard web-corpus curation recipe (CCNet, GPT-3, LLaMA data pipelines
— all public) trains a cheap linear classifier ("does this look like
the high-quality seed corpus?") and keeps documents by score. The
engine therefore needs in-situ training, not just scoring: at 100 TB
the feature matrix never fits anywhere but the cluster.

Model: logistic regression over HASHED UNIGRAM term frequencies plus
three engineered document-statistic features (log-length, unique-token
ratio, mean token length — the same signals rule-based Gopher filters
threshold on, so heuristic verdicts distill into the classifier), with
a bias. Full-batch gradient descent, fixed iteration count and
learning rate — small, deterministic, and distillable to a
broadcastable weight table.

Spark shape, and why it holds at 100 TB:
- featurization happens ONCE: one token explode + doc-keyed aggregates
  into a cached (doc, bucket, x) sparse table. Shuffles are keyed on
  doc ids and bucket ids only; text never moves after tokenization.
- each iteration is ONE action: a doc-keyed decimal dot product
  against the BROADCAST weight table (n_buckets+4 rows by
  construction, corpus-size-independent), a per-row sigmoid, and a
  bucket-keyed gradient sum (bias rides along as feature bucket -1).
  The driver only ever sees n_buckets+4 numbers per iteration.
- scoring new data is one broadcast join + doc-keyed sum — the same
  probe-a-persisted-model discipline as the MinHash/IVF/DSIR indexes
  (`write_classifier_model` / `score_with_classifier_model`).

Determinism (what makes the pinned oracle stable): iterative float
training AMPLIFIES low-bit drift — a plain double gradient sum would
diverge between local[32] and the driver's session within a few
iterations. Every cross-row sum here is therefore DECIMAL: features
quantize to DECIMAL(20,10), weights are DECIMAL(20,10) literals, and
per-doc margins / per-bucket gradients fold as exact decimal sums —
order-independent under any partitioning. The only float steps
(sigmoid, the driver-side update) are per-row or single-threaded, then
re-quantized. The result is a bit-identical model for ANY cluster
layout, iteration after iteration.

The bucket hash is the md5-prefix convention shared by every
cross-engine operator here (operators/split.py::split_bucket), so the
feature space reproduces bit-for-bit across engines too.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_Q10 = Decimal("0.0000000001")  # weight / feature quantum (1e-10)
_W_TYPE = "decimal(20,10)"
_ERR_TYPE = "decimal(16,12)"

# engineered doc-stat feature buckets live ABOVE the hash range;
# bias is bucket -1 (feature value 1.0 on every doc)
_BIAS = -1


def hashed_tf_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 128,
    salt: str = "clf",
) -> DataFrame:
    """(id, bucket, x) sparse features, quantized to DECIMAL(20,10):
    hashed-unigram term frequencies in buckets [0, n_buckets), three
    doc-stat features at n_buckets+0..2 (log1p(tokens)/8, unique-token
    ratio, mean token length / 10 — all ~[0,1]-scaled), and the bias
    at bucket -1. One explode + doc-keyed aggregates; ≤
    min(doc_tokens, n_buckets) + 4 rows per doc."""
    norm = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    toks = df.select(id_col, F.explode(norm).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("tok"))), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )
    counts = (
        toks.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lens = counts.groupBy(id_col).agg(F.sum("cnt").alias("len"))
    tf = counts.join(lens, on=id_col).select(
        id_col,
        "bucket",
        F.round(F.col("cnt") / F.col("len"), 10).cast(_W_TYPE).alias("x"),
    )

    t = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    n_tokens = F.size(t)
    uniq_ratio = F.size(F.array_distinct(t)).cast("double") / F.greatest(n_tokens, F.lit(1))
    mean_len = F.aggregate(t, F.lit(0.0), lambda a, x: a + F.length(x)) / F.greatest(
        n_tokens, F.lit(1)
    )
    # stat features are CENTERED by fixed constants (not data statistics
    # — keeps featurization stateless/streaming-safe) so the bias does
    # not have to absorb their means, and SCALED x4 so their dynamic
    # range rivals the tf features' and GD converges in few rounds
    stats = df.select(
        id_col,
        F.array(
            F.struct(F.lit(n_buckets).cast("bigint").alias("bucket"),
                     F.round((F.log1p(n_tokens) / 8.0 - 0.5) * 4.0, 10).cast(_W_TYPE).alias("x")),
            F.struct(F.lit(n_buckets + 1).cast("bigint").alias("bucket"),
                     F.round((uniq_ratio - 0.5) * 4.0, 10).cast(_W_TYPE).alias("x")),
            F.struct(F.lit(n_buckets + 2).cast("bigint").alias("bucket"),
                     F.round((mean_len / 10.0 - 0.5) * 4.0, 10).cast(_W_TYPE).alias("x")),
            F.struct(F.lit(_BIAS).cast("bigint").alias("bucket"),
                     F.lit(1).cast(_W_TYPE).alias("x")),
        ).alias("fs"),
    ).select(id_col, F.explode("fs").alias("f")).select(
        id_col, F.col("f.bucket").alias("bucket"), F.col("f.x").alias("x")
    )
    return tf.unionByName(stats)


def n_features(n_buckets: int) -> int:
    """Total learned weights excluding bias: hash range + 3 stats."""
    return n_buckets + 3


def _weights_df(spark: SparkSession, w: dict[int, Decimal]) -> DataFrame:
    return spark.createDataFrame(
        [(b, wb) for b, wb in sorted(w.items())], f"bucket bigint, w {_W_TYPE}"
    )


def margins(feat: DataFrame, weights: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, z) per-doc raw margin (bias included — it is feature
    bucket -1): broadcast-join the weight table, fold x·w as an exact
    decimal sum."""
    return (
        feat.join(F.broadcast(weights), on="bucket", how="left")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0).cast(_W_TYPE))).alias("zd"))
        .select(id_col, F.col("zd").cast("double").alias("z"))
    )


def train_text_classifier(
    df: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
    n_buckets: int = 128,
    iters: int = 10,
    lr: float = 4.0,
    salt: str = "clf",
    balanced: bool = True,
) -> dict[int, Decimal]:
    """Fit the classifier; returns {bucket: weight} (bias at -1) as
    exact Decimals. ``labels`` is (id, y∈{0,1}). Full-batch GD:
    ``iters`` rounds of ONE map-side-combinable aggregate each over the
    cached feature table. ``balanced`` scales each class's error by the
    inverse class frequency (curation labels are usually lopsided —
    majority-keep corpora otherwise teach the model to predict
    "keep" everywhere)."""
    spark = df.sparkSession
    feat = hashed_tf_features(df, id_col, text_col, n_buckets, salt).cache()
    lab = labels.select(id_col, F.col(label_col).cast("double").alias("__y"))
    n = lab.count()
    if n == 0:
        raise ValueError("empty training set")
    if balanced:
        n_pos = lab.filter(F.col("__y") == 1.0).count()
        n_neg = n - n_pos
        if n_pos == 0 or n_neg == 0:
            raise ValueError("balanced training needs both classes present")
        # exact rationals n/(2*n_pos), n/(2*n_neg) — class-weighted so
        # each class contributes half the total gradient mass
        wt = F.when(F.col("__y") == 1.0, F.lit(float(n) / (2.0 * n_pos))).otherwise(
            F.lit(float(n) / (2.0 * n_neg))
        )
    else:
        wt = F.lit(1.0)

    w: dict[int, Decimal] = {b: Decimal(0) for b in range(n_buckets + 3)}
    w[_BIAS] = Decimal(0)
    step = Decimal(str(lr)) / Decimal(n)
    for _ in range(iters):
        z = margins(feat, _weights_df(spark, w), id_col)
        err = lab.join(z, on=id_col, how="inner").select(
            id_col,
            F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("__y")) * wt,
                12,
            )
            .cast(_ERR_TYPE)
            .alias("e"),
        )
        grad_rows = (
            feat.join(err, on=id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("e")).alias("g"))
            .collect()
        )
        for row in grad_rows:
            g = row["g"]
            if g is not None:
                b = row["bucket"]
                w[b] = (w[b] - step * g).quantize(_Q10, rounding=ROUND_HALF_UP)
    feat.unpersist()
    return w


def score_text(
    df: DataFrame,
    w: dict[int, Decimal],
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "clf",
) -> DataFrame:
    """(id, score) sigmoid quality score per document — one explode,
    one broadcast join, one doc-keyed sum. Every doc carries the bias
    feature, so the margin is always defined."""
    n_buckets = max(b for b in w) - 2  # stats occupy the top 3 slots
    feat = hashed_tf_features(df, id_col, text_col, n_buckets, salt)
    z = margins(feat, _weights_df(df.sparkSession, w), id_col)
    return z.select(
        id_col,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias("score"),
    )


def write_classifier_model(w: dict[int, Decimal], path: str, spark: SparkSession) -> None:
    """Persist the model as a tiny parquet weight table (bias at
    bucket -1): sign once, score any future batch without the training
    corpus — the same discipline as the persisted DSIR/MinHash/IVF
    models."""
    # repartition(1), not coalesce(1): coalesce serializes the Python
    # local relation's partition evaluations into one ~4.5 s task (r12)
    _weights_df(spark, w).repartition(1).write.mode("overwrite").parquet(path)


def read_classifier_model(path: str, spark: SparkSession) -> dict[int, Decimal]:
    return {r["bucket"]: r["w"] for r in spark.read.parquet(path).collect()}


def score_with_classifier_model(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "clf",
) -> DataFrame:
    return score_text(df, read_classifier_model(path, df.sparkSession), id_col, text_col, salt)
