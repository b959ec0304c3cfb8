"""Keyword retrieval over the document corpus: BM25 scoring, the
classic lexical-search ranking (Robertson/Spärck Jones probabilistic
relevance framework — public literature), done Spark-first.

Why it belongs in a training-data engine: corpus curation constantly
answers "find the documents about X" (targeted inspection, eval-set
mining, topic pruning), and embedding ANN answers it semantically
while BM25 answers it lexically — the two retrievers complement each
other and share the top-k plumbing.

Spark shape: ONE pass builds per-(doc, term) tf for the query's terms
only (a tiny filter pushed into the token explode — never a full
vocabulary aggregation), document length comes from the same pass, and
the corpus constants (N, avgdl, per-term df) are one rollup-sized
aggregate broadcast back into the scoring expression. Scoring is pure
JVM expression math; the final top-k plans as TakeOrderedAndProject.
At 100 TB, a REPEATED-query workload persists the (term, doc, tf)
posting table partitioned by a term-hash bucket instead — same
algebra, index amortized; this module is the scan-time path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(text_col) -> "F.Column":
    """The engine's shared normalization: lowercase, collapse
    whitespace, split — identical to `operators/text.py::tokens` (kept
    expression-level so the filter pushes inside the explode)."""
    return F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of ``query_terms``.

        idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )   (Lucene's
                      non-negative variant)
        score(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

    Output: (id, bm25, n_hit_terms), score floor-rounded at 6 decimals
    (the engine's cross-engine convention), ties by ascending id.
    Documents matching no term never enter the aggregation."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    toks = docs.select(
        F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    # per-doc length from the same normalization (separate cheap pass —
    # a count per doc, map-side combined)
    dl = docs.select(
        F.col(id_col), F.size(_terms(F.col(text_col))).alias("dl")
    )
    hits = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus constants: one rollup-sized aggregate each, broadcast back
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = hits.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum(contrib).alias("__s"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    bm25 = F.floor(F.col("__s") * 1_000_000 + F.lit(0.5)) / 1_000_000
    return (
        scored.select(F.col(id_col), bm25.alias("bm25"), "n_hit_terms")
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def write_posting_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist the inverted index for repeated-query BM25: one row per
    (term, doc, tf), parquet PARTITIONED BY a deterministic term-hash
    bucket, plus a 1-row corpus-stats sidecar (N, avgdl) and a per-term
    df table. Tokenize once, query forever — a probe reads only the
    partitions its query terms hash into (dynamic partition pruning),
    ~n_terms/n_buckets of the index instead of re-tokenizing the corpus
    per query. ``mode='append'`` grows the index with new documents
    (the bucket function is a pure hash, so old and new batches
    partition consistently) — but the stats/df sidecars describe ONLY
    the last written batch's fold; rebuild them for exact idf after
    appends (documented trade, same as any incremental df statistic)."""
    toks = docs.select(F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    bucket = F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    dl = docs.select(F.col(id_col), F.size(_terms(F.col(text_col))).alias("dl"))
    tf.join(dl, id_col).withColumn("bucket", bucket).write.mode(mode).partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")
    dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/stats")
    tf.groupBy("term").agg(F.countDistinct(id_col).alias("df")).withColumn(
        "bucket", bucket
    ).write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/df")


def probe_posting_index(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k against a `write_posting_index` layout: query terms
    hash to their buckets, so the postings/df scans read only those
    partitions (the probe's PushedFilters carry bucket AND term).
    Identical scoring algebra to `bm25_topk` — probing the index
    returns exactly what the scan-time path computes."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    # bucket ids of the query terms: one 0-task-shuffle job over a
    # |terms|-row literal frame (xxhash64 is JVM-side; this keeps the
    # probe's bucket function bit-identical to the writer's) → STATIC
    # partition pruning on the postings/df scans
    buckets = [
        r[0]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b"))
        .distinct()
        .collect()
    ]
    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    df_t = (
        spark.read.parquet(f"{path}/df")
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "df")
    )
    stats = spark.read.parquet(f"{path}/stats")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = (
        post.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("__s"), F.count(F.lit(1)).alias("n_hit_terms"))
    )
    bm25 = F.floor(F.col("__s") * 1_000_000 + F.lit(0.5)) / 1_000_000
    return (
        scored.select(F.col(id_col), bm25.alias("bm25"), "n_hit_terms")
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rm3_expand_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """RM3 pseudo-relevance feedback (Lavrenko & Croft relevance
    models + query interpolation — public IR literature): run BM25,
    treat the top ``fb_docs`` results as pseudo-relevant, estimate a
    relevance model P(t|R) = Σ_d w(d)·tf(t,d)/dl(d) with w(d) the
    score-normalized document weight, interpolate with the uniform
    original query (``alpha``·RM + (1-``alpha``)·orig), keep the top
    ``fb_terms`` terms, and re-score the corpus with the WEIGHTED
    expanded query. Recall-rescue for short queries: documents using
    co-occurring vocabulary rank even when they miss original terms.

    Spark shape: the feedback pass is `bm25_topk`; the relevance model
    aggregates ONLY the feedback docs' tokens (an equi-join of the
    token stream against the fb_docs-sized id set — broadcast, so the
    corpus never shuffles); the rescoring pass joins the token stream
    against the fb_terms-sized weighted term table, again broadcast.
    Both heavy scans stay filter-shaped, never vocabulary-wide.
    Every weight is floor-rounded at 6 decimals AT each decision point
    (doc weights, P(t|R), interpolated weights, final score), so both
    engines select identical feedback sets, identical expansion terms,
    and identical final ranks — drift cannot compound across stages."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    import math

    terms = sorted({t.lower() for t in query_terms})

    def _f6(c):
        return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000

    fb = bm25_topk(
        docs, terms, k=fb_docs, id_col=id_col, text_col=text_col, k1=k1, b=b
    ).select(id_col, "bm25")
    wsum = fb.agg(F.sum("bm25").alias("__ws"))
    w = fb.crossJoin(F.broadcast(wsum)).select(
        F.col(id_col), _f6(F.col("bm25") / F.col("__ws")).alias("w")
    )

    toks = docs.select(F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term"))
    dl = docs.select(F.col(id_col), F.size(_terms(F.col(text_col))).alias("dl"))

    fb_tf = (
        toks.join(F.broadcast(w.select(id_col)), id_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    p_rm = (
        fb_tf.join(F.broadcast(w), id_col)
        .join(dl, id_col)
        .groupBy("term")
        .agg(_f6(F.sum(F.col("w") * F.col("tf") / F.col("dl"))).alias("p_rm"))
    )
    p_orig_val = math.floor(1.0 / len(terms) * 1_000_000 + 0.5) / 1_000_000
    orig = docs.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    ).withColumn("p_orig", F.lit(p_orig_val))
    combined = (
        p_rm.join(orig, "term", "full")
        .select(
            "term",
            _f6(
                F.lit(alpha) * F.coalesce("p_rm", F.lit(0.0))
                + F.lit(1.0 - alpha) * F.coalesce("p_orig", F.lit(0.0))
            ).alias("wq"),
        )
    )
    exp_terms = combined.orderBy(F.col("wq").desc(), F.col("term").asc()).limit(
        fb_terms
    )

    hits = (
        toks.join(F.broadcast(exp_terms.select("term")), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    df_t = hits.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = F.col("wq") * idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = (
        hits.join(F.broadcast(exp_terms), "term")
        .join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            _f6(F.sum(contrib)).alias("rm3_score"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    return scored.orderBy(F.col("rm3_score").desc(), F.col(id_col).asc()).limit(k)
