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
