"""Sign-bit (1-bit) embedding quantization + Hamming-distance ANN.

The cheapest useful vector compression: keep only the SIGN of each
component. A 64-dim float32 embedding (256 B) becomes one int64 word
(8 B) — 32× smaller — and similarity degrades gracefully because for
mean-centered embeddings the Hamming distance between sign patterns is
a monotone estimator of angular distance (Charikar's SimHash bound:
P[sign(a·r) != sign(b·r)] = angle(a,b)/pi for random hyperplanes; the
coordinate basis is the degenerate-but-deterministic case used by
binary-quantization modes of production vector stores).

Why this exists next to LSH/IVF/PQ (operators/similarity.py, pq.py):
those trade recall for pruning — they SKIP candidates. Sign-bit
Hamming is the opposite trade: scan EVERYTHING, but make the scan so
cheap it stays viable at scales where float scans thrash memory
bandwidth. The whole distance kernel is `bit_count(x ^ y)` over int64
words — built-in JVM expressions inside whole-stage codegen, no UDF,
no Arrow hop, ~8 B/vector of traffic. At 100 TB of float32 vectors the
packed corpus is ~3 TB — the difference between "needs a shuffle-heavy
index" and "fits a brute scan per query batch".

The two-stage pattern (`hamming_rerank_topk`) is how real systems
deploy it: a packed-bits scan produces a shortlist, then exact cosine
re-ranks ONLY the shortlist rows — full vectors are touched for
|queries|·shortlist rows instead of the whole corpus. The second scan
joins the corpus against a broadcast shortlist (broadcast hash join —
the corpus side never shuffles), which is exactly the "fetch full
vectors from the store by id" step of a serving stack.

No reference analogue (`/root/reference/` is a CSV→PostgreSQL ETL,
see SURVEY.md §2.13) — north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.functions.vectors import (
    as_double_array,
    cosine_similarity,
    non_null_vectors,
)

__all__ = [
    "sign_bits",
    "hamming_distance",
    "hamming_topk_batch",
    "hamming_rerank_topk",
    "write_bits_index",
    "read_bits_index",
    "probe_bits_index",
]


def sign_bits(vec_col: Column | str) -> Column:
    """Pack the sign pattern of a numeric array into array<bigint>
    words: bit ``i`` of word ``w`` is 1 iff component ``64*w + i`` is
    strictly positive (NULL components count as non-positive).

    Pure built-in higher-order functions — sequence/aggregate/
    shiftleft/bitwise-or — so packing runs inside whole-stage codegen
    on the scan, never in Python. Dimensions that are not a multiple
    of 64 leave the tail word's high bits zero on every row, so
    distances stay comparable. NULL vectors are the caller's problem
    (apply `non_null_vectors` upstream, the engine-wide convention);
    an EMPTY (non-NULL) array packs to one all-zero word — the word
    count is clamped to ≥ 1 because ceil(0/64) − 1 = −1 would make
    `sequence(0, -1)` DESCEND (Spark infers step −1) and emit a bogus
    two-word [0, 0] pattern (r13 ADVICE).
    """
    name = vec_col if isinstance(vec_col, str) else None
    if name is None:
        raise TypeError("sign_bits takes a column NAME (it builds a SQL expr)")
    return F.expr(
        f"transform(sequence(0, greatest(cast(ceil(size({name}) / 64.0) as int), 1) - 1),"
        f" w -> aggregate(sequence(0, 63), 0L,"
        f" (acc, i) -> CASE WHEN 64 * w + i < size({name})"
        f" AND element_at({name}, 64 * w + i + 1) > 0D"
        f" THEN acc | shiftleft(1L, i) ELSE acc END))"
    )


def hamming_distance(a: str, b: str) -> Column:
    """Hamming distance between two equal-length array<bigint> sign
    words: sum of `bit_count(x ^ y)` per word — int arithmetic only,
    exact, cross-engine reproducible (no floats anywhere). Unequal
    word counts (a dimension-mismatched vector) make `zip_with` pad
    with NULL and the whole sum goes NULL — every top-k consumer in
    this module orders with `asc_nulls_last` so a malformed row can
    never outrank a real neighbour (r13 ADVICE)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> bit_count(x ^ y)),"
        f" 0, (acc, v) -> acc + v)"
    )


def hamming_topk_batch(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str | None = None,
    exclude_self: bool = True,
    max_query_rows: int | None = 100_000,
) -> DataFrame:
    """Top-k nearest sign patterns for every query row, one corpus pass.

    Same plan skeleton as `similarity.cosine_topk_batch`: broadcast the
    (small) query batch, crossJoin against the corpus scan, rank with
    `row_number()` over `Window.partitionBy(query_id)` — Spark plans
    the rank filter as WindowGroupLimit, so each map task emits only
    its local top-k per query before the exchange. The difference is
    the scored payload: 8 B of packed bits per 64 dims instead of the
    float vector, and an integer XOR/POPCNT kernel instead of an FMA
    loop.

    Output: (query_id, id_col, hamming_dist int), k rows per query,
    ordered by ascending distance, ties by ascending id — fully
    deterministic (integer distances), so value-oracle-checkable
    without any rounding protocol.

    The query batch is BROADCAST (scan-everything is the design — the
    corpus side never shuffles), so the batch must fit the driver and
    every executor; ``max_query_rows`` refuses a corpus-sized query
    set BEFORE building the broadcast instead of OOMing mid-job. For
    query sets beyond the cap, split them into ≤ cap chunks and union
    the results (each chunk's top-k is independent), or use the celled
    unbounded probes — `similarity.probe_ivf_index` /
    `pq.probe_ivfpq_index` with ``broadcast_queries=False`` — which
    meet the corpus in a hash-partitioned cell equi-join and need
    neither side resident.
    """
    from pyspark.sql import Window

    qv = query_vec_col or vec_col
    q = non_null_vectors(
        queries.select(
            F.col(query_id_col).alias("__qid"), as_double_array(qv).alias("__q")
        ),
        "__q",
    ).withColumn("__qbits", sign_bits("__q")).drop("__q")
    if max_query_rows is not None:
        n_q = q.limit(max_query_rows + 1).count()
        if n_q > max_query_rows:
            raise ValueError(
                f"hamming_topk_batch query batch exceeds max_query_rows="
                f"{max_query_rows}; the batch is broadcast to every task, so"
                f" split it into <= max_query_rows chunks (per-chunk top-k is"
                f" independent) or probe a celled index with"
                f" broadcast_queries=False (probe_ivf_index /"
                f" probe_ivfpq_index) for corpus-sized query sets"
            )
    c = non_null_vectors(corpus, vec_col).select(
        F.col(id_col), sign_bits(vec_col).alias("__bits")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col("__qid"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("hamming_dist").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        pairs.select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            hamming_distance("__bits", "__qbits").alias("hamming_dist"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hamming_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int | None = None,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str | None = None,
    exclude_self: bool = True,
    max_query_rows: int | None = 100_000,
) -> DataFrame:
    """Two-stage serving path: packed-bits Hamming scan → shortlist →
    exact-cosine rerank of the shortlist only.

    Stage 1 is `hamming_topk_batch(k=shortlist)` (default 4·k) over the
    8-B/64-dim packed corpus. Stage 2 fetches full vectors for ONLY the
    shortlist rows — the corpus scan is joined against the broadcast
    shortlist id set (broadcast hash join; the corpus never shuffles)
    — and ranks by exact cosine (round 6, the engine-wide rounding
    protocol) with ties by ascending id. Full-precision work is
    O(|queries|·shortlist), not O(|corpus|): at 100 TB the floats are
    touched for a few thousand rows per query batch.

    Output: (query_id, id_col, cosine_sim) — k rows per query. Recall
    vs the exact scan is bounded by stage 1 (sign quantization loses
    magnitude); widen ``shortlist`` to trade scan cost for recall, and
    measure with the `ann_recall_report` pattern.
    """
    from pyspark.sql import Window

    qv = query_vec_col or vec_col
    short = shortlist if shortlist is not None else 4 * k
    hits = hamming_topk_batch(
        queries,
        corpus,
        k=short,
        query_id_col=query_id_col,
        id_col=id_col,
        vec_col=vec_col,
        query_vec_col=qv,
        exclude_self=exclude_self,
        max_query_rows=max_query_rows,
    ).select(query_id_col, id_col)
    q = non_null_vectors(
        queries.select(
            F.col(query_id_col).alias("__qid"), as_double_array(qv).alias("__q")
        ),
        "__q",
    )
    cand = non_null_vectors(corpus, vec_col).join(
        F.broadcast(hits), on=id_col, how="inner"
    )
    scored = cand.join(
        F.broadcast(q), on=F.col(query_id_col) == F.col("__qid"), how="inner"
    )
    sim = cosine_similarity(as_double_array(vec_col), F.col("__q"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(sim, 6).alias("cosine_sim"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def write_bits_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "append",
) -> None:
    """Persist the packed-bits index: a flat parquet table of
    (id, bits array<bigint>) — 8 B of payload per 64 dims. Unlike the
    LSH/IVF/PQ indexes there is NO partition key: the bits scan prunes
    nothing by design (it wins by making the full scan cheap), so a
    flat layout with max parquet row-group compaction is the right
    shape; at 100 TB of float32 vectors the index is ~3 TB and a probe
    is one column-pruned scan of it.

    Appends are STATELESS-safe — sign packing has no trained geometry
    to version (the property every other index here must enforce via
    stored-sidecar checks), so ``mode='append'`` is always consistent
    with the existing rows. NULL vectors are dropped (the engine-wide
    convention: a row that can't be embedded is never a candidate)."""
    from reactionetl_etl_spark.functions.vectors import non_null_vectors

    non_null_vectors(embeddings, vec_col).select(
        F.col(id_col), sign_bits(vec_col).alias("bits")
    ).write.mode(mode).parquet(path)


def read_bits_index(spark, path: str) -> DataFrame:
    """The persisted (id, bits) table, as written by `write_bits_index`."""
    return spark.read.parquet(path)


def probe_bits_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = True,
    max_query_rows: int | None = 100_000,
) -> DataFrame:
    """Top-k Hamming neighbours for every query row against the
    persisted bits index: queries sign-pack on the fly (same kernel,
    so probe results are IDENTICAL to the in-plan `hamming_topk_batch`
    over the corpus the index was built from — the parity every
    persisted index here guarantees), broadcast, and meet the stored
    bits in the same WindowGroupLimit top-k. The float vectors are
    never read — the probe's entire input is the 8 B/vector index.
    ``max_query_rows`` refuses a corpus-sized query batch before the
    broadcast (same contract and escape hatches as
    `hamming_topk_batch`)."""
    from pyspark.sql import Window

    qq = _non_null_queries(queries, query_id_col, query_vec_col).withColumn(
        "__qbits", sign_bits("__q")
    ).drop("__q")
    if max_query_rows is not None:
        n_q = qq.limit(max_query_rows + 1).count()
        if n_q > max_query_rows:
            raise ValueError(
                f"probe_bits_index query batch exceeds max_query_rows="
                f"{max_query_rows}; split it into <= max_query_rows chunks"
                f" or probe a celled index with broadcast_queries=False"
                f" (probe_ivf_index / probe_ivfpq_index)"
            )
    q = F.broadcast(qq)
    pairs = read_bits_index(spark, path).crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col("__qid"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("hamming_dist").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        pairs.select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            hamming_distance("bits", "__qbits").alias("hamming_dist"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _non_null_queries(queries: DataFrame, query_id_col: str, qv: str) -> DataFrame:
    return non_null_vectors(
        queries.select(
            F.col(query_id_col).alias("__qid"), as_double_array(qv).alias("__q")
        ),
        "__q",
    )
