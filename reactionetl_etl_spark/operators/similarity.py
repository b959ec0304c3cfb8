"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact; one scan, no shuffle for a single
  query (query vector broadcast). This is the correctness baseline and
  the right choice when queries are few and the corpus scan is
  amortized.
- random-hyperplane LSH top-k: approximate; hashes every vector into
  sign-pattern buckets once, then searches only same-bucket candidates.
  At 100 TB the bucketed table is the reusable index: build cost is one
  scan, each query touches ~1/2^bits of the data.

All vector math is Catalyst higher-order functions
(`functions/vectors.py`) — JVM-side, codegen'd, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.functions.vectors import as_double_array, cosine_similarity, dot


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the vector with ``query_id``.

    The 1-row query side is broadcast; the corpus side is a single
    parallel scan + TakeOrderedAndProject (per-partition heaps, k-row
    driver merge) — no global sort, no wide shuffle.
    """
    q = embeddings.filter(F.col(id_col) == query_id).select(
        as_double_array(vec_col).alias("__q")
    )
    corpus = embeddings.filter(F.col(id_col) != query_id)
    sim = cosine_similarity(as_double_array(vec_col), F.col("__q"))
    return (
        corpus.join(F.broadcast(q))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG, no RNG state):
    identical across runs/executors, which makes the LSH index stable
    and incrementally appendable."""
    x = 88172645463325252
    planes = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            # xorshift64
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((x % 2_000_001) / 1_000_000.0) - 1.0)
        planes.append(row)
    return planes


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket id (int, 0..2^bits-1).

    Vectors with the same sign pattern against ``bits`` fixed
    hyperplanes land in the same bucket; cosine-similar vectors collide
    with probability (1 - θ/π)^bits. Pure expression — at scale, write
    the result partitioned by bucket and ANN queries become partition
    -pruned scans.
    """
    v = as_double_array(vec_col)
    bit_cols = []
    for i, plane in enumerate(_hyperplanes(dim, bits)):
        plane_col = F.array(*[F.lit(w) for w in plane])
        bit_cols.append(F.when(dot(v, plane_col) > 0.0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bit_cols[0]
    for c in bit_cols[1:]:
        bucket = bucket + c
    return embeddings.withColumn(out_col, bucket)


def _coarse_centroids(dim: int, n_cells: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish centroids (same xorshift
    stream as the hyperplanes) standing in for trained k-means cells.
    Production swaps in trained centroids; the plan shape is identical."""
    x = 2463534242
    cells = []
    for _ in range(n_cells):
        row = []
        for _ in range(dim):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((x % 2_000_001) / 1_000_000.0) - 1.0)
        cells.append(row)
    return cells


def with_ivf_cell(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """IVF-style coarse quantization: assign each vector to its
    nearest (max dot product) of ``n_cells`` fixed centroids.

    At scale the celled table is the inverted index: write it
    partitioned by cell and a query probes only its own cell's
    partition (plus neighbors for recall) — the IVF analogue of the
    LSH bucket path, with cell sizes that track the data distribution
    once real k-means centroids are plugged in.
    """
    v = as_double_array(vec_col)
    # argmax as array ops: a when-chain fold would nest each step's
    # expression inside the next TWICE (value + otherwise) — 2^n blowup
    scores = F.array(
        *[dot(v, F.array(*[F.lit(w) for w in c])) for c in _coarse_centroids(dim, n_cells)]
    )
    cell = F.array_position(scores, F.array_max(scores)) - 1
    return embeddings.withColumn(out_col, cell.cast("int"))


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k restricted to the query vector's IVF cell."""
    celled = with_ivf_cell(embeddings, dim, n_cells, vec_col)
    q = celled.filter(F.col(id_col) == query_id).select(
        as_double_array(vec_col).alias("__q"), F.col("ivf_cell").alias("__qc")
    )
    cand = celled.filter(F.col(id_col) != query_id).join(
        F.broadcast(q), on=F.col("ivf_cell") == F.col("__qc"), how="inner"
    )
    sim = cosine_similarity(as_double_array(vec_col), F.col("__q"))
    return (
        cand.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_dim: int | None = None,
    lsh_bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine_sim)
    with id_a < id_b and cosine ≥ threshold.

    Default is the exact all-pairs baseline (self-join): O(n²) dot
    products, correct at any threshold — fine for dim-table-sized
    corpora and the correctness oracle. Pass ``lsh_dim`` to switch to
    the scale path: vectors are first bucketed by random-hyperplane LSH
    and only same-bucket pairs are compared — the join becomes an
    equi-join on the bucket id (shuffle keyed on 2^bits values instead
    of a cartesian product), trading recall for ~2^bits less work.
    """
    base = embeddings
    join_keys: list[str] = []
    if lsh_dim is not None:
        base = with_lsh_bucket(base, lsh_dim, lsh_bits, vec_col)
        join_keys = ["lsh_bucket"]
    left = base.select(
        *join_keys, F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("__va")
    )
    right = base.select(
        *join_keys, F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("__vb")
    )
    pairs = (
        left.join(right, on=join_keys, how="inner")
        if join_keys
        else left.crossJoin(right)
    ).filter(F.col("id_a") < F.col("id_b"))
    sim = cosine_similarity(F.col("__va"), F.col("__vb"))
    return (
        pairs.withColumn("cosine_sim", F.round(sim, 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    dim: int,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket. Recall improves with multi-probe (neighboring buckets);
    this baseline probes the exact bucket only."""
    bucketed = with_lsh_bucket(embeddings, dim, bits, vec_col)
    q = bucketed.filter(F.col(id_col) == query_id).select(
        as_double_array(vec_col).alias("__q"), F.col("lsh_bucket").alias("__qb")
    )
    cand = bucketed.filter(F.col(id_col) != query_id).join(
        F.broadcast(q), on=F.col("lsh_bucket") == F.col("__qb"), how="inner"
    )
    sim = cosine_similarity(as_double_array(vec_col), F.col("__q"))
    return (
        cand.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
