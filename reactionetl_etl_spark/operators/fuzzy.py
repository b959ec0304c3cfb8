"""Fuzzy (edit-distance) joins with equi-join blocking.

Entity resolution across training-data sources — merging metadata
catalogs, matching author/product/dataset names with typos — needs an
edit-distance join, and a naive one is a cross join with a levenshtein
filter: O(n²) comparisons, the canonical non-starter at scale.

This module implements the PIGEONHOLE blocking scheme: split each
string into ``max_dist + 1`` contiguous chunks; a pair of SAME-LENGTH
strings within ``max_dist`` SUBSTITUTIONS differs in at most
``max_dist`` positions, so at least one chunk is untouched and equal —
candidate generation becomes an exact equi-join on
(length, chunk_index, chunk_text), and only candidates pay the
levenshtein verification. The guarantee is exact for substitution
edits (the dominant typo class); INSERTIONS/DELETIONS shift chunk
boundaries and may be missed — pairs needing indel tolerance belong to
the n-gram Jaccard / MinHash path (`operators/dedup.py`), which is
length-agnostic. Stating the recall contract beats silently missing
pairs.

Scale: the shuffle key is (length, chunk_id, chunk) — short strings,
high selectivity; per-block size is bounded by vocabulary collisions,
not corpus size, and verification runs only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def substitution_fuzzy_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, edit_dist) for all SAME-LENGTH
    pairs within ``max_dist`` substitutions (exact under the pigeonhole
    guarantee), id_a < id_b, deduplicated across blocks."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    k1 = max_dist + 1
    length = F.length(F.col(col))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                # boundaries floor(len*i/k1): deterministic, identical
                # for equal-length strings, cover the whole string
                F.substring(
                    F.col(col),
                    (F.floor(length * i / k1) + 1).cast("int"),
                    (F.floor(length * (i + 1) / k1) - F.floor(length * i / k1)).cast(
                        "int"
                    ),
                ).alias("chunk"),
            )
            for i in range(k1)
        ]
    )
    t = df.select(
        F.col(id_col).alias("__id"),
        F.col(col).alias("__name"),
        length.alias("__len"),
        F.explode(chunks).alias("c"),
    ).select("__id", "__name", "__len", "c.chunk_id", "c.chunk")
    a, b = t.alias("a"), t.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__len") == F.col("b.__len"),
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__name").alias("name_a"),
            F.col("b.__name").alias("name_b"),
        )
        .distinct()  # a pair can collide in several chunks
    )
    return cand.withColumn(
        "edit_dist", F.levenshtein("name_a", "name_b")
    ).filter(F.col("edit_dist") <= max_dist)
