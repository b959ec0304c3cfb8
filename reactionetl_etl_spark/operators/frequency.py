"""Exact heavy hitters with bounded shuffle (distributed Misra-Gries).

The naive `groupBy(item).count()` over a 100 TB token stream shuffles
every distinct item (vocabulary-sized, heavy-tailed). For the common
question — "which items exceed share θ of the corpus?" — two passes
bound the shuffle to the CANDIDATES:

    1. per-partition Misra-Gries summaries (k counters, one pass,
       O(k) memory) emit a candidate superset. Guarantee: an item
       with GLOBAL share > 1/k must exceed share 1/k in at least one
       partition (averaging argument), and per-partition MG keeps
       every item whose partition share exceeds 1/k — so with
       k ≥ 1/θ no true heavy hitter can be missed. We use k = ⌈2/θ⌉
       for slack; false candidates are harmless (step 2 is exact).
    2. one exact count restricted to candidates: broadcast-semi-join
       the stream against the candidate set, then a map-side-combined
       groupBy — at most |candidates| × partitions records shuffle,
       independent of vocabulary size.

Result: EXACT counts and shares for exactly the items above the
threshold — approximate machinery in the middle, no approximation in
the answer. The per-partition summarizer is `mapInPandas` (Arrow
batches, state carried across an executor partition's batches) —
imperative per-partition logic is the one place Python belongs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int, col: str):
    """Per-partition Misra-Gries summarizer: k counters over all Arrow
    batches of the partition; emits surviving (item, lower-bound
    count) pairs."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                n_rows += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all: evict zeros (classic MG step)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        # one NULL-item row rides along carrying the partition's row
        # count, so candidates AND the grand total come out of the same
        # single pass (no second full scan just for count())
        yield pd.DataFrame(
            {col: list(counters.keys()) + [None], "__n_part": [0] * len(counters) + [n_rows]}
        )

    return summarize


def frequent_items(
    df: DataFrame, col: str, min_share: float, k: int | None = None
) -> DataFrame:
    """Items of ``df[col]`` with share ≥ ``min_share``, with EXACT
    counts: (col, n, share). ``k`` overrides the counter budget
    (default ⌈2/min_share⌉; must be ≥ ⌈1/min_share⌉ for the
    no-false-negative guarantee)."""
    if not 0 < min_share <= 1:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    k = int(k if k is not None else math.ceil(2.0 / min_share))
    if k < math.ceil(1.0 / min_share):
        raise ValueError(
            f"k={k} breaks the Misra-Gries guarantee for min_share={min_share}"
            f" (need ≥ {math.ceil(1.0 / min_share)})"
        )
    src = df.select(col).filter(F.col(col).isNotNull())
    field = src.schema[col]
    from pyspark.sql import types as T

    if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
        # the per-partition counters key on Python values; list/dict
        # values are unhashable and would crash mid-job — fail fast
        raise TypeError(
            f"frequent_items needs an atomic column, got {field.dataType.simpleString()}"
            " — project a hashable key (e.g. to_json / hash) first"
        )
    summary = src.mapInPandas(
        _mg_partition(k, col),
        schema=f"{field.name} {field.dataType.simpleString()}, __n_part bigint",
    ).localCheckpoint(eager=True)  # tiny (≤ k+1 rows/partition); one pass, two consumers
    total_row = summary.agg(F.sum("__n_part").alias("t")).first()
    total = int(total_row["t"] or 0)
    candidates = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    if total == 0:
        return (
            src.groupBy(col)
            .agg(F.count("*").alias("n"), F.lit(0.0).alias("share"))
            .limit(0)
        )
    exact = (
        src.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(float(total) * float(min_share)))
    )
    return exact.withColumn("share", F.col("n") / F.lit(float(total)))
