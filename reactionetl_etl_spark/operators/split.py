"""Deterministic dataset splitting (train/val/test) by key hash.

A training-data pipeline must split corpora so that (a) the same
document lands in the same split on every run, cluster, and engine —
randomSplit() cannot promise that (it is seed+partitioning dependent);
(b) membership is decidable per-row with no global state — a join
against a membership table would shuffle 100 TB to split it.

Hash-splitting gives both: bucket = md5(salt:key) taken as an integer
mod 10_000, compared against cumulative weight thresholds. Pure
per-row expressions — no shuffle, no RNG, pushes through any scan —
and md5 is bit-identical across engines, so the assignment is
ORACLE-CHECKABLE in ANSI SQL (DuckDB: `('0x' || substring(md5(..),
1, 8))::BIGINT`; Spark: `conv(substring(md5(..), 1, 8), 16, 10)`).

Changing ``salt`` re-deals every document; keeping it pins the split
forever — new data lands in splits at the configured rates while old
rows never migrate (the property that keeps eval sets uncontaminated
across dataset versions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def split_bucket(key_col, salt: str = "s42") -> "F.Column":
    """Deterministic bucket in [0, 10000) from md5(salt:key). Uses the
    first 8 hex chars (32 bits) — far beyond the resolution needed for
    basis-point split weights."""
    h = F.md5(F.concat_ws(":", F.lit(salt), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "s42",
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col`` assigning each row to a named split.

    ``weights`` maps split name → fraction; fractions must sum to 1.0
    (±1e-9) and are applied in insertion order, so the same dict always
    produces the same bucket ranges.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, last)


def split_frames(
    df: DataFrame, key_col: str, weights: dict[str, float], salt: str = "s42"
) -> dict[str, DataFrame]:
    """One filtered DataFrame per split, all sharing a single scan
    lineage (Catalyst pushes each split predicate to the source)."""
    tagged = hash_split(df, key_col, weights, salt)
    return {name: tagged.filter(F.col("split") == name).drop("split") for name in weights}


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    order_key: str,
    salt: str = "s42",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically —
    the per-domain document cap every web-corpus pipeline applies so a
    handful of mega-domains can't dominate the training mixture.

    Selection order is md5(salt:order_key) ascending (ties by the key
    itself), i.e. a seeded-but-stateless uniform draw: the SAME rows
    survive on every run, engine, and cluster size, and adding new
    rows to a group displaces old survivors only by hash order — no
    RNG, no membership table.

    Scale posture: the rank is `row_number()` over a window keyed on
    the group, and the `rn <= cap` filter plans as WindowGroupLimit —
    each map task emits at most ``cap`` rows per group BEFORE the
    exchange (pinned in tests/test_plans.py), so a mega-domain with a
    billion rows ships ~cap·n_tasks rows into the shuffle, not a
    billion. The hot-key single-reducer problem the naive window has
    is exactly what that partial limit removes.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(order_key).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(order_key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def split_by_cluster(
    df: DataFrame,
    key_col: str,
    clusters: DataFrame,
    weights: dict[str, float],
    cluster_key: str = "node",
    cluster_col: str = "component",
    salt: str = "s42",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe split: every member of a duplicate cluster lands in
    the SAME split, so a near-duplicate of a training document can never
    surface in the eval set (per-row hash splitting CANNOT promise this
    — two near-dup docs have different keys and split independently).

    ``clusters`` maps member key → cluster id, e.g. the output of
    ``graph.connected_components`` over near-dup pairs. Rows absent from
    the map hash on their own key, so the map carries only the
    (typically small) duplicated fraction of the corpus — broadcast it
    when it fits; otherwise the join shuffles on the row KEY, never on
    the corpus payload. The hash key is the cluster id for clustered
    rows, giving co-assignment by construction.
    """
    cmap = clusters.select(
        F.col(cluster_key).cast("string").alias("__member"),
        F.col(cluster_col).cast("string").alias("__cluster"),
    )
    joined = df.join(cmap, F.col(key_col).cast("string") == F.col("__member"), "left")
    eff = F.coalesce(F.col("__cluster"), F.col(key_col).cast("string"))
    tagged = joined.withColumn("__effkey", eff).drop("__member", "__cluster")
    return hash_split(tagged, "__effkey", weights, salt, out_col).drop("__effkey")
