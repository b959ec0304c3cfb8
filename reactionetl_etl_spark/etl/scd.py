"""Slowly-changing-dimension Type 2: dimension history as data.

The reference's dimension load (W3: INSERT new simulation metadata,
reference database_manager.py) keeps only the LATEST row per key; the
classic warehouse completion is SCD2 — when a tracked attribute
changes, the open row CLOSES (``valid_to`` = the change's effective
date) and a new open row begins, so every fact can join the dimension
AS IT WAS (the as-of join in `operators/asof.py` is the read-side
companion).

Storage is the snapshot table format (`etl/snapshots.py`), which buys
the merge atomicity (readers see the whole new history or the whole
old one) and — pleasingly — time travel over the history table itself.
Dimensions are broadcast-scale by definition, so each merge rewrites
the table (one snapshot commit of a dim-sized frame); a dimension too
big to rewrite is a fact table wearing a costume and belongs in the
keyed-upsert/CoW path.

Merge semantics per batch (all DataFrame ops, null-safe comparisons):
- new key                → insert open row (valid_from=effective)
- key with changed       → close current row (valid_to=effective) and
  tracked attributes       insert a new open row
- key with equal values  → no-op (re-applying a batch is idempotent)
Updates must be unique per key within a batch; effective dates must
not precede the key's current ``valid_from`` (monotone feeds — raises
otherwise, because silently reordering history corrupts it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.snapshots import head_version, snapshot_read, snapshot_write


def scd2_merge(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_col: str = "effective_date",
) -> int:
    """Fold one update batch into the SCD2 history at ``table_path``;
    returns the committed snapshot version. ``updates`` carries
    key_cols + tracked_cols + effective_col."""
    n_dup = updates.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
    if n_dup:
        raise ValueError(f"updates carry {n_dup} duplicated keys on {key_cols}")
    incoming = updates.select(
        *key_cols,
        *tracked_cols,
        F.col(effective_col).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    if head_version(spark, table_path) is None:
        return snapshot_write(spark, table_path, incoming, mode="overwrite")

    cur = snapshot_read(spark, table_path)
    closed_history = cur.filter(F.col("valid_to").isNotNull())
    open_rows = cur.filter(F.col("valid_to").isNull())

    upd = incoming.select(
        *[F.col(k).alias(f"__u_{k}") for k in key_cols],
        *[F.col(t).alias(f"__u_{t}") for t in tracked_cols],
        F.col("valid_from").alias("__u_from"),
    )
    key_eq = [F.col(k) == F.col(f"__u_{k}") for k in key_cols]
    joined = open_rows.join(
        upd, on=key_eq[0] if len(key_eq) == 1 else F.expr(" AND ".join(
            f"{k} = __u_{k}" for k in key_cols
        )), how="left",
    )
    # null-safe "any tracked attribute differs"
    differs = None
    for t in tracked_cols:
        d = ~F.col(t).eqNullSafe(F.col(f"__u_{t}"))
        differs = d if differs is None else (differs | d)
    matched = F.col("__u_from").isNotNull()

    bad = joined.filter(matched & (F.col("__u_from") < F.col("valid_from"))).count()
    if bad:
        raise ValueError(
            f"{bad} updates are effective BEFORE the key's current valid_from "
            "(out-of-order feed — SCD2 batches must be applied in time order)"
        )

    table_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to"]
    untouched_open = joined.filter(~matched | ~differs).select(*table_cols)
    closing = joined.filter(matched & differs).select(
        *key_cols, *tracked_cols, "valid_from",
        F.col("__u_from").alias("valid_to"),
    )
    new_open = (
        joined.filter(matched & differs)
        .select(
            *[F.col(f"__u_{k}").alias(k) for k in key_cols],
            *[F.col(f"__u_{t}").alias(t) for t in tracked_cols],
            F.col("__u_from").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    brand_new = incoming.join(open_rows.select(*key_cols), on=key_cols, how="left_anti")

    merged = (
        closed_history.select(*table_cols)
        .unionByName(untouched_open)
        .unionByName(closing)
        .unionByName(new_open)
        .unionByName(brand_new.select(*table_cols))
        # the new history must not lazily read the table being replaced
        .localCheckpoint(eager=True)
    )
    return snapshot_write(spark, table_path, merged, mode="overwrite")


def scd2_current(spark: SparkSession, table_path: str) -> DataFrame:
    """The open (current) rows — the reference's dim_rxn equivalent."""
    return snapshot_read(spark, table_path).filter(F.col("valid_to").isNull())


def scd2_as_of(spark: SparkSession, table_path: str, as_of_date: str) -> DataFrame:
    """The dimension as it was on ``as_of_date`` (rows whose validity
    interval covers it — half-open [valid_from, valid_to))."""
    d = F.lit(as_of_date).cast("date")
    return snapshot_read(spark, table_path).filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )


def scd2_point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Enrich facts with the dimension AS OF each fact's own timestamp:
    equi-join on the key with the validity interval
    [valid_from, valid_to) as a RESIDUAL predicate — Catalyst plans a
    hash join keyed on the dimension key, never a range blow-up, since
    SCD2 intervals per key are disjoint (each fact matches ≤ 1 history
    row by construction). ``ts_col`` compares as a date (the history's
    grain)."""
    h = history.select(
        *[F.col(k).alias(f"__h_{k}") for k in key_cols],
        *[c for c in history.columns if c not in key_cols],
    )
    ts = F.col(ts_col).cast("date")
    cond = None
    for k in key_cols:
        c = F.col(k) == F.col(f"__h_{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (ts >= F.col("valid_from")) & (
        F.col("valid_to").isNull() | (ts < F.col("valid_to"))
    )
    return facts.join(h, on=cond, how=how).drop(*[f"__h_{k}" for k in key_cols])
