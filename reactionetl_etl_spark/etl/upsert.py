"""Keyed upsert (MERGE emulation) for partitioned parquet tables.

The reference's W6 is a batched UPDATE-join propagating dim values into
facts (/root/reference/database_manager.py:200-240);
`materialize_enrichment` covers that exact shape. This module is the
GENERAL form — upsert an updates batch into a keyed table — for plain
parquet, which has no MERGE: rewrite ONLY the partitions the updates
touch as (existing rows anti-joined on the key) ∪ (updates), committed
via an atomic staged partition swap (etl/commit.py — a crash never
leaves a half-rewritten table). On Delta/Iceberg the whole function is
`MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`; call sites do not
change shape.

Scale posture: work ∝ size of TOUCHED partitions + updates, never the
full table; the anti-join keys on the upsert key within those
partitions only. Last-writer-wins inside a batch is made deterministic
by dropDuplicates on the key after ordering is the CALLER's concern —
this function requires key-unique updates and raises otherwise (a
silent arbitrary pick is how upserts corrupt tables).

Partition-immutability contract: by default a key's ``partition_col``
value is assumed IMMUTABLE (the common case — the partition is a
derived attribute of the key, e.g. the event day of an event id).
Under that contract, touched partitions are exactly the updates'
partitions and no other partition can hold an update's key. When keys
CAN migrate between partitions (e.g. a status-partitioned table),
pass ``keys_move_partitions=True``: one extra key semi-join pass over
the NON-touched partitions finds each moving key's old home so its
stale row is rewritten away too. That pass scans the rest of the
table's key column (column-pruned, but not partition-pruned — the
unavoidable price of not knowing where keys live), which is why it is
opt-in rather than the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.commit import staged_overwrite_partitions


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    keys_move_partitions: bool = False,
) -> int:
    """Upsert ``updates`` into the parquet table at ``table_path``.

    Returns the number of update rows applied. Updates must carry the
    full table schema (including ``partition_col``) and be unique on
    ``key_cols``. With the default ``keys_move_partitions=False`` the
    caller asserts ``partition_col`` is immutable per key; if a key in
    fact moved, its old row would survive in its untouched partition
    and the table would carry a duplicate key — pass
    ``keys_move_partitions=True`` for tables where that can happen.
    """
    if partition_col in key_cols and keys_move_partitions:
        raise ValueError(
            f"partition_col {partition_col!r} is part of key_cols — keys "
            "cannot move partitions by construction"
        )
    dup = updates.groupBy(*key_cols).count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError(
            f"updates are not unique on {key_cols}; dedupe (pick a winner "
            "deterministically) before upserting"
        )
    updates = updates.localCheckpoint(eager=True)  # pin before overwriting source
    n_updates = updates.count()
    if n_updates == 0:
        return 0
    table = spark.read.parquet(table_path)
    days = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if keys_move_partitions:
        # find the OLD home of any key that migrated: key semi-join over
        # the partitions not already being rewritten (key column only —
        # column pruning keeps the scan narrow; metadata-sized collect)
        old_homes = (
            table.filter(~F.col(partition_col).isin(days))
            .join(updates.select(*key_cols).distinct(), on=key_cols, how="left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        )
        days = days + [r[0] for r in old_homes]
    touched = table.filter(F.col(partition_col).isin(days))
    # no broadcast hint: update batches can be any size — AQE broadcasts
    # the key projection when it fits, shuffles both sides when not
    kept = touched.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = kept.unionByName(updates.select(*kept.columns)).localCheckpoint(eager=True)
    emptied: list[str] = []
    if keys_move_partitions:
        # a migration can empty its old partition — the merged output
        # then lacks that partition entirely, so it must be DELETED
        # (dynamic overwrite would leave the stale row intact); the
        # staged commit folds the delete into the same atomic intent
        present = {r[0] for r in merged.select(partition_col).distinct().collect()}
        emptied = [d for d in days if d not in present]
    # all-or-nothing: staged write + persisted commit intent, never a
    # half-rewritten table after a crash (etl/commit.py)
    staged_overwrite_partitions(spark, table_path, merged, partition_col, emptied)
    return n_updates
