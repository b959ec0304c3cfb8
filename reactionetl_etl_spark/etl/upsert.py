"""Keyed upsert (MERGE emulation) for partitioned parquet tables.

The reference's W6 is a batched UPDATE-join propagating dim values into
facts (/root/reference/database_manager.py:200-240);
`materialize_enrichment` covers that exact shape. This module is the
GENERAL form — upsert an updates batch into a keyed table — for plain
parquet, which has no MERGE: rewrite ONLY the partitions the updates
touch as (existing rows anti-joined on the key) ∪ (updates), with a
dynamic partition overwrite. On Delta/Iceberg the whole function is
`MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`; call sites do not
change shape.

Scale posture: work ∝ size of TOUCHED partitions + updates, never the
full table; the anti-join keys on the upsert key within those
partitions only. Last-writer-wins inside a batch is made deterministic
by dropDuplicates on the key after ordering is the CALLER's concern —
this function requires key-unique updates and raises otherwise (a
silent arbitrary pick is how upserts corrupt tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> int:
    """Upsert ``updates`` into the parquet table at ``table_path``.

    Returns the number of update rows applied. Updates must carry the
    full table schema (including ``partition_col``) and be unique on
    ``key_cols``.
    """
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
    touched = table.filter(F.col(partition_col).isin(days))
    # no broadcast hint: update batches can be any size — AQE broadcasts
    # the key projection when it fits, shuffles both sides when not
    kept = touched.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = kept.unionByName(updates.select(*kept.columns)).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(table_path)
    )
    return n_updates
