"""Bucketed tables: shuffle-free co-located joins.

At 100 TB, the recurring fact⋈fact join (orders⋈lineitem on orderkey,
events⋈events on user) pays a full shuffle of both sides every query.
Bucketing pre-pays it once: `bucketBy(n, key)` + `sortBy(key)` at write
time hash-partitions rows into fixed files per bucket; two tables
bucketed the same way join bucket-to-bucket with NO exchange and (with
sortBy) no re-sort — the sort-merge join reads both sides ready.

This is the Spark analogue of the reference's B-tree indexes
(create_indexes.sql:1-17): a physical layout investment that
accelerates the known query workload. Requires a catalog table
(saveAsTable) — bucketing metadata lives in the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket counts the planner emits a sort-merge join
    with ZERO Exchange operators — verify with .explain(); the test
    suite asserts it.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=key, how=how)
