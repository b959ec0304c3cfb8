"""Small-file compaction for parquet tables.

Incremental loading (one append per run, pipeline.py) accumulates small
parquet files; at 100 TB small files are the dominant metadata +
open-cost tax on every downstream scan. The reference's analogue is its
planned merge many CSVs into one COPY (README.md:29) and the
drop/recreate-indexes dance (M4) — both about amortizing per-unit load
cost.

`compact_table` rewrites a (optionally partitioned) parquet table into
~target-sized files: one distributed read, a per-partition coalesce to
ceil(bytes/target) files, and a dynamic-partition overwrite. Run it out
of band (the manifest/audit tables are tiny and never need it; fact
tables do after many increments).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if not n.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, n))
    return total


def compact_table(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ~``target_file_mb`` files; returns the file
    count written. Uses on-disk size as the sizing signal (parquet-
    compressed bytes, which is what scan cost tracks).

    ``sort_cols`` clusters rows within each output file (sortWithin-
    Partitions) so parquet row-group min/max stats become selective on
    those columns — the data-skipping analogue of the reference's
    composite B-tree indexes (create_indexes.sql: (ca,cb,rxn_time,
    temperature), (rxn_time,temperature)). A range predicate on the
    leading sort column then prunes most row groups at scan time.
    """
    n_bytes = _dir_bytes(path)
    n_files = max(1, round(n_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    # Break lineage (localCheckpoint) so we can overwrite the source;
    # on Delta/Iceberg this whole function is OPTIMIZE (+ ZORDER).
    df = df.localCheckpoint(eager=True)
    if sort_cols:
        # RANGE-partition on the sort key so each output file covers a
        # narrow value slice (plain repartition round-robins rows and
        # every file would span the whole range), then sort inside.
        writer = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        writer = writer.sortWithinPartitions(*sort_cols)
    elif partition_col is None:
        writer = df.repartition(n_files)
    else:
        writer = df.repartition(n_files, F.col(partition_col))
    w = writer.write.mode("overwrite")
    if partition_col is not None:
        w = w.partitionBy(partition_col).option("partitionOverwriteMode", "dynamic")
    w.parquet(path)
    written = 0
    for root, _dirs, names in os.walk(path):
        written += sum(1 for n in names if n.endswith(".parquet"))
    return written
