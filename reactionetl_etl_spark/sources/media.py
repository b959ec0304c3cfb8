"""Binary media ingestion: the binaryFile source.

Multimodal companion to `operators/multimodal.py`: reads a directory of
opaque media blobs (images/audio/video) into (path, modificationTime,
length, content) rows, filtered by glob. Partition sizing for blob
tables differs from row tables — one task should hold ~128 MB of
payload, so `maxPartitionBytes` (not row counts) is the lever, and
`pathGlobFilter` prunes at listing time, before any byte is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    id_from_name: bool = True,
) -> DataFrame:
    """Load media blobs under ``path`` matching ``glob``.

    Returns (media_id, source_file, n_bytes, content). media_id is a
    deterministic hash of the file path unless the filename stem is an
    integer (then that), so re-ingestion is stable.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("source_file"),
            F.col("length").alias("n_bytes"),
            "content",
        )
    )
    stem = F.regexp_extract(F.col("source_file"), r"([^/]+)\.[^./]+$", 1)
    media_id = (
        F.when(stem.rlike(r"^[0-9]+$"), stem.cast("long"))
        .otherwise(F.xxhash64("source_file"))
        if id_from_name
        else F.xxhash64("source_file")
    )
    return df.withColumn("media_id", media_id).select(
        "media_id", "source_file", "n_bytes", "content"
    )
