"""Parquet table loaders for the benchmark/test star schema.

The driver ships TPC-H-ish parquet tables (TESTDATA.md). We read them
with `spark.read.parquet` so Catalyst gets parquet statistics, filter
pushdown, and column pruning for free. No schema inference cost —
parquet footers carry the schema.

At 100 TB these would be directory-partitioned (e.g. orders by month)
and the loaders below would pick partition pruning up automatically —
the call sites don't change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Table-handle cache, keyed on (application, dir, table). The star-
# schema fixtures are immutable files, and `spark.read.parquet` pays
# driver-side metadata work EVERY call (file listing + footer/schema
# read — ~0.1 s per table locally; the events loader adds a probe
# read). A real deployment holds this metadata in a catalog/metastore
# and resolves it once; re-listing per query charged multi-table join
# queries 0.3-0.5 s of pure metadata ops in the r6 bench (misread there
# as an execution regression). DataFrames are immutable plan handles —
# reuse is semantically identical to a fresh read of identical files.
_HANDLES: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    df = _HANDLES.get(key)
    if df is None:
        if name == "events":
            df = load_events(spark, sf_dir)  # memoizes under the same key
        else:
            df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        _HANDLES[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so `spark.sql` can address them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# `events.ts` has shipped in two physical encodings across testdata
# generations: parquet TIMESTAMP(MICROS) (Spark reads it natively as
# TIMESTAMP_NTZ) and TIMESTAMP(NANOS), which Spark's parquet reader
# rejects outright ([PARQUET_TYPE_ILLEGAL]). For the nanos encoding,
# reading the physical INT64 with an explicit LongType schema keeps the
# scan fully distributed + pushdown-capable, and `ts_ntz` reconstructs
# a microsecond TIMESTAMP_NTZ timezone-independently (no session-tz
# dependency). The loader probes the native read first and falls back,
# so the contract is stable either way: all file columns plus `ts_ntz`
# (always TIMESTAMP_NTZ).
EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanoseconds
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON document
    ]
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with `ts_ntz` (timestamp_ntz) alongside the file's
    native columns, independent of the file's timestamp unit.

    Memoized in the same `_HANDLES` cache as `load_table`: 35 catalog
    builders call this directly, and the uncached path pays the probe
    read + footer metadata per builder call (~0.2 s — the same
    metadata-re-resolution cost the r7 handle memo removed from
    `load_table` callers; `asof_click_to_purchase`'s r7 bench residual
    traced here)."""
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), "events")
    cached = _HANDLES.get(key)
    if cached is not None:
        return cached
    df = _load_events_uncached(spark, sf_dir)
    _HANDLES[key] = df
    return df


def _load_events_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    try:
        df = spark.read.parquet(path)
        # KeyError here (no `ts` column) is real schema drift — let it
        # propagate instead of silently reading an all-NULL frame
        # through the nanos fallback (ADVICE r4).
        ts_type = df.schema["ts"].dataType
    except AnalysisException:  # TIMESTAMP(NANOS) → PARQUET_TYPE_ILLEGAL
        df, ts_type = None, None
    if df is not None and isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        return df.withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    df = spark.read.schema(EVENTS_NANOS_SCHEMA).parquet(path)
    return df.withColumn(
        "ts_ntz",
        F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
    )
