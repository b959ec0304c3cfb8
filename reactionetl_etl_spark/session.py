"""SparkSession factory.

Single place where engine-level Spark configuration lives. Local mode
defaults are sized for the test container (local[32], 128 GiB); on a
real cluster the same code runs unchanged — only master/memory configs
differ, and those come from spark-submit, not from here.

Scale posture:
- AQE on (runtime re-plan: coalesce shuffle partitions, skew-join
  splitting, dynamic broadcast decisions).
- shuffle.partitions default kept modest locally; AQE coalesces up,
  cluster deployments set ~2-3x total cores.
- Arrow enabled for the pandas-UDF paths (vectorized Python).
- Session timezone pinned to UTC so timestamp semantics are
  deterministic across environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~10 MB broadcast threshold is Spark's default; raise a bit — our
    # dims (region/nation/date-like) are tiny even at 100 TB fact scale.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # keep partition values (e.g. day=2026-01-05) as strings — type
    # inference would silently turn the ETL `day` column into a DATE
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    "spark.sql.parquet.aggregatePushdown": "true",
    # runtime bloom-filter join pruning: a selective dim filter injects
    # a might_contain() semi-filter on the fact side pre-shuffle
    # (pinned by test_runtime_bloom_filter_prunes_fact_side)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Python call-site capture for DataFrame error context costs ~3
    # py4j round-trips per DataFrame op (a conf.get + origin set/clear)
    # — measured ~30-40% of plan-construction time on multi-op builders.
    # A batch engine takes the error message without the Python line
    # origin; debugging sessions can flip it back on per-run.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def cluster_conf(
    total_cores: int,
    executor_mem_gb: int = 32,
) -> dict[str, str]:
    """Recommended overrides for a REAL cluster run at ~100 TB — the
    documented delta from the local `_DEFAULTS` (pass to `get_spark`
    as overrides, or mirror into spark-submit --conf):

    - shuffle.partitions ≈ 2-3× total cores: enough granularity for
      AQE to coalesce DOWN (it never splits up non-skewed partitions),
      sized so a ~200 MB-per-partition shuffle of a multi-TB stage
      fits executor memory with headroom.
    - maxPartitionBytes stays 128 MB (scan-task sizing is about
      per-task decode cost, not cluster size).
    - advisoryPartitionSizeInBytes 128 MB guides AQE's coalescing and
      skew-split target.
    - autoBroadcastJoinThreshold stays 64 MB: dims are the same size
      regardless of fact scale; raising it further risks driver OOM
      collecting a mis-estimated side.
    - RocksDB state store for streaming: state beyond executor-heap
      scale (sessionization over millions of users) spills to local
      disk instead of OOMing.
    """
    return {
        "spark.sql.shuffle.partitions": str(max(2 * total_cores, 200)),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024 * 1024),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    }


def get_spark(app_name: str = "reactionetl-etl-spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Master resolution: $SPARK_GRAFT_MASTER > local[$SPARK_GRAFT_CPUS] >
    local[*]. On a cluster, spark-submit's --master wins because an
    existing session is returned as-is.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
