"""Benchmark harness: times the headline catalog queries.

Runs every catalog query flagged `bench=True` at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], executing
each plan to completion with a no-op sink (measures scan + compute +
shuffle, excludes driver-side row transfer), and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reactionetl_etl_spark.plans.catalog import bench_queries
from reactionetl_etl_spark.session import get_spark


def run_bench(sf_dir: str) -> dict:
    spark = get_spark("reactionetl-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths so the first timed query isn't charged
    # for session bring-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_queries().items()):
        df = spec.builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    spark.stop()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    return {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(run_bench(sf_dir)))
