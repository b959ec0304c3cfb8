"""Decompose a catalog query's bench time: builder vs execution.

The bench timer (bench.py::_time_plan) deliberately wraps the BUILDER
call (PERF_NOTES r6) — so a bench delta can come from plan-construction
work (driver metadata ops, eager checkpoints inside the builder) or
from actual execution. This tool splits the two: per query it times
N warm (builder-only) constructions and N warm (builder + noop-sink
execution) runs and prints medians, so a regression can be attributed
before any code is "fixed".

Usage:
    python tools/query_decompose.py semdedup_prune tfidf_top_terms ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/query_decompose.py all
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactionetl_etl_spark.plans.catalog import all_queries
from reactionetl_etl_spark.session import get_spark

RUNS = int(os.environ.get("SPARK_GRAFT_DECOMPOSE_RUNS", "5"))


def decompose(spark, sf_dir: str, names: list[str]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    qs = all_queries()
    for name in names:
        spec = qs[name]
        # one untimed cold run settles codegen/JIT for this plan family
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        build_times, full_times = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir)
            build_times.append(time.perf_counter() - t0)
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            full_times.append(time.perf_counter() - t0)
        out[name] = {
            "build_median": round(statistics.median(build_times), 3),
            "build_spread": [round(min(build_times), 3), round(max(build_times), 3)],
            "full_median": round(statistics.median(full_times), 3),
            "full_spread": [round(min(full_times), 3), round(max(full_times), 3)],
            "exec_est": round(
                statistics.median(full_times) - statistics.median(build_times), 3
            ),
        }
        print(f"{name}: {json.dumps(out[name])}", file=sys.stderr)
    return out


if __name__ == "__main__":
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "spark-graft-decompose", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(json.dumps(decompose(spark, sf_dir, names)))
    spark.stop()
