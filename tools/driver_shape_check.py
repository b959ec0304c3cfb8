"""Driver-shaped re-verification of selected queries.

The engine's own gate (`oracle_check.py`) runs under `get_spark()` —
the ENGINE's session config. The real driver builds a vanilla session
(its own master/partitions/timezone), so session-config-dependent
determinism (timezone handling, partition counts feeding any
order-sensitive fold) would pass locally and fail the driver. This
tool replays the full oracle comparison for the NAMED queries under a
deliberately hostile vanilla session: plain builder, local[8],
non-UTC DST-free-but-weird timezone, default shuffle partitions.

Usage: TZ=Pacific/Kiritimati python tools/driver_shape_check.py q1 q2 ...
       (with no names: the top SWEEP_N=50 queries of the committed
       ledger ordering, `plans/catalog._PRIORITY` — the same
       new-first/churned-first/oldest-stale-first rotation the
       driver's value-hash window samples from. Regenerating the
       ledger each round (tools/verify_ledger.py --priority) therefore
       rotates BOTH windows through the catalog together — full-
       catalog session-shape coverage in ~5 rounds at 50/round
       (r10 verdict item 4; previously a hand-picked 28-query list).)

Extra hostile axes (r11 verdict item 7 — the configs most likely to
flip a plan-shape or hash-partitioning assumption):
  SPARK_GRAFT_SHAPE_MASTER   master override (default local[8];
                             sweep local[4] to vary scan parallelism)
  SPARK_GRAFT_SHAPE_SHUFFLE  spark.sql.shuffle.partitions override
                             (unset = Spark default 200; sweep 1 —
                             every shuffle collapses to one partition,
                             exposing partition-order folds — and 7,
                             a prime that misaligns every modular key)
  SPARK_GRAFT_SHAPE_ARROW    set to "false" to disable
                             spark.sql.execution.arrow.pyspark.enabled
                             (r12 verdict item 6 — the axis the
                             TZ/master/shuffle sweep doesn't cover).
                             Scope note: this flag governs only the
                             driver-side pandas conversions (toPandas /
                             createDataFrame-from-pandas); pandas UDFs,
                             mapInPandas and applyInPandas* transfer
                             via Arrow REGARDLESS of it (Spark has no
                             non-Arrow execution for them), so the
                             sweep certifies the engine's own
                             local-relation builds and the check
                             harness's collection path, not a
                             hypothetical Arrow-free UDF engine.
  SPARK_GRAFT_SHAPE_AQE      set to "false" to disable
                             spark.sql.adaptive.enabled (late-r13 —
                             AQE rewrites plans at RUNTIME: shuffle
                             coalescing, broadcast-join demotion/
                             promotion, skew-join splitting. The
                             engine leans on AQE for scale, so every
                             result must be bit-identical WITHOUT it:
                             a query whose values depend on AQE's
                             post-shuffle partition count has an
                             order-sensitive fold bug by definition)
  SPARK_GRAFT_SHAPE_CODEGEN  set to "false" to disable
                             spark.sql.codegen.wholeStage — every
                             expression runs on the interpreted
                             (non-generated) evaluation path instead
                             of fused Java codegen. The engine's perf
                             story leans on wide codegen spans, so
                             results must be identical WITHOUT them;
                             a divergence means an expression relies
                             on codegen-specific evaluation order or
                             overflow behavior
  SWEEP_N / SPARK_GRAFT_SHAPE_SWEEP_N  how deep into _PRIORITY to go
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

from reactionetl_etl_spark.plans.catalog import _PRIORITY, all_queries
from reactionetl_etl_spark.sources.tables import TABLE_NAMES
from tools.oracle_check import dtype_mismatches, normalize_rows

SWEEP_N = int(os.environ.get("SPARK_GRAFT_SHAPE_SWEEP_N", "50"))


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or list(_PRIORITY[:SWEEP_N])

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    builder = SparkSession.builder.master(
        os.environ.get("SPARK_GRAFT_SHAPE_MASTER", "local[8]")
    ).appName("driver-shape-check")
    shuffle = os.environ.get("SPARK_GRAFT_SHAPE_SHUFFLE")
    if shuffle:
        builder = builder.config("spark.sql.shuffle.partitions", shuffle)
    arrow = os.environ.get("SPARK_GRAFT_SHAPE_ARROW")
    if arrow:
        builder = builder.config("spark.sql.execution.arrow.pyspark.enabled", arrow)
    aqe = os.environ.get("SPARK_GRAFT_SHAPE_AQE")
    if aqe:
        builder = builder.config("spark.sql.adaptive.enabled", aqe)
    codegen = os.environ.get("SPARK_GRAFT_SHAPE_CODEGEN")
    if codegen:
        builder = builder.config("spark.sql.codegen.wholeStage", codegen)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    failures = []
    for name in names:
        spec = qs[name]
        try:
            sdf = spec.builder(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        oracle = spec.oracle
        if "PINNED VALUES oracle" in oracle and not sf_dir.rstrip("/").endswith(
            "sf0.01"
        ):
            # same scale-matched pin swap as tools/oracle_check.py: pins
            # encode sf0.01 outputs; at sf0.1 use the sf0.1 pin when one
            # exists, else degrade to a rows-only check — so the sweep
            # can run at SF_DIR=/root/testdata/sf0.1 (10x data + hostile
            # session in one axis, r12)
            sf01_pin = None
            if sf_dir.rstrip("/").endswith("sf0.1"):
                from reactionetl_etl_spark.plans.pinned_sf0_1 import (
                    PINNED_ORACLES_SF0_1,
                )

                sf01_pin = PINNED_ORACLES_SF0_1.get(name)
            if sf01_pin is None:
                print(f"rows  {name}: {len(sdf)} rows (pin is sf0.01-only)")
                continue
            oracle = sf01_pin
        odf = con.execute(oracle).fetchdf()
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
            continue
        bad = dtype_mismatches(sdf, odf)
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: dtype mismatch: {bad}")
            continue
        if normalize_rows(sdf) != normalize_rows(odf):
            failures.append(name)
            print(f"FAIL  {name}: value mismatch")
            continue
        print(f"ok    {name}: {len(sdf)} rows")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall driver-shape checks match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
