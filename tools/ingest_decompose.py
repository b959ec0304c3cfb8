"""Decompose etl_ingest bench time into its phases (PERF_NOTES method).

BENCH_r05 recorded etl_ingest warm at 9.47 s where the committed
audit-rewrite A/B predicted ~7.2 s. This harness reproduces the bench's
exact loop (fresh incoming batch + throwaway lake per run, same file
counts) but times each phase separately:

    gen        — fixture generation (untimed by bench; sanity only)
    discovery  — _new_files listing + manifest anti-join
    csv        — cleanse CSVs + fact append + status checkpoint + tally
    json       — cleanse JSONs + dim append + status checkpoint + tally
    audit      — audit + manifest appends
    enrich     — materialize_enrichment

Usage: python tools/ingest_decompose.py [n_runs]
Prints per-run phase seconds + the run total, then medians.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _gen_incoming
from reactionetl_etl_spark.session import get_spark


def timed_run(spark, phases: dict[str, list[float]]) -> float:
    from reactionetl_etl_spark.etl import pipeline as P

    work = tempfile.mkdtemp(prefix="ingest_decomp_")
    try:
        incoming = os.path.join(work, "incoming")
        _gen_incoming(incoming)
        lake = P.ReactionLake(os.path.join(work, "lake"))
        t_run0 = time.perf_counter()

        # --- inline run_once with phase timers (mirrors pipeline.run_once;
        # keep in sync when the pipeline changes) ---
        spark_mark = time.perf_counter
        from datetime import datetime, timezone

        from reactionetl_etl_spark.sources.raw import list_raw_files

        t0 = spark_mark()
        csvs = lake._new_files(spark, list_raw_files(incoming, ".csv"))
        jsons = lake._new_files(spark, list_raw_files(incoming, ".json"))
        phases["discovery"].append(spark_mark() - t0)

        now = datetime.now(timezone.utc).replace(tzinfo=None)
        # time the full run_once minus what discovery already cost by
        # calling the real method (it redoes discovery; subtract later)
        t0 = spark_mark()
        lake.run_once(spark, incoming, now=now)
        phases["run_once"].append(spark_mark() - t0)
        # the pipeline's own per-phase timers (listing / dims /
        # fact_cleanse_write / fact_status / audit_manifest) — finer
        # than this harness's block timers, zero sync burden
        for k, v in lake.last_phase_timings.items():
            phases.setdefault(f"rp_{k}", []).append(v)

        t0 = spark_mark()
        lake.materialize_enrichment(spark)
        phases["enrich"].append(spark_mark() - t0)

        total = time.perf_counter() - t_run0
        phases["total"].append(total)
        return total
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(
        "ingest-decompose", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    phases: dict[str, list[float]] = {
        k: [] for k in ("discovery", "run_once", "enrich", "total")
    }
    for i in range(n_runs):
        t = timed_run(spark, phases)
        print(
            f"run {i}: total={t:.2f}s "
            + " ".join(f"{k}={phases[k][-1]:.2f}" for k in phases if phases[k])
        )
    print("--- medians (excluding cold run 0) ---")
    for k, v in phases.items():
        if len(v) > 1:
            print(f"{k}: median={statistics.median(v[1:]):.2f}s all={[round(x,2) for x in v]}")
    spark.stop()


if __name__ == "__main__":
    main()
