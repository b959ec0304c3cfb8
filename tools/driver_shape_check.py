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
       (defaults to every query tagged in _DEFAULT below)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

from reactionetl_etl_spark.plans.catalog import all_queries
from reactionetl_etl_spark.sources.tables import TABLE_NAMES
from tools.oracle_check import dtype_mismatches, normalize_rows

_DEFAULT = [
    "trigram_perplexity_scores",
    "part_triangle_clustering",
    "knn_label_predict",
    "supplier_pareto_frontier",
    "lineitem_correlation_matrix",
    "rm3_expanded_search",
    "jaccard_prefix_join_pairs",
    "nation_revenue_trend",
    "events_cusum_alarms",
    "orders_benford_deviation",
    "incremental_join_materialize",
    "personalized_pagerank_parts",
    "part_neighbor_jaccard",
    "copurchase_assortativity",
    "events_trimmed_mean_udaf",
    "asof_cogroup_pandas",
    "tfidf_cosine_pairs",
    "doc_compression_by_source",
    "customer_spend_balance_spearman",
    "event_trigram_paths",
    # r10 families (all passed the hostile-session check in-round)
    "copurchase_label_propagation",
    "monthly_revenue_holt",
    "nation_revenue_gini",
    "search_mrr_eval",
    "matryoshka_truncation_profile",
    "lang_unigram_entropy",
    "lang_id_confusion",
    "weekly_ltv_cohorts",
]


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or _DEFAULT

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-shape-check")
        .getOrCreate()
    )
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
        odf = con.execute(spec.oracle).fetchdf()
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
