"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing summary) on sf0.001.
queries()     — every implemented query/operator from SURVEY.md §2,
                as (spark, sf_dir) -> DataFrame callables.
oracle_sql()  — matching DuckDB-runnable ANSI SQL per query (omitted
                for non-SQL-expressible ops → rows-only check).

All definitions live in `reactionetl_etl_spark.plans.catalog`; this
module just adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from reactionetl_etl_spark.plans.catalog import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
