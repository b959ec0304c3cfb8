"""Mirror of the driver's correctness gate at sf0.001 (fast).

Every oracle-backed catalog query must agree with DuckDB on row count,
column set, and sorted value matrix.
"""

from __future__ import annotations

import duckdb
import pytest

from reactionetl_etl_spark.plans.catalog import all_queries
from reactionetl_etl_spark.sources.tables import TABLE_NAMES
from tools.oracle_check import dtype_mismatches, normalize_rows

ORACLE_QUERIES = sorted(n for n, s in all_queries().items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, sf_dir, duck, name):
    spec = all_queries()[name]
    if "PINNED VALUES oracle" in spec.oracle and not sf_dir.rstrip("/").endswith("sf0.01"):
        # pinned constant tables encode sf0.01 outputs (the driver's
        # correctness scale); at this suite's scale they are wrong by
        # construction — run the query, skip the value compare (same
        # degradation tools/oracle_check.py applies)
        spec.builder(spark, sf_dir).collect()
        pytest.skip("pinned VALUES oracle is sf0.01-only")
    sdf = spec.builder(spark, sf_dir).toPandas()
    odf = duck.execute(spec.oracle).fetchdf()
    assert len(sdf) == len(odf), f"rowcount spark={len(sdf)} duckdb={len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert not dtype_mismatches(sdf, odf), (
        "driver value hash is type-sensitive; cast the oracle (sum()::BIGINT etc.) "
        f"so DuckDB dtypes equal Spark's: {dtype_mismatches(sdf, odf)}"
    )
    assert normalize_rows(sdf) == normalize_rows(odf)
