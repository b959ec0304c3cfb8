"""Generate a pinned VALUES oracle for a deterministic rows-only query.

Some catalog queries are rows-only because DuckDB cannot re-derive the
computation (xxhash64 MinHash signatures, image decode, HLL sketches)
— but their OUTPUT on the fixed sf0.01 fixture is a deterministic
constant table (hash-seeded, RNG-free designs). Pinning that table as
a `SELECT * FROM (VALUES ...)` oracle upgrades the driver's check from
rows-only to full value-hash: it proves run-to-run determinism and
freezes the exact output contract (any behavior change trips the gate
loudly instead of silently).

The pin is sf0.01-specific by construction — the driver's correctness
gate runs at sf0.01 only (TESTDATA.md), and `tools/oracle_check.py`
defaults to the same; each generated oracle carries a comment saying
so.

Usage: python tools/pin_oracle.py <query> [sf_dir]
Prints the oracle SQL to paste into plans/catalog.py. Runs the query
TWICE and refuses to emit if the outputs differ (non-determinism).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from reactionetl_etl_spark.plans.catalog import all_queries
from reactionetl_etl_spark.session import get_spark

_DUCK_TYPES = {
    "int8": "BIGINT",
    "int16": "BIGINT",
    "int32": "BIGINT",
    "int64": "BIGINT",
    "float64": "DOUBLE",
    # REAL keeps the pandas dtype float32, matching Spark FloatType —
    # the driver's value hash is type-serialization-sensitive
    "float32": "REAL",
    "object": "VARCHAR",
    "bool": "BOOLEAN",
}


def _lit(v, dtype: str) -> str:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return f"CAST(NULL AS {dtype})"
    if dtype == "DOUBLE":
        # full round-trip repr: DuckDB parses the decimal literal to the
        # nearest double == the exact double Spark computed
        return f"CAST({v!r} AS DOUBLE)"
    if dtype == "REAL":
        # via DOUBLE: a bare decimal literal parses as DECIMAL, and
        # DuckDB's DECIMAL→REAL rounding can land one float32 ULP off;
        # repr→DOUBLE is exact (it IS the float32 value), DOUBLE→REAL
        # is then exact too
        return f"CAST(CAST({v!r} AS DOUBLE) AS REAL)"
    if dtype == "BIGINT":
        return str(int(v))
    if dtype == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def pin(name: str, sf_dir: str) -> str:
    spec = all_queries()[name]
    spark = get_spark("pin-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    a = spec.builder(spark, sf_dir).toPandas()
    b = spec.builder(spark, sf_dir).toPandas()
    key = list(a.columns)
    sa = a.sort_values(key).reset_index(drop=True)
    sb = b.sort_values(key).reset_index(drop=True)
    if not sa.equals(sb):
        raise SystemExit(f"{name}: two runs differ — NOT deterministic, refusing to pin")
    dtypes = {c: _DUCK_TYPES.get(str(a[c].dtype), None) for c in a.columns}
    for c, t in dtypes.items():
        if t is None:
            raise SystemExit(f"{name}: column {c} has unsupported dtype {a[c].dtype}")
    rows = []
    for r in sa.itertuples(index=False):
        vals = ", ".join(_lit(v, dtypes[c]) for v, c in zip(r, sa.columns))
        rows.append(f"        ({vals})")
    # quoted identifiers: column names like `left`/`right` are reserved
    cols = ", ".join(f'"{c}"' for c in sa.columns)
    body = ",\n".join(rows)
    scale = os.path.basename(sf_dir.rstrip("/"))
    return (
        f"    -- PINNED VALUES oracle (tools/pin_oracle.py @ {scale}):\n"
        f"    -- deterministic output frozen as the value contract; valid at\n"
        f"    -- {scale} ONLY (the gate matches pins to the scale under check).\n"
        f"    SELECT * FROM (VALUES\n{body}\n    ) AS t({cols})\n"
    )


if __name__ == "__main__":
    q = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    print(pin(q, sf))
