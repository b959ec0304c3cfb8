"""JDBC sink: PostgreSQL-parity terminal store.

The reference's terminal store is PostgreSQL — bulk COPY for the fact
table (/root/reference/database_manager.py:89-93, `copy fact_sim
(<cols>) from ... with (format csv, header match)`) and row INSERTs
for the dim table (:125-130). The lakehouse keeps parquet as its
native store; this module closes the source/sink asymmetry for users
whose downstream is a warehouse: `df.write.jdbc(..., mode="append")`
with the same column-order conformance COPY's `header match` gives.

Spark's JDBC writer is the COPY analogue at scale: each of the df's
partitions opens its own connection and streams batched INSERTs in
parallel — cap parallelism with ``num_partitions`` so a 1000-executor
write doesn't open 1000 connections against one warehouse.

No live database ships in this environment, so tests exercise the
writer configuration through an injectable writer factory; the option
surface (url/dbtable/batchsize/isolationLevel/numPartitions/append) is
exactly what `DataFrameWriter.jdbc` consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# COPY's `header match` semantics: the reference names every data column
# explicitly and lets the server match order. Our fact parquet schema
# carries lineage/partition extras the warehouse table doesn't have —
# conform to the reference's table column lists (create_tables.sql:2-30;
# fact row_id/simulation_num are server-assigned there, so they are
# excluded from the COPY column set, database_manager.py:88-90).
FACT_SIM_COLS = [
    "simulation_id",
    "ca",
    "cb",
    "cc",
    "cd",
    "temperature",
    "t_sensor",
    "rxn_time",
]

DIM_RXN_COLS = [
    "simulation_id",
    "simulation_num",
    "reaction_name",
    "activation_energy",
    "ca0",
    "cb0",
    "t0",
    "date_run",
    "stop_reason",
    "stop_time_s",
]


def conform_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Project to ``cols`` in order; missing columns are an error (the
    reference's COPY fails the same way on a header mismatch)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"DataFrame lacks required sink columns: {missing}")
    return df.select(*cols)


def configure_jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
    num_partitions: int | None = None,
    driver: str | None = None,
    writer_factory=None,
):
    """Build the configured DataFrameWriter (not yet saved).

    ``writer_factory(df) -> writer`` is injectable for tests; default
    is the real ``df.write``.
    """
    w = (writer_factory or (lambda d: d.write))(df)
    w = (
        w.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
        .mode(mode)
    )
    if num_partitions is not None:
        w = w.option("numPartitions", str(num_partitions))
    if driver is not None:
        w = w.option("driver", driver)
    return w


def write_fact_jdbc(
    df: DataFrame,
    url: str,
    table: str = "fact_sim",
    num_partitions: int | None = 32,
    writer_factory=None,
) -> None:
    """COPY-parity fact append (database_manager.py:80-106): conform to
    fact_sim's column order, append in parallel batches."""
    out = conform_columns(df, FACT_SIM_COLS)
    configure_jdbc_writer(
        out, url, table, mode="append", num_partitions=num_partitions, writer_factory=writer_factory
    ).save()


def write_dim_jdbc(
    df: DataFrame,
    url: str,
    table: str = "dim_rxn",
    writer_factory=None,
) -> None:
    """INSERT-parity dim append (database_manager.py:108-135). Dims are
    small: single connection (numPartitions=1) keeps PK-violation
    ordering deterministic."""
    out = conform_columns(df, DIM_RXN_COLS)
    configure_jdbc_writer(
        out, url, table, mode="append", num_partitions=1, writer_factory=writer_factory
    ).save()
