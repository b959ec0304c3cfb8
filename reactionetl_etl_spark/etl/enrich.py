"""Enrichment stage (EP3): surrogate-key assignment + fact enrichment.

Reference semantics (/root/reference/database_manager.py:200-240 and
create_tables.sql:32-35):
- each dim row gets a dense `simulation_num` from a PostgreSQL sequence;
- fact rows then acquire their dim's `simulation_num` by simulation_id
  equality, via a 50-key-batched UPDATE-join loop whose batching exists
  only to bound transaction size.

Spark version:
- dense sequence = `row_number() OVER (ORDER BY date_run, simulation_id)`
  offset by the current max (deterministic & stable across incremental
  runs because (date_run, simulation_id) is a total order and history is
  append-only). Single-partition window — the dim is one row per
  simulation, small by construction; never do this on a fact table.
- enrichment = ONE broadcast left join + coalesce; the fact side never
  shuffles. At 100 TB the fact table streams through the join
  map-side; a dim too big to broadcast falls back to AQE-planned
  shuffle join (pass broadcast_dim=False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.relational import dense_sequence, enrich_with_dim


def assign_simulation_nums(
    new_dim_rows: DataFrame, current_max: int | None, approx_rows: int | None = None
) -> DataFrame:
    """X4: extend the dense sequence over newly loaded dim rows.

    `current_max` is the max simulation_num already persisted (None/0 on
    first load — the reference's NULL-start fragility, SURVEY.md §3 EP3,
    handled here with coalesce semantics). ``approx_rows``: pass the
    batch's file count (dim rows ≤ files) so small batches take the
    one-task window instead of the distributed rank's 4 extra stages.
    """
    offset = int(current_max or 0)
    seq = dense_sequence(
        new_dim_rows,
        ["date_run", "simulation_id"],
        "simulation_num",
        offset,
        approx_rows=approx_rows,
    )
    return seq.withColumn("simulation_num", F.col("simulation_num").cast("int"))


def current_max_simulation_num(dim: DataFrame) -> int:
    """A1: scalar max() driving the sequence offset
    (database_manager.py:207,212), NULL-safe."""
    row = dim.agg(F.coalesce(F.max("simulation_num"), F.lit(0)).alias("m")).first()
    return int(row["m"])


def enrich_fact(fact: DataFrame, dim: DataFrame, broadcast_dim: bool = True) -> DataFrame:
    """J1/F1: fill NULL simulation_num on fact rows from the dim, one pass.

    Rows already enriched keep their value (the reference's
    `fs.simulation_num IS NULL` guard); unmatched fact rows stay NULL
    and are picked up by a later run once their metadata arrives —
    exactly the reference's interleaved-run behavior.
    """
    return enrich_with_dim(
        fact,
        dim.select("simulation_id", "simulation_num"),
        "simulation_id",
        ["simulation_num"],
        broadcast_dim=broadcast_dim,
    )
