"""Streaming sinks beyond the native formats: foreachBatch bridges.

Structured Streaming has no built-in JDBC sink; the standard pattern is
`writeStream.foreachBatch(fn)` — each micro-batch arrives as a normal
DataFrame, so the batch JDBC writer (io/jdbc.py) applies unchanged and
the checkpoint still tracks exactly-once *batch* delivery (the warehouse
sees at-least-once on retry: make the table idempotent via a batch_id
column or dedup key, same as any foreachBatch sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from reactionetl_etl_spark.io.jdbc import write_fact_jdbc


def jdbc_batch_writer(url: str, table: str = "fact_sim", writer_factory=None):
    """Build the foreachBatch callback: (batch_df, batch_id) → COPY-
    parity append. Exposed separately so tests can drive the callback
    with plain DataFrames — foreachBatch passes exactly this shape."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_fact_jdbc(batch_df, url, table, writer_factory=writer_factory)

    return write_batch


def stream_to_jdbc(
    stream_df: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    writer_factory=None,
):
    """writeStream → warehouse: micro-batched COPY-parity appends.

    AvailableNow by default (drain the backlog, stop) — matching the
    reference's batch cadence; pass False for a continuous micro-batch
    stream.
    """
    writer = (
        stream_df.writeStream.foreachBatch(
            jdbc_batch_writer(url, table, writer_factory=writer_factory)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
