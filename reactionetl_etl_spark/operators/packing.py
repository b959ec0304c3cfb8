"""Training-shard assembly: token-budget sequence packing.

An LLM data pipeline's last step before export is turning a cleaned,
deduplicated corpus into fixed-token-budget training shards: documents
are laid out in a deterministic order and cut into shards of ~budget
tokens each, so every shard feeds a comparable amount of work to the
trainer and a resumed export reproduces the same layout byte-for-byte.

Spark-first formulation: shard assignment is a pure function of the
EXCLUSIVE running token total in document order —

    shard_id(d) = floor(sum(tokens of docs before d) / budget)

(exclusive, so a document's own length never pushes it out of the
shard it starts in; a shard therefore holds a contiguous run of
documents and may overshoot the budget by at most one document — the
classic greedy layout). The running total comes from
`rank.global_running_sum`, the distributed prefix-sum primitive — NO
single-partition window at any scale; with a monotone ``bucket_expr``
(dense ids, ingestion date) it needs no persist and no range sampling
either.

Pair with `io.files.write_sharded` (maxRecordsPerFile) when shards
must also be bounded in FILE size; this operator bounds them in TOKEN
count, which is what the trainer schedules by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.rank import global_running_sum


def pack_by_token_budget(
    docs: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    shard_col: str = "shard_id",
    bucket_expr: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a training-shard id under a token budget.

    ``order_col`` must be a total order (unique). Adds ``shard_col``
    (0-based, contiguous, monotone in the order) and ``tokens_before``
    (the document's offset inside the global token stream — its start
    position for trainers that pack sequences back-to-back).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    cum = global_running_sum(
        docs,
        [F.col(order_col)],
        [False],
        token_col,
        out_col="tokens_before",
        exclusive=True,
        bucket_expr=bucket_expr,
        num_partitions=num_partitions,
    )
    return cum.withColumn(
        shard_col, F.floor(F.col("tokens_before") / F.lit(budget)).cast("bigint")
    )
