"""Distributed prefix sum + token-budget shard packing."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.packing import pack_by_token_budget
from reactionetl_etl_spark.operators.rank import global_running_sum


def _expected_cumsum(rows, exclusive):
    out, cum = {}, 0
    for k, v in sorted(rows):
        out[k] = cum if exclusive else cum + v
        cum += v
    return out


def test_global_running_sum_matches_single_window(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v int")
    for exclusive in (False, True):
        for bucket in (None, F.expr("k div 50")):
            got = {
                r["k"]: r["global_running_sum"]
                for r in global_running_sum(
                    df,
                    [F.col("k")],
                    [False],
                    "v",
                    exclusive=exclusive,
                    bucket_expr=bucket,
                    num_partitions=7,
                ).collect()
            }
            assert got == _expected_cumsum(rows, exclusive), (exclusive, bucket)


def test_global_running_sum_no_full_data_single_partition(spark):
    """The FULL data's cumsum window partitions on the bucket (and with
    bucket_expr there's no range exchange at all); the only
    single-partition exchange allowed is over the per-bucket TOTALS —
    an aggregate of ≤ n_buckets rows, never raw data. Pinned by
    requiring every SinglePartition exchange to sit above a
    HashAggregate (the totals), not above a data Sort/Project."""
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
    out = global_running_sum(
        df, [F.col("k")], [False], "v", bucket_expr=F.expr("k div 100")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan  # bucket replaces range sampling
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[i + 1 : i + 3])
            assert "HashAggregate" in below, (
                "single-partition exchange over non-aggregated data:\n" + below
            )


def test_pack_by_token_budget_properties(spark):
    """Shards are contiguous in order, start below the budget boundary,
    and agree with the greedy sequential layout."""
    rows = [(i, (i * 31) % 97 + 3) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id int, tok int")
    packed = pack_by_token_budget(
        df, "doc_id", "tok", budget=256, bucket_expr=F.expr("doc_id div 64")
    ).collect()
    by_id = sorted((r["doc_id"], r["tokens_before"], r["shard_id"]) for r in packed)
    cum = 0
    prev_shard = 0
    for doc_id, before, shard in by_id:
        assert before == cum
        assert shard == cum // 256
        assert shard >= prev_shard  # monotone ⇒ contiguous runs
        prev_shard = shard
        cum += dict(rows)[doc_id]


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id int, tok int")
    try:
        pack_by_token_budget(df, "doc_id", "tok", budget=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
