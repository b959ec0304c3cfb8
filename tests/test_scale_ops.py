"""Tests for scale-oriented operators: salted join, compaction,
grouped-map transforms, and custom stateful streaming."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.compact import compact_table
from reactionetl_etl_spark.operators.grouped import (
    zscore_per_group_pandas,
    zscore_per_group_window,
)
from reactionetl_etl_spark.operators.skew import salted_join
from reactionetl_etl_spark.sources.tables import load_events, load_table
from reactionetl_etl_spark.streaming.stateful import running_totals_per_user


def test_asof_join_semantics(spark):
    """Tie handling: non-strict matches a simultaneous right row,
    strict does not; rows before any right row get NULL."""
    from reactionetl_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d")],
        "k int, ts int, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0)], "k int, ts int, payload double"
    )
    loose = {
        r["name"]: r["payload"]
        for r in asof_join(left, right, "k", "ts", "ts", ["payload"]).collect()
    }
    assert loose == {"a": None, "b": 100.0, "c": 150.0, "d": None}
    strict = {
        r["name"]: r["payload"]
        for r in asof_join(left, right, "k", "ts", "ts", ["payload"], strict=True).collect()
    }
    assert strict == {"a": None, "b": None, "c": 150.0, "d": None}


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting redistributes work but never changes results — including
    under heavy synthetic skew (90% of rows share one key)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    skewed = orders.withColumn(
        "o_custkey", F.when(F.rand(42) < 0.9, F.lit(1)).otherwise(F.col("o_custkey"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = skewed.join(cust, "o_custkey").groupBy("c_nationkey").count()
    salted = salted_join(skewed, cust, "o_custkey", n_salts=8).groupBy("c_nationkey").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE's skew-join handling (session.py enables it) demonstrably
    fires on a 90%-hot-key sort-merge join: the FINAL adaptive plan
    marks the SMJ `skew=true`, meaning the hot key's oversized shuffle
    partition was split across multiple tasks at runtime with no code
    change. This is the first line of defense at 100 TB; `salted_join`
    remains the lever for the case AQE cannot split — a broadcast-
    ineligible build side or a single hot key on BOTH join sides
    (AQE splits one side's partition but must then replicate the
    other side's matching partition; when both are huge, salt).
    Thresholds are production-defaults-scaled-down (256 MB → 32 KB) so
    the fixture-sized join exhibits the same decision the real
    thresholds produce on real partitions."""
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        fact = (
            spark.range(60_000)
            .select(
                F.when(F.col("id") % 10 < 9, F.lit(1))
                .otherwise(F.col("id"))
                .alias("k"),
                F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
            )
        )
        dim = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("dv"))
        res = fact.join(dim, "k").agg(F.count("*").alias("n"), F.sum(F.length("pad")).alias("b"))
        [row] = res.collect()
        # hot key 1 → 54 000 fact rows × 1 dim row; tail keys k=id
        # (id%10==9) match dim only for id<100: ids 9,19,…,99 → 10 rows
        assert row["n"] == 54_010
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_compact_table_reduces_files(spark, tmp_path):
    """Many small appends → one compaction → few right-sized files,
    identical contents."""
    path = str(tmp_path / "t")
    for i in range(8):
        spark.range(i * 1000, (i + 1) * 1000).withColumn(
            "day", F.lit(f"2026-0{i % 2 + 1}-01")
        ).write.mode("append").partitionBy("day").parquet(path)
    before_files = sum(
        1 for root, _d, names in os.walk(path) for n in names if n.endswith(".parquet")
    )
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("id")).first()[0]
    n_after = compact_table(spark, path, partition_col="day", target_file_mb=128)
    assert n_after < before_files
    after = spark.read.parquet(path)
    assert after.count() == 8000
    assert after.agg(F.sum("id")).first()[0] == before_sum


def test_compact_sort_cols_cluster_row_groups(spark, tmp_path):
    """Clustering on a sort column makes parquet min/max stats
    selective: after compaction, a range predicate reads fewer rows
    than the table (row-group skipping), and contents are unchanged."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    # write shuffled values so pre-compaction files all span the full
    # value range; ~8 MB so a 1 MB target yields several files
    spark.range(1_000_000).withColumn("v", F.xxhash64("id") % 1000).write.parquet(path)
    compact_table(spark, path, target_file_mb=1, sort_cols=["v"])
    # verify physical clustering via parquet footer stats
    files = [
        os.path.join(r, n)
        for r, _d, ns in os.walk(path)
        for n in ns
        if n.endswith(".parquet")
    ]
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "v"
            )
            spans.append(col.statistics.max - col.statistics.min)
    full_span = 1999  # v in [-999, 999] (Java % keeps sign)
    assert len(spans) >= 3
    # range clustering: the median row group covers a small value slice
    assert sorted(spans)[len(spans) // 2] < full_span * 0.5
    assert spark.read.parquet(path).count() == 1_000_000


def test_zscore_pandas_equals_window(spark, sf_dir):
    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value").limit(3000)
    a = {
        r["event_id"]: round(r["zscore"], 4)
        for r in zscore_per_group_pandas(ev, ["event_type"], "value").collect()
        if r["zscore"] is not None
    }
    b = {
        r["event_id"]: round(r["zscore"], 4)
        for r in zscore_per_group_window(ev, ["event_type"], "value").collect()
        if r["zscore"] is not None
    }
    assert a == b


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: feeding
    the same users in two batches yields combined running totals."""
    ev = load_events(spark, sf_dir).select("user_id", "value").limit(2000)
    src = str(tmp_path / "src")
    # two separate parquet files → two micro-batches with maxFilesPerTrigger=1
    ev.limit(1000).coalesce(1).write.mode("append").parquet(src)
    ev.subtract(ev.limit(1000)).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_totals_per_user(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user = final running totals = batch totals
    final = spark.sql(
        """
        SELECT user_id, n_events, sum_value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
            FROM running_totals
        ) WHERE rn = 1
        """
    )
    expected = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
    )
    got = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in expected.collect()}
    assert got == want


def test_upsert_partitioned_updates_and_inserts(spark, tmp_path):
    """Upsert rewrites only touched partitions: matched keys get the
    new payload, new keys insert, untouched partitions' files stay."""
    import glob

    import pytest

    from reactionetl_etl_spark.etl.upsert import upsert_partitioned

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3")],
        "k long, v string, day string",
    )
    base.write.partitionBy("day").parquet(path)
    untouched_before = sorted(glob.glob(f"{path}/day=d3/*.parquet"))

    updates = spark.createDataFrame(
        [(2, "B2", "d1"), (5, "e", "d2")], "k long, v string, day string"
    )
    n = upsert_partitioned(spark, path, updates, ["k"], "day")
    assert n == 2
    got = {r["k"]: (r["v"], r["day"]) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", "d1"), 2: ("B2", "d1"), 3: ("c", "d2"), 5: ("e", "d2"), 4: ("d", "d3"),
    }
    # dynamic overwrite must not rewrite the untouched partition
    assert sorted(glob.glob(f"{path}/day=d3/*.parquet")) == untouched_before

    dup = spark.createDataFrame(
        [(7, "x", "d1"), (7, "y", "d1")], "k long, v string, day string"
    )
    with pytest.raises(ValueError, match="not unique"):
        upsert_partitioned(spark, path, dup, ["k"], "day")


def test_upsert_partitioned_key_moves_partition(spark, tmp_path):
    """keys_move_partitions=True evicts a migrating key's stale row
    from its OLD partition; the default (immutability contract) leaves
    it, which is the documented duplicate-key hazard."""
    from reactionetl_etl_spark.etl.upsert import upsert_partitioned

    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3")],
        "k long, v string, day string",
    )
    move = spark.createDataFrame([(2, "B", "d9")], "k long, v string, day string")

    # default contract: old row survives → duplicate key (the hazard)
    p_default = str(tmp_path / "t_default")
    base.write.partitionBy("day").parquet(p_default)
    upsert_partitioned(spark, p_default, move, ["k"], "day")
    assert spark.read.parquet(p_default).filter("k = 2").count() == 2

    # opt-in migration handling: old home rewritten without the key
    p_move = str(tmp_path / "t_move")
    base.write.partitionBy("day").parquet(p_move)
    n = upsert_partitioned(spark, p_move, move, ["k"], "day", keys_move_partitions=True)
    assert n == 1
    got = {r["k"]: (r["v"], r["day"]) for r in spark.read.parquet(p_move).collect()}
    assert got == {1: ("a", "d1"), 2: ("B", "d9"), 3: ("c", "d3")}
