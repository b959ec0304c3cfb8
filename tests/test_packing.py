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


def _ref_pack_report(tok_by_id: dict[int, int], budget: int):
    """Straight-line witness for the pack-efficiency report: walk docs
    in id order, accumulate the exclusive prefix sum, derive every
    shard's stats directly from the definitions (no catalog code)."""
    shards: dict[int, dict] = {}
    cum = 0
    for doc_id in sorted(tok_by_id):
        tok = tok_by_id[doc_id]
        s = cum // budget
        rec = shards.setdefault(
            s,
            {"n_docs": 0, "sum_tokens": 0, "first_start": cum, "last_end": 0, "split_docs": 0},
        )
        rec["n_docs"] += 1
        rec["sum_tokens"] += tok
        rec["last_end"] = max(rec["last_end"], cum + tok)
        if cum + tok > (s + 1) * budget:
            rec["split_docs"] += 1
        cum += tok
    out = {}
    for s, rec in shards.items():
        fill = (
            (min(rec["last_end"], (s + 1) * budget) - rec["first_start"])
            / float(budget)
        )
        import math

        out[s] = (
            rec["n_docs"],
            rec["sum_tokens"],
            rec["first_start"] - s * budget,
            max(rec["last_end"] - (s + 1) * budget, 0),
            rec["split_docs"],
            math.floor(fill * 1_000_000 + 0.5) / 1_000_000,
        )
    return out


def test_pack_efficiency_report_matches_witness(spark, sf_dir):
    """Catalog query vs the straight-line walker, plus the stream
    invariant that makes the padding interpretation sound: each
    shard's carry-in equals the previous contiguous shard's overshoot
    (the stream is back-to-back, so spill-out IS the next window's
    head occupation)."""
    from reactionetl_etl_spark.operators.dedup import normalize_text
    from reactionetl_etl_spark.plans.catalog import all_queries
    from reactionetl_etl_spark.sources.tables import load_table

    got = {
        r["shard_id"]: (
            r["n_docs"],
            r["sum_tokens"],
            r["carry_in_tokens"],
            r["overshoot_tokens"],
            r["split_docs"],
            r["fill6"],
        )
        for r in all_queries()["pack_efficiency_report"].builder(spark, sf_dir).collect()
    }
    toks = {
        r["doc_id"]: r["tok"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(normalize_text("text"), " ")).alias("tok"))
        .collect()
    }
    assert got == _ref_pack_report(toks, 2048)
    # stream invariant: carry_in[s] == overshoot[s-1] for contiguous ids
    for s in got:
        if s - 1 in got:
            assert got[s][2] == got[s - 1][3], s


def test_pack_report_composes_with_webdataset_export(spark, sf_dir, tmp_path):
    """The report describes the EXACT shards the exporter writes: pack
    by token budget, export each shard as one WebDataset tar
    (shard_col passthrough), read the tars back — per-shard member
    counts equal the report's n_docs."""
    from reactionetl_etl_spark.io.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )
    from reactionetl_etl_spark.operators.dedup import normalize_text
    from reactionetl_etl_spark.plans.catalog import all_queries
    from reactionetl_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(normalize_text("text"), " ")).alias("tok"), "text"
    )
    packed = pack_by_token_budget(
        docs, order_col="doc_id", token_col="tok", budget=2048,
        bucket_expr=F.expr("doc_id div 2000"),
    ).withColumn("payload", F.encode("text", "utf-8"))
    out = str(tmp_path / "packed_wds")
    n_shards = packed.agg(F.max("shard_id")).first()[0] + 1
    write_webdataset_shards(
        packed, out, key_col="doc_id", payload_col="payload",
        meta_cols=("tok",), ext="txt", n_shards=int(n_shards),
        shard_col="shard_id",
    )
    back = (
        read_webdataset_shards(spark, out)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["shard_id"]: r["n"] for r in back.collect()}
    want = {
        r["shard_id"]: r["n_docs"]
        for r in all_queries()["pack_efficiency_report"].builder(spark, sf_dir).collect()
    }
    assert got == want
