"""End-to-end training-corpus builder: the engine's operators composed
into the pipeline a 100 TB pretraining-data run actually executes.

    raw documents
      → named-rule quality filter        (keep + failed_rules ledger)
      → near-dup clustering              (Jaccard candidates → connected
                                          components → ONE canonical doc
                                          per cluster, longest-text-wins)
      → benchmark decontamination        (k-gram overlap vs an eval
                                          suite, broadcast or shuffle)
      → deterministic corpus shuffle     (rank over md5(doc_id) —
                                          RNG-free, resumable, stable
                                          across retries/backfills)
      → token-budget shard packing       (distributed prefix sum)
      → sharded parquet export           (+ per-shard stats and a full
                                          drop LEDGER: every removed
                                          doc with machine-readable
                                          reason)

Every stage is one of the repo's tested operators; this module adds
only composition and the audit trail. The drop ledger is the part
production teams bolt on after the fact and regret not having: corpus
membership must be explainable per document (why is doc X absent from
shard S?) or the next debugging session diffs two multi-TB exports.

Scale posture: stages communicate by doc_id keep-lists (narrow frames,
join-pruned), never by re-materializing text between stages; the only
full-text passes are the token/shingle computations each stage already
needs. Outputs land as `shard_id`-partitioned parquet, the layout
`write_sharded` consumers and trainers expect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators import dedup as D
from reactionetl_etl_spark.operators.graph import connected_components
from reactionetl_etl_spark.operators.packing import pack_by_token_budget
from reactionetl_etl_spark.operators.rank import global_order_ranks
from reactionetl_etl_spark.operators.text import ngram_contamination


@dataclass
class CorpusBuildStats:
    n_input: int
    n_quality_dropped: int
    n_dup_dropped: int
    n_contaminated_dropped: int
    n_exported: int
    n_shards: int


def quality_verdicts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style named-rule verdicts (same rules the catalog's
    `quality_filter_verdicts` oracles): doc_id, n_tokens, keep,
    failed_rules."""
    norm = D.normalize_text(text_col)
    toks = F.split(norm, " ")
    n_tokens = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        n_tokens, F.lit(1)
    )
    mean_tok_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(n_tokens, F.lit(1))
    too_short = n_tokens < 20
    low_div = uniq_ratio < 0.3
    bad_len = (mean_tok_len < 3.0) | (mean_tok_len > 10.0)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.concat_ws(
            ",",
            F.when(too_short, "too_short"),
            F.when(low_div, "low_diversity"),
            F.when(bad_len, "word_len_out_of_range"),
        ).alias("failed_rules"),
        (~too_short & ~low_div & ~bad_len).alias("keep"),
    )


def duplicate_drop_list(
    docs: DataFrame, text_col: str = "text", min_jaccard: float = 0.5
) -> DataFrame:
    """(doc_id, kept_doc) for every document dropped as a near-dup:
    Jaccard candidates → connected components → longest-text keeper
    per cluster (doc_id tie-break); everything else survives."""
    pairs = D.minhash_lsh_candidates(docs, text_col, "doc_id", min_jaccard=min_jaccard)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    clusters = comps.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
    scored = clusters.join(docs.select("doc_id", F.length(text_col).alias("__len")), "doc_id")
    keepers = scored.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("__len").alias("a"), (-F.col("doc_id")).alias("b"))
        ).alias("kept_doc")
    )
    return (
        scored.join(keepers, "cluster_id")
        .filter(F.col("doc_id") != F.col("kept_doc"))
        .select("doc_id", "kept_doc")
    )


def build_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    token_budget: int = 2048,
    min_jaccard: float = 0.5,
    eval_set: DataFrame | None = None,
    contamination_k: int = 4,
    contamination_min_shared: int = 1,
    text_col: str = "text",
    webdataset: bool = False,
) -> CorpusBuildStats:
    """Run the full build (module doc) and write:

        <out>/shards/shard_id=<s>/*.parquet   the corpus, packed
        <out>/ledger/*.parquet                every dropped doc_id +
                                              stage + machine-readable
                                              reason
        <out>/shard_stats/*.parquet           per-shard doc/token counts

    Returns stage-level counts. Deterministic end-to-end: same input →
    byte-identical shard assignment (hash order, no RNG)."""
    n_input = docs.count()

    verdicts = quality_verdicts(docs, text_col)
    quality_drops = verdicts.filter(~F.col("keep")).select(
        "doc_id",
        F.lit("quality").alias("stage"),
        F.col("failed_rules").alias("reason"),
    )
    kept = docs.join(
        verdicts.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )

    dup_drops_raw = duplicate_drop_list(kept, text_col, min_jaccard)
    dup_drops = dup_drops_raw.select(
        "doc_id",
        F.lit("near_dup").alias("stage"),
        F.concat(F.lit("kept="), F.col("kept_doc").cast("string")).alias("reason"),
    )
    kept = kept.join(dup_drops_raw.select("doc_id"), "doc_id", "left_anti")

    if eval_set is not None:
        hits = (
            ngram_contamination(kept, eval_set, text_col, "doc_id", k=contamination_k)
            .filter(F.col("n_shared") >= contamination_min_shared)
            .groupBy(F.col("train_id").alias("doc_id"))
            .agg(F.max("n_shared").alias("__max_shared"))
        )
        contam_drops = hits.select(
            "doc_id",
            F.lit("contaminated").alias("stage"),
            F.concat(F.lit("max_shared_grams="), F.col("__max_shared").cast("string")).alias(
                "reason"
            ),
        )
        kept = kept.join(hits.select("doc_id"), "doc_id", "left_anti")
    else:
        contam_drops = spark.createDataFrame([], "doc_id long, stage string, reason string")

    # The ledger is written FIRST and the final keep-list derived from
    # its read-back (r13): the drop stages (quality rules, MinHash
    # near-dup clustering, contamination probe) execute exactly ONCE —
    # previously the shards write, the ledger write, and the drop-stat
    # collect each re-ran them (the dedup stage is the expensive one:
    # LSH candidates + iterative connected components), tripling the
    # pipeline's cost. This is also the module docstring's scale
    # posture made literal: stages communicate by narrow doc_id
    # keep/drop lists, and the corpus text is re-scanned only by the
    # passes that need it.
    ledger = quality_drops.unionByName(dup_drops).unionByName(contam_drops)
    ledger.write.mode("overwrite").parquet(f"{out_path}/ledger")
    ledger_r = spark.read.parquet(f"{out_path}/ledger")
    kept = docs.join(
        ledger_r.select("doc_id").distinct(), "doc_id", "left_anti"
    )

    # deterministic shuffle order + token counts, then pack
    norm = D.normalize_text(text_col)
    with_tok = kept.withColumn("n_tokens", F.size(F.split(norm, " ")))
    shuffled = global_order_ranks(
        with_tok,
        rank_exprs=[F.md5(F.col("doc_id").cast("string"))],
        rank_desc=[False],
        tie_exprs=[F.col("doc_id")],
        tie_desc=[False],
    ).withColumnRenamed("global_row_number", "shuffle_pos")
    packed = pack_by_token_budget(
        shuffled.select("doc_id", text_col, "n_tokens", "shuffle_pos"),
        order_col="shuffle_pos",
        token_col="n_tokens",
        budget=token_budget,
    )

    packed.write.mode("overwrite").partitionBy("shard_id").parquet(f"{out_path}/shards")
    # shard stats from the WRITTEN shards, not the in-plan frame — the
    # latter would re-run shuffle+pack a second time
    shard_stats = (
        spark.read.parquet(f"{out_path}/shards")
        # the session disables partition-column type inference
        # (session.py) so the partition column reads back as string;
        # restore the packer's bigint type
        .withColumn("shard_id", F.col("shard_id").cast("bigint"))
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )
    shard_stats.write.mode("overwrite").parquet(f"{out_path}/shard_stats")

    if webdataset:
        # training-loader tar export: one tar PER PACKED SHARD (the
        # token-budget cut, not a re-bucket), members in shuffle order
        from reactionetl_etl_spark.io.webdataset import write_webdataset_shards

        write_webdataset_shards(
            # read-back, not `packed`: the in-plan frame would re-run
            # the shuffle+pack stages a third time
            spark.read.parquet(f"{out_path}/shards").withColumn(
                "payload", F.encode(text_col, "utf-8")
            ),
            f"{out_path}/webdataset",
            key_col="doc_id",
            payload_col="payload",
            meta_cols=("n_tokens", "shuffle_pos"),
            ext="txt",
            shard_col="shard_id",
            sort_col="shuffle_pos",
        )

    stats_rows = {
        r["stage"]: r["n"]
        for r in ledger_r.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    exported = spark.read.parquet(f"{out_path}/shards")
    n_exported = exported.count()
    n_shards = exported.select("shard_id").distinct().count()
    return CorpusBuildStats(
        n_input=n_input,
        n_quality_dropped=int(stats_rows.get("quality", 0)),
        n_dup_dropped=int(stats_rows.get("near_dup", 0)),
        n_contaminated_dropped=int(stats_rows.get("contaminated", 0)),
        n_exported=n_exported,
        n_shards=n_shards,
    )
