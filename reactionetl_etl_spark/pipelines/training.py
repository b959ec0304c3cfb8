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

from pyspark.sql import Window

from reactionetl_etl_spark.operators import dedup as D
from reactionetl_etl_spark.operators.graph import connected_components
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
    from concurrent.futures import ThreadPoolExecutor

    # r15 (guide §2.6): the input count is independent of every other
    # stage — overlap it with the quality pass instead of paying its
    # job latency up front. Joined before the stats object is built.
    # three tail workers: the input count, the overlapped ledger write,
    # and the ledger tally can all be in flight at once; shut down on
    # EVERY exit path (a leaked non-daemon worker would keep running
    # its Spark job while the exception propagates — the run_once
    # lesson from this round's review advice)
    _tail_pool = ThreadPoolExecutor(3)
    try:
        f_n_input = _tail_pool.submit(docs.count)

        # The verdict frame is NARROW (doc_id + rule strings) but computing
        # it is a full normalize+split text pass; without a lineage break it
        # re-runs inside every consumer — the quality branch of the ledger
        # write, the dedup stage's kept-input, and the contamination stage's
        # kept-input each replayed it (r14 decompose: the ledger job alone
        # carried ~3 redundant text passes). One eager checkpoint = one pass.
        verdicts = quality_verdicts(docs, text_col).localCheckpoint(eager=True)
        quality_drops = verdicts.filter(~F.col("keep")).select(
            "doc_id",
            F.lit("quality").alias("stage"),
            F.col("failed_rules").alias("reason"),
        )
        kept = docs.join(
            verdicts.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )

        # Same reasoning: (doc_id, kept_doc) is tiny, but its plan tails the
        # LSH candidate join + the per-cluster keeper join over doc lengths
        # (a full text-column scan) — referenced by both the ledger's
        # near_dup branch and the contamination stage's anti-join, so the
        # keeper join ran twice per build. connected_components already
        # materializes the expensive candidate graph internally; this pins
        # the two joins above it too.
        dup_drops_raw = duplicate_drop_list(kept, text_col, min_jaccard).localCheckpoint(
            eager=True
        )
        dup_drops = dup_drops_raw.select(
            "doc_id",
            F.lit("near_dup").alias("stage"),
            F.concat(F.lit("kept="), F.col("kept_doc").cast("string")).alias("reason"),
        )
        kept = kept.join(dup_drops_raw.select("doc_id"), "doc_id", "left_anti")

        if eval_set is not None:
            # the contamination probe gets its OWN eager checkpoint (r15):
            # it is the last expensive text pass, and pinning it as a
            # narrow (doc_id, __max_shared) frame makes the ledger write a
            # trivial union of three checkpointed locals — which can then
            # OVERLAP the pack checkpoint below instead of serializing a
            # full contamination pass in front of it
            hits = (
                ngram_contamination(kept, eval_set, text_col, "doc_id", k=contamination_k)
                .filter(F.col("n_shared") >= contamination_min_shared)
                .groupBy(F.col("train_id").alias("doc_id"))
                .agg(F.max("n_shared").alias("__max_shared"))
                .localCheckpoint(eager=True)
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

        # Every drop stage (quality rules, MinHash near-dup clustering,
        # contamination probe) is now an eager checkpoint, so each executes
        # exactly ONCE no matter how many consumers read it — the r13
        # write-the-ledger-first discipline enforced the same property
        # through a parquet round-trip, which also serialized the pack
        # stage behind the ledger write. r15: the keep-list derives from
        # the checkpointed frames directly (`kept` already is exactly
        # docs minus the three drop lists — the same set the ledger
        # read-back reproduced), and the ledger write runs as an
        # OVERLAPPING job beside the pack checkpoint (guide §2.6: both
        # depend only on already-materialized frames, and the scheduler
        # back-fills the pack stage's tail with the write's tasks).
        ledger = quality_drops.unionByName(dup_drops).unionByName(contam_drops)
        f_ledger_w = _tail_pool.submit(
            lambda: ledger.write.mode("overwrite").parquet(f"{out_path}/ledger")
        )

        # deterministic shuffle order + token counts, then pack — FUSED
        # (r14): the general composition (global_order_ranks over md5 →
        # pack_by_token_budget over the rank) is built for reuse, but here
        # it moves the corpus TEXT through three exchanges (the rank-key
        # join, then running-sum's range repartition, then its __pid window
        # exchange) plus a range-sampling pass, and aggregates a row-count-
        # sized key table besides (every md5 key is unique, so the rank
        # operator's distinct-key optimization degenerates). Both outputs
        # are pure functions of the same total order (md5(doc_id), doc_id),
        # and the md5 HEX PREFIX is a deterministic, order-monotone bucket
        # of that order — so ONE hash exchange on the prefix bucket
        # replaces range partitioning outright (no boundary-sampling job,
        # no nondeterministic partitioner to pin): per-bucket row_number /
        # exclusive token cumsum via one window, per-bucket totals read off
        # the windowed rows themselves (count = max row number, sum = max
        # inclusive cumsum), broadcast prefix offsets over the tiny bucket
        # table. Integer arithmetic end to end — shuffle_pos, tokens_before
        # and shard_id are identical to the two-operator composition for
        # ANY bucket count (the global order never depends on bucketing;
        # parity-pinned by test_training_pipeline, pins unchanged at both
        # SFs). The eager localCheckpoint materializes the windowed frame
        # once: the offsets aggregate, the broadcast-joined write, and the
        # shard write all read it back without re-running the window or the
        # upstream text pass. Bucket width adapts to the session's
        # shuffle-partition setting (≥16 buckets per partition so AQE can
        # balance); results are bucket-count-invariant by construction.
        norm = D.normalize_text(text_col)
        with_tok = kept.withColumn("n_tokens", F.size(F.split(norm, " ")))
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        hex_chars = 2
        while 16**hex_chars < n_parts * 16:
            hex_chars += 1
        key = F.md5(F.col("doc_id").cast("string"))
        bucket = F.conv(F.substring(key, 1, hex_chars), 16, 10).cast("bigint")
        w_ord = Window.partitionBy("__pid").orderBy(
            F.col("__key").asc(), F.col("doc_id").asc()
        )
        local = (
            with_tok.withColumn("__key", key)
            .withColumn("__pid", bucket)
            .withColumn("__lrn", F.row_number().over(w_ord))
            .withColumn(
                "__lcum",
                F.sum("n_tokens").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .localCheckpoint(eager=True)
        )
        stats = local.groupBy("__pid").agg(
            F.max("__lrn").alias("__pn"), F.max("__lcum").alias("__ps")
        )
        w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = stats.select(
            "__pid",
            F.coalesce(F.sum("__pn").over(w_prev), F.lit(0)).alias("__noff"),
            F.coalesce(F.sum("__ps").over(w_prev), F.lit(0)).alias("__soff"),
        )
        packed = (
            local.join(F.broadcast(offsets), on="__pid")
            .withColumn("shuffle_pos", F.col("__lrn") + F.col("__noff"))
            # exclusive prefix: inclusive cumsum minus the row's own tokens
            .withColumn(
                "tokens_before", F.col("__lcum") - F.col("n_tokens") + F.col("__soff")
            )
            .withColumn(
                "shard_id",
                F.floor(F.col("tokens_before") / F.lit(token_budget)).cast("bigint"),
            )
            .select(
                "doc_id", text_col, "n_tokens", "shuffle_pos", "tokens_before", "shard_id"
            )
        )

        # the ledger write overlapped the pack checkpoint above; join it
        # before anything reads the ledger back
        f_ledger_w.result()
        ledger_r = spark.read.parquet(f"{out_path}/ledger")

        def _ledger_tally() -> dict:
            return {
                r["stage"]: r["n"]
                for r in ledger_r.groupBy("stage").agg(F.count("*").alias("n")).collect()
            }

        # the drop-stage tally reads only the written ledger — independent
        # of the shard export, so it overlaps the shards write (§2.6)
        f_ledger_t = _tail_pool.submit(_ledger_tally)

        packed.write.mode("overwrite").partitionBy("shard_id").parquet(f"{out_path}/shards")
        # shard stats from the CHECKPOINTED pack frame (r15): `packed` is a
        # broadcast join over the eagerly-materialized `local`, so deriving
        # stats from it re-runs nothing expensive — the r13-era read-back
        # (which predated the checkpoint) re-LISTED every shard_id=N
        # partition directory instead, a fixed metadata cost that grows
        # with shard count (~0.6 s at the bench's ~300 shards). Same values
        # by construction: the grouped counts of what was just written.
        shard_stats = packed.groupBy("shard_id").agg(
            F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
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

        # Tail tallies: the drop-stage tally was submitted before the shard
        # export (it only reads the written ledger); the export totals
        # derive from the WRITTEN shard_stats (n rows = shards,
        # sum(n_docs) = docs) — same values by construction,
        # metadata-sized read.
        tot = (
            spark.read.parquet(f"{out_path}/shard_stats")
            .agg(F.sum("n_docs").alias("n"), F.count("*").alias("s"))
            .first()
        )
        n_exported, n_shards = int(tot["n"] or 0), int(tot["s"])
        stats_rows = f_ledger_t.result()
        return CorpusBuildStats(
            n_input=f_n_input.result(),
            n_quality_dropped=int(stats_rows.get("quality", 0)),
            n_dup_dropped=int(stats_rows.get("near_dup", 0)),
            n_contaminated_dropped=int(stats_rows.get("contaminated", 0)),
            n_exported=n_exported,
            n_shards=n_shards,
        )
    finally:
        _tail_pool.shutdown(wait=True, cancel_futures=True)
