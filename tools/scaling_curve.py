"""Measured scaling curves: run the benched headline queries at every
available scale factor (sf0.001 / sf0.01 / sf0.1 — a 100× data range)
and report warm medians + the time ratio across the range.

The point of the artifact: SCALING.md argues each operator's shuffle
shape SHOULD scale; this measures whether wall-clock agrees on the
range we can test locally. A query whose 100× data ratio is far above
100× has a super-linear term (quadratic candidate growth, driver
bottleneck) worth investigating; far below ~10× means fixed scheduling
overhead still dominates at sf0.1 and the local numbers mostly measure
Spark constant costs, not the operator.

Usage: python tools/scaling_curve.py [runs]   (writes one JSON line,
and a markdown table to stdout)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactionetl_etl_spark.plans.catalog import all_queries  # noqa: E402
from reactionetl_etl_spark.session import get_spark  # noqa: E402

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}

# Non-benched queries whose scaling still needs a measured curve: one
# representative per operator family added in r7 (verdict-r7 item 6).
# The classifier trains once per (scale, params) via its memo, so its
# warm runs measure scoring; the COLD first run at each scale carries
# the training cost — reported in the same row as cold_.
EXTRA_QUERIES = (
    "customer_rank_kendall",  # exact O(n log n) rank-sort Kendall tau
    "customer_spend_balance_spearman",
    "quality_classifier_scores",  # in-Spark LR training + scoring
    "jaccard_prefix_join_pairs",  # PPJoin — output-bound on this corpus
    # r8 operator families (verdict-r8 item 5): iterative graph +
    # product-analytics shapes, one representative each
    "copurchase_bfs_hops",  # per-level keyed join + anti-join
    "copurchase_kcore",  # iterative peel, shrinking edge set
    "copurchase_cheapest_path",  # Bellman-Ford rounds
    "purchase_hits_scores",  # HITS fixed-round power iteration
    "event_funnel_steps",  # stacked windows over one events scan
    "weekly_retention_triangle",  # cohort grid agg
    # r9 operator families, one representative per shuffle-inventory row
    "ks_test_click_purchase",  # distinct-value agg + distributed prefix sum
    "nation_theilsen_trend",  # keyed agg + month-grid self-join
    "event_markov_stationary",  # state-sized truncated-integer iteration
    "purchase_attribution_credit",  # user-keyed interval join + window
    "quality_lift_deciles",  # distributed 2-pass global rank
    "bigram_llr_collocations",  # vocabulary-bounded pair aggs
    "event_value_bootstrap_ci",  # map-side-combined replicate sums
    "km_reorder_survival",  # customer window + week-grid fold
    "markov_removal_attribution",  # keyed removal-variant iteration
    "conformal_event_value",  # score agg + distributed prefix sum
    "event_value_cuped",  # user agg + single-row moments
    "promo_did_estimate",  # broadcast dim join + 4-group agg
    "copurchase_betweenness",  # unrolled 6-stage Brandes
    "classifier_calibration_bins",  # shares the classifier train memo
    "monthly_revenue_mase",  # month-grid lag windows
    "webdataset_roundtrip",  # tar shard write + binaryFile read-back
    # late-r9 families (verdict-r9 item 4); the MNN LSH path has no
    # catalog query of its own — measured by the ad-hoc stanza below
    "rake_keyphrases",  # stopword-delimited phrase aggs, vocab-bounded
    "event_value_sequential_test",  # stage-grid join, 6 cumulative looks
    "event_value_quantile_effects",  # distinct-value prefix sum per arm
    "event_value_mde",  # single moment agg + O(1) power arithmetic
    # r10 non-benched families
    "monthly_revenue_holt",  # monthly agg + driver grid recurrence
    "nation_revenue_gini",  # customer agg + dim-bounded rank window
    "search_mrr_eval",  # TakeOrdered top-10 + 3-term left join
    "lang_unigram_entropy",  # (lang, token) count + lang moments
    "lang_id_confusion",  # classes^2 cell agg + mirrored ratios
    "weekly_ltv_cohorts",  # user-keyed agg + weeks^2 grid windows
    # r11 operator families, one row each (pack_efficiency_report and
    # corpus_funnel_report are benched and measured by the main loop)
    "bpe_fertility_by_lang",  # encode pass + vocab anti-join (cold = training)
    "cross_lang_template_report",  # digest groupBy, template-bounded output
    "join_key_skew_profile",  # per-key counts + key-sized rank window
    "split_lang_balance_chi2",  # langs x 3 contingency, one scan
    "split_embedding_drift",  # posexplode + (split, dim) integer sums
    "split_length_psi",  # distinct-value prefix sum + 9-edge bin join
    "referential_integrity_report",  # 6 keyed anti-join folds
    "minhash_eval_report",  # PPJoin truth + banded candidates + pair joins
    "neardup_yield_curve",  # blocked pairs once + 3x components
    "ivf_tuning_curve",  # one k-means training + 5 probe joins
    # r12 families
    "pq_index_probe",  # codes-only write + partition-pruned ADC probe
    "copurchase_kcore2",  # k=2 peel (non-empty at every scale)
    "multimodal_feature_extract",  # real decode + luma histogram
    "split_leakage_audit",  # family pair join + md5 split exprs
    "semantic_contamination_report",  # broadcast eval x one train scan
    "ngram_coverage_curve",  # gram counts + TakeOrdered(1000) + grid
    "pack_length_tradeoff_curve",  # one prefix sum + broadcast L-grid
    # r13 families (training_corpus_build is benched by the main loop)
    "semantic_contamination_ann",  # IVF sign-once + cell equi-join probe
    "contamination_report",  # 1-row aggregates over 4 oracled builders
    "ivfpq_index_probe",  # full round trip: train+encode+write+probe
    # late-r13 families (hamming_topk_bits is NOT bench-flagged — the
    # compact bench line is at budget — so it gets a curve row here)
    "hamming_topk_bits",  # packed-bits brute scan, bit_count(xor)
    "hamming_rerank_cosine",  # packed-bits shortlist + broadcast-id rerank
    "source_overlap_matrix",  # digest shuffle -> per-shingle source sets
    "corpus_cluster_map",  # bounded k-means fit + zero-shuffle assignment
    "semdedup_incremental",  # base dedup + keep-first append (cert round trip)
    "bits_index_probe",  # flat 8 B/vec index write+append+probe round trip
    "dedup_method_agreement",  # 4 flag-set builders + one boolean-frame agg
    "kmeans_elbow_curve",  # 4 bounded fits + one all-k assignment scan
)


def graph_decade_curve(spark, runs: int) -> dict[str, dict[str, float]]:
    """One more decade for the graph family (r10 verdict item 5): the
    sf0.1 co-purchase edge set (largest local fixture) weak-scaled 10×
    — ten structure-preserving disjoint copies with INTERLEAVED node
    ids (id' = id·10 + copy), an sf1-equivalent edge count, i.e. the
    1000× point on the sf0.001-anchored curve.

    Interleaving (not offset blocks) makes the k smallest node ids
    land in k different copies, so betweenness's 4 deterministic
    sources span 4 copies instead of crowding copy 0. BFS reachability
    still lives in one copy by construction — but its per-level
    frontier⋈edges join scans the full 10× edge table each level,
    which is exactly the data term the SCALING.md rows claim dominates
    (frontier/visited stay node-sized either way). Round/level counts
    are construction-invariant (each copy has the sf0.1 graph's
    diameter and community structure), so the decade isolates the
    per-round DATA term: a reading far above ~10× would mean per-round
    cost grows faster than edges — the super-linear surprise this
    measurement exists to rule out."""
    from pyspark.sql import functions as F

    from reactionetl_etl_spark.operators.community import label_propagation
    from reactionetl_etl_spark.operators.graph import betweenness_ksource, bfs_hops
    from reactionetl_etl_spark.sources.tables import load_table

    lp = (
        load_table(spark, SF_DIRS["0.1"], "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
        .localCheckpoint(eager=True)
    )
    def copies(n: int):
        return (
            co.crossJoin(spark.range(n).select(F.col("id").alias("k")))
            .select(
                (F.col("pa") * n + F.col("k")).alias("pa"),
                (F.col("pb") * n + F.col("k")).alias("pb"),
            )
            .localCheckpoint(eager=True)
        )

    co10, co100 = copies(10), copies(100)
    ops = {
        "copurchase_label_propagation": lambda e: label_propagation(
            e, src="pa", dst="pb", rounds=4
        ),
        "copurchase_betweenness": lambda e: betweenness_ksource(
            e, src="pa", dst="pb", n_sources=4
        ),
        "copurchase_bfs_hops": lambda e: bfs_hops(e, src="pa", dst="pb", max_hops=3),
    }
    out: dict[str, dict[str, float]] = {}
    for name, op in ops.items():
        row: dict[str, float] = {"edges_1x": co.count(), "edges_100x": co100.count()}
        for label, edges in (("1x", co), ("10x", co10), ("100x", co100)):
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                op(edges).write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            row[label] = round(statistics.median(times[1:] or times), 3)
        row["ratio_10x"] = round(row["10x"] / row["1x"], 2) if row["1x"] else float("inf")
        row["ratio_100x"] = round(row["100x"] / row["1x"], 2) if row["1x"] else float("inf")
        out[name] = row
    return out


def mnn_lsh_curve(spark, runs: int) -> dict[str, float]:
    """Warm medians for the MNN LSH path (the 100 TB route) — the
    catalog's `mutual_nearest_pairs` query exercises the size-guarded
    exact path, so the bucketed variant needs its own curve."""
    from reactionetl_etl_spark.operators.similarity import mutual_nearest_pairs
    from reactionetl_etl_spark.sources.tables import load_table

    out: dict[str, float] = {}
    for sf, d in SF_DIRS.items():
        emb = load_table(spark, d, "embeddings")
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            mutual_nearest_pairs(emb, lsh_dim=64, lsh_bits=4).collect()
            times.append(time.monotonic() - t0)
        out[sf] = round(statistics.median(times[1:] or times), 3)
    return out


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    benched = {n: s for n, s in qs.items() if s.bench}
    for n in EXTRA_QUERIES:
        benched[n] = qs[n]
    if only:
        benched = {n: s for n, s in benched.items() if n in only}
    mnn_lsh = (
        mnn_lsh_curve(spark, runs) if (not only or "mnn_lsh" in only) else None
    )
    if "graph_decade" in only:
        dec = graph_decade_curve(spark, runs)
        print("| op (sf0.1 co-purchase edges) | 1x sec | 10x sec | 100x sec | 10x/1x | 100x/1x |")
        print("|---|---|---|---|---|---|")
        for name, row in sorted(dec.items()):
            print(
                f"| {name} | {row['1x']} | {row['10x']} | {row['100x']} |"
                f" {row['ratio_10x']}x | {row['ratio_100x']}x |"
            )
        print(json.dumps({"metric": "graph_decade", "runs": runs, "ops": dec}))
        return 0
    out: dict[str, dict[str, float]] = {}
    cold: dict[str, dict[str, float]] = {}
    for name, spec in sorted(benched.items()):
        out[name] = {}
        cold[name] = {}
        for sf, d in SF_DIRS.items():
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                spec.builder(spark, d).collect()
                times.append(time.monotonic() - t0)
            # warm median: drop the first (compilation-heavy) run
            out[name][sf] = round(statistics.median(times[1:] or times), 3)
            cold[name][sf] = round(times[0], 3)
    if mnn_lsh is not None:
        out["mutual_nearest_pairs_lsh"] = mnn_lsh
    print("| query | sf0.001 | sf0.01 | sf0.1 | t(0.1)/t(0.001) for 100x data |")
    print("|---|---|---|---|---|")
    for name, row in sorted(out.items()):
        ratio = round(row["0.1"] / row["0.001"], 1) if row["0.001"] > 0 else float("inf")
        print(
            f"| {name} | {row['0.001']} | {row['0.01']} | {row['0.1']} | {ratio}x |"
        )
    print(json.dumps({"metric": "scaling_curve", "runs": runs, "queries": out, "cold": cold}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
