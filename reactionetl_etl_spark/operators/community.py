"""Community detection over edge lists.

Min-label propagation — the cheapest community primitive: every node
starts labeled with its own id, and each synchronous round replaces a
node's label with the MINIMUM label among itself and its neighbors.
After k rounds, nodes ≤ k hops from a local minimum share its label;
run to convergence it computes connected components (the
`graph.connected_components` large-star/small-star operator is the
convergence-optimal version — this one is the bounded-round,
oracle-mirrorable variant used for locality-bounded communities).

Deterministic by construction: min over integers, fixed round count,
no RNG, no partition-order dependence — two runs (or two engines)
agree exactly, which is what makes a DuckDB recursive-CTE oracle of
the same recurrence possible.

Spark shape: one shuffle per round — labels routed along edges (join
on the source key), then a groupBy-min on the destination. Self-loops
are folded into the edge set so "min(own, neighbors)" is a single
aggregate (and a single recursive reference in the SQL mirror).
Labels are eagerly localCheckpoint'ed per round (the
`connected_components` lesson: an unrolled k-deep plan re-evaluates
wholesale if a cache drops). At 100 TB the edge frame is the big side,
scanned once per round and hash-partitioned on the join key; labels
stay node-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    directed: bool = False,
    checkpoint_every: int = 2,
    small_graph_max: int | None = 200_000,
) -> DataFrame:
    """(node, community) after ``rounds`` synchronous min-label
    propagation rounds. ``directed=False`` symmetrizes the edges, so
    labels flow both ways (the usual community semantics).

    ``checkpoint_every``: rounds between eager lineage truncations.
    Per-round checkpointing pays one materialization latency per round
    (the bench floor of the whole graph family); min-propagation's
    per-round plan is just join+agg, so letting two rounds stack before
    cutting halves that fixed cost while keeping the lineage shallow
    (measured 2.56 → 2.17 s warm on the 4-round co-purchase bench
    shape; results are identical — truncation cadence is invisible to
    the recurrence)."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")

    if small_graph_max is not None:
        # Small-graph fast path (r14; the `connected_components`
        # discipline verbatim): ONE bounded action on the raw edge plan
        # doubles as size probe + edge fetch. Community graphs out of
        # the dedup/co-occurrence builders are usually a sliver of the
        # table they derive from — the benched co-purchase graph is
        # ~3.6k edges at sf0.1, yet the distributed loop paid 4 rounds
        # × (join + min-aggregate) plus eager checkpoints ≈ 2 s of pure
        # job scheduling for it. At or below the bound (≈ a few MB of
        # long pairs) the SAME synchronous recurrence runs on the
        # driver — integer mins over a dict adjacency, bit-equal labels
        # (pinned by test_label_propagation_matches_python_witness).
        # Larger graphs fall through to the distributed loop, so the
        # path caps overhead, never scale. NULL endpoints are dropped
        # up front (r15, ADVICE): Python min() raises TypeError on
        # None, and no catalog graph produces NULL node ids (edges
        # derive from join keys) — the distributed loop's behavior on
        # a NULL-keyed row is an engine-wide non-contract.
        head = (
            edges.select(src, dst)
            .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
            .limit(small_graph_max + 1)
            .collect()
        )
        if len(head) <= small_graph_max:
            out_schema = edges.select(
                F.col(src).alias("node"), F.col(dst).alias("community")
            ).schema
            # nbrs[v] = the label sources v hears each round: itself
            # (the folded self-loop) + every u with an edge u -> v
            # (+ v -> u when undirected)
            nbrs: dict = {}
            for a, b in head:
                nbrs.setdefault(a, {a})
                nbrs.setdefault(b, {b}).add(a)
                if not directed:
                    nbrs[a].add(b)
            lab = {v: v for v in nbrs}
            for _ in range(rounds):
                lab = {v: min(lab[u] for u in nbrs[v]) for v in nbrs}
            rows = sorted(lab.items())
            # pandas, not a Python list: Arrow turns it into a JVM
            # LocalRelation, so downstream aggregates run as local
            # single-stage plans — a list-of-tuples frame round-trips
            # through parallelize and schedules full-width shuffles
            # (the r12 coalesce(1)-on-Python-frames lesson)
            import pandas as pd

            pdf = pd.DataFrame(rows, columns=["node", "community"])
            # coalesce(1): the pandas conversion slices the local rows
            # into defaultParallelism (32) partitions, so every consumer
            # aggregate paid a 32-task scan + 32-reducer exchange for a
            # few-thousand-row table (~0.26 s of pure scheduling per
            # job at bench scale, r15). One partition is the right
            # shape for a <= small_graph_max result; narrow coalesce of
            # Arrow-backed local slices is cheap (the r12 hazard was
            # pickled PYTHON-list partitions, not these).
            return edges.sparkSession.createDataFrame(
                pdf, schema=out_schema
            ).coalesce(1)

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    # self-loops: min(own, neighbors) becomes one aggregate over e2
    e2 = (
        e.unionByName(nodes.select(F.col("node").alias("s"), F.col("node").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # init labels are consumed exactly once (round 1) and derive from
    # the already-checkpointed e2 by a single distinct — checkpointing
    # them again bought nothing but one extra eager job per call
    # (r12 bisect of the bench riser: the cadence was innocent, the
    # fixed per-job latency of the round loop is the floor).
    labels = e2.select(F.col("s").alias("node")).distinct().withColumn(
        "community", F.col("node")
    )
    for r in range(1, rounds + 1):
        labels = (
            e2.join(labels, e2["s"] == labels["node"])
            .groupBy(F.col("d").alias("node2"))
            .agg(F.min("community").alias("community"))
            .select(F.col("node2").alias("node"), "community")
        )
        if r % checkpoint_every == 0 or r == rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels
