"""Staged atomic partition commit (etl/commit.py).

The contract under test: a crash at ANY point leaves the table either
exactly-old or exactly-new after `recover_staged_commits` — never a
mix — because the persisted intent marker is the single commit point.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.commit import (
    INTENT_FILE,
    STAGING_PREFIX,
    _write_intent,
    recover_staged_commits,
    staged_overwrite_partitions,
)


def _mk_table(spark, path, rows):
    df = spark.createDataFrame(rows, "k int, v string, day string")
    df.write.partitionBy("day").parquet(path)


def _snap(spark, path):
    return {
        (r["k"], r["v"], r["day"])
        for r in spark.read.parquet(path).collect()
    }


def test_staged_overwrite_replaces_only_named_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path, [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3")])
    repl = spark.createDataFrame([(9, "z", "d2")], "k int, v string, day string")
    staged_overwrite_partitions(spark, path, repl, "day")
    assert _snap(spark, path) == {(1, "a", "d1"), (9, "z", "d2"), (3, "c", "d3")}
    # commit complete → no staging residue
    assert not [d for d in os.listdir(path) if d.startswith(STAGING_PREFIX)]


def test_staged_overwrite_deletes_emptied_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path, [(1, "a", "d1"), (2, "b", "d2")])
    repl = spark.createDataFrame([(1, "a2", "d1")], "k int, v string, day string")
    staged_overwrite_partitions(spark, path, repl, "day", emptied=["d2"])
    assert _snap(spark, path) == {(1, "a2", "d1")}
    assert not os.path.exists(os.path.join(path, "day=d2"))


def test_crash_before_intent_rolls_back(spark, tmp_path):
    """Staging data written but no intent marker → the commit point was
    never reached; recovery deletes the staging dir and the live table
    is byte-identical to before."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, [(1, "a", "d1"), (2, "b", "d2")])
    before = _snap(spark, path)
    staging = os.path.join(path, f"{STAGING_PREFIX}deadbeef")
    repl = spark.createDataFrame([(9, "z", "d2")], "k int, v string, day string")
    repl.write.partitionBy("day").parquet(staging)  # "crash" here
    # hidden dir: readers never see in-flight data
    assert _snap(spark, path) == before
    actions = recover_staged_commits(spark, path)
    assert actions == [f"rolled back {STAGING_PREFIX}deadbeef"]
    assert not os.path.exists(staging)
    assert _snap(spark, path) == before


def test_crash_after_intent_rolls_forward(spark, tmp_path):
    """Intent persisted but no swap performed → recovery completes the
    commit and the table is exactly-new."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, [(1, "a", "d1"), (2, "b", "d2")])
    staging = os.path.join(path, f"{STAGING_PREFIX}cafef00d")
    repl = spark.createDataFrame([(9, "z", "d2")], "k int, v string, day string")
    repl.write.partitionBy("day").parquet(staging)
    _write_intent(
        spark, staging, {"partition_col": "day", "partitions": ["day=d2"], "emptied": []}
    )  # "crash" here — commit point reached, swap not started
    actions = recover_staged_commits(spark, path)
    assert actions == [f"rolled forward {STAGING_PREFIX}cafef00d"]
    assert _snap(spark, path) == {(1, "a", "d1"), (9, "z", "d2")}
    assert not os.path.exists(staging)


def test_crash_mid_swap_rolls_forward_idempotently(spark, tmp_path):
    """One of two partitions already swapped when the crash hit →
    recovery finishes only the remaining one (idempotent roll-forward)."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3")])
    staging = os.path.join(path, f"{STAGING_PREFIX}0ddba11")
    repl = spark.createDataFrame(
        [(8, "y", "d1"), (9, "z", "d2")], "k int, v string, day string"
    )
    repl.write.partitionBy("day").parquet(staging)
    _write_intent(
        spark,
        staging,
        {"partition_col": "day", "partitions": ["day=d1", "day=d2"], "emptied": []},
    )
    # simulate: d1 was fully swapped before the crash
    import shutil

    shutil.rmtree(os.path.join(path, "day=d1"))
    shutil.move(os.path.join(staging, "day=d1"), os.path.join(path, "day=d1"))
    recover_staged_commits(spark, path)
    assert _snap(spark, path) == {(8, "y", "d1"), (9, "z", "d2"), (3, "c", "d3")}


def test_recover_on_missing_or_clean_table(spark, tmp_path):
    assert recover_staged_commits(spark, str(tmp_path / "absent")) == []
    path = str(tmp_path / "t")
    _mk_table(spark, path, [(1, "a", "d1")])
    assert recover_staged_commits(spark, path) == []


def test_enrichment_uses_staged_commit_end_to_end(spark, tmp_path):
    """materialize_enrichment goes through the staged path: result
    parity with the old dynamic-overwrite behavior, no residue."""
    from tests.fixtures_etl import write_metadata_json, write_reaction_csv

    from reactionetl_etl_spark.etl.pipeline import ReactionLake

    incoming = str(tmp_path / "incoming")
    day_dir = os.path.join(incoming, "2026-01-05")
    for n in range(1, 5):
        write_reaction_csv(day_dir, n, 20)
        write_metadata_json(day_dir, n)
    lake = ReactionLake(str(tmp_path / "lake"))
    # strict load-then-rewrite so the staged path has real gaps to fill
    lake.run_once(spark, incoming, enrich_inline=False)
    n = lake.materialize_enrichment(spark)
    assert n > 0
    fact = lake.fact(spark)
    assert fact.filter(F.col("simulation_num").isNull()).count() == 0
    assert not [
        d for d in os.listdir(str(tmp_path / "lake" / "fact_sim"))
        if d.startswith(STAGING_PREFIX)
    ]
