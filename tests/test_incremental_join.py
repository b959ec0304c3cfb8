"""Incremental join maintenance: delta-rule exactness, replay
idempotence, and the committed-accumulator crash window."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.incremental_join import (
    join_batch_applied,
    merge_join_state,
    read_join_view,
)


def _l(spark, rows):
    return spark.createDataFrame(rows, "k int, lval string")


def _r(spark, rows):
    return spark.createDataFrame(rows, "k int, rval string")


def _collect(spark, state):
    return sorted(
        (r["k"], r["lval"], r["rval"])
        for r in read_join_view(spark, state).collect()
    )


def test_interleaved_deltas_equal_one_shot_join(spark, tmp_path):
    state = str(tmp_path / "s")
    l1 = _l(spark, [(1, "a"), (2, "b")])
    r1 = _r(spark, [(1, "x"), (3, "y")])
    l2 = _l(spark, [(3, "c"), (1, "a2")])
    r2 = _r(spark, [(2, "z"), (1, "x2")])

    assert merge_join_state(spark, state, "k", "b0", delta_left=l1)
    assert merge_join_state(spark, state, "k", "b1", delta_right=r1)
    assert merge_join_state(spark, state, "k", "b2", delta_left=l2, delta_right=r2)

    full_l = l1.unionByName(l2)
    full_r = r1.unionByName(r2)
    want = sorted(
        (r["k"], r["lval"], r["rval"]) for r in full_l.join(full_r, "k").collect()
    )
    assert _collect(spark, state) == want
    assert len(want) == 6  # k=1: 2L x 2R, k=2: 1x1, k=3: 1x1


def test_replay_is_skipped_by_marker(spark, tmp_path):
    state = str(tmp_path / "s")
    assert merge_join_state(spark, state, "k", "b0", delta_left=_l(spark, [(1, "a")]))
    assert merge_join_state(spark, state, "k", "b1", delta_right=_r(spark, [(1, "x")]))
    before = _collect(spark, state)
    # at-least-once delivery replays b1 — must be a no-op
    assert not merge_join_state(
        spark, state, "k", "b1", delta_right=_r(spark, [(1, "x")])
    )
    assert _collect(spark, state) == before
    assert join_batch_applied(spark, state, "b1")


def test_crash_after_accumulator_commit_retry_converges(spark, tmp_path):
    """Crash window: b1's RIGHT accumulator partition committed but the
    marker did not. The retry must not see b1's own delta as history
    (that would double-count via L_old ⋈ ΔR + ΔL ⋈ ΔR)."""
    state = str(tmp_path / "s")
    merge_join_state(spark, state, "k", "b0", delta_left=_l(spark, [(1, "a")]))
    r1 = _r(spark, [(1, "x")])
    # simulate the torn state: accumulator partition exists, no marker
    r1.write.mode("overwrite").parquet(f"{state}/right/batch=b1")
    assert not join_batch_applied(spark, state, "b1")
    assert merge_join_state(spark, state, "k", "b1", delta_right=r1)
    assert _collect(spark, state) == [(1, "a", "x")]


def test_overlapping_non_key_columns_rejected(spark, tmp_path):
    state = str(tmp_path / "s")
    bad_r = spark.createDataFrame([(1, "x")], "k int, lval string")
    with pytest.raises(ValueError, match="non-key columns"):
        merge_join_state(
            spark, state, "k", "b0",
            delta_left=_l(spark, [(1, "a")]), delta_right=bad_r,
        )


def test_first_single_sided_batch_produces_no_pairs(spark, tmp_path):
    state = str(tmp_path / "s")
    assert merge_join_state(spark, state, "k", "b0", delta_left=_l(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no joined state"):
        read_join_view(spark, state)
    assert merge_join_state(spark, state, "k", "b1", delta_right=_r(spark, [(1, "x")]))
    assert _collect(spark, state) == [(1, "a", "x")]


def test_all_digit_batch_id_rejected(spark, tmp_path):
    """An all-digit batch id would type-infer to INT as a partition
    value under a vanilla reader session, making the in-flight
    exclude-filter session-dependent — refused up front."""
    with pytest.raises(ValueError, match="all digits"):
        merge_join_state(
            spark, str(tmp_path / "s"), "k", "3",
            delta_left=_l(spark, [(1, "a")]),
        )
