"""Incremental aggregate maintenance (etl/incremental_agg.py).

Contracts under test: batch-folded state is EXACTLY equal to a full
recompute (algebraic merge, no drift); replayed batches are skipped
(exactly-once via commit-riding markers); the applied-batch fact and
the merged data commit atomically through crash recovery.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.commit import (
    STAGING_PREFIX,
    _write_intent,
    recover_staged_commits,
)
from reactionetl_etl_spark.etl.incremental_agg import (
    batch_already_applied,
    merge_aggregate_state,
    read_aggregate_view,
)
from reactionetl_etl_spark.sources.tables import load_table

KEYS = ["order_month", "o_orderpriority"]
MEASURES = {"o_totalprice": ["sum", "count", "min", "max"]}


def _orders(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        # exact type for the additive measure — the module contract
        # (a double sum would trip the fold-drift warning)
        .withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(18,2)"))
    )


def _final(df):
    return {
        (r["order_month"], r["o_orderpriority"]): (
            r["row_count"],
            round(r["o_totalprice__sum"], 2),
            r["o_totalprice__count"],
            round(r["o_totalprice__min"], 2),
            round(r["o_totalprice__max"], 2),
            round(r["o_totalprice__avg"], 6),
        )
        for r in df.collect()
    }


def test_incremental_merge_equals_full_recompute(spark, sf_dir, tmp_path):
    """Three date-sliced batches folded in sequence == one-shot groupBy
    over everything, including min/max and the read-time average."""
    state = str(tmp_path / "state")
    orders = _orders(spark, sf_dir)
    cuts = ["1997-01-01", "1999-06-15"]  # testdata spans 1995-01..2001-08
    batches = [
        orders.filter(F.col("o_orderdate") < cuts[0]),
        orders.filter((F.col("o_orderdate") >= cuts[0]) & (F.col("o_orderdate") < cuts[1])),
        orders.filter(F.col("o_orderdate") >= cuts[1]),
    ]
    for i, b in enumerate(batches):
        assert merge_aggregate_state(
            spark, state, b, KEYS, MEASURES, "order_month", batch_id=f"b{i}"
        )

    got = _final(read_aggregate_view(spark, state, MEASURES, avg_of=["o_totalprice"]))
    expected = _final(
        orders.groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum("o_totalprice").alias("o_totalprice__sum"),
            F.count("o_totalprice").alias("o_totalprice__count"),
            F.min("o_totalprice").alias("o_totalprice__min"),
            F.max("o_totalprice").alias("o_totalprice__max"),
        )
        .withColumn(
            "o_totalprice__avg", F.col("o_totalprice__sum") / F.col("o_totalprice__count")
        )
    )
    assert got == expected


def test_replayed_batch_is_skipped(spark, sf_dir, tmp_path):
    """At-least-once delivery: the same batch_id merges once; the
    replay returns False and leaves state untouched."""
    state = str(tmp_path / "state")
    orders = _orders(spark, sf_dir).filter(F.col("o_orderkey") % 7 == 0)
    assert merge_aggregate_state(
        spark, state, orders, KEYS, MEASURES, "order_month", batch_id="dup"
    )
    snap = _final(read_aggregate_view(spark, state, MEASURES, avg_of=["o_totalprice"]))
    assert not merge_aggregate_state(
        spark, state, orders, KEYS, MEASURES, "order_month", batch_id="dup"
    )
    assert (
        _final(read_aggregate_view(spark, state, MEASURES, avg_of=["o_totalprice"]))
        == snap
    )
    assert batch_already_applied(spark, state, "dup")
    assert not batch_already_applied(spark, state, "other")


def test_marker_rides_the_commit_through_crash_recovery(spark, tmp_path):
    """The exactly-once fact is atomic with the data: a crash AFTER the
    intent is persisted rolls forward to data + marker together; a
    crash BEFORE leaves neither, so the batch correctly retries."""
    path = str(tmp_path / "state")
    df = spark.createDataFrame([(1, "m1", 5)], "k int, m string, s long")
    df.write.partitionBy("m").parquet(path)

    # crash after commit point: staged data + intent naming the marker
    staging = os.path.join(path, f"{STAGING_PREFIX}feedface")
    spark.createDataFrame([(2, "m1", 9)], "k int, m string, s long").write.partitionBy(
        "m"
    ).parquet(staging)
    _write_intent(
        spark,
        staging,
        {
            "partition_col": "m",
            "partitions": ["m=m1"],
            "emptied": [],
            "markers": ["_APPLIED_bX"],
        },
    )
    recover_staged_commits(spark, path)
    assert batch_already_applied(spark, path, "bX")
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {2}

    # crash before commit point: rollback, marker absent → retry runs
    staging2 = os.path.join(path, f"{STAGING_PREFIX}0badc0de")
    spark.createDataFrame([(3, "m1", 1)], "k int, m string, s long").write.partitionBy(
        "m"
    ).parquet(staging2)
    recover_staged_commits(spark, path)
    assert not batch_already_applied(spark, path, "bY")
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {2}


def test_untouched_partitions_are_not_rewritten(spark, sf_dir, tmp_path):
    """Merge work is proportional to the batch: folding a batch that
    touches one month leaves every other month's partition files
    byte-identical (mtime unchanged)."""
    state = str(tmp_path / "state")
    orders = _orders(spark, sf_dir)
    merge_aggregate_state(spark, state, orders, KEYS, MEASURES, "order_month")
    months = sorted(
        d for d in os.listdir(state) if d.startswith("order_month=")
    )
    assert len(months) > 12
    target = months[0].split("=", 1)[1]
    mtimes = {
        d: os.path.getmtime(os.path.join(state, d)) for d in months if d != f"order_month={target}"
    }
    batch = orders.filter(F.date_format("o_orderdate", "yyyy-MM") == target)
    assert batch.count() > 0
    merge_aggregate_state(spark, state, batch, KEYS, MEASURES, "order_month")
    for d, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(state, d)) == mt


def test_empty_first_batch_commits_marker_without_breaking_state(spark, sf_dir, tmp_path):
    """An empty batch is a valid unit of work: its marker commits (the
    replay is skipped) and the state stays mergeable for later real
    batches."""
    state = str(tmp_path / "state")
    orders = _orders(spark, sf_dir)
    empty = orders.filter(F.lit(False))
    assert merge_aggregate_state(
        spark, state, empty, KEYS, MEASURES, "order_month", batch_id="e0"
    )
    assert batch_already_applied(spark, state, "e0")
    assert merge_aggregate_state(
        spark, state, orders, KEYS, MEASURES, "order_month", batch_id="r1"
    )
    got = _final(read_aggregate_view(spark, state, MEASURES, avg_of=["o_totalprice"]))
    assert len(got) > 0


def test_hll_distinct_merges_across_batches(spark, sf_dir, tmp_path):
    """COUNT DISTINCT as mergeable HLL partials: folding date-sliced
    batches then estimating equals (within the sketch's documented
    ~2% band) the exact one-shot distinct — the measure a naive
    per-batch count-distinct rollup CANNOT provide."""
    state = str(tmp_path / "state")
    orders = _orders(spark, sf_dir)
    measures = {"o_custkey": ["hll"]}
    keys = ["order_month"]
    for i, half in enumerate(
        [orders.filter(F.col("o_orderkey") % 2 == 0), orders.filter(F.col("o_orderkey") % 2 == 1)]
    ):
        # halves OVERLAP in custkeys per month — the union must dedup
        assert merge_aggregate_state(
            spark, state, half, keys, measures, "order_month", batch_id=f"h{i}"
        )
    got = {
        r["order_month"]: r["o_custkey__approx_distinct"]
        for r in read_aggregate_view(spark, state, measures).collect()
    }
    exact = {
        r["order_month"]: r["d"]
        for r in orders.groupBy("order_month")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for m, est in got.items():
        assert abs(est - exact[m]) <= max(2, 0.05 * exact[m]), (m, est, exact[m])


def test_schema_drift_raises_loudly(spark, sf_dir, tmp_path):
    """Folding with measures that differ from the state's original
    definition fails with a named error instead of a resolution error
    or a silently partial merge."""
    import pytest

    state = str(tmp_path / "state")
    orders = _orders(spark, sf_dir)
    merge_aggregate_state(spark, state, orders, KEYS, MEASURES, "order_month")
    with pytest.raises(ValueError, match="state schema mismatch"):
        merge_aggregate_state(
            spark, state, orders, KEYS, {"o_totalprice": ["sum"]}, "order_month"
        )


def test_hist_measure_merges_exactly_and_bounds_quantiles(spark, tmp_path):
    """The 'hist:<w>' measure: folding 3 batches produces EXACTLY the
    bin map of a one-shot aggregate over the union (map merge is
    lossless), and every read-time quantile estimate is within one
    bin_width of the exact quantile."""
    import numpy as np

    from reactionetl_etl_spark.etl.incremental_agg import (
        _partial,
        merge_aggregate_state,
        read_aggregate_view,
    )

    rng = np.random.default_rng(3)
    from decimal import Decimal as _D

    rows = [
        ("g1" if i % 3 else "g2", _D(str(round(float(v), 4))), f"d{i % 2}")
        for i, v in enumerate(rng.normal(50, 20, 600))
    ]
    batches = [rows[:200], rows[200:400], rows[400:]]
    schema = "grp string, value decimal(12,4), day string"
    state = str(tmp_path / "hist_state")
    measures = {"value": ["hist:5.0", "sum", "count"]}
    for i, b in enumerate(batches):
        merge_aggregate_state(
            spark, state, spark.createDataFrame(b, schema),
            ["grp", "day"], measures, "day", batch_id=f"b{i}",
        )
    # merged map == one-shot map over the union, exactly
    folded = {
        (r["grp"], r["day"]): dict(r["value__hist"])
        for r in spark.read.parquet(state).collect()
    }
    oneshot = {
        (r["grp"], r["day"]): dict(r["value__hist"])
        for r in _partial(
            spark.createDataFrame(rows, schema), ["grp", "day"], measures
        ).collect()
    }
    assert folded == oneshot
    # quantile error contract: within one bin width of exact
    view = read_aggregate_view(
        spark, state, measures, quantiles={"value": [0.5, 0.95]}
    )
    got = {(r["grp"], r["day"]): (r["value__p50"], r["value__p95"]) for r in view.collect()}
    import math

    for (g, d), (p50, p95) in got.items():
        vals = sorted(float(v) for gg, v, dd in rows if gg == g and dd == d)
        for q, est in ((0.5, p50), (0.95, p95)):
            exact = vals[max(0, math.ceil(q * len(vals)) - 1)]
            assert abs(est - exact) <= 5.0, (g, d, q, est, exact)


def test_hist_state_survives_null_group_key(spark, tmp_path):
    """A NULL group key is a valid rollup group (groupBy semantics).
    The hist map rides in via a join on the group keys — which must be
    NULL-SAFE, or the NULL-key group silently gets a NULL hist (and
    NULL quantiles) while its sum/count merge fine (ADVICE r6)."""
    from reactionetl_etl_spark.etl.incremental_agg import (
        merge_aggregate_state,
        read_aggregate_view,
    )

    from decimal import Decimal as _D

    schema = "grp string, value decimal(12,4), day string"
    batches = [
        [(None, _D("10.0"), "d0"), ("g1", _D("20.0"), "d0")],
        [(None, _D("30.0"), "d0"), (None, _D("12.0"), "d1"), ("g1", _D("40.0"), "d1")],
    ]
    state = str(tmp_path / "null_key_state")
    measures = {"value": ["hist:10.0", "sum", "count"]}
    for i, b in enumerate(batches):
        merge_aggregate_state(
            spark, state, spark.createDataFrame(b, schema),
            ["grp", "day"], measures, "day", batch_id=f"b{i}",
        )
    rows = {
        (r["grp"], r["day"]): (r["value__sum"], dict(r["value__hist"] or {}))
        for r in spark.read.parquet(state).collect()
    }
    # NULL-key groups keep their bin counts across the fold
    assert rows[(None, "d0")] == (40.0, {1: 1, 3: 1})
    assert rows[(None, "d1")] == (12.0, {1: 1})
    assert rows[("g1", "d0")] == (20.0, {2: 1})
    view = read_aggregate_view(spark, state, measures, quantiles={"value": [0.5]})
    p50 = {(r["grp"], r["day"]): r["value__p50"] for r in view.collect()}
    assert p50[(None, "d0")] is not None and abs(p50[(None, "d0")] - 15.0) < 1e-9


def test_double_sum_measure_warns(spark, tmp_path):
    """The exact-type tripwire: summing a DOUBLE measure warns that the
    fold is not bit-exact vs recompute (the r6 driver-failure class);
    decimal measures stay silent."""
    import warnings

    dbl = spark.createDataFrame([("a", 1.5, "d0")], "g string, v double, day string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merge_aggregate_state(
            spark, str(tmp_path / "s1"), dbl, ["g", "day"], {"v": ["sum"]}, "day"
        )
    assert any("not bit-exact" in str(x.message) for x in w)

    from decimal import Decimal

    dec = spark.createDataFrame(
        [("a", Decimal("1.50"), "d0")], "g string, v decimal(10,2), day string"
    )
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        merge_aggregate_state(
            spark, str(tmp_path / "s2"), dec, ["g", "day"], {"v": ["sum"]}, "day"
        )
    assert not any("not bit-exact" in str(x.message) for x in w2)


def test_cdc_fold_tracks_mutating_table_exactly(spark, tmp_path):
    """Incremental view maintenance: seed the rollup from v1, then fold
    ONLY the CDC feed of an upsert (price updates + inserts + implied
    deletes via snapshot_delete) — state must equal a from-scratch
    rollup over the post-change table, including hist bins, with
    fully-deleted groups absent."""
    from decimal import Decimal as _D

    from reactionetl_etl_spark.etl.incremental_agg import (
        _partial,
        apply_changes_to_rollup,
        merge_aggregate_state,
    )
    from reactionetl_etl_spark.etl.snapshots import (
        snapshot_changes,
        snapshot_delete,
        snapshot_read,
        snapshot_upsert,
        snapshot_write,
    )

    rows = [
        (k, f"d{k % 3}", _D(str((k % 7) + 1)) * 10) for k in range(60)
    ]
    base = spark.createDataFrame(rows, "k int, day string, v decimal(12,2)")
    table = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    keys = ["day"]
    measures = {"v": ["sum", "count", "hist:20.0", "min", "max"]}

    v1 = snapshot_write(spark, table, base.repartition(4, "k"))
    merge_aggregate_state(spark, state, snapshot_read(spark, table), keys, measures, "day", batch_id="seed")

    # updates (+10) on k%5, inserts of new keys, then delete day d2 rows
    upd = base.filter(F.col("k") % 5 == 0).withColumn(
        "v", (F.col("v") + 10).cast("decimal(12,2)")
    )
    ins = spark.createDataFrame(
        [(1000 + i, "d1", _D("999.50")) for i in range(5)], "k int, day string, v decimal(12,2)"
    )
    v2 = snapshot_upsert(spark, table, upd.unionByName(ins), ["k"])
    v3 = snapshot_delete(spark, table, "day = 'd2'")

    for frm, to in ((v1, v2), (v2, v3)):
        assert apply_changes_to_rollup(
            spark, state, snapshot_changes(spark, table, ["k"], frm, to),
            keys, measures, "day", batch_id=f"cdc-{frm}-{to}",
            base=snapshot_read(spark, table, to),
        )

    def snap(df):
        return {
            r["day"]: (
                r["__nrows"], r["v__sum"], r["v__count"],
                dict(r["v__hist"] or {}), r["v__min"], r["v__max"],
            )
            for r in df.collect()
        }

    folded = snap(spark.read.parquet(state))
    scratch = snap(_partial(snapshot_read(spark, table), keys, measures))
    assert folded == scratch
    assert "d2" not in folded  # fully-deleted group left the state

    # replay is exactly-once
    assert not apply_changes_to_rollup(
        spark, state, snapshot_changes(spark, table, ["k"], v1, v2),
        keys, measures, "day", batch_id=f"cdc-{v1}-{v2}",
        base=snapshot_read(spark, table),
    )


def test_cdc_fold_rejects_non_retractable_measures(spark, tmp_path):
    import pytest

    from reactionetl_etl_spark.etl.incremental_agg import apply_changes_to_rollup

    ch = spark.createDataFrame(
        [(1, "d0", 5.0, "insert")], "k int, day string, v double, _change_type string"
    )
    with pytest.raises(ValueError, match="cannot retract"):
        apply_changes_to_rollup(
            spark, str(tmp_path / "s"), ch, ["day"], {"v": ["min"]}, "day"
        )  # min without base= — no way to recompute
    bad = spark.createDataFrame(
        [(1, "d0", 5.0, "upsert")], "k int, day string, v double, _change_type string"
    )
    with pytest.raises(ValueError, match="unknown change type"):
        apply_changes_to_rollup(
            spark, str(tmp_path / "s2"), bad, ["day"], {"v": ["sum"]}, "day"
        )
