"""SCD Type 2 dimension history (etl/scd.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.scd import scd2_as_of, scd2_current, scd2_merge


def _upd(spark, rows):
    return spark.createDataFrame(rows, "id int, seg string, bal double, effective_date string")


def _hist(spark, path):
    from reactionetl_etl_spark.etl.snapshots import snapshot_read

    return {
        (r["id"], r["seg"], r["bal"], str(r["valid_from"]), str(r["valid_to"]))
        for r in snapshot_read(spark, path).collect()
    }


def test_scd2_change_close_insert_and_asof(spark, tmp_path):
    t = str(tmp_path / "dim")
    scd2_merge(
        spark, t, _upd(spark, [(1, "A", 10.0, "2020-01-01"), (2, "B", 20.0, "2020-01-01")]),
        ["id"], ["seg", "bal"],
    )
    # id 1 changes segment; id 3 is new; id 2 unchanged
    scd2_merge(
        spark, t,
        _upd(spark, [(1, "Z", 10.0, "2021-06-01"), (2, "B", 20.0, "2021-06-01"), (3, "C", 30.0, "2021-06-01")]),
        ["id"], ["seg", "bal"],
    )
    assert _hist(spark, t) == {
        (1, "A", 10.0, "2020-01-01", "2021-06-01"),
        (1, "Z", 10.0, "2021-06-01", "None"),
        (2, "B", 20.0, "2020-01-01", "None"),
        (3, "C", 30.0, "2021-06-01", "None"),
    }
    cur = {(r["id"], r["seg"]) for r in scd2_current(spark, t).collect()}
    assert cur == {(1, "Z"), (2, "B"), (3, "C")}
    then = {(r["id"], r["seg"]) for r in scd2_as_of(spark, t, "2020-07-01").collect()}
    assert then == {(1, "A"), (2, "B")}  # id 3 didn't exist yet
    # boundary: the change day belongs to the NEW row (half-open)
    boundary = {(r["id"], r["seg"]) for r in scd2_as_of(spark, t, "2021-06-01").collect()}
    assert (1, "Z") in boundary and (1, "A") not in boundary


def test_scd2_idempotent_and_guards(spark, tmp_path):
    t = str(tmp_path / "dim")
    b = _upd(spark, [(1, "A", 10.0, "2020-01-01")])
    scd2_merge(spark, t, b, ["id"], ["seg", "bal"])
    before = _hist(spark, t)
    scd2_merge(spark, t, b, ["id"], ["seg", "bal"])  # re-apply: no-op
    assert _hist(spark, t) == before

    with pytest.raises(ValueError, match="duplicated keys"):
        scd2_merge(
            spark, t,
            _upd(spark, [(1, "X", 1.0, "2022-01-01"), (1, "Y", 2.0, "2022-01-01")]),
            ["id"], ["seg", "bal"],
        )
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_merge(
            spark, t, _upd(spark, [(1, "X", 1.0, "2019-01-01")]), ["id"], ["seg", "bal"]
        )


def test_scd2_null_safe_tracking(spark, tmp_path):
    """NULL→value and value→NULL both count as changes; NULL→NULL does
    not (eqNullSafe semantics)."""
    t = str(tmp_path / "dim")
    scd2_merge(spark, t, _upd(spark, [(1, None, 10.0, "2020-01-01")]), ["id"], ["seg", "bal"])
    scd2_merge(spark, t, _upd(spark, [(1, None, 10.0, "2020-02-01")]), ["id"], ["seg", "bal"])
    assert len(_hist(spark, t)) == 1  # NULL == NULL: no new version
    scd2_merge(spark, t, _upd(spark, [(1, "A", 10.0, "2020-03-01")]), ["id"], ["seg", "bal"])
    assert len(_hist(spark, t)) == 2  # NULL -> 'A' closed the first row


def test_point_in_time_join_picks_interval_row(spark, tmp_path):
    """Each fact joins the history row whose [valid_from, valid_to)
    covers the fact's own timestamp; facts before the first interval
    drop (inner) or survive with NULLs (left)."""
    from reactionetl_etl_spark.etl.scd import scd2_merge, scd2_point_in_time_join
    from reactionetl_etl_spark.etl.snapshots import snapshot_read

    dim = str(tmp_path / "dim")
    b1 = spark.createDataFrame(
        [(1, "gold", "2020-01-01"), (2, "silver", "2020-01-01")],
        "k int, tier string, effective_date string",
    )
    scd2_merge(spark, dim, b1, ["k"], ["tier"])
    b2 = spark.createDataFrame(
        [(1, "plat", "2021-06-01"), (2, "silver", "2021-06-01")],
        "k int, tier string, effective_date string",
    )
    scd2_merge(spark, dim, b2, ["k"], ["tier"])
    facts = spark.createDataFrame(
        [(10, 1, "2020-05-05"), (11, 1, "2021-06-01"), (12, 2, "2022-01-01"),
         (13, 1, "2019-12-31"), (14, 9, "2021-01-01")],
        "fid int, k int, ts string",
    )
    hist = snapshot_read(spark, dim)
    inner = {
        r["fid"]: r["tier"]
        for r in scd2_point_in_time_join(facts, hist, ["k"], "ts").collect()
    }
    assert inner == {10: "gold", 11: "plat", 12: "silver"}
    left = {
        r["fid"]: r["tier"]
        for r in scd2_point_in_time_join(facts, hist, ["k"], "ts", how="left").collect()
    }
    assert left[13] is None and left[14] is None and left[10] == "gold"
