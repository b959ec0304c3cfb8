"""Declarative data-quality expectations (etl/expectations.py)."""

from __future__ import annotations

from reactionetl_etl_spark.etl.expectations import (
    expect_foreign_key,
    expect_not_null,
    expect_predicate,
    expect_range,
    expect_regex,
    expect_unique,
    expect_values_in,
    run_expectations,
)


def test_expectations_count_violations_per_rule(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "OPEN", 100),
            (2, None, -5.0, "OPEN", 100),          # null email, negative amount
            (2, "c@x.com", 20.0, "WAT", 200),      # dup id, bad status
            (4, "not-an-email", 999.0, "CLOSED", 300),  # bad regex, fk miss
            (5, "e@x.com", 50.0, None, None),      # null status ok-ish; null fk ok
        ],
        "id int, email string, amount double, status string, cust int",
    )
    ref = spark.createDataFrame([(100,), (200,)], "ck int")
    report = run_expectations(
        df,
        [
            expect_not_null("email_not_null", "email"),
            expect_range("amount_0_500", "amount", 0, 500),
            expect_values_in("status_domain", "status", ["OPEN", "CLOSED"]),
            expect_regex("email_shape", "email", r"^[^@]+@[^@]+\.[a-z]+$"),
            expect_predicate("amount_gt_id", "amount < id"),
            expect_unique("id_unique", ["id"]),
            expect_foreign_key("cust_fk", ["cust"], ref, ["ck"]),
        ],
    )
    rows = {r["rule"]: (r["kind"], r["n_violations"], r["passed"]) for r in report.collect()}
    assert rows == {
        "email_not_null": ("not_null", 1, False),
        "amount_0_500": ("range", 2, False),     # -5 and 999
        "status_domain": ("values_in", 1, False),
        "email_shape": ("regex", 1, False),
        "amount_gt_id": ("predicate", 1, False),  # the -5.0 row
        "id_unique": ("unique", 2, False),       # both rows of key 2
        "cust_fk": ("foreign_key", 1, False),    # 300; NULL fk passes
    }
    # deterministic rule order = declaration order
    assert [r["rule"] for r in report.collect()] == [
        "email_not_null", "amount_0_500", "status_domain",
        "email_shape", "amount_gt_id", "id_unique", "cust_fk",
    ]


def test_expectations_all_green(spark, sf_dir):
    from reactionetl_etl_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    report = run_expectations(
        orders,
        [
            expect_not_null("key_not_null", "o_orderkey"),
            expect_unique("key_unique", ["o_orderkey"]),
            expect_range("price_positive", "o_totalprice", 0, None),
            expect_foreign_key("cust_fk", ["o_custkey"], cust, ["c_custkey"]),
        ],
    )
    assert all(r["passed"] for r in report.collect())


def test_write_with_expectations_matches_separate_pass(spark, tmp_path):
    """The observed (write-job-riding) report must equal the standalone
    run_expectations report, the data must land, and the row count must
    come from the same observation."""
    from reactionetl_etl_spark.etl.expectations import (
        expect_foreign_key,
        expect_not_null,
        expect_range,
        expect_unique,
        run_expectations,
        write_with_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, None), (2, 700.0, "b"), (3, 50.0, "c")],
        "id int, amount double, tag string",
    )
    ref = spark.createDataFrame([("a",), ("b",)], "tag string")
    rules = [
        expect_not_null("tag_not_null", "tag"),
        expect_range("amount_0_500", "amount", 0, 500),
        expect_unique("id_unique", ["id"]),
        expect_foreign_key("tag_fk", ["tag"], ref, ["tag"]),
    ]
    out = str(tmp_path / "observed_write")
    report, n_rows = write_with_expectations(df, out, rules, mode="overwrite")
    assert n_rows == 4
    assert spark.read.parquet(out).count() == 4
    got = [(r["rule"], r["kind"], r["n_violations"], r["passed"]) for r in report.collect()]
    want = [
        (r["rule"], r["kind"], r["n_violations"], r["passed"])
        for r in run_expectations(df, rules).collect()
    ]
    assert got == want
    assert got[0] == ("tag_not_null", "not_null", 1, False)
    assert got[1] == ("amount_0_500", "range", 2, False)


def test_write_with_expectations_degenerate_inputs(spark, tmp_path):
    """Empty rule list → the write completes and an EMPTY report comes
    back (not an IndexError after the data landed); duplicate rule
    names → loud ValueError BEFORE anything is written (ADVICE r6)."""
    import os

    import pytest

    from reactionetl_etl_spark.etl.expectations import write_with_expectations

    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, name string")

    out = str(tmp_path / "no_rules")
    report, n = write_with_expectations(df, out, rules=[], mode="overwrite")
    assert n == 2 and report.count() == 0
    assert [f.name for f in report.schema.fields] == ["rule", "kind", "n_violations", "passed"]
    assert spark.read.parquet(out).count() == 2

    dup_path = str(tmp_path / "dup_rules")
    with pytest.raises(ValueError, match="duplicate rule names"):
        write_with_expectations(
            df, dup_path,
            rules=[expect_not_null("r", "id"), expect_not_null("r", "name")],
            mode="overwrite",
        )
    assert not os.path.exists(dup_path)  # validation fired before the write
