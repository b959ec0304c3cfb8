"""End-to-end ETL fixture tests (SURVEY.md §5.2-5.3, FIXTURES.md §A).

Asserts the reference's intended semantics — conformed fact/dim
contents, enrichment, audit pairs, incremental no-op re-runs,
quarantine of malformed input — against the Spark pipeline.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.audit import latest_status
from reactionetl_etl_spark.etl.pipeline import ReactionLake

from tests.fixtures_etl import (
    sim_uuid,
    write_metadata_json,
    write_reaction_csv,
)

N_ROWS = 20
T0 = datetime(2026, 1, 10, 12, 0, 0)


@pytest.fixture(scope="module")
def incoming(tmp_path_factory):
    """3 valid sims across 2 days + every negative fixture class."""
    root = tmp_path_factory.mktemp("incoming")
    d1, d2 = str(root / "2026-01-05"), str(root / "2026-01-06")
    paths = {
        "ok1": write_reaction_csv(d1, 1, N_ROWS),
        "ok2": write_reaction_csv(d1, 2, N_ROWS, with_artifact=True),
        "ok3": write_reaction_csv(d2, 3, N_ROWS, extra_col=True),
        "missing_col": write_reaction_csv(d2, 4, N_ROWS, drop_col="Tsensor (K)"),
        "malformed": write_reaction_csv(d2, 5, N_ROWS, malformed_row_at=7),
        "meta1": write_metadata_json(d1, 1, "2026-01-05"),
        "meta2": write_metadata_json(d1, 2, "2026-01-05"),
        "meta3": write_metadata_json(d2, 3, "2026-01-06"),
        "meta_bad": write_metadata_json(d2, 6, "2026-01-06", bad_value=True),
        "meta_missing": write_metadata_json(d2, 7, missing_field="reaction_name"),
    }
    # non-.csv file in a day dir must be ignored (file_manager.py:45)
    (root / "2026-01-06" / "notes.txt").write_text("ignore me")
    return root, paths


@pytest.fixture(scope="module")
def lake(spark, incoming, tmp_path_factory):
    root, _ = incoming
    lk = ReactionLake(str(tmp_path_factory.mktemp("lake")))
    lk.result = lk.run_once(spark, str(root), now=T0)
    return lk


def test_operational_logs_written(spark, lake):
    """Reference logging_config parity: run_once writes rotating
    info.log (all events) and error.log (WARNING+: quarantines)."""
    import os

    log_dir = f"{lake.root}/logs"
    info = open(os.path.join(log_dir, "info.log")).read()
    err = open(os.path.join(log_dir, "error.log")).read()
    assert "run_once done:" in info and "ingested" in info
    assert "quarantined" in err and "INFO" not in err


def test_fact_rowcounts(spark, lake):
    """Valid files load fully; the malformed file loses exactly its bad
    row; the missing-column file loads nothing."""
    fact = lake.fact(spark)
    per_sim = {
        r["simulation_id"]: r["n"]
        for r in fact.groupBy("simulation_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_sim[sim_uuid(1)] == N_ROWS
    assert per_sim[sim_uuid(2)] == N_ROWS  # artifact column dropped, not fatal
    assert per_sim[sim_uuid(3)] == N_ROWS  # extra column tolerated
    assert per_sim[sim_uuid(5)] == N_ROWS - 1  # malformed row quarantined
    assert sim_uuid(4) not in per_sim  # missing required column → rejected
    assert lake.result.fact_rows_loaded == 4 * N_ROWS - 1


def test_fact_conformed_schema(spark, lake):
    fact = lake.fact(spark)
    cols = dict(fact.dtypes)
    for c in ("ca", "cb", "cc", "cd", "temperature", "t_sensor", "rxn_time"):
        assert cols[c] == "double"
    assert cols["simulation_id"] == "string"
    assert "Unnamed: 0" not in cols and "Notes" not in cols
    # deterministic row ids are unique
    assert fact.select("row_id").distinct().count() == fact.count()


def test_dim_contents_and_sequence(spark, lake):
    """Valid metadata loads; simulation_num is dense starting at 1 in
    (date_run, simulation_id) order; invalid metadata never lands."""
    dim = lake.dim(spark).orderBy("simulation_num").collect()
    assert [r["simulation_num"] for r in dim] == [1, 2, 3]
    assert [r["simulation_id"] for r in dim] == [sim_uuid(1), sim_uuid(2), sim_uuid(3)]
    assert dim[0]["activation_energy"] == 52001.0
    assert str(dim[0]["date_run"]) == "2026-01-05"
    loaded_ids = {r["simulation_id"] for r in dim}
    assert sim_uuid(6) not in loaded_ids and sim_uuid(7) not in loaded_ids


def test_enrichment_inline_and_materialization_noop(spark, lake):
    """EP3: with the default enrich_inline, every fact row whose
    metadata arrived in the batch lands ALREADY enriched; rows without
    metadata stay NULL; materialize_enrichment then has nothing to do
    (sim 5's facts stay NULL — its metadata never arrives, so its day
    would be rewritten to the same NULLs, which counts as 0)."""
    before = lake.fact(spark).count()
    view = lake.fact_enriched(spark)
    assert view.count() == before

    fact = lake.fact(spark)
    matched = fact.filter(F.col("simulation_num").isNotNull())
    assert matched.count() == 3 * N_ROWS  # enriched AT WRITE time
    pairs = {
        (r["simulation_id"], r["simulation_num"])
        for r in matched.select("simulation_id", "simulation_num").distinct().collect()
    }
    assert pairs == {(sim_uuid(1), 1), (sim_uuid(2), 2), (sim_uuid(3), 3)}
    assert lake.materialize_enrichment(spark) == 0  # nothing left to fill
    assert lake.fact(spark).count() == before  # J1: row count preserved


def test_materialize_enrichment_fills_late_metadata(spark, incoming, tmp_path_factory):
    """W6 staged-rewrite path on its production scenario: facts arrive
    BEFORE their metadata (enrich_inline finds no dim row), the next
    run loads the metadata, and materialize_enrichment back-fills the
    earlier facts via the atomic partition swap."""
    import shutil

    root = tmp_path_factory.mktemp("late_incoming")
    d1 = str(root / "2026-02-01")
    csv_path = write_reaction_csv(d1, 11, N_ROWS)
    lk = ReactionLake(str(tmp_path_factory.mktemp("late_lake")))
    lk.run_once(spark, str(root), now=T0)
    fact = lk.fact(spark)
    assert fact.filter(F.col("simulation_num").isNotNull()).count() == 0

    write_metadata_json(d1, 11, "2026-02-01")
    lk.run_once(spark, str(root), now=T0)
    # metadata landed, but the earlier facts are still NULL …
    assert (
        lk.fact(spark).filter(F.col("simulation_num").isNotNull()).count() == 0
    )
    # … until the gap-filling rewrite runs
    assert lk.materialize_enrichment(spark) == N_ROWS
    enriched = lk.fact(spark).filter(F.col("simulation_num").isNotNull())
    assert enriched.count() == N_ROWS
    assert lk.materialize_enrichment(spark) == 0  # idempotent


def test_enrich_inline_false_defers_to_materialization(
    spark, incoming, tmp_path_factory
):
    """The strict load-then-rewrite sequence is still available
    (enrich_inline=False) and converges to the same state."""
    root, _ = incoming
    lk = ReactionLake(str(tmp_path_factory.mktemp("strict_lake")))
    lk.run_once(spark, str(root), now=T0, enrich_inline=False)
    fact = lk.fact(spark)
    assert fact.filter(F.col("simulation_num").isNotNull()).count() == 0
    assert lk.materialize_enrichment(spark) == 3 * N_ROWS
    matched = lk.fact(spark).filter(F.col("simulation_num").isNotNull())
    assert matched.count() == 3 * N_ROWS


def test_quarantine_contents(spark, lake):
    q = lake.quarantine(spark)
    reasons = [r["reason"] for r in q.collect()]
    assert any("malformed row" in r for r in reasons)
    assert any("missing required columns" in r for r in reasons)
    assert any("metadata validation failed" in r for r in reasons)
    # the malformed row's payload is preserved for replay
    bad = q.filter(F.col("reason").contains("malformed")).first()
    assert "NOT_A_NUMBER" in bad["payload"]


def test_audit_running_success_pairs(spark, lake):
    """One running→terminal event pair per processed file (W4/W5)."""
    audit = lake.audit(spark)
    # 5 csvs + 5 jsons, 2 events each
    assert audit.count() == 20
    per_id = audit.groupBy("etl_id").agg(
        F.count("*").alias("n"), F.min("status").alias("s1"), F.max("status").alias("s2")
    )
    assert per_id.filter(F.col("n") != 2).count() == 0
    latest = latest_status(audit)
    assert latest.count() == 10
    by_status = {
        r["status"]: r["n"]
        for r in latest.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    # csvs: ok1 ok2 ok3 malformed(partial success) = 4 success, missing_col quarantined
    # jsons: meta1-3 success, meta_bad + meta_missing quarantined
    assert by_status == {"success": 7, "quarantined": 3}
    assert latest.filter(F.col("status") == "running").count() == 0


def test_incremental_rerun_is_noop(spark, lake, incoming):
    """README.md:15 semantics: re-running with no new files is a no-op."""
    root, _ = incoming
    before_fact = lake.fact(spark).count()
    before_dim = lake.dim(spark).count()
    res = lake.run_once(spark, str(root), now=T0)
    assert res.files_processed == 0
    assert lake.fact(spark).count() == before_fact
    assert lake.dim(spark).count() == before_dim


def test_incremental_new_file_only(spark, lake, incoming):
    """A newly arrived file is picked up; old files are not reloaded."""
    root, _ = incoming
    day3 = str(root / "2026-01-07")
    write_reaction_csv(day3, 8, N_ROWS)
    write_metadata_json(day3, 8, "2026-01-07")
    res = lake.run_once(spark, str(root), now=T0)
    assert res.files_processed == 2
    assert res.fact_rows_loaded == N_ROWS
    assert res.dim_rows_loaded == 1
    # the new dim row extends the dense sequence, never reusing numbers
    dim = lake.dim(spark)
    assert dim.agg(F.max("simulation_num")).first()[0] == 4
    assert dim.select("simulation_num").distinct().count() == 4
    # the new day's facts arrive enriched inline (same-batch metadata),
    # so the gap-filling rewrite has nothing to do
    new_day = lake.fact(spark).filter(F.col("day") == "2026-01-07")
    assert new_day.filter(F.col("simulation_num").isNotNull()).count() == N_ROWS
    assert lake.materialize_enrichment(spark) == 0


def test_duplicate_metadata_skipped(spark, lake, incoming, tmp_path_factory):
    """PK semantics: a metadata file for an already-loaded simulation_id
    is processed but its row is skipped, keeping the dim unique."""
    root, _ = incoming
    day4 = str(root / "2026-01-08")
    write_metadata_json(day4, 1, "2026-01-08")  # sim 1 already in dim
    res = lake.run_once(spark, str(root), now=T0)
    assert res.files_processed == 1
    assert res.dim_rows_loaded == 0
    dim = lake.dim(spark)
    assert dim.filter(F.col("simulation_id") == sim_uuid(1)).count() == 1


def test_dir_read_pipeline_parity(spark, tmp_path_factory, monkeypatch):
    """run_once over a fresh all-new backlog takes the O(dirs) dir-read
    fast path; the resulting lake (facts, dims, audit counts) is
    identical to the per-path lake, and a later partial-dir increment
    (which must fall back to per-path) loads exactly the new file."""
    from reactionetl_etl_spark.sources import raw as R

    root = tmp_path_factory.mktemp("incoming_dirread")
    d1, d2 = str(root / "2026-02-01"), str(root / "2026-02-02")
    for day_dir, day, sims in ((d1, "2026-02-01", (1, 2, 3)), (d2, "2026-02-02", (4, 5))):
        for n in sims:
            write_reaction_csv(day_dir, n, N_ROWS)
            write_metadata_json(day_dir, n, day)

    def lake_state(lk):
        fact = sorted(
            map(tuple, lk.fact(spark).drop("load_ts", "row_id").collect())
        )
        dim = sorted(map(tuple, lk.dim(spark).drop("load_ts").collect()))
        audit = sorted(
            (r["source_file"].rsplit("/", 1)[-1], r["status"], r["records_inserted"])
            for r in lk.audit(spark).collect()
        )
        return fact, dim, audit

    monkeypatch.setattr(R, "DIR_READ_MIN_FILES", 1)
    fast = ReactionLake(str(tmp_path_factory.mktemp("lake_fast")))
    res_fast = fast.run_once(spark, str(root), now=T0)

    monkeypatch.setattr(R, "DIR_READ_MIN_FILES", 10**9)
    slow = ReactionLake(str(tmp_path_factory.mktemp("lake_slow")))
    res_slow = slow.run_once(spark, str(root), now=T0)

    assert res_fast.files_processed == res_slow.files_processed == 10
    assert lake_state(fast) == lake_state(slow)

    # partial-dir increment: one new file lands in an existing day dir;
    # len(new) != len(listed) so the reader falls back to per-path
    monkeypatch.setattr(R, "DIR_READ_MIN_FILES", 1)
    write_reaction_csv(d2, 6, N_ROWS)
    write_metadata_json(d2, 6, "2026-02-02")
    res2 = fast.run_once(spark, str(root), now=T0)
    assert res2.files_processed == 2
    assert res2.fact_rows_loaded == N_ROWS
    assert fast.fact(spark).count() == 6 * N_ROWS
    assert fast.dim(spark).count() == 6


def test_dir_read_pipeline_ingests_odd_basename(spark, tmp_path_factory, monkeypatch):
    """ADVICE-r9 regression, end to end: a *.csv batch member whose
    basename does not match the reaction* convention must be INGESTED
    by the dir-read fast path — not silently excluded by a narrow scan
    glob, audited as success/0 rows, and manifest-blacklisted forever.
    The odd file here has a valid header and rows, so its fact rows
    must land and its audit row must carry the true count; a second
    run_once must find nothing new (manifest recorded it as processed,
    correctly this time)."""
    import os
    import shutil

    from reactionetl_etl_spark.sources import raw as R

    root = tmp_path_factory.mktemp("incoming_oddname")
    day = str(root / "2026-02-03")
    for n in (1, 2, 3):
        write_reaction_csv(day, n, N_ROWS)
        write_metadata_json(day, n, "2026-02-03")
    src = write_reaction_csv(day, 7, N_ROWS)
    odd = os.path.join(day, "legacy_export.csv")
    shutil.move(src, odd)

    monkeypatch.setattr(R, "DIR_READ_MIN_FILES", 1)
    lk = ReactionLake(str(tmp_path_factory.mktemp("lake_oddname")))
    res = lk.run_once(spark, str(root), now=T0)
    assert res.files_processed == 7  # 4 csvs + 3 jsons
    assert res.fact_rows_loaded == 4 * N_ROWS
    assert lk.fact(spark).count() == 4 * N_ROWS
    # append-only audit: each file gets a running + terminal event pair;
    # the odd file's TERMINAL row must be success with the true count
    odd_events = {
        (r["status"], r["records_inserted"])
        for r in lk.audit(spark).collect()
        if r["source_file"].endswith("legacy_export.csv")
    }
    assert odd_events == {("running", None), ("success", N_ROWS)}

    res2 = lk.run_once(spark, str(root), now=T0)
    assert res2.files_processed == 0  # manifested once, correctly
