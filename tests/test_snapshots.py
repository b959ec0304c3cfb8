"""Snapshot-isolated parquet tables (etl/snapshots.py).

Contracts: the commit point is one atomic marker creation (a crash
before it is invisible); readers resolve complete snapshots only, even
across a concurrent overwrite; time travel reads any kept version;
vacuum removes exactly the unreferenced garbage.
"""

from __future__ import annotations

import os

from reactionetl_etl_spark.etl.snapshots import (
    head_version,
    snapshot_read,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _snap(spark, path, version=None):
    return {(r["k"], r["v"]) for r in snapshot_read(spark, path, version).collect()}


def test_write_read_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    assert head_version(spark, t) is None
    v1 = snapshot_write(spark, t, _df(spark, [(1, "a"), (2, "b")]))
    v2 = snapshot_write(spark, t, _df(spark, [(3, "c")]), mode="append")
    v3 = snapshot_write(spark, t, _df(spark, [(9, "z")]), mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3) and head_version(spark, t) == 3
    assert _snap(spark, t) == {(9, "z")}
    assert _snap(spark, t, v2) == {(1, "a"), (2, "b"), (3, "c")}  # time travel
    assert _snap(spark, t, v1) == {(1, "a"), (2, "b")}
    assert snapshot_versions(spark, t) == [1, 2, 3]


def test_reader_is_isolated_from_concurrent_overwrite(spark, tmp_path):
    """A plan resolved against v1 returns v1's rows even when the head
    moves (and is re-collected after): snapshot reads pin files, not
    directories."""
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _df(spark, [(1, "a")]))
    reader = snapshot_read(spark, t)  # resolves v1's file list NOW
    snapshot_write(spark, t, _df(spark, [(2, "b")]), mode="overwrite")
    assert {(r["k"], r["v"]) for r in reader.collect()} == {(1, "a")}
    assert _snap(spark, t) == {(2, "b")}  # new readers see the new head


def test_crash_before_marker_is_invisible(spark, tmp_path):
    """Staged data and even a written manifest WITHOUT its marker never
    surface: head, reads, and version listing are unchanged."""
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _df(spark, [(1, "a")]))
    # simulate a crashed writer: data files + manifest for v2, no marker
    _df(spark, [(7, "x")]).write.parquet(os.path.join(t, "data", "_stage-crash"))
    with open(os.path.join(t, "_snapshots", "v2.json"), "w") as fh:
        fh.write('{"version": 2, "mode": "overwrite", "files": ["data/nope.parquet"]}')
    assert head_version(spark, t) == 1
    assert snapshot_versions(spark, t) == [1]
    assert _snap(spark, t) == {(1, "a")}
    # the next real commit supersedes the orphan manifest (same slot)
    v = snapshot_write(spark, t, _df(spark, [(2, "b")]), mode="append")
    assert v == 2 and _snap(spark, t) == {(1, "a"), (2, "b")}


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _df(spark, [(1, "a")]))
    snapshot_write(spark, t, _df(spark, [(2, "b")]), mode="overwrite")
    snapshot_write(spark, t, _df(spark, [(3, "c")]), mode="append")
    os.makedirs(os.path.join(t, "data", "_stage-leftover"))
    deleted = snapshot_vacuum(spark, t, keep_last=2)
    # v1's file + its manifest pair + staging debris are gone
    assert any(d.startswith("data/") for d in deleted)
    assert "_snapshots/v1.json" in deleted and "_snapshots/v1.committed" in deleted
    assert "data/_stage-leftover" in deleted
    assert snapshot_versions(spark, t) == [2, 3]
    assert _snap(spark, t) == {(2, "b"), (3, "c")}
    assert _snap(spark, t, 2) == {(2, "b")}  # kept version still reads
    # every remaining data file is referenced by a kept manifest
    live = set()
    for v in (2, 3):
        from reactionetl_etl_spark.etl.snapshots import _manifest

        live.update(_manifest(spark, t, v)["files"])
    on_disk = {
        f"data/{n}" for n in os.listdir(os.path.join(t, "data")) if n.endswith(".parquet")
    }
    assert on_disk == live


def test_empty_overwrite_truncates_but_stays_readable(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _df(spark, [(1, "a")]))
    snapshot_write(spark, t, _df(spark, []).filter("1=0"), mode="overwrite")
    got = snapshot_read(spark, t)
    assert got.count() == 0 and got.columns == ["k", "v"]


def test_snapshot_upsert_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write MERGE: same-key rows replaced, new keys inserted,
    files without a matched key carried forward BYTE-identical (same
    manifest path), and the pre-merge version still time-travels."""
    from reactionetl_etl_spark.etl.snapshots import _manifest, snapshot_upsert

    t = str(tmp_path / "t")
    # two files: keys 1-2 in one, keys 3-4 in the other
    snapshot_write(spark, t, _df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    v2 = snapshot_write(spark, t, _df(spark, [(3, "c"), (4, "d")]).coalesce(1), mode="append")
    before_files = set(_manifest(spark, t, v2)["files"])

    v3 = snapshot_upsert(
        spark, t, _df(spark, [(3, "C!"), (9, "new")]).coalesce(1), ["k"]
    )
    assert _snap(spark, t) == {(1, "a"), (2, "b"), (3, "C!"), (4, "d"), (9, "new")}
    assert _snap(spark, t, v2) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    after_files = set(_manifest(spark, t, v3)["files"])
    carried = before_files & after_files
    # the file holding keys 1-2 was untouched and carried forward
    assert len(carried) == 1
    kept_rows = {
        (r["k"], r["v"])
        for r in spark.read.parquet(*(f"{t}/{f}" for f in carried)).collect()
    }
    assert kept_rows == {(1, "a"), (2, "b")}

    # duplicate update keys are refused
    import pytest

    with pytest.raises(ValueError, match="duplicated keys"):
        snapshot_upsert(spark, t, _df(spark, [(5, "x"), (5, "y")]), ["k"])

    # upsert into an empty table bootstraps it
    t2 = str(tmp_path / "t2")
    snapshot_upsert(spark, t2, _df(spark, [(1, "a")]), ["k"])
    assert _snap(spark, t2) == {(1, "a")}


def test_snapshot_delete_where(spark, tmp_path):
    """CoW DELETE: untouched files carry forward; matching files are
    rewritten without the matching rows; fully-deleted files vanish."""
    from reactionetl_etl_spark.etl.snapshots import _manifest, snapshot_delete

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    v2 = snapshot_write(spark, t, _df(spark, [(3, "c"), (4, "d")]).coalesce(1), mode="append")
    before = set(_manifest(spark, t, v2)["files"])

    v3 = snapshot_delete(spark, t, "k = 3")
    assert _snap(spark, t) == {(1, "a"), (2, "b"), (4, "d")}
    carried = before & set(_manifest(spark, t, v3)["files"])
    assert len(carried) == 1  # the 1-2 file survived as-is

    v4 = snapshot_delete(spark, t, "k IN (1, 2)")  # empties a whole file
    assert _snap(spark, t) == {(4, "d")}
    assert len(_manifest(spark, t, v4)["files"]) == 1
    assert _snap(spark, t, v2) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}


def test_snapshot_compact_preserves_rows_and_history(spark, tmp_path):
    """Compaction rewrites the head into fewer files with identical
    rows; readers of the pre-compaction version are untouched."""
    from reactionetl_etl_spark.etl.snapshots import _manifest, snapshot_compact

    t = str(tmp_path / "t")
    for i in range(5):  # five tiny appends → ≥5 files
        snapshot_write(spark, t, _df(spark, [(i, f"v{i}")]).coalesce(1), mode="append")
    before_version = head_version(spark, t)
    before_rows = _snap(spark, t)
    assert len(_manifest(spark, t, before_version)["files"]) >= 5

    v = snapshot_compact(spark, t, target_files=1)
    assert len(_manifest(spark, t, v)["files"]) == 1
    assert _snap(spark, t) == before_rows
    assert _snap(spark, t, before_version) == before_rows  # history intact


def test_snapshot_scan_prunes_files_from_manifest_stats(spark, tmp_path):
    """Data skipping: with the table clustered on k, a point/range scan
    touches a fraction of the files (counted from the PLAN's input
    files) and returns exactly what an unpruned scan + filter returns;
    stats survive upsert/compact; files without stats are kept."""
    from pyspark.sql import functions as F

    from reactionetl_etl_spark.etl.snapshots import (
        snapshot_compact,
        snapshot_scan,
        snapshot_scan_file_counts,
        snapshot_upsert,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(1000)], "k int, v string")
    # range-partitioned on k → tight, disjoint per-file min/max
    snapshot_write(spark, t, df.repartitionByRange(8, "k"), stats_cols=["k"])

    scanned, total = snapshot_scan_file_counts(spark, t, [("k", "=", 500)])
    assert total == 8 and scanned == 1
    got = {r["k"] for r in snapshot_scan(spark, t, [("k", "=", 500)]).collect()}
    assert got == {500}

    scanned, total = snapshot_scan_file_counts(spark, t, [("k", ">=", 900)])
    assert scanned <= 2  # the tail file(s) only
    rng = {r["k"] for r in snapshot_scan(spark, t, [("k", ">=", 900)]).collect()}
    assert rng == set(range(900, 1000))

    # conjunction: empty provable range → zero files, empty result
    scanned, total = snapshot_scan_file_counts(
        spark, t, [("k", ">", 990), ("k", "<", 5)]
    )
    assert scanned == 0
    assert snapshot_scan(spark, t, [("k", ">", 990), ("k", "<", 5)]).count() == 0

    # stats survive CoW upsert (carried + recomputed files)
    upd = spark.createDataFrame([(500, "X")], "k int, v string")
    snapshot_upsert(spark, t, upd, ["k"])
    scanned, total = snapshot_scan_file_counts(spark, t, [("k", "=", 3)])
    assert scanned == 1
    assert {r["v"] for r in snapshot_scan(spark, t, [("k", "=", 500)]).collect()} == {"X"}

    # and survive compaction (recomputed for the new layout)
    snapshot_compact(spark, t, target_files=4)
    pruned = snapshot_scan(spark, t, [("k", "=", 7)])
    assert [r["v"] for r in pruned.collect()] == ["v7"]


def test_schema_evolution_add_column(spark, tmp_path):
    """Appending a superset schema evolves the table: old files surface
    the new column as NULL, type changes are refused, and the evolved
    schema is what every read (head or time travel to the evolved
    version) applies."""
    import pytest

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _df(spark, [(1, "a")]))
    evolved = spark.createDataFrame([(2, "b", 9.5)], "k int, v string, score double")
    snapshot_write(spark, t, evolved, mode="append")

    got = {(r["k"], r["v"], r["score"]) for r in snapshot_read(spark, t).collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}
    assert snapshot_read(spark, t).columns == ["k", "v", "score"]

    bad = spark.createDataFrame([(3, 7)], "k int, v int")  # v: string→int
    with pytest.raises(ValueError, match="schema evolution cannot change"):
        snapshot_write(spark, t, bad, mode="append")


def test_snapshot_batch_id_exactly_once(spark, tmp_path):
    """An append replayed with the same batch_id is skipped (the fact
    rides the committed manifest), and a different batch_id applies."""
    from reactionetl_etl_spark.etl.snapshots import snapshot_batch_applied

    t = str(tmp_path / "t")
    v1 = snapshot_write(spark, t, _df(spark, [(1, "a")]), mode="append", batch_id="b1")
    v_replay = snapshot_write(spark, t, _df(spark, [(1, "a")]), mode="append", batch_id="b1")
    assert v_replay == v1  # no new version
    assert _snap(spark, t) == {(1, "a")}
    assert snapshot_batch_applied(spark, t, "b1")
    assert not snapshot_batch_applied(spark, t, "b2")
    snapshot_write(spark, t, _df(spark, [(2, "b")]), mode="append", batch_id="b2")
    assert _snap(spark, t) == {(1, "a"), (2, "b")}


def test_change_feed_upsert_delete_compact_append(spark, tmp_path):
    """snapshot_changes between versions: upsert → insert + pre/post
    image pairs; append-only → pure inserts whose scan touches ONLY the
    added files (no join, no old-file read); delete → delete rows;
    compaction → zero changes (carried rows reconcile as unchanged)."""
    from reactionetl_etl_spark.etl.snapshots import (
        snapshot_changes,
        snapshot_compact,
        snapshot_delete,
        snapshot_upsert,
    )

    t = str(tmp_path / "t")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(8)], "k int, v string")
    v1 = snapshot_write(spark, t, base.repartition(4, "k"))
    # v2: update k=1, insert k=100
    upd = spark.createDataFrame([(1, "V1"), (100, "new")], "k int, v string")
    v2 = snapshot_upsert(spark, t, upd, ["k"])
    feed = snapshot_changes(spark, t, ["k"], v1, v2)
    got = {(r["k"], r["v"], r["_change_type"]) for r in feed.collect()}
    assert got == {
        (100, "new", "insert"),
        (1, "v1", "update_preimage"),
        (1, "V1", "update_postimage"),
    }
    # v3: append-only commit → inserts only, scanning only added files
    v3 = snapshot_write(
        spark, t, spark.createDataFrame([(200, "x")], "k int, v string"), mode="append"
    )
    feed3 = snapshot_changes(spark, t, ["k"], v2, v3)
    assert [(r["k"], r["_change_type"]) for r in feed3.collect()] == [(200, "insert")]
    from reactionetl_etl_spark.etl.snapshots import _manifest

    added = set(_manifest(spark, t, v3)["files"]) - set(_manifest(spark, t, v2)["files"])
    scanned = {f.split("/")[-1] for f in feed3.inputFiles()}
    assert scanned == {f.split("/")[-1] for f in added}
    # v4: delete k=2
    v4 = snapshot_delete(spark, t, "k = 2")
    feed4 = snapshot_changes(spark, t, ["k"], v3, v4)
    assert {(r["k"], r["_change_type"]) for r in feed4.collect()} == {(2, "delete")}
    # v5: compaction is change-free
    v5 = snapshot_compact(spark, t, target_files=1)
    assert snapshot_changes(spark, t, ["k"], v4, v5).count() == 0
    # cumulative feed v1 → head nets everything
    total = snapshot_changes(spark, t, ["k"], v1)
    types = {r["_change_type"] for r in total.collect()}
    assert types == {"insert", "delete", "update_preimage", "update_postimage"}


def test_apply_changes_replicates_source_table(spark, tmp_path):
    """The CDC round trip: every change feed of the source, applied in
    order to a replica, reproduces the source head exactly — across
    upserts, deletes, and a compaction (whose feed is empty). Replays
    of an applied batch_id no-op; ambiguous batches raise."""
    import pytest

    from reactionetl_etl_spark.etl.snapshots import (
        snapshot_apply_changes,
        snapshot_changes,
        snapshot_compact,
        snapshot_delete,
        snapshot_upsert,
        snapshot_versions,
    )

    src = str(tmp_path / "src")
    rep = str(tmp_path / "rep")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(6)], "k int, v string")
    snapshot_write(spark, src, base.repartition(3, "k"))
    snapshot_upsert(
        spark, src, spark.createDataFrame([(2, "V2"), (50, "new")], "k int, v string"), ["k"]
    )
    snapshot_delete(spark, src, "k = 3")
    snapshot_compact(spark, src, target_files=1)

    versions = snapshot_versions(spark, src)
    # bootstrap replica from v1's full image, then fold each feed
    snapshot_apply_changes(
        spark,
        rep,
        snapshot_read(spark, src, versions[0]).selectExpr("*", "'insert' AS _change_type"),
        ["k"],
        batch_id="v1",
    )
    for a, b in zip(versions, versions[1:]):
        feed = snapshot_changes(spark, src, ["k"], a, b)
        snapshot_apply_changes(spark, rep, feed, ["k"], batch_id=f"v{b}")
    got = {(r["k"], r["v"]) for r in snapshot_read(spark, rep).collect()}
    want = {(r["k"], r["v"]) for r in snapshot_read(spark, src).collect()}
    assert got == want and (50, "new") in got and not any(k == 3 for k, _ in got)

    # replayed batch: same batch_id → same head version, same rows
    head_before = head_version(spark, rep)
    snapshot_apply_changes(
        spark,
        rep,
        spark.createDataFrame([(99, "dup", "insert")], "k int, v string, _change_type string"),
        ["k"],
        batch_id=f"v{versions[-1]}",
    )
    assert head_version(spark, rep) == head_before
    assert {(r["k"], r["v"]) for r in snapshot_read(spark, rep).collect()} == want

    # a key both deleted and upserted in one batch is ambiguous
    bad = spark.createDataFrame(
        [(2, "x", "update_postimage"), (2, None, "delete")],
        "k int, v string, _change_type string",
    )
    with pytest.raises(ValueError, match="deleted and upserted"):
        snapshot_apply_changes(spark, rep, bad, ["k"])


def test_bloom_file_skipping_point_lookups(spark, tmp_path):
    """Bloom-filter skipping (etl/bloom.py): the table is hash-
    distributed on k (UNCLUSTERED — every file's [min, max] spans the
    whole key range, so min/max stats prune nothing), yet an equality
    scan touches ~1 file because each file's committed Bloom filter
    rules the key out everywhere else. Results equal unpruned+filter
    for EVERY key (no false negatives, by construction); blooms
    survive append (inherited table property) and upsert (carried for
    untouched files, rebuilt for rewritten ones)."""
    from reactionetl_etl_spark.etl.snapshots import (
        _manifest,
        head_version,
        snapshot_read,
        snapshot_scan,
        snapshot_scan_file_counts,
        snapshot_upsert,
        snapshot_write,
    )

    t = str(tmp_path / "tb")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(2000)], "k int, v string")
    # hash distribution: min/max useless, bloom is the only prune
    snapshot_write(spark, t, df.repartition(8, "k"), stats_cols=["k"], bloom_cols=["k"])

    man = _manifest(spark, t, head_version(spark, t))
    assert man["bloom_cols"] == ["k"]
    assert len(man["blooms"]) == 8  # every file carries a filter

    scanned, total = snapshot_scan_file_counts(spark, t, [("k", "=", 777)])
    assert total == 8
    assert scanned <= 2, f"bloom should prune to ~1 file, read {scanned}"
    assert {r["v"] for r in snapshot_scan(spark, t, [("k", "=", 777)]).collect()} == {"v777"}

    # no false negatives across a key sample
    for key in (0, 1, 511, 1024, 1999):
        got = snapshot_scan(spark, t, [("k", "=", key)]).collect()
        assert len(got) == 1 and got[0]["v"] == f"v{key}"
    # absent key: usually zero files read (fpp may rarely admit one)
    scanned, _ = snapshot_scan_file_counts(spark, t, [("k", "=", 999_999)])
    assert scanned <= 1
    assert snapshot_scan(spark, t, [("k", "=", 999_999)]).count() == 0

    # append inherits bloom_cols; new files get filters too
    extra = spark.createDataFrame([(5000 + i, f"x{i}") for i in range(100)], "k int, v string")
    snapshot_write(spark, t, extra.repartition(2, "k"), mode="append")
    man2 = _manifest(spark, t, head_version(spark, t))
    assert len(man2["blooms"]) == 10
    assert {r["v"] for r in snapshot_scan(spark, t, [("k", "=", 5001)]).collect()} == {"x1"}

    # upsert: untouched files keep blooms, rewritten files rebuild them
    snapshot_upsert(spark, t, spark.createDataFrame([(777, "NEW")], "k int, v string"), ["k"])
    man3 = _manifest(spark, t, head_version(spark, t))
    assert set(man3["blooms"]) == set(man3["files"])
    assert {r["v"] for r in snapshot_scan(spark, t, [("k", "=", 777)]).collect()} == {"NEW"}
    assert snapshot_read(spark, t).count() == 2100


def test_bloom_primitives_fpp_and_membership():
    """etl/bloom.py unit contract: every inserted hash is a member (no
    false negatives, the correctness-critical half) and the measured
    false-positive rate stays near the design point."""
    import numpy as np

    from reactionetl_etl_spark.etl.bloom import (
        bloom_may_contain,
        bloom_params,
        build_bloom,
    )

    rng = np.random.default_rng(4)
    inserted = rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64)
    m, k = bloom_params(len(inserted), fpp=0.01)
    bits = build_bloom(inserted, m, k)
    assert all(bloom_may_contain(bits, m, k, int(h)) for h in inserted[:500])
    probes = rng.integers(-(2**63), 2**63 - 1, size=4000, dtype=np.int64)
    fresh = np.setdiff1d(probes, inserted)
    fp = sum(bloom_may_contain(bits, m, k, int(h)) for h in fresh) / len(fresh)
    assert fp < 0.03, f"false-positive rate {fp:.4f} far above the 1% design point"


def test_concurrent_commit_loses_cleanly(spark, tmp_path, monkeypatch):
    """Optimistic concurrency: a writer whose head read went stale (a
    rival fully committed the version it targets, simulated by pinning
    head_version to the stale value) raises ConcurrentSnapshotWrite
    instead of silently clobbering the winner's manifest; an
    UNCOMMITTED occupant (crashed writer, no marker) is still
    superseded per the crash-recovery contract; and the normal retry
    (fresh head read) succeeds."""
    import json as _json
    import os

    import pytest

    import reactionetl_etl_spark.etl.snapshots as S

    t = str(tmp_path / "cc")
    S.snapshot_write(spark, t, spark.createDataFrame([(1, "a")], "k int, v string"))

    # rival commits v2 FULLY (manifest + marker)
    racer = {"version": 2, "mode": "append", "files": [], "schema":
             spark.createDataFrame([(1, "a")], "k int, v string").schema.jsonValue()}
    with open(os.path.join(t, "_snapshots", "v2.json"), "w") as fh:
        fh.write(_json.dumps(racer))
    open(os.path.join(t, "_snapshots", "v2.committed"), "w").close()

    # our writer's head read is stale at 1 → it targets the taken v2
    real_head = S.head_version
    monkeypatch.setattr(S, "head_version", lambda sp, p: 1)
    with pytest.raises(S.ConcurrentSnapshotWrite, match="another"):
        S.snapshot_write(
            spark, t, spark.createDataFrame([(2, "b")], "k int, v string"), mode="append"
        )
    # the winner's manifest body was not clobbered
    with open(os.path.join(t, "_snapshots", "v2.json")) as fh:
        assert _json.load(fh)["files"] == []
    monkeypatch.setattr(S, "head_version", real_head)

    # an UNCOMMITTED occupant is a crash orphan: superseded, not fatal
    with open(os.path.join(t, "_snapshots", "v3.json"), "w") as fh:
        fh.write('{"version": 3, "mode": "append", "files": ["data/nope.parquet"]}')
    v = S.snapshot_write(
        spark, t, spark.createDataFrame([(2, "b")], "k int, v string"), mode="append"
    )
    assert v == 3 and S.head_version(spark, t) == 3
    # racer's v2 had no files; the append carried none forward + ours
    assert S.snapshot_read(spark, t).count() == 1
