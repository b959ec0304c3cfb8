"""Snapshot-isolated tables on plain parquet: a minimal manifest-based
table format (the Iceberg/Delta core idea, public and simple).

Why: the staged partition swap (`etl/commit.py`) makes WRITES
all-or-nothing, but a reader that lists the directory DURING a swap
can still observe a partition mid-replacement. The fix every modern
table format uses is indirection: readers never list data directories
— they read a MANIFEST naming the exact data files of one snapshot.
Data files are immutable; a commit writes new files + a new manifest
and then creates a zero-byte ``.committed`` marker — a single atomic
file creation, never an overwrite or delete, so there is no instant at
which the table is partial or headless. Concurrent readers keep
whatever snapshot they resolved — full snapshot isolation and free
time travel — and a crash at ANY point leaves only invisible garbage
(staged data, an unmarked manifest), collected by vacuum.

Layout:
    <table>/data/<token>-<i>.parquet       immutable data files
    <table>/_snapshots/v<N>.json           {"version", "files", "mode"}
    <table>/_snapshots/v<N>.committed      commit marker (the commit point)

Head resolution lists ``_snapshots/`` (a tiny directory: one file pair
per commit) and takes the highest marked version.

Scale posture: the manifest lists file PATHS (thousands of entries for
a 100 TB table at healthy file sizes — a driver-trivial JSON); reads
hand Spark the explicit file list, so planning skips data-directory
listing entirely (the object-store LIST call this avoids is a known
large-table bottleneck). Single-writer for commits, like every
rename-based layout; object stores without atomic create-if-absent use
their conditional-put primitive — the same documented boundary as
etl/commit.py.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.commit import _fs


class ConcurrentSnapshotWrite(RuntimeError):
    """Another writer committed the version this commit targeted.
    Nothing corrupted: the data files staged by the loser are orphaned
    (vacuum collects them); re-read the head and retry the operation."""


def _read_small(fs, Path, spark: SparkSession, path: str) -> str | None:
    p = Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()


def _snapshot_entries(fs, Path, table_path: str) -> dict[int, set[str]]:
    """{version: {"json", "committed"}} from one listing of _snapshots/."""
    root = Path(f"{table_path}/_snapshots")
    if not fs.exists(root):
        return {}
    out: dict[int, set[str]] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.setdefault(int(name[1:-5]), set()).add("json")
        elif name.startswith("v") and name.endswith(".committed"):
            out.setdefault(int(name[1:-10]), set()).add("committed")
    return out


def head_version(spark: SparkSession, table_path: str) -> int | None:
    """Current snapshot version (highest COMMITTED), or None if empty."""
    fs, Path = _fs(spark, table_path)
    marked = [
        v for v, kinds in _snapshot_entries(fs, Path, table_path).items()
        if kinds >= {"json", "committed"}
    ]
    return max(marked) if marked else None


def _manifest(spark: SparkSession, table_path: str, version: int) -> dict:
    fs, Path = _fs(spark, table_path)
    raw = _read_small(fs, Path, spark, f"{table_path}/_snapshots/v{version}.json")
    if raw is None:
        raise ValueError(f"snapshot v{version} does not exist at {table_path}")
    return json.loads(raw)


def snapshot_write(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    batch_id: str | None = None,
) -> int:
    """Commit ``df`` as a new snapshot; returns the new version.

    ``stats_cols`` (a table property — appends inherit it) records
    per-file [min, max] footer statistics in the manifest, enabling
    `snapshot_scan`'s file skipping. ``bloom_cols`` (same table-property
    semantics) additionally commits a per-(file, column) Bloom filter
    (`etl/bloom.py`) so EQUALITY predicates on high-cardinality,
    UNCLUSTERED keys prune too — min/max ranges on such keys span
    everything and prune nothing.
    ``mode='append'`` carries the previous snapshot's files forward;
    ``'overwrite'`` references only the new files (old files stay on
    disk — still served to readers holding older versions — until
    `snapshot_vacuum`). The commit point is the marker creation: before
    it, nothing changed for any reader; after it, every new reader
    resolves the complete new snapshot.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    prev = head_version(spark, table_path)
    prev_man = _manifest(spark, table_path, prev) if prev is not None else {}
    if batch_id is not None and snapshot_batch_applied(spark, table_path, batch_id):
        return prev
    schema_json = df.schema.jsonValue()
    if mode == "append" and prev is not None:
        # add-column schema evolution: common columns must keep their
        # type; the committed schema is the UNION (old order first), and
        # reads apply it explicitly, so pre-evolution files surface the
        # new columns as NULL
        schema_json = _evolve_schema(prev_man["schema"], schema_json)
    # stats/bloom columns are TABLE properties: appends inherit them
    cols = stats_cols if stats_cols is not None else prev_man.get("stats_cols")
    bcols = bloom_cols if bloom_cols is not None else prev_man.get("bloom_cols")
    new_files, stats = _commit_files(spark, table_path, df, stats_cols=cols)
    blooms = _gather_file_blooms(spark, table_path, new_files, bcols)
    files = list(new_files)
    if mode == "append" and prev is not None:
        files = prev_man["files"] + files
        stats = {**prev_man.get("stats", {}), **stats}
        blooms = {**prev_man.get("blooms", {}), **blooms}
    return _commit_manifest(
        spark, table_path, files, mode, schema_json, stats, cols, batch_id,
        blooms=blooms, bloom_cols=bcols,
    )


def snapshot_read(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: current head). Reads the
    manifest's explicit file list — no data-directory listing, no
    chance of observing another writer's in-flight files."""
    v = version if version is not None else head_version(spark, table_path)
    if v is None:
        raise ValueError(f"no committed snapshot at {table_path}")
    man = _manifest(spark, table_path, v)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(man["schema"])
    if not man["files"]:
        return spark.createDataFrame([], schema)
    # explicit committed schema: pre-evolution files surface later-added
    # columns as NULL, and the read never depends on which footer Spark
    # happens to sample
    return spark.read.schema(schema).parquet(*[f"{table_path}/{f}" for f in man["files"]])


def snapshot_changes(
    spark: SparkSession,
    table_path: str,
    key_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed between two committed versions: one row per
    logical change with ``_change_type`` ∈ insert | delete |
    update_preimage | update_postimage (Delta-CDF semantics), derived
    from the manifests alone — the format never stores a change log.

    The scan cost is ∝ CHURNED files, never table size: snapshot files
    are immutable, so a file present in both manifests cannot contain
    a change, and the diff reads only files REMOVED since
    ``from_version`` (old images) and ADDED (new images). An
    append-only commit therefore costs one scan of the appended files
    and no join at all; a pure compaction reads the rewritten files
    and nets to zero rows (carried rows reconcile as unchanged).

    Requires ``key_cols`` to be non-null and unique per version (what
    `snapshot_upsert` maintains). Rows whose key appears on both sides
    with every other column null-safe-equal are compaction carries and
    are dropped."""
    import functools

    from pyspark.sql.types import StructType

    v_to = to_version if to_version is not None else head_version(spark, table_path)
    if v_to is None:
        raise ValueError(f"no committed snapshot at {table_path}")
    man_a = _manifest(spark, table_path, from_version)
    man_b = _manifest(spark, table_path, v_to)
    files_a, files_b = set(man_a["files"]), set(man_b["files"])
    removed = [f for f in man_a["files"] if f not in files_b]
    added = [f for f in man_b["files"] if f not in files_a]
    schema_b = StructType.fromJson(man_b["schema"])

    def _read(files: list[str], schema_json: dict) -> DataFrame:
        schema = StructType.fromJson(schema_json)
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*[f"{table_path}/{f}" for f in files])

    new = _read(added, man_b["schema"])
    out_cols = [f.name for f in schema_b.fields]
    if not removed:
        # append-only commit: every new-file row is an insert, no join
        return new.select(*out_cols, F.lit("insert").alias("_change_type"))
    old = _read(removed, man_a["schema"])
    # add-only schema evolution: surface later-added columns as NULL on
    # the old side so both images share the to-version schema
    for fld in schema_b.fields:
        if fld.name not in old.columns:
            old = old.withColumn(fld.name, F.lit(None).cast(fld.dataType))
    old = old.select(*out_cols)

    o = old.withColumn("__old", F.lit(True)).alias("o")
    n = new.withColumn("__new", F.lit(True)).alias("n")
    on = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols],
    )
    j = o.join(n, on, "full_outer")
    non_key = [c for c in out_cols if c not in key_cols]
    unchanged = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in non_key],
        F.lit(True),
    )
    # ONE pass: each joined row explodes into its change structs
    # (insert | delete | pre+post | none for compaction carries). A
    # 4-branch filter+union would re-evaluate the uncached join — and
    # the churned-file scans under it — up to four times (ADVICE r6).
    def _img(side: str, change_type: str) -> Column:
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in out_cols],
            F.lit(change_type).alias("_change_type"),
        )

    # typed empty array (compaction carries): same struct shape, 0 rows
    empty = F.slice(F.array(_img("o", "x")), 1, 0)
    changes = (
        F.when(F.col("o.__old").isNull(), F.array(_img("n", "insert")))
        .when(F.col("n.__new").isNull(), F.array(_img("o", "delete")))
        .when(
            ~unchanged,
            F.array(_img("o", "update_preimage"), _img("n", "update_postimage")),
        )
        .otherwise(empty)
    )
    return j.select(F.explode(changes).alias("__c")).select("__c.*")


def snapshot_versions(spark: SparkSession, table_path: str) -> list[int]:
    """All committed versions (time-travel targets), ascending."""
    fs, Path = _fs(spark, table_path)
    return sorted(
        v for v, kinds in _snapshot_entries(fs, Path, table_path).items()
        if kinds >= {"json", "committed"}
    )


def snapshot_vacuum(
    spark: SparkSession, table_path: str, keep_last: int = 1
) -> list[str]:
    """Garbage-collect: delete data files referenced ONLY by snapshots
    older than the newest ``keep_last``, plus staging debris and
    uncommitted (crashed) manifests. Returns deleted paths. Readers of
    kept versions are unaffected; time travel shrinks to the kept
    window."""
    fs, Path = _fs(spark, table_path)
    versions = snapshot_versions(spark, table_path)
    if not versions:
        return []
    keep = set(versions[-max(1, keep_last):])
    live: set[str] = set()
    for v in keep:
        live.update(_manifest(spark, table_path, v)["files"])
    deleted: list[str] = []
    for st in fs.listStatus(Path(f"{table_path}/data")):
        name = st.getPath().getName()
        rel = f"data/{name}"
        if name.startswith("_stage-") or (name.endswith(".parquet") and rel not in live):
            fs.delete(st.getPath(), True)
            deleted.append(rel)
    for v, kinds in _snapshot_entries(fs, Path, table_path).items():
        if v in keep:
            continue
        for suffix in (".json", ".committed"):
            p = Path(f"{table_path}/_snapshots/v{v}{suffix}")
            if fs.exists(p):
                fs.delete(p, False)
                deleted.append(f"_snapshots/v{v}{suffix}")
    return sorted(deleted)


def _commit_files(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    max_records_per_file: int | None = None,
    stats_cols: list[str] | None = None,
) -> tuple[list[str], dict]:
    """Write ``df`` as new immutable data files (stage → move); returns
    (manifest-relative paths, per-file min/max stats for ``stats_cols``).
    No snapshot is created here. Stats gathering is best-effort
    (missing footer stats, exotic types, or a non-pyarrow-readable URI
    → no entry → pruning stays conservative for that file)."""
    fs, Path = _fs(spark, table_path)
    token = uuid.uuid4().hex
    stage = f"{table_path}/data/_stage-{token}"
    writer = df.write.mode("error")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(stage)
    new_files = []
    stats: dict = {}
    for i, st in enumerate(
        s for s in fs.listStatus(Path(stage)) if s.getPath().getName().endswith(".parquet")
    ):
        rel = f"data/{token}-{i:05d}.parquet"
        dst = f"{table_path}/{rel}"
        fs.rename(st.getPath(), Path(dst))
        new_files.append(rel)
        if stats_cols:
            try:
                s = _gather_file_stats(dst.removeprefix("file:"), stats_cols)
            except Exception:
                s = {}
            if s:
                stats[rel] = s
    fs.delete(Path(stage), True)
    return new_files, stats


def _gather_file_blooms(
    spark: SparkSession,
    table_path: str,
    rel_files: list[str],
    bloom_cols: list[str] | None,
) -> dict:
    """{rel_file: {col: bloom entry}} for the NEW files of a commit.

    One distributed read-back pass: every row hashes its bloom columns
    with Spark's own `xxhash64` (executor-side), an `applyInPandas`
    keyed on the source file builds each file's bitset with vectorized
    numpy, and only the finished ~KB filters collect for the manifest.
    Files whose row count would blow the `MAX_BITS` cap simply carry no
    filter for that column (pruning stays conservative)."""
    if not rel_files or not bloom_cols:
        return {}
    import pandas as pd

    from pyspark.sql import functions as F

    from reactionetl_etl_spark.etl.bloom import (
        MAX_BITS,
        bloom_params,
        build_bloom,
        encode_bloom,
    )

    paths = [f"{table_path}/{f}" for f in rel_files]
    df = spark.read.parquet(*paths)
    cols = [c for c in bloom_cols if c in df.columns]
    if not cols:
        return {}
    hashed = df.select(
        F.input_file_name().alias("__f"),
        *[F.xxhash64(F.col(c)).alias(f"__h{i}") for i, c in enumerate(cols)],
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        f = pdf["__f"].iloc[0]
        n = len(pdf)
        m, k = bloom_params(n)
        for i, c in enumerate(cols):
            if m > MAX_BITS:
                continue
            e = encode_bloom(m, k, build_bloom(pdf[f"__h{i}"].to_numpy(), m, k))
            rows.append((f, c, e["m"], e["k"], e["bits"]))
        return pd.DataFrame(rows, columns=["f", "col", "m", "k", "bits"])

    got = hashed.groupBy("__f").applyInPandas(
        build, "f string, col string, m long, k long, bits string"
    ).collect()
    # absolute URI → manifest-relative path
    rel_of = {}
    for rel in rel_files:
        tail = "/" + rel
        rel_of[tail] = rel
    out: dict = {}
    for r in got:
        rel = next((v for t, v in rel_of.items() if r["f"].endswith(t)), None)
        if rel is None:
            continue
        out.setdefault(rel, {})[r["col"]] = {"m": r["m"], "k": r["k"], "bits": r["bits"]}
    return out


def _evolve_schema(old_json: dict, new_json: dict) -> dict:
    """Union of two schemas for add-column evolution. Same-named fields
    must keep their exact type (no implicit widening — a type change is
    a rewrite, not an append); brand-new fields attach at the end."""
    old_fields = {f["name"]: f for f in old_json["fields"]}
    merged = list(old_json["fields"])
    for f in new_json["fields"]:
        have = old_fields.get(f["name"])
        if have is None:
            merged.append(f)
        elif have["type"] != f["type"]:
            raise ValueError(
                f"schema evolution cannot change column {f['name']!r} from "
                f"{have['type']} to {f['type']} (rewrite the table instead)"
            )
    return {**old_json, "fields": merged}


def snapshot_batch_applied(spark: SparkSession, table_path: str, batch_id: str) -> bool:
    """True iff some COMMITTED snapshot carries ``batch_id`` — the
    exactly-once check for at-least-once writers (foreachBatch): the
    batch fact lives inside the manifest, so it exists iff the data
    committed. O(#snapshots) tiny-file reads; vacuum keeps that small."""
    for v in snapshot_versions(spark, table_path):
        if _manifest(spark, table_path, v).get("batch_id") == batch_id:
            return True
    return False


def _commit_manifest(
    spark: SparkSession,
    table_path: str,
    files: list[str],
    mode: str,
    schema_json: dict,
    stats: dict | None = None,
    stats_cols: list[str] | None = None,
    batch_id: str | None = None,
    blooms: dict | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    fs, Path = _fs(spark, table_path)
    prev = head_version(spark, table_path)
    version = 1 if prev is None else prev + 1
    manifest = {"version": version, "mode": mode, "files": sorted(files), "schema": schema_json}
    if batch_id is not None:
        manifest["batch_id"] = batch_id
    if stats_cols:
        manifest["stats_cols"] = sorted(stats_cols)
        manifest["stats"] = {f: stats.get(f, {}) for f in files if stats and stats.get(f)}
    if bloom_cols:
        manifest["bloom_cols"] = sorted(bloom_cols)
        manifest["blooms"] = {f: blooms.get(f, {}) for f in files if blooms and blooms.get(f)}
    # CREATE-EXCLUSIVE manifest write (optimistic concurrency): two
    # writers that both read head v race to commit v+1 — an
    # overwrite=True create would let the second silently CLOBBER the
    # first's manifest while both writers report success (a lost
    # update). With overwrite=False the filesystem arbitrates. On
    # losing the slot there are two cases, told apart by the marker:
    # - v{n}.committed EXISTS → a rival genuinely COMMITTED this
    #   version: raise ConcurrentSnapshotWrite (re-read the head,
    #   redo the work against the winner's files, retry).
    # - no marker → the occupant is a CRASHED writer's orphan (the
    #   documented supersede-the-orphan recovery case): delete it and
    #   take the slot; if the exclusive create loses AGAIN a live
    #   racer just appeared — raise. A live writer between its two
    #   creates is indistinguishable from a crash for that instant;
    #   the winner of the marker race owns the version (the same
    #   best-effort window every rename-based table format accepts
    #   off compare-and-swap object stores).
    json_path = Path(f"{table_path}/_snapshots/v{version}.json")
    marker_path = Path(f"{table_path}/_snapshots/v{version}.committed")
    out = None
    for attempt in (1, 2):
        try:
            out = fs.create(json_path, False)
            break
        except Exception as e:  # noqa: BLE001 — py4j wraps FileAlreadyExists
            if fs.exists(marker_path) or attempt == 2:
                raise ConcurrentSnapshotWrite(
                    f"version v{version} at {table_path} was committed by "
                    "another writer after this commit started — re-read the "
                    "head and retry"
                ) from e
            fs.delete(json_path, False)  # uncommitted orphan: supersede
    out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    out.close()
    fs.create(marker_path, True).close()
    return version


def snapshot_upsert(
    spark: SparkSession, table_path: str, updates: DataFrame, key_cols: list[str]
) -> int:
    """Copy-on-write MERGE: rows in ``updates`` replace same-key rows,
    new keys insert — by rewriting ONLY the data files that contain a
    matched key (the Delta/Iceberg CoW strategy). Files without any
    touched key carry into the new snapshot untouched (same bytes, same
    path), so merge work is ∝ touched files + updates, never ∝ table —
    and the whole merge is one atomic snapshot commit with time travel
    back to the pre-merge version for free.

    ``updates`` must carry the full table schema and be unique on
    ``key_cols`` (raises otherwise — double-keyed updates make the
    replacement order undefined)."""
    from pyspark.sql import functions as F

    head = head_version(spark, table_path)
    if head is None:
        return snapshot_write(spark, table_path, updates, mode="overwrite")
    n_dup = updates.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
    if n_dup:
        raise ValueError(f"updates carry {n_dup} duplicated keys on {key_cols}")

    man = _manifest(spark, table_path, head)
    all_files = man["files"]
    current = spark.read.parquet(*[f"{table_path}/{f}" for f in all_files])
    keys = updates.select(*key_cols)
    # which files hold a matched key? metadata-sized collect (≤ #files)
    touched_names = {
        r[0].rsplit("/", 1)[-1]
        for r in current.withColumn("__f", F.input_file_name())
        .join(F.broadcast(keys), on=key_cols, how="leftsemi")
        .select("__f")
        .distinct()
        .collect()
    }
    touched = [f for f in all_files if f.rsplit("/", 1)[-1] in touched_names]
    untouched = [f for f in all_files if f.rsplit("/", 1)[-1] not in touched_names]

    if touched:
        kept = (
            spark.read.parquet(*[f"{table_path}/{f}" for f in touched])
            .join(keys, on=key_cols, how="left_anti")
        )
        rewritten = kept.unionByName(updates.select(*kept.columns))
    else:  # pure insert
        rewritten = updates
    # evaluate before committing: the rewrite must not lazily read
    # files the new manifest supersedes at some later collect time
    rewritten = rewritten.localCheckpoint(eager=True)
    cols = man.get("stats_cols")
    bcols = man.get("bloom_cols")
    new_files, stats = _commit_files(spark, table_path, rewritten, stats_cols=cols)
    stats = {**{f: s for f, s in man.get("stats", {}).items() if f in set(untouched)}, **stats}
    # untouched files keep their committed blooms; rewritten files rebuild
    blooms = {
        **{f: b for f, b in man.get("blooms", {}).items() if f in set(untouched)},
        **_gather_file_blooms(spark, table_path, new_files, bcols),
    }
    return _commit_manifest(
        spark, table_path, untouched + new_files, "upsert", man["schema"], stats, cols,
        blooms=blooms, bloom_cols=bcols,
    )


def snapshot_apply_changes(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    key_cols: list[str],
    batch_id: str | None = None,
    change_type_col: str = "_change_type",
) -> int:
    """Apply one CDC batch (the `snapshot_changes` shape — or any
    feed carrying ``_change_type``) as ONE atomic commit: `insert` /
    `update_postimage` rows upsert, `delete` rows remove their keys,
    `update_preimage` rows are ignored (they describe the replaced
    state). This closes the CDC loop: a downstream replica stays in
    sync by folding the upstream table's feed, version by version.

    One key must resolve to one action per batch — a key that is both
    deleted and upserted raises (the producer owns within-batch
    ordering; collapse to the net action before applying). Exactly-once
    under at-least-once delivery via ``batch_id`` (the commit carries
    the batch fact; replays no-op), the same discipline as
    `snapshot_write(batch_id=…)`.

    Scale: identical to `snapshot_upsert` — files holding any touched
    key rewrite, everything else carries forward by path, so work is
    ∝ touched files + batch size, never ∝ table."""
    head = head_version(spark, table_path)
    if batch_id is not None and snapshot_batch_applied(spark, table_path, batch_id):
        return head
    ups = changes.filter(
        F.col(change_type_col).isin("insert", "update_postimage")
    ).drop(change_type_col)
    del_keys = (
        changes.filter(F.col(change_type_col) == "delete")
        .select(*key_cols)
        .distinct()
    )
    n_dup = ups.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
    if n_dup:
        raise ValueError(f"change batch upserts {n_dup} duplicated keys on {key_cols}")
    n_both = ups.join(del_keys, on=key_cols, how="left_semi").count()
    if n_both:
        raise ValueError(
            f"{n_both} keys are both deleted and upserted in one batch — "
            "collapse to the net action before applying"
        )
    if head is None:
        if del_keys.limit(1).count():
            raise ValueError(f"cannot apply deletes: no committed snapshot at {table_path}")
        return snapshot_write(spark, table_path, ups, mode="overwrite", batch_id=batch_id)

    man = _manifest(spark, table_path, head)
    all_files = man["files"]
    current = spark.read.parquet(*[f"{table_path}/{f}" for f in all_files])
    touched_keys = ups.select(*key_cols).unionByName(del_keys).distinct()
    touched_names = {
        r[0].rsplit("/", 1)[-1]
        for r in current.withColumn("__f", F.input_file_name())
        .join(F.broadcast(touched_keys), on=key_cols, how="leftsemi")
        .select("__f")
        .distinct()
        .collect()
    }
    touched = [f for f in all_files if f.rsplit("/", 1)[-1] in touched_names]
    untouched = [f for f in all_files if f.rsplit("/", 1)[-1] not in touched_names]
    if touched:
        kept = spark.read.parquet(*[f"{table_path}/{f}" for f in touched]).join(
            touched_keys, on=key_cols, how="left_anti"
        )
        rewritten = kept.unionByName(ups.select(*kept.columns))
    else:
        rewritten = ups
    rewritten = rewritten.localCheckpoint(eager=True)
    cols = man.get("stats_cols")
    files = list(untouched)
    stats = {f: s for f, s in man.get("stats", {}).items() if f in set(untouched)}
    if rewritten.count() > 0:
        new_files, new_stats = _commit_files(spark, table_path, rewritten, stats_cols=cols)
        files += new_files
        stats.update(new_stats)
    return _commit_manifest(
        spark, table_path, files, "apply_changes", man["schema"], stats, cols, batch_id
    )


def snapshot_delete(spark: SparkSession, table_path: str, predicate: str) -> int:
    """Copy-on-write DELETE WHERE ``predicate``: files containing no
    matching row carry forward untouched; matching files are rewritten
    without the matching rows. One atomic snapshot commit."""
    from pyspark.sql import functions as F

    head = head_version(spark, table_path)
    if head is None:
        raise ValueError(f"no committed snapshot at {table_path}")
    man = _manifest(spark, table_path, head)
    all_files = man["files"]
    current = spark.read.parquet(*[f"{table_path}/{f}" for f in all_files])
    touched_names = {
        r[0].rsplit("/", 1)[-1]
        for r in current.filter(predicate)
        .select(F.input_file_name().alias("__f"))
        .distinct()
        .collect()
    }
    touched = [f for f in all_files if f.rsplit("/", 1)[-1] in touched_names]
    untouched = [f for f in all_files if f.rsplit("/", 1)[-1] not in touched_names]
    files = list(untouched)
    cols = man.get("stats_cols")
    stats = {f: s for f, s in man.get("stats", {}).items() if f in set(untouched)}
    if touched:
        kept = (
            spark.read.parquet(*[f"{table_path}/{f}" for f in touched])
            .filter(f"NOT ({predicate})")
            .localCheckpoint(eager=True)
        )
        if kept.count() > 0:
            new_files, new_stats = _commit_files(spark, table_path, kept, stats_cols=cols)
            files += new_files
            stats.update(new_stats)
    return _commit_manifest(spark, table_path, files, "delete", man["schema"], stats, cols)


def snapshot_compact(
    spark: SparkSession,
    table_path: str,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
) -> int:
    """Compaction as a snapshot: rewrite the head's data into fewer,
    healthier files and commit the SAME rows as a new version. The
    small-files problem is the dominant operational failure of
    accumulate-forever tables (every append adds task-count files;
    scans eventually pay per-file open cost that dwarfs the bytes);
    because compaction here is just another snapshot, it is atomic,
    non-blocking for readers (they keep their version), and fully
    reversible until vacuum."""
    head = head_version(spark, table_path)
    if head is None:
        raise ValueError(f"no committed snapshot at {table_path}")
    man = _manifest(spark, table_path, head)
    df = snapshot_read(spark, table_path, head)
    if target_files is not None:
        df = df.repartition(max(1, target_files))
    cols = man.get("stats_cols")
    new_files, stats = _commit_files(
        spark, table_path, df, max_records_per_file, stats_cols=cols
    )
    return _commit_manifest(
        spark, table_path, new_files, "compact", man["schema"], stats, cols
    )


def _gather_file_stats(path: str, stats_cols: list[str]) -> dict:
    """Per-column [min, max] for one parquet file, from its footer row-
    group statistics (no data read). Local-filesystem template — at
    object-store scale the same footers are read by executors during
    the write and collected with the commit message."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for col in stats_cols:
        if col not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None:
            # JSON-safe; bytes stats (rare) are skipped conservatively
            if not isinstance(lo, (int, float, str)) or not isinstance(hi, (int, float, str)):
                continue
            out[col] = [lo, hi]
    return out


def snapshot_scan(
    spark: SparkSession,
    table_path: str,
    predicates: list[tuple[str, str, object]],
    version: int | None = None,
) -> DataFrame:
    """Manifest-level FILE SKIPPING (the Iceberg/Delta data-skipping
    idea): ``predicates`` — [(col, op, value)] with op ∈ {=, <, <=, >,
    >=}, AND-combined — are checked against each file's committed
    [min, max] stats, and files that PROVABLY contain no matching row
    are never handed to Spark at all: no footer read, no task, no
    object-store GET. The same predicates are re-applied to the
    surviving rows, so results equal an unpruned scan + filter (pinned
    by test). Files without stats for a predicate column are kept —
    pruning is always conservative. Pays off exactly when the table is
    clustered on the stats columns (`etl/zorder.py` or a sorted write):
    tight per-file ranges → most files skipped.

    Equality predicates additionally consult per-(file, column) Bloom
    filters when the table committed ``bloom_cols`` — the path that
    prunes point lookups on UNCLUSTERED high-cardinality keys, where
    every file's [min, max] spans the key and range skipping is
    useless. False positives only (≈1%): a file is never wrongly
    dropped, some fpp·files are read for nothing."""
    import functools
    import operator as _op

    v = version if version is not None else head_version(spark, table_path)
    if v is None:
        raise ValueError(f"no committed snapshot at {table_path}")
    man = _manifest(spark, table_path, v)
    stats = man.get("stats", {})
    blooms = man.get("blooms", {})
    ops = {"=": _op.eq, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    for _, op, _value in predicates:
        if op not in ops:
            raise ValueError(f"unsupported op {op!r} (use =, <, <=, >, >=)")

    # Bloom probes: hash each '=' literal with the SAME Spark xxhash64
    # the builder used, cast to the column's committed type so the hash
    # input bytes match the executor-side column hash exactly. One
    # 1-row job per probed literal — manifest-scale driver work.
    probe_hash: dict[tuple[str, object], int] = {}
    if blooms and any(op == "=" for _, op, _ in predicates):
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(man["schema"])
        fields = {fl.name: fl.dataType for fl in schema.fields}
        for col, op, value in predicates:
            if op == "=" and col in fields and (col, value) not in probe_hash:
                probe_hash[(col, value)] = spark.range(1).select(
                    F.xxhash64(F.lit(value).cast(fields[col]))
                ).first()[0]

    def may_match(f: str) -> bool:
        for col, op, value in predicates:
            rng = stats.get(f, {}).get(col)
            if rng is not None:
                lo, hi = rng
                if op == "=" and not (lo <= value <= hi):
                    return False
                if op in ("<", "<=") and not ops[op](lo, value):
                    return False
                if op in (">", ">=") and not ops[op](hi, value):
                    return False
            if op == "=":
                entry = blooms.get(f, {}).get(col)
                if entry is not None:
                    from reactionetl_etl_spark.etl.bloom import (
                        bloom_may_contain,
                        decode_bloom,
                    )

                    m, k, bits = decode_bloom(entry)
                    if not bloom_may_contain(bits, m, k, probe_hash[(col, value)]):
                        return False
        return True

    files = [f for f in man["files"] if may_match(f)]
    from pyspark.sql import functions as F

    cond = functools.reduce(
        lambda a, b: a & b,
        [ops[op](F.col(col), F.lit(value)) for col, op, value in predicates],
    )
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(man["schema"])
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*[f"{table_path}/{f}" for f in files])
        .filter(cond)
    )


def snapshot_scan_file_counts(
    spark: SparkSession,
    table_path: str,
    predicates: list[tuple[str, str, object]],
    version: int | None = None,
) -> tuple[int, int]:
    """(files_scanned, files_total) for a pruned scan — the observable
    the skipping tests and capacity planning read."""
    v = version if version is not None else head_version(spark, table_path)
    man = _manifest(spark, table_path, v)
    pruned = snapshot_scan(spark, table_path, predicates, v)
    # count distinct source files the pruned plan actually references
    if not pruned.inputFiles():
        return 0, len(man["files"])
    return len(pruned.inputFiles()), len(man["files"])
