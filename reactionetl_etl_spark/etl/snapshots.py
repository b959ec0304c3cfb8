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

from pyspark.sql import DataFrame, SparkSession

from reactionetl_etl_spark.etl.commit import _fs


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
    spark: SparkSession, table_path: str, df: DataFrame, mode: str = "overwrite"
) -> int:
    """Commit ``df`` as a new snapshot; returns the new version.

    ``mode='append'`` carries the previous snapshot's files forward;
    ``'overwrite'`` references only the new files (old files stay on
    disk — still served to readers holding older versions — until
    `snapshot_vacuum`). The commit point is the marker creation: before
    it, nothing changed for any reader; after it, every new reader
    resolves the complete new snapshot.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    new_files = _commit_files(spark, table_path, df)
    files = list(new_files)
    prev = head_version(spark, table_path)
    if mode == "append" and prev is not None:
        files = _manifest(spark, table_path, prev)["files"] + files
    return _commit_manifest(spark, table_path, files, mode, df.schema.jsonValue())


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
    if not man["files"]:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(man["schema"]))
    return spark.read.parquet(*[f"{table_path}/{f}" for f in man["files"]])


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
) -> list[str]:
    """Write ``df`` as new immutable data files (stage → move); returns
    their manifest-relative paths. No snapshot is created here."""
    fs, Path = _fs(spark, table_path)
    token = uuid.uuid4().hex
    stage = f"{table_path}/data/_stage-{token}"
    writer = df.write.mode("error")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(stage)
    new_files = []
    for i, st in enumerate(
        s for s in fs.listStatus(Path(stage)) if s.getPath().getName().endswith(".parquet")
    ):
        dst = f"{table_path}/data/{token}-{i:05d}.parquet"
        fs.rename(st.getPath(), Path(dst))
        new_files.append(f"data/{token}-{i:05d}.parquet")
    fs.delete(Path(stage), True)
    return new_files


def _commit_manifest(
    spark: SparkSession, table_path: str, files: list[str], mode: str, schema_json: dict
) -> int:
    fs, Path = _fs(spark, table_path)
    prev = head_version(spark, table_path)
    version = 1 if prev is None else prev + 1
    out = fs.create(Path(f"{table_path}/_snapshots/v{version}.json"), True)
    out.write(
        bytearray(
            json.dumps(
                {"version": version, "mode": mode, "files": sorted(files), "schema": schema_json}
            ).encode("utf-8")
        )
    )
    out.close()
    fs.create(Path(f"{table_path}/_snapshots/v{version}.committed"), True).close()
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
    new_files = _commit_files(spark, table_path, rewritten)
    return _commit_manifest(
        spark, table_path, untouched + new_files, "upsert", man["schema"]
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
    if touched:
        kept = (
            spark.read.parquet(*[f"{table_path}/{f}" for f in touched])
            .filter(f"NOT ({predicate})")
            .localCheckpoint(eager=True)
        )
        if kept.count() > 0:
            files += _commit_files(spark, table_path, kept)
    return _commit_manifest(spark, table_path, files, "delete", man["schema"])


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
    new_files = _commit_files(spark, table_path, df, max_records_per_file)
    return _commit_manifest(spark, table_path, new_files, "compact", man["schema"])
