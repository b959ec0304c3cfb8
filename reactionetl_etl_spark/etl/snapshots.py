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
    fs, Path = _fs(spark, table_path)
    token = uuid.uuid4().hex
    stage = f"{table_path}/data/_stage-{token}"
    df.write.mode("error").parquet(stage)
    # move the part files out of staging under unique immutable names;
    # files in data/ are only ever OBSERVED through a manifest, so the
    # moves need no ordering guarantees
    new_files = []
    for i, st in enumerate(
        s for s in fs.listStatus(Path(stage)) if s.getPath().getName().endswith(".parquet")
    ):
        dst = f"{table_path}/data/{token}-{i:05d}.parquet"
        fs.rename(st.getPath(), Path(dst))
        new_files.append(f"data/{token}-{i:05d}.parquet")
    fs.delete(Path(stage), True)

    prev = head_version(spark, table_path)
    files = list(new_files)
    if mode == "append" and prev is not None:
        files = _manifest(spark, table_path, prev)["files"] + files
    version = 1 if prev is None else prev + 1
    manifest_path = f"{table_path}/_snapshots/v{version}.json"
    out = fs.create(Path(manifest_path), True)
    out.write(
        bytearray(
            json.dumps(
                {
                    "version": version,
                    "mode": mode,
                    "files": sorted(files),
                    # keeps empty snapshots (a legitimate truncate) readable
                    "schema": df.schema.jsonValue(),
                }
            ).encode("utf-8")
        )
    )
    out.close()
    # THE commit point: one atomic create — no overwrite, no delete, no
    # window where the head is missing or partial
    fs.create(Path(f"{table_path}/_snapshots/v{version}.committed"), True).close()
    return version


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
