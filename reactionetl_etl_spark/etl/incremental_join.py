"""Incremental equi-JOIN maintenance: a materialized join kept current
batch-by-batch with the textbook delta rule, never by re-joining
history against history.

The 100 TB problem: a denormalized (fact ⋈ dim) table consumed by
every downstream job cannot be rebuilt from scratch each time either
side grows. The classical incremental-view-maintenance identity for an
inner equi-join M = L ⋈ R under APPENDS is

    ΔM = (ΔL ⋈ R_old)  ∪  (L_old ⋈ ΔR)  ∪  (ΔL ⋈ ΔR)

— every new output row pairs at least one new input row, and each term
is a KEYED join of a batch-sized delta against an accumulated side (or
the other delta), so per-batch work is ∝ |Δ| ⋈ matched keys, not
∝ |L|·|R|. Appending ΔM to the stored join and the deltas to their
accumulators keeps the invariant  stored ≡ L ⋈ R  exactly, whatever
order the two sides' batches interleave in — the catalog query
`incremental_join_materialize` value-checks the final table against a
one-shot DuckDB join of everything.

Spark shape: accumulators and the joined output are parquet tables
PARTITIONED BY the arrival batch (`batch=<id>` directories). Each
merge reads only what it joins (delta vs whole other side — the other
side's read is a keyed join input, shuffled or broadcast by size, and
at scale lives bucketed on the join key so the delta co-locates),
writes its three delta terms as ONE new batch partition per table, and
drops a commit marker LAST. Replays are idempotent twice over: the
marker short-circuits a completed batch, and a crash mid-write leaves
only overwritable `batch=<id>` directories that the retry rewrites
byte-identically before the marker lands.

Deletes/updates are the aggregate module's retraction problem
(`etl/incremental_agg.py::apply_changes_to_rollup`); this module is
the append-only join path — the shape CDC-free fact/dim growth takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.commit import _fs

_BATCH_COL = "batch"


def _side_path(state_path: str, side: str) -> str:
    return f"{state_path}/{side}"


def _has_data(spark: SparkSession, path: str) -> bool:
    fs, Path = _fs(spark, path)
    if not fs.exists(Path(path)):
        return False
    return any(
        st.isDirectory() and st.getPath().getName().startswith(f"{_BATCH_COL}=")
        for st in fs.listStatus(Path(path))
    )


def _read_side(
    spark: SparkSession, path: str, exclude_batch: str | None = None
) -> DataFrame:
    df = spark.read.parquet(path)
    if exclude_batch is not None:
        # crash window: a retry whose accumulator write COMMITTED but
        # whose marker didn't would otherwise see its own delta in the
        # "old" side and double-count ΔL⋈ΔR — the in-flight batch id is
        # never part of history
        df = df.filter(F.col(_BATCH_COL) != F.lit(exclude_batch))
    return df.drop(_BATCH_COL)


def join_batch_applied(spark: SparkSession, state_path: str, batch_id: str) -> bool:
    """True iff ``batch_id`` COMMITTED (the marker is written after all
    three tables' batch partitions, so an interrupted merge reports
    False and the retry's overwrites converge to the same bytes)."""
    fs, Path = _fs(spark, state_path)
    return bool(fs.exists(Path(f"{state_path}/_APPLIED_{batch_id}")))


def merge_join_state(
    spark: SparkSession,
    state_path: str,
    key: str,
    batch_id: str,
    delta_left: DataFrame | None = None,
    delta_right: DataFrame | None = None,
) -> bool:
    """Fold one batch (a delta of the left side, the right side, or
    both at once) into the materialized join at ``state_path``.

    ``key`` is the equi-join column, present on both sides; apart from
    it the two sides' column sets must be disjoint (the join output
    carries all of them). Returns True iff the batch was applied —
    replays of an already-committed ``batch_id`` return False without
    touching state. Single-writer, like every rename-based layout.
    """
    if delta_left is None and delta_right is None:
        raise ValueError("at least one of delta_left/delta_right is required")
    if batch_id.isdigit():
        # the id becomes a `batch=<id>` partition VALUE: an all-digit id
        # type-infers to INT under a vanilla reader session (ours pins
        # partition values to string) and the exclude-filter comparison
        # would then depend on session config — refuse the ambiguity
        raise ValueError(f"batch_id must not be all digits, got {batch_id!r}")
    for side, d in (("left", delta_left), ("right", delta_right)):
        if d is not None and key not in d.columns:
            raise ValueError(f"delta_{side} lacks join key {key!r}")
        if d is not None and _BATCH_COL in d.columns:
            raise ValueError(f"delta_{side} column {_BATCH_COL!r} is reserved")
    if delta_left is not None and delta_right is not None:
        overlap = (set(delta_left.columns) & set(delta_right.columns)) - {key}
        if overlap:
            raise ValueError(f"non-key columns on both sides: {sorted(overlap)}")
    if join_batch_applied(spark, state_path, batch_id):
        return False

    lp, rp, jp = (
        _side_path(state_path, "left"),
        _side_path(state_path, "right"),
        _side_path(state_path, "joined"),
    )
    l_old = _read_side(spark, lp, exclude_batch=batch_id) if _has_data(spark, lp) else None
    r_old = _read_side(spark, rp, exclude_batch=batch_id) if _has_data(spark, rp) else None

    terms: list[DataFrame] = []
    if delta_left is not None and r_old is not None:
        terms.append(delta_left.join(r_old, key))
    if delta_right is not None and l_old is not None:
        terms.append(l_old.join(delta_right, key))
    if delta_left is not None and delta_right is not None:
        terms.append(delta_left.join(delta_right, key))

    def _write_batch(df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(f"{path}/{_BATCH_COL}={batch_id}")

    if terms:
        delta_m = terms[0]
        for t in terms[1:]:
            delta_m = delta_m.unionByName(t)
        _write_batch(delta_m, jp)
    if delta_left is not None:
        _write_batch(delta_left, lp)
    if delta_right is not None:
        _write_batch(delta_right, rp)

    fs, Path = _fs(spark, state_path)
    fs.create(Path(f"{state_path}/_APPLIED_{batch_id}"), True).close()
    return True


def read_join_view(spark: SparkSession, state_path: str) -> DataFrame:
    """The materialized join — the union of every committed batch's
    delta terms; ≡ L ⋈ R over everything merged so far."""
    jp = _side_path(state_path, "joined")
    if not _has_data(spark, jp):
        raise ValueError(f"no joined state at {state_path}")
    return _read_side(spark, jp)
