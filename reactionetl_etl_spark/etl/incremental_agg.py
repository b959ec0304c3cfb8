"""Incremental aggregate maintenance: a materialized rollup merged
batch-by-batch instead of recomputed by rescanning the fact table.

The 100 TB problem: a daily dashboard over (month, segment) revenue
does not get to re-aggregate 100 TB every morning. The classical
answer (Gray et al.'s data cube; every warehouse's incremental
materialized view) is to persist the rollup in its MERGEABLE partial
form and fold each new batch in: sum/count/min/max are algebraic, so

    state' = combine(state, partial(batch))

is exact — identical to recomputing from scratch — and costs
O(batch + touched state partitions), not O(history).

EXACT-TYPE CONTRACT for `sum`: "fold == recompute" is bit-exact only
when the summed type is associative under addition — integers and
DECIMAL. A DOUBLE measure folds in a different order than a one-shot
aggregate and drifts in the low bits (r6: a 3-batch fold of a ~1e7
double sum landed a cent off DuckDB's single pass). Cast money/metric
doubles to DECIMAL(18,2) (or wider) BEFORE merge_aggregate_state;
min/max/count are order-independent for every type.

Spark shape:
- `partial(batch)` is an ordinary groupBy: map-side combined, shuffle
  keyed on the rollup keys, output is rollup-sized (tiny).
- the merge unions the batch partials with ONLY the state partitions
  the batch touches (partition-pruned read) and re-aggregates — work
  is proportional to the update, exactly like the keyed upsert.
- the swap is the staged atomic commit (`etl/commit.py`): a crash
  mid-merge leaves exactly-old or exactly-new state, never a mix.
- exactly-once per batch on plain parquet: each merge names an
  ``_APPLIED_<batch_id>`` marker that rides IN the commit intent, so
  the "did this batch land?" fact and the merged data commit
  atomically (crash recovery creates both or neither). A replayed
  batch is skipped by checking the marker — the same manifest
  discipline the ingest pipeline uses, pushed into the commit itself.

AVG is finalized from (sum, count) at read time (`read_aggregate_view`)
— never stored, since averages don't merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from reactionetl_etl_spark.etl.commit import _fs, staged_overwrite_partitions

_ROW_COUNT = "__nrows"
# merge rule per aggregate: how two partial values combine. COUNT
# DISTINCT is the one classic rollup measure that is NOT algebraic —
# per-group exact distincts cannot be added across batches — so it
# ships as the standard warehouse answer: a mergeable HyperLogLog
# sketch (Datasketches HLL via hll_sketch_agg; ~1.5% relative error
# at the default lgConfigK=12) stored as binary partial state, merged
# with hll_union_agg, estimated at read time. Exactness stays
# available by adding the distinct column to the rollup KEYS instead.
_MERGE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.sum,
    "hll": F.hll_union_agg,
}


def _join_null_safe(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """Left join on group keys with NULL-safe equality. The hist state
    rides in via a join while every other measure folds through groupBy
    — and groupBy treats a NULL key as a perfectly valid group, so a
    name-list join (null-UNSAFE `=`) would silently hand NULL-key
    groups a NULL hist map while their sum/count/min/max merge fine."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & left[k].eqNullSafe(r[f"__r_{k}"])
    return left.join(r, on=cond, how="left").drop(*[f"__r_{k}" for k in keys])


def _hist_width(spec: str) -> float | None:
    """Bin width of a ``"hist:<width>"`` measure spec, else None.

    The histogram is the mergeable-quantile answer: exact quantiles
    don't merge across batches (they need the full value multiset),
    but FIXED-width bin counts do — map merge is exact, and any
    quantile estimated from the merged map is within one bin_width of
    the true value, a deterministic error contract chosen at state
    definition time (vs approx_percentile, whose internal sketch Spark
    does not expose as mergeable state)."""
    if spec.startswith("hist:"):
        w = float(spec.split(":", 1)[1])
        if w <= 0:
            raise ValueError(f"hist bin width must be > 0, got {spec!r}")
        return w
    return None


def _partial(
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, list[str]],
    weight_col: str | None = None,
) -> DataFrame:
    """One batch's mergeable partial aggregate (plus the row count).

    ``weight_col`` (the CDC-retraction path) makes every additive
    aggregate SIGNED: rows carry +1 (insert/postimage) or -1
    (delete/preimage), sums become Σ value·w, counts become Σ w, hist
    bins become signed counts. Only additive measures retract —
    min/max and HLL cannot un-see a value, so they raise here."""
    import warnings

    from pyspark.sql.types import DoubleType, FloatType

    # EXACT-TYPE tripwire (see module docstring): a float/double `sum`
    # measure folds in a batch-dependent order and drifts from a
    # one-shot recompute in the low bits — the r6 driver failure. Warn
    # loudly; callers who truly want approximate sums can ignore it.
    for col, specs in measures.items():
        if "sum" in specs:
            try:
                dt = batch.schema[col].dataType
            except KeyError:
                continue
            if isinstance(dt, (DoubleType, FloatType)):
                warnings.warn(
                    f"incremental sum over {col!r} is {dt.simpleString()}: the fold "
                    "is not bit-exact vs a full recompute — cast to DECIMAL for "
                    "exact merges (see etl/incremental_agg.py docstring)",
                    stacklevel=3,
                )
    w_ = F.col(weight_col) if weight_col is not None else None
    if weight_col is None:
        aggs = [F.count(F.lit(1)).alias(_ROW_COUNT)]
    else:
        aggs = [F.coalesce(F.sum(w_), F.lit(0)).cast("long").alias(_ROW_COUNT)]
    hists: list[tuple[str, float]] = []
    for col, specs in measures.items():
        for a in specs:
            w = _hist_width(a)
            if w is not None:
                hists.append((col, w))
                continue
            if a not in _MERGE:
                raise ValueError(f"non-mergeable aggregate {a!r} (avg is read-time)")
            if weight_col is not None:
                if a in ("min", "max", "hll"):
                    raise ValueError(
                        f"{a!r} cannot retract (a delete can't un-see a value) — "
                        "CDC-folded rollups support sum/count/hist only; recompute "
                        "min/max/hll from the base table instead"
                    )
                if a == "sum":
                    agg = F.sum(F.col(col) * w_).alias(f"{col}__sum")
                else:  # count: non-null values, signed
                    agg = (
                        F.coalesce(
                            F.sum(F.when(F.col(col).isNotNull(), w_).otherwise(F.lit(0))),
                            F.lit(0),
                        )
                        .cast("long")
                        .alias(f"{col}__count")
                    )
                aggs.append(agg)
                continue
            fn = {"count": F.count, "hll": F.hll_sketch_agg}.get(a, _MERGE[a])
            aggs.append(fn(col).alias(f"{col}__{a}"))
    part = batch.groupBy(*keys).agg(*aggs)
    # Stable state type for decimal sums: Spark widens sum(DECIMAL(p,s))
    # to DECIMAL(p+10,s), and re-summing widens again on the first merge
    # (28,2 -> 38,2) — so batch-partial files and merged-state files
    # would carry DIFFERENT parquet physical types and the vectorized
    # reader refuses the mix. Pin every decimal sum at DECIMAL(38,s)
    # once; sum over 38,s stays 38,s, so every write from then on is
    # type-identical.
    for f in part.schema.fields:
        if f.name.endswith("__sum") and isinstance(f.dataType, DecimalType):
            part = part.withColumn(
                f.name, F.col(f.name).cast(DecimalType(38, f.dataType.scale))
            )
    for col, w in hists:
        # bin counts as map<bin_id, count> — one extra rollup-keyed agg
        # per hist measure over the (tiny) batch; NULLs are not binned
        bin_count = (
            F.count(F.lit(1)).alias("__c")
            if weight_col is None
            else F.sum(w_).cast("long").alias("__c")
        )
        h = (
            batch.filter(F.col(col).isNotNull())
            .groupBy(*keys, F.floor(F.col(col) / F.lit(w)).alias("__bin"))
            .agg(bin_count)
            .groupBy(*keys)
            .agg(
                F.map_from_entries(
                    F.array_sort(F.collect_list(F.struct("__bin", "__c")))
                ).alias(f"{col}__hist")
            )
        )
        part = _join_null_safe(part, h, keys)
    return part


def _merge_hist_maps(merged_src: DataFrame, keys: list[str], hist_col: str) -> DataFrame:
    """Fold rows' bin-count maps into one map per group: explode →
    sum per bin → re-assemble. Exact — map merge loses nothing. Bins
    whose count nets to ZERO (CDC retraction) are dropped, and a map
    that nets empty becomes NULL — both so the folded state stays
    byte-identical to a from-scratch recompute."""
    m = F.map_from_entries(F.array_sort(F.collect_list(F.struct("__bin", "__c"))))
    return (
        merged_src.select(*keys, F.explode_outer(hist_col).alias("__bin", "__c"))
        .filter(F.col("__bin").isNotNull())
        .groupBy(*keys, "__bin")
        .agg(F.sum("__c").alias("__c"))
        .filter(F.col("__c") != 0)
        .groupBy(*keys)
        .agg(F.when(F.size(m) > 0, m).alias(hist_col))
    )


def batch_already_applied(spark: SparkSession, state_path: str, batch_id: str) -> bool:
    """True iff a prior merge of ``batch_id`` COMMITTED (marker files
    are created during roll-forward, so an interrupted merge that never
    reached its commit point reports False and is safe to retry)."""
    fs, Path = _fs(spark, state_path)
    return bool(fs.exists(Path(f"{state_path}/_APPLIED_{batch_id}")))


def merge_aggregate_state(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, list[str]],
    partition_col: str,
    batch_id: str | None = None,
) -> bool:
    """Fold one batch into the persisted rollup at ``state_path``.

    ``keys`` are the rollup grain (must include ``partition_col`` — the
    state's partition column, chosen so incremental batches touch few
    partitions: a date-derived column for time-ordered facts).
    ``measures`` maps fact columns to mergeable aggregates
    (sum/count/min/max). ``batch_id``, when given, makes the merge
    exactly-once under at-least-once delivery: replays return False
    without touching state. Returns True iff the batch was applied.

    Single-writer, like every rename-based parquet layout; call
    `etl.commit.recover_staged_commits` at process start.
    """
    if partition_col not in keys:
        raise ValueError(f"partition_col {partition_col!r} must be one of keys {keys}")
    if batch_id is not None and batch_already_applied(spark, state_path, batch_id):
        return False

    part = _partial(batch, keys, measures)
    _merge_state(spark, state_path, part, keys, measures, partition_col, batch_id)
    return True


def _merge_state(
    spark: SparkSession,
    state_path: str,
    part: DataFrame,
    keys: list[str],
    measures: dict[str, list[str]],
    partition_col: str,
    batch_id: str | None,
    drop_empty_groups: bool = False,
    ordered_refresh: DataFrame | None = None,
) -> None:
    """Fold one batch's PARTIAL frame into the persisted state (shared
    by the append fold and the CDC-retraction fold). ``drop_empty_
    groups`` removes groups whose row count reaches zero — the fully-
    deleted-group case the CDC path produces. ``ordered_refresh``
    (CDC path with min/max/hll) carries AUTHORITATIVE recomputed
    values for every group of the touched partitions: its columns are
    dropped from the stored state before the additive merge and joined
    back after, replacing rather than folding (folding an old min with
    a recomputed one could never raise it)."""
    fs, Path = _fs(spark, state_path)
    # "state exists" = has at least one data partition — the directory
    # alone proves nothing (markers/staging from an empty first batch
    # create it without any readable parquet)
    has_data = fs.exists(Path(state_path)) and any(
        st.isDirectory() and st.getPath().getName().startswith(f"{partition_col}=")
        for st in fs.listStatus(Path(state_path))
    )
    touched = [r[0] for r in part.select(partition_col).distinct().collect()]
    refresh_cols = (
        [c for c in ordered_refresh.columns if c not in keys]
        if ordered_refresh is not None
        else []
    )
    if has_data:
        old = spark.read.parquet(state_path).filter(F.col(partition_col).isin(touched))
        if refresh_cols:
            old = old.drop(*refresh_cols)
        # a caller whose keys/measures drifted from the stored state
        # must fail HERE, loudly — unionByName would otherwise raise a
        # generic resolution error (or, worse for subset drift, merge a
        # partial view of the state)
        want, have = set(part.columns), set(old.columns)
        if want != have:
            raise ValueError(
                f"state schema mismatch at {state_path}: stored columns "
                f"{sorted(have)} != requested {sorted(want)} — keys/measures "
                "must match the state's original definition"
            )
        merge_aggs = [F.sum(_ROW_COUNT).alias(_ROW_COUNT)]
        hist_cols: list[str] = []
        for col, specs in measures.items():
            for a in specs:
                if _hist_width(a) is not None:
                    hist_cols.append(f"{col}__hist")
                    continue
                merge_aggs.append(_MERGE[a](f"{col}__{a}").alias(f"{col}__{a}"))
        both = part.unionByName(old)
        merged = both.groupBy(*keys).agg(*merge_aggs)
        for hc in hist_cols:
            merged = _join_null_safe(merged, _merge_hist_maps(both, keys, hc), keys)
    else:
        merged = part
    if ordered_refresh is not None:
        merged = _join_null_safe(merged, ordered_refresh, keys)
    emptied: list = []
    if drop_empty_groups:
        merged = merged.filter(F.col(_ROW_COUNT) != 0)
    # never lazily read the table being overwritten at swap time
    merged = merged.localCheckpoint(eager=True)
    if drop_empty_groups:
        # a touched partition ALL of whose groups netted to zero has no
        # rows left in `merged` — overwrite-by-presence would silently
        # leave its stale files; it must ride the commit as a DELETE
        survivors = {r[0] for r in merged.select(partition_col).distinct().collect()}
        emptied = sorted(v for v in touched if v not in survivors)
    staged_overwrite_partitions(
        spark,
        state_path,
        merged,
        partition_col,
        emptied=emptied,
        markers=[f"_APPLIED_{batch_id}"] if batch_id is not None else [],
    )


def apply_changes_to_rollup(
    spark: SparkSession,
    state_path: str,
    changes: DataFrame,
    keys: list[str],
    measures: dict[str, list[str]],
    partition_col: str,
    batch_id: str | None = None,
    change_type_col: str = "_change_type",
    base: DataFrame | None = None,
) -> bool:
    """Incremental MATERIALIZED-VIEW maintenance under updates and
    deletes: fold one CDC batch (the `etl/snapshots.py::
    snapshot_changes` shape — insert | delete | update_preimage |
    update_postimage) into the rollup, so the state tracks a MUTATING
    base table at cost ∝ changes, never ∝ table.

    The algebra, per measure class (the textbook IVM split):
    - ADDITIVE (sum/count/hist) measures RETRACT — each change row
      carries a sign (+1 for insert/update_postimage, −1 for delete/
      update_preimage) and the same partial-merge machinery folds the
      signed partials exactly; a group whose row count reaches zero
      leaves the state (and a fully-emptied partition is deleted).
    - ORDERED/SKETCH (min/max/hll) measures cannot un-see a value, so
      they are RECOMPUTED — pass ``base`` (the post-change table, e.g.
      `snapshot_read` at the new version) and the touched PARTITIONS'
      groups get fresh values in the same atomic commit; work is
      ∝ touched base partitions, never ∝ table. Declaring min/max/hll
      without ``base`` raises.
    Exactly-once per ``batch_id`` exactly like `merge_aggregate_state`.

    Applying `snapshot_changes(v_i → v_{i+1})` for every commit keeps
    read_aggregate_view ≡ recompute-over-head at all times — the
    catalog query `rollup_cdc_maintenance` value-checks exactly that.
    """
    if partition_col not in keys:
        raise ValueError(f"partition_col {partition_col!r} must be one of keys {keys}")
    if batch_id is not None and batch_already_applied(spark, state_path, batch_id):
        return False
    known = ("insert", "delete", "update_preimage", "update_postimage")
    bad = changes.filter(~F.col(change_type_col).isin(*known)).limit(1).collect()
    if bad:
        raise ValueError(
            f"unknown change type {bad[0][change_type_col]!r} (expected one of {known})"
        )
    recompute_kinds = ("min", "max", "hll")
    # split: additive = sum/count/hist (retract); recomputed = min/max/hll
    additive = {}
    recomputed = {}
    for c, specs in measures.items():
        add = [a for a in specs if a not in recompute_kinds]
        rec = [a for a in specs if a in recompute_kinds]
        if add:
            additive[c] = add
        if rec:
            recomputed[c] = rec
    if recomputed and base is None:
        kinds = sorted({a for specs in recomputed.values() for a in specs})
        raise ValueError(
            f"{kinds} cannot retract (a delete can't un-see a value) — pass "
            "base= (the post-change table) so touched partitions' groups are "
            "recomputed in the same commit, or drop these measures"
        )
    ordered_refresh = None
    if recomputed:
        touched_parts = [
            r[0] for r in changes.select(partition_col).distinct().collect()
        ]
        base_touched = base.filter(F.col(partition_col).isin(touched_parts))
        ordered_refresh = _partial(base_touched, keys, recomputed).drop(_ROW_COUNT)
    signed = changes.withColumn(
        "__w",
        F.when(F.col(change_type_col).isin("insert", "update_postimage"), F.lit(1))
        .otherwise(F.lit(-1)),
    )
    part = _partial(signed, keys, additive, weight_col="__w")
    _merge_state(
        spark, state_path, part, keys, additive, partition_col, batch_id,
        drop_empty_groups=True, ordered_refresh=ordered_refresh,
    )
    return True


def read_aggregate_view(
    spark: SparkSession,
    state_path: str,
    measures: dict[str, list[str]],
    avg_of: list[str] = (),
    quantiles: dict[str, list[float]] | None = None,
) -> DataFrame:
    """The finalized rollup: stored partials plus read-time derivations
    — ``avg_of`` columns get ``<col>__avg = <col>__sum / <col>__count``
    (both partials must be maintained). ``__nrows`` is exposed as
    ``row_count``. ``quantiles`` maps a column carrying a
    ``"hist:<width>"`` measure to the quantiles to estimate
    (``<col>__p<q·100>`` = midpoint of the bin where the cumulative
    count crosses ceil(q·n) — within one bin_width of the exact
    value, by construction, however many batches were merged)."""
    df = spark.read.parquet(state_path).withColumnRenamed(_ROW_COUNT, "row_count")
    for col in avg_of:
        for need in ("sum", "count"):
            if need not in measures.get(col, []):
                raise ValueError(f"avg_of {col!r} needs {need} in measures")
        df = df.withColumn(f"{col}__avg", F.col(f"{col}__sum") / F.col(f"{col}__count"))
    for col, specs in measures.items():
        if "hll" in specs:  # finalize sketches into estimates
            df = df.withColumn(
                f"{col}__approx_distinct", F.hll_sketch_estimate(f"{col}__hll")
            )
    for col, qs in (quantiles or {}).items():
        spec = next(
            (s for s in measures.get(col, []) if _hist_width(s) is not None), None
        )
        if spec is None:
            raise ValueError(f"quantiles of {col!r} need a 'hist:<width>' measure")
        w = _hist_width(spec)
        hc = f"{col}__hist"
        df = df.withColumn(
            "__tot", F.expr(f"aggregate(map_values({hc}), 0L, (a, v) -> a + v)")
        )
        for q in qs:
            name = f"{col}__p{int(round(q * 100))}"
            df = df.withColumn(
                name,
                F.expr(
                    f"""aggregate(array_sort(map_entries({hc})),
                        named_struct('cum', 0L, 'ans', CAST(NULL AS DOUBLE)),
                        (acc, e) -> IF(acc.ans IS NOT NULL, acc,
                            named_struct('cum', acc.cum + e.value,
                                'ans', IF(acc.cum + e.value >= CEIL({q} * __tot),
                                          (e.key + 0.5D) * {w}D,
                                          CAST(NULL AS DOUBLE)))),
                        acc -> acc.ans)"""
                ),
            )
        df = df.drop("__tot")
    return df
