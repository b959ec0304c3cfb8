"""As-of join: match each left row to the most recent right row.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The naive
formulations both fail at scale: an inequality join (l.ts >= r.ts)
explodes into a near-cartesian range join, and a per-key
`applyInPandas` merge_asof puts pandas in the hot path.

The scalable formulation is UNION + CARRY-FORWARD:

    1. tag right rows 0, left rows 1; union on (key, ts, tag),
       left rows carrying their payload, right rows carrying theirs
    2. one window over (partition key, order ts, tag): last non-null
       right-payload value seen so far = the as-of match
    3. keep left rows

Cost: ONE shuffle of left+right on the join key and a per-partition
sort — same complexity as a sort-merge join, no row multiplication,
no Python, and no nondeterministic row ids (everything is a pure
function of the input rows, so task retries can't mismatch). This is
the standard time-series enrichment pattern (quotes→trades,
sensor-state→events) for 100 TB event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    strict: bool = False,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the latest right
    row of the same ``on`` key with right_ts <= left_ts (or < when
    ``strict``). Left rows with no prior right row get NULLs — i.e.
    a LEFT as-of join.

    Ties (right_ts == left_ts, strict=False): the right row sorts
    before the left row (tag 0 < 1), so an exactly-simultaneous right
    row IS matched, consistent with DuckDB's ASOF JOIN (>=).

    ``direction='forward'`` matches the EARLIEST right row with
    right_ts >= left_ts instead (next-event enrichment); implemented
    by descending the sort, so it is the same single-shuffle plan.

    ``tolerance``: an INTERVAL string (e.g. ``'1 hour'``) for
    timestamp columns, or a number for numeric timestamp columns
    (same unit as the ts columns); matches farther than the tolerance
    from the left row's timestamp are nulled out (pandas
    ``merge_asof(tolerance=...)`` semantics). The matched right
    timestamp is carried through the same window, so the bound costs
    no extra shuffle.

    Left columns ride along through the single key-shuffle (wider sort
    rows, but no second shuffle and no join-back on a generated id —
    `monotonically_increasing_id` is partitioning-dependent, so a
    join-back can silently mismatch rows under task retries).
    """
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload_cols collide with left columns: {sorted(overlap)}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    l_tag, r_tag = (0, 1) if strict else (1, 0)
    left_cols = left.columns
    right_u = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    left_u = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__tag"),
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    # strict: left sorts BEFORE right at equal ts, so equal-ts right
    # rows are not visible; non-strict: right first → visible.
    # forward: descending ts ⇒ "last right seen so far" = earliest
    # right row at-or-after the left row. Tag stays ASCENDING in both
    # directions: at equal ts the matchable row (tag 0) must precede
    # the left row in traversal order, whichever way ts runs.
    ts_ord = F.col("__ts").desc() if direction == "forward" else F.col("__ts").asc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_ord, F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = {c: F.last(f"__p_{c}", ignorenulls=True).over(w) for c in payload_cols}
    if tolerance is not None:
        # right rows carry their own ts through the same window; a
        # match farther than the tolerance nulls every payload col
        right_u = right_u.withColumn("__pts", F.col("__ts"))
        left_u = left_u.withColumn("__pts", F.lit(None).cast(right.schema[right_ts].dataType))
        matched_ts = F.last("__pts", ignorenulls=True).over(w)
        delta = (
            (matched_ts - F.col("__ts"))
            if direction == "forward"
            else (F.col("__ts") - matched_ts)
        )
        bound = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)  # numeric ts columns: same-unit bound
        )
        in_bound = delta <= bound
        carry = {
            c: F.when(in_bound, expr).otherwise(F.lit(None)) for c, expr in carry.items()
        }
    carried = right_u.unionByName(left_u, allowMissingColumns=True).select(
        "__tag",
        *left_cols,
        *[expr.alias(c) for c, expr in carry.items()],
    )
    return carried.filter(F.col("__tag") == l_tag).drop("__tag")


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
):
    """The SAME as-of semantics via the cogrouped-map surface:
    `left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas` hands
    each key's two slices to one pandas `merge_asof` (backward, exact
    matches allowed — l.ts >= r.ts).

    This is the API-surface twin of :func:`asof_join`, not its
    replacement: the union+carry-forward formulation stays JVM-side
    and is the hot path; cogroup earns its Arrow crossing when the
    per-key merge logic outgrows what a window can say (multi-column
    nearest-neighbor tolerances, per-key model lookups). The oracle
    gate proves the two agree on the catalog query.

    Scale shape: one shuffle of each side on the key (exactly the
    co-partitioning a JVM join would do), then per-key pandas. Same
    caveats as every grouped map: a single key's rows must fit one
    task; determinism requires (ts) to totally order the right side
    within a key (ties would take insertion order, which task retries
    don't preserve)."""
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    )
    # the right ts is RENAMED Spark-side: when both sides derive from
    # one source frame, left_ts and right_ts can be the SAME attribute
    # (identical expr id) and the cogroup's analyzer dedup silently
    # drops the right copy — the pandas side would then KeyError
    right_sel = right.select(
        on, F.col(right_ts).alias("__rts"), *payload_cols
    )
    payload_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in right_sel.schema.fields
        if f.name in payload_cols
    )
    schema = f"{out_fields}, {payload_fields}"
    left_cols = [f.name for f in left.schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=left_cols + payload_cols)
        l = l.sort_values(left_ts, kind="mergesort")
        if len(r) == 0:
            out = l.copy()
            for c in payload_cols:
                out[c] = None
            return out[left_cols + payload_cols]
        r = r.sort_values("__rts", kind="mergesort")
        out = pd.merge_asof(
            l,
            r[["__rts"] + payload_cols],
            left_on=left_ts,
            right_on="__rts",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[left_cols + payload_cols]

    return (
        left.groupBy(on)
        .cogroup(right_sel.groupBy(on))
        .applyInPandas(merge, schema=schema)
    )
