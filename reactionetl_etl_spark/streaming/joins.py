"""Stream-stream interval join with watermark-bounded state.

Capability extension (SURVEY.md §2.11). Joining two live streams
requires both sides to buffer rows until the other side can no longer
produce a match; without a time bound that state grows forever. The
interval join bounds it twice over:

    - watermarks on BOTH sides bound how late either stream can be;
    - the join condition constrains match times to
      [left_ts + lower, left_ts + upper], so each buffered row has an
      expiry the state store can act on.

State per key ≈ traffic within (watermark + interval width) — constant
in total stream length. This is the streaming analogue of the batch
as-of/range join (operators/asof.py): click→purchase attribution,
sensor→alarm correlation, order→shipment matching.

The SAME function works on batch DataFrames (watermarks are a no-op in
batch), which is how the parity test proves the join semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts_ntz",
    right_ts: str = "ts_ntz",
    upper: str = "30 minutes",
    watermark: str | None = None,
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join rows of the same ``on`` key where the right event falls in
    (left_ts, left_ts + upper] — "a purchase within 30 minutes after a
    click". Right columns get ``suffix`` on collision.

    ``how`` ∈ inner | left_outer | right_outer | full_outer. The outer
    variants answer the question inner joins can't: WHICH clicks never
    converted. Streaming outer semantics are watermark-driven — an
    unmatched row emits its NULL-padded result only once the watermark
    passes its join window (before that, a match could still arrive),
    so results trail the inner join by up to watermark + interval; a
    finite AvailableNow drain flushes rows whose window closed, and
    the parity test pushes the watermark past everything with a
    far-future sentinel event, the standard finite-stream idiom.

    Streaming inputs need ``watermark`` (applied to both sides) or
    Spark rejects the plan as unbounded-state — for OUTER joins that
    is a hard analysis error, not just unbounded growth.
    """
    allowed = ("inner", "left_outer", "right_outer", "full_outer")
    if how not in allowed:
        raise ValueError(f"how must be one of {allowed}, got {how!r}")
    renames = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
    }
    r = right.select([F.col(c).alias(n) for c, n in renames.items()])
    l = left
    if watermark is not None:
        # watermarks require TIMESTAMP (tz-aware); session tz is pinned
        # UTC (session.py) so the NTZ→TZ cast is deterministic
        l = l.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
        l = l.withWatermark(left_ts, watermark)
        r = r.withColumn(renames[right_ts], F.col(renames[right_ts]).cast("timestamp"))
        r = r.withWatermark(renames[right_ts], watermark)
    rkey, rts = renames[on], renames[right_ts]
    cond = (
        (F.col(on) == F.col(rkey))
        & (F.col(rts) > F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(rkey)
