"""Event-time windowed aggregation with late-data handling.

Capability extension (SURVEY.md §2.11: the reference has no streaming
operators). The same plan runs in batch (over the `events` testdata
table — that's what the oracle checks) and in streaming (over a
readStream source with a watermark bounding state).

State-size math for 100 TB/day streams: a tumbling window keyed by
(window, event_type) holds #types × (watermark / slide) rows of state —
constant in input volume; only the shuffle to co-locate keys scales with
traffic, and partial aggregation compresses it map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts_ntz",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window stats per event_type.

    Pass `watermark` (e.g. "2 hours") when `events` is a streaming
    DataFrame — it bounds state retention and defines late-row dropping;
    in batch it is ignored semantics-wise (all data is 'on time').
    """
    if watermark is not None and events.isStreaming:
        # watermarks require TIMESTAMP (tz-aware); session tz is pinned
        # UTC (session.py) so the NTZ→TZ cast is deterministic
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.window(F.col(ts_col), window).alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
        "approx_users",
    )


def sliding_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts_ntz",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows (4 for 1h/15m), all epoch-aligned.

    State math at scale: state rows = #types × (watermark / slide) ×
    (window / slide) — still constant in input volume; the fan-out
    multiplies the SHUFFLE (each row keys window/slide times), which is
    why production slides are coarse (≥ minutes) and partial
    aggregation matters even more than for tumbling windows.
    """
    if watermark is not None and events.isStreaming:
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.window(F.col(ts_col), window, slide).alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
    )


def dedup_earliest(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ntz",
    tie_col: str = "event_id",
) -> DataFrame:
    """Deterministic first-wins dedup: keep each key's earliest row by
    (event time, tie key). The batch-verifiable twin of
    `streaming_dedup`/dropDuplicatesWithinWatermark — streaming keeps
    the first row ENCOUNTERED (arrival order), which equals this
    event-time pick whenever the source replays in event-time order.
    One shuffle on the keys; the rank filter plans as WindowGroupLimit
    (map-side partial top-1 before the exchange)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ntz",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first row per key set.

    `dropDuplicates` on a stream keeps per-key state forever unless a
    watermark bounds it — with one, keys older than the watermark are
    evicted, so state size tracks the late-data horizon, not history.
    In batch the same call is a plain distinct-by-key.
    """
    if events.isStreaming:
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        events = events.withWatermark(ts_col, watermark)
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts_ntz",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows (gap-based). In streaming, sessions
    close when the watermark passes their gap; in batch they are exact."""
    if watermark is not None and events.isStreaming:
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.session_window(F.col(ts_col), gap).alias("sess"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )
