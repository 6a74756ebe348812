"""Event-time windowed aggregation over the events stream.

The reference has no windows (SURVEY §2.7) — this is the north-star
streaming surface: the same operator works on a batch DataFrame and on
``readStream`` (add a watermark for state eviction).  Aggregates are
chosen order-independent (count / min / max / integer sums) so results
are deterministic under any partitioning — the property that makes
them oracle-checkable and retry-safe on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge.

    ``F.session_window`` is Spark's native sessionization (dynamic-
    length windows, end = last event + gap, end-exclusive); on a
    stream it requires a watermark to finalize sessions.  The batch
    result equals the classic gaps-and-islands SQL, which is what the
    DuckDB oracle computes.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def hopping_event_counts(
    events: DataFrame,
    window: str = "15 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Hopping (sliding) event-time windows x event_type.

    ``F.window(ts, window, slide)`` assigns each event to
    window/slide overlapping windows (3 for 15m/5m), all aligned to
    the epoch on multiples of ``slide``.  State on a stream is bounded
    by watermark + window length.  Aggregates stay order-independent
    (count / extrema / distinct) so the fan-out join the oracle
    uses reproduces them bit-for-bit.

    ``n_users`` is an exact distinct count on batch (oracle-checked);
    on a stream Spark forbids exact distinct aggregation (it would
    need unbounded per-window sets), so the streaming path swaps in
    the mergeable HLL++ sketch (``approx_count_distinct``) — the same
    exact-in-batch / sketch-in-motion split as the sketch-path query
    family.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    n_users = (
        F.approx_count_distinct("user_id")
        if events.isStreaming
        else F.countDistinct("user_id")
    )
    return (
        events.groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            n_users.alias("n_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
            "n_users",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window x event_type -> count + value extrema.

    ``watermark`` (e.g. "10 minutes") bounds state when ``events`` is a
    stream; batch mode ignores it semantically (late data cannot exist).
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
        )
    )
