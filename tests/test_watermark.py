"""Late-data semantics for the windowed streaming operators: the
"watermark-ready" claim in streaming/windows.py, exercised on a real
two-batch file-source stream.

Spark's watermark advances at batch end (max event time - delay), so:
batch 1 establishes a watermark, batch 2 delivers one row older than
that watermark (must be DROPPED from its already-open window) and one
fresh row that pushes the watermark far enough to finalize the early
windows in append mode.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from transitdata_omm_cancellation_source_spark.streaming.windows import (
    windowed_event_counts,
)

_SCHEMA = "ts timestamp, event_type string, user_id long, value double"


def _rows(*ts_strings):
    return [
        (datetime.fromisoformat(s), "click", 1, 1.0) for s in ts_strings
    ]


def test_append_mode_drops_rows_behind_watermark(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    # batch 1: three rows in [10:00, 11:00) + one at 11:30 that sets
    # the post-batch watermark to 11:20 — PAST the 10:00 window's end,
    # so append mode finalizes and emits that window in this batch and
    # evicts its state.  (A row merely later than the watermark but
    # inside a still-open window would be accepted: Spark only
    # guarantees dropping rows whose window is already finalized.)
    spark.createDataFrame(
        _rows(
            "2024-01-01 10:05:00",
            "2024-01-01 10:20:00",
            "2024-01-01 10:40:00",
            "2024-01-01 11:30:00",
        ),
        _SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
    windowed = windowed_event_counts(stream, "1 hour", watermark="10 minutes")
    q = (
        windowed.writeStream.format("memory")
        .queryName("wmtest")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()

        # batch 2: one LATE row at 10:30 — its window is finalized and
        # its state evicted, so the row MUST be dropped (not resurrect
        # a duplicate 10:00 output row) — and one at 12:30 that
        # advances the watermark to 12:20, finalizing the 11:00 window.
        spark.createDataFrame(
            _rows("2024-01-01 10:30:00", "2024-01-01 12:30:00"), _SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    out = sorted(
        (r["win_start"].strftime("%H:%M"), r["n_events"])
        for r in spark.sql("SELECT * FROM wmtest").collect()
    )
    # exactly one 10:00 row (3 on-time events; the late row neither
    # counted nor re-emitted) and one 11:00 row; the 12:00 window is
    # still open (watermark 12:20 < 13:00), so append emits nothing.
    assert out == [("10:00", 3), ("11:00", 1)]


def test_hopping_windows_late_drop_across_restart(spark, tmp_path):
    """hopping_event_counts on a stream: watermark finalizes the 3
    overlapping windows per event in append mode, a late row whose
    windows are all finalized is dropped, and — unlike the continuous
    two-batch tests above — the second batch runs in a SEPARATE query
    restarted from the checkpoint, so the watermark and emitted-window
    state must come back from the state store."""
    from transitdata_omm_cancellation_source_spark.streaming.windows import (
        hopping_event_counts,
    )

    src = tmp_path / "hsrc"
    ckpt = tmp_path / "hckpt"
    sink = tmp_path / "hsink"
    src.mkdir()

    def run():
        # parquet sink, not memory: the memory sink refuses checkpoint
        # recovery, and restart-from-checkpoint is the point here.  The
        # sink accumulates across runs; each call returns its totals.
        stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
        hopped = hopping_event_counts(
            stream, window="15 minutes", slide="5 minutes", watermark="10 minutes"
        )
        q = (
            hopped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(
            (r["win_start"].strftime("%H:%M"), r["n_events"])
            for r in spark.read.parquet(str(sink)).collect()
        )

    # batch 1: two events at 10:00/10:04 (same 3 overlapping windows:
    # 09:50, 09:55, 10:00 starts) + a 10:40 row pushing the watermark
    # to 10:30, which finalizes exactly those 3 windows (ends 10:05,
    # 10:10, 10:15).  The 10:40 row's own windows stay open.
    spark.createDataFrame(
        _rows("2024-01-01 10:00:00", "2024-01-01 10:04:00", "2024-01-01 10:40:00"),
        _SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))
    assert run() == [("09:50", 2), ("09:55", 2), ("10:00", 2)]

    # batch 2, FRESH query on the same checkpoint: a late 10:07 row —
    # every window it belongs to (ends 10:10/10:15/10:20) is behind the
    # restored 10:30 watermark, so it must be dropped entirely — plus
    # an 11:10 row advancing the watermark to 11:00, which finalizes
    # the 10:40 row's 3 windows (starts 10:30/10:35/10:40) exactly
    # once, with no re-emission of the batch-1 windows.
    spark.createDataFrame(
        _rows("2024-01-01 10:07:00", "2024-01-01 11:10:00"), _SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    assert run() == [
        ("09:50", 2),
        ("09:55", 2),
        ("10:00", 2),
        ("10:30", 1),
        ("10:35", 1),
        ("10:40", 1),
    ]


def test_batch_mode_ignores_watermark(spark):
    # The same operator on a batch frame: watermark is a no-op
    # (late data cannot exist), every row counts.
    df = spark.createDataFrame(
        _rows(
            "2024-01-01 10:05:00",
            "2024-01-01 10:30:00",
            "2024-01-01 11:05:00",
        ),
        _SCHEMA,
    )
    out = {
        r["win_start"].strftime("%H:%M"): r["n_events"]
        for r in windowed_event_counts(df, "1 hour", watermark="10 minutes").collect()
    }
    assert out == {"10:00": 2, "11:00": 1}


def test_session_windows_finalize_and_drop_late(spark, tmp_path):
    from transitdata_omm_cancellation_source_spark.streaming.windows import (
        sessionized_event_counts,
    )

    src = tmp_path / "ssrc"
    ckpt = tmp_path / "sckpt"
    src.mkdir()

    # batch 1: two events 10 min apart (one session, gap 30 min) and a
    # 13:00 event pushing the watermark to 12:50 — past the first
    # session's end (10:40), so it is finalized and emitted.
    spark.createDataFrame(
        _rows("2024-01-01 10:00:00", "2024-01-01 10:10:00", "2024-01-01 13:00:00"),
        _SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
    sessions = sessionized_event_counts(stream, gap="30 minutes", watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessiontest")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a late 10:20 event (its session is closed — must be
        # dropped, not resurrect/extend it) and a 15:00 event that
        # finalizes the 13:00 session.
        spark.createDataFrame(
            _rows("2024-01-01 10:20:00", "2024-01-01 15:00:00"), _SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    out = sorted(
        (r["session_start"].strftime("%H:%M"),
         r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.sql("SELECT * FROM sessiontest").collect()
    )
    # session 1: 10:00-10:40 (10:10 + 30 min gap) with 2 events — the
    # late 10:20 neither extends it nor re-emits it; session 2:
    # 13:00-13:30 with 1 event; the 15:00 session is still open.
    assert out == [("10:00", "10:40", 2), ("13:00", "13:30", 1)]
