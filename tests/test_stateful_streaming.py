"""applyInPandasWithState snapshot diff: two micro-batches through a
file stream with a shared checkpoint — keys from batch 1 must come
back "repeated" in batch 2, with state recovered from the checkpoint
across separate query runs (the restart-safety the reference's
in-memory list never had).
"""

from __future__ import annotations

import pandas as pd

from transitdata_omm_cancellation_source_spark.streaming.stateful import (
    run_available_now,
)


def _write_batch(spark, path: str, rows: list[tuple[str, int]]) -> None:
    spark.createDataFrame(rows, "dvj_id string, ts_epoch_ms long").write.mode(
        "append"
    ).parquet(path)


def _stream(spark, path: str):
    return (
        spark.readStream.schema("dvj_id string, ts_epoch_ms long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(path)
    )


def test_drop_duplicates_within_watermark_across_batches(spark, tmp_path):
    """Spark-native streaming dedup: dropDuplicatesWithinWatermark keeps
    one row per dvj_id while its state lives, across micro-batches —
    the engine-level alternative to the snapshot-store repeated-key
    suppression the poller implements (state bounded by the watermark
    instead of growing forever like the reference's in-memory list)."""
    import datetime as dt

    src = str(tmp_path / "dsrc")
    ckpt = str(tmp_path / "dckpt")
    sink = str(tmp_path / "dsink")

    def write(rows):
        spark.createDataFrame(
            [(k, dt.datetime(2024, 1, 1, 10, m)) for k, m in rows],
            "dvj_id string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema("dvj_id string, ts timestamp")
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["dvj_id"])
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(
            (r.dvj_id, r.ts.minute) for r in spark.read.parquet(sink).collect()
        )

    # batch 1: duplicate "a" inside one batch collapses to its first row
    write([("a", 0), ("a", 1), ("b", 2)])
    assert run() == [("a", 0), ("b", 2)]

    # batch 2 (fresh query, same checkpoint): "a" again within the
    # watermark -> suppressed by recovered state; "c" is new
    write([("a", 3), ("c", 5)])
    assert run() == [("a", 0), ("b", 2), ("c", 5)]


def test_two_batch_state_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    _write_batch(spark, src, [("a", 1), ("a", 2), ("b", 3)])
    run_available_now(_stream(spark, src), ckpt, sink)
    got1 = {
        (r["dvj_id"], r["times_seen"]): r
        for r in spark.read.parquet(sink).collect()
    }
    assert set(got1) == {("a", 1), ("b", 1)}
    assert got1[("a", 1)]["is_new"] and got1[("a", 1)]["n_rows"] == 2
    assert got1[("b", 1)]["is_new"] and got1[("b", 1)]["n_rows"] == 1

    # second batch: "a" repeats, "c" is new; fresh query run, same
    # checkpoint -> state restored from the state store
    _write_batch(spark, src, [("a", 4), ("c", 5)])
    run_available_now(_stream(spark, src), ckpt, sink)
    got2 = {
        (r["dvj_id"], r["times_seen"]): r
        for r in spark.read.parquet(sink).collect()
    }
    assert set(got2) == {("a", 1), ("b", 1), ("a", 2), ("c", 1)}
    assert not got2[("a", 2)]["is_new"] and got2[("a", 2)]["n_rows"] == 1
    assert got2[("c", 1)]["is_new"]
