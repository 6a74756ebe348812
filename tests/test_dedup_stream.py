"""The incremental dedup stream as REAL Structured Streaming (r15):
checkpoint-recovered restarts between micro-batches, and idempotent
emission under Spark-level batch redelivery.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY
from transitdata_omm_cancellation_source_spark.streaming.dedup_stream import (
    drain_available,
    run_band_stream,
)
from transitdata_omm_cancellation_source_spark.testing import assert_oracle_parity

from conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_matches_oracle_and_restarts_between_batches(spark, tmp_path):
    """End-to-end: the streaming run's union equals the from-scratch
    recompute (the registry oracle), AND the checkpoint shows each
    micro-batch was committed by its own availableNow query run — the
    inter-batch boundary IS a checkpoint-recovered restart."""
    spec = REGISTRY["dedup_stream_incremental"]
    df = spec.build(spark, SF_SMOKE)
    assert_oracle_parity(df, spec.oracle, SF_SMOKE)
    # both emission shapes are exercised: some pairs complete within a
    # batch, some only when their second side arrives
    batches = {r["batch"] for r in df.select("batch").distinct().collect()}
    assert batches == {1, 2}


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    """Replay a COMMITTED micro-batch through Spark's own offset log
    (delete its commit marker, re-drain): foreachBatch is
    at-least-once, and the per-batch overwrite layout must make the
    redelivery a no-op — no pair lost, none doubled."""
    root = str(tmp_path / "stream")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # batch 2 carries near-dup copies of batch-1 docs so cross-batch
    # pairs exist (the state-probe path) alongside within-batch ones
    b1 = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    b2 = docs.filter("doc_id % 2 = 1").select("doc_id", "text").unionByName(
        docs.filter("doc_id % 2 = 0").select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
    )
    out = run_band_stream(spark, [b1, b2], root, tau=0.5)
    before = _rows(out)
    assert before, "fixture must emit pairs"
    commits = sorted(os.listdir(os.path.join(root, "ckpt", "commits")))
    assert "0" in commits and "1" in commits  # one commit per batch

    # Simulate the crash window: offsets/1 written, commits/1 lost,
    # driver restarts.  A restarted driver is a FRESH JVM with no
    # metadata-log cache; in the shared test JVM the cache would flag
    # the externally-deleted commit as a concurrent writer, so it is
    # disabled for the replay (exactly the fresh-process view).  The
    # replay then runs through Spark's own offset log, which pins the
    # exact file set of the redelivered micro-batch.
    os.remove(os.path.join(root, "ckpt", "commits", "1"))
    crc = os.path.join(root, "ckpt", "commits", ".1.crc")
    if os.path.exists(crc):  # Hadoop local-FS checksum shadow file
        os.remove(crc)
    spark.conf.set("spark.sql.streaming.metadataCache.enabled", "false")
    try:
        drain_available(spark, root, tau=0.5)
    finally:
        spark.conf.unset("spark.sql.streaming.metadataCache.enabled")
    after = _rows(spark.read.parquet(os.path.join(root, "out", "b1"),
                                     os.path.join(root, "out", "b2")))
    assert after == before
