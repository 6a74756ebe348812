"""A3 as a true stateful streaming operator (SURVEY §2.7).

``streaming/poller.py`` keeps the cross-poll snapshot in a versioned
parquet store driven from ``foreachBatch`` — SURVEY §7's "simplest
correct form".  This module is the scale-native alternative the
north-star brief names: ``applyInPandasWithState`` with the snapshot
held in Spark's *state store*, partitioned by key across executors
and checkpoint-recoverable — no driver-side anything, state sharded
exactly like the data, the shape a 100 TB keyspace needs.

Semantics mirror ``logChangesInCancellations``
(``OmmCancellationHandler.java:206-226``): a key seen in a previous
micro-batch is "repeated", an unseen key is "new"; each batch emits
one row per key carrying the flag plus that batch's row count, and
the state remembers (first_seen_batch, times_seen).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "dvj_id string, n_rows long, is_new boolean, times_seen long"
)
STATE_SCHEMA = "times_seen long"


def _flag_batch(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_rows = sum(len(pdf) for pdf in pdfs)
    if state.exists:
        (times_seen,) = state.get
        is_new = False
    else:
        times_seen = 0
        is_new = True
    times_seen += 1
    state.update((times_seen,))
    yield pd.DataFrame(
        {
            "dvj_id": [key[0]],
            "n_rows": [n_rows],
            "is_new": [is_new],
            "times_seen": [times_seen],
        }
    )


def stateful_snapshot_flags(records: DataFrame, key: str = "dvj_id") -> DataFrame:
    """Streaming DataFrame of records -> per-key new/repeated flags.

    State lives in the streaming state store (RocksDB/HDFS-backed on a
    cluster), so the "previous snapshot" never funnels through the
    driver and survives restarts via the checkpoint — the reference's
    in-memory ``previousCancellations`` list, re-hosted shard-per-key.
    """
    return records.groupBy(key).applyInPandasWithState(
        _flag_batch,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream: DataFrame,
    checkpoint_dir: str,
    sink_dir: str,
) -> Any:
    """Drain everything currently available through the stateful op
    into a parquet sink (the memory sink cannot recover from a
    checkpoint, and checkpoint recovery IS the point here); returns
    the finished StreamingQuery."""
    q = (
        stateful_snapshot_flags(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
