"""Hive-style partitioned layout — the partition-pruning scan path.

Bucketing (``bucketed.py``) optimizes the JOIN side of the storage
contract; partitioning optimizes the SCAN side.  At 100 TB, a time-
ranged query over an events fact must not touch the files outside its
range: writing the table partitioned by a derived day column turns
every predicate on that column into directory-level pruning — the
planner resolves the partition list from metadata and the skipped
partitions never reach the scheduler, let alone the disks.  This is
how the reference's PAST-mode incremental capture (SURVEY §2
F3 — "rows modified since the last poll") stays cheap when history
accumulates: the poll's time predicate prunes to the recent
partitions instead of re-scanning the table.

Helpers wrap the two halves; the plan-level guarantee (predicate
lands in ``PartitionFilters``, pruned partition count matches) is
pinned by ``tests/test_partitioned.py``.

Partitioning discipline at scale:
- partition by a LOW-cardinality derived column (day, not timestamp:
  a per-second partition key melts the metastore with millions of
  tiny directories);
- keep rows-per-partition large enough that files stay near the
  parquet row-group sweet spot — repartition by the partition column
  before the write so each partition is one task's output, not one
  shard per upstream task per day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str, day_col: str = "event_day"
) -> None:
    """Write ``df`` as parquet Hive-partitioned by the day of ``ts_col``.

    The pre-write ``repartition(day_col)`` co-locates each day in one
    task so the layout is one file set per day, not one shard per
    (upstream task x day) — the small-files failure mode of naive
    partitioned writes.
    """
    (
        df.withColumn(day_col, F.to_date(ts_col))
        .repartition(F.col(day_col))
        .write.mode("overwrite")
        .partitionBy(day_col)
        .parquet(path)
    )


def read_day_range(
    spark: SparkSession, path: str, day_col: str, start: str, end: str
) -> DataFrame:
    """Scan only the partitions in [start, end] (inclusive, ISO dates).

    The range predicate references the partition column only, so it
    resolves at planning time against partition metadata — the scan
    node's ``PartitionFilters`` carries it and ``PushedFilters`` stays
    empty (nothing left to push into the row groups).
    """
    df = spark.read.parquet(path)
    return df.filter(
        (F.col(day_col) >= F.lit(start).cast("date"))
        & (F.col(day_col) <= F.lit(end).cast("date"))
    )
