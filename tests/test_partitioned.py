"""Partition-pruning contract: a day-partitioned events layout must
resolve day-range predicates at planning time (PartitionFilters, with
nothing left for row-group pushdown), scan ONLY the matching
partitions, and return exactly the rows an unpartitioned filter
returns.
"""

from __future__ import annotations

import pathlib

import pytest

from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.sources.partitioned import (
    read_day_range,
    write_partitioned_by_day,
)

from conftest import SF_SMOKE


def _scan_line(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return next(l for l in plan.splitlines() if "FileScan" in l)


def test_day_range_scan_prunes_partitions(spark, tmp_path):
    events = load_tables(spark, SF_SMOKE)["events"]
    path = str(tmp_path / "events_by_day")
    write_partitioned_by_day(events, path, ts_col="ts")

    days = sorted(
        r.d.isoformat()
        for r in events.selectExpr("to_date(ts) AS d").distinct().collect()
    )
    assert len(days) > 3  # the range below must be a strict subset
    start, end = days[1], days[2]  # two interior days

    pruned = read_day_range(spark, path, "event_day", start, end)
    scan = _scan_line(pruned)
    # the range resolves against partition METADATA: it lands in
    # PartitionFilters, and nothing is left for row-group pushdown
    assert "PartitionFilters: [isnotnull(event_day" in scan
    assert f"(event_day#" in scan and ">= " + start in scan and "<= " + end in scan
    assert "DataFilters: []" in scan and "PushedFilters: []" in scan

    expected = events.filter(
        f"to_date(ts) >= date'{start}' AND to_date(ts) <= date'{end}'"
    ).count()
    assert expected > 0
    assert pruned.count() == expected


def test_pruned_scan_never_touches_out_of_range_partitions(spark, tmp_path):
    # Execution-level proof of pruning: corrupt every parquet file in
    # an OUT-of-range day partition.  The ranged read still succeeds
    # (the skipped directory never reaches an executor); a full scan
    # over the same layout fails on the corrupt bytes.
    events = load_tables(spark, SF_SMOKE)["events"]
    path = str(tmp_path / "events_by_day")
    write_partitioned_by_day(events, path, ts_col="ts")

    days = sorted(
        p.name.split("=")[1]
        for p in pathlib.Path(path).glob("event_day=*")
        if p.is_dir()
    )
    assert len(days) > 3
    start, end = days[1], days[2]
    victim = days[-1]  # outside [start, end]
    for f in pathlib.Path(path, f"event_day={victim}").glob("*.parquet"):
        f.write_bytes(b"not a parquet file")

    pruned = read_day_range(spark, path, "event_day", start, end)
    assert pruned.count() > 0  # pruning skipped the corrupt partition

    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError):
        spark.read.parquet(path).count()  # full scan must hit it


def test_partitioned_write_is_one_fileset_per_day(spark, tmp_path):
    events = load_tables(spark, SF_SMOKE)["events"]
    path = str(tmp_path / "events_compact")
    write_partitioned_by_day(events, path, ts_col="ts")
    # the pre-write repartition(day) keeps each day to ONE output file
    # (one task owns the whole day) — the anti-small-files contract
    per_day = {
        d.name: len(list(d.glob("*.parquet")))
        for d in pathlib.Path(path).glob("event_day=*")
        if d.is_dir()
    }
    assert per_day and all(n == 1 for n in per_day.values()), per_day


def test_join_to_filtered_dim_triggers_dynamic_partition_pruning(spark, tmp_path):
    # The cluster-scale star-join contract: joining the day-partitioned
    # fact to a FILTERED date dimension must prune fact partitions at
    # RUNTIME from the dim's broadcast results (DPP) — the filter's
    # selectivity reaches the fact scan without any static predicate on
    # the partition column.
    events = load_tables(spark, SF_SMOKE)["events"]
    fact_path = str(tmp_path / "fact_by_day")
    write_partitioned_by_day(events, fact_path, ts_col="ts")
    fact = spark.read.parquet(fact_path)

    from pyspark.sql import functions as F

    dim_path = str(tmp_path / "date_dim")
    (
        events.selectExpr("to_date(ts) AS event_day")
        .distinct()
        .withColumn("dow", F.dayofweek("event_day"))
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path).filter("dow = 2")

    joined = fact.join(dim, "event_day")
    joined.write.mode("overwrite").format("noop").save()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan  # runtime partition-pruning subquery

    expected = events.filter("dayofweek(to_date(ts)) = 2").count()
    assert expected > 0
    assert joined.count() == expected
