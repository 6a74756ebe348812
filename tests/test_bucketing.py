"""The bucketed-join contract: co-located storage layout makes the
fact-to-fact join run with ZERO Exchange — the shuffle is paid once
at write time, not on every join.  Values must equal the unbucketed
join's exactly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)

from conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    # force the join down the sort-merge path so the Exchange assertion
    # is about bucketing, not about one side fitting in a broadcast
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_bucketed_join_has_no_exchange(spark, no_broadcast, tmp_path):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", "o_orderkey", n_buckets=8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
        path=str(tmp_path / "b_lineitem"),
    )

    joined = read_bucketed(spark, "b_orders").join(
        read_bucketed(spark, "b_lineitem"), "o_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the whole point: both sides scan pre-partitioned, nothing shuffles
    assert "Exchange" not in plan, plan[:2000]

    # and the layout change is invisible to the values
    expect = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == expect.count()
    got = joined.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q")
    ).first()["q"]
    want = expect.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q")
    ).first()["q"]
    assert got == want
