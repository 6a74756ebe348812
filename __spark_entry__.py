"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``transitdata_omm_cancellation_source_spark``;
this module only adapts the registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.plans import queries as _registry
from transitdata_omm_cancellation_source_spark.plans.cancellation import (
    QueryParams,
    cancellation_pipeline,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §3 E1) on sf0.001; driver checks rows>0."""
    load_tables(spark, SMOKE_SF_DIR)
    return cancellation_pipeline(spark, QueryParams(mode="NOW"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect equivalents for every SQL-expressible query."""
    return _registry.oracle_sql()
