"""Bucketed table layout — the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact-to-fact join (orders x
lineitem on the order key) is the shuffle of both sides.  Writing
both tables bucketed by the join key with the same bucket count makes
the join's partitioning a property of the STORAGE layout: Spark's
scan reports the hash-distribution to the planner, and the
sort-merge join runs with zero Exchange on either side — the shuffle
is paid once at write time and amortized over every subsequent join,
the standard warehouse trade for hot join keys.

Helpers here wrap the two halves of that contract; the plan-level
guarantee (no Exchange under the join) is pinned by
tests/test_bucketing.py.  Bucket metadata lives in the session
catalog (``saveAsTable``) — on a real deployment the same calls ride
the shared metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.

    Sorting within buckets lets the downstream sort-merge join skip
    its per-partition sort as well — the scan is already in join
    order.  ``path`` makes the table EXTERNAL at that location; with
    an in-memory session catalog a managed table's warehouse directory
    outlives the catalog entry, so a re-run would hit
    LOCATION_ALREADY_EXISTS — the drop below clears the entry, the
    explicit path keeps the data under the caller's directory.
    """
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket spec is
    catalog metadata — a raw path read would lose it)."""
    return spark.table(table)
