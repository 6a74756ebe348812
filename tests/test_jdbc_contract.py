"""Live-JDBC contract test against in-process Apache Derby.

The reference's S1 source is a real JDBC connection executing SQL
(``OmmConnector.java:61-95``).  PySpark ships the embedded Derby
driver in its own jars (for the Hive metastore), so the JDBC legs can
execute end-to-end in this sandbox: write a testdata table into a
Derby database, read it back through the repo's ``table_read``
(partitioned extraction) and ``pushdown_query`` (whole-statement
pushdown) readers, and compare against the parquet path value-wise.

The SQL Server T-SQL template itself can't run on Derby (dialect);
template selection + binding stay covered by the S2/S3 unit tests,
and ``pushdown_query`` is exercised here with a Derby-dialect
statement through the identical reader code path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.sources.jdbc import (
    pushdown_query,
    table_read,
)

from conftest import SF_SMOKE

_DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby DB seeded with the sf0.001 orders table."""
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/omm;create=true"
    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "ORDERS")
        .option("driver", _DERBY)
        .save()
    )
    return url, src


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_table_read_partitioned_matches_parquet(spark, derby):
    url, src = derby
    hi = src.agg(F.max("o_orderkey")).first()[0]
    via_jdbc = table_read(
        spark,
        url,
        "ORDERS",
        partition_column="o_orderkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=int(hi) + 1,
        driver=_DERBY,
    )
    # the partitioned read produced one JDBC partition per stride
    assert via_jdbc.rdd.getNumPartitions() == 4
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    assert _sorted_rows(via_jdbc, cols) == _sorted_rows(src, cols)
    assert via_jdbc.count() == src.count()


def test_pushdown_query_executes_on_db(spark, derby):
    url, src = derby
    # order-independent aggregates (count/min/max — no float-sum
    # ordering hazard) pushed INTO the database, reference-style.
    # Spark's DerbyDialect stores StringType as CLOB, which Derby
    # refuses in GROUP BY — cast to VARCHAR inside the pushed text.
    stmt = (
        'SELECT CAST("o_orderstatus" AS VARCHAR(4)) AS "o_orderstatus", '
        'COUNT(*) AS "n", '
        'MIN("o_totalprice") AS "lo", MAX("o_totalprice") AS "hi" '
        'FROM ORDERS GROUP BY CAST("o_orderstatus" AS VARCHAR(4))'
    )
    via_db = pushdown_query(spark, url, statement=stmt, driver=_DERBY)
    expect = src.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    cols = ["o_orderstatus", "n", "lo", "hi"]
    assert _sorted_rows(via_db, cols) == _sorted_rows(expect, cols)


def test_pushdown_query_requires_params_or_statement(spark):
    with pytest.raises(ValueError):
        pushdown_query(spark, "jdbc:derby:memory:none")
