"""Table catalog: schema-stable loads of the engine's input tables.

The reference hard-codes its source schema at the JDBC call sites
(``OmmCancellationHandler.java:110-153``); here the catalog owns the
schema contract once.  Tables load as parquet scans (columnar,
vectorized, filter/pushdown-friendly) and register as temp views so
both the DataFrame API and ``spark.sql`` see the same relations.

``events.ts`` is parquet TIMESTAMP(NANOS): Spark reads it as int64 via
``spark.sql.legacy.parquet.nanosAsLong`` and we convert ns -> us with
exact integer arithmetic (``div 1000``) into TIMESTAMP_NTZ, matching
DuckDB's own ns->us truncation — so oracle comparisons agree to the
microsecond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with engine-canonical column types."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # exact ns->us truncation, then ntz so wall-clock semantics match
        # the other tables (and the DuckDB oracle) irrespective of the
        # session timezone of whoever owns the SparkSession.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view of the same name."""
    apply_runtime_confs(spark)
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
