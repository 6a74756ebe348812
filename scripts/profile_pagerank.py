"""Decompose parts_copurchase_pagerank wall time at sf0.1.

Phases: registry build (incl. pass-estimator jobs), then the noop
action; separately materialize the persisted ``e`` edge table and the
final query to split edge-build vs superstep cost.  Run twice to see
the memoized-estimator warm shape the bench's best-of sees.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transitdata_omm_cancellation_source_spark.session import get_spark
from transitdata_omm_cancellation_source_spark.caching import release_tracked
from transitdata_omm_cancellation_source_spark.plans import queries as registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="profile-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    from transitdata_omm_cancellation_source_spark.catalog import load_tables

    load_tables(spark, SF_DIR)
    spec = registry.REGISTRY["parts_copurchase_pagerank"]

    for rep in range(3):
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = spec.build(spark, SF_DIR)
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        noop(df)  # warm persist: supersteps + topk only
        t3 = time.perf_counter()
        print(
            f"rep{rep}: build {t1 - t0:.3f}s  action-cold {t2 - t1:.3f}s  "
            f"action-warm {t3 - t2:.3f}s"
        )

    # sub-phase split: edge build alone vs rounds, fresh cache
    from pyspark.sql import functions as F
    from transitdata_omm_cancellation_source_spark.operators.graph import (
        _half_edges,
    )
    from transitdata_omm_cancellation_source_spark.caching import (
        persist_tracked,
    )

    tables = load_tables(spark, SF_DIR)
    for rep in range(2):
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        items = tables["lineitem"].select("l_orderkey", "l_partkey").distinct()
        half = _half_edges(items, items)
        edges = half.select(
            F.expr(
                "inline(array(named_struct('src', src, 'dst', dst, 'w', w),"
                " named_struct('src', dst, 'dst', src, 'w', w)))"
            )
        )
        wu = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wu"))
        e = persist_tracked(edges.join(wu, "src"))
        n_e = e.count()
        t1 = time.perf_counter()
        nodes = persist_tracked(e.select(F.col("src").alias("node")).distinct())
        n_nodes = nodes.count()
        t2 = time.perf_counter()
        print(
            f"subrep{rep}: e-materialize {t1 - t0:.3f}s ({n_e} rows)  "
            f"nodes {t2 - t1:.3f}s ({n_nodes} nodes)"
        )

    spark.stop()


if __name__ == "__main__":
    main()
