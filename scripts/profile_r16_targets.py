"""Phase decomposition of the r16 heavy hitters at sf0.1.

Splits ``parts_copurchase_pagerank`` (edge build vs supersteps) and
``embedding_pca_top_component`` (pre-aggregates vs moment kernel vs
squaring chain: plan build vs execution) so the optimization targets
the phase that actually carries the wall (guide §1).
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
    spark = get_spark(app_name="profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.caching import persist_tracked

    tables = load_tables(spark, SF_DIR)
    tables["lineitem"].count()
    tables["embeddings"].count()

    # ---- pagerank ----------------------------------------------------
    from transitdata_omm_cancellation_source_spark.operators.graph import (
        _half_pairs,
        _half_weights,
        _per_order_parts,
    )

    spec = registry.REGISTRY["parts_copurchase_pagerank"]
    for rep in range(3):
        release_tracked()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"pagerank full rep{rep}")
        t0 = time.perf_counter()
        df = spec.build(spark, SF_DIR)
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        noop(df)
        t3 = time.perf_counter()
        print(
            f"pagerank rep{rep}: build {t1 - t0:.3f}s  cold {t2 - t1:.3f}s"
            f"  warm(e persisted) {t3 - t2:.3f}s", flush=True,
        )
    for rep in range(2):
        release_tracked()
        spark.catalog.clearCache()
        items = tables["lineitem"].select("l_orderkey", "l_partkey")
        t0 = time.perf_counter()
        po = _per_order_parts(items)
        half = _half_weights(_half_pairs(po))
        edges = half.select(
            F.expr(
                "inline(array(named_struct('src', src, 'dst', dst, 'w', w),"
                " named_struct('src', dst, 'dst', src, 'w', w)))"
            )
        )
        wu = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wu"))
        spark.sparkContext.setJobDescription(f"pagerank e-materialize rep{rep}")
        e = persist_tracked(edges.join(wu, "src"))
        n_e = e.count()
        t1 = time.perf_counter()
        print(
            f"pagerank subrep{rep}: e-materialize {t1 - t0:.3f}s ({n_e} rows)",
            flush=True,
        )

    # ---- PCA ----------------------------------------------------------
    from transitdata_omm_cancellation_source_spark.operators import pca as P
    from transitdata_omm_cancellation_source_spark.operators.similarity import (
        corpus_count,
    )
    from transitdata_omm_cancellation_source_spark.caching import clear_value_memos

    spec = registry.REGISTRY["embedding_pca_top_component"]
    for rep in range(3):
        release_tracked()
        spark.catalog.clearCache()
        if rep == 0:
            clear_value_memos()
        spark.sparkContext.setJobDescription(f"pca full rep{rep}")
        t0 = time.perf_counter()
        df = spec.build(spark, SF_DIR)
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        print(
            f"pca rep{rep}{' (memos cold)' if rep == 0 else ''}:"
            f" build {t1 - t0:.3f}s  action {t2 - t1:.3f}s", flush=True,
        )
    # phase split (memos warm)
    emb = tables["embeddings"]
    t0 = time.perf_counter()
    n = corpus_count(spark, emb)
    mu = P.corpus_max_abs_u(spark, emb)
    t1 = time.perf_counter()
    spark.sparkContext.setJobDescription("pca moment kernel")
    rows = P._moment_rows(spark, emb, False)
    t2 = time.perf_counter()
    # rebuild the matrix like the query does
    from transitdata_omm_cancellation_source_spark.functions.hyperplane import DIM
    s_vals = {r["j"]: r["c"] for r in rows if r["k"] == -1}
    c_ut = {(r["j"], r["k"]): r["c"] for r in rows if r["k"] >= 0}
    nf = float(n)
    pre = [
        (float(c_ut[(j, k)]) / nf - (float(s_vals[j]) / nf) * (float(s_vals[k]) / nf)) / 1e12
        for j in range(DIM)
        for k in range(j, DIM)
    ]
    arr = "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in pre) + ")"
    ut = list(spark.sql(f"SELECT transform({arr}, x -> round(x, 9)) AS r").first()["r"])
    idx = {}
    pos = 0
    for j in range(DIM):
        for k in range(j, DIM):
            idx[(j, k)] = pos
            pos += 1
    mat = [[ut[idx[(min(j, k), max(j, k))]] for k in range(DIM)] for j in range(DIM)]
    t3 = time.perf_counter()
    for rep in range(3):
        spark.sparkContext.setJobDescription(f"pca square chain rep{rep}")
        t4 = time.perf_counter()
        df = P.pca_square_and_project(spark, mat)
        t5 = time.perf_counter()
        noop(df)
        t6 = time.perf_counter()
        print(
            f"pca phases rep{rep}: count+maxu {t1 - t0:.3f}s  moments {t2 - t1:.3f}s"
            f"  cov-literal {t3 - t2:.3f}s  chain-build {t5 - t4:.3f}s"
            f"  chain-exec {t6 - t5:.3f}s", flush=True,
        )
        t1 = t0 = time.perf_counter()  # only moments vary below
        rows = P._moment_rows(spark, emb, False)
        t2 = time.perf_counter()
        t3 = time.perf_counter()
    spark.stop()


if __name__ == "__main__":
    main()
