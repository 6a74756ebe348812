"""Tracked-persist bookkeeping: persisted shared subtrees get a
deterministic release point instead of relying on LRU eviction."""

from __future__ import annotations

from transitdata_omm_cancellation_source_spark import caching
from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def test_release_tracked_frees_query_caches(spark):
    caching.release_tracked()  # clean slate
    df = REGISTRY["dedup_minhash_lsh"].build(spark, SF_SMOKE)
    df.count()  # materialize: fills the tracked caches
    assert len(caching._TRACKED) > 0
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0
    released = caching.release_tracked()
    assert released == len(caching._TRACKED) == 0 or released > 0
    assert len(caching._TRACKED) == 0
    assert caching.release_tracked() == 0  # idempotent


def test_lloyd_rounds_release(spark):
    caching.release_tracked()
    REGISTRY["kmeans_lloyd_centroids"].build(spark, SF_SMOKE).count()
    assert len(caching._TRACKED) > 0
    caching.release_tracked()
    assert len(caching._TRACKED) == 0


def test_artifact_cache_key_is_content_sensitive(spark, tmp_path):
    from transitdata_omm_cancellation_source_spark.caching import (
        artifact_cache_key,
    )

    p = str(tmp_path / "vecs")
    spark.range(5).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    k1 = artifact_cache_key(spark, df)
    assert k1 == artifact_cache_key(spark, spark.read.parquet(p))  # stable

    # rewriting the files behind the SAME path must change the key —
    # a plan-hash-only key would serve a stale trained artifact here
    spark.range(7).write.mode("overwrite").parquet(p)
    k2 = artifact_cache_key(spark, spark.read.parquet(p))
    assert k2 != k1


def test_replace_plan_artifact_evicts_superseded_entries():
    from transitdata_omm_cancellation_source_spark.caching import (
        replace_plan_artifact,
    )

    cache: dict = {}
    k_old = ("app", 1, (("f", 10, 100),))
    k_new = ("app", 1, (("f", 12, 200),))  # same plan, rewritten data
    k_other = ("app", 2, (("g", 1, 1),))   # different plan — untouched
    replace_plan_artifact(cache, k_old, "old")
    replace_plan_artifact(cache, k_other, "x")
    replace_plan_artifact(cache, k_new, "new")
    assert cache == {k_new: "new", k_other: "x"}
