"""Performance-as-correctness: pin the physical-plan properties the
100 TB design depends on.  A regression that silently turns a broadcast
into a shuffle, drops scan pruning, or introduces a cross join would
still pass value parity — these tests catch it at plan level.
"""

from __future__ import annotations

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].build(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_prunes_and_pushes_down(spark):
    plan = _plan(spark, "cancellation_pipeline_now")
    assert "PushedFilters: [" in plan
    # events feeds deviation_cases: the scan must not drag full rows
    assert "props" not in plan  # unreferenced wide column stays pruned
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(spark, "tpch_q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q3_uses_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_knn_broadcasts_query_set(spark):
    plan = _plan(spark, "knn_lsh_hyperplane")
    # bucket equi-join with the broadcast query side
    assert "BroadcastHashJoin" in plan


def test_jaccard_candidates_are_equi_join(spark):
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
