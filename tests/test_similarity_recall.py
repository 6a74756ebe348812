"""Recall ordering across the ANN family: widening probes can only
improve results, and every approximate variant is bounded by the
brute-force exact answer."""

from __future__ import annotations

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_ORACLE


def _rank1(spark, name):
    df = REGISTRY[name].build(spark, SF_ORACLE)
    return {
        r["query_id"]: r["cosine"]
        for r in df.filter("rank = 1").collect()
    }


def test_multiprobe_dominates_single_probe(spark):
    single = _rank1(spark, "knn_lsh_hyperplane")
    multi = _rank1(spark, "knn_lsh_multiprobe")
    # every query answered single-probe is answered multi-probe, and
    # its best neighbor can only get better (superset of candidates)
    assert set(single) <= set(multi)
    for qid, cos in single.items():
        assert multi[qid] >= cos, qid


def test_bruteforce_bounds_every_approximate_variant(spark):
    # the exact baseline answers a fixed-size query sample (QUERY_CAP),
    # so the bound is asserted on the sampled queries each variant
    # shares with it — domination must hold on every common query.
    exact = _rank1(spark, "knn_bruteforce_cosine")
    assert exact  # the capped sample is non-empty at test sf
    for name in ("knn_lsh_hyperplane", "knn_lsh_multiprobe", "knn_ivf_label",
                 "knn_ivf_kmeans"):
        approx = _rank1(spark, name)
        common = set(approx) & set(exact)
        assert common, name
        for qid in common:
            assert approx[qid] <= exact[qid] + 1e-9, (name, qid)
