"""Accuracy-contract tests for the sketch-path registry entries.

Since r7 the contracts are embedded IN the queries as hash-covered
boolean columns (the DuckDB oracle asserts TRUE), so the driver gate
itself certifies them.  These tests pin the same verdicts locally plus
the invariants the oracle can't see: that the exact sides agree with
their exact counterpart queries, and that the sketch estimate the HLL
boolean judges is genuinely close (not merely under a slack bound).
"""

from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_ORACLE


def _by_type(df, cols):
    return {r["event_type"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_quantile_sketch_rank_contract_holds(spark):
    # approx_percentile's contract is a RANK bound, not a value bound
    # (it returns an actual element; tail quantiles of small sparse
    # groups can sit far from the interpolated exact value).  The query
    # re-ranks each sketch output against the empirical CDF and emits
    # the within-tolerance verdict per quantile.
    rows = _by_type(
        REGISTRY["events_value_quantiles_sketch"].build(spark, SF_ORACLE),
        ["n", "p50_rank_ok", "p90_rank_ok", "p99_rank_ok"],
    )
    exact = _by_type(
        REGISTRY["events_value_quantiles"].build(spark, SF_ORACLE), ["n"]
    )
    assert rows.keys() == exact.keys()
    for et, (n, *oks) in rows.items():
        assert n == exact[et][0]
        assert all(oks), (et, oks)


def test_hll_sketch_contract_and_exact_side(spark):
    exact = _by_type(
        REGISTRY["distinct_users_per_event_type"].build(spark, SF_ORACLE),
        ["n_users"],
    )
    rows = _by_type(
        REGISTRY["events_distinct_users_sketch"].build(spark, SF_ORACLE),
        ["n_users", "hll_rel_err_ok"],
    )
    assert exact.keys() == rows.keys()
    for et, (n_users, ok) in rows.items():
        assert n_users == exact[et][0], et  # exact side matches exact query
        assert ok, et


def test_hll_estimate_is_close_not_just_bounded(spark):
    # The in-query bound is 5 % (2.5 sigma at rsd=0.02).  Guard against
    # the bound silently becoming vacuous: the raw estimate on the test
    # corpus should sit well inside it.
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    )
    for r in agg.collect():
        assert r["approx"] == pytest.approx(r["exact"], rel=0.05), (
            r["event_type"],
            r["exact"],
            r["approx"],
        )
