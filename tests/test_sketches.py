"""Error-bound pinning for the sketch-path registry entries (they are
rows-only in the driver gate — cross-engine sketch values differ by
construction — so their *accuracy contract* is enforced here against
the exact counterparts)."""

from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_ORACLE


def _by_type(df, cols):
    return {r["event_type"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_quantile_sketch_rank_error_bounded(spark):
    # approx_percentile's contract is a RANK bound, not a value bound
    # (it returns an actual element; tail quantiles of small sparse
    # groups can sit far from the interpolated exact value).  Assert
    # the sketch's element lands at an empirical CDF position within
    # the accuracy guarantee (1e-4) plus one-element discreteness.
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    approx = _by_type(
        REGISTRY["events_value_quantiles_sketch"].build(spark, SF_ORACLE),
        ["n", "p50", "p90", "p99"],
    )
    exact_n = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for et, (n, *qs) in approx.items():
        assert n == exact_n[et]
        for target, a in zip((0.5, 0.9, 0.99), qs):
            frac = (
                events.filter(
                    (F.col("event_type") == et) & (F.col("value") <= a)
                ).count()
                / n
            )
            tol = 1e-4 + 2.0 / n
            assert abs(frac - target) <= tol, (et, target, a, frac, tol)


def test_hll_sketch_tracks_exact_distinct(spark):
    exact = _by_type(
        REGISTRY["distinct_users_per_event_type"].build(spark, SF_ORACLE),
        ["n_users"],
    )
    approx = _by_type(
        REGISTRY["events_distinct_users_sketch"].build(spark, SF_ORACLE),
        ["approx_users"],
    )
    assert exact.keys() == approx.keys()
    for et, (n_exact,) in exact.items():
        (n_approx,) = approx[et]
        assert n_approx == pytest.approx(n_exact, rel=0.05), (et, n_exact, n_approx)
