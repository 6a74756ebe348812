"""Edge semantics for the user-history operators that corpus-level
oracle parity can't isolate: SCD2 run-collapse boundaries and the
funnel's strictly-ordered step windows.
"""

from __future__ import annotations

from datetime import datetime

from transitdata_omm_cancellation_source_spark.operators.behavior import (
    _funnel,
    _retention,
    _scd2,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.fromisoformat(ts), uid, et, 1.0, "{}")
            for i, (ts, uid, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_scd2_collapses_runs_and_versions(spark):
    ev = _ev(
        spark,
        [
            ("2024-01-01 10:00:00", 1, "view"),
            ("2024-01-01 10:05:00", 1, "view"),  # same run — collapsed
            ("2024-01-01 10:10:00", 1, "click"),
            ("2024-01-01 10:15:00", 1, "view"),  # status may recur
            ("2024-01-01 09:00:00", 2, "signup"),
        ],
    )
    out = {
        (r.user_id, r.version): r
        for r in _scd2(spark, {"events": ev}).collect()
    }
    assert len(out) == 4  # 3 runs for user 1, 1 for user 2
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert [v1.status, v2.status, v3.status] == ["view", "click", "view"]
    # interval chaining: each valid_to equals the next valid_from
    assert v1.valid_to == v2.valid_from and v2.valid_to == v3.valid_from
    assert v3.valid_to is None and v3.is_current
    assert not v1.is_current and not v2.is_current
    assert out[(2, 1)].is_current


def test_funnel_requires_strict_order_within_window(spark):
    ev = _ev(
        spark,
        [
            # user 1 completes all three steps in order
            ("2024-01-01 10:00:00", 1, "view"),
            ("2024-01-01 11:00:00", 1, "click"),
            ("2024-01-02 09:00:00", 1, "purchase"),
            # user 2: click BEFORE first view — step 2 not reached
            ("2024-01-01 08:00:00", 2, "click"),
            ("2024-01-01 10:00:00", 2, "view"),
            # user 3: click 8 days after view — outside the 7-day window
            ("2024-01-01 10:00:00", 3, "view"),
            ("2024-01-09 11:00:00", 3, "click"),
            # user 4 never views — not even step 1
            ("2024-01-01 10:00:00", 4, "purchase"),
        ],
    )
    out = {r.step: r for r in _funnel(spark, {"events": ev}).collect()}
    assert [out[s].n_users for s in (1, 2, 3)] == [3, 1, 1]
    assert out[1].pct_of_first == 1.0
    assert abs(out[3].pct_of_first - round(1 / 3, 6)) < 1e-9


def test_retention_cohorts_offsets_and_monday_weeks(spark):
    ev = _ev(
        spark,
        [
            # user 1: first touch Wed Jan 3 -> cohort week Mon Jan 1;
            # active again in offset weeks 1 and 3
            ("2024-01-03 10:00:00", 1, "view"),
            ("2024-01-10 10:00:00", 1, "click"),
            ("2024-01-22 10:00:00", 1, "view"),
            # user 2: first touch the following week -> its own cohort,
            # two events inside one week count once
            ("2024-01-08 09:00:00", 2, "view"),
            ("2024-01-08 18:00:00", 2, "click"),
        ],
    )
    out = {
        (r.cohort_week.strftime("%Y-%m-%d"), r.week_offset): r.n_users
        for r in _retention(spark, {"events": ev}).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
    }
