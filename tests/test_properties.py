"""Property-based coverage (hypothesis) of the trickiest scalar and
hash semantics — one batched Spark evaluation per suite, compared
against pure-Python models of the T-SQL / reference behavior.  The
oracle-parity suite checks these on testdata values; here arbitrary
generated inputs pin the edges testdata never hits (>=100 h offsets,
minute/hour boundaries, empty strings, unicode-free hash folds).
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import given, settings, strategies as st

from transitdata_omm_cancellation_source_spark.functions.scalars import (
    now_strings,
    start_time_over24h,
)
from transitdata_omm_cancellation_source_spark.functions.text import HASH_MOD


def _model_start_time(offset: dt.datetime) -> str:
    """Pure-Python model of cancellations_current_future.sql:17-19.

    DATEDIFF counts boundary crossings from 1900-01-01; RIGHT('0'+s,2)
    of the hour count is hours mod 100 zero-padded.
    """
    anchor = dt.datetime(1900, 1, 1)
    secs = int((offset - anchor).total_seconds())
    hours = (secs // 3600) % 100
    mins = (secs // 60) % 60
    return f"{hours:02d}:{mins:02d}:00"


def test_start_time_over24h_matches_tsql_model(spark):
    """Dense sweep 0..215 h in one Spark batch: every 37-minute step
    plus all hour/day boundaries, crossing 24 h and the mod-100 wrap."""
    base = dt.datetime(1900, 1, 1)
    minutes = set(range(0, 215 * 60, 37))
    minutes.update(h * 60 + d for h in range(0, 215, 1) for d in (0, 1, 59))
    cases = [base + dt.timedelta(minutes=m, seconds=s)
             for m in sorted(minutes) for s in (0, 59)]
    df = spark.createDataFrame([(c,) for c in cases], "t timestamp_ntz")
    got = [r["s"] for r in df.select(start_time_over24h("t").alias("s")).collect()]
    for c, have in zip(cases, got):
        want = _model_start_time(c)
        assert have == want, f"{c}: spark={have} model={want}"
    assert all(re.fullmatch(r"\d{2}:\d{2}:00", s) for s in got)


def test_start_time_hits_mod100_and_over24(spark):
    cases = [
        (dt.datetime(1900, 1, 2, 4, 30), "28:30:00"),   # >24 h transit clock
        (dt.datetime(1900, 1, 5, 4, 10), "00:10:00"),   # 100 h -> mod-100 wrap
        (dt.datetime(1900, 1, 1, 0, 0), "00:00:00"),
        (dt.datetime(1900, 1, 1, 23, 59), "23:59:00"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "t timestamp_ntz")
    got = [r["s"] for r in df.select(start_time_over24h("t").alias("s")).collect()]
    assert got == [w for _, w in cases]


@settings(max_examples=300, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1),
        max_value=dt.datetime(2030, 12, 31),
        timezones=st.just(dt.timezone.utc),
    )
)
def test_now_strings_roundtrip(instant):
    """P12: the wall-clock strings must re-parse to the same instant in
    the configured zone (reference binds strings to dodge JDBC tz
    coercion — a formatting drift would silently shift every query)."""
    from zoneinfo import ZoneInfo

    s_ts, s_day = now_strings(instant, "Europe/Helsinki")
    parsed = dt.datetime.strptime(s_ts, "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=ZoneInfo("Europe/Helsinki")
    )
    # A wall-clock string is inherently ambiguous during the DST
    # fall-back hour (the reference accepts this by binding local
    # strings, OmmConnector.java:62); the reparse must hit the same
    # instant under one of the two folds.  Python defines inter-zone
    # == as always-False for fold-ambiguous datetimes, so compare
    # epoch seconds, not datetime objects.
    want = instant.replace(microsecond=0).timestamp()
    assert want in (parsed.timestamp(), parsed.replace(fold=1).timestamp())
    assert s_day == s_ts[:10]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
def test_polyhash_model_bounds(s):
    """The portable polyhash stays in [0, P) and matches the documented
    fold — the invariant both the Spark and DuckDB forms implement."""
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % HASH_MOD
    assert 0 <= acc < HASH_MOD


# --- exact integer matmul (the scan kernels' scoring contract) --------------


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**32),
)
def test_exact_idot_matmul_blas_path_equals_int64_path(nq, nm, seed):
    """The float64-BLAS fast path must return literally the same
    integers as the int64 matmul for any micro-unit magnitudes inside
    the 2^53 contract — summation order cannot matter because every
    partial sum is exactly representable."""
    import numpy as np

    from transitdata_omm_cancellation_source_spark.functions.hyperplane import (
        DIM,
        exact_idot_matmul,
    )

    rng = np.random.default_rng(seed)
    # |u| <= 1.18e6 keeps umax^2 * DIM < 2^53 -> BLAS path taken
    Uq = rng.integers(-1_180_000, 1_180_000, size=(nq, DIM), dtype=np.int64)
    Um = rng.integers(-1_180_000, 1_180_000, size=(nm, DIM), dtype=np.int64)
    fast = exact_idot_matmul(Uq, Um)
    slow = (Uq @ Um.T).astype(np.float64)
    assert fast.dtype == np.float64
    assert (fast == slow).all()


def test_exact_idot_matmul_guard_raises_beyond_int64_headroom():
    import numpy as np
    import pytest as _pytest

    from transitdata_omm_cancellation_source_spark.functions.hyperplane import (
        DIM,
        exact_idot_matmul,
    )

    # |u|^2 * DIM >= 2^62: the BIGINT oracle would error -> kernel must
    # raise rather than wrap.
    u = np.full((1, DIM), 2**29, dtype=np.int64)
    with _pytest.raises(ValueError, match="int64 headroom"):
        exact_idot_matmul(u, u)
