"""Salt-width invariance for the cogrouped dedup scan kernels.

The per-block kernel scans (``corpus_semdedup``,
``dedup_embedding_cosine``) salt-partition the QUERY side and
replicate members per salt, claiming the result is exact at ANY salt
width — each vector meets its block's full member list exactly once
regardless of how the salt splits the queries.  These tests force
pathological widths (1 = no split, and a prime wider than any group)
through the shared ``_ivfpq_nsalt`` sizing hook and require
BIT-IDENTICAL results.
"""

from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
    _embedding_neardup,
)
from transitdata_omm_cancellation_source_spark.operators.semdedup import (
    _semdedup,
)

from conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "fn", [_semdedup, _embedding_neardup], ids=lambda f: f.__name__
)
def test_scan_result_is_salt_width_invariant(spark, fn, monkeypatch):
    import transitdata_omm_cancellation_source_spark.operators.pq as pq

    t = load_tables(spark, SF_SMOKE)
    results = []
    for width in (1, 5):
        monkeypatch.setattr(pq, "_ivfpq_nsalt", lambda n, k, _w=width: _w)
        results.append(_rows(fn(spark, t)))
    assert results[0] == results[1]
    assert results[0]  # non-vacuous: the planted duplicates must appear
