"""Certification-window invariants for the query registry.

The driver's correctness harness verifies only the FIRST ``CERT_WINDOW``
registry entries, so the prioritized rotation list must fit the window
exactly — an over-length list silently drops its tail past the edge
(this happened in r3/r4: ``_PRIORITY`` had 51 names and entry #51,
``o1_global_sort``, missed certification two rounds running).
"""

from transitdata_omm_cancellation_source_spark.plans.queries import (
    CERT_WINDOW,
    REGISTRY,
    _PRIORITY,
    oracle_sql,
    queries,
)


def test_priority_fills_certification_window_exactly():
    resolved = [n for n in _PRIORITY if n in REGISTRY]
    assert len(resolved) == CERT_WINDOW, (
        f"_PRIORITY resolves to {len(resolved)} registry entries for a "
        f"{CERT_WINDOW}-entry driver window: an over-length list silently "
        "drops its tail past the edge, an under-length one hands the freed "
        "slots to arbitrary registration-order entries"
    )


def test_priority_names_all_resolve():
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"_PRIORITY lists unregistered names: {missing}"


def test_priority_has_no_duplicates():
    assert len(set(_PRIORITY)) == len(_PRIORITY)


def test_window_head_is_priority_order():
    # queries() is the driver-facing order (computed at access time, so
    # it is independent of test-import order — REGISTRY's raw dict
    # order is not guaranteed under the operator-module import cycle).
    head = list(queries())[: len(_PRIORITY)]
    assert head == [n for n in _PRIORITY if n in REGISTRY]


def test_flagships_always_inside_window():
    window = list(queries())[:CERT_WINDOW]
    assert "cancellation_pipeline_now" in window
    assert "cancellation_pipeline_past" in window


def test_every_query_has_build_and_oracle_is_subset():
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(b) for b in q.values())
