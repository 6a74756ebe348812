"""PageRank edge semantics on hand-computable graphs: the exact
integer micro-unit fixed point, hub dominance, and tie-break order.
"""

from __future__ import annotations

from transitdata_omm_cancellation_source_spark.operators.graph import _pagerank


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_symmetric_pair_is_the_exact_fixed_point(spark):
    # one order with two parts: each node's whole mass flows to the
    # other, so 150000 + (85 * 1_000_000) div 100 = 1_000_000 exactly —
    # the integer update has a true fixed point, no drift over rounds.
    out = _pagerank(spark, {"lineitem": _li(spark, [(1, 10), (1, 20)])}).collect()
    assert [(r.part, r.rank_micro, r.rnk) for r in out] == [
        (10, 1_000_000, 1),
        (20, 1_000_000, 2),
    ]


def test_hub_accumulates_rank_with_exact_integer_values(spark):
    # star graph: A co-occurs with B (order 1) and C (order 2).  Three
    # integer power-iteration rounds give exactly 1741625 / 629187 —
    # computed by hand, pinned to the last micro-unit (any float or
    # rounding difference would shift these).
    li = _li(spark, [(1, 100), (1, 200), (2, 100), (2, 300)])
    out = _pagerank(spark, {"lineitem": li}).collect()
    assert [(r.part, r.rank_micro, r.rnk) for r in out] == [
        (100, 1_741_625, 1),
        (200, 629_187, 2),  # partkey breaks the B/C tie
        (300, 629_187, 3),
    ]
