"""Heavy-hitter handling in the PPJoin prefix filter.

Builds a corpus where one stopword-ish shingle appears in >1000 docs
(above the hot cap, which the stock testdata never reaches), so the
canonical prefix order switches to cold-before-hot.  Recall must stay
exact: the near-dup pairs (which share only *rare* shingles in their
prefixes) are still found, and the result matches the DuckDB oracle's
full inverted-index join on the same corpus.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
    _ngram_jaccard,
)
from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY
from transitdata_omm_cancellation_source_spark.testing import compare_frames


def _corpus() -> list[tuple[int, str]]:
    docs = []
    # 1060 docs sharing the shingle "common stop words" + unique tails:
    # df(common-shingle) > 1000 -> hot; pairwise J far below tau.
    for i in range(1060):
        docs.append((i, f"common stop words unique{i} tail{i} end{i}"))
    # one genuine near-dup pair on RARE shingles (ids avoid % 10 == 0
    # so planted_corpus copies don't overlap them)
    docs.append((2001, "rare alpha beta gamma delta epsilon zeta"))
    docs.append((2003, "rare alpha beta gamma delta epsilon eta"))
    return docs


def test_hot_shingle_corpus_matches_oracle(spark):
    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = _ngram_jaccard(spark, {"documents": docs}).toPandas()

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = con.execute(REGISTRY["dedup_ngram_jaccard"].oracle).df()
    con.close()

    assert compare_frames(out, oracle) == []
    # the rare-shingle near-dup pair survived the hot reorder
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (2001, 2003) in pairs
    # and no hot-shingle-only pair was emitted (J < tau for all of them)
    assert all(a >= 1060 or b >= 1_000_000 for a, b in pairs), pairs
