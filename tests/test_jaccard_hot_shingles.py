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


def test_short_docs_flow_through_dedup_family(spark):
    """Regression for the round-1 short-doc crash, end-to-end: the
    planted-corpus dedup builders must not throw on 0/1/2-word docs
    and must still match the oracle (short docs simply contribute no
    shingles, on both engines)."""
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        _minhash_lsh,
        _simhash,
    )

    rows = [
        (1, ""),                      # empty
        (2, "solo"),                  # 1 word
        (3, "two words"),             # k-1 words
        (7, "   !!! ??? "),           # punctuation-only
        (11, "alpha beta gamma delta epsilon common tail"),
        (13, "alpha beta gamma delta epsilon common fin"),   # near-dup of 11
        (21, "completely different text about something else entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    for fn, name, expect_pair in [
        (_ngram_jaccard, "dedup_ngram_jaccard", True),
        (_minhash_lsh, "dedup_minhash_lsh", True),
        # simhash over 7-token docs legitimately lands above hamming 3
        # for a 1-word edit — parity (both engines empty) is the check.
        (_simhash, "dedup_simhash", False),
    ]:
        out = fn(spark, {"documents": docs}).toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        oracle = con.execute(REGISTRY[name].oracle).df()
        con.close()
        assert compare_frames(out, oracle) == [], name
        if expect_pair:
            pairs = set(zip(out["doc_a"], out["doc_b"]))
            assert (11, 13) in pairs, name  # genuine near-dup found


def test_hot_shingle_collect_is_bounded(spark):
    """The heavy-hitter collect carries an explicit .limit() so the
    driver-memory bound is part of the plan, and the returned list can
    never exceed the pigeonhole bound."""
    from pyspark.sql import functions as F

    from transitdata_omm_cancellation_source_spark.functions import text as X
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        _HOT_SHINGLE_LIMIT,
        _HOT_SHINGLE_MASS_FRACTION,
        _hot_shingles,
    )

    assert _HOT_SHINGLE_LIMIT == int(1 / _HOT_SHINGLE_MASS_FRACTION)

    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    sh = docs.select("doc_id", X.word_hashes("text").alias("wh")).select(
        "doc_id",
        F.array_sort(X.shingles_from_word_hashes("wh")).alias("shingles"),
    )
    hot = _hot_shingles(sh)
    # the >1000-df stopword shingle is detected, within the bound
    assert 0 < len(hot) <= _HOT_SHINGLE_LIMIT
    # and the bound is in the physical plan, not just python-side
    plan = (
        sh.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 0)
        .limit(_HOT_SHINGLE_LIMIT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CollectLimit" in plan or "GlobalLimit" in plan


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
