"""Behavioral tests for the retrieval (TF-IDF / BM25 / keyword search),
sampling (mixture / stratified split) and hopping-window operators —
semantics beyond the oracle-parity hash, which test_oracle_parity
already enforces for each of these registry entries.
"""

from __future__ import annotations

import re

import pytest

from transitdata_omm_cancellation_source_spark.operators.retrieval import (
    _AND_TERMS,
    _BM25_TOPN,
    _TFIDF_K,
)
from transitdata_omm_cancellation_source_spark.operators.sampling import (
    _DEFAULT_PERMILLE,
    MIXTURE_PERMILLE,
)
from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE

WORDS = re.compile(r"[a-z0-9]+")


def _run(spark, name):
    return REGISTRY[name].build(spark, SF_SMOKE).toPandas()


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .toPandas()
    )


def test_tfidf_matches_independent_reimplementation(spark):
    """Pure-Python TF-IDF over the same corpus must agree with the
    engine's per-doc top-k (terms, order, and scores)."""
    import math
    from collections import Counter

    out = _run(spark, "text_tfidf_topk")
    docs = _docs(spark)
    tfs = {
        r.doc_id: Counter(WORDS.findall(r.text.lower())) for r in docs.itertuples()
    }
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    n = len(docs)
    for doc_id, tf in sorted(tfs.items())[:25]:
        scored = sorted(
            (
                (-t * round(math.log((n + 1) / (d_f + 1)) + 1.0, 9), term)
                for term, t in tf.items()
                for d_f in (df[term],)
            ),
        )[:_TFIDF_K]
        got = out[out["doc_id"] == doc_id].sort_values("rnk")
        assert list(got["term"]) == [term for _, term in scored]
        for (neg_s, _), s_engine in zip(scored, got["tfidf"]):
            assert abs(-neg_s - s_engine) < 1e-6


def test_tfidf_rank_contract(spark):
    out = _run(spark, "text_tfidf_topk")
    per_doc = out.groupby("doc_id")["rnk"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 1).all()
    assert (per_doc["max"] <= _TFIDF_K).all()
    assert (per_doc["max"] == per_doc["count"]).all()  # contiguous ranks


def test_bm25_topn_ordered_and_positive(spark):
    out = _run(spark, "text_bm25_search").sort_values("rnk")
    assert len(out) == _BM25_TOPN
    assert list(out["rnk"]) == list(range(1, _BM25_TOPN + 1))
    scores = list(out["bm25"])
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_keyword_search_and_semantics(spark):
    """Result set must equal the brute-force 'contains every term'
    evaluation of the raw corpus."""
    out = set(_run(spark, "docs_keyword_search")["doc_id"])
    docs = _docs(spark)
    expect = {
        r.doc_id
        for r in docs.itertuples()
        if set(_AND_TERMS) <= set(WORDS.findall(r.text.lower()))
    }
    assert out == expect


def test_mixture_sample_rates_and_weights(spark):
    out = _run(spark, "corpus_mixture_sample")
    for r in out.itertuples():
        rate = MIXTURE_PERMILLE.get(r.source, _DEFAULT_PERMILLE)
        assert r.rate_permille == rate
        assert r.bucket < rate
        assert r.sample_weight == round(1000.0 / rate, 6)
    # keep-all source: every src0 document survives
    docs = _docs(spark)
    n_src0 = (docs["source"] == "src0").sum()
    if n_src0:
        assert (out["source"] == "src0").sum() == n_src0


def test_stratified_split_exact_quotas(spark):
    out = _run(spark, "corpus_stratified_split")
    for lang, grp in out.groupby("lang"):
        n = len(grp)
        counts = grp["split"].value_counts()
        assert counts.get("train", 0) == (8 * n) // 10
        assert counts.get("val", 0) == (9 * n) // 10 - (8 * n) // 10
        assert counts.get("test", 0) == n - (9 * n) // 10


def test_stratified_split_deterministic(spark):
    a = _run(spark, "corpus_stratified_split").sort_values("doc_id")
    b = _run(spark, "corpus_stratified_split").sort_values("doc_id")
    assert list(a["split"]) == list(b["split"])


def test_hopping_window_fanout_and_alignment(spark):
    out = _run(spark, "events_hopping_window")
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    # every event lands in exactly window/slide = 3 windows
    assert out["n_events"].sum() == 3 * n_events
    starts = out["win_start"]
    assert ((starts.astype("int64") // 10**9) % 300 == 0).all()  # 5-min grid
    span = out["win_end"] - out["win_start"]
    assert (span.dt.total_seconds() == 900).all()


@pytest.mark.parametrize(
    "name", ["text_tfidf_topk", "docs_keyword_search", "corpus_stratified_split"]
)
def test_no_cartesian_in_plans(spark, name):
    plan = REGISTRY[name].build(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_fuses_leg_ranks(spark):
    """RRF invariants: every emitted score is exactly the sum of
    1/(k+rank) over the legs that retrieved the doc, ranks are
    consistent with each leg's own top list, and the output is ordered
    by fused score with the doc_id tie-break."""
    from transitdata_omm_cancellation_source_spark.operators.retrieval import (
        _RRF_K,
        _RRF_LEG_DEPTH,
        _RRF_TOPN,
    )

    out = _run(spark, "docs_hybrid_rrf_search").sort_values("rnk")
    assert 0 < len(out) <= _RRF_TOPN
    lex = _run(spark, "text_bm25_search")  # top-20 prefix of the lex leg
    lex_rank = dict(zip(lex["doc_id"], lex["rnk"]))
    prev = float("inf")
    prev_id = -1
    for r in out.itertuples():
        expected = 0.0
        if r.lex_rnk == r.lex_rnk and r.lex_rnk is not None:  # not NaN
            assert 1 <= r.lex_rnk <= _RRF_LEG_DEPTH
            if r.doc_id in lex_rank:  # overlap with the certified top-20
                assert lex_rank[r.doc_id] == r.lex_rnk
            expected += 1.0 / (_RRF_K + r.lex_rnk)
        if r.sem_rnk == r.sem_rnk and r.sem_rnk is not None:
            assert 1 <= r.sem_rnk <= _RRF_LEG_DEPTH
            expected += 1.0 / (_RRF_K + r.sem_rnk)
        assert expected > 0.0
        assert abs(r.rrf_score - expected) < 1e-9
        assert (r.rrf_score, -r.doc_id) <= (prev, -prev_id) or r.rrf_score < prev
        prev, prev_id = r.rrf_score, r.doc_id
    # the query vector's own doc must lead the semantic leg
    sem_best = out[out["sem_rnk"] == 1]
    assert len(sem_best) == 0 or sem_best.iloc[0]["doc_id"] == 0
