"""Edge semantics for the tokenizer-statistics operators that corpus
oracle parity can't isolate: BPE pair multiplicity/weighting and the
PMI association ranking with its min-count gate.
"""

from __future__ import annotations

import math

from transitdata_omm_cancellation_source_spark.operators.tokenizer import (
    _PMI_MIN_COUNT,
    _bigram_pmi,
    _bpe_pair_counts,
)

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)], _SCHEMA
    )


def test_bpe_counts_pair_multiplicity_within_word(spark):
    # "aaa" contains the pair "aa" TWICE (positions 1 and 2); with
    # corpus frequency 2 its weighted count is 2 * 2 = 4.  The length-1
    # word "b" contributes no pairs at all.
    out = _bpe_pair_counts(
        spark, {"documents": _docs(spark, ["aaa b", "aaa"])}
    ).collect()
    assert [(r.pair, r.pair_count, r.n_words_with_pair) for r in out] == [
        ("aa", 4, 1)
    ]


def test_bpe_weights_pairs_by_word_frequency(spark):
    # "ab" occurs 3x, "cd" once — the pair table must order by the
    # frequency-weighted count, not the distinct-word count (both 1).
    out = _bpe_pair_counts(
        spark, {"documents": _docs(spark, ["ab ab ab cd"])}
    ).collect()
    assert [(r.pair, r.pair_count) for r in out] == [("ab", 3), ("cd", 1)]


def test_pmi_ranks_exclusive_collocation_above_shared_marginal(spark):
    # "alpha beta" co-occur exclusively; "common" splits between two
    # partners, doubling its marginal and halving each pair's PMI:
    # pmi(alpha beta) = ln 12, pmi(common zed) = pmi(common foo) = ln 6
    # (T = 36 tokens, B = 18 bigram slots).  "rare pair" sits below the
    # min-count gate and must not appear.
    texts = ["alpha beta"] * 6 + ["common zed"] * 6 + ["common foo"] * 6
    out = _bigram_pmi(spark, {"documents": _docs(spark, texts)}).collect()
    assert [r.bigram for r in out] == ["alpha beta", "common foo", "common zed"]
    assert abs(out[0].pmi - math.log(12.0)) < 2e-6
    assert abs(out[1].pmi - math.log(6.0)) < 2e-6
    assert out[0].pair_count == 6


def test_pmi_min_count_gate_drops_rare_pairs(spark):
    texts = ["alpha beta"] * _PMI_MIN_COUNT + ["rare pair"]
    out = _bigram_pmi(spark, {"documents": _docs(spark, texts)}).collect()
    assert [r.bigram for r in out] == ["alpha beta"]


def test_freqitems_certifies_only_heavy_words_and_covers_them(spark):
    from transitdata_omm_cancellation_source_spark.operators.tokenizer import (
        _word_freqitems,
    )

    # "hot" takes 50% of tokens; every filler word sits far below the
    # 1% certification threshold and must NOT appear in the output.
    texts = ["hot " * 10] * 10 + [f"w{i}a w{i}b w{i}c w{i}d" for i in range(25)]
    out = _word_freqitems(spark, {"documents": _docs(spark, texts)}).collect()
    assert [r.word for r in out] == ["hot"]
    r = out[0]
    assert r.cnt == 100 and r.in_sketch is True
    assert abs(r.share - 0.5) < 1e-6
