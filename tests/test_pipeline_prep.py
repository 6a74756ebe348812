"""Unit coverage for the corpus-prep operator family beyond the
registry-wide oracle parity sweep: the properties that make each
operator *correct for its purpose*, not just hash-stable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_ORACLE


@pytest.fixture(scope="module")
def split_df(spark):
    return REGISTRY["corpus_hash_split"].build(spark, SF_ORACLE).cache()


def test_split_covers_every_doc_exactly_once(spark, split_df):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    assert split_df.count() == docs.count()
    assert split_df.select("doc_id").distinct().count() == docs.count()


def test_split_is_content_hashed_not_id_hashed(spark, split_df):
    # The leakage guard: two docs with identical normalized text MUST
    # get the same split, whatever their ids.  Feed the operator a
    # frame with a planted exact duplicate under a far-away id.
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    dup = docs.limit(1).select(
        (F.col("doc_id") + 9_999_999).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    docs.unionByName(dup).createOrReplaceTempView("documents")
    try:
        from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
            _hash_split,
        )

        out = _hash_split(spark, {"documents": docs.unionByName(dup)}).collect()
        by_id = {r["doc_id"]: r["split"] for r in out}
        orig = docs.limit(1).collect()[0]["doc_id"]
        assert by_id[orig + 9_999_999] == by_id[orig]
    finally:
        spark.catalog.dropTempView("documents")


def test_pii_redact_counts_planted_pii(spark):
    out = REGISTRY["text_pii_redact"].build(spark, SF_ORACLE)
    rows = out.collect()
    for r in rows:
        doc_id = r["doc_id"]
        assert r["n_emails"] == (1 if doc_id % 7 == 0 else 0), doc_id
        assert r["n_phones"] == (1 if doc_id % 11 == 0 else 0), doc_id
    # redaction digest must differ from the unredacted text's digest
    # exactly on the planted rows (replacement really happened)
    assert all(len(r["redacted_md5"]) == 32 for r in rows)


def test_ngram_topk_handles_short_docs(spark):
    from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
        _ngram_topk,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "two words"), (3, "a b a b")],
        "doc_id long, text string",
    )
    rows = {r["ngram"]: r["n_occurrences"] for r in _ngram_topk(spark, {"documents": docs}).collect()}
    # 1-word and empty docs contribute nothing; "a b a b" has bigrams
    # (a b) x2, (b a) x1; "two words" has (two words) x1.
    assert rows == {"a b": 2, "b a": 1, "two words": 1}


def test_decontaminate_drops_shingle_overlap(spark):
    from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
        _BENCH_MOD,
        _decontaminate,
    )

    bench_id = _BENCH_MOD  # in the benchmark set (id % mod == 0)
    docs = spark.createDataFrame(
        [
            (bench_id, "held out eval question about spark"),
            (1, "totally unrelated words here entirely"),  # clean
            (2, "an eval question about spark engines"),   # shares a 3-gram
            (3, "to short"),                               # < 3 words: clean
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in _decontaminate(spark, {"documents": docs}).collect()}
    assert kept == {1, 3}


def test_token_chunks_geometry(spark):
    from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
        _CHUNK,
        _STRIDE,
        _token_chunks,
    )

    words = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, words), (2, "only three words"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_tokens"])
        for r in _token_chunks(spark, {"documents": docs}).collect()
    )
    # doc 1: 100 words -> chunks starting at words 1/49/97 hold
    # 64 / 52 (only 52 words remain) / 4 tokens; doc 2: one short
    # chunk; doc 3 (empty) emits nothing.
    assert rows == [(1, 0, 64), (1, 1, 52), (1, 2, 4), (2, 0, 3)]
    assert _STRIDE == _CHUNK - 16


def test_pack_sequences_matches_global_prefix_sum(spark):
    from pyspark.sql import functions as F

    from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
        _PACK_BUDGET,
        _PACK_RANGE,
        _pack_sequences,
    )

    # doc_ids straddle three prefix-sum ranges so the distributed
    # two-phase offsets are actually exercised across range boundaries.
    def doc(i, n):
        return (i, " ".join(f"w{j}" for j in range(n)))

    docs = spark.createDataFrame(
        [
            doc(5, 100),
            doc(7, 200),
            doc(_PACK_RANGE + 1, 30),
            doc(2 * _PACK_RANGE + 9, 250),
            doc(2 * _PACK_RANGE + 10, 10),
        ],
        "doc_id long, text string",
    )
    out = {
        r["pack_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"])
        for r in _pack_sequences(spark, {"documents": docs}).collect()
    }
    # global running offsets: 0, 100, 300, 330, 580 -> packs 0,0,1,1,2
    assert out == {
        0: (2, 300, 5),
        1: (2, 280, _PACK_RANGE + 1),
        2: (1, 10, 2 * _PACK_RANGE + 10),
    }
    assert _PACK_BUDGET == 256


def test_substring_dedup_keeps_canonical_copy_only(spark):
    from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
        _substring_dedup,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h tail0 tail0b", "en", "src0", 28),
            (1, "x a b c d e f g h y", "en", "src0", 19),
            (2, "short one", "en", "src0", 9),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in _substring_dedup(spark, {"documents": docs}).collect()}
    # canonical (smallest doc_id sharing the span) keeps its text intact
    assert out[0].n_removed == 0
    assert out[0].deduped_text == "a b c d e f g h tail0 tail0b"
    # the non-canonical occurrence loses exactly the 8-word span
    assert out[1].n_removed == 8
    assert out[1].deduped_text == "x y"
    assert abs(out[1].removed_frac - 0.8) < 1e-9
    # sub-span-length docs are untouched
    assert out[2].n_removed == 0 and out[2].deduped_text == "short one"


def test_gram_key_terms_cross_engine_and_headroom(spark):
    # The 62-bit span keys are load-bearing values (trigger grouping
    # and cover joins key on them): pin the Spark and DuckDB
    # expression forms to IDENTICAL keys on a fixed doc, that distinct
    # spans get distinct keys there, and the worst-case arithmetic to
    # BIGINT headroom.
    import duckdb

    from transitdata_omm_cancellation_source_spark.functions import text as X

    text = "the quick brown fox jumps over the lazy dog again and again"
    n = 4
    s_expr = X.gram_key_terms(lambda j: f"element_at(wh, i + {j + 1})", n)
    ks_spark = (
        spark.createDataFrame([(text,)], "text string")
        .select(X.word_hashes("text").alias("wh"))
        .select(
            F.expr(f"transform(sequence(0, size(wh) - {n}), i -> {s_expr})").alias("ks")
        )
        .collect()[0]
        .ks
    )
    d_expr = X.gram_key_terms(lambda j: f"wh[i + {j + 1}]", n)
    wh_list = (
        f"list_transform({X.WORDS_D}, t -> list_reduce(list_prepend("
        f"CAST(0 AS BIGINT), list_transform(string_split(t, ''),"
        f" x -> CAST(ascii(x) AS BIGINT))), (acc, x) -> (acc * 31 + x)"
        f" % {X.HASH_MOD}))"
    )
    ks_duck = duckdb.connect().execute(
        f"WITH d AS (SELECT ? AS text),"
        f" whs AS (SELECT {wh_list} AS wh FROM d)"
        f" SELECT list_transform(range(0, len(wh) - {n - 1}),"
        f" i -> {d_expr}) FROM whs",
        [text],
    ).fetchone()[0]
    assert ks_spark == ks_duck
    # 12 words -> 9 positional 4-grams; the two repeated words alone
    # don't repeat any 4-gram, so all keys are distinct here.
    assert len(ks_spark) == 9 and len(set(ks_spark)) == 9
    # worst-case BIGINT headroom of the fold and the combine, in exact
    # Python integers: one fold step, then h1 * P2 + h2.
    worst_step = (X.HASH_MOD - 1) * max(X.GRAM_MULT, X.GRAM_MULT2) + (X.HASH_MOD - 1)
    assert worst_step < 2**63
    assert (X.HASH_MOD - 1) * X.HASH_MOD2 + (X.HASH_MOD2 - 1) < 2**63


def test_span_prune_invariants_hold_for_both_instantiations(spark):
    # shared-skeleton invariants on the real corpus: word accounting is
    # exact (n_removed + |rebuilt words| == n_words), the fraction is
    # consistent, and every doc appears exactly once in the output.
    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
        _boilerplate_prune,
        _substring_dedup,
    )

    from conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE)
    n_docs = t["documents"].count()
    for fn, col in ((_boilerplate_prune, "pruned_text"),
                    (_substring_dedup, "deduped_text")):
        rows = fn(spark, t).collect()
        assert len(rows) == n_docs, fn.__name__
        for r in rows:
            kept_words = len(r[col].split()) if r[col] else 0
            assert r.n_removed + kept_words == r.n_words, (fn.__name__, r.doc_id)
            assert 0.0 <= r.removed_frac <= 1.0
            expected_frac = round(r.n_removed / r.n_words, 6) if r.n_words else 0.0
            assert abs(r.removed_frac - expected_frac) < 1e-9
