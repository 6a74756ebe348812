"""Bit-exactness pins for the Arrow word-hash kernel (r16).

The kernel (functions/wordhash_kernel.py) replaces the interpreted
``aggregate(split(t,''), ...)`` char fold inside the shared tokenize
frames and the content-hash samplers.  Results must be IDENTICAL to
the SQL form — these tests compare the two engines value-for-value on
the real corpus sample plus adversarial synthetic rows (nulls, empty
text, no-alnum text, very long words, single-word docs).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.functions import text as X
from transitdata_omm_cancellation_source_spark.functions.wordhash_kernel import (
    _hash_list_array,
    with_joined_polyhash,
    with_word_hashes,
)

from conftest import SF_SMOKE

P = X.HASH_MOD


def _ref(word: str) -> int:
    acc = 0
    for ch in word:
        acc = (acc * 31 + ord(ch)) % P
    return acc


#: ids far above the corpus range so the parity join can't collide
SYNTH = [
    (10_000_001, "hello world this is a doc"),
    (10_000_002, ""),
    (10_000_003, None),
    (10_000_004, "!!! ???"),              # no alnum words at all
    (10_000_005, "solo"),
    (10_000_006, "x" * 2000),             # one very long word
    (10_000_007, "a 0 z9 " + "q" * 300),
    (10_000_008, "Tiny DOC with MIXED case 123"),
]


def test_kernel_matches_sql_fold_on_corpus_and_synthetics(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    synth = spark.createDataFrame(SYNTH, "doc_id long, text string")
    corpus = docs.unionAll(synth)
    base = corpus.select("doc_id", X.words("text").alias("ws"))
    sql_side = corpus.select(
        "doc_id",
        X.word_hashes("text").cast("array<int>").alias("wh_sql"),
        X.polyhash("array_join(regexp_extract_all(lower(text), '[a-z0-9]+', 0), ' ')").alias(
            "jh_sql"
        ),
    )
    kern = with_word_hashes(base, joined_col="jh")
    joined = sql_side.join(kern.select("doc_id", "wh", "jh"), "doc_id")
    mism = joined.filter(
        F.expr("wh_sql IS DISTINCT FROM wh OR jh_sql IS DISTINCT FROM jh")
    ).count()
    assert mism == 0
    assert joined.count() == corpus.count()


def test_joined_only_helper_matches_polyhash(spark):
    synth = spark.createDataFrame(SYNTH, "doc_id long, text string")
    kern = with_joined_polyhash(
        synth.select("doc_id", X.words("text").alias("ws"))
    )
    sql_side = synth.select(
        "doc_id", X.polyhash(X.NORM_TEXT_S).alias("h_sql")
    )
    assert (
        sql_side.join(kern, "doc_id")
        .filter("h_sql IS DISTINCT FROM h")
        .count()
        == 0
    )
    # helper drops the words column: only (doc_id, h) come back
    assert kern.columns == ["doc_id", "h"]


def test_keep_ws_false_drops_words_column(spark):
    synth = spark.createDataFrame(SYNTH, "doc_id long, text string")
    out = with_word_hashes(
        synth.select("doc_id", X.words("text").alias("ws")), keep_ws=False
    )
    assert out.columns == ["doc_id", "wh"]


def test_arrow_list_kernel_edges():
    cases = [["hello", "world"], [], ["x" * 500, "abc"], ["solo"]]
    arr = pa.array(cases + [None], type=pa.list_(pa.string()))
    wh, jh = _hash_list_array(arr, joined=True)
    assert wh.to_pylist() == [[_ref(w) for w in c] for c in cases] + [None]
    assert jh.to_pylist() == [_ref(" ".join(c)) for c in cases] + [None]
    # sliced input (a mid-batch split must not shift offsets)
    assert _hash_list_array(arr.slice(1, 2)).to_pylist() == [
        [],
        [_ref("x" * 500), _ref("abc")],
    ]
