"""Edge-case coverage for the shingle/text expression builders.

Regression for the short-document crash: Spark's ``sequence(1, 0)``
is the *descending* [1, 0], so the unguarded shingle transforms
indexed position 0 on any doc with fewer than k words and threw
(``element_at(wh, 0)``) — while the DuckDB oracles' ``range`` form
correctly produced an empty list.  The guarded builders must yield
[] for short docs on both engines, and identical shingles for >= k
words.
"""

from __future__ import annotations

import duckdb
import pytest

from transitdata_omm_cancellation_source_spark.functions import text as X

P = X.HASH_MOD

SHORT_DOCS = [
    (0, ""),                     # zero words
    (1, "hello"),                # one word
    (2, "hello world"),          # two words (k-1)
    (3, "one two three"),        # exactly k
    (4, "one two three four"),   # k+1
    (5, "  ,,,  !! "),           # punctuation-only -> zero words
]

_WORDS_D = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_WORD_HASHES_D = (
    f"list_transform({_WORDS_D}, t -> list_reduce(list_prepend(CAST(0 AS BIGINT),"
    f" list_transform(string_split(t, ''), x -> CAST(ascii(x) AS BIGINT))),"
    f" (acc, x) -> (acc * 31 + x) % {P}))"
)
_SHINGLES_D = (
    f"list_distinct(list_transform(range(1, greatest(len(wh) - 2, 0) + 1),"
    f" i -> ((wh[i] * 1000003 + wh[i + 1]) % {P} * 1000003 + wh[i + 2]) % {P}))"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SHORT_DOCS, "doc_id int, text string")


def test_word_shingles_short_docs_empty(docs):
    rows = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", X.word_shingles("text").alias("sh")).collect()
    }
    assert rows[0] == [] and rows[1] == [] and rows[2] == [] and rows[5] == []
    assert rows[3] == ["one two three"]
    assert sorted(rows[4]) == sorted(["one two three", "two three four"])


def test_shingle_hashes_and_composed_form_agree(docs):
    """Char-fold shingle_hashes and the two-step word_hashes ->
    shingles_from_word_hashes pipeline are different folds, but both
    must return [] (not throw) below k words."""
    out = docs.select(
        "doc_id",
        X.shingle_hashes("text").alias("direct"),
        X.word_hashes("text").alias("wh"),
    ).select(
        "doc_id", "direct", X.shingles_from_word_hashes("wh").alias("composed")
    )
    for r in out.collect():
        if r["doc_id"] in (0, 1, 2, 5):
            assert r["direct"] == [] and r["composed"] == []
        else:
            assert len(r["direct"]) > 0 and len(r["composed"]) > 0


def test_composed_shingles_match_duckdb_oracle_fold(docs):
    """The planted-corpus dedup oracles' DuckDB shingle fold and the
    Spark composed form must agree element-wise — including on short
    docs where both are empty."""
    spark_rows = {
        r["doc_id"]: sorted(r["sh"])
        for r in docs.select(
            "doc_id", X.word_hashes("text").alias("wh")
        )
        .select("doc_id", X.shingles_from_word_hashes("wh").alias("sh"))
        .collect()
    }
    con = duckdb.connect()
    docs_sql = ", ".join(f"({i}, '{t}')" for i, t in SHORT_DOCS)
    duck = con.execute(
        f"WITH corpus(doc_id, text) AS (VALUES {docs_sql}),"
        f" whs AS (SELECT doc_id, {_WORD_HASHES_D} AS wh FROM corpus)"
        f" SELECT doc_id, {_SHINGLES_D} AS sh FROM whs"
    ).fetchall()
    con.close()
    for doc_id, sh in duck:
        assert sorted(sh) == spark_rows[doc_id], f"doc {doc_id}"


def test_planted_corpus_carries_short_doc(spark):
    """The driver-oracle corpus must include the sub-shingle-length
    document so the empty-shingle guards run in every oracle-checked
    dedup query, not only in these unit tests (both corpus forms)."""
    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.functions.corpus import (
        CORPUS_SQL,
        SHORT_DOC_ID,
        SHORT_DOC_TEXT,
        planted_corpus,
    )
    from conftest import SF_SMOKE

    from pyspark.sql import functions as F

    t = load_tables(spark, SF_SMOKE)
    row = (
        planted_corpus(t["documents"])
        .filter(F.col("doc_id") == SHORT_DOC_ID)
        .collect()
    )
    assert [(r.doc_id, r.text) for r in row] == [(SHORT_DOC_ID, SHORT_DOC_TEXT)]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * "
        f"FROM '{SF_SMOKE}/documents.parquet'"
    )
    duck = con.execute(
        f"SELECT text FROM ({CORPUS_SQL}) WHERE doc_id = {SHORT_DOC_ID}"
    ).fetchall()
    con.close()
    assert duck == [(SHORT_DOC_TEXT,)]
