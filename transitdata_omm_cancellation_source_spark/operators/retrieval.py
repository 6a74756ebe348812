"""Lexical retrieval / relevance-scoring operators over ``documents``.

The search-side counterpart of the corpus-prep family: the operators a
training-data pipeline runs to *find* documents — term weighting,
ranked retrieval, and conjunctive keyword search over an inverted
posting list:

- ``text_tfidf_topk``:    per-document top-k TF-IDF terms (the
                          classic ``tf * (ln((N+1)/(df+1)) + 1)``
                          smooth-idf weighting)
- ``text_bm25_search``:   Okapi BM25 ranked retrieval for a fixed
                          query, top-20 documents
- ``docs_keyword_search``: conjunctive (AND) keyword search — the
                          inverted-index semi-join shape

Float determinism: Spark's ``Math.log`` and DuckDB's libm ``ln``
disagree by 1 ulp on ~3 % of inputs (measured), so every idf is
quantized with ``round(.., 9)`` *before* entering downstream
arithmetic; all arithmetic after that point is IEEE +,*,/ (exactly
rounded, bit-identical across engines), so scores — and therefore
ranks — are reproducible bit-for-bit.  The exact cross-engine check is
the driver's oracle-parity hash (and the same comparison in the verify
harness); the behavioral tests in tests/test_retrieval_sampling.py
compare a pure-Python reimplementation with a 1e-6 tolerance.

Scale notes (100 TB): the tokenize→explode→count pipeline is the
standard inverted-index build — one shuffle on (doc, term), one on
term.  The document-frequency side is vocabulary-sized (≪ corpus) and
joins back on the term key; for BM25 the query's posting rows are
filtered *before* the shuffle (predicate on the exploded term), so
the shuffled volume is the posting lists of the query terms only.
Corpus-level scalars (N, avgdl) ride along as a broadcast cross join
of a 1-row aggregate.  No driver-side collect anywhere.

The reference has no text retrieval (it is a cancellation ETL,
`OmmCancellationHandler.java:106-166`); this module is north-star
surface per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..plans.queries import registered_query as _q

_WORDS_D = X.WORDS_D  # DuckDB-side words("text"); single source in functions/text

#: BM25 hyperparameters (Robertson's defaults).
_K1, _B = 1.2, 0.75

#: Fixed retrieval query: two high-df terms plus the rare planted
#: marker — exercises both ends of the idf range.
_QUERY_TERMS = ("join", "window", "dup")

#: Conjunctive search terms (AND semantics).
_AND_TERMS = ("join", "vector", "sort")

_TFIDF_K = 5
_BM25_TOPN = 20


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — the inverted-index build."""
    return (
        docs.select("doc_id", F.explode(X.words("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


# --- per-document top-k TF-IDF terms ----------------------------------------


@_q(
    "text_tfidf_topk",
    "north-star retrieval: per-doc top-k TF-IDF terms (smooth idf)",
    f"""
    WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({_WORDS_D}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * round(ln((n.n_docs + 1) / CAST(dft.df + 1 AS DOUBLE)) + 1.0, 9) AS s
        FROM tf JOIN dft USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rnk FROM (
        SELECT doc_id, term, tf, round(s, 6) AS tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS INT) AS rnk
        FROM scored
    ) WHERE rnk <= {_TFIDF_K}
    """,
)
def _tfidf_topk(spark, t):
    docs = t["documents"]
    tf = _postings(docs)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # idf is quantized BEFORE the tf multiply so the ordering key is
    # built from bit-identical doubles on both engines (module docstring).
    idf = F.round(
        F.log((F.col("n_docs") + F.lit(1)) / (F.col("df") + F.lit(1)).cast("double"))
        + F.lit(1.0),
        9,
    )
    s = F.col("tf") * idf
    w = Window.partitionBy("doc_id").orderBy(s.desc(), F.col("term").asc())
    return (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", F.round(s, 6).alias("tfidf"), "rnk")
    )


# --- Okapi BM25 ranked retrieval --------------------------------------------


def _bm25_oracle() -> str:
    """BM25 oracle with the same parenthesization as the Spark plan —
    identical IEEE operation order keeps the score bit-identical."""
    qt = ", ".join(f"'{q}'" for q in _QUERY_TERMS)
    contribs = " + ".join(
        f"""(COALESCE(idf_{i}, 0.0) * (COALESCE(tf_{i}, 0) * {_K1 + 1.0})
             / (COALESCE(tf_{i}, 0) + {_K1} * ((1.0 - {_B}) + {_B} * (dl / avgdl))))"""
        for i in range(len(_QUERY_TERMS))
    )
    tf_cols = ", ".join(
        f"sum(CASE WHEN term = '{q}' THEN tf END) AS tf_{i}"
        for i, q in enumerate(_QUERY_TERMS)
    )
    idf_cols = ", ".join(
        f"""max(CASE WHEN term = '{q}' THEN
               round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9) END) AS idf_{i}"""
        for i, q in enumerate(_QUERY_TERMS)
    )
    return f"""
    WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({_WORDS_D}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    stats AS (
        SELECT count(*) AS n_docs,
               avg(CAST(len({_WORDS_D}) AS BIGINT)) AS avgdl
        FROM documents
    ),
    idf AS (
        SELECT {idf_cols}
        FROM (SELECT term, count(*) AS df FROM tf
              WHERE term IN ({qt}) GROUP BY term), stats
    ),
    qtf AS (
        SELECT doc_id, {tf_cols}
        FROM tf WHERE term IN ({qt}) GROUP BY doc_id
    ),
    dl AS (
        SELECT doc_id, CAST(len({_WORDS_D}) AS BIGINT) AS dl FROM documents
    ),
    scored AS (
        SELECT qtf.doc_id, ({contribs}) AS s
        FROM qtf JOIN dl USING (doc_id), stats, idf
    )
    SELECT doc_id, bm25, rnk FROM (
        SELECT doc_id, round(s, 6) AS bm25,
               CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rnk
        FROM scored
    ) WHERE rnk <= {_BM25_TOPN}
    """


@_q(
    "text_bm25_search",
    "north-star retrieval: Okapi BM25 ranked search, fixed 3-term query",
    _bm25_oracle(),
)
def _bm25(spark, t):
    docs = t["documents"]
    tf = _postings(docs).filter(F.col("term").isin(*_QUERY_TERMS))
    # Per-term tf pivoted into fixed columns so the 3-term score sum has
    # ONE evaluation order (a float sum over an unordered groupBy would
    # be partition-order-dependent).
    qtf = tf.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == q, F.col("tf"))).alias(f"tf_{i}")
            for i, q in enumerate(_QUERY_TERMS)
        ]
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(X.words("text")).cast("bigint")).alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .groupBy()
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("term") == q,
                        F.round(
                            F.log(
                                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                                / (F.col("df") + F.lit(0.5))
                                + F.lit(1.0)
                            ),
                            9,
                        ),
                    )
                ).alias(f"idf_{i}")
                for i, q in enumerate(_QUERY_TERMS)
            ]
        )
    )
    dl = docs.select("doc_id", F.size(X.words("text")).cast("bigint").alias("dl"))
    scored = (
        qtf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(idf))
    )
    contrib = [
        F.coalesce(F.col(f"idf_{i}"), F.lit(0.0))
        * (F.coalesce(F.col(f"tf_{i}"), F.lit(0)) * F.lit(_K1 + 1.0))
        / (
            F.coalesce(F.col(f"tf_{i}"), F.lit(0))
            + F.lit(_K1)
            * (F.lit(1.0 - _B) + F.lit(_B) * (F.col("dl") / F.col("avgdl")))
        )
        for i in range(len(_QUERY_TERMS))
    ]
    s = contrib[0]
    for c in contrib[1:]:
        s = s + c
    # Top-N via orderBy().limit() — TakeOrderedAndProject, a per-partition
    # heap + driver merge of N rows, never a full single-partition sort of
    # every scored doc.  The row_number window then runs over only the
    # N surviving rows, so its single partition is bounded by _BM25_TOPN.
    topn = (
        scored.select(
            "doc_id", F.round(s, 6).alias("bm25"), s.alias("_s")
        )
        .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPN)
    )
    w = Window.orderBy(F.col("_s").desc(), F.col("doc_id").asc())
    return (
        topn.withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "bm25", "rnk")
    )


# --- conjunctive keyword search ---------------------------------------------


@_q(
    "docs_keyword_search",
    "north-star retrieval: conjunctive AND search (inverted-index semi-join)",
    f"""
    WITH hits AS (
        SELECT doc_id
        FROM (SELECT DISTINCT doc_id, term
              FROM (SELECT doc_id, unnest({_WORDS_D}) AS term FROM documents)
              WHERE term IN ({", ".join("'" + q + "'" for q in _AND_TERMS)}))
        GROUP BY doc_id
        HAVING count(*) = {len(_AND_TERMS)}
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN hits USING (doc_id)
    """,
)
def _keyword_search(spark, t):
    docs = t["documents"]
    # Postings are filtered to the query terms BEFORE the distinct
    # shuffle, so the exchanged volume is the query's posting lists
    # only; the HAVING count == |terms| gives AND semantics.
    hits = (
        docs.select("doc_id", F.explode(X.words("text")).alias("term"))
        .filter(F.col("term").isin(*_AND_TERMS))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == len(_AND_TERMS))
        .select("doc_id")
    )
    return docs.join(hits, "doc_id").select("doc_id", "lang", "source", "n_chars")
