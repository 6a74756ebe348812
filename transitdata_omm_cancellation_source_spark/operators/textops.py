"""North-star text analysis over the ``documents`` table.

Four operator families: token counting (whitespace + BPE-ish regex),
quality scoring (length/punct/stopword ratios), language ID (marker
n-gram heuristic) and document fingerprinting (md5 + rolling polyhash).
All are single-pass, shuffle-free scans (the only shuffle is the
optional final aggregation) — at 100 TB they parallelize perfectly per
parquet split.  Oracles are generated from the same constants the
Spark expressions use, so parity is structural, not coincidental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ..plans.queries import registered_query as _q


_WORDS_D = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"  # DuckDB form


@_q(
    "text_token_stats",
    "north-star: token counting (whitespace + BPE-ish regex)",
    f"""
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{X.BPE_TOKEN_PATTERN}', 0)) AS n_bpe_tokens,
           len({_WORDS_D}) AS n_words,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def _token_stats(spark, t):
    return t["documents"].select(
        "doc_id",
        X.token_count_ws("text").alias("n_ws_tokens"),
        X.token_count_bpe("text").alias("n_bpe_tokens"),
        F.size(X.words("text")).alias("n_words"),
        F.length("text").alias("n_chars_measured"),
    )


def _stopword_sql() -> str:
    return ", ".join("'" + w + "'" for w in X.STOPWORDS_EN)


@_q(
    "text_quality_score",
    "north-star: document quality scoring (length/punct/stopword ratios)",
    f"""
    SELECT doc_id,
           round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           round(CAST(len(list_filter({_WORDS_D}, x -> x IN ({_stopword_sql()}))) AS DOUBLE)
                 / len({_WORDS_D}), 6) AS stopword_ratio,
           round(CAST(length(text) AS DOUBLE) / len({_WORDS_D}), 6) AS chars_per_word,
           CASE WHEN length(text) >= 100
                 AND CAST(len(list_filter({_WORDS_D}, x -> x IN ({_stopword_sql()}))) AS DOUBLE)
                     / len({_WORDS_D}) >= 0.05
                THEN 'keep' ELSE 'drop' END AS quality_gate
    FROM documents
    WHERE length(text) > 0 AND len({_WORDS_D}) > 0
    """,
)
def _quality(spark, t):
    nw = F.size(X.words("text"))
    sw = X.stopword_ratio("text")
    return (
        t["documents"]
        .filter((F.length("text") > 0) & (nw > 0))
        .select(
            "doc_id",
            F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
            F.round(sw, 6).alias("stopword_ratio"),
            F.round(F.length("text") / nw, 6).alias("chars_per_word"),
            F.when((F.length("text") >= 100) & (sw >= 0.05), "keep")
            .otherwise("drop")
            .alias("quality_gate"),
        )
    )


def _langid_sql() -> str:
    """DuckDB CASE-chain replicating functions.text.lang_id exactly
    (forward order, strict > , 'und' default)."""
    hits = {
        lang: f"len(list_filter({_WORDS_D}, x -> x IN ({', '.join(chr(39) + m + chr(39) for m in markers)})))"
        for lang, markers in X.LANG_MARKERS.items()
    }
    best, best_score = "'und'", "0"
    for lang, h in hits.items():
        best = f"CASE WHEN {h} > {best_score} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN {h} > {best_score} THEN {h} ELSE {best_score} END"
    return best


@_q(
    "text_language_id",
    "north-star: n-gram/marker language identification",
    f"""
    SELECT lang_pred, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM (SELECT doc_id, {_langid_sql()} AS lang_pred FROM documents)
    GROUP BY lang_pred
    """,
)
def _langid(spark, t):
    # tokenize once into a column, then the argmax chain touches only
    # cheap int hit-counts (the one-expression lang_id form re-runs the
    # regex ~15x per row through the when-chain duplication).
    withw = t["documents"].withColumn("__w", X.words("text"))
    hits = withw.select(
        "doc_id",
        *[c.alias(f"__h_{lang}") for lang, c in X.lang_hit_counts("__w").items()],
    )
    return (
        hits.select(
            "doc_id",
            X.lang_from_hits(
                {lang: f"__h_{lang}" for lang in X.LANG_MARKERS}
            ).alias("lang_pred"),
        )
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_POLY_D = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(string_split({expr}, ''), x -> CAST(ascii(x) AS BIGINT))),"
    " (acc, x) -> (acc * 31 + x) % " + str(X.HASH_MOD) + ")"
)


@_q(
    "text_fingerprint",
    "north-star: document fingerprinting (md5 + rolling polyhash)",
    f"""
    SELECT doc_id,
           md5(array_to_string({_WORDS_D}, ' ')) AS fp_md5,
           {_POLY_D.format(expr="array_to_string(" + _WORDS_D + ", ' ')")} AS fp_poly
    FROM documents
    """,
)
def _fingerprint(spark, t):
    return t["documents"].select(
        "doc_id",
        X.fingerprint_md5("text").alias("fp_md5"),
        X.polyhash("array_join(regexp_extract_all(lower(text), '[a-z0-9]+', 0), ' ')").alias(
            "fp_poly"
        ),
    )
