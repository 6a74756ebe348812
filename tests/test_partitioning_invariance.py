"""Partitioning-invariance: the determinism claims, tested directly.

The engine's cross-engine parity discipline (exact integer folds,
quantized transcendentals, explicit tie-breaks) exists to make results
independent of HOW the data is partitioned — the property that makes
answers retry-stable and cluster-layout-independent at 100 TB, where
the input split layout is never the same twice.  These tests feed the
same operators pathologically re-partitioned inputs (round-robin into
a prime partition count, and hash-partitioned on a non-key column) and
require BIT-IDENTICAL results, not approximate ones.

Oracle parity cannot catch a partitioning-sensitive operator whose
default local layout happens to match DuckDB; this does.
"""

from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.operators.analytics import (
    _upsert_merge,
)
from transitdata_omm_cancellation_source_spark.operators.graph import _pagerank
from transitdata_omm_cancellation_source_spark.operators.pipeline_prep import (
    _substring_dedup,
)
from transitdata_omm_cancellation_source_spark.operators.pca import (
    _pca_top_component,
)
from transitdata_omm_cancellation_source_spark.operators.quantize import (
    _standardize,
)
from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
    _embedding_neardup,
)
from transitdata_omm_cancellation_source_spark.operators.semdedup import (
    _semdedup,
)
from transitdata_omm_cancellation_source_spark.operators.similarity import (
    _knn_ivf_kmeans,
)
from transitdata_omm_cancellation_source_spark.operators.tokenizer import (
    _bigram_pmi,
    _bpe_pair_counts,
    _word_freqitems,
)

from conftest import SF_SMOKE

#: (operator, tables it reads) — math-sensitive paths: exact-integer
#: moment sums, quantized-log chains, frequency-weighted aggregations,
#: sketch coverage booleans, positional span rebuilds, chunked
#: centroid folds + broadcast argmax assignment, squared-matrix
#: power iteration.
_CASES = [
    (_standardize, ("embeddings",)),
    (_bigram_pmi, ("documents",)),
    (_bpe_pair_counts, ("documents",)),
    (_word_freqitems, ("documents",)),
    (_substring_dedup, ("documents",)),
    (_pagerank, ("lineitem",)),
    (_upsert_merge, ("orders",)),
    (_pca_top_component, ("embeddings",)),
    (_knn_ivf_kmeans, ("embeddings",)),
    (_semdedup, ("embeddings",)),
    (_embedding_neardup, ("embeddings",)),
]


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fn,tabs", _CASES, ids=[f.__name__ for f, _ in _CASES])
def test_result_is_partitioning_invariant(spark, fn, tabs):
    base = load_tables(spark, SF_SMOKE)
    reference = _rows(fn(spark, base))
    assert reference  # non-degenerate

    # round-robin into a prime partition count
    scrambled = dict(base)
    for name in tabs:
        scrambled[name] = base[name].repartition(7)
    assert _rows(fn(spark, scrambled)) == reference

    # hash-partitioned on a column that is NOT the operator's key
    rekeyed = dict(base)
    for name in tabs:
        col = {"documents": "lang", "embeddings": "label",
               "lineitem": "l_suppkey", "orders": "o_orderpriority"}[name]
        rekeyed[name] = base[name].repartition(3, col)
    assert _rows(fn(spark, rekeyed)) == reference
