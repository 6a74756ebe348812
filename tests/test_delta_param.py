"""The incremental-dedup operators' PUBLIC shape (r14 verdict #7):
an arbitrary caller-supplied batch predicate, with the registry
entries pinning the mod-residue certification fixture.  Contract:
for ANY predicate, the delta output equals the full-corpus pair set
restricted to pairs touching the batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
    delta_batch_pairs,
    delta_embedding_pairs,
)
from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_doc_delta_accepts_any_batch_predicate(spark):
    t = {"documents": spark.read.parquet(f"{SF_SMOKE}/documents.parquet")}
    pred = F.col("doc_id") % 5 == 2  # NOT the certification fixture
    got = delta_batch_pairs(t, pred)
    full = REGISTRY["dedup_minhash_lsh"].build(spark, SF_SMOKE)
    want = full.filter(
        (F.col("doc_a") % 5 == 2) | (F.col("doc_b") % 5 == 2)
    )
    assert _rows(got) == _rows(want)
    assert _rows(got)  # non-vacuous: the batch has partners


def test_embedding_delta_accepts_any_batch_predicate(spark):
    t = {
        "documents": spark.read.parquet(f"{SF_SMOKE}/documents.parquet"),
        "embeddings": spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"),
    }
    # NOT the certification fixture; an odd modulus so planted pairs
    # (vec, vec + 1e6) land on both sides of the batch boundary
    pred = F.col("vec_id") % 3 == 0
    got = delta_embedding_pairs(spark, t, pred)
    full = REGISTRY["dedup_embedding_cosine"].build(spark, SF_SMOKE)
    want = full.filter((F.col("vec_a") % 3 == 0) | (F.col("vec_b") % 3 == 0))
    assert _rows(got) == _rows(want)
    assert _rows(got)
