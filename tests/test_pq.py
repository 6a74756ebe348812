"""Product-quantization semantics that corpus parity can't isolate:
seed self-encoding, code-key positional folding, and ADC ranking of an
exact duplicate.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from transitdata_omm_cancellation_source_spark.operators.pq import (
    DSUB,
    K_CODES,
    M_SUB,
    _knn_pq,
    _pq_codes,
)
from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY
from transitdata_omm_cancellation_source_spark.testing import compare_frames


def _vec(seed: int) -> list[float]:
    # distinct, well-separated deterministic vectors; the modulus must
    # exceed K_CODES=16, else seeds i and i+mod are identical vectors
    # (a 13-period generator made seed 13 duplicate seed 0, and the
    # engine — correctly — ranked it as a tied exact duplicate).
    return [
        round(((seed * 31 + d * 7) % 17 - 8) / 8.0, 3)
        for d in range(M_SUB * DSUB)
    ]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_seed_duplicate_gets_seed_codes_and_matches_oracle(spark):
    # vec_ids 0..15 are the codebook seeds; 100 duplicates seed 3, so
    # its nearest centroid in EVERY subspace is code 3 (distance 0).
    rows = [(i, _vec(i)) for i in range(K_CODES)] + [(100, _vec(3))]
    emb = _emb(spark, rows)
    out = {r.vec_id: r for r in _pq_codes(spark, {"embeddings": emb}).collect()}
    expect_key = sum(3 * K_CODES**s for s in range(M_SUB))
    assert out[3].code_key == expect_key
    assert out[100].code_key == expect_key
    assert out[100].n_sub == M_SUB and out[100].code_sum == 3 * M_SUB

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            [(i, v, 0) for i, v in rows],
            columns=["vec_id", "embedding", "label"],
        ),
    )
    oracle = con.execute(REGISTRY["embedding_pq_codes"].oracle).df()
    con.close()
    assert compare_frames(
        _pq_codes(spark, {"embeddings": emb}).toPandas(), oracle
    ) == []


def test_adc_ranks_exact_duplicate_first(spark):
    # query 0 (vec_id 0 is both a seed and a query: 0 % QUERY_MOD == 0)
    # has an exact duplicate at vec_id 17 — identical vector => same
    # LSH bucket, and the maximal ADC score, so it must be rank 1.
    rows = [(i, _vec(i)) for i in range(K_CODES)] + [
        (17, _vec(0)),
        (18, _vec(7)),
    ]
    emb = _emb(spark, rows)
    out = _knn_pq(spark, {"embeddings": emb}).collect()
    top = {
        r.query_id: r.neighbor_id for r in out if r.rank == 1
    }
    assert top[0] == 17
