"""Random-hyperplane LSH primitives shared by the similarity-search
and embedding-dedup operators.

Registry-free on purpose: ``operators/similarity.py`` and
``operators/dedup_fuzzy.py`` both need these, and each registers
queries at import time — a shared primitive module that itself
imported the registry would cycle.

The hyperplanes are generated in Python (LCG parity -> ±1) and
embedded as literal arrays in BOTH the Spark expression and the
DuckDB oracle, so cross-engine parity is by construction: both
engines left-fold the same doubles in the same order, hence agree on
every sign bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8


def _hyperplane_weight(j: int, d: int) -> float:
    v = (1103515245 * (j * 97 + d) + 12345) % 2147483647
    return 1.0 if v % 2 == 0 else -1.0


HYPERPLANES = [
    [_hyperplane_weight(j, d) for d in range(DIM)] for j in range(N_PLANES)
]

# --- shared expression text (Spark SQL and DuckDB agree on these) -----------

DOT_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)
DOT_D = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),"
    " (acc, x) -> acc + x)"
)


def _plane_lit_spark(j: int) -> str:
    return "array(" + ", ".join(f"{w}D" for w in HYPERPLANES[j]) + ")"


def _plane_lit_duck(j: int) -> str:
    return "[" + ", ".join(str(w) for w in HYPERPLANES[j]) + "]"


def bucket_expr_spark(vec: str) -> F.Column:
    """256-bucket hyperplane LSH key as a flat codegen expression."""
    bits = [
        f"(CASE WHEN {DOT_S.format(a=vec, b=_plane_lit_spark(j))} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    ]
    return F.expr("(" + " + ".join(bits) + ")").cast("int")


def bucket_expr_duck(vec: str) -> str:
    bits = [
        f"(CASE WHEN {DOT_D.format(a=vec, b=_plane_lit_duck(j))} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    ]
    return "CAST((" + " + ".join(bits) + ") AS INTEGER)"


# --- banded blocking over the bucket bits -----------------------------------
# The 8 sign bits split into N_BANDS bands of BAND_BITS bits.  Two
# vectors are join candidates when ANY band matches — multi-probe
# recall (miss probability (1-p^2)^4 for per-bit agreement p) instead
# of the single-bucket p^8.  Used by dedup_embedding_cosine's blocking
# key; the exact cosine verification after the join keeps emitted
# pairs engine-identical.

N_BANDS, BAND_BITS = 4, 2


def band_key_spark(bucket_col: str, b: int) -> F.Column:
    return F.expr(f"({bucket_col} div {1 << (BAND_BITS * b)}) % {1 << BAND_BITS}")


def band_key_duck(bucket_expr: str, b: str) -> str:
    return (
        f"(({bucket_expr}) // CAST(pow(2, {BAND_BITS} * {b}) AS INTEGER))"
        f" % {1 << BAND_BITS}"
    )


def broadcast_if_small(df: DataFrame, est_rows: int, row_bytes: int) -> DataFrame:
    """Gate an explicit broadcast hint on an actual size estimate.

    A corpus-proportional side must NOT carry an unconditional
    ``F.broadcast`` — at 100x data the hint forces an executor OOM
    where AQE would have degraded to a shuffle join.  Below the
    (conservative, driver-memory-safe) threshold the hint is free win;
    above it the planner decides.
    """
    return F.broadcast(df) if est_rows * row_bytes < 8_000_000 else df
