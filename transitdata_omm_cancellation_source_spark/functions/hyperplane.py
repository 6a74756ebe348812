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

#: Headroom for the corpus-scaled bucket: up to 2^16 buckets (√N grid
#: saturates there at N = 2^32 vectors — beyond that, widen).
MAX_PLANES = 16

#: Historical: the L-band near-dup blocking this constant sized is
#: gone (r10 replaced the banded candidate joins with per-block kernel
#: scans), but the plane table keeps its original 8-family extent so
#: every plane index — and therefore every committed oracle hash —
#: stays byte-identical; only the first MAX_PLANES planes are consumed
#: (bucket keys for the LSH searches).
N_BAND_FAMILIES = 8


def _hyperplane_weight(j: int, d: int) -> float:
    v = (1103515245 * (j * 97 + d) + 12345) % 2147483647
    return 1.0 if v % 2 == 0 else -1.0


HYPERPLANES = [
    [_hyperplane_weight(j, d) for d in range(DIM)]
    for j in range(MAX_PLANES * N_BAND_FAMILIES)
]


def sqrt_pow2(n: int, lo_bits: int = 2, hi_bits: int = MAX_PLANES) -> int:
    """#buckets/#cells grid: the largest power of two ``p`` with
    ``p*p <= n``, clamped to [2^lo_bits, 2^hi_bits].

    The Faiss guideline for a coarse quantizer is #cells ∝ √N — it
    balances the N x #cells assignment term against the N²/#cells
    candidate term.  Snapping to powers of two keeps the value stable
    under small corpus drift and lets the LSH paths realize it as a
    plane-count (bucket = low log2(p) sign bits).  EXACT integer
    arithmetic so the DuckDB mirror (``pow2_grid_cte``) can never
    disagree on the grid point.
    """
    nb = 1 << lo_bits
    for g in range(lo_bits, hi_bits + 1):
        if (1 << g) * (1 << g) <= n:
            nb = 1 << g
    return nb


def pow2_grid_cte(alias: str, lo_bits: int = 2, hi_bits: int = MAX_PLANES,
                  count_from: str = "embeddings") -> str:
    """DuckDB CTE computing the same grid point as ``sqrt_pow2`` from
    the table's own count — pure integer compares, no float log/pow,
    so both engines land on the identical power of two."""
    return f"""
    {alias} AS (
        SELECT max(CASE WHEN (CAST(1 AS BIGINT) << g) * (CAST(1 AS BIGINT) << g)
                             <= n.n
                        THEN CAST(1 AS BIGINT) << g
                        ELSE {1 << lo_bits} END) AS nb
        FROM (SELECT unnest(range({lo_bits}, {hi_bits + 1})) AS g) g,
             (SELECT count(*) AS n FROM {count_from}) n
    )"""

# --- shared expression text (Spark SQL and DuckDB agree on these) -----------

DOT_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)

#: Spark SQL spellings of the exact-integer contract (IDOT_D / MICRO_D
#: below): BIGINT folds over micro-unit arrays — order-independent by
#: integer associativity, identical to the DuckDB forms term by term.
IDOT_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)
MICRO_S = (
    "transform({v}, x -> CAST(floor(CAST(x AS DOUBLE)"
    " * 1000000.0 + 0.5) AS BIGINT))"
)
DOT_D = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),"
    " (acc, x) -> acc + x)"
)

#: Exact integer dot product over micro-unit BIGINT arrays (DuckDB
#: spelling) — order-independent by integer associativity, so it can be
#: mirrored by a vectorized float64 matmul whose intermediates stay
#: exact integers (see similarity.assign_to_centroids).
IDOT_D = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(list_zip({a}, {b}),"
    " z -> CAST(z[1] AS BIGINT) * CAST(z[2] AS BIGINT))),"
    " (acc, x) -> acc + x)"
)

#: one-shot micro-unit quantization (DuckDB spelling) shared by the
#: integer-assignment paths.
MICRO_D = (
    "list_transform({v}, x -> CAST(floor(CAST(x AS DOUBLE)"
    " * 1000000.0 + 0.5) AS BIGINT))"
)


def _plane_lit_spark(j: int) -> str:
    return "array(" + ", ".join(f"{w}D" for w in HYPERPLANES[j]) + ")"


def _plane_lit_duck(j: int) -> str:
    return "[" + ", ".join(str(w) for w in HYPERPLANES[j]) + "]"


# --- corpus-scaled bucket (#buckets = sqrt_pow2(N)) --------------------------
# The Spark side computes exactly log2(nb) sign bits once ``nb`` is
# known (a cached corpus count); the oracle side is a STATIC string, so
# it computes the full MAX_PLANES-bit key and masks with ``% nb`` from a
# ``pow2_grid_cte`` params row — low bits are planes 0..P-1, so the two
# forms are value-identical by construction.


def scaled_bucket_expr_spark(vec: str, nb: int) -> F.Column:
    p = nb.bit_length() - 1
    bits = [
        f"(CASE WHEN {DOT_S.format(a=vec, b=_plane_lit_spark(j))} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(p)
    ]
    return F.expr("(" + " + ".join(bits) + ")").cast("int")


def full_bucket_expr_duck(vec: str) -> str:
    """All MAX_PLANES sign bits; callers apply ``% nb`` to mask down to
    the corpus-scaled bucket width."""
    bits = [
        f"(CASE WHEN {DOT_D.format(a=vec, b=_plane_lit_duck(j))} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(MAX_PLANES)
    ]
    return "CAST((" + " + ".join(bits) + ") AS INTEGER)"


def broadcast_if_small(df: DataFrame, est_rows: int, row_bytes: int) -> DataFrame:
    """Gate an explicit broadcast hint on an actual size estimate.

    A corpus-proportional side must NOT carry an unconditional
    ``F.broadcast`` — at 100x data the hint forces an executor OOM
    where AQE would have degraded to a shuffle join.  Below the
    (conservative, driver-memory-safe) threshold the hint is free win;
    above it the planner decides.
    """
    return F.broadcast(df) if est_rows * row_bytes < 8_000_000 else df


def exact_idot_matmul(Uq, Um):
    """Exact integer dot-product matrix for two int64 micro-unit
    arrays, returned as float64 holding EXACT integer values.

    Fast path: when every product and every DIM-term partial sum fits
    the 2^53 exact-integer float64 headroom (|u| <= ~1.18e6 at
    DIM=64 — true for any |v| <= ~1.1 corpus, i.e. normalized
    embeddings), the matmul runs in float64 BLAS: float64 arithmetic
    on integers below 2^53 is exact and summation-order-independent,
    so the result is bit-identical to the BIGINT fold at 10-100x the
    speed of numpy's integer matmul loop (the semdedup scan measured
    minutes vs seconds at sf25 on this difference alone).  Wider
    magnitudes fall back to the exact int64 matmul up to the 2^62
    wrap guard; beyond that we raise — the oracle's BIGINT fold
    errors there, a silent numpy wrap must never outlive it.
    """
    import numpy as np

    dim = Um.shape[1]
    # Python int, NOT an int64 scalar: umax^2 * dim itself can exceed
    # 2^63 (e.g. |u| = 2^29 at DIM = 64 -> 2^64), and an int64 guard
    # would wrap to a small number and silently take the fast path on
    # exactly the inputs it exists to reject.
    umax = int(max(np.abs(Um).max(initial=0), np.abs(Uq).max(initial=0)))
    if umax * umax * dim < 2.0**53:
        return Uq.astype(np.float64) @ Um.astype(np.float64).T
    if umax * umax * dim >= 2**62:
        raise ValueError(
            "exact_idot_matmul: |u|^2 * DIM exceeds int64 headroom;"
            " the kernel would wrap where the BIGINT oracle errors"
        )
    return (Uq @ Um.T).astype(np.float64)
