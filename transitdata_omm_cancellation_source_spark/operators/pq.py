"""Product quantization (PQ): subspace codebooks + asymmetric distance.

The third leg of the embedding-compression story (after int8 scalar
quantization and the integer-LSH search on its codes): split the
64-dim vector into M=8 subspaces of 8 dims, quantize each subvector
to its nearest of K=16 codebook centroids, and search with ADC
(asymmetric distance computation) — the query stays exact, each
candidate contributes only M table lookups into a per-query
[M x K] squared-L2 LUT.  A PQ code is M * log2(K) = 32 bits per
vector: 64x smaller than the float corpus, the representation that
makes billion-scale ANN indexes fit in memory (Jégou et al., TPAMI
2011 — public method).

Determinism discipline:
- The codebook is the subvector set of the 16 smallest ``vec_id``
  seeds — a deterministic, engine-independent sample (TakeOrdered 16,
  never a random init).
- Encode argmin compares IEEE-identical distance folds (same
  expression text both engines) with an explicit code tie-break.
- The ADC LUT is quantized to fixed-point BIGINT micro-units at
  build, so candidate scores are exact integer sums — ranking never
  compares floats.

Scale notes (100 TB): the codebook (128 rows) and the per-query LUT
(|queries| x 128) are fixed-size broadcasts; encode is corpus x M x K
rows through one argmin aggregation (map-side combinable); search is
the same hyperplane-bucket equi-join as the LSH/int8 paths, with the
ADC sum grouped per candidate pair — no all-pairs stage anywhere.

The reference has no similarity search (it is a cancellation ETL);
this module is north-star surface per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hyperplane import bucket_expr_duck, bucket_expr_spark
from ..plans.queries import registered_query as _q
from .similarity import QUERY_MOD, TOP_K

#: M subspaces x DSUB dims each (M * DSUB = 64); K centroids per
#: subspace -> 4-bit codes, 32 bits per vector.
M_SUB, DSUB, K_CODES = 8, 8, 16

#: fixed-point scale for the ADC lookup table.
_LUT_SCALE = 1_000_000

#: squared-L2 fold between a subvector and a centroid — identical
#: expression text on both engines (same zip, same fold order).
_L2_S = (
    "aggregate(zip_with({a}, {b}, (x, c) -> (x - c) * (x - c)),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)
_L2_D = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}),"
    " z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))"
    " * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))),"
    " (acc, x) -> acc + x)"
)
# ADC is the classic L2 form: each candidate's distance is the sum of
# its M subspace ||query_sub - centroid||² LUT entries (Jégou et al.).
# A dot-product LUT would NOT rank an exact duplicate first — another
# centroid can reconstruct a larger inner product than the duplicate's
# own (distance-0) centroid; squared-L2 is uniquely minimized at 0.


def _vectors(t) -> DataFrame:
    return t["embeddings"].select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
    )


def _centroids(vecs: DataFrame) -> DataFrame:
    """[M x K] codebook: subvectors of the 16 smallest-vec_id seeds."""
    seeds = vecs.orderBy("vec_id").limit(K_CODES)
    w = Window.orderBy("vec_id")
    coded = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("code"), "v"
    )
    return coded.select(
        "code",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {M_SUB - 1}),"
                f" s -> slice(v, s * {DSUB} + 1, {DSUB}))"
            )
        ).alias("sub", "c"),
    ).select(F.col("sub").cast("int").alias("sub"), "code", "c")


def _subvectors(vecs: DataFrame) -> DataFrame:
    return vecs.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {M_SUB - 1}),"
                f" s -> slice(v, s * {DSUB} + 1, {DSUB}))"
            )
        ).alias("sub", "sv"),
    ).select("vec_id", F.col("sub").cast("int").alias("sub"), "sv")


def _encode(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, sub, code): nearest-centroid assignment per subspace.

    corpus x M x K distance rows flow into ONE map-side-combinable
    argmin aggregation; the codebook side is a 128-row broadcast.  The
    argmin is min(struct(dist, code)) — IEEE-identical dists with the
    code as the deterministic tie-break.
    """
    dists = _subvectors(vecs).join(F.broadcast(cent), "sub").select(
        "vec_id",
        "sub",
        "code",
        F.expr(_L2_S.format(a="sv", b="c")).alias("dist"),
    )
    return dists.groupBy("vec_id", "sub").agg(
        F.min(F.struct("dist", "code")).getField("code").alias("code")
    )


_SEED_CTE = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                   AS code, v
        FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {K_CODES})
    ),
    subs AS (SELECT CAST(unnest(range(0, {M_SUB})) AS INTEGER) AS sub),
    cent AS (
        SELECT s.sub, seeds.code,
               list_slice(seeds.v, s.sub * {DSUB} + 1, s.sub * {DSUB} + {DSUB})
                   AS c
        FROM seeds, subs s
    ),
    corpus_sub AS (
        SELECT vec_id, s.sub,
               list_slice(v.v, s.sub * {DSUB} + 1, s.sub * {DSUB} + {DSUB})
                   AS sv
        FROM v, subs s
    ),
    codes AS (
        SELECT vec_id, sub, code FROM (
            SELECT cs.vec_id, cs.sub, ct.code,
                   row_number() OVER (
                       PARTITION BY cs.vec_id, cs.sub
                       ORDER BY {_L2_D.format(a="cs.sv", b="ct.c")}, ct.code)
                       AS rn
            FROM corpus_sub cs JOIN cent ct ON ct.sub = cs.sub
        ) WHERE rn = 1
    )
"""


@_q(
    "embedding_pq_codes",
    "north-star: product-quantization encode — [8x16] seed codebook, "
    "per-subspace argmin, 32-bit codes (positional-key checksummed)",
    f"""
    WITH {_SEED_CTE}
    SELECT vec_id, CAST(count(*) AS INTEGER) AS n_sub,
           CAST(sum(code) AS BIGINT) AS code_sum,
           CAST(sum(code * CAST(pow({K_CODES}, sub) AS BIGINT)) AS BIGINT)
               AS code_key
    FROM codes GROUP BY vec_id
    """,
)
def _pq_codes(spark, t):
    # code_key folds the M codes positionally (base-K), so it fully
    # determines the code vector — the oracle pins every assignment
    # without hashing arrays; code_sum is the cheap cross-check.
    vecs = _vectors(t)
    codes = _encode(vecs, _centroids(vecs))
    return codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_sub"),
        F.sum("code").cast("bigint").alias("code_sum"),
        F.sum(
            F.expr(f"code * CAST(pow({K_CODES}, sub) AS BIGINT)")
        ).cast("bigint").alias("code_key"),
    )


@_q(
    "knn_pq_adc",
    "north-star: PQ asymmetric-distance search — per-query integer LUT, "
    "hyperplane-bucket candidates, exact fixed-point ranking",
    f"""
    WITH {_SEED_CTE},
    qs AS (
        SELECT vec_id, v, {bucket_expr_duck("v")} AS bucket
        FROM v WHERE vec_id % {QUERY_MOD} = 0
    ),
    corpus_b AS (
        SELECT vec_id, {bucket_expr_duck("v")} AS bucket FROM v
    ),
    lut AS (
        SELECT q.vec_id AS query_id, ct.sub, ct.code,
               CAST(floor({_L2_D.format(
                   a=f"list_slice(q.v, ct.sub * {DSUB} + 1,"
                     f" ct.sub * {DSUB} + {DSUB})",
                   b="ct.c",
               )} * {_LUT_SCALE}.0 + 0.5) AS BIGINT) AS qd
        FROM qs q, cent ct
    ),
    cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM qs q JOIN corpus_b c
          ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    ),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id, CAST(sum(l.qd) AS BIGINT) AS s
        FROM cand
        JOIN codes k ON k.vec_id = cand.neighbor_id
        JOIN lut l ON l.query_id = cand.query_id
                  AND l.sub = k.sub AND l.code = k.code
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank,
           round(CAST(s AS DOUBLE) / {_LUT_SCALE}.0, 6) AS adc_dist2
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY s ASC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def _knn_pq(spark, t):
    # Approximate by design on two axes, both documented: candidate
    # recall is the hyperplane bucket's (same contract as the LSH and
    # int8 paths), and scores are the PQ reconstruction of the dot
    # product (centroid-dot-query instead of vector-dot-query).
    # Ranking compares exact BIGINT LUT sums — no float ordering.
    vecs = _vectors(t)
    cent = _centroids(vecs)
    codes = _encode(vecs, cent)
    bucketed = vecs.select(
        "vec_id", bucket_expr_spark("v").alias("bucket")
    )
    qs = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        "v",
        bucket_expr_spark("v").alias("bucket"),
    )
    lut = (
        _subvectors(
            qs.select(F.col("query_id").alias("vec_id"), "v")
        )
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(cent), "sub")
        .select(
            "query_id",
            "sub",
            "code",
            F.expr(
                f"CAST(floor({_L2_S.format(a='sv', b='c')}"
                f" * {_LUT_SCALE}.0 + 0.5) AS BIGINT)"
            ).alias("qd"),
        )
    )
    cand = (
        qs.select("query_id", "bucket")
        .join(bucketed, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # NOTE: lut is |queries| x 128 rows — query-cardinality, hence
    # corpus-proportional at fixed QUERY_MOD — so it carries NO forced
    # broadcast hint (size-based selection broadcasts it while small,
    # AQE degrades to shuffle when it isn't); only the fixed 128-row
    # codebook is hint-broadcast.
    scored = (
        cand.join(codes, codes["vec_id"] == cand["neighbor_id"])
        .join(lut, ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").cast("bigint").alias("s"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("int").alias("rank"),
            F.round(F.col("s").cast("double") / F.lit(float(_LUT_SCALE)), 6).alias(
                "adc_dist2"
            ),
        )
    )
