"""North-star similarity search over the ``embeddings`` table.

Three operators, baseline -> scale path:

- brute-force:  broadcast the (small) query set against the full
                corpus, exact cosine, per-query top-k via window.
                O(|Q| * N) — the correctness baseline and the right
                plan whenever |Q| is broadcast-sized.
- LSH buckets:  8 deterministic random-hyperplane sign bits -> 256
                buckets; search only the query's bucket (single
                probe).  Candidate generation becomes an equi-join on
                the bucket key — partition-prunable and shuffle-
                bounded at 100 TB.  Approximate by design: recall
                loss is the documented trade.
- IVF by label: the `label` column plays the coarse quantizer role of
                an IVF index (cells = labels); search is confined to
                the query's cell via an equi-join.  Same plan shape
                as a trained k-means IVF — only the assignment
                differs.

The hyperplanes are generated in Python (LCG parity -> ±1) and
embedded as literal arrays in BOTH the Spark expression and the
DuckDB oracle, so parity is by construction.  Cosine ranking happens
on raw doubles (identical left-fold order in both engines); only the
emitted value is rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..plans.queries import QuerySpec, register

DIM = 64
N_PLANES = 8
TOP_K = 5
QUERY_MOD = 50  # vec_id % 50 == 0 -> deterministic query set (~2% of corpus)


def _hyperplane_weight(j: int, d: int) -> float:
    v = (1103515245 * (j * 97 + d) + 12345) % 2147483647
    return 1.0 if v % 2 == 0 else -1.0


HYPERPLANES = [
    [_hyperplane_weight(j, d) for d in range(DIM)] for j in range(N_PLANES)
]

# --- shared expression text (Spark SQL and DuckDB agree on these) -----------

_DOT_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)
_DOT_D = (
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
        f"(CASE WHEN {_DOT_S.format(a=vec, b=_plane_lit_spark(j))} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    ]
    return F.expr("(" + " + ".join(bits) + ")").cast("int")


def bucket_expr_duck(vec: str) -> str:
    bits = [
        f"(CASE WHEN {_DOT_D.format(a=vec, b=_plane_lit_duck(j))} > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    ]
    return "CAST((" + " + ".join(bits) + ") AS INTEGER)"


def _q(name: str, survey_ref: str, oracle: str | None):
    def deco(fn):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            tables = load_tables(spark, sf_dir)
            return fn(spark, tables)

        register(name, QuerySpec(build=build, oracle=oracle, survey_ref=survey_ref))
        return fn

    return deco


def _vectors(t) -> DataFrame:
    # squared norm computed once per vector; every pair then needs a
    # single dot product (sqrt(q.n2*c.n2) equals the oracle's per-pair
    # norm arithmetic exactly).
    return t["embeddings"].select(
        "vec_id", "label", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
    ).withColumn("n2", F.expr(_DOT_S.format(a="v", b="v")))


def _cos_s() -> F.Column:
    # built lazily: module import must not touch the SparkContext
    # (Python workers re-import this module when unpickling UDFs).
    return F.expr(f"{_DOT_S.format(a='q.v', b='c.v')} / sqrt(q.n2 * c.n2)")


def _topk(scored: DataFrame) -> DataFrame:
    """Per-query top-k with a deterministic tie-break (id asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cosine"),
        )
    )


_COS_D = (
    f"{_DOT_D.format(a='q.v', b='c.v')}"
    f" / sqrt({_DOT_D.format(a='q.v', b='q.v')} * {_DOT_D.format(a='c.v', b='c.v')})"
)

_ORACLE_TAIL = f"""
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           round(cos, 6) AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= {TOP_K}
"""

_VEC_CTE = """
    v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id % {mod} = 0)
""".format(mod=QUERY_MOD)


@_q(
    "knn_bruteforce_cosine",
    "north-star: exact cosine top-k (broadcast query set x full corpus)",
    f"""
    WITH {_VEC_CTE},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_D} AS cos
        FROM q JOIN v c ON c.vec_id <> q.vec_id
    )
    {_ORACLE_TAIL}
    """,
)
def _knn_bruteforce(spark, t):
    vecs = _vectors(t)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0)
    scored = (
        F.broadcast(q.alias("q"))
        .join(vecs.alias("c"), F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cos_s().alias("cos"),
        )
    )
    return _topk(scored)


@_q(
    "knn_lsh_hyperplane",
    "north-star: ANN via 8-bit random-hyperplane LSH bucket join (single probe)",
    f"""
    WITH {_VEC_CTE},
    vb AS (SELECT *, {bucket_expr_duck('v')} AS bucket FROM v),
    qb AS (SELECT *, {bucket_expr_duck('v')} AS bucket FROM q),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_D} AS cos
        FROM qb q JOIN vb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    )
    {_ORACLE_TAIL}
    """,
)
def _knn_lsh(spark, t):
    vecs = _vectors(t).withColumn("bucket", bucket_expr_spark("v"))
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0)
    scored = (
        F.broadcast(q.alias("q"))
        .join(
            vecs.alias("c"),
            (F.col("c.bucket") == F.col("q.bucket"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cos_s().alias("cos"),
        )
    )
    return _topk(scored)


def _centroid_pdf(pdf):
    """Grouped-map kernel: per-label centroid with a deterministic
    left-fold sum (rows sorted by vec_id, sequential accumulation) so
    the double arithmetic matches the oracle's ordered list_reduce
    bit-for-bit.  numpy's pairwise summation would NOT."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    acc = np.zeros(mat.shape[1], dtype=np.float64)
    for row in mat:
        acc = acc + row
    n = mat.shape[0]
    return pd.DataFrame(
        {
            "label": pdf["label"].iloc[0],
            "dim": range(mat.shape[1]),
            "centroid": [round(v / n, 6) for v in acc],
            "n_vecs": n,
        }
    )


@_q(
    "embedding_label_centroid",
    "north-star: applyInPandas grouped-map aggregation (per-label centroid)",
    f"""
    SELECT label, CAST(j AS INTEGER) AS dim,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list(CAST(embedding[j + 1] AS DOUBLE) ORDER BY vec_id)),
                 (a, x) -> a + x) / count(*), 6) AS centroid,
           count(*) AS n_vecs
    FROM embeddings, (SELECT unnest(range(0, {DIM})) AS j)
    GROUP BY label, j
    """,
)
def _label_centroid(spark, t):
    return t["embeddings"].groupBy("label").applyInPandas(
        _centroid_pdf, "label int, dim int, centroid double, n_vecs long"
    )


@_q(
    "knn_ivf_label",
    "north-star: IVF-style cell-restricted search (label as coarse quantizer)",
    f"""
    WITH {_VEC_CTE},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_D} AS cos
        FROM q JOIN v c ON c.label = q.label AND c.vec_id <> q.vec_id
    )
    {_ORACLE_TAIL}
    """,
)
def _knn_ivf(spark, t):
    vecs = _vectors(t)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0)
    scored = (
        F.broadcast(q.alias("q"))
        .join(
            vecs.alias("c"),
            (F.col("c.label") == F.col("q.label"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _cos_s().alias("cos"),
        )
    )
    return _topk(scored)
