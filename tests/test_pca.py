"""Semantic pins for the PCA operator (oracle parity is covered by
test_oracle_parity; these assert the spectral properties parity alone
can't see)."""

from __future__ import annotations

import numpy as np

from transitdata_omm_cancellation_source_spark.operators.pca import (
    PCA_SQUARINGS,
    _X0,
)
from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def _reference(emb: np.ndarray):
    """Reimplement the operator's arithmetic (same quantization, same
    fold orders, same per-level rescale+round) in plain Python."""
    u = np.floor(emb * 1e6 + 0.5)
    n = u.shape[0]
    cov = np.round(
        (u.T @ u / n - np.outer(u.sum(0) / n, u.sum(0) / n)) / 1e12, 9
    )

    def fold_mm(a, b):
        out = np.empty((64, 64))
        for i in range(64):
            for j in range(64):
                acc = 0.0
                for k in range(64):  # the k-ordered left fold
                    acc += a[i, k] * b[k, j]
                out[i, j] = acc
        return out

    m = cov.copy()
    for _ in range(PCA_SQUARINGS):
        raw = fold_mm(m, m)
        m = np.round(raw / np.max(np.abs(raw)), 12)
    y = np.empty(64)
    for i in range(64):
        acc = 0.0
        for k in range(64):
            acc += m[i, k] * _X0
        y[i] = acc
    acc = 0.0
    for j in range(64):
        acc += y[j] * y[j]
    x = np.round(y / np.sqrt(acc), 9)
    ry = np.empty(64)
    for i in range(64):
        acc = 0.0
        for k in range(64):
            acc += cov[i, k] * x[k]
        ry[i] = acc
    acc = 0.0
    for j in range(64):
        acc += ry[j] * ry[j]
    return cov, x, float(np.sqrt(acc))


def test_pca_matches_reference_iteration_and_spectrum(spark):
    out = REGISTRY["embedding_pca_top_component"].build(spark, SF_SMOKE).collect()
    assert len(out) == 64
    x = np.array([r.component for r in sorted(out, key=lambda r: r.dim)])
    lam = out[0].eigenvalue
    assert all(abs(r.eigenvalue - lam) < 1e-12 for r in out)

    emb = np.stack(
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    cov, x_ref, lam_ref = _reference(emb)
    # the emitted iterate IS the deterministic reference computation
    # (tolerance covers numpy-vs-engine decimal rounding at near-ties)
    assert np.max(np.abs(x - x_ref)) < 1e-8, np.max(np.abs(x - x_ref))
    assert abs(lam - round(lam_ref, 6)) < 1e-6

    # spectral quality: unit norm, tight alignment with the TRUE top
    # eigenvector (effective exponent 2^PCA_SQUARINGS crushes the flat
    # eigengap), Rayleigh estimate within 0.5% of the true top
    # eigenvalue.
    w, v = np.linalg.eigh(cov)
    top = v[:, -1] * np.sign(float(v[:, -1] @ x) or 1.0)
    assert abs(float(np.linalg.norm(x)) - 1.0) < 1e-6
    assert float(x @ top) > 0.99, float(x @ top)
    assert abs(lam - w[-1]) / w[-1] < 0.005, (lam, w[-1])


def test_moment_rollup_exact_past_int64(spark):
    """The DECIMAL(38,0) moment rollup stays exact where a BIGINT sum
    would silently wrap: synthetic micro-unit coordinates near the
    per-row product bound push the C_jk partials past 2^63 within a
    handful of rows.  Pins the rollup arithmetic against Python's
    arbitrary-precision integers (no doubles anywhere)."""
    from pyspark.sql import functions as F

    # |u| = 2e9 (allowed: < _U_PRODUCT_BOUND ~ 3.037e9); per-row
    # product 4e18 < 2^63-1 ~ 9.22e18, but 3 rows already wrap.
    us = [
        [2_000_000_000, -1_999_999_999],
        [1_999_999_997, 1_999_999_993],
        [-1_999_999_987, 1_999_999_983],
        [1_999_999_979, -1_999_999_973],
        [1_999_999_967, 1_999_999_961],
    ]
    exact = {
        (j, k): sum(row[j] * row[k] for row in us)
        for j in range(2)
        for k in range(2)
        if j <= k
    }
    assert any(abs(v) > 2**63 for v in exact.values()), "fixture too small"
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(us)], "vec_id int, u array<bigint>"
    )
    mom = (
        df.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, 1), j ->"
                    " transform(sequence(j, 1), k ->"
                    " named_struct('j', j, 'k', k,"
                    " 'p', element_at(u, j + 1) * element_at(u, k + 1)))))"
                )
            ).alias("e")
        )
        .groupBy(F.col("e.j").alias("j"), F.col("e.k").alias("k"))
        .agg(F.sum(F.col("e.p").cast("decimal(38,0)")).alias("c"))
        .collect()
    )
    got = {(r["j"], r["k"]): int(r["c"]) for r in mom}
    assert got == exact, (got, exact)


def test_max_abs_u_selects_decimal_fallback(spark):
    """Coordinates past the per-row BIGINT product bound now SELECT the
    DECIMAL(19,0)-product path instead of refusing (r10 verdict #6).
    The fallback's moments are pinned against Python's
    arbitrary-precision integers, and the full query completes on an
    extreme-|u| corpus with a unit-norm component."""
    import math

    import numpy as np

    from transitdata_omm_cancellation_source_spark.operators import pca as _pca

    # |u| ~ 4e9 > _U_PRODUCT_BOUND ~ 3.037e9: every per-row product
    # (~1.6e19) exceeds int64 — the fast path would wrap on ROW ONE.
    rng = np.random.default_rng(7)
    vecs = [
        [float(4000 + int(rng.integers(0, 500))) for _ in range(64)]
        for _ in range(5)
    ]
    emb = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id int, embedding array<double>"
    )
    max_u = _pca.corpus_max_abs_u(spark, emb)
    assert max_u > _pca._U_PRODUCT_BOUND

    # the wide path's exact integer moments == Python int arithmetic
    us = [[math.floor(x * 1_000_000 + 0.5) for x in v] for v in vecs]
    expect_c = {
        (j, k): sum(row[j] * row[k] for row in us)
        for j in range(64)
        for k in range(j, 64)
    }
    expect_s = {j: sum(row[j] for row in us) for j in range(64)}
    assert all(abs(v) > 2**63 for v in expect_c.values()), "fixture too small"
    rows = _pca._moment_rows(spark, emb, wide_products=True)
    got_c = {(r["j"], r["k"]): int(r["c"]) for r in rows if r["k"] >= 0}
    got_s = {r["j"]: int(r["c"]) for r in rows if r["k"] == -1}
    assert got_c == expect_c
    assert got_s == expect_s

    # the full query runs end-to-end on the extreme corpus
    out = _pca._pca_top_component(spark, {"embeddings": emb}).collect()
    assert len(out) == 64
    nrm = sum(r["component"] ** 2 for r in out) ** 0.5
    assert abs(nrm - 1.0) < 1e-6


def test_wide_product_path_is_oracle_certifiable(spark, tmp_path):
    """The DECIMAL(19,0) wide-product path must be certifiable by the
    SAME DuckDB gate as the fast path (r11 ADVICE, medium): the
    oracle's per-row products now cast to HUGEINT, because a BIGINT
    product overflows DuckDB past |u| ~ 3.037e9 — exactly the corpora
    that select the engine's wide path — which previously made the
    oracle ERROR where the engine succeeds (parity uncertifiable)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from transitdata_omm_cancellation_source_spark.catalog import TABLE_NAMES
    from transitdata_omm_cancellation_source_spark.operators import pca as _pca
    from transitdata_omm_cancellation_source_spark.plans.queries import (
        REGISTRY,
    )
    from transitdata_omm_cancellation_source_spark.testing import (
        assert_oracle_parity,
    )

    from conftest import SF_SMOKE

    # a full sf_dir: the wide corpus as embeddings, every other table
    # symlinked from the smoke fixture (the harness registers all of
    # them as views up front).
    for name in TABLE_NAMES:
        if name != "embeddings":
            os.symlink(
                f"{SF_SMOKE}/{name}.parquet", tmp_path / f"{name}.parquet"
            )
    rng = np.random.default_rng(11)
    vecs = [
        [float(4000 + int(rng.integers(0, 500))) for _ in range(64)]
        for _ in range(40)
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    spec = REGISTRY["embedding_pca_top_component"]
    df = spec.build(spark, str(tmp_path))
    # this corpus must actually select the wide path, or the test
    # certifies nothing
    emb = spark.read.parquet(str(tmp_path / "embeddings.parquet"))
    assert _pca.corpus_max_abs_u(spark, emb) > _pca._U_PRODUCT_BOUND
    assert_oracle_parity(df, spec.oracle, str(tmp_path))


def test_quantize_ceiling_still_fails_loud(spark):
    """The one remaining input-magnitude refusal: past |x·1e6| ~ 2^63
    the micro-unit BIGINT cast itself saturates silently (ANSI off),
    so the query raises BEFORE computing a single wrong moment.  The
    max|u| probe must see the true (pre-cast) magnitude — a saturated
    BIGINT probe would clamp below the bound and wave the corpus
    through."""
    import pytest as _pytest

    from transitdata_omm_cancellation_source_spark.operators import pca as _pca

    emb = spark.createDataFrame(
        [(0, [2.0e13] * 64)], "vec_id int, embedding array<double>"
    )
    assert _pca.corpus_max_abs_u(spark, emb) > _pca._U_QUANTIZE_BOUND
    with _pytest.raises(ValueError, match="saturate"):
        _pca._pca_top_component(spark, {"embeddings": emb})


def test_chain_matches_ferried_form(spark):
    """The r15 lazy single-row chain (``pca_square_and_project``) must
    produce the SAME DOUBLES as the r14 per-level collect/reship ferry
    it replaced: both run the identical engine ops (left-associative
    add chains, engine-side round(…/max, 12) rescale, round(…/nrm, 9)
    normalize, round(lam, 6)), so the comparison is exact ``==``, not
    approximate.  The reference below IS the retired r14 implementation
    verbatim (posexplode + window max + ordered-fold tail)."""
    import random

    from pyspark.sql import Window

    from transitdata_omm_cancellation_source_spark.operators import pca as _pca

    DIM = _pca.DIM
    # deterministic symmetric fixture in the post-rescale range
    # ([-1, 1], 12 decimal places) every squaring level inhabits
    rng = random.Random(0x5EED)
    mat0 = [[0.0] * DIM for _ in range(DIM)]
    for j in range(DIM):
        for k in range(j, DIM):
            v = round(rng.uniform(-1.0, 1.0), 12)
            mat0[j][k] = v
            mat0[k][j] = v

    F = _pca.F

    def ferried(mat):
        _fold_chain = "CAST(0.0 AS DOUBLE)" + "".join(
            f" + av[{i}] * bv[{i}]" for i in range(DIM)
        )
        w_all = Window.partitionBy()

        def _reshape(rows):
            grid = {(r["j"], r["k"]): r[-1] for r in rows}
            return [[grid[(j, k)] for k in range(DIM)] for j in range(DIM)]

        cov_mat = mat
        for _ in range(_pca.PCA_SQUARINGS):
            one = spark.createDataFrame([(mat,)], "mat array<array<double>>")
            d = one.select("mat", F.posexplode("mat").alias("j", "av")).select(
                "j", "av", F.posexplode("mat").alias("k", "bv")
            )
            sq = d.select("j", "k", F.expr(_fold_chain).alias("raw"))
            level = sq.select(
                "j",
                "k",
                F.round(
                    F.col("raw") / F.max(F.abs(F.col("raw"))).over(w_all), 12
                ).alias("m"),
            )
            mat = _reshape(level.collect())
        m = spark.createDataFrame(
            [(j, k, mat[j][k]) for j in range(DIM) for k in range(DIM)],
            "j int, k int, m double",
        )
        cov = spark.createDataFrame(
            [(j, k, cov_mat[j][k]) for j in range(DIM) for k in range(DIM)],
            "j int, k int, cov double",
        )
        y = m.groupBy("j").agg(
            _pca._ordered_fold(
                F.struct(
                    F.col("k").alias("ord"),
                    (F.col("m") * F.lit(_pca._X0)).alias("t"),
                )
            ).alias("y")
        )
        nrm = y.agg(
            F.sqrt(
                _pca._ordered_fold(
                    F.struct(
                        F.col("j").alias("ord"),
                        (F.col("y") * F.col("y")).alias("t"),
                    )
                )
            ).alias("nrm")
        )
        xf = (
            y.crossJoin(F.broadcast(nrm))
            .select("j", F.round(F.col("y") / F.col("nrm"), 9).alias("x"))
            .collect()
        )
        x_rows = sorted((r.j, r.x) for r in xf)
        x_df = spark.createDataFrame(x_rows, "k int, xv double")
        ray = (
            cov.join(F.broadcast(x_df), "k")
            .groupBy("j")
            .agg(
                _pca._ordered_fold(
                    F.struct(
                        F.col("k").alias("ord"),
                        (F.col("cov") * F.col("xv")).alias("t"),
                    )
                ).alias("ry")
            )
        )
        lam_val = ray.agg(
            F.sqrt(
                _pca._ordered_fold(
                    F.struct(
                        F.col("j").alias("ord"),
                        (F.col("ry") * F.col("ry")).alias("t"),
                    )
                )
            ).alias("lam")
        ).collect()[0][0]
        return x_rows, round(lam_val, 6)

    ref_x, ref_lam = ferried(mat0)
    got = _pca.pca_square_and_project(spark, mat0).collect()
    got_x = sorted((r.dim, r.component) for r in got)
    assert got_x == ref_x  # exact doubles, no tolerance
    assert {r.eigenvalue for r in got} == {ref_lam}


def test_moment_kernel_matches_sql_path(spark):
    """The r15 Arrow/numpy moment kernel (fast path) must produce the
    SAME exact integer moments as the SQL explode path it replaced.
    The comparison is against the retained wide-product SQL path over
    the same corpus — products there run in DECIMAL, so its sums are
    the same exact integers the BIGINT fast path produced; equality
    is exact (these are integers, no tolerance).  Coordinates are
    chosen so chunking engages (|u| large enough that several chunk
    folds happen) and signs/magnitudes vary."""
    import random

    from transitdata_omm_cancellation_source_spark.operators import pca as _pca

    rng = random.Random(7)
    n, dim = 257, _pca.DIM  # odd count: uneven partitions
    rows = [
        (
            i,
            [
                rng.uniform(-2000.0, 2000.0) * (1 if i % 3 else -1)
                for _ in range(dim)
            ],
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fast = _pca._moment_rows_kernel(spark, emb, 4)
    slow = _pca._moment_rows(spark, emb, wide_products=True)
    fast_map = {(r["j"], r["k"]): int(r["c"]) for r in fast}
    slow_map = {(r["j"], r["k"]): int(r["c"]) for r in slow}
    assert fast_map == slow_map
    assert len(fast_map) == dim * (dim + 1) // 2 + dim
