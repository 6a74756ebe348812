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
