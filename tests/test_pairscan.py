"""Unit pins for the bucket-pair (triangle) cogroup kernel
(operators/pairscan.py) against a numpy brute-force reference —
complementing the query-level invariance pins in
test_salt_invariance.py with direct coverage of:

- pair COVERAGE: every qualifying unordered pair appears exactly once
  (diagonal triangle + off-diagonal cross tasks, no double count);
- ORIENTATION: emitted pairs always have vec_a < vec_b regardless of
  which bucket each id landed in;
- the count emitter's lower-id semantics.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.operators import pairscan as ps


def _brute_pairs(vecs: dict[int, list[float]], tau: float):
    """All (a < b, cos) pairs over the micro-unit exact-integer cosine
    — the same arithmetic contract the kernel implements."""
    out = {}
    ids = sorted(vecs)
    u = {
        i: np.floor(np.asarray(vecs[i]) * 1e6 + 0.5).astype(np.int64)
        for i in ids
    }
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            dot = float((u[a] * u[b]).sum())
            cos = dot / np.sqrt(
                float((u[a] * u[a]).sum()) * float((u[b] * u[b]).sum())
            )
            if cos >= tau:
                out[(a, b)] = cos
    return out


@pytest.fixture()
def corpus():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(12, 8))
    rows = []
    vecs = {}
    for i in range(40):
        # clustered around 12 anchors so real near-dup pairs exist
        v = base[i % 12] + rng.normal(scale=0.02, size=8)
        v = (v / np.linalg.norm(v)).tolist()
        vecs[i] = v
        rows.append((i, v, int(i % 3)))  # 3 blocks
    return rows, vecs


@pytest.mark.parametrize("nb", [1, 2, 3, 7])
def test_pair_scan_matches_brute_force(spark, corpus, monkeypatch, nb):
    rows, vecs = corpus
    monkeypatch.setattr(
        ps, "_nb_for_occupancy_col", lambda occ, _w=nb: F.lit(_w).cast("int")
    )
    vb = spark.createDataFrame(
        rows, "vec_id long, v array<double>, blk int"
    )
    tau = 0.999
    got = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in ps.pair_scan(
            vb, ["blk"], tau, ps.emit_pairs, "vec_a long, vec_b long, cos double"
        ).collect()
    }
    # brute force per block (the scan only pairs within a block)
    want = {}
    for blk in (0, 1, 2):
        want.update(
            _brute_pairs({i: v for i, v in vecs.items() if i % 3 == blk}, tau)
        )
    assert set(got) == set(want)
    assert all(a < b for a, b in got)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0)  # identical IEEE ops


def test_count_emitter_lower_id_semantics(spark, corpus, monkeypatch):
    rows, vecs = corpus
    monkeypatch.setattr(
        ps, "_nb_for_occupancy_col", lambda occ: F.lit(4).cast("int")
    )
    vb = spark.createDataFrame(rows, "vec_id long, v array<double>, blk int")
    tau = 0.999
    partial = ps.pair_scan(
        vb, ["blk"], tau, ps.emit_lower_dup_counts, "vec_id long, n long"
    )
    got = {
        r["vec_id"]: r["n"]
        for r in partial.groupBy("vec_id").agg(F.sum("n").alias("n")).collect()
    }
    want: dict[int, int] = {}
    for blk in (0, 1, 2):
        for _, b in _brute_pairs(
            {i: v for i, v in vecs.items() if i % 3 == blk}, tau
        ):
            want[b] = want.get(b, 0) + 1
    assert got == want
