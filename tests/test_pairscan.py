"""Unit pins for the bucket-pair (triangle) cogroup kernels
(operators/pairscan.py) against a numpy brute-force reference —
complementing the query-level invariance pins in
test_salt_invariance.py with direct coverage of:

- pair COVERAGE: every qualifying unordered pair appears exactly once
  (diagonal triangle + off-diagonal cross tasks, no double count);
- ORIENTATION: emitted pairs always have vec_a < vec_b regardless of
  which bucket each id landed in;
- the counts kernel's lower-id semantics and its pairs-kernel
  agreement (the running-count reduction must equal counting the
  materialized pair list);
- the int32 micro-unit payload's fail-loud range guard.
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


def _vb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, v array<double>, blk int"
    ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk")


def _want(vecs, tau):
    want = {}
    for blk in (0, 1, 2):
        want.update(
            _brute_pairs({i: v for i, v in vecs.items() if i % 3 == blk}, tau)
        )
    return want


@pytest.mark.parametrize("nb", [1, 2, 3, 7])
def test_pairs_mode_matches_brute_force(spark, corpus, monkeypatch, nb):
    rows, vecs = corpus
    monkeypatch.setattr(
        ps,
        "_nb_for_occupancy_col",
        lambda occ, mode, _w=nb: F.lit(_w).cast("int"),
    )
    tau = 0.999
    got = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in ps.pair_scan(_vb(spark, rows), ["blk"], tau, "pairs").collect()
    }
    want = _want(vecs, tau)
    assert set(got) == set(want)
    assert all(a < b for a, b in got)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0)  # identical IEEE ops


@pytest.mark.parametrize("nb", [1, 4])
def test_counts_mode_lower_id_semantics(spark, corpus, monkeypatch, nb):
    rows, vecs = corpus
    monkeypatch.setattr(
        ps,
        "_nb_for_occupancy_col",
        lambda occ, mode, _w=nb: F.lit(_w).cast("int"),
    )
    tau = 0.999
    partial = ps.pair_scan(_vb(spark, rows), ["blk"], tau, "counts")
    got = {
        r["vec_id"]: r["n"]
        for r in partial.groupBy("vec_id").agg(F.sum("n").alias("n")).collect()
    }
    want: dict[int, int] = {}
    for _, b in _want(vecs, tau):
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_wide_magnitude_slow_path_matches_brute_force(spark, monkeypatch):
    """Non-normalized corpus past the float64 fast bound (umax² · DIM
    >= 2^53): dots must run as exact int64 matmuls and the SQUARED
    NORMS must be folded exactly in int64 with ONE correctly-rounded
    cast — a float64 einsum would round per-term and flip
    tau-threshold hits (the r12 ADVICE medium).  The brute-force
    reference folds in int64 and casts once, i.e. the oracle's
    CAST(BIGINT AS DOUBLE) arithmetic."""
    from transitdata_omm_cancellation_source_spark.operators import pairscan as ps

    rng = np.random.default_rng(11)
    base = rng.uniform(40.0, 200.0, size=(6, 8)) * rng.choice(
        [-1.0, 1.0], size=(6, 8)
    )
    rows, vecs = [], {}
    for i in range(24):
        v = (base[i % 6] * (1.0 + rng.normal(scale=1e-4, size=8))).tolist()
        vecs[i] = v
        rows.append((i, v, int(i % 2)))
    # the test must actually exercise the slow path
    umax = max(
        abs(int(np.floor(x * 1e6 + 0.5))) for v in vecs.values() for x in v
    )
    assert umax * umax * 8 >= 2**53
    assert umax * umax * 8 < 2**62
    for nb in (1, 3):
        monkeypatch.setattr(
            ps,
            "_nb_for_occupancy_col",
            lambda occ, mode, _w=nb: F.lit(_w).cast("int"),
        )
        tau = 0.999
        got = {
            (r["vec_a"], r["vec_b"]): r["cos"]
            for r in ps.pair_scan(
                spark.createDataFrame(
                    rows, "vec_id long, v array<double>, blk int"
                ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk"),
                ["blk"],
                tau,
                "pairs",
            ).collect()
        }
        want = {}
        for blk in (0, 1):
            want.update(
                _brute_pairs(
                    {i: v for i, v in vecs.items() if i % 2 == blk}, tau
                )
            )
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=0), k


def test_int64_headroom_guard_raises(spark):
    """|u|² · DIM past 2^62: the kernel must raise where the BIGINT
    oracle errors, never wrap silently."""
    from transitdata_omm_cancellation_source_spark.operators import pairscan as ps

    v = [2000.0] * 8
    rows = [(0, v, 0), (1, v, 0)]
    scan = ps.pair_scan(
        spark.createDataFrame(
            rows, "vec_id long, v array<double>, blk int"
        ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk"),
        ["blk"],
        0.9,
        "pairs",
    )
    with pytest.raises(Exception, match="int64 headroom"):
        scan.collect()


def test_micro_unit_guard_fails_loud(spark):
    ok = spark.createDataFrame(
        [(0, [2145.9, -2146.0])], "vec_id long, v array<double>"
    ).select(ps.micro_unit_col("v").alias("uv"))
    assert ok.first()["uv"] == [2145900000, -2146000000]
    bad = spark.createDataFrame(
        [(0, [2147.0, 0.0])], "vec_id long, v array<double>"
    ).select(ps.micro_unit_col("v").alias("uv"))
    with pytest.raises(Exception, match="micro-unit range"):
        bad.collect()


def test_unknown_mode_rejected(spark, corpus):
    rows, _ = corpus
    with pytest.raises(ValueError, match="unknown mode"):
        ps.pair_scan(_vb(spark, rows), ["blk"], 0.9, "topk")


@pytest.mark.parametrize("nb", [1, 3])
def test_duplicate_vec_ids_match_oracle_semantics(spark, monkeypatch, nb):
    """Duplicate vec_ids are legal input (the sf125 scale corpus's
    planted +1e6 id offset collides with real ids past 1M): rows
    sharing an id never pair with EACH OTHER (strict < masks — the
    oracle's vec_id_a < vec_id_b), but each copy pairs independently
    with other ids, so a near-dup of both copies appears twice."""
    from transitdata_omm_cancellation_source_spark.operators import pairscan as ps

    monkeypatch.setattr(
        ps,
        "_nb_for_occupancy_col",
        lambda occ, mode, _w=nb: F.lit(_w).cast("int"),
    )
    v = [0.5, 0.5, 0.5, 0.5]
    w = [0.5, 0.5, 0.5, 0.500001]
    rows = [(5, v, 0), (5, w, 0), (9, v, 0), (2, [0.9, -0.1, 0.0, 0.1], 0)]
    got = sorted(
        (r["vec_a"], r["vec_b"])
        for r in ps.pair_scan(
            spark.createDataFrame(
                rows, "vec_id long, v array<double>, blk int"
            ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk"),
            ["blk"],
            0.999,
            "pairs",
        ).collect()
    )
    # (5,5) excluded; both 5-copies pair with 9
    assert got == [(5, 9), (5, 9)]
    # counts mode: vec 9 has TWO lower-id dups (one per 5-copy)
    partial = ps.pair_scan(
        spark.createDataFrame(
            rows, "vec_id long, v array<double>, blk int"
        ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk"),
        ["blk"],
        0.999,
        "counts",
    )
    counts = {
        r["vec_id"]: r["n"]
        for r in partial.groupBy("vec_id").agg(F.sum("n").alias("n")).collect()
    }
    assert counts == {9: 2}


@pytest.mark.parametrize("nb", [1, 2])
def test_zero_norm_vector_matches_duckdb_nan_semantics(spark, monkeypatch, nb):
    """A vector whose every |x| < 5e-7 quantizes to the zero micro-unit
    vector scores 0/0 against every partner: NaN in numpy, NULL in the
    gate's DuckDB (division by zero yields NULL there, probed below by
    running the oracle arithmetic itself) — and BOTH fail 'cos >= tau'
    (greater_equal(NaN) is False; WHERE filters NULL), so the agreed
    cross-engine semantics is that zero-norm pairs are DROPPED.  This
    test runs the literal oracle arithmetic on DuckDB as ground truth
    so a DuckDB version that changes division-by-zero behavior fails
    HERE, not in the driver gate."""
    import duckdb

    from transitdata_omm_cancellation_source_spark.operators import pairscan as ps

    monkeypatch.setattr(
        ps,
        "_nb_for_occupancy_col",
        lambda occ, mode, _w=nb: F.lit(_w).cast("int"),
    )
    rows = [
        (1, [0.6, 0.8, 0.0, 0.0], 0),
        (2, [0.6, 0.8, 0.0, 1e-5], 0),
        (3, [1e-8, -2e-7, 0.0, 0.0], 0),  # quantizes to the zero vector
        (4, [-0.8, 0.6, 0.0, 0.0], 0),
    ]
    tau = 0.999
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {list(map(float, v))})" for i, v, _ in rows)
        + ") t(vec_id, emb)"
    )
    idot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(floor(a.emb[j + 1]"
        " * 1000000.0 + 0.5) AS BIGINT) * CAST(floor(b.emb[j + 1] * 1000000.0"
        " + 0.5) AS BIGINT) for j in range(0, 4)]), (acc, x) -> acc + x)"
    )
    n2 = lambda s: idot.replace("a.emb", f"{s}.emb").replace("b.emb", f"{s}.emb")
    want = {
        (r[0], r[1])
        for r in con.execute(
            f"""
            SELECT a.vec_id, b.vec_id
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE CAST({idot} AS DOUBLE)
                  / sqrt(CAST({n2('a')} AS DOUBLE) * CAST({n2('b')} AS DOUBLE))
                  >= {tau}
            """
        ).fetchall()
    }
    # the oracle semantics this test encodes: the zero vector's NULL
    # scores are filtered by WHERE, so only the genuine near-dup pair
    # survives — if a DuckDB upgrade flips 0.0/0.0 to NaN (which IT
    # ranks greatest), this assertion is the early alarm.
    assert want == {(1, 2)}
    got = {
        (r["vec_a"], r["vec_b"])
        for r in ps.pair_scan(
            spark.createDataFrame(
                rows, "vec_id long, v array<double>, blk int"
            ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk"),
            ["blk"],
            tau,
            "pairs",
        ).collect()
    }
    assert got == want
    # counts mode agrees with the pair list's lower-id histogram
    partial = ps.pair_scan(
        spark.createDataFrame(
            rows, "vec_id long, v array<double>, blk int"
        ).select("vec_id", ps.micro_unit_col("v").alias("uv"), "blk"),
        ["blk"],
        tau,
        "counts",
    )
    counts = {
        r["vec_id"]: r["n"]
        for r in partial.groupBy("vec_id").agg(F.sum("n").alias("n")).collect()
    }
    want_counts: dict[int, int] = {}
    for _, b in want:
        want_counts[b] = want_counts.get(b, 0) + 1
    assert counts == want_counts


# --- mode="delta" (r14 bipartite incremental scan) ---------------------------


def _want_delta(vecs, tau, pred):
    """Brute-force pairs touching the batch: per block, a < b, >= 1
    side satisfying pred — the full restriction semantics."""
    want = {}
    for blk in (0, 1, 2):
        for (a, b), cos in _brute_pairs(
            {i: v for i, v in vecs.items() if i % 3 == blk}, tau
        ).items():
            if pred(a) or pred(b):
                want[(a, b)] = cos
    return want


@pytest.mark.parametrize("target", [4096, 16, 4])
def test_delta_mode_matches_restricted_brute_force(
    spark, corpus, monkeypatch, target
):
    """Coverage/orientation/dedup of the bipartite delta scan across
    grid shapes: target=4096 -> both grids 1x1; 16 -> member grid
    multi-bucket while the small batch keeps nbq=1; 4 -> both grids
    multi-bucket (batch-batch pairs cross bucket boundaries, so the
    m_id < q_id dedup mask is exercised across units)."""
    rows, vecs = corpus
    monkeypatch.setattr(ps, "PAIR_GROUP_TARGET", target)
    tau = 0.999
    pred = lambda i: i % 5 == 0  # noqa: E731
    got = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in ps.pair_scan(
            _vb(spark, rows),
            ["blk"],
            tau,
            "delta",
            query_pred=F.col("vec_id") % 5 == 0,
        ).collect()
    }
    want = _want_delta(vecs, tau, pred)
    assert set(got) == set(want)
    assert all(a < b for a, b in got)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0)  # identical IEEE ops
    # non-vacuous in both directions
    full = _want(vecs, tau)
    assert want and len(want) < len(full)


def test_delta_mode_duplicate_and_equal_ids_never_pair(spark, monkeypatch):
    """Duplicate ids are legal input (the sf125 planted-offset
    collision): two distinct rows sharing an id must not pair with
    each other, and a batch row must not pair with itself through the
    member side."""
    monkeypatch.setattr(ps, "PAIR_GROUP_TARGET", 2)
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(7, v, 0), (7, v, 0), (9, v, 0)]  # ids 7, 7, 9 — identical vectors
    got = sorted(
        (r["vec_a"], r["vec_b"])
        for r in ps.pair_scan(
            _vb(spark, rows),
            ["blk"],
            0.9,
            "delta",
            query_pred=F.col("vec_id") % 2 == 1,  # everything is batch
        ).collect()
    )
    # the only legal pair is (7, 9) — emitted once per id-7 ROW (two
    # distinct rows carry id 7, exactly as the oracle's self-join
    # yields two (7, 9) rows)
    assert got == [(7, 9), (7, 9)]


def test_delta_mode_requires_query_pred(spark, corpus):
    rows, _ = corpus
    with pytest.raises(ValueError, match="query_pred"):
        ps.pair_scan(_vb(spark, rows), ["blk"], 0.9, "delta")
    with pytest.raises(ValueError, match="query_pred"):
        ps.pair_scan(
            _vb(spark, rows), ["blk"], 0.9, "pairs",
            query_pred=F.col("vec_id") % 2 == 0,
        )
