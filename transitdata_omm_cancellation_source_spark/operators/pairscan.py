"""Bucket-pair (triangle) cogrouped scan for the pair-dedup family.

``corpus_semdedup`` and ``dedup_embedding_cosine`` compute EXACT
pairwise cosine within a blocking key (the learned IVF cell, or
label x cell).  The r9-r11 shape salt-partitioned the QUERY side and
replicated the FULL member list across the salts; that bounded the
query side of every task but left the member side at the block's whole
occupancy — and the fourth-decade measurement showed why that is the
wrong half to leave unbounded:

- sf125, corpus-derived salts (16x-mean allowance): the scale corpus
  concentrates >100x the mean occupancy into single cells, the
  allowance under-split them, and ONE (cell, salt) task ground ~90
  minutes on one core while 31 idled (5504 s total vs ~2100 s Σ-work).
- sf125, occupancy-sized salts (recorded negative, commit af151b3):
  in these scans EVERY vector is a query, so the full member side
  replicates x nsalt — x64 put ~170M wide rows in flight and the OS
  OOM-killed the 32g JVM.  (The search-path scans are immune: they
  replicate only the sparse 1/QUERY_MOD query side.)

The structural fix here bounds BOTH task sides.  Per block, ids are
split into ``nb`` hash buckets and the cogroup key becomes the bucket
PAIR ``(lo, hi)`` with ``lo <= hi``:

- a vector in bucket ``b`` enters the MEMBER side of pairs ``(b, j)``
  for every ``j > b`` and the QUERY side of pairs ``(i, b)`` for every
  ``i <= b`` — so every unordered id pair lands in EXACTLY ONE task
  (the bucket pair of its two ids), and the scan is exact by coverage
  at ANY ``nb >= 1`` (``tests/test_salt_invariance.py`` pins 1 vs 5 vs
  adaptive bit-identity; ``nb = 1`` IS the classic single-triangle
  scan, so the same pin is the bucket-pair-vs-single-scan equivalence
  proof).
- the diagonal task ``(b, b)`` receives only the query side and scores
  the within-bucket triangle (strict ``id_a < id_b``); off-diagonal
  tasks score the full cross product of two DISJOINT buckets and
  orient each hit by id.

Both task sides are now bounded by ``occ / nb``: the straggler's
occ x occ/nsalt single-task matmul becomes ~nb²/2 parallel tasks of
(occ/nb)² — same Σ-work, spread over the cluster.  Each vector is
replicated into exactly ``nb`` tasks, the same x nsalt factor as the
salted shape — but ``nb`` is PER-BLOCK occupancy-sized (one
map-side-combinable count per block, #blocks output rows, a cost the
r11 skew measurement justifies): a cold block with occ <= the group
target gets ``nb = 1`` and pays ZERO replication, while only the hot
blocks fan out.  Total in-flight rows are Σ_block occ·nb(occ) — the
corpus-wide x nsalt blow-up that OOM'd the measured-salt attempt
cannot recur, because a global width no longer exists.  (This
supersedes the global ``pq.measured_nsalt`` helper the af151b3 revert
left dead; the per-block ``_nb_for_occupancy_col`` below is its
columnar replacement.)

Arithmetic contract (family-wide): micro-unit int64 quantization once,
exact integer dot matrices (``hyperplane.exact_idot_matmul`` — float64
BLAS below the 2^53 headroom, int64 matmul above, raise past 2^62),
cosine = exact-int dots / sqrt(double * double) — the identical
correctly-rounded IEEE op sequence the DuckDB oracles fold in BIGINT,
so engine == oracle stays integer-exact at every scale and any nb.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Per-task bucket-side bound (rows) and per-vector replication ceiling
#: — same constants as the search-path scans (pq.IVFPQ_GROUP_TARGET /
#: IVFPQ_MAX_SALT) so the two families keep one sizing discipline; a
#: hot block past nb_max * target degrades gracefully (bigger buckets,
#: still nb²/2-way parallel).
PAIR_GROUP_TARGET = 4096
PAIR_MAX_BUCKETS = 64


def _nb_for_occupancy_col(occ: F.Column) -> F.Column:
    """Columnar mirror of ``pq._nsalt_for_occupancy``: the smallest
    power of two ``nb`` with ``occ / nb <= PAIR_GROUP_TARGET``, capped
    at ``PAIR_MAX_BUCKETS`` — as a pure CASE chain (integer-exact, no
    log2 float edge at the power-of-two boundaries)."""
    expr = F.lit(PAIR_MAX_BUCKETS)
    nb = PAIR_MAX_BUCKETS // 2
    while nb >= 1:
        expr = F.when(occ <= nb * PAIR_GROUP_TARGET, F.lit(nb)).otherwise(expr)
        nb //= 2
    return expr.cast("int")


def emit_pairs(a, b, cosv):
    """Kernel emitter: the oriented hit PAIR list (vec_a < vec_b) —
    ``dedup_embedding_cosine``'s actual output, so emitting it is not a
    materialized intermediate."""
    import pandas as pd

    return pd.DataFrame(
        {
            "vec_a": pd.Series(a, dtype="int64"),
            "vec_b": pd.Series(b, dtype="int64"),
            "cos": pd.Series(cosv, dtype="float64"),
        }
    )


def emit_lower_dup_counts(a, b, cosv):
    """Kernel emitter: per-task partial counts of LOWER-id duplicates
    per vector (task-local np.unique, <= bucket-size slim rows out) —
    the ``corpus_semdedup`` gate aggregates these across tasks, so the
    pair list itself never leaves the kernel."""
    import numpy as np
    import pandas as pd

    ids, cnt = np.unique(np.asarray(b, dtype=np.int64), return_counts=True)
    return pd.DataFrame(
        {
            "vec_id": pd.Series(ids, dtype="int64"),
            "n": pd.Series(cnt, dtype="int64"),
        }
    )


def pair_scan(
    vb: DataFrame,
    block_cols: Sequence[str],
    tau: float,
    emit: Callable,
    out_schema: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """The bucket-pair cogrouped exact pair scan (module docstring).

    ``vb``: (id_col, vec_col double[], *block_cols), ideally persisted
    — three consumers read it (the occupancy count and both cogroup
    sides).  ``emit(a_ids, b_ids, cos) -> pd.DataFrame`` shapes the
    kernel output (``emit_pairs`` / ``emit_lower_dup_counts``);
    ``out_schema`` is its Spark schema string.
    """
    blocks = list(block_cols)
    occ = vb.groupBy(*blocks).agg(F.count(F.lit(1)).alias("occ"))
    nb = occ.select(
        *blocks, _nb_for_occupancy_col(F.col("occ")).alias("nb")
    )
    # broadcast: #blocks rows (<= #cells, bounded by IVF_MAX_BITS).
    vbb = (
        vb.select(id_col, vec_col, *blocks)
        .join(F.broadcast(nb), blocks)
        .withColumn("bkt", F.pmod(F.col(id_col), F.col("nb")).cast("int"))
    )
    # member side of pairs (bkt, j), j > bkt — empty slice when bkt is
    # the top bucket (explode drops the row); query side of pairs
    # (i, bkt), i <= bkt — always >= 1 key, so the (b, b) diagonal task
    # exists for every non-empty bucket and carries ONLY queries.
    members = vbb.select(
        F.col(id_col).alias("m_id"),
        F.col(vec_col).alias("mv"),
        *blocks,
        F.col("bkt").alias("lo"),
        F.explode(
            F.expr("slice(sequence(bkt, nb - 1), 2, nb - 1 - bkt)")
        ).alias("hi"),
    )
    qs = vbb.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        *[F.col(c).alias(f"q_{c}") for c in blocks],
        F.explode(F.expr("sequence(0, bkt)")).alias("q_lo"),
        F.col("bkt").alias("q_hi"),
    )

    def kernel(key, m_pdf, q_pdf):
        import numpy as np

        from transitdata_omm_cancellation_source_spark.functions.hyperplane import (
            exact_idot_matmul,
        )

        nil = np.empty(0, dtype=np.int64)
        lo, hi = int(key[-2]), int(key[-1])
        if len(q_pdf) == 0:
            return emit(nil, nil, nil)
        Uq = np.floor(
            np.stack(q_pdf["qv"].to_numpy()).astype(np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        qid = q_pdf["q_id"].to_numpy()
        nq2 = (Uq * Uq).sum(axis=1).astype(np.float64)
        out_a, out_b, out_c = [], [], []
        if lo == hi:
            # within-bucket triangle: sort by id, trim each query
            # chunk's candidate matrix at its max id — strict id_a <
            # id_b, every unordered pair scored once.
            qo = np.argsort(qid)
            qid, Uq, nq2 = qid[qo], Uq[qo], nq2[qo]
            for clo in range(0, len(qid), 256):
                chi = min(clo + 256, len(qid))
                mh = int(np.searchsorted(qid, qid[chi - 1], side="left"))
                if mh == 0:
                    continue
                dots = exact_idot_matmul(Uq[clo:chi], Uq[:mh])
                cos = dots / np.sqrt(nq2[clo:chi, None] * nq2[:mh][None, :])
                hit = (cos >= tau) & (qid[:mh][None, :] < qid[clo:chi, None])
                r, c = np.nonzero(hit)
                if len(r):
                    out_a.extend(qid[c])
                    out_b.extend(qid[clo + r])
                    out_c.extend(cos[r, c])
        else:
            if len(m_pdf) == 0:
                return emit(nil, nil, nil)
            Um = np.floor(
                np.stack(m_pdf["mv"].to_numpy()).astype(np.float64) * 1e6
                + 0.5
            ).astype(np.int64)
            mid = m_pdf["m_id"].to_numpy()
            nm2 = (Um * Um).sum(axis=1).astype(np.float64)
            for clo in range(0, len(qid), 256):
                chi = min(clo + 256, len(qid))
                dots = exact_idot_matmul(Uq[clo:chi], Um)
                cos = dots / np.sqrt(nq2[clo:chi, None] * nm2[None, :])
                r, c = np.nonzero(cos >= tau)
                if len(r):
                    # disjoint buckets: orient each hit by id
                    qi, mi = qid[clo + r], mid[c]
                    out_a.extend(np.minimum(qi, mi))
                    out_b.extend(np.maximum(qi, mi))
                    out_c.extend(cos[r, c])
        if not out_a:
            return emit(nil, nil, nil)
        return emit(
            np.asarray(out_a, dtype=np.int64),
            np.asarray(out_b, dtype=np.int64),
            np.asarray(out_c, dtype=np.float64),
        )

    return (
        members.groupby(*blocks, "lo", "hi")
        .cogroup(qs.groupby(*[f"q_{c}" for c in blocks], "q_lo", "q_hi"))
        .applyInPandas(kernel, out_schema)
    )
