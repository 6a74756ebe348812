"""SemDeDup: semantic deduplication confined to LEARNED clusters.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public method): k-means-cluster the
embedding space, then look for near-duplicate pairs ONLY within each
cluster and keep one exemplar per duplicate group.  The cluster stage
is what makes web-scale semantic dedup tractable — the pairwise search
never leaves a cluster, and cluster granularity (k) is the knob that
bounds per-cluster cost as the corpus grows.

Relation to the repo's other embedding dedup
(``dedup_embedding_cosine``): that query blocks on the GIVEN ``label``
column and emits the duplicate PAIR list; this one blocks on clusters
the engine itself LEARNED — the CORPUS-SCALED coarse quantizer shared
with the IVF search paths (``similarity.ivf_quantizer``: #cells =
sqrt_pow2(N), exactly the paper's k-grows-with-corpus prescription) —
and emits the per-vector keep/drop GATE — the artifact a
training-data pipeline actually consumes.

Within a cluster the search is the paper's OWN prescription: the
exact pairwise cosine matrix, computed by a per-(cell, salt)
cogrouped Arrow kernel as ONE exact int64 matmul (the r9/r10
kernel-scan playbook — ``pq._ivfpq_scan``, ``similarity.
_bucket_cos_scored``).  The previous implementation generated
candidates through an LSH-band self-join and materialized every
colliding pair through a DISTINCT and two vector joins; on a
duplicate-heavy corpus the per-bucket pair mass is Σocc² and the
shuffled pair list exploded (measured: filled >70 GB of shuffle and
did not finish at sf25, where the scaled corpus packs ~250 mutual
near-duplicates per bucket).  The kernel scan shuffles only
|corpus| x nsalt slim member rows, emits one row per vector, and
needs no band machinery at all — the in-kernel BLAS matmul scores a
cluster's full occ² matrix faster than the join could shuffle its
pair list.  Exactness improves: a cos >= tau pair inside a cluster
is now found ALWAYS, not only when it also collided in a band.

Exemplar rule: SemDeDup keeps a pseudo-random member per duplicate
group; here the KEPT member is the lowest ``vec_id`` (deterministic,
engine-independent) — a documented deviation that changes WHICH
exemplar survives, never HOW MANY.

Scale shape (100 TB): centroids are a fixed-size broadcast (k x DIM
rows, never corpus-proportional); assignment is the shared Arrow
matmul kernel over the corpus scan; the pairwise stage shuffles
|corpus| x nsalt member rows grouped by (cell, salt) — queries are
PARTITIONED across the salts (each vector's full answer is computed
against the cluster's complete member list in its one group), so the
result is exact at any salt width while no task ever holds more than
occ members + occ/nsalt queries.  With #cells = sqrt_pow2(N) the
total kernel work is Θ(N^1.5) — the same designed IVF balance point
as ``knn_ivf_kmeans``.  No stage is all-pairs across clusters, no
pair list is ever materialized, no driver action beyond the bounded
Lloyd convergence counts inherited from the centroid builder
(CONTRACTUALLY EAGER, see plans/queries.py QuerySpec).

The reference (a cancellation ETL) has no embedding surface; this is
north-star scope per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..plans.queries import registered_query as _q
from .dedup_fuzzy import _COSINE_TAU as SEMDEDUP_TAU  # one shared tau
from .similarity import (
    assign_to_centroids,
    corpus_count,
    ivf_assign_cte,
    ivf_quantizer,
)


def _semdedup_oracle() -> str:
    from ..functions.hyperplane import IDOT_D

    # ivf_assign_cte trains the corpus-scaled quantizer on the BASE
    # embeddings table and assigns whatever ``v`` is — here the planted
    # corpus — exactly mirroring the Spark side (ivf_quantizer +
    # assign_to_centroids over the planted vectors).  Its ``v_u`` CTE
    # (micro-unit BIGINT vectors) is reused for the pairwise stage, so
    # the verify arithmetic is the family-wide exact-integer cosine
    # contract: BIGINT dots, one CAST-to-DOUBLE each, one sqrt, one
    # divide — the identical correctly-rounded IEEE op sequence the
    # Arrow kernel computes via exact int64 matmul.
    idot_ab = IDOT_D.format(a="a.uv", b="b.uv")
    cos = (
        f"CAST({idot_ab} AS DOUBLE)"
        f" / sqrt(CAST(a.in2 AS DOUBLE) * CAST(b.in2 AS DOUBLE))"
    )
    return f"""
    WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, embedding
        FROM embeddings WHERE vec_id % 20 = 0
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM corpus),
    {ivf_assign_cte()},
    u AS (
        SELECT vu.vec_id, a.cell, vu.uv,
               {IDOT_D.format(a="vu.uv", b="vu.uv")} AS in2
        FROM v_u vu JOIN assign a ON a.vec_id = vu.vec_id
    ),
    hits AS (
        SELECT b.vec_id AS vec_id, count(*) AS n
        FROM u a JOIN u b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {cos} >= {SEMDEDUP_TAU}
        GROUP BY b.vec_id
    )
    SELECT u.vec_id, u.cell,
           CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_lower_dups,
           CASE WHEN hits.vec_id IS NOT NULL THEN 'drop' ELSE 'keep' END
               AS semdedup_gate
    FROM u LEFT JOIN hits ON hits.vec_id = u.vec_id
    """


@_q(
    "corpus_semdedup",
    "north-star: SemDeDup — k-means-cluster-confined semantic near-dup "
    "gate over embeddings (learned clusters, per-cluster kernel scan)",
    _semdedup_oracle(),
)
def _semdedup(spark, t):
    # Stage 1 — learned clusters: the SHARED corpus-scaled coarse
    # quantizer (#cells = sqrt_pow2(N), trained on the raw corpus; the
    # planted duplicates below are copies of raw vectors, so training
    # on the raw side only cannot move any assignment they'd land in).
    # SemDeDup's own prescription is cluster count growing with the
    # corpus — a fixed k left the within-cluster pairwise stage
    # quadratic; #cells ∝ √N makes it Θ(N^1.5), the IVF balance
    # point.  Served as a materialized session artifact (the
    # PQ-codebook discipline), and shared with the IVF search paths so
    # cluster geometry cannot drift between search and dedup.
    from .pq import _ivfpq_nsalt
    from .similarity import _ivf_ncells

    cvec = ivf_quantizer(spark, t)
    # Same planted near-dup corpus as dedup_embedding_cosine: every
    # 20th vector re-enters shifted by 1e6, so the gate has real
    # duplicates to find and the two dedup paths stay comparable.
    corpus = t["embeddings"].select("vec_id", "embedding").unionAll(
        t["embeddings"]
        .filter(F.col("vec_id") % 20 == 0)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    vecs = corpus.select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
    )
    # Stage 2 — assignment: the SHARED nearest-centroid kernel
    # (similarity.assign_to_centroids — broadcast centroid table,
    # exact-integer matmul argmax, lowest-cell tie-break), so this
    # gate and the IVF search paths can never drift apart
    # semantically.  Persisted: the assigned corpus feeds both sides
    # of the cogroup below.
    vb = persist_tracked(vecs.join(assign_to_centroids(vecs, cvec), "vec_id"))
    # Stage 3 — per-cluster kernel scan (the knn_ivfpq_adc playbook):
    # QUERIES are salt-PARTITIONED (vec_id % nsalt), members replicated
    # across the cell's salts, so each vector meets its cluster's FULL
    # member list exactly once — per-vector results are exact at any
    # salt width, and no task holds more than occ members +
    # occ/nsalt query rows.  nsalt comes from the corpus-derived
    # sizing shared with the other kernel scans (bounded group target,
    # 16x skew allowance, no per-cell count job).
    #
    # MEASURED LIMIT of this shape (sf125, recorded round-11 negative
    # result — do not retry occupancy-sized salts here): the scale
    # derivation concentrates >100x the mean occupancy into single
    # cells, the 16x allowance under-splits them, and one group ground
    # ~90 min on ONE core (5504 s total).  Sizing nsalt from the
    # measured max occupancy (64 here) fixes the skew arithmetic but
    # OOM-kills the node: in this scan EVERY vector is a query, so the
    # full member side is replicated x nsalt — x64 multiplies the
    # whole corpus, ~170M wide rows in flight.  The search-path scans
    # are immune (they replicate only the sparse 1/QUERY_MOD query
    # side).  The structural fix is a bucket-PAIR (triangle) cogroup —
    # split each cell into nsalt id-buckets and cogroup the (i<=j)
    # bucket pairs, bounding BOTH sides by occ/nsalt with the same
    # x nsalt replication — a next-round rewrite, not a sizing tweak.
    nsalt = _ivfpq_nsalt(
        corpus_count(spark, t["embeddings"]), _ivf_ncells(spark, t)
    )
    members = vb.select("vec_id", "v", "cell").withColumn(
        "salt", F.explode(F.expr(f"sequence(0, {nsalt - 1})"))
    )
    # query side renamed (q_id, qv, q_cell): fresh attribute ids, so the
    # cogroup of two projections of the same persisted frame is not an
    # ambiguous self-join (the _knn_lsh corpus/qs discipline).
    qs = vb.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("cell").alias("q_cell"),
    ).withColumn("salt", (F.col("q_id") % nsalt).cast("int"))
    tau = SEMDEDUP_TAU

    def kernel(m_pdf, q_pdf):
        import numpy as np
        import pandas as pd

        from transitdata_omm_cancellation_source_spark.functions.hyperplane import (
            exact_idot_matmul,
        )

        empty = pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "cell": pd.Series(dtype="int32"),
                "n_lower_dups": pd.Series(dtype="int64"),
                "semdedup_gate": pd.Series(dtype="object"),
            }
        )
        if len(q_pdf) == 0 or len(m_pdf) == 0:
            return empty
        Um = np.floor(
            np.stack(m_pdf["v"].to_numpy()).astype(np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        mid = m_pdf["vec_id"].to_numpy()
        Uq = np.floor(
            np.stack(q_pdf["qv"].to_numpy()).astype(np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        qid = q_pdf["q_id"].to_numpy()
        nm2 = (Um * Um).sum(axis=1).astype(np.float64)
        nq2 = (Uq * Uq).sum(axis=1).astype(np.float64)
        # only mid < qid pairs can ever count: sort both sides by id
        # and trim each query chunk's member matrix at its max qid —
        # halves the matmul work on average, output unchanged (row
        # order is free; the gate joins by vec_id downstream).
        mo = np.argsort(mid)
        mid, Um, nm2 = mid[mo], Um[mo], nm2[mo]
        qo = np.argsort(qid)
        qid, Uq, nq2 = qid[qo], Uq[qo], nq2[qo]
        counts = np.zeros(len(qid), dtype=np.int64)
        for lo in range(0, len(qid), 256):
            hi = min(lo + 256, len(qid))
            mh = int(np.searchsorted(mid, qid[hi - 1], side="left"))
            if mh == 0:
                continue
            # exact integer dots (BLAS fast path + in-helper guard)
            dots = exact_idot_matmul(Uq[lo:hi], Um[:mh])
            cos = dots / np.sqrt(nq2[lo:hi, None] * nm2[:mh][None, :])
            hit = (cos >= tau) & (mid[:mh][None, :] < qid[lo:hi, None])
            counts[lo:hi] = hit.sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": qid,
                "cell": q_pdf["q_cell"].to_numpy()[qo],
                "n_lower_dups": counts,
                "semdedup_gate": np.where(counts > 0, "drop", "keep"),
            }
        )

    return (
        members.groupby("cell", "salt")
        .cogroup(qs.groupby("q_cell", "salt"))
        .applyInPandas(
            kernel,
            "vec_id long, cell int, n_lower_dups long, semdedup_gate string",
        )
    )
