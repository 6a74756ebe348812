"""Bucket-pair (triangle) cogrouped scan for the pair-dedup family.

``corpus_semdedup`` and ``dedup_embedding_cosine`` compute EXACT
pairwise cosine within a blocking key (the learned IVF cell, or
label x cell).  The r9-r11 shape salt-partitioned the QUERY side and
replicated the FULL member list across the salts; that bounded the
query side of every task but left the member side at the block's whole
occupancy — and the fourth-decade measurements show why every half of
this design is forced:

- sf125, corpus-derived salts (16x-mean allowance): the scale corpus
  concentrates occupancy into mega-cells (measured: 6 cells hold 83%
  of the 2.6M-vector corpus, the hottest 481k), the allowance
  under-split them, and ONE (cell, salt) task ground ~90 minutes on
  one core while 31 idled (5504 s total vs ~2100 s Σ-work).
- sf125, occupancy-sized GLOBAL salts (recorded negative, af151b3):
  in these scans EVERY vector is a query, so the full member side
  replicates x nsalt — x64 put ~170M wide rows in flight and the OS
  OOM-killed the 32g JVM.
- sf125, bucket pairs at a flat 4096-row bucket target (recorded
  negative, r12): the mega-cells sit at the nb = 64 cap, so 83% of
  the corpus replicated x64 — >50 GB of cogroup shuffle, disk-full.
  Parallelism needs no such width: nb = 16 already yields
  nb(nb+1)/2 = 136 tasks per hot cell (4+ waves on 32 cores), and
  every doubling past that doubles shuffled bytes for nothing.

The structural shape (bounds BOTH task sides).  Per block, ids are
split into ``nb`` buckets and the cogroup key becomes the bucket PAIR
``(lo, hi)`` with ``lo <= hi``:

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

Each vector is replicated into exactly ``nb`` tasks, and ``nb`` is
PER-BLOCK occupancy-sized (one map-side-combinable count per block,
#blocks output rows): a cold block pays ZERO replication (nb = 1, no
member side at all), so total in-flight rows are Σ_block occ·nb(occ)
and a global width no longer exists.  Two sizing regimes per the
measured negatives above:

- ``mode="pairs"`` (the pair-LIST emitters): nb = pow2ceil(occ /
  4096), capped at 64.  The 4096-row bucket bounds the worst-case
  per-task HIT LIST (a fully-duplicate bucket pair emits
  bucket_lo x bucket_hi rows — that list is the query's actual
  output, but it buffers in the kernel before Arrow hands it back).
- ``mode="counts"`` (per-vector lower-dup counts): the kernel keeps
  RUNNING COUNT ARRAYS — a chunk's boolean hit matrix is reduced with
  sum(axis), NEVER np.nonzero'd into index lists, so a 100%-duplicate
  mega-cell costs zero extra memory.  Buckets can therefore be
  65536 rows (task payload ~2 x 17 MB of int32 vectors), and nb stays
  at the 16-task-parallelism floor until occ outgrows 16 such
  buckets: nb = min(64, max(pow2ceil(occ/65536),
  min(16, pow2ceil(occ/4096)))).  At the measured sf125 distribution
  this cuts the mega-cells' replication x4 vs the flat rule.

Payload: vectors ride the shuffle as int32 MICRO-UNITS (``array<int>``
— ``micro_unit_col`` quantizes once, Spark-side, with a fail-loud
range guard), half the bytes of the double vectors and no per-task
requantization.  floor(x*1e6 + 0.5) in Spark float64 arithmetic is the
identical IEEE op sequence the kernels used to run in numpy, so the
integers are bit-identical.

Arithmetic contract (family-wide): micro-unit int64 quantization once,
exact integer dot matrices (``hyperplane.exact_idot_matmul`` — float64
BLAS below the 2^53 headroom, int64 matmul above, raise past 2^62),
cosine = exact-int dots / sqrt(double * double) — the identical
correctly-rounded IEEE op sequence the DuckDB oracles fold in BIGINT,
so engine == oracle stays integer-exact at every scale and any nb.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pairs-mode bucket target (bounds the worst-case per-task hit list)
#: and counts-mode bucket bound (task payload memory only).
PAIR_GROUP_TARGET = 4096
COUNT_BUCKET_ROWS = 65536
#: parallelism floor: nb = 16 -> 136 tasks per hot block, 4+ waves on
#: a 32-core node — wider only costs shuffle bytes (occ x nb).
NB_PAR = 16
#: replication ceiling per vector.
PAIR_MAX_BUCKETS = 64

#: |x| bound for the int32 micro-unit payload: floor(2146 * 1e6 + 0.5)
#: = 2.146e9 < 2^31 - 1.  Any normalized-embedding corpus sits far
#: below it; past it the cast would wrap silently, so we raise.
_MICRO_UNIT_XMAX = 2146.0


def micro_unit_col(vec_col: str) -> F.Column:
    """int32 micro-units of a double vector, with a fail-loud range
    guard (a silent int32 wrap must never reach the kernels)."""
    return F.expr(
        f"transform({vec_col}, x -> CAST(IF(abs(x) <= {_MICRO_UNIT_XMAX},"
        f" floor(x * 1000000.0 + 0.5),"
        f" raise_error('pairscan: |x| exceeds the int32 micro-unit range'))"
        f" AS INT))"
    )


def _pow2_case(occ: F.Column, target: int, lo: int, hi: int) -> F.Column:
    """Smallest power of two nb in [lo, hi] with occ/nb <= target, as a
    pure integer CASE chain (no log2 float edges)."""
    expr = F.lit(hi)
    nb = hi // 2
    while nb >= lo:
        expr = F.when(occ <= nb * target, F.lit(nb)).otherwise(expr)
        nb //= 2
    return expr


def _nb_for_occupancy_col(occ: F.Column, mode: str) -> F.Column:
    """Per-block bucket count (module docstring: the two regimes)."""
    if mode == "pairs":
        return _pow2_case(occ, PAIR_GROUP_TARGET, 1, PAIR_MAX_BUCKETS).cast(
            "int"
        )
    # counts: 4096-row sizing up to the NB_PAR parallelism floor, then
    # hold until occ outgrows NB_PAR buckets of 65536 rows.
    small = _pow2_case(occ, PAIR_GROUP_TARGET, 1, NB_PAR)
    big = _pow2_case(occ, COUNT_BUCKET_ROWS, 1, PAIR_MAX_BUCKETS)
    return F.greatest(small, big).cast("int")


def pair_scan(
    vb: DataFrame,
    block_cols: Sequence[str],
    tau: float,
    mode: str,
    id_col: str = "vec_id",
    vec_col: str = "uv",
) -> DataFrame:
    """The bucket-pair cogrouped exact pair scan (module docstring).

    ``vb``: (id_col, vec_col int32 micro-units — ``micro_unit_col``,
    computed BEFORE the caller's persist so the interpreted HOF never
    re-evaluates per replicated row, *block_cols); ideally persisted —
    three consumers read it (the occupancy count and both cogroup
    sides).  ``mode="pairs"`` returns (vec_a, vec_b, cos) with
    vec_a < vec_b; ``mode="counts"`` returns per-task PARTIAL
    (vec_id, n) lower-id duplicate counts — callers sum across tasks.
    """
    if mode not in ("pairs", "counts"):
        raise ValueError(f"pair_scan: unknown mode {mode!r}")
    blocks = list(block_cols)
    occ = vb.groupBy(*blocks).agg(F.count(F.lit(1)).alias("occ"))
    nb = occ.select(
        *blocks, _nb_for_occupancy_col(F.col("occ"), mode).alias("nb")
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
    kernel = (_pairs_kernel if mode == "pairs" else _counts_kernel)(tau)
    schema = (
        "vec_a long, vec_b long, cos double"
        if mode == "pairs"
        else "vec_id long, n long"
    )
    return (
        members.groupby(*blocks, "lo", "hi")
        .cogroup(qs.groupby(*[f"q_{c}" for c in blocks], "q_lo", "q_hi"))
        .applyInPandas(kernel, schema)
    )


#: kernel chunk height: bounds every scratch matrix at CHUNK x bucket.
_CHUNK = 256

#: Worker-global scratch pool, keyed by buffer role.  applyInPandas
#: cogroup invokes the kernel ONCE PER GROUP; a hot block fans out
#: into nb(nb+1)/2 groups and a corpus has tens of thousands more, so
#: per-GROUP allocation is the dominant cost at scale: the first
#: triangle sf125 runs spent up to ~90% of machine CPU in the OS
#: kernel (measured: ~10k minor faults/s per worker, worker stime 8x
#: utime) zeroing freshly mmap'd numpy buffers that lived for one
#: group.  Workers are long-lived single-threaded processes
#: (spark.python.worker.reuse), so pooled buffers are faulted once
#: per worker and reused across groups, tasks and queries.  Pool
#: footprint is bounded by the mode constants: the largest resident
#: set (counts mode, 65536-row buckets) is ~400 MB/worker — budget it
#: in executor overhead when sizing a real cluster.
_SCRATCH: dict = {}


def _scratch(np, key, n, dtype):
    """A length-n view of the pooled flat buffer for ``key``."""
    buf = _SCRATCH.get(key)
    if buf is None or buf.size < n:
        cap = 1 << max(n - 1, 1).bit_length()  # geometric growth
        _SCRATCH[key] = buf = np.empty(cap, dtype=dtype)
    return buf[:n]


def _stack_units(pdf, col, slot):
    """Micro-unit matrix (float64 view into the ``slot`` pool) + EXACT
    squared norms.  Values are int32 micro-units, so the float64 cast
    is exact and every u² term (<= ~1.4e12) and 64-term norm sum
    (<= ~9.2e13) stays far below 2^53 — n2 is an exact integer in
    float64 regardless of summation order (einsum may reorder)."""
    import numpy as np

    rows = pdf[col].to_numpy()
    n, dim = len(rows), len(rows[0])
    U32 = np.stack(rows, out=_scratch(np, slot, n * dim, np.int32).reshape(n, dim))
    umax = int(np.abs(U32).max(initial=0))
    Uf = _scratch(np, slot + "_f", n * dim, np.float64).reshape(n, dim)
    np.copyto(Uf, U32)  # exact: |int32| < 2^53
    n2 = _scratch(np, slot + "_n2", n, np.float64)
    np.einsum("ij,ij->i", Uf, Uf, out=n2)
    return Uf, n2, umax


def _sort_diag(np, qid, Uq, nq2):
    """id-sort the diagonal task's query matrix into the (otherwise
    unused on the diagonal) member pool slots — the fancy-index copies
    were the last per-group allocations."""
    qo = np.argsort(qid)
    n, dim = Uq.shape
    Us = np.take(
        Uq, qo, axis=0, out=_scratch(np, "sm_f", n * dim, np.float64).reshape(n, dim)
    )
    n2s = np.take(nq2, qo, out=_scratch(np, "sm_n2", n, np.float64))
    return qid[qo], Us, n2s


class _ChunkCos:
    """Pool-backed exact-cosine chunk scorer (one per kernel group).

    Arithmetic is bit-identical to the per-call
    ``exact_idot_matmul`` form it replaces: the float64-BLAS fast
    path is taken iff umax^2 * DIM < 2^53 with umax over BOTH WHOLE
    matrices (any per-chunk max is <= that, so the branch is at
    least as conservative — and float64 products of exact integers
    below 2^53 are exact in any order), the 2^62 wrap guard raises
    identically, and cos = dots / sqrt(nq2 * nm2) is the same IEEE
    op sequence with ``out=`` destinations into pooled scratch.
    """

    def __init__(self, Uq, nq2, Um, nm2, umax):
        import numpy as np

        self._np = np
        dim = Um.shape[1]
        # Python int guard arithmetic — an int64 umax^2*dim can wrap
        # (same rationale as hyperplane.exact_idot_matmul).
        if umax * umax * dim >= 2**62:
            raise ValueError(
                "pairscan: |u|^2 * DIM exceeds int64 headroom;"
                " the kernel would wrap where the BIGINT oracle errors"
            )
        self.fast = umax * umax * dim < 2.0**53
        self.Uq, self.Um = Uq, Um
        self.nq2, self.nm2 = nq2, nm2
        m = Um.shape[0]
        self._d = _scratch(np, "cc_d", _CHUNK * m, np.float64)
        self._p = _scratch(np, "cc_p", _CHUNK * m, np.float64)
        self._b1 = _scratch(np, "cc_b1", _CHUNK * m, bool)
        self._b2 = _scratch(np, "cc_b2", _CHUNK * m, bool)

    def cos(self, clo, chi, mh):
        """cos matrix view [(chi-clo) x mh] for query rows [clo:chi)
        against member rows [:mh); valid until the next call."""
        np = self._np
        n = chi - clo
        d = self._d[: n * mh].reshape(n, mh)
        if self.fast:
            np.matmul(self.Uq[clo:chi], self.Um[:mh].T, out=d)
        else:
            # exact int64 matmul (wide corpora; alloc-churny but rare):
            # the float64 pool views hold exact integers, so the int64
            # round-trip is lossless below the 2^62 guard.
            d[...] = self.Uq[clo:chi].astype(np.int64) @ self.Um[:mh].astype(
                np.int64
            ).T
        p = self._p[: n * mh].reshape(n, mh)
        np.multiply(self.nq2[clo:chi, None], self.nm2[None, :mh], out=p)
        np.sqrt(p, out=p)
        np.divide(d, p, out=d)
        return d

    def bools(self, n, mh):
        """Two reusable bool scratch views shaped [n x mh]."""
        return (
            self._b1[: n * mh].reshape(n, mh),
            self._b2[: n * mh].reshape(n, mh),
        )


def _pairs_kernel(tau: float):
    """Emit the oriented hit PAIR list (vec_a < vec_b) — the pair-list
    query's actual output, so buffering it in the kernel is bounded by
    the pairs-mode bucket target (worst case target² on a
    fully-duplicate bucket pair)."""

    def kernel(key, m_pdf, q_pdf):
        import numpy as np
        import pandas as pd

        def out(a, b, c):
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(a, dtype="int64"),
                    "vec_b": pd.Series(b, dtype="int64"),
                    "cos": pd.Series(c, dtype="float64"),
                }
            )

        nil = np.empty(0, dtype=np.int64)
        lo, hi = int(key[-2]), int(key[-1])
        if len(q_pdf) == 0 or (lo != hi and len(m_pdf) == 0):
            return out(nil, nil, nil)
        Uq, nq2, umax = _stack_units(q_pdf, "qv", "sq")
        qid = q_pdf["q_id"].to_numpy()
        out_a, out_b, out_c = [], [], []
        if lo == hi:
            qid, Uq, nq2 = _sort_diag(np, qid, Uq, nq2)
            sc = _ChunkCos(Uq, nq2, Uq, nq2, umax)
            for clo in range(0, len(qid), _CHUNK):
                chi = min(clo + _CHUNK, len(qid))
                mh = int(np.searchsorted(qid, qid[chi - 1], side="left"))
                if mh == 0:
                    continue
                cos = sc.cos(clo, chi, mh)
                hit, low = sc.bools(chi - clo, mh)
                np.greater_equal(cos, tau, out=hit)
                np.less(qid[None, :mh], qid[clo:chi, None], out=low)
                np.logical_and(hit, low, out=hit)
                r, c = np.nonzero(hit)
                if len(r):
                    out_a.append(qid[c])
                    out_b.append(qid[clo + r])
                    out_c.append(cos[r, c])
        else:
            Um, nm2, um2 = _stack_units(m_pdf, "mv", "sm")
            mid = m_pdf["m_id"].to_numpy()
            sc = _ChunkCos(Uq, nq2, Um, nm2, max(umax, um2))
            for clo in range(0, len(qid), _CHUNK):
                chi = min(clo + _CHUNK, len(qid))
                cos = sc.cos(clo, chi, len(mid))
                hit, _ = sc.bools(chi - clo, len(mid))
                np.greater_equal(cos, tau, out=hit)
                r, c = np.nonzero(hit)
                if len(r):
                    qi, mi = qid[clo + r], mid[c]
                    out_a.append(np.minimum(qi, mi))
                    out_b.append(np.maximum(qi, mi))
                    out_c.append(cos[r, c])
        if not out_a:
            return out(nil, nil, nil)
        # whole-array appends + one concatenate: list.extend(ndarray)
        # boxes every element into a Python object — measured as the
        # pairs-mode twin of the page-churn the _ChunkCos buffers fix.
        return out(
            np.concatenate(out_a).astype(np.int64, copy=False),
            np.concatenate(out_b).astype(np.int64, copy=False),
            np.concatenate(out_c).astype(np.float64, copy=False),
        )

    return kernel


def _counts_kernel(tau: float):
    """Emit per-task PARTIAL lower-id duplicate counts via RUNNING
    COUNT ARRAYS — a chunk's boolean hit matrix is reduced with
    sum(axis=...), never np.nonzero'd into index lists, so per-task
    memory is independent of hit density (a 100%-duplicate mega-cell
    emits <= 2 x bucket rows).  Off-diagonal tasks count BOTH
    directions: a hit (m, q) increments whichever side has the HIGHER
    id — summed across tasks by the caller, this is exactly each
    vector's n_lower_dups."""

    def kernel(key, m_pdf, q_pdf):
        import numpy as np
        import pandas as pd

        def out(ids, counts):
            keep = counts > 0
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(ids[keep], dtype="int64"),
                    "n": pd.Series(counts[keep], dtype="int64"),
                }
            )

        nil = np.empty(0, dtype=np.int64)
        lo, hi = int(key[-2]), int(key[-1])
        if len(q_pdf) == 0 or (lo != hi and len(m_pdf) == 0):
            return out(nil, nil)
        Uq, nq2, umax = _stack_units(q_pdf, "qv", "sq")
        qid = q_pdf["q_id"].to_numpy()
        if lo == hi:
            qid, Uq, nq2 = _sort_diag(np, qid, Uq, nq2)
            sc = _ChunkCos(Uq, nq2, Uq, nq2, umax)
            counts = np.zeros(len(qid), dtype=np.int64)
            for clo in range(0, len(qid), _CHUNK):
                chi = min(clo + _CHUNK, len(qid))
                mh = int(np.searchsorted(qid, qid[chi - 1], side="left"))
                if mh == 0:
                    continue
                cos = sc.cos(clo, chi, mh)
                hit, low = sc.bools(chi - clo, mh)
                np.greater_equal(cos, tau, out=hit)
                np.less(qid[None, :mh], qid[clo:chi, None], out=low)
                np.logical_and(hit, low, out=hit)
                counts[clo:chi] += hit.sum(axis=1)
            return out(qid, counts)
        Um, nm2, um2 = _stack_units(m_pdf, "mv", "sm")
        mid = m_pdf["m_id"].to_numpy()
        sc = _ChunkCos(Uq, nq2, Um, nm2, max(umax, um2))
        q_counts = np.zeros(len(qid), dtype=np.int64)
        m_counts = np.zeros(len(mid), dtype=np.int64)
        for clo in range(0, len(qid), _CHUNK):
            chi = min(clo + _CHUNK, len(qid))
            cos = sc.cos(clo, chi, len(mid))
            hit, low = sc.bools(chi - clo, len(mid))
            np.greater_equal(cos, tau, out=hit)
            np.less(mid[None, :], qid[clo:chi, None], out=low)
            # low := hit & lower, then hit := hit & ~lower (hit XOR
            # its own subset) — the two directional masks, no temps.
            np.logical_and(hit, low, out=low)
            q_counts[clo:chi] += low.sum(axis=1)
            np.logical_xor(hit, low, out=hit)
            m_counts += hit.sum(axis=0)
        return pd.concat([out(qid, q_counts), out(mid, m_counts)])

    return kernel
