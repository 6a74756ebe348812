"""Bucket-pair (triangle) run scan for the pair-dedup family.

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
split into ``nb`` buckets and the scan unit becomes the bucket PAIR
``(lo, hi)`` with ``lo <= hi``:

- a vector in bucket ``b`` enters the MEMBER side of pairs ``(b, j)``
  for every ``j > b`` and the QUERY side of pairs ``(i, b)`` for every
  ``i <= b`` — so every unordered id pair lands in EXACTLY ONE scan
  unit (the bucket pair of its two ids), and the scan is exact by
  coverage at ANY ``nb >= 1`` (``tests/test_salt_invariance.py`` pins
  1 vs 5 vs adaptive bit-identity; ``nb = 1`` IS the classic
  single-triangle scan, so the same pin is the
  bucket-pair-vs-single-scan equivalence proof).
- the diagonal unit ``(b, b)`` receives only the query side and scores
  the within-bucket triangle (strict ``id_a < id_b``); off-diagonal
  units score the full cross product of two DISJOINT buckets and
  orient each hit by id.

Each vector is replicated into exactly ``nb`` units, and ``nb`` is
PER-BLOCK occupancy-sized (one map-side-combinable count per block,
#blocks output rows): a cold block pays ZERO replication (nb = 1, no
member side at all), so total in-flight rows are Σ_block occ·nb(occ)
and a global width no longer exists.  Two sizing regimes per the
measured negatives above:

- ``mode="pairs"`` (the pair-LIST emitters): nb = pow2ceil(occ /
  4096), capped at 64.  The 4096-row bucket bounds the worst-case
  per-chunk HIT LIST (a fully-duplicate bucket pair emits
  bucket_lo x bucket_hi rows — that list is the query's actual
  output, streamed out in bounded Arrow flushes).
- ``mode="counts"`` (per-vector lower-dup counts): the kernel keeps
  RUNNING COUNT ARRAYS — a chunk's boolean hit matrix is reduced with
  sum(axis), NEVER np.nonzero'd into index lists, so a 100%-duplicate
  mega-cell costs zero extra memory.  Buckets can therefore be
  65536 rows (unit payload ~2 x 17 MB of int32 vectors), and nb stays
  at the 16-unit-parallelism floor until occ outgrows 16 such
  buckets: nb = min(64, max(pow2ceil(occ/65536),
  min(16, pow2ceil(occ/4096)))).  At the measured sf125 distribution
  this cuts the mega-cells' replication x4 vs the flat rule.

EXECUTION: one kernel invocation per PARTITION, not per bucket pair
(r13, the fix for the r12 sf125 ``dedup_embedding_cosine`` negative).
The r12 form cogrouped the (lo <= hi) bucket pairs through
``applyInPandas`` — structurally right (the shuffle measured a healthy
7.5 GB at sf125, no replication blow-up) but throughput-wrong: a
cogroup invokes the Python kernel once per GROUP, and sf125 fans out
into ~200k bucket-pair groups, so the per-group machinery (Arrow ->
pandas conversion, kernel re-entry, per-group output frame) dominated
the wall clock — three 18-28 min runs ended with 0/32 kernel tasks
complete while every worker sat user-CPU-bound in exactly that
overhead.  Now both sides union into ONE tagged stream, hash-
repartitioned by (block, lo, hi) and sorted within partitions by
(block, lo, hi, side, id), and a ``mapInPandas`` kernel walks each
partition's Arrow batches once: batch columns are stacked ONCE per
~10k-row batch (not once per group), bucket-pair runs are detected as
key-change boundaries, each run is scored in place as row slices of
the batch matrix, and a run spanning a batch edge is carried by copy.
Per-group cost is now a few numpy slice views; per-BATCH cost is one
stack + one float64 cast, amortized over every group in the batch.

Hit emission is Arrow-native and streamed: hit arrays append whole
(``list.extend(ndarray)`` boxes per element — the recorded r12
negative) and flush as zero-copy int64/float64 pandas frames every
``_FLUSH_ROWS`` rows, so pairs-mode buffering is bounded by the flush
threshold plus one chunk's hits regardless of how duplicate-dense the
corpus is.

CHUNK HEIGHT IS ADAPTIVE WITHIN A SMALL SCRATCH BUDGET: the scorer
processes query rows in chunks of ``min(cap, max(floor, _AREA //
member_width))``, so a small bucket pair is scored in one or two BLAS
calls instead of 16 skinny ones while the score-matrix pool stays a
few tens of MB — the r13 first-touch measurement at ``_AREA`` shows
why the budget must be small, not merely bounded.  Chunking never
touches arithmetic (every product is an exact integer below the
headroom guards, so any blocking of the matmul yields bit-identical
results).

Payload: vectors ride the shuffle as int32 MICRO-UNITS (``array<int>``
— ``micro_unit_col`` quantizes once, Spark-side, with a fail-loud
range guard), half the bytes of the double vectors and no per-task
requantization.  floor(x*1e6 + 0.5) in Spark float64 arithmetic is the
identical IEEE op sequence the kernels used to run in numpy, so the
integers are bit-identical.

Arithmetic contract (family-wide): micro-unit int64 quantization once,
exact integer dot matrices (float64 BLAS below the 2^53 headroom,
int64 matmul above, raise past 2^62), squared norms computed EXACTLY
in either regime (float64 einsum is exact below 2^53; above it the
norms are int64 einsums cast once — a single correctly-rounded cast,
matching the oracle's CAST(BIGINT AS DOUBLE)), cosine = dots /
sqrt(double * double) — the identical correctly-rounded IEEE op
sequence the DuckDB oracles fold in BIGINT, so engine == oracle stays
integer-exact at every scale and any nb.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pairs-mode bucket target (bounds the worst-case per-chunk hit list)
#: and counts-mode bucket bound (unit payload memory only).
PAIR_GROUP_TARGET = 4096
COUNT_BUCKET_ROWS = 65536
#: parallelism floor: nb = 16 -> 136 units per hot block, 4+ waves on
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
    query_pred: F.Column | None = None,
) -> DataFrame:
    """The bucket-pair run scan (module docstring).

    ``vb``: (id_col, vec_col int32 micro-units — ``micro_unit_col``,
    computed BEFORE the caller's persist so the interpreted HOF never
    re-evaluates per replicated row, *block_cols); ideally persisted —
    three consumers read it (the occupancy count and both run sides).
    ``mode="pairs"`` returns (vec_a, vec_b, cos) with vec_a < vec_b;
    ``mode="counts"`` returns per-unit PARTIAL (vec_id, n) lower-id
    duplicate counts — callers sum across units.

    ``mode="delta"`` (r14, the incremental-dedup scan): exact pairs
    TOUCHING the batch ``query_pred`` selects — batch x corpus crosses
    plus the batch-internal triangle, never corpus x corpus.  The scan
    units are ORDERED bucket pairs (mb, qb) over two INDEPENDENTLY
    sized grids: member buckets from full block occupancy, query
    buckets from BATCH occupancy — so with a small batch nb_q is 1 and
    the corpus side never replicates; total stream bytes are
    Σ occ·nb_q + occ_q·nb_m and total scored elements Σ occ·occ_q —
    both follow the batch, not the corpus².  Blocks the batch never
    touches drop at the occupancy join and are never read.  Coverage:
    a (batch, corpus) pair is scored exactly once (corpus row as
    member); a (batch, batch) pair is scored twice (each side once as
    member) and the kernel's ``m_id < q_id`` mask on BATCH members
    keeps exactly one; equal-id rows never pair (duplicate ids are
    legal input).  Output schema matches ``mode="pairs"``.
    """
    if mode not in ("pairs", "counts", "delta"):
        raise ValueError(f"pair_scan: unknown mode {mode!r}")
    if (query_pred is None) != (mode != "delta"):
        raise ValueError("pair_scan: query_pred is required iff mode='delta'")
    blocks = list(block_cols)
    if mode == "delta":
        return _delta_scan(vb, blocks, tau, id_col, vec_col, query_pred)
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
    # (i, bkt), i <= bkt — always >= 1 key, so the (b, b) diagonal run
    # exists for every non-empty bucket and carries ONLY queries.
    members = vbb.select(
        *blocks,
        F.col("bkt").alias("lo"),
        F.explode(
            F.expr("slice(sequence(bkt, nb - 1), 2, nb - 1 - bkt)")
        ).alias("hi"),
        F.lit(0).alias("side"),
        F.col(id_col).alias("pid"),
        F.col(vec_col).alias("uv"),
    )
    qs = vbb.select(
        *blocks,
        F.explode(F.expr("sequence(0, bkt)")).alias("lo"),
        F.col("bkt").alias("hi"),
        F.lit(1).alias("side"),
        F.col(id_col).alias("pid"),
        F.col(vec_col).alias("uv"),
    )
    # One tagged stream, runs made contiguous: hash-partition on the
    # bucket-pair key (all rows of a run land in one partition — the
    # same distribution the r12 cogroup produced), then an in-partition
    # sort puts members before queries and ids ascending within each
    # side (the kernel's diagonal triangle relies on that order; the
    # sort is the Exchange+Sort the cogroup already paid, with two slim
    # extra keys).
    gcols = blocks + ["lo", "hi"]
    runs = (
        members.unionByName(qs)
        .repartition(*gcols)
        .sortWithinPartitions(*gcols, "side", "pid")
    )
    schema = (
        "vec_a long, vec_b long, cos double"
        if mode == "pairs"
        else "vec_id long, n long"
    )
    return runs.mapInPandas(_run_scan(tau, mode, gcols), schema)


def _delta_scan(
    vb: DataFrame,
    blocks: list,
    tau: float,
    id_col: str,
    vec_col: str,
    query_pred: F.Column,
) -> DataFrame:
    """mode="delta" plan construction (pair_scan docstring)."""
    occ = vb.groupBy(*blocks).agg(F.count(F.lit(1)).alias("occ"))
    qocc = (
        vb.filter(query_pred)
        .groupBy(*blocks)
        .agg(F.count(F.lit(1)).alias("qocc"))
    )
    # INNER join: a block with zero batch rows yields no units at all —
    # the incremental saving's first term.  Broadcast: #blocks rows.
    grids = occ.join(qocc, blocks).select(
        *blocks,
        _pow2_case(F.col("occ"), PAIR_GROUP_TARGET, 1, PAIR_MAX_BUCKETS)
        .cast("int")
        .alias("nbm"),
        _pow2_case(F.col("qocc"), PAIR_GROUP_TARGET, 1, PAIR_MAX_BUCKETS)
        .cast("int")
        .alias("nbq"),
    )
    vbb = vb.select(
        id_col, vec_col, *blocks, query_pred.alias("isq")
    ).join(F.broadcast(grids), blocks)
    # member side: EVERY row of the block, replicated over the query
    # grid; side 1 marks batch rows (the kernel's m_id < q_id dedup
    # mask applies to them only).  query side: batch rows replicated
    # over the member grid.
    members = vbb.select(
        *blocks,
        F.pmod(F.col(id_col), F.col("nbm")).cast("int").alias("lo"),
        F.explode(F.expr("sequence(0, nbq - 1)")).alias("hi"),
        F.when(F.col("isq"), F.lit(1)).otherwise(F.lit(0)).alias("side"),
        F.col(id_col).alias("pid"),
        F.col(vec_col).alias("uv"),
    )
    qs = vbb.filter(F.col("isq")).select(
        *blocks,
        F.explode(F.expr("sequence(0, nbm - 1)")).alias("lo"),
        F.pmod(F.col(id_col), F.col("nbq")).cast("int").alias("hi"),
        F.lit(2).alias("side"),
        F.col(id_col).alias("pid"),
        F.col(vec_col).alias("uv"),
    )
    gcols = blocks + ["lo", "hi"]
    runs = (
        members.unionByName(qs)
        .repartition(*gcols)
        .sortWithinPartitions(*gcols, "side", "pid")
    )
    return runs.mapInPandas(
        _run_scan(tau, "delta", gcols), "vec_a long, vec_b long, cos double"
    )


#: scratch-element budget for one score matrix, with a floor and cap
#: on the adaptive chunk height: ch = min(nq, cap, max(floor,
#: _AREA // member_width)).  The budget is deliberately SMALL (4M
#: elements = 32 MB of float64 per matrix at the pairs-mode bucket
#: width): an r13 measurement showed the real cost of big pools is
#: not bandwidth but FIRST-TOUCH — when 32 workers concurrently fault
#: fresh 200+ MB buffers, the kernel's huge-page zeroing path
#: (folio_zero_user under mmap_lock, plus hypervisor steal) collapses
#: to ~350 ms per 2 MB page: a 230 MB pool's first write measured
#: 40 s and a hit-dense np.nonzero's first 190 MB output 128 s, while
#: every warm repeat ran 0.1-0.3 s.  Small pools fault once, cheaply,
#: and every later group reuses warm pages; the floor keeps the
#: counts-mode diagonal (member width 65536) at the r12-measured
#: 256-row chunk shape instead of degrading to skinny stripes.
_AREA = 1 << 22
_CHUNK_FLOOR = 256
_CHUNK_CAP = 1024
#: output rows buffered before an Arrow flush (pairs mode ~24 MB).
_FLUSH_ROWS = 1 << 20

#: Worker-global scratch pool, keyed by buffer role.  Hot blocks fan
#: out into nb(nb+1)/2 runs and a corpus has tens of thousands more,
#: so per-RUN allocation is a dominant cost at scale: the first
#: triangle sf125 runs spent up to ~90% of machine CPU in the OS
#: kernel (measured: ~10k minor faults/s per worker, worker stime 8x
#: utime) zeroing freshly mmap'd numpy buffers that lived for one
#: group.  Workers are long-lived single-threaded processes
#: (spark.python.worker.reuse), so pooled buffers are faulted once
#: per worker and reused across batches, runs, tasks and queries.
#: Pool footprint is bounded by _AREA (~400 MB/worker at the counts-
#: mode widths) — budget it in executor overhead when sizing a real
#: cluster.
_SCRATCH: dict = {}


def _scratch(np, key, n, dtype):
    """A length-n view of the pooled flat buffer for ``key``."""
    buf = _SCRATCH.get(key)
    if buf is None or buf.size < n:
        cap = 1 << max(n - 1, 1).bit_length()  # geometric growth
        _SCRATCH[key] = buf = np.empty(cap, dtype=dtype)
    return buf[:n]


class _ChunkCos:
    """Pool-backed exact-cosine chunk scorer (one per run).

    The float64-BLAS fast path is taken iff umax^2 * DIM < 2^53 with
    umax over the WHOLE run (any chunk's max is <= that, so the branch
    is at least as conservative — and float64 products of exact
    integers below 2^53 are exact in any order, so chunk blocking
    cannot change a value).  Above the fast bound dots run as exact
    int64 matmuls whose float64 store is the oracle's own
    CAST(BIGINT AS DOUBLE); the 2^62 wrap guard raises before int64
    could wrap.  cos = dots / sqrt(nq2 * nm2) is the same IEEE op
    sequence on both engines, with ``out=`` destinations into pooled
    scratch.
    """

    def __init__(self, np, Uq, nq2, Um, nm2, fast, ch):
        self._np = np
        self.fast = fast
        self.Uq, self.Um = Uq, Um
        self.nq2, self.nm2 = nq2, nm2
        m = Um.shape[0]
        self._d = _scratch(np, "cc_d", ch * m, np.float64)
        self._p = _scratch(np, "cc_p", ch * m, np.float64)
        self._b1 = _scratch(np, "cc_b1", ch * m, bool)
        self._b2 = _scratch(np, "cc_b2", ch * m, bool)

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
            # round-trip is lossless below the 2^62 guard, and the
            # float64 store of each dot is one correctly-rounded cast —
            # identical to the oracle's CAST(idot AS DOUBLE).
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

    def bools3(self, n, mh):
        """A third bool scratch view (delta mode's m>q mask) — pooled
        lazily so the two-mask modes never allocate it."""
        return _scratch(self._np, "cc_b3", n * mh, bool).reshape(n, mh)


class _PairSink:
    """Streamed pairs-mode output: whole-array appends, zero-copy
    int64/float64 pandas flushes (list.extend(ndarray) boxes every
    element — the recorded r12 negative)."""

    def __init__(self, np, pd):
        self._np, self._pd = np, pd
        self._a, self._b, self._c = [], [], []
        self.rows = 0

    def add(self, a, b, c):
        self._a.append(a)
        self._b.append(b)
        self._c.append(c)
        self.rows += len(a)

    def ready(self):
        return self.rows >= _FLUSH_ROWS

    def flush(self):
        np, pd = self._np, self._pd
        nil = np.empty(0, dtype=np.int64)
        out = pd.DataFrame(
            {
                "vec_a": pd.Series(
                    np.concatenate(self._a).astype(np.int64, copy=False)
                    if self._a
                    else nil
                ),
                "vec_b": pd.Series(
                    np.concatenate(self._b).astype(np.int64, copy=False)
                    if self._b
                    else nil
                ),
                "cos": pd.Series(
                    np.concatenate(self._c).astype(np.float64, copy=False)
                    if self._c
                    else nil.astype(np.float64)
                ),
            }
        )
        self._a, self._b, self._c = [], [], []
        self.rows = 0
        return out


class _CountSink:
    """Streamed counts-mode output: per-run partial (vec_id, n) rows
    with zero counts dropped at the source."""

    def __init__(self, np, pd):
        self._np, self._pd = np, pd
        self._ids, self._ns = [], []
        self.rows = 0

    def add(self, ids, counts):
        np = self._np
        keep = counts > 0
        if keep.any():
            self._ids.append(ids[keep])
            self._ns.append(counts[keep])
            self.rows += int(keep.sum())

    def ready(self):
        return self.rows >= _FLUSH_ROWS

    def flush(self):
        np, pd = self._np, self._pd
        nil = np.empty(0, dtype=np.int64)
        out = pd.DataFrame(
            {
                "vec_id": pd.Series(
                    np.concatenate(self._ids).astype(np.int64, copy=False)
                    if self._ids
                    else nil
                ),
                "n": pd.Series(
                    np.concatenate(self._ns).astype(np.int64, copy=False)
                    if self._ns
                    else nil
                ),
            }
        )
        self._ids, self._ns = [], []
        self.rows = 0
        return out


def _scan_unit(np, sink, tau, pairs, lo, hi, ids, side, U32g):
    """Score ONE bucket-pair run (already concatenated across any batch
    edges) and push hits/counts into ``sink``; yields bounded Arrow
    flushes mid-run so pairs-mode buffering never exceeds the flush
    threshold plus one chunk's hits."""
    n, dim = U32g.shape
    split = int(np.searchsorted(side, 1))
    nq = n - split
    diag = lo == hi
    if diag and split:
        # members explode only into j > bkt, so a diagonal run with
        # member rows means the run assembly is broken — fail loud.
        raise AssertionError("pairscan: diagonal run received member rows")
    if nq == 0 or (not diag and split == 0):
        return
    umax = int(np.abs(U32g).max(initial=0))
    # Python int guard arithmetic — an int64 umax^2*dim can wrap.
    if umax * umax * dim >= 2**62:
        raise ValueError(
            "pairscan: |u|^2 * DIM exceeds int64 headroom;"
            " the kernel would wrap where the BIGINT oracle errors"
        )
    fast = umax * umax * dim < 2.0**53
    Uf = _scratch(np, "g_f64", n * dim, np.float64).reshape(n, dim)
    np.copyto(Uf, U32g)  # exact: |int32| < 2^53
    n2 = _scratch(np, "g_n2", n, np.float64)
    if fast:
        # every u^2 term and DIM-term partial sum < 2^53: the float64
        # einsum is exact in any summation order.
        np.einsum("ij,ij->i", Uf, Uf, out=n2)
    else:
        # wide-magnitude corpora: u^2 products past 2^53 would round
        # per-term in float64, so fold the norms EXACTLY in int64 (the
        # 2^62 guard above bounds the sum — no wrap) and store each
        # through one correctly-rounded cast, identical to the
        # oracle's CAST(BIGINT AS DOUBLE).
        n2[...] = np.einsum(
            "ij,ij->i", U32g.astype(np.int64), U32g.astype(np.int64)
        )
    qid = ids[split:]
    Uq, nq2 = Uf[split:], n2[split:]
    if diag:
        # the partition sort delivers ids NON-DECREASING within the
        # side — the triangle's lower-id mask relies on it, so verify
        # cheaply.  Non-decreasing, not strict: duplicate ids are
        # legal input (the sf125 scale corpus's +1e6 planted-id offset
        # collides with real ids past 1M), and every mask below is
        # strict (<) on ids — equal-id rows never pair, exactly the
        # oracle's vec_id_a < vec_id_b semantics.
        if nq > 1 and not bool(np.all(qid[1:] >= qid[:-1])):
            raise AssertionError("pairscan: diagonal run ids not sorted")
        mid, Um, nm2 = qid, Uq, nq2
        m = nq
    else:
        mid, Um, nm2 = ids[:split], Uf[:split], n2[:split]
        m = split
    ch = min(nq, _CHUNK_CAP, max(_CHUNK_FLOOR, _AREA // max(m, 1)))
    sc = _ChunkCos(np, Uq, nq2, Um, nm2, fast, ch)
    # Zero-norm vectors (all |x| < 5e-7 quantize to zero micro-units)
    # score 0/0 against every partner: NaN here, NULL in the DuckDB
    # oracles (division by zero yields NULL there — probed directly on
    # the gate's duckdb, r13), and BOTH fail the 'cos >= tau' gate
    # (greater_equal(NaN) is False; WHERE filters NULL) — so dropping
    # those pairs is the agreed cross-engine semantics, pinned by
    # tests/test_pairscan.py's zero-norm test.
    if not pairs:
        q_counts = _scratch(np, "gc_q", nq, np.int64)
        q_counts[...] = 0
        if not diag:
            m_counts = _scratch(np, "gc_m", m, np.int64)
            m_counts[...] = 0
    for clo in range(0, nq, ch):
        chi = min(clo + ch, nq)
        if diag:
            mh = int(np.searchsorted(qid, qid[chi - 1], side="left"))
            if mh == 0:
                continue
        else:
            mh = m
        cos = sc.cos(clo, chi, mh)
        hit, low = sc.bools(chi - clo, mh)
        np.greater_equal(cos, tau, out=hit)
        if diag:
            np.less(qid[None, :mh], qid[clo:chi, None], out=low)
            np.logical_and(hit, low, out=hit)
        if pairs:
            r, c = np.nonzero(hit)
            if len(r):
                if diag:
                    sink.add(qid[c], qid[clo + r], cos[r, c])
                else:
                    qi, mi = qid[clo + r], mid[c]
                    sink.add(
                        np.minimum(qi, mi), np.maximum(qi, mi), cos[r, c]
                    )
            if sink.ready():
                yield sink.flush()
        elif diag:
            q_counts[clo:chi] += hit.sum(axis=1)
        else:
            # low := hit & lower, then hit := hit & ~lower (hit XOR its
            # own subset) — the two directional masks, no temps.  A hit
            # increments whichever side has the HIGHER id; summed
            # across units this is exactly each vector's n_lower_dups.
            np.less(mid[None, :], qid[clo:chi, None], out=low)
            np.logical_and(hit, low, out=low)
            q_counts[clo:chi] += low.sum(axis=1)
            np.logical_xor(hit, low, out=hit)
            m_counts += hit.sum(axis=0)
    if not pairs:
        sink.add(qid, q_counts)
        if not diag:
            sink.add(mid, m_counts)
        if sink.ready():
            yield sink.flush()


def _scan_unit_delta(np, sink, tau, ids, side, U32g):
    """Score ONE delta-mode run: members (side 0 = corpus, 1 = batch)
    x queries (side 2 = batch), full cross.  Keep mask per the
    coverage proof in pair_scan's docstring: a hit survives iff
    ``m_id < q_id`` OR (the member is a CORPUS row AND ``m_id >
    q_id``) — batch-batch pairs dedup to their one lower-id-member
    unit, batch-corpus pairs keep their single scoring whichever side
    has the lower id, self-pairs and equal-id rows never pair.
    Arithmetic contract identical to _scan_unit (same pooled scorer).
    """
    n, dim = U32g.shape
    s2 = int(np.searchsorted(side, 2))
    nq = n - s2
    if nq == 0 or s2 == 0:
        return
    s1 = int(np.searchsorted(side, 1))  # first BATCH member
    umax = int(np.abs(U32g).max(initial=0))
    if umax * umax * dim >= 2**62:
        raise ValueError(
            "pairscan: |u|^2 * DIM exceeds int64 headroom;"
            " the kernel would wrap where the BIGINT oracle errors"
        )
    fast = umax * umax * dim < 2.0**53
    Uf = _scratch(np, "g_f64", n * dim, np.float64).reshape(n, dim)
    np.copyto(Uf, U32g)
    n2 = _scratch(np, "g_n2", n, np.float64)
    if fast:
        np.einsum("ij,ij->i", Uf, Uf, out=n2)
    else:
        n2[...] = np.einsum(
            "ij,ij->i", U32g.astype(np.int64), U32g.astype(np.int64)
        )
    qid, mid = ids[s2:], ids[:s2]
    allow_gt = _scratch(np, "gd_allow", s2, bool)
    allow_gt[:s1] = True  # corpus members
    allow_gt[s1:s2] = False  # batch members: lower-id-only
    ch = min(nq, _CHUNK_CAP, max(_CHUNK_FLOOR, _AREA // s2))
    sc = _ChunkCos(np, Uf[s2:], n2[s2:], Uf[:s2], n2[:s2], fast, ch)
    for clo in range(0, nq, ch):
        chi = min(clo + ch, nq)
        cos = sc.cos(clo, chi, s2)
        hit, less = sc.bools(chi - clo, s2)
        np.greater_equal(cos, tau, out=hit)
        np.less(mid[None, :], qid[clo:chi, None], out=less)
        gt = sc.bools3(chi - clo, s2)
        np.greater(mid[None, :], qid[clo:chi, None], out=gt)
        gt &= allow_gt[None, :s2]
        less |= gt
        hit &= less
        r, c = np.nonzero(hit)
        if len(r):
            qi, mi = qid[clo + r], mid[c]
            sink.add(np.minimum(qi, mi), np.maximum(qi, mi), cos[r, c])
        if sink.ready():
            yield sink.flush()


def _run_scan(tau: float, mode: str, gcols: Sequence[str]):
    """mapInPandas kernel factory: walk a partition's Arrow batches
    once, stack each batch's vectors ONCE, split it into bucket-pair
    runs at key-change boundaries, and score each run as row slices —
    per-run cost is a few numpy views, per-batch cost is one stack
    (module docstring: the r12 per-group-overhead fix)."""
    pairs = mode in ("pairs", "delta")
    delta = mode == "delta"
    gcols = list(gcols)

    def fn(batches):
        import numpy as np
        import pandas as pd

        sink = _PairSink(np, pd) if pairs else _CountSink(np, pd)
        pend_key = None
        pend: list = []  # (ids, side, U32) pieces of the open run

        def scan(key, parts):
            if len(parts) == 1:
                ids, side, U32 = parts[0]
            else:
                ids = np.concatenate([p[0] for p in parts])
                side = np.concatenate([p[1] for p in parts])
                U32 = np.vstack([p[2] for p in parts])
            if delta:
                return _scan_unit_delta(np, sink, tau, ids, side, U32)
            return _scan_unit(
                np, sink, tau, mode == "pairs", int(key[-2]), int(key[-1]),
                ids, side, U32,
            )

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            rows = pdf["uv"].to_numpy()
            dim = len(rows[0])
            U32 = np.stack(
                rows,
                out=_scratch(np, "rb_i32", n * dim, np.int32).reshape(n, dim),
            )
            ids = pdf["pid"].to_numpy()
            side = pdf["side"].to_numpy()
            kcols = [pdf[c].to_numpy() for c in gcols]
            chg = np.zeros(n, dtype=bool)
            chg[0] = True
            for k in kcols:
                chg[1:] |= k[1:] != k[:-1]
            starts = np.flatnonzero(chg)
            bounds = np.append(starts, n)
            last = len(starts) - 1
            for gi in range(len(starts)):
                s, e = int(bounds[gi]), int(bounds[gi + 1])
                key = tuple(k[s] for k in kcols)
                if pend_key is not None and key != pend_key:
                    yield from scan(pend_key, pend)
                    pend_key, pend = None, []
                pend_key = key
                if gi == last:
                    # the batch's trailing run may continue in the next
                    # batch: carry COPIES (the pooled batch buffers are
                    # about to be overwritten).
                    pend.append(
                        (ids[s:e].copy(), side[s:e].copy(), U32[s:e].copy())
                    )
                else:
                    pend.append((ids[s:e], side[s:e], U32[s:e]))
                    yield from scan(pend_key, pend)
                    pend_key, pend = None, []
        if pend_key is not None:
            yield from scan(pend_key, pend)
        tail = sink.flush()
        if len(tail):
            yield tail

    return fn
