"""Delta-cost curve for the incremental-dedup family (r14 verdict #2).

Measures the doc and embedding delta legs at shrinking batch fractions
(~1/7 ... ~1e-3) against one standing corpus index, plus the
full-recompute baseline — the evidence that incremental cost follows
the BATCH down to a fixed floor, and what that floor is.

Modes:
  python scripts/delta_curve.py --dir .scale/sf25 --leg doc \
      --mods 7,100,1000            # curve: cold index build/publish,
                                   # then warm steady-state per batch
                                   # fraction, then the full baseline
  python scripts/delta_curve.py --dir .scale/sf25 --leg doc \
      --mods 1000 --fresh          # FRESH-SESSION probe: a new process
                                   # that must LOAD the index from the
                                   # disk artifact (verdict #1's
                                   # fresh≈warm steady-state row)

Each timed region is bracketed with the bench GEMM probe so a
steal-degraded interval is visible in the row (r14's lesson: loadavg
cannot see hypervisor steal).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

import bench  # GEMM probes (repo root, path inserted above)
from pyspark.sql import functions as F

from transitdata_omm_cancellation_source_spark.caching import release_tracked
from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.session import get_spark


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _timed(label: str, fn) -> float:
    g0 = bench.gemm_gflops()
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    g1 = bench.gemm_gflops()
    br = bench.gemm_bracket(g0, g1)
    tag = "DEGRADED" if br["degraded"] else "ok"
    print(
        f"{label:36s} {wall:9.1f} s   probe {g0:6.1f}->{g1:6.1f} GF/s [{tag}]",
        flush=True,
    )
    return wall


def _doc_delta(t, mod: int, rem: int):
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        delta_batch_pairs,
    )

    return delta_batch_pairs(t, F.col("doc_id") % mod == rem)


def _emb_delta(spark, t, mod: int, rem: int):
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        delta_embedding_pairs,
    )

    return delta_embedding_pairs(spark, t, F.col("vec_id") % mod == rem)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale/sf25")
    ap.add_argument("--leg", choices=["doc", "emb"], required=True)
    ap.add_argument("--mods", default="7,100,1000")
    ap.add_argument("--rem", type=int, default=3)
    ap.add_argument("--fresh", action="store_true",
                    help="fresh-session probe: index must LOAD from disk")
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()
    mods = [int(m) for m in args.mods.split(",")]

    spark = get_spark(app_name=f"delta-curve-{args.leg}")
    t = load_tables(spark, args.dir)
    id_col = "doc_id" if args.leg == "doc" else "vec_id"
    src = t["documents" if args.leg == "doc" else "embeddings"]
    n = src.count()
    print(f"# delta curve leg={args.leg} dir={args.dir} base rows={n} "
          f"fresh={args.fresh}", flush=True)

    def build(mod: int):
        rem = args.rem % mod
        if args.leg == "doc":
            return _doc_delta(t, mod, rem)
        return _emb_delta(spark, t, mod, rem)

    if args.fresh:
        # one probe only: this process has never built anything — the
        # wall below IS the fresh-session first-delta-batch cost
        # (index load + the batch's own work).
        for mod in mods:
            _timed(f"fresh-session delta 1/{mod}", lambda m=mod: _noop(build(m)))
        return

    # cold: first call builds AND publishes the standing index (or
    # loads it, if a previous run already published for this corpus —
    # the printout says which by magnitude).
    _timed(f"cold first delta 1/{mods[0]}", lambda: _noop(build(mods[0])))
    # warm steady state per batch fraction (index standing, served
    # from the session cache — the production daily-batch shape).
    for mod in mods:
        rem = args.rem % mod
        bn = src.filter(F.col(id_col) % mod == rem).count()
        _timed(
            f"warm delta 1/{mod} (batch {bn} rows)",
            lambda m=mod: _noop(build(m)),
        )
    if not args.skip_full:
        release_tracked()
        spark.catalog.clearCache()
        name = (
            "dedup_minhash_lsh" if args.leg == "doc"
            else "dedup_embedding_cosine"
        )
        from transitdata_omm_cancellation_source_spark.plans.queries import (
            REGISTRY,
        )

        _timed(
            f"full recompute ({name})",
            lambda: _noop(REGISTRY[name].build(spark, args.dir)),
        )


if __name__ == "__main__":
    main()
