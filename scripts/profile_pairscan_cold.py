"""Attribute the pairs-mode COLD-vs-WARM gap (r13 verdict #1).

r13 measured ``dedup_embedding_cosine`` at sf25 as 85.8 s cold /
9.3 s warm under the run scan, where the r12 cogroup ran 12.6-23.9 s
cold at the same scale.  ~76 s of per-SESSION cost appeared and was
never decomposed.  This harness re-runs the query with every cold
cost phase-timed, so the gap is attributable to one of:

- Python worker boot (daemon fork + numpy/pandas import x 32 — the
  scale_check warm-up materializes the flagship, which is pure
  DataFrame, so the FIRST Python-kernel stage of a session pays all
  32 worker boots; measured directly by ``--import-probe``),
- scratch-pool first touch (should be small after the r13 _AREA fix),
- partition-sort spill / shuffle of the run streams (paid every pass
  — shows up in warm too),
- artifact load / quantizer training (timed separately, disk-cached),
- plain hypervisor steal (bracketing GEMM probes).

Usage:
    python scripts/profile_pairscan_cold.py [--sf DIR] [--passes N]
    python scripts/profile_pairscan_cold.py --import-probe
        # fresh session; measures ONLY worker boot+import wall time

Protocol per scale-measurement hygiene: verify the box idle before
running (top >90% idle, zero stray java).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")


def gemm_probe() -> float:
    """Fixed-shape matmul GFLOP/s (box-health bracketing)."""
    import numpy as np

    n = 2048
    a = np.random.default_rng(0).random((n, n))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        a @ a
        dt = time.perf_counter() - t0
        best = max(best, 2 * n**3 / dt / 1e9)
    return round(best, 1)


class ProcSampler(threading.Thread):
    """2 Hz aggregate CPU sampler over pyspark.daemon workers + the
    driver JVM, tagged with the harness's current phase."""

    def __init__(self):
        super().__init__(daemon=True)
        self.phase = "init"
        self.samples: list[dict] = []
        self._stop = threading.Event()

    @staticmethod
    def _pids():
        workers, jvms = [], []
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if b"pyspark.daemon" in cmd:
                workers.append(int(pid))
            elif b"java" in cmd.split(b"\0", 1)[0]:
                jvms.append(int(pid))
        return workers, jvms

    @staticmethod
    def _cpu(pids):
        ut = st = mf = 0
        for pid in pids:
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
            except OSError:
                continue
            mf += int(parts[7])   # minflt
            ut += int(parts[11])  # utime
            st += int(parts[12])  # stime
        return ut, st, mf

    def run(self):
        while not self._stop.is_set():
            workers, jvms = self._pids()
            wu, ws, wm = self._cpu(workers)
            ju, js, _ = self._cpu(jvms)
            self.samples.append(
                {
                    "t": round(time.perf_counter(), 2),
                    "phase": self.phase,
                    "nworkers": len(workers),
                    "w_utime": wu,
                    "w_stime": ws,
                    "w_minflt": wm,
                    "j_utime": ju,
                    "j_stime": js,
                }
            )
            self._stop.wait(0.5)

    def stop(self):
        self._stop.set()

    def per_phase(self) -> dict:
        """Per-phase deltas of aggregate worker/JVM CPU (seconds)."""
        hz = os.sysconf("SC_CLK_TCK")
        out: dict[str, dict] = {}
        prev = None
        for s in self.samples:
            if prev is not None and s["phase"] != prev["phase"]:
                pass
            prev = s
        # phase boundaries: first/last sample per contiguous phase run
        runs: list[tuple[str, dict, dict]] = []
        for s in self.samples:
            if runs and runs[-1][0] == s["phase"]:
                runs[-1] = (runs[-1][0], runs[-1][1], s)
            else:
                runs.append((s["phase"], s, s))
        for name, a, b in runs:
            out[name] = {
                "wall": round(b["t"] - a["t"], 1),
                "w_cpu_user": round((b["w_utime"] - a["w_utime"]) / hz, 1),
                "w_cpu_sys": round((b["w_stime"] - a["w_stime"]) / hz, 1),
                "w_minflt_k": round((b["w_minflt"] - a["w_minflt"]) / 1e3),
                "j_cpu": round(
                    (b["j_utime"] - a["j_utime"] + b["j_stime"] - a["j_stime"])
                    / hz,
                    1,
                ),
                "workers_seen": b["nworkers"],
            }
        return out


def import_probe() -> None:
    """Fresh session: time the FIRST trivial mapInPandas stage on 32
    partitions (pure worker boot + numpy/pandas import) vs its warm
    repeat — the per-session Python-worker bill, isolated."""
    from transitdata_omm_cancellation_source_spark.session import get_spark

    spark = get_spark(app_name="import-probe")

    def fn(batches):
        import time as _t

        t0 = _t.perf_counter()
        import numpy as np  # noqa: F401
        import pandas as pd

        dt = _t.perf_counter() - t0
        for pdf in batches:
            yield pd.DataFrame(
                {"pid": [os.getpid()], "import_sec": [round(dt, 3)]}
            )

    df = spark.range(0, 32, 1, 32)
    t0 = time.perf_counter()
    rows = df.mapInPandas(fn, "pid long, import_sec double").collect()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.mapInPandas(fn, "pid long, import_sec double").collect()
    warm = time.perf_counter() - t0
    imp = sorted(r.import_sec for r in rows)
    print(
        json.dumps(
            {
                "stage_cold_sec": round(cold, 2),
                "stage_warm_sec": round(warm, 2),
                "n_workers": len(set(r.pid for r in rows)),
                "import_sec_min": imp[0],
                "import_sec_med": imp[len(imp) // 2],
                "import_sec_max": imp[-1],
            }
        )
    )


def main() -> None:
    sf_dir = ".scale/sf25"
    passes = 3
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    if "--import-probe" in sys.argv:
        import_probe()
        return

    report: dict = {"sf_dir": sf_dir, "gemm_start": gemm_probe()}
    sampler = ProcSampler()
    sampler.start()
    phases: list[tuple[str, float]] = []

    def phase(name: str):
        sampler.phase = name
        phases.append((name, time.perf_counter()))

    from pyspark.sql import functions as F

    phase("session")
    from transitdata_omm_cancellation_source_spark.caching import (
        persist_tracked,
        release_tracked,
    )
    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.operators import (
        similarity as _sim,
    )
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        _COSINE_TAU,
    )
    from transitdata_omm_cancellation_source_spark.operators.pairscan import (
        micro_unit_col,
        pair_scan,
    )
    from transitdata_omm_cancellation_source_spark.plans import (
        queries as registry,
    )
    from transitdata_omm_cancellation_source_spark.session import get_spark

    spark = get_spark(app_name="pairscan-cold-profile")

    phase("tables")
    t = load_tables(spark, sf_dir)
    for name in ("embeddings",):
        t[name].count()

    phase("flagship_warmup")
    registry.REGISTRY["cancellation_pipeline_now"].build(
        spark, sf_dir
    ).write.mode("overwrite").format("noop").save()

    phase("artifact")
    quant = _sim.ivf_quantizer(spark, t)

    def build_vb():
        corpus = t["embeddings"].unionAll(
            t["embeddings"]
            .filter(F.col("vec_id") % 20 == 0)
            .select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
        )
        vecs = corpus.select(
            "vec_id",
            "label",
            F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v"),
        )
        return persist_tracked(
            vecs.join(
                _sim.assign_to_centroids(vecs, _sim.ivf_quantizer(spark, t)),
                "vec_id",
            ).select(
                "vec_id", micro_unit_col("v").alias("uv"), "label", "cell"
            )
        )

    for pass_no in range(passes):
        if pass_no:
            release_tracked()
            spark.catalog.clearCache()
        tag = "cold" if pass_no == 0 else f"warm{pass_no}"
        phase(f"{tag}_vb")  # assign kernel: first Python stage when cold
        vb = build_vb()
        vb.count()
        phase(f"{tag}_scan")
        scan = pair_scan(vb, ["label", "cell"], _COSINE_TAU, mode="pairs")
        scan.select(
            "vec_a", "vec_b", F.round("cos", 6).alias("cosine")
        ).write.mode("overwrite").format("noop").save()
        spark.sparkContext._jvm.System.gc()

    phase("done")
    sampler.stop()
    report["gemm_end"] = gemm_probe()
    walls = {
        name: round(phases[i + 1][1] - t0, 2)
        for i, (name, t0) in enumerate(phases[:-1])
    }
    report["phase_wall"] = walls
    report["phase_proc"] = sampler.per_phase()
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
