"""Drill-down for the pairs-mode cold pass: WHERE does worker system
CPU go?  Samples /proc/<pid>/stack (kernel stacks, root-readable) of
the workers with the highest recent stime delta, plus machine-wide
/proc/stat cpu fields, during one cold + one warm pass at sf25.

Companion to profile_pairscan_cold.py, which attributed the r13
85.8-vs-9.3 s cold gap to worker SYS time (cold_vb 650 s, cold_scan
1052 s aggregate worker stime vs ~50 s warm) with LOW minflt.
"""

from __future__ import annotations

import collections
import json
import os
import sys
import threading
import time

import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")


def worker_pids():
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                if b"pyspark.daemon" in f.read():
                    out.append(int(pid))
        except OSError:
            pass
    return out


def stat_fields(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return int(parts[11]), int(parts[12]), int(parts[7])  # ut, st, minflt
    except OSError:
        return None


def kstack(pid):
    try:
        with open(f"/proc/{pid}/stack") as f:
            return f.read()
    except OSError:
        return ""


class StackSampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.phase = "init"
        self.stacks = collections.Counter()  # (phase, topframes) -> n
        self.machine = []  # (phase, us, sy, st) deltas
        self._stop = threading.Event()

    def run(self):
        prev = {}
        prev_cpu = None
        while not self._stop.is_set():
            # machine-wide cpu
            with open("/proc/stat") as f:
                c = f.readline().split()
            cpu = (int(c[1]), int(c[3]), int(c[4]), int(c[8]))  # us sy id st
            if prev_cpu is not None:
                d = tuple(a - b for a, b in zip(cpu, prev_cpu))
                self.machine.append((self.phase, *d))
            prev_cpu = cpu
            # busiest-by-stime workers
            cur = {}
            deltas = []
            for pid in worker_pids():
                s = stat_fields(pid)
                if s is None:
                    continue
                cur[pid] = s
                if pid in prev:
                    deltas.append((s[1] - prev[pid][1], pid))
            prev = cur
            deltas.sort(reverse=True)
            for dst, pid in deltas[:3]:
                if dst <= 0:
                    continue
                txt = kstack(pid)
                top = "|".join(
                    ln.split("+")[0].split("] ")[-1].strip()
                    for ln in txt.splitlines()[:4]
                )
                if top:
                    self.stacks[(self.phase, top)] += 1
            self._stop.wait(0.3)

    def stop(self):
        self._stop.set()


def main() -> None:
    sf_dir = ".scale/sf25"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    sampler = StackSampler()
    sampler.start()
    phases = []

    def phase(name):
        sampler.phase = name
        phases.append((name, time.perf_counter()))

    from pyspark.sql import functions as F

    phase("session")
    from transitdata_omm_cancellation_source_spark.caching import (
        release_tracked,
    )
    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.plans import (
        queries as registry,
    )
    from transitdata_omm_cancellation_source_spark.session import get_spark

    spark = get_spark(app_name="pairscan-stack-profile")

    phase("tables")
    t = load_tables(spark, sf_dir)
    t["embeddings"].count()

    phase("artifact")
    from transitdata_omm_cancellation_source_spark.operators import (
        similarity as _sim,
    )

    _sim.ivf_quantizer(spark, t)

    spec = registry.REGISTRY["dedup_embedding_cosine"]
    for tag in ("cold", "warm"):
        if tag == "warm":
            release_tracked()
            spark.catalog.clearCache()
        phase(tag)
        spec.build(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    phase("done")
    sampler.stop()
    walls = {
        name: round(phases[i + 1][1] - t0, 2)
        for i, (name, t0) in enumerate(phases[:-1])
    }
    # machine cpu per phase
    mach = {}
    for ph, us, sy, idl, st in sampler.machine:
        a = mach.setdefault(ph, [0, 0, 0, 0])
        a[0] += us
        a[1] += sy
        a[2] += idl
        a[3] += st
    print(json.dumps({"phase_wall": walls, "machine_cpu_ticks": mach}))
    top = sampler.stacks.most_common(25)
    for (ph, frames), n in top:
        print(f"{n:5d}  {ph:8s}  {frames}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
