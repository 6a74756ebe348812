"""GEMM-gated measurement runner (r16): waits for delivered compute
above the floor, runs one measurement subprocess, brackets it with
probes, and appends a JSON record to plans/r16/measurements.jsonl.

Usage: python scripts/gated_measure.py <label> -- <cmd> [args...]
The record keeps stdout tail + brackets; a run whose closing probe
collapsed is marked degraded (re-run it — the numbers carry steal).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from bench import GEMM_FLOOR_GFLOPS, gemm_gflops  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "plans" / "r16" / "measurements.jsonl"


def wait_healthy(max_wait=3600, interval=20):
    waited = 0
    g = gemm_gflops()
    while g < GEMM_FLOOR_GFLOPS and waited < max_wait:
        time.sleep(interval)
        waited += interval
        g = gemm_gflops()
    return g, waited


def main() -> int:
    label = sys.argv[1]
    assert sys.argv[2] == "--"
    cmd = sys.argv[3:]
    start, waited = wait_healthy()
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = round(time.time() - t0, 1)
    end = gemm_gflops()
    rec = {
        "label": label,
        "cmd": cmd,
        "gemm_start": start,
        "gemm_end": end,
        "gemm_waited_sec": waited,
        "degraded": min(start, end) < GEMM_FLOOR_GFLOPS,
        "wall_sec": wall,
        "rc": proc.returncode,
        "stdout_tail": proc.stdout[-4000:],
        "stderr_tail": proc.stderr[-1500:] if proc.returncode else "",
    }
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in ("label", "gemm_start", "gemm_end", "degraded", "wall_sec", "rc")}))
    print(rec["stdout_tail"][-2000:])
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
