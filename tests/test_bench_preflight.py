"""The bench entrypoint's idle-box preflight (r12 measurement-hygiene
lesson promoted to code): zombie Spark workers from a killed job
poisoned r12 wall clocks 2-60x, so bench.py now refuses to START
timing on a busy box until a bounded wait drains it, and annotates
the summary either way."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def test_idle_box_passes_immediately():
    out = bench.preflight_idle(read=lambda: 1.2, sleep=lambda s: None)
    assert out == {
        "load1_initial": 1.2,
        "load1_at_start": 1.2,
        "waited_sec": 0.0,
        "busy_box": False,
    }


def test_busy_box_waits_until_drained():
    readings = iter([9.0, 8.5, 5.1, 2.0])
    slept = []
    out = bench.preflight_idle(read=lambda: next(readings), sleep=slept.append)
    assert out["load1_initial"] == 9.0
    assert out["load1_at_start"] == 2.0
    assert out["waited_sec"] == 15.0
    assert out["busy_box"] is False
    assert slept == [5.0, 5.0, 5.0]


def test_stuck_busy_box_is_annotated_not_blocked():
    slept = []
    out = bench.preflight_idle(
        read=lambda: 30.0, sleep=slept.append, wait_max=20.0
    )
    assert out["busy_box"] is True
    assert out["waited_sec"] == 20.0
    assert out["load1_at_start"] == 30.0


def test_real_loadavg_reader_returns_float():
    assert isinstance(bench.read_load1(), float)
