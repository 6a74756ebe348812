"""Dump ``explain("formatted")`` for registry queries to plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [name ...]
e.g. ``python scripts/capture_plans.py r15_before`` writes
``plans/r15/<query>_before.txt`` for every registry entry (tag suffix
after the round id selects the filename suffix).

Guide §1: plan-shape evidence (Exchange count, join strategy,
PushedFilters/ReadSchema, BatchEvalPython nodes) is the before/after
artifact the optimization round keeps next to the bench numbers.
"""

from __future__ import annotations

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from transitdata_omm_cancellation_source_spark.plans import queries as registry
from transitdata_omm_cancellation_source_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15_before"
    names = sys.argv[2:] or list(registry.queries())
    round_id, _, suffix = tag.partition("_")
    out_dir = pathlib.Path(__file__).resolve().parents[1] / "plans" / round_id
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="capture-plans")
    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = registry.REGISTRY[name].build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out_dir / f"{name}_{suffix}.txt").write_text(plan)
            status = "ok"
        except Exception:
            traceback.print_exc()
            failures.append(name)
            status = "FAIL"
        print(f"{name:40s} {status} {time.perf_counter()-t0:6.2f}s", flush=True)
    print(f"{len(names)-len(failures)}/{len(names)} captured; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
