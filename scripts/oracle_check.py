"""Driver-gate rehearsal: run the certification window's queries against
their DuckDB oracles at an arbitrary sf (default sf0.01 — the driver's
gate sf, one size up from pytest's sf0.001).

Usage: python scripts/oracle_check.py [sf_dir] [name ...]
With names given, checks only those; otherwise the full window.
"""

from __future__ import annotations

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from transitdata_omm_cancellation_source_spark.plans import queries as registry
from transitdata_omm_cancellation_source_spark.session import get_spark
from transitdata_omm_cancellation_source_spark.testing import assert_oracle_parity


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(registry.certification_window())
    spark = get_spark(app_name="oracle-check")
    failures = []
    for name in names:
        spec = registry.REGISTRY[name]
        t0 = time.perf_counter()
        try:
            df = spec.build(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                status = f"rows-only ({n} rows)"
            else:
                assert_oracle_parity(df, spec.oracle, sf_dir)
                status = "green"
        except Exception:
            status = "RED"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:40s} {status:20s} {time.perf_counter()-t0:6.2f}s", flush=True)
    print(f"\n{len(names)-len(failures)}/{len(names)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
