"""Decompose per-query bench wall into build() (driver-side plan
construction incl. load_tables + eager actions) vs the noop execute.

Usage: python scripts/profile_build_overhead.py [sf_dir] [name ...]

Guide §1 (measure first): the bench times ``build + noop`` as one
region; if the DRIVER-side fixed cost (catalog re-loads, py4j
round-trips, eager artifact training) is a material slice of the
110-query total, that is a cross-cutting target invisible in any
single query's plan.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from transitdata_omm_cancellation_source_spark.caching import release_tracked
from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.plans import queries as registry
from transitdata_omm_cancellation_source_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or list(registry.queries())
    spark = get_spark(app_name="profile-build-overhead")
    # warm-up: catalog + one flagship materialize, mirroring bench.py
    tables = load_tables(spark, sf_dir)
    for name in ("lineitem", "documents", "embeddings"):
        tables[name].count()
    spec = registry.REGISTRY["cancellation_pipeline_now"]
    spec.build(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # isolate load_tables cost itself (warm catalog)
    lt = []
    for _ in range(20):
        t0 = time.perf_counter()
        load_tables(spark, sf_dir)
        lt.append(time.perf_counter() - t0)
    print(f"load_tables warm: min={min(lt)*1e3:.1f}ms median="
          f"{sorted(lt)[len(lt)//2]*1e3:.1f}ms max={max(lt)*1e3:.1f}ms")

    rows = []
    for name in names:
        if name not in registry.REGISTRY:
            continue
        s = registry.REGISTRY[name]
        t0 = time.perf_counter()
        df = s.build(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        rows.append({"name": name, "build": round(t1 - t0, 3),
                     "exec": round(t2 - t1, 3)})
        print(f"{name:40s} build={t1-t0:7.3f}s exec={t2-t1:7.3f}s", flush=True)
    total_build = sum(r["build"] for r in rows)
    total_exec = sum(r["exec"] for r in rows)
    print(f"TOTAL build={total_build:.1f}s exec={total_exec:.1f}s "
          f"(build share {100*total_build/(total_build+total_exec):.1f}%)")
    out = pathlib.Path(__file__).resolve().parents[1] / "plans" / "r15" / "build_overhead.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"sf_dir": sf_dir, "load_tables_warm_ms": round(min(lt) * 1e3, 1),
                               "rows": rows}, indent=1))
    release_tracked()
    return 0


if __name__ == "__main__":
    sys.exit(main())
