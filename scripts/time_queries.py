"""Ad-hoc per-query timer: best-of-N wall clock for named registry
queries at one scale dir.  Usage:

    python scripts/time_queries.py SF_DIR q1 q2 ... [--passes N]

Same materialization discipline as bench.py (noop write after a
catalog warm-up; tracked persists + SQL cache released between passes).
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from transitdata_omm_cancellation_source_spark.caching import release_tracked
from transitdata_omm_cancellation_source_spark.catalog import load_tables
from transitdata_omm_cancellation_source_spark.plans import queries as registry
from transitdata_omm_cancellation_source_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
    sf_dir, names = args[0], args[1:]
    spark = get_spark(app_name="time-queries")
    tables = load_tables(spark, sf_dir)
    for t in ("lineitem", "documents", "embeddings"):
        tables[t].count()
    best: dict[str, float] = {}
    for p in range(passes):
        if p:
            release_tracked()
            spark.catalog.clearCache()
        for name in names:
            t0 = time.perf_counter()
            df = registry.REGISTRY[name].build(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            el = round(time.perf_counter() - t0, 2)
            best[name] = min(best.get(name, el), el)
            print(f"pass{p} {name}: {el}s", flush=True)
    print("BEST:", {n: best[n] for n in names})


if __name__ == "__main__":
    main()
