"""Per-stage task-time skew evidence for one registry query.

The r11 sf125 `corpus_semdedup` failure mode was invisible in
wall-clock alone: Σ-work was fine, but ONE (cell, salt) task ran ~90
minutes while 31 cores idled.  This harness runs a single query with
the Spark UI's REST API enabled and prints, for the top stages by
total task time, the max/mean/median task duration and task count —
the "max-task within ~Kx of mean" check the bucket-pair rewrite is
graded on.

Usage:
    python scripts/task_skew_probe.py <sf_dir> <query_name>
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
# match the engine session's worker allocator (session.get_spark)
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 * 1024 * 1024))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 * 1024 * 1024))


def main() -> int:
    sf_dir, name = sys.argv[1], sys.argv[2]

    from pyspark.sql import SparkSession

    from transitdata_omm_cancellation_source_spark.plans import (
        queries as registry,
    )
    from transitdata_omm_cancellation_source_spark.session import (
        apply_runtime_confs,
    )

    # the engine session's confs (session.get_spark), but with the
    # UI's REST API ON — the one knob get_spark pins off.
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("task-skew-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g")
        )
        .config("spark.ui.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    spark = apply_runtime_confs(spark)
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("no UI url — spark.ui.enabled override did not take", flush=True)
        return 1

    t0 = time.perf_counter()
    df = registry.REGISTRY[name].build(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    print(f"{name} @ {sf_dir}: wall {wall:.1f}s", flush=True)

    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    print(
        f"{'stage':>6} {'tasks':>6} {'sum_s':>9} {'mean_s':>8} "
        f"{'max_s':>8} {'max/mean':>8}  top task-time stages"
    )
    for s in stages[:8]:
        n = s.get("numCompleteTasks") or 0
        tot = (s.get("executorRunTime") or 0) / 1000.0
        if not n or tot <= 0:
            continue
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages/"
            f"{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,1.0"
        ) as r:
            q = json.load(r)
        lo, med, hi = (v / 1000.0 for v in q["executorRunTime"])
        mean = tot / n
        print(
            f"{s['stageId']:>6} {n:>6} {tot:>9.1f} {mean:>8.2f} "
            f"{hi:>8.2f} {hi / mean if mean else 0:>8.1f}"
            f"  ({s.get('name', '')[:60]})"
        )
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
