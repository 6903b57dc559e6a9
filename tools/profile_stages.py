"""Per-stage breakdown for one bench query via the local Spark UI REST API.

Usage: python tools/profile_stages.py query [query ...]

Runs each query once warm (after a sf0.001 warmup + memo prewarm), then
prints every completed stage of the timed run: submission order, wall
span, task time, shuffle bytes, and the first line of the call site.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def api(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession
    from conduino_spark import release_caches
    # conf parity by construction (ADVICE r15): the tuned confs come
    # from the one shared dict the bench session is built from; only
    # the UI knobs (needed for the REST stage API) differ here
    from conduino_spark.session import tuned_confs

    b = (SparkSession.builder.master(f"local[{CPUS}]").appName("stageprof")
         .config("spark.sql.shuffle.partitions", str(CPUS))
         .config("spark.ui.enabled", "true")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.retainedStages", "5000")
         .config("spark.ui.retainedJobs", "5000"))
    for k, v in tuned_confs().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = dict(m.queries())
    if hasattr(m, "bench_extras"):
        qs.update(m.bench_extras())

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            materialize(qs[name](spark, warm_dir))
        except Exception:
            pass
        try:
            materialize(qs[name](spark, SF_DIR))  # memo prewarm
        except Exception as e:  # noqa: BLE001
            print(f"prewarm {name}: {str(e).splitlines()[0][:150]}")
    release_caches()
    spark.catalog.clearCache()

    for name in names:
        before = {s["stageId"] for s in
                  api(f"{ui}/api/v1/applications/{app_id}/stages")}
        t0 = time.time()
        spark.sparkContext.setJobDescription(name)
        materialize(qs[name](spark, SF_DIR))
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        release_caches()
        spark.catalog.clearCache()

        stages = [s for s in
                  api(f"{ui}/api/v1/applications/{app_id}/stages"
                      "?status=complete")
                  if s["stageId"] not in before]
        stages.sort(key=lambda s: s.get("firstTaskLaunchedTime") or
                    s["submissionTime"])
        total_task = sum(s["executorRunTime"] for s in stages)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(stages)} stages, "
              f"task-time {total_task/1000:.1f}s ===")

        def span(s):
            try:
                sub = s["firstTaskLaunchedTime"]
                done = s["completionTime"]
                from datetime import datetime
                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                return (datetime.strptime(done, f)
                        - datetime.strptime(sub, f)).total_seconds()
            except Exception:
                return -1

        for s in stages:
            cs = (s.get("description") or s["details"].split("\n")[0]
                  or "?")[:90]
            nm = s["name"].split(" at ")[0]
            print(f"  st{s['stageId']:>5} {span(s):6.2f}s wall "
                  f"{s['executorRunTime']/1000:7.2f}s task "
                  f"{s['numCompleteTasks']:>4}t "
                  f"sh_r={s['shuffleReadBytes']//1024:>8}K "
                  f"sh_w={s['shuffleWriteBytes']//1024:>8}K  {nm:<28} {cs}")
    spark.stop()


if __name__ == "__main__":
    main()
