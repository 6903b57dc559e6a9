"""Time individual bench queries in isolation with the noop sink.

Usage: python tools/profile_query.py [-n N] query [query ...]

Replicates the bench methodology for a subset: warmup at sf0.001,
index-memo prewarm pass at SF_DIR, then N timed noop materializations
each (min + all samples reported), releasing tracked caches between
samples.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from conduino_spark.session import get_spark
    from conduino_spark import release_caches

    spark = get_spark("profile", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = dict(m.queries())
    if hasattr(m, "bench_extras"):
        qs.update(m.bench_extras())

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if name in qs and os.path.isdir(warm_dir) and warm_dir != SF_DIR:
            try:
                materialize(qs[name](spark, warm_dir))
            except Exception as e:  # noqa: BLE001
                print(f"warmup {name}: {str(e).splitlines()[0][:150]}")
    release_caches()
    spark.catalog.clearCache()
    # index-memo prewarm (matches bench.py)
    for name in names:
        if name in qs:
            try:
                materialize(qs[name](spark, SF_DIR))
            except Exception:
                pass
    release_caches()
    spark.catalog.clearCache()

    for name in names:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        samples = []
        for _ in range(n):
            t0 = time.time()
            try:
                spark.sparkContext.setJobDescription(name)
                materialize(qs[name](spark, SF_DIR))
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
                break
            finally:
                spark.sparkContext.setJobDescription(None)
                release_caches()
                spark.catalog.clearCache()
            samples.append(time.time() - t0)
        if samples:
            print(f"{name}: min {min(samples):.3f}s  "
                  f"samples {[round(s, 3) for s in samples]}  "
                  f"load {os.getloadavg()[0]:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
