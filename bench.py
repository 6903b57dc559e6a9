"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Results are materialized with a noop write (full row computation, no
driver collect) except tiny aggregates, which are collected.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline set: relational + ordered/stateful + LLM ops
BENCH_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "scan_cumsum", "pairs_lag", "map_accum_altsum", "window_tumbling",
    "map_project", "concat_map_tokens",
    "token_count", "quality_score", "lang_id", "fingerprint",
    "dedup_exact", "minhash_pairs", "simhash", "ngram_jaccard_lsh",
    "cosine_scores", "knn_bruteforce",
]


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from conduino_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup on an unrelated job
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = m.queries()
    # warmup: run every headline plan once at the smallest sf so the
    # timed runs measure execution, not whole-stage-codegen compilation
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != SF_DIR:
        for name in BENCH_QUERIES:
            if name in qs:
                try:
                    materialize(qs[name](spark, warm_dir))
                except Exception:
                    pass
        spark.catalog.clearCache()

    # best-of-3, INTERLEAVED: the box is shared and noise bursts last
    # seconds-to-minutes — consecutive repeats of one query all land
    # inside a burst (observed: 3 straight runs at 20x).  Three passes
    # over the whole list spread each query's samples across the full
    # bench duration; min per query is the reproducible plan cost.
    from conduino_spark import release_caches

    samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES if n in qs}
    for _round in range(3):
        for name in samples:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            materialize(df)
            samples[name].append(time.time() - t0)
            release_caches()            # registry-tracked persists
            spark.catalog.clearCache()  # plus anything cached directly
    times = {n: round(min(rs), 3) for n, rs in samples.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf else SF_DIR,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
