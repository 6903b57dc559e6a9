"""Mechanical plan-quality audit over the driver gate.

For every `__spark_entry__.queries()` entry (plus bench extras with
--extras), build the plan at a small sf and extract measurable plan
facts from the EXECUTED plan string:

  * n_exchange       — shuffle count (Exchange hashpartitioning/range)
  * n_broadcast      — BroadcastExchange count (dimension joins)
  * n_sort_merge     — SortMergeJoin count
  * n_python_udf     — BatchEvalPython / ArrowEvalPython / mapInPandas
                       operators (row-at-a-time Python = red flag;
                       Arrow = declared slow path)
  * pushed_filters   — True if any scan carries PushedFilters: [...]
  * wscg             — WholeStageCodegen span count (JVM fused stages)
  * cartesian        — CartesianProduct/BroadcastNestedLoopJoin count
                       (single-row broadcast bounds joins are the only
                       sanctioned use)

The audit is descriptive, not pass/fail — its value is DIFFS: a new
round that doubles a query's exchanges or sprouts a CartesianProduct
shows up immediately.  Prints one JSON line; the round snapshot can
store it as PLAN_AUDIT_r{N}.json.

Usage: python tools/plan_audit.py [sf_dir] [--extras] [query ...]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def plan_facts(df) -> dict:
    # the audit session runs with AQE OFF (main() sets it): under AQE
    # a DataFrame's executedPlan stays an unmaterialized
    # AdaptiveSparkPlan wrapper with no codegen markers or final join
    # choices.  The static plan is the deterministic, diffable object;
    # AQE at runtime only improves on it (skew splits, broadcast
    # promotions, partition coalescing).
    s = df._jdf.queryExecution().executedPlan().toString()
    wscg = len(set(re.findall(r"\*\((\d+)\)", s)))
    return {
        "n_exchange": len(re.findall(r"\bExchange (?:hash|range|Single)", s)),
        "n_broadcast": s.count("BroadcastExchange"),
        "n_sort_merge": s.count("SortMergeJoin"),
        "n_python_udf": (s.count("BatchEvalPython")
                         + s.count("ArrowEvalPython")
                         + s.count("FlatMapGroupsInPandas")
                         + s.count("MapInPandas")),
        "n_row_python_udf": s.count("BatchEvalPython"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", s)),
        "wscg": wscg,
        "cartesian": (s.count("CartesianProduct")
                      + s.count("BroadcastNestedLoopJoin")),
    }


def main() -> None:
    import importlib.util

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args and "/" in args[0] else SF_DIR
    only = [a for a in args if "/" not in a]
    extras = "--extras" in sys.argv

    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from conduino_spark import release_caches
    from conduino_spark.session import get_spark

    spark = get_spark("plan_audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    qs = dict(m.queries())
    if extras and hasattr(m, "bench_extras"):
        qs.update(m.bench_extras())
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    report, errors = {}, {}
    for name, q in qs.items():
        try:
            df = q(spark, sf)
            # query builders re-assert the driver conf (AQE on); the
            # plan is materialized lazily, so flip it back before
            # reading executedPlan
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            report[name] = plan_facts(df)
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        finally:
            release_caches()
            spark.catalog.clearCache()

    totals = {
        "queries": len(report),
        "with_cartesian": sorted(n for n, f in report.items()
                                 if f["cartesian"]),
        "with_row_python_udf": sorted(n for n, f in report.items()
                                      if f["n_row_python_udf"]),
        "max_exchanges": max((f["n_exchange"] for f in report.values()),
                             default=0),
    }
    out = {"sf": sf, "totals": totals, "plans": report}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
