"""Dump .explain("formatted") for bench/gate queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [query ...]
         tag e.g. "r15/before" -> plans/r15/<query>_before.txt
         tag e.g. "r15/after"  -> plans/r15/<query>_after.txt
With no query list, dumps every bench query (queries() + bench_extras).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15/before"
    rdir, _, suffix = tag.partition("/")
    only = sys.argv[2:]

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from conduino_spark.session import get_spark
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(m.queries())
    if hasattr(m, "bench_extras"):
        qs.update(m.bench_extras())
    names = only or list(qs)

    out_dir = Path(__file__).resolve().parent.parent / "plans" / rdir
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        if name not in qs:
            print(f"SKIP {name}: unknown")
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            continue
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n_exch = plan.count("Exchange")
        n_py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
                + plan.count("MapInArrow") + plan.count("FlatMapGroupsInPandas")
                + plan.count("MapInPandas"))
        print(f"OK {name}: {len(plan.splitlines())} lines, "
              f"{n_exch} Exchange, {n_py} py-nodes [{time.time()-t0:.1f}s]")
    spark.stop()


if __name__ == "__main__":
    main()
