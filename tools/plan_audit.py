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


#: pass-through nodes that cannot increase a subtree's row count —
#: walking through them preserves a ≤1-row proof
_ONE_ROW_WRAPPERS = (
    "WholeStageCodegen", "InputAdapter", "Project", "Filter", "Sort",
    "Coalesce", "Exchange", "BroadcastExchange", "AQEShuffleRead",
    "ColumnarToRow", "InMemoryRelation",
)


def _max_one_row(node) -> bool:
    """True when the physical subtree PROVABLY produces ≤1 row: a
    global (keys=[]) aggregate, a limit ≤1, or a ≤1-row local table —
    possibly under row-preserving wrappers.  Conservative: anything
    unproven is False."""
    name = node.nodeName()
    if name == "ReusedExchange":
        # leaf node referencing the original exchange: children() is
        # empty by design, the referenced plan hangs off .child()
        try:
            return _max_one_row(node.child())
        except Exception:
            return False
    if name == "InMemoryTableScan":
        # persisted frames (plans.cachereg.track of 1-row sketches):
        # the cached plan hangs off the relation, not children()
        try:
            return _max_one_row(node.relation().cachedPlan())
        except Exception:
            return False
    if name == "AdaptiveSparkPlan":
        # cached plans persisted under AQE wrap in AdaptiveSparkPlanExec;
        # the physical tree hangs off executedPlan()
        try:
            return _max_one_row(node.executedPlan())
        except Exception:
            return False
    if name.endswith("QueryStage"):  # Shuffle/Broadcast/TableCache stage
        try:
            return _max_one_row(node.plan())
        except Exception:
            return False
    if name in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        # a cross of two ≤1-row sides is itself ≤1 row (stacked
        # broadcast-bounds joins: corpus × sketch-row × total-row)
        ch = node.children()
        return all(_max_one_row(ch.apply(i)) for i in range(ch.size()))
    if "Aggregate" in name:  # HashAggregate / SortAggregate / Object…
        # MUST precede the wrapper branch: "Sort" is a prefix of
        # "SortAggregate", and a keyed SortAggregate is NOT ≤1-row.
        return bool(re.search(r"Aggregate\s*\(?keys=\[\s*\]",
                              node.verboseString(10)))
    if (name in _ONE_ROW_WRAPPERS
            or name.startswith("WholeStageCodegen")):  # "… (3)" suffix
        ch = node.children()
        if ch.size() == 1:
            return _max_one_row(ch.apply(0))
        return False
    if name in ("GlobalLimit", "LocalLimit", "CollectLimit"):
        return bool(re.match(rf"{name}\s+1[,\s]", node.verboseString(10)))
    if name == "LocalTableScan":
        try:
            return node.rows().size() <= 1
        except Exception:
            return False
    return False


def classify_cartesians(jplan) -> "tuple[int, int]":
    """(total, real) CartesianProduct/BroadcastNestedLoopJoin count in
    an executed plan.  A cartesian is BENIGN when one input is provably
    ≤1 row (the sanctioned broadcast-bounds pattern, plans/core.py) —
    cost is linear in the other side.  Anything else is REAL: a
    scale-killer the audit must fail on instead of letting it blend
    into the benign population (VERDICT r6 #6)."""
    total = real = 0
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            total += 1
            ch = node.children()
            kids = [ch.apply(i) for i in range(ch.size())]
            if not any(_max_one_row(k) for k in kids):
                real += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        # subqueries host their own plans (scalar bounds live there)
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:
            pass
    return total, real


def count_exchanges(jplan) -> int:
    """Shuffle-exchange count by TREE WALK with cached-plan dedup
    (r10).  The old string count overstated persisted plans: an
    InMemoryRelation referenced k times prints its cached lineage k
    times, so one shared `track()` cache's exchanges counted k-fold —
    but the cache materializes ONCE.  Walk the tree, count Exchange
    nodes, and descend into each DISTINCT cached plan exactly once
    (ReusedExchange is skipped — reuse doesn't re-shuffle)."""
    seen_caches = set()
    n = 0
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name == "Exchange":
            n += 1
        if name == "ReusedExchange":
            continue
        if name == "InMemoryTableScan":
            try:
                cp = node.relation().cachedPlan()
                key = cp.toString()
                if key not in seen_caches:
                    seen_caches.add(key)
                    stack.append(cp)
            except Exception:
                pass
            continue
        if name == "AdaptiveSparkPlan":
            try:
                stack.append(node.executedPlan())
            except Exception:
                pass
            continue
        if name.endswith("QueryStage"):
            # materialized-cache internals (Shuffle/Broadcast/Result
            # stages) hang off .plan(), not children()
            try:
                stack.append(node.plan())
            except Exception:
                pass
            continue
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:
            pass
    return n


def plan_facts(df) -> dict:
    # the audit session runs with AQE OFF (main() sets it): under AQE
    # a DataFrame's executedPlan stays an unmaterialized
    # AdaptiveSparkPlan wrapper with no codegen markers or final join
    # choices.  The static plan is the deterministic, diffable object;
    # AQE at runtime only improves on it (skew splits, broadcast
    # promotions, partition coalescing).
    jplan = df._jdf.queryExecution().executedPlan()
    s = jplan.toString()
    wscg = len(set(re.findall(r"\*\((\d+)\)", s)))
    n_cart, n_real = classify_cartesians(jplan)
    return {
        "n_exchange": count_exchanges(jplan),
        "n_broadcast": s.count("BroadcastExchange"),
        "n_sort_merge": s.count("SortMergeJoin"),
        "n_python_udf": (s.count("BatchEvalPython")
                         + s.count("ArrowEvalPython")
                         + s.count("FlatMapGroupsInPandas")
                         + s.count("MapInPandas")),
        "n_row_python_udf": s.count("BatchEvalPython"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", s)),
        "wscg": wscg,
        "cartesian": n_cart,
        "real_cartesian": n_real,
        # r8: substituted-predicate smell.  PushPredicateThroughNonJoin
        # inlines filter conditions through deterministic Projects with
        # NO cost guard — a filter on a derived column of an expensive
        # projection silently becomes a giant interpreted per-row
        # predicate (the corpus_filter keep_only bug: 20x).  A Filter
        # node whose condition text exceeds the threshold is that
        # smell made mechanical.
        "giant_filter": _max_filter_len(s) > 4000,
        "max_filter_len": _max_filter_len(s),
    }


def _max_filter_len(plan_str: str) -> int:
    """Length of the longest Filter node's condition text (one line in
    the plan rendering)."""
    best = 0
    for line in plan_str.splitlines():
        t = line.lstrip(" +-:*()0123456789")
        if t.startswith("Filter ") or t.startswith("PhotonFilter "):
            best = max(best, len(t))
    return best


#: gate-pin weight budget (VERDICT r9 #2)
BUDGET_SEC_SF01 = 10.0
BUDGET_EXCHANGES = 60


def _over_budget(report: dict, gate_names: set) -> dict:
    """Gate pins breaching the weight budget: > BUDGET_EXCHANGES
    exchanges (from this audit's plans) or > BUDGET_SEC_SF01 seconds
    at sf0.1 (from the latest bench_out.json, when present and at the
    budget's sf).  Returns {pin: {"exchanges": n, "sec": s}} with only
    the breaching dimension(s) populated."""
    sec = {}
    bench = Path(__file__).resolve().parent.parent / "bench_out.json"
    try:
        b = json.loads(bench.read_text())
        if abs(float(b.get("sf", 0)) - 0.1) < 1e-9:
            sec = b.get("queries", {})
        # ADVICE r10: bench_out.json has no tie to the audited
        # revision — a benchmark older than the newest source file can
        # fail a pin already fixed or green-light one that regressed.
        # Skip the seconds dimension (with a stderr note) when any
        # audited source is newer than the benchmark.
        import sys as _sys
        root = bench.parent
        src_mtime = max(
            (p.stat().st_mtime for pat in
             ("conduino_spark/**/*.py", "__spark_entry__.py")
             for p in root.glob(pat)), default=0.0)
        if bench.stat().st_mtime < src_mtime:
            sec = {}
            print("plan_audit: bench_out.json predates the audited "
                  "source — seconds budget skipped (re-run bench.py "
                  "to restore it)", file=_sys.stderr)
    except Exception:
        pass
    flagged = {}
    for name in sorted(gate_names):
        entry = {}
        f = report.get(name)
        if f and f["n_exchange"] > BUDGET_EXCHANGES:
            entry["exchanges"] = f["n_exchange"]
        if name in sec and sec[name] > BUDGET_SEC_SF01:
            entry["sec"] = sec[name]
        if entry:
            flagged[name] = entry
    return flagged


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

    gate_names = set(m.queries())
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
        "with_real_cartesian": sorted(n for n, f in report.items()
                                      if f["real_cartesian"]),
        "with_row_python_udf": sorted(n for n, f in report.items()
                                      if f["n_row_python_udf"]),
        "with_giant_filter": sorted(n for n, f in report.items()
                                    if f["giant_filter"]),
        "max_exchanges": max((f["n_exchange"] for f in report.values()),
                             default=0),
        # r10 (VERDICT r9 #2): per-GATE-pin weight budget — a pin over
        # ~10 s at sf0.1 or over ~60 exchanges slows every driver gate
        # pass and makes a red row hard to localize; the rotation
        # strategy must split it instead of concentrating arms.
        # Seconds come from the latest bench_out.json when its sf
        # matches the budget's (bench-only extras are exempt — floors
        # may legitimately be heavy, e.g. the full-corpus exact
        # tf-idf join).
        "over_budget": _over_budget(report, gate_names),
    }
    out = {"sf": sf, "totals": totals, "plans": report}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()
    # a REAL (neither-side-≤1-row) cartesian is a scale-killer, not a
    # style note: fail the audit so it can't blend into the benign
    # broadcast-bounds population; an over-budget gate pin is the same
    # class of must-fix (the budget exists to stay enforced)
    if totals["with_real_cartesian"] or totals["over_budget"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
