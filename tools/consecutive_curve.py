"""Consecutive scale curve (VERDICT r8 #6): the r8 10x probe's worst
ratio was consecutive at 2.57x, with the hypothesis that the 1x floor
is fixed-overhead-dominated (the chunked carry path has no global
window — the work is one range shuffle + per-partition window + a
broadcast carry join, all linear).

This probe tests that hypothesis directly: time consecutive(3) at
1x / 2x / 5x / 10x over a LARGER base (sf0.1 events replicated
``base_mult`` times, default 4 — ~4x the r8 probe's base), min-of-3
interleaved.  If the r8 ratio was overhead, the curve's marginal
ratios t(10)/t(5) and t(5)/t(2) should sit near the replica ratios
(2x and 2.5x) while t(2)/t(1) stays depressed by the shared floor —
and the 10x/1x ratio at this base should come in under the r8 2.57.

Usage: python tools/consecutive_curve.py [sf_dir] [base_mult]
Prints one JSON line; stored as CONSEC_CURVE_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BASE_MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def replicated(spark, n):
    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    parts = [base.select(
        (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
        (F.col("user_id") + F.lit(i * 1_000_000)).alias("v"))
        for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from conduino_spark import (consecutive, from_dataframe,
                                release_caches, run_pipe, sink_df)
    from conduino_spark.session import get_spark

    spark = get_spark("consec_curve", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    mults = [1, 2, 5, 10]
    frames = {m: replicated(spark, m * BASE_MULT) for m in mults}
    n_rows = {m: frames[m].count() for m in mults}

    def run(m) -> float:
        t0 = time.time()
        run_pipe(from_dataframe(frames[m], seq_col="event_id")
                 | consecutive(3) | sink_df(), spark) \
            .write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_caches()
        spark.catalog.clearCache()
        return dt

    best = {m: float("inf") for m in mults}
    for _ in range(3):                      # interleaved min-of-3
        for m in mults:
            best[m] = min(best[m], run(m))

    t = {m: round(best[m], 3) for m in mults}
    out = {
        "note": (f"consecutive(3) chunked-carry path, base = sf0.1 "
                 f"events x{BASE_MULT} ({n_rows[1]} rows at 1x)"),
        "rows": n_rows,
        "t": {str(m): t[m] for m in mults},
        "ratio_10x_1x": round(t[10] / t[1], 2),
        "marginal": {
            "2x_1x": round(t[2] / t[1], 2),
            "5x_2x": round(t[5] / t[2], 2),
            "10x_5x": round(t[10] / t[5], 2),
        },
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
