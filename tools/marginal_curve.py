"""Marginal-cost curves (VERDICT r9 #6): the r9 10x probe's three
~2.2x ratios — dsir_select 2.21x, pca_moments 2.27x, nb_train_score
2.07x — with the hypothesis that each 1x floor is fixed-overhead
dominated (the same decomposition CONSEC_CURVE_r09 proved for
consecutive).

Method (the consecutive_curve protocol): time each op at 1x / 2x /
5x / 10x over a LARGER base (sf0.1 tables replicated ``base_mult``
times, default 4), min-of-3 interleaved.  If an r9 ratio was a fixed
floor, the marginal ratios t(10)/t(5) and t(5)/t(2) should approach
the replica ratios (2x and 2.5x) while t(2)/t(1) stays depressed —
i.e. marginal cost per row is flat and the op is linear-in-data.

Usage: python tools/marginal_curve.py [sf_dir] [base_mult] [op ...]
           [--mults 1,2,5,10,20]
Prints one JSON line; stored as MARGINAL_CURVES_r{N}.json.

r11: --mults extends the curve (the pca_moments 10x_5x=2.45 question
needed a 20x point), and pca_moments_gemm runs the SAME moments via
the blocked X.T@X kernel so kernel-vs-harness cost separates.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

_args = sys.argv[1:]
MULTS = [1, 2, 5, 10]
if "--mults" in _args:
    i = _args.index("--mults")
    MULTS = [int(x) for x in _args[i + 1].split(",")]
    del _args[i:i + 2]
SF_DIR = _args[0] if len(_args) > 0 else "/root/testdata/sf0.1"
BASE_MULT = int(_args[1]) if len(_args) > 1 else 4
ONLY = set(_args[2:])


def replicated_docs(spark, n):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = [base.select(
        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
        F.concat(F.lit(f"r{i} "), F.col("text")).alias("text"))
        for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicated_embeddings(spark, n):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parts = [base.select(
        (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
        (F.col("label") + F.lit(i * 1_000)).alias("label"),
        "embedding") for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from conduino_spark import (from_dataframe, release_caches,
                                run_pipe, sink_df, vector_moments)
    from conduino_spark.session import get_spark

    spark = get_spark("marginal_curve", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    def ev_pipe(stage_fn, df):
        return run_pipe(from_dataframe(df) | stage_fn | sink_df(), spark)

    def _dsir(df):
        # the scale_probe shape: both DSIR stages — vocab aggregates +
        # token joins + the Gumbel-top-k (k fixed, data grows)
        from conduino_spark import dsir_logratio, dsir_topk, unigram_vocab
        tv = unigram_vocab()(df.where(F.col("doc_id") % 5 == 0))
        cv = unigram_vocab()(df)
        return dsir_topk(100, salt="sp", temperature=2.0)(
            dsir_logratio(tv, cv, term_round=4)(df))

    def _nb(df):
        from conduino_spark import nb_score, nb_train
        lab = df.withColumn("lbl", (F.col("doc_id") % 7).cast("string"))
        m = nb_train(lab, "text", "lbl")
        return nb_score(m)(lab).select("doc_id", "nb_label")

    OPS = {
        "dsir_select": ("docs", _dsir),
        "nb_train_score": ("docs", _nb),
        "pca_moments": ("emb", lambda df: ev_pipe(vector_moments(), df)),
        "pca_moments_gemm": ("emb", lambda df: ev_pipe(
            vector_moments(kernel="gemm"), df)),
    }
    if ONLY:
        OPS = {k: v for k, v in OPS.items() if k in ONLY}

    frames = {}
    for m in MULTS:
        frames[("docs", m)] = replicated_docs(spark, m * BASE_MULT)
        frames[("emb", m)] = replicated_embeddings(spark, m * BASE_MULT)
    rows = {m: frames[("docs", m)].count() for m in MULTS}
    erows = {m: frames[("emb", m)].count() for m in MULTS}

    def run(op, kind, m) -> float:
        t0 = time.time()
        op(frames[(kind, m)]).write.format("noop") \
            .mode("overwrite").save()
        dt = time.time() - t0
        release_caches()
        spark.catalog.clearCache()
        return dt

    best = {(name, m): float("inf") for name in OPS for m in MULTS}
    for _ in range(3):                      # interleaved min-of-3
        for name, (kind, op) in OPS.items():
            for m in MULTS:
                best[(name, m)] = min(best[(name, m)],
                                      run(op, kind, m))

    out = {
        "note": (f"VERDICT r9 #6 fixed-floor decomposition; base = "
                 f"sf0.1 x{BASE_MULT} ({rows[1]} doc rows / "
                 f"{erows[1]} emb rows at 1x), min-of-3 interleaved"),
        "curves": {},
    }
    for name in OPS:
        t = {m: round(best[(name, m)], 3) for m in MULTS}
        out["curves"][name] = {
            "t": {str(m): t[m] for m in MULTS},
            "ratio_max_min": round(t[MULTS[-1]] / t[MULTS[0]], 2),
            "marginal": {
                f"{b}x_{a}x": round(t[b] / t[a], 2)
                for a, b in zip(MULTS, MULTS[1:])
            },
        }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
