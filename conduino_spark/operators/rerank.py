"""Diversity-aware re-ranking over retrieved candidate sets.

``mmr_select`` — Maximal Marginal Relevance (Carbonell & Goldstein,
SIGIR'98): from each query's candidate pool, greedily pick k items
maximizing ``lam * rel - (1 - lam) * max_sim_to_already_picked`` — the
standard de-redundancy pass between candidate generation (ann_join /
bm25_join) and downstream consumption (RAG contexts, hard-negative
pools, eval panels).  The repo's retrieval family produces the
candidates; this is the selection stage.

Scale shape: candidate pools are SMALL by construction (top-N from a
retriever, N ≲ a few hundred) while the number of queries is huge —
so the operator is ONE keyed shuffle (``groupBy(query).applyInPandas``)
with a per-group O(N²·d + k·N) numpy kernel; queries parallelize
across executors, nothing is quadratic in corpus size, and no
driver-side loop exists (k iterations happen inside the kernel).

Kernels (the embedding_near_dup convention, dedup.py):
  * ``kernel='grouped'`` (default) — numpy GEMM pairwise cosines per
    group; the 100 TB path.  Selections match 'exact' except when a
    cosine straddles its 6-decimal round boundary by < 1 ulp.
  * ``kernel='exact'`` — sequential left-to-right Python-float dot
    products, bit-matching Spark's ``F.aggregate`` fold and DuckDB's
    ``list_sum`` — the driver-gate / oracle-replay path.

Determinism: relevance and cosines are rounded to 6 decimals before
selection; every marginal is the single expression
``lam * rel - (1.0 - lam) * maxsim`` evaluated on IEEE doubles (one
multiply each, one subtract), so any engine computing the same
expression tree agrees bit-for-bit; ties break on ascending id.
Reference anchor: conduino has no retrieval ops — north-star engine
extension (SURVEY §7, M6); :func:`mmr_select_sql` unrolls the k
selection rounds as static CTEs (the _sql_bpe_train precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import Stage


def _mmr_py(ids, rels, sims, k: int, lam: float):
    """Shared greedy selection over PRE-ROUNDED rel/sim values —
    ids must be pre-sorted ascending so argmax ties resolve to the
    smallest id.  Returns [(id, rank, mmr_score)]."""
    n = len(ids)
    remaining = list(range(n))
    picked = []
    out = []
    for rank in range(1, min(k, n) + 1):
        best_j = None
        best_m = None
        for j in remaining:
            maxsim = None                # true max — may be negative
            for p in picked:
                s = sims(j, p)
                if maxsim is None or s > maxsim:
                    maxsim = s
            m = lam * rels[j] if maxsim is None \
                else lam * rels[j] - (1.0 - lam) * maxsim
            if best_m is None or m > best_m:
                best_m, best_j = m, j
        out.append((ids[best_j], rank, best_m))
        picked.append(best_j)
        remaining.remove(best_j)
    return out


def mmr_select(k: int = 5, *, lam: float = 0.7,
               query_col: str = "query_id", id_col: str = "doc_id",
               rel_col: str = "score", vec_col: str = "embedding",
               kernel: str = "grouped") -> Stage:
    """MMR top-k per query over a candidate table
    ``(query_col, id_col, rel_col, vec_col)`` → rows
    ``(query_col, id_col, mmr_rank, mmr_score)`` in selection order.

    Rows with a NULL id, relevance, or vector are dropped (a NULL
    candidate can never be picked); (query, id) pairs are assumed
    unique — feed retriever output, which is.  ``lam`` ∈ (0, 1]:
    1.0 degenerates to pure relevance ranking."""
    if k < 1:
        raise ValueError(f"mmr_select: k must be >= 1, got {k}")
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"mmr_select: lam must be in (0, 1], got {lam}")
    if kernel not in ("grouped", "exact"):
        raise ValueError(f"kernel must be 'grouped' or 'exact', "
                         f"got {kernel!r}")

    def fn(df: DataFrame) -> DataFrame:
        import numpy as _np
        import pandas as _pd
        from pyspark.sql.types import (DoubleType, IntegerType,
                                       StructField, StructType)
        vcast = F.col(vec_col).cast("array<double>")
        base = df.select(
            F.col(query_col), F.col(id_col),
            F.round(F.col(rel_col).cast("double"), 6).alias("__rel"),
            vcast.alias("__v"),
        ).where(F.col(id_col).isNotNull()
                & F.col("__rel").isNotNull()
                & F.col("__v").isNotNull()
                # a zero-norm vector has no cosine: exact kernel would
                # divide by zero, grouped would NaN-poison the GEMM —
                # drop it like the NULLs (mirrored in mmr_select_sql)
                & (F.aggregate(vcast, F.lit(0.0),
                               lambda s, x: s + x * x) > 0))

        out_schema = StructType([
            StructField(query_col, df.schema[query_col].dataType),
            StructField(id_col, df.schema[id_col].dataType),
            StructField("mmr_rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ])
        use_gemm = kernel == "grouped"

        def run(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
            pdf = pdf.sort_values(id_col, kind="mergesort")
            ids = pdf[id_col].tolist()
            rels = pdf["__rel"].tolist()
            vs = [list(map(float, v)) for v in pdf["__v"]]
            if use_gemm:
                V = _np.array(vs, dtype=_np.float64)
                nn = _np.sqrt((V * V).sum(axis=1))
                C = _np.round((V @ V.T) / (nn[:, None] * nn[None, :]),
                              6)

                def sims(a, b):
                    return C[a, b]
            else:
                # sequential fold — bit-matches F.aggregate / list_sum
                norms = []
                for v in vs:
                    s = 0.0
                    for x in v:
                        s = s + x * x
                    norms.append(s ** 0.5)
                cache = {}

                def sims(a, b):
                    key = (a, b) if a < b else (b, a)
                    got = cache.get(key)
                    if got is None:
                        s = 0.0
                        for x, y in zip(vs[a], vs[b]):
                            s = s + x * y
                        got = round(s / (norms[a] * norms[b]), 6)
                        cache[key] = got
                    return got
            rows = _mmr_py(list(range(len(ids))), rels, sims, k, lam)
            q = pdf[query_col].iloc[0]
            return _pd.DataFrame({
                query_col: [q] * len(rows),
                id_col: [ids[j] for j, _, _ in rows],
                "mmr_rank": [r for _, r, _ in rows],
                "mmr_score": [m for _, _, m in rows],
            })

        return base.groupBy(query_col).applyInPandas(run, out_schema)

    return Stage(fn, name="mmr_select", seq_preserving=False)


def mmr_select_sql(cand_sql: str, k: int = 5, *, lam: float = 0.7,
                   query_col: str = "query_id", id_col: str = "doc_id",
                   rel_col: str = "score",
                   vec_col: str = "embedding") -> str:
    """DuckDB rendering of :func:`mmr_select` (kernel='exact'):
    ``cand_sql`` must select the same 4 candidate columns; the k
    greedy rounds unroll as static CTEs — round t computes each
    unpicked candidate's max cosine to the t-1 picks and takes the
    per-query argmax (ties on ascending id).  Returns
    ``(query_col, id_col, mmr_rank, mmr_score)``."""
    if k < 1 or not 0.0 < lam <= 1.0:
        raise ValueError("mmr_select_sql: bad k/lam")
    one_minus = 1.0 - lam
    q, i, r, v = query_col, id_col, rel_col, vec_col
    dot = (f"list_sum([a.__v[x] * b.__v[x] "
           f"for x in range(1, len(a.__v) + 1)])")
    parts = [f"""
WITH __cand AS (
    SELECT {q}, {i}, round(CAST({r} AS DOUBLE), 6) AS __rel,
           {v} AS __v
    FROM ({cand_sql})
    WHERE {i} IS NOT NULL AND {r} IS NOT NULL AND {v} IS NOT NULL
      AND list_sum([x * x for x in {v}]) > 0
),
__sim AS (
    SELECT a.{q} AS {q}, a.{i} AS id_a, b.{i} AS id_b,
           round({dot}
                 / (sqrt(list_sum([x * x for x in a.__v]))
                    * sqrt(list_sum([x * x for x in b.__v]))), 6)
               AS sim
    FROM __cand a JOIN __cand b
      ON a.{q} = b.{q} AND a.{i} <> b.{i}
),
__s1 AS (
    SELECT {q}, {i}, 1 AS mmr_rank, __m AS mmr_score
    FROM (SELECT {q}, {i}, {lam!r} * __rel - {one_minus!r} * 0.0 AS __m,
                 row_number() OVER (
                     PARTITION BY {q}
                     ORDER BY {lam!r} * __rel - {one_minus!r} * 0.0
                              DESC, {i}) AS rn
          FROM __cand)
    WHERE rn = 1
)"""]
    for t in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT * FROM __s{u}"
                                  for u in range(1, t))
        parts.append(f""",
__sel{t - 1} AS ({prev}),
__s{t} AS (
    SELECT {q}, {i}, {t} AS mmr_rank, __m AS mmr_score
    FROM (
        SELECT c.{q} AS {q}, c.{i} AS {i},
               {lam!r} * c.__rel
                   - {one_minus!r} * MAX(sm.sim) AS __m,
               row_number() OVER (
                   PARTITION BY c.{q}
                   ORDER BY {lam!r} * c.__rel
                                - {one_minus!r} * MAX(sm.sim) DESC,
                            c.{i}) AS rn
        FROM __cand c
        JOIN __sel{t - 1} s ON s.{q} = c.{q}
        JOIN __sim sm ON sm.{q} = c.{q} AND sm.id_a = c.{i}
                      AND sm.id_b = s.{i}
        WHERE NOT EXISTS (SELECT 1 FROM __sel{t - 1} x
                          WHERE x.{q} = c.{q} AND x.{i} = c.{i})
        GROUP BY c.{q}, c.{i}, c.__rel
    ) WHERE rn = 1
)""")
    union = " UNION ALL ".join(f"SELECT * FROM __s{t}"
                               for t in range(1, k + 1))
    parts.append(f"\nSELECT * FROM ({union})")
    return "".join(parts)
