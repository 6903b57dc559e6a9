"""Full-text retrieval over the documents table: inverted-index
postings and BM25 top-k scoring (north star — the query side of an
LLM-data pipeline: find training docs matching a probe query).

Scale posture (100 TB):

* ``build_postings`` is ONE shuffle keyed by (doc, token) — the
  map side explodes tokens and pre-aggregates, so the shuffle carries
  (doc_id, token, tf) partials, never raw text.
* ``bm25_search`` never builds the full index for a single query: the
  token array is filtered to the query terms BEFORE the explode, so
  the exploded row count is (query-term hits), not (corpus tokens).
  Per-term doc frequencies and the (N, avgdl) corpus stats are
  broadcast (≤ |query| + 1 rows); the final top-k is
  orderBy+limit = TakeOrderedAndProject (per-partition heap, no
  global sort).

Scoring is Lucene-flavoured BM25:
``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` (always positive),
``tf_norm = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``.
``ln`` is IEEE-double libm — JVM vs DuckDB may differ in the last
ulp, so the oracle comparison is tolerance-based (1e-9 relative), not
hash-exact; tf/df/dl/top-k membership are integer-exact.
"""

from __future__ import annotations

import re
from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conduino_spark.plans.core import Stage
from conduino_spark.operators.text import TOKEN_SPLIT, tokens_col, tokens_sql


def query_terms(query: Union[str, Sequence[str]]) -> list[str]:
    """Normalize a query to distinct lowercase word terms with the SAME
    tokenizer as the corpus side (declaration order preserved)."""
    if isinstance(query, str):
        toks = [t for t in re.split(TOKEN_SPLIT, query.lower()) if t]
    else:
        toks = [t.lower() for t in query]
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t)
    return list(seen)


def build_postings(text_col: str = "text", id_col: str = "doc_id") -> Stage:
    """Inverted-index postings: one row per (doc, token) with term
    frequency ``tf`` and doc token length ``dl`` — the materialized
    index a search service would write ``partitionBy(token-shard)``.

    ONE shuffle on (doc, token, dl); dl is functionally dependent on
    the doc so keying by it adds no skew."""

    def fn(df: DataFrame) -> DataFrame:
        toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
        return (df.select(F.col(id_col), F.size(toks).alias("dl"),
                          F.explode(toks).alias("token"))
                  .groupBy(id_col, "token", "dl")
                  .agg(F.count(F.lit(1)).alias("tf")))

    return Stage(fn, name="build_postings", seq_preserving=False)


def bm25_search(query: Union[str, Sequence[str]], k: int = 10, *,
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id",
                out: str = "bm25") -> Stage:
    """BM25 top-k over the corpus for one query.  Token arrays are
    filtered to the query terms before exploding (the scan reads text
    once; only query-term hits ever shuffle), per-term doc frequencies
    and corpus stats broadcast, and the top-k is a per-partition heap."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("bm25_search: query has no terms")

    def fn(df: DataFrame) -> DataFrame:
        toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
        base = df.select(F.col(id_col), toks.alias("__tk"))

        # (N, avgdl) — one tiny agg, broadcast via 1-row cross join
        stats = base.agg(F.count(F.lit(1)).alias("__n"),
                         F.avg(F.size("__tk")).alias("__avgdl"))

        hits = (base.select(
                    F.col(id_col), F.size("__tk").alias("dl"),
                    F.explode(F.filter(
                        "__tk", lambda t: t.isin(terms))).alias("token"))
                    .groupBy(id_col, "token", "dl")
                    .agg(F.count(F.lit(1)).alias("tf")))

        dfreq = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))

        scored = (hits
                  .join(F.broadcast(dfreq), "token")
                  .crossJoin(F.broadcast(stats)))
        idf = F.ln(1.0 + (F.col("__n") - F.col("df_t") + 0.5)
                   / (F.col("df_t") + 0.5))
        tf_norm = (F.col("tf") * (k1 + 1.0)
                   / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                          / F.col("__avgdl"))))
        return (scored
                .groupBy(id_col)
                .agg(F.round(F.sum(idf * tf_norm), 6).alias(out))
                .orderBy(F.desc(out), F.col(id_col))
                .limit(k))

    return Stage(fn, name=f"bm25_search({k})", seq_preserving=False)


def bm25_sql(query: Union[str, Sequence[str]], k: int = 10, *,
             k1: float = 1.2, b: float = 0.75, table: str = "documents",
             id_col: str = "doc_id", expr: str = "text",
             out: str = "bm25") -> str:
    """DuckDB rendering of :func:`bm25_search` (same terms, stats,
    Lucene idf, and 6dp rounding) for tolerance-based comparison."""
    terms = query_terms(query)
    lst = ", ".join(f"'{t}'" for t in terms)
    toks = tokens_sql(f"coalesce({expr}, '')")
    return f"""
      WITH tk AS (SELECT {id_col}, {toks} AS t FROM {table}),
      stats AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM tk),
      hits AS (SELECT {id_col}, len(t) AS dl,
                      unnest(list_filter(t, x -> x in ({lst}))) AS token
               FROM tk),
      tf AS (SELECT {id_col}, token, dl, count(*) AS tf
             FROM hits GROUP BY 1, 2, 3),
      dfreq AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1)
      SELECT {id_col},
             round(sum(ln(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
                       * tf * ({k1} + 1.0)
                       / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))), 6)
               AS {out}
      FROM tf JOIN dfreq USING (token) CROSS JOIN stats
      GROUP BY 1
      ORDER BY {out} DESC, {id_col} LIMIT {k}"""


def bm25_join(corpus: DataFrame, k: int = 10, *,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_text_col: str = "query",
              query_id_col: str = "query_id",
              term_round: "int | None" = None,
              out: str = "bm25") -> Stage:
    """Batched BM25 JOIN: top-``k`` corpus documents for EVERY query
    row — the sparse-retrieval counterpart of
    :func:`~conduino_spark.operators.similarity.ann_join` (lexical
    instead of dense), and the shape a retrieval-augmented pipeline
    runs to find training passages for a whole probe batch at once.

    Output: one row per (query, hit) — (query_id_col, id_col, out,
    rank), rank 1..k by (score desc, doc id).

    100 TB plan: the corpus side becomes the :func:`build_postings`
    table ONCE (one (doc, token) shuffle — materialize it with
    sink_parquet(partition_by=token-shard) to amortize across query
    batches); per-term document frequencies derive from it with one
    narrow agg; the candidate join moves only postings rows whose
    token appears in SOME query (an equi-join on the token key — AQE
    broadcasts a small query side); corpus stats ride a 1-row
    broadcast; per-query top-k is one window over each query's
    candidate set.  Raw text never shuffles — tokens do.

    ``term_round``: when set, each per-term contribution is rounded to
    that many decimals as a scaled long before the per-(query, doc)
    sum — order-free exact integers, so scores AND top-k membership
    replay bit-for-bit in DuckDB (the bigram_logprob convention).
    None keeps full-precision doubles under the module's tolerance
    contract (libm ``ln``).  Queries with no terms, or no term hits,
    yield no rows."""
    if k < 1:
        raise ValueError(f"need k >= 1, got k={k}")
    if term_round is not None and not 1 <= term_round <= 9:
        raise ValueError(f"term_round must be in [1, 9], got {term_round}")
    from conduino_spark.plans.cachereg import track
    from pyspark.sql import Window

    def fn(queries: DataFrame) -> DataFrame:
        post = track(build_postings(text_col, id_col)(corpus))
        ctoks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
        stats = corpus.agg(F.count(F.lit(1)).alias("__n"),
                           F.avg(F.size(ctoks)).alias("__avgdl"))
        dfreq = post.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
        qt = queries.select(
            F.col(query_id_col),
            F.explode(F.array_distinct(tokens_col(
                F.coalesce(F.col(query_text_col), F.lit("")))))
            .alias("token"))
        cand = (qt.join(post, "token")
                  .join(dfreq, "token")
                  .crossJoin(F.broadcast(stats)))
        idf = F.ln(1.0 + (F.col("__n") - F.col("df_t") + 0.5)
                   / (F.col("df_t") + 0.5))
        tf_norm = (F.col("tf") * (k1 + 1.0)
                   / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                          / F.col("__avgdl"))))
        term = idf * tf_norm
        if term_round is None:
            agg = F.round(F.sum(term), 6)
        else:
            scale = 10 ** term_round
            agg = F.round(
                F.sum(F.round(term * F.lit(scale)).cast("long"))
                .cast("double") / F.lit(float(scale)), 6)
        scored = (cand.groupBy(query_id_col, id_col)
                      .agg(agg.alias(out)))
        w = Window.partitionBy(query_id_col).orderBy(F.desc(out),
                                                     F.col(id_col))
        return (scored.withColumn("rank", F.row_number().over(w))
                      .where(F.col("rank") <= k))

    return Stage(fn, name=f"bm25_join({k})", seq_preserving=False)


def bm25_join_sql(k: int = 10, *, k1: float = 1.2, b: float = 0.75,
                  table: str = "documents", id_col: str = "doc_id",
                  expr: str = "text", queries: str = "queries",
                  query_id_col: str = "query_id",
                  query_expr: str = "query",
                  term_round: "int | None" = None,
                  out: str = "bm25") -> str:
    """DuckDB rendering of :func:`bm25_join` — ``queries`` names a
    table/CTE with (query_id, query text).  With ``term_round`` the
    replay is bit-exact; without, tolerance-contract (libm ln)."""
    toks = tokens_sql(f"coalesce({expr}, '')")
    qtoks = tokens_sql(f"coalesce({query_expr}, '')")
    term = (f"ln(1.0 + (n - df_t + 0.5) / (df_t + 0.5)) * tf * ({k1} + 1.0)"
            f" / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))")
    if term_round is None:
        agg = f"round(sum({term}), 6)"
    else:
        s = 10 ** term_round
        agg = (f"round(CAST(sum(CAST(round(({term}) * {s}) AS BIGINT)) "
               f"AS DOUBLE) / {float(s)}, 6)")
    return f"""
      WITH tk AS (SELECT {id_col}, {toks} AS t FROM {table}),
      stats AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM tk),
      post AS (SELECT {id_col}, token, dl, count(*) AS tf FROM (
                 SELECT {id_col}, len(t) AS dl, unnest(t) AS token
                 FROM tk) GROUP BY 1, 2, 3),
      dfreq AS (SELECT token, count(*) AS df_t FROM post GROUP BY 1),
      qt AS (SELECT {query_id_col},
                    unnest(list_distinct({qtoks})) AS token
             FROM {queries}),
      scored AS (
        SELECT qt.{query_id_col}, post.{id_col}, {agg} AS {out}
        FROM qt
        JOIN post USING (token)
        JOIN dfreq USING (token)
        CROSS JOIN stats
        GROUP BY 1, 2)
      SELECT {query_id_col}, {id_col}, {out}, rank FROM (
        SELECT *, CAST(row_number() OVER (
                 PARTITION BY {query_id_col}
                 ORDER BY {out} DESC, {id_col}) AS INT) AS rank
        FROM scored)
      WHERE rank <= {k}"""
