"""Round 9: all-gate-rows-hash-verifiable rotation + ADVICE hardening.

The headline artifact is `_sql_bpe_train` (__spark_entry__.py): the
r8 verdict's one `err:"no_oracle"` gate row (bpe_train_docs) now
replays bit-for-bit in DuckDB via a static 64-round unrolled CTE
chain.  The core trick — greedy left-to-right merge application as a
single string `replace` over a self-spaced symbol encoding — gets a
Hypothesis law here against the reference `_merge_pass`
(bpe.py, Sennrich 2016 single-pass semantics).

Also pinned: the r8 ADVICE fixes (vector_moments NULL-element
exclusion, dsir_topk NULL-id rule, logreg cachereg tracking) and the
streaming==batch projection laws for the r8 model families
(pca_transform, kmeans_assign) per VERDICT r8 #7.
"""

import importlib.util
import os
import sys
from pathlib import Path

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conduino_spark import from_dataframe, run_pipe, sink_df  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

_LAW9 = dict(max_examples=25, deadline=None,
             suppress_health_check=[HealthCheck.function_scoped_fixture])


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "entry_r9", REPO / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _duck_with_views():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# BPE unrolled-CTE oracle (the r9 headline)
# ---------------------------------------------------------------------------

_SYM = st.text(alphabet="ab1", min_size=1, max_size=3)


@settings(**_LAW9)
@given(syms=st.lists(_SYM, min_size=0, max_size=8), a=_SYM, b=_SYM)
def test_bpe_string_replace_equals_merge_pass(syms, a, b):
    """THE load-bearing encoding law: for ANY symbol list and ANY
    merge pair, DuckDB's `replace(' a  b ' -> ' ab ')` over the
    self-spaced string (every symbol carries its own leading AND
    trailing space) equals the reference greedy single-pass scan
    `_merge_pass` (bpe.py) — consuming a match's trailing space never
    steals the next symbol's leading space, so [a,b,a,b] -> [ab,ab]
    while [a,a,a] -> [aa,a]."""
    from conduino_spark.operators.bpe import _merge_pass
    want = _merge_pass(syms, a, b)
    sstr = " " + " ".join(s + " " for s in syms) if syms else ""
    con = duckdb.connect()
    got_s = con.execute(
        "SELECT replace(?, ' ' || ? || '  ' || ? || ' ', "
        "' ' || ? || ? || ' ')",
        [sstr, a, b, a, b]).fetchone()[0]
    got = [t for t in got_s.strip(" ").split("  ") if t] if got_s else []
    assert got == want, (syms, a, b, got_s)


def test_bpe_train_unrolled_oracle_replay(spark):
    """The gate pin's law at the test sf: the 16-round unrolled CTE
    chain reproduces bpe_train's merge list EXACTLY (same pair counts,
    same (max count, lexicographic) argmax, same >= min_count early
    stop).  The driver re-verifies the 64-round version at sf0.01."""
    from conduino_spark import bpe_train
    m = _load_entry()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = bpe_train(docs, n_merges=16)
    got = _duck_with_views().execute(m._sql_bpe_train(16, 2)).fetchall()
    assert got == [(i, a, b) for i, (a, b) in enumerate(want)]
    assert len(got) == 16  # corpus is rich enough that no round stalls


def test_bpe_sql_early_stop_matches_engine(spark):
    """When the vocabulary dries up before n_merges rounds, the SQL's
    empty-CTE cascade stops at the same round as the engine's break."""
    from conduino_spark import bpe_train
    m = _load_entry()
    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "aa")], "doc_id long, text string")
    want = bpe_train(docs, n_merges=8)     # only 'a'+'a' reaches count 2
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                "(1, 'aa ab'), (2, 'aa')) v(doc_id, text)")
    got = con.execute(m._sql_bpe_train(8, 2)).fetchall()
    assert got == [(i, a, b) for i, (a, b) in enumerate(want)]
    assert len(got) < 8


# ---------------------------------------------------------------------------
# r8 ADVICE fixes
# ---------------------------------------------------------------------------

def test_vector_moments_excludes_null_element_vectors(spark):
    """A vector containing a NULL element is excluded entirely
    (counted out of n): in the exact kernel a NULL becomes NaN and
    round(NaN).astype(int64) is undefined (INT64_MIN on most
    platforms) — silent poisoning — while a SQL SUM would skip it.
    Excluding the row keeps every engine on the same input set."""
    from conduino_spark import vector_moments
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [None, 4.0]), (3, [5.0, 6.0]),
         (4, [7.0, None])],
        "vec_id long, embedding array<double>")
    rows = {(r.m, r.i, r.j): r.s for r in vector_moments()(df).collect()}
    assert rows[(0, -1, -1)] == 2                      # rows 1 and 3 only
    assert rows[(1, 0, -1)] == 6_000_000_000           # (1+5) * 1e9
    assert rows[(1, 1, -1)] == 8_000_000_000           # (2+6) * 1e9


@settings(**_LAW9)
@given(ids=st.lists(st.one_of(st.none(), st.integers(0, 20)),
                    min_size=1, max_size=15, unique=True),
       k=st.integers(1, 6))
def test_dsir_topk_null_ids_never_win(spark, ids, k):
    """A NULL id has no deterministic Gumbel key (concat with NULL
    propagates) and no place in the id tie-break's total order — it is
    dropped like a NULL weight, and the selection over the remaining
    rows equals the driver-side reference."""
    import hashlib
    import math
    from conduino_spark import dsir_topk
    rows = [(i, 1.0 + (i or 0) * 0.1) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r.doc_id for r in
           dsir_topk(k, weight_col="w", salt="n9", temperature=2.0)(df)
           .select("doc_id").collect()]
    assert None not in got

    def key(i, w):
        h = int(hashlib.md5(f"n9{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return round(w / 2.0 - math.log(-math.log(u)), 9)

    want = [i for i, w in sorted(
        ((i, w) for i, w in rows if i is not None),
        key=lambda iw: (-key(*iw), iw[0]))][:k]
    assert got == want


def test_logreg_train_cache_registry_tracked(spark):
    """logreg_train's feature-projection persist goes through the
    cachereg registry (r8 ADVICE): visible to release_caches auditing,
    and released by the time training returns — on the happy path AND
    when an epoch raises mid-train."""
    from conduino_spark.operators.classifier import logreg_train
    from conduino_spark.plans import cachereg
    df = spark.createDataFrame(
        [(float(i % 3), float(i % 2), i % 2) for i in range(20)],
        "x0 double, x1 double, y int")
    before = len(cachereg._TRACKED)
    m = logreg_train(df, ["x0", "x1"], "y", iters=2, track_loss=False)
    assert len(cachereg._TRACKED) == before and m.n == 20
    # exception path: zero complete rows raises inside the loop; the
    # finally must still leave the registry drained
    empty = spark.createDataFrame([], "x0 double, x1 double, y int")
    with pytest.raises(ValueError, match="no complete rows"):
        logreg_train(empty, ["x0", "x1"], "y", iters=1, track_loss=False)
    assert len(cachereg._TRACKED) == before


def test_sketch_profile_moment_guard_raises_past_2_53(spark):
    """The sketch_profile moment arm's double cast re-asserts
    |s| < 2^53 on its own path (r8 ADVICE: the guard lived only in
    pca_from_moments) — a synthetic over-bound sum raises instead of
    silently hash-comparing rounded doubles."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    s_exact = F.when(F.abs(F.col("s")) < F.lit(2 ** 53),
                     F.col("s").cast("double")).otherwise(
        F.raise_error(F.lit("moment arm: |s| >= 2^53")))
    ok = spark.createDataFrame([(2 ** 53 - 1,)], "s long") \
        .select(s_exact.alias("v")).collect()
    assert ok[0].v == float(2 ** 53 - 1)
    with pytest.raises(SparkRuntimeException, match="2\\^53"):
        spark.createDataFrame([(2 ** 53,)], "s long") \
            .select(s_exact.alias("v")).collect()


# ---------------------------------------------------------------------------
# streaming==batch projection laws for the r8 model families
# (VERDICT r8 #7: scoring/transform are pure projections — free)
# ---------------------------------------------------------------------------

def _stream_embeddings(spark, stage):
    from conduino_spark.streaming import (file_stream_source,
                                          run_stream_to_memory,
                                          stage_events_dir)
    d = stage_events_dir(f"{SF}/embeddings.parquet", n_chunks=2)
    return run_stream_to_memory(
        file_stream_source(
            d, "vec_id long, embedding array<float>, label int")
        | stage, spark)


def test_pca_transform_streaming_equals_batch(spark):
    """pca_transform is weights-as-literals codegen — hosting it on a
    file stream yields the batch projection bit-for-bit."""
    from conduino_spark import pca_fit, pca_transform
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = pca_fit(emb, k=4)
    stage = pca_transform(model)
    got = {r.vec_id: tuple(r.pc) for r in
           _stream_embeddings(spark, stage)
           .select("vec_id", "pc").collect()}
    want = {r.vec_id: tuple(r.pc) for r in
            stage(emb).select("vec_id", "pc").collect()}
    assert got == want and len(got) == 500


def test_kmeans_assign_streaming_equals_batch(spark):
    """kmeans_assign (broadcast centroids, deterministic argmin) is
    stream-hostable the same way."""
    from conduino_spark import kmeans_assign, kmeans_fit
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = kmeans_fit(emb, k=4, iters=2)
    stage = kmeans_assign(model)
    got = {r.vec_id: r.cell for r in
           _stream_embeddings(spark, stage)
           .select("vec_id", "cell").collect()}
    want = {r.vec_id: r.cell for r in
            stage(emb).select("vec_id", "cell").collect()}
    assert got == want and len(got) == 500


def test_logreg_score_streaming_equals_batch(spark):
    """logreg_score is weights-as-literals codegen, and the stock
    quality featurizer is a pure projection — the whole train-offline /
    score-on-the-stream deployment hosts on a file stream and yields
    the batch scores bit-for-bit (the last VERDICT r8 #7 family)."""
    from conduino_spark import (QUALITY_FEATURES, logreg_score,
                                logreg_train, quality_features,
                                with_columns)
    from conduino_spark.streaming import (file_stream_source,
                                          run_stream_to_memory,
                                          stage_events_dir)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fx = quality_features("text")
    feats = docs.select(
        "doc_id", *[fx[k].alias(k) for k in QUALITY_FEATURES],
        (F.col("n_chars") >= 200).cast("int").alias("label"))
    model = logreg_train(feats, list(QUALITY_FEATURES), "label",
                         iters=2, track_loss=False)
    stage = with_columns(fx) | logreg_score(model)
    d = stage_events_dir(f"{SF}/documents.parquet", n_chunks=2)
    got = {r.doc_id: r.score for r in
           run_stream_to_memory(
               file_stream_source(
                   d, "doc_id long, text string, lang string, "
                      "source string, n_chars long") | stage, spark)
           .select("doc_id", "score").collect()}
    want = {r.doc_id: r.score for r in
            stage(docs).select("doc_id", "score").collect()}
    assert got == want and len(got) > 0


def test_dsir_logratio_microbatch_replay_equals_batch(spark):
    """dsir_logratio scores each document independently given two
    STATIC vocab tables (per-doc sum over its own tokens), so the
    foreachBatch deployment — score each arriving micro-batch against
    the frozen models — replays the batch run exactly.  The law: the
    union of per-half scores equals the whole-corpus run, per doc."""
    from conduino_spark import dsir_logratio, unigram_vocab
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = unigram_vocab("text")(docs.filter(F.col("lang") == "en"))
    corpus = unigram_vocab("text")(docs)
    stage = dsir_logratio(target, corpus, "text", term_round=6)

    def scores(df):
        return {r.doc_id: r.dsir_logratio for r in
                stage(df).select("doc_id", "dsir_logratio").collect()}

    want = scores(docs)
    lo = scores(docs.filter(F.col("doc_id") % 2 == 0))
    hi = scores(docs.filter(F.col("doc_id") % 2 == 1))
    got = {**lo, **hi}
    assert set(got) == set(want) and len(lo) > 0 and len(hi) > 0
    assert got == want


# ---------------------------------------------------------------------------
# jaccard_prefix_pairs: EXACT similarity self-join via prefix filtering
# ---------------------------------------------------------------------------

def _brute_jaccard_sql(threshold: float) -> str:
    """Brute-force distinct-shingle Jaccard pairs in DuckDB — the
    oracle for the prefix-filtered join: exactness means the pruned
    plan returns the IDENTICAL pair set the quadratic join does."""
    from __spark_entry__ import _sql_shingles  # type: ignore
    from conduino_spark.functions.hashing import h32_sql
    from conduino_spark.operators.text import tokens_sql
    return f"""
        WITH sh AS (
          SELECT doc_id,
                 unnest([{h32_sql('g')}
                         for g in {_sql_shingles(tokens_sql('text'))}]) AS g
          FROM documents),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i >= {threshold} * (sa.sz + sb.sz - i)
        ORDER BY id_a, id_b"""


@pytest.mark.parametrize("threshold", [0.2, 0.5])
def test_jaccard_prefix_matches_duckdb_bruteforce(spark, threshold):
    from conduino_spark import jaccard_prefix_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted((r.id_a, r.id_b, r.jaccard) for r in
                 jaccard_prefix_pairs(threshold=threshold)(docs).collect())
    want = _duck_with_views().execute(_brute_jaccard_sql(threshold)) \
        .fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 0  # corpus has near-dup pairs at 0.2


def test_jaccard_prefix_equals_lsh_free_bruteforce(spark):
    """Same pair set as ngram_jaccard_pairs (the naive inverted-index
    join) — shingles_col is already distinct per doc, so both compute
    distinct-set Jaccard; the prefix filter only prunes the plan."""
    from conduino_spark import jaccard_prefix_pairs, ngram_jaccard_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted((r.id_a, r.id_b, r.jaccard) for r in
                 jaccard_prefix_pairs(threshold=0.3)(docs).collect())
    want = sorted((r.id_a, r.id_b, r.jaccard) for r in
                  ngram_jaccard_pairs(threshold=0.3)(docs).collect())
    assert got == want


_TOK = st.text(alphabet="abc", min_size=1, max_size=2)


@settings(**_LAW9)
@given(docs=st.lists(st.lists(_TOK, min_size=0, max_size=8),
                     min_size=2, max_size=7),
       threshold=st.sampled_from([0.25, 0.5, 0.75, 1.0]))
def test_jaccard_prefix_law_any_sets(spark, docs, threshold):
    """For ANY corpus of token sets and ANY threshold, the
    prefix-filtered join equals the pure-Python all-pairs reference
    (n=1: the shingle universe IS the token set — worst case for the
    filter, every doc shares the tiny alphabet)."""
    from conduino_spark import jaccard_prefix_pairs
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string")
    got = sorted((r.id_a, r.id_b) for r in
                 jaccard_prefix_pairs(threshold=threshold, n=1)(df)
                 .collect())
    sets = [set(t) for t in docs]
    want = sorted(
        (i, j)
        for i in range(len(sets)) for j in range(i + 1, len(sets))
        if sets[i] and sets[j]
        and len(sets[i] & sets[j])
        >= threshold * len(sets[i] | sets[j]))
    assert got == want


def test_jaccard_prefix_edges(spark):
    """NULL text and sub-n-token docs produce no rows and no crash;
    threshold=1.0 keeps only identical shingle sets."""
    from conduino_spark import jaccard_prefix_pairs
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, None), (4, "hi"), (5, "alpha beta gamma epsilon")],
        "doc_id long, text string")
    got = sorted((r.id_a, r.id_b, r.jaccard) for r in
                 jaccard_prefix_pairs(threshold=1.0)(df).collect())
    assert got == [(1, 2, 1.0)]
    with pytest.raises(ValueError, match="threshold"):
        jaccard_prefix_pairs(threshold=0.0)


# ---------------------------------------------------------------------------
# naive Bayes classifier: distributed-model token classification
# ---------------------------------------------------------------------------

def _nb_sql(alpha: float = 0.5, term_round: int = 4) -> str:
    """Full DuckDB replay of nb_train + nb_score on documents with
    lang as the label: same counts, same smoothing denominators, same
    scaled-long rounding, same (score desc, class asc) argmax."""
    from conduino_spark.operators.text import tokens_sql
    toks = tokens_sql("text")
    s = 10 ** term_round
    return f"""
        WITH tk AS (
          SELECT doc_id, lang AS y, unnest({toks}) AS token
          FROM documents WHERE lang IS NOT NULL),
        cnt AS (SELECT y, token, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        vv AS (SELECT COUNT(DISTINCT token) AS v FROM cnt),
        tot AS (SELECT y, SUM(c) AS n FROM cnt GROUP BY y),
        pri AS (SELECT lang AS y, COUNT(*) AS d FROM documents
                WHERE lang IS NOT NULL GROUP BY 1),
        nd AS (SELECT SUM(d) AS n FROM pri),
        cl AS (SELECT pri.y,
                      CAST(ROUND(ln(pri.d * 1.0 / nd.n) * {s}) AS BIGINT)
                        AS prior,
                      CAST(ROUND(ln({alpha} /
                            (COALESCE(tot.n, 0) + {alpha} * (vv.v + 1)))
                          * {s}) AS BIGINT) AS dflt
               FROM pri LEFT JOIN tot USING (y), nd, vv),
        lp AS (SELECT cnt.y, cnt.token,
                      CAST(ROUND(ln((cnt.c + {alpha}) /
                            (tot.n + {alpha} * (vv.v + 1))) * {s})
                        AS BIGINT) AS lp
               FROM cnt JOIN tot USING (y), vv),
        st AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
        scored AS (
          SELECT st.doc_id, cl.y,
                 SUM(COALESCE(lp.lp, cl.dflt)) + ANY_VALUE(cl.prior) AS t
          FROM st CROSS JOIN cl
          LEFT JOIN lp ON lp.y = cl.y AND lp.token = st.token
          GROUP BY 1, 2),
        best AS (
          SELECT doc_id, y, t,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY t DESC, y ASC) AS rn
          FROM scored)
        SELECT d.doc_id, b.y AS nb_label,
               b.t / {float(s)} AS nb_score
        FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        USING (doc_id)
        ORDER BY d.doc_id"""


def test_nb_train_score_matches_duckdb(spark):
    """The whole train+score path — counts, smoothing, scaled-long
    log terms, per-doc sums, argmax tie-break — replays bit-for-bit
    in DuckDB (the quality_classifier precedent, model-as-a-table
    edition)."""
    from conduino_spark import nb_score, nb_train
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = nb_train(docs, "text", "lang")
    assert model.classes == ["de", "en", "es", "fr", "zh"]
    got = sorted((r.doc_id, r.nb_label, r.nb_score) for r in
                 nb_score(model)(docs)
                 .select("doc_id", "nb_label", "nb_score").collect())
    want = _duck_with_views().execute(_nb_sql()).fetchall()
    assert got == [tuple(r) for r in want]
    # the synthetic corpus draws every lang from one shared token
    # pool, so lang is barely recoverable from text — the meaningful
    # bound is beating the majority-class prior (en = 193/500)
    truth = {r.doc_id: r.lang for r in
             docs.select("doc_id", "lang").collect()}
    acc = sum(1 for d, lbl, _ in got if lbl == truth[d]) / len(got)
    assert acc > 193 / 500, acc


def test_nb_edges(spark):
    """NULL labels are excluded from training; token-free docs score
    NULL (no evidence); parameter validation raises."""
    from conduino_spark import nb_score, nb_train
    df = spark.createDataFrame(
        [(1, "apple banana apple", "fruit"),
         (2, "carrot potato", "veg"),
         (3, "apple carrot", None),
         (4, "", "fruit")],
        "doc_id long, text string, label string")
    m = nb_train(df, "text", "label")
    assert m.classes == ["fruit", "veg"] and m.n_docs == 3
    out = {r.doc_id: r.nb_label for r in
           nb_score(m, id_col="doc_id")(df).collect()}
    assert out[1] == "fruit" and out[2] == "veg"
    assert out[4] is None              # no tokens, no evidence
    assert out[3] in ("fruit", "veg")  # unlabeled docs still score
    with pytest.raises(ValueError, match="alpha"):
        nb_train(df, "text", "label", alpha=0.0)
    with pytest.raises(ValueError, match="no labeled rows"):
        nb_train(df.where("label = 'nope'"), "text", "label")


# ---------------------------------------------------------------------------
# quantile_buckets + perplexity_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

def test_quantile_buckets_matches_duckdb(spark):
    """Row labels replay bit-for-bit: the binned-quantile cuts are
    IEEE-identical (binned_quantiles_sql) and the CASE mirrors the
    stage's band comparison."""
    from conduino_spark import quantile_buckets
    from conduino_spark.operators.sketches import binned_quantiles_sql
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted((r.event_id, r.bucket) for r in
                 quantile_buckets("value",
                                  {"low": 0.25, "mid": 0.75},
                                  rest="high", keys=("event_type",),
                                  bins=256)(ev)
                 .select("event_id", "bucket").collect())
    cuts = binned_quantiles_sql(
        "value", {"__q_low": 0.25, "__q_mid": 0.75}, bins=256,
        keys=("event_type",), table="events")
    want = _duck_with_views().execute(f"""
        WITH cuts AS ({cuts})
        SELECT e.event_id,
               CASE WHEN e.value IS NULL THEN NULL
                    WHEN CAST(e.value AS DOUBLE) <= c.__q_low THEN 'low'
                    WHEN CAST(e.value AS DOUBLE) <= c.__q_mid THEN 'mid'
                    ELSE 'high' END AS bucket
        FROM events e JOIN cuts c USING (event_type)
        ORDER BY e.event_id""").fetchall()
    assert got == [tuple(r) for r in want]
    with pytest.raises(ValueError, match="ascending"):
        quantile_buckets("value", {"a": 0.5, "b": 0.25})
    with pytest.raises(ValueError, match="collides"):
        quantile_buckets("value", {"a": 0.5}, rest="a")


def test_perplexity_buckets_matches_duckdb(spark):
    """The composed CCNet pipeline — unigram LM score (term_round
    exact), per-language binned-quantile cuts, head/middle/tail CASE —
    replays bit-for-bit end to end."""
    from conduino_spark import perplexity_buckets, unigram_vocab
    from conduino_spark.operators.sketches import binned_quantiles_sql
    from conduino_spark.operators.text import tokens_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = unigram_vocab("text")(docs.where(F.col("lang") == "en"))
    got = sorted((r.doc_id, r.log_ppl, r.ppl_bucket) for r in
                 perplexity_buckets(vocab, keys=("lang",), bins=256,
                                    term_round=4)(docs)
                 .select("doc_id", "log_ppl", "ppl_bucket").collect())
    toks = tokens_sql("text")
    scores = f"""
        SELECT d.doc_id, d.lang, -per.lp AS log_ppl
        FROM documents d LEFT JOIN (
          WITH uni AS (
            SELECT tok AS token, COUNT(*) AS c
            FROM (SELECT unnest({toks}) AS tok FROM documents
                  WHERE lang = 'en') GROUP BY tok),
          st AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM uni),
          sc AS (SELECT pt.doc_id,
                        CAST(ROUND(ln(
                          (CAST(coalesce(u.c, 0) AS DOUBLE) + 0.5)
                          / (CAST(st.n AS DOUBLE)
                             + 0.5 * (CAST(st.v AS DOUBLE) + 1))
                        ) * 10000) AS BIGINT) AS sl
                 FROM (SELECT doc_id, unnest({toks}) AS token
                       FROM documents) pt
                 LEFT JOIN uni u ON u.token = pt.token
                 CROSS JOIN st)
          SELECT doc_id, CAST(SUM(sl) AS DOUBLE) / COUNT(*) / 10000.0
                           AS lp
          FROM sc GROUP BY doc_id) per USING (doc_id)"""
    cuts = binned_quantiles_sql(
        "log_ppl",
        {"__q_head": 1 / 3, "__q_middle": 2 / 3}, bins=256,
        keys=("lang",), table=f"({scores})")
    want = _duck_with_views().execute(f"""
        WITH sc AS ({scores}), cuts AS ({cuts})
        SELECT sc.doc_id, sc.log_ppl,
               CASE WHEN sc.log_ppl IS NULL THEN NULL
                    WHEN sc.log_ppl <= c.__q_head THEN 'head'
                    WHEN sc.log_ppl <= c.__q_middle THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM sc JOIN cuts c USING (lang)
        ORDER BY sc.doc_id""").fetchall()
    assert got == [tuple(r) for r in want]
    bands = {b for _, _, b in got}
    assert bands == {"head", "middle", "tail"}


# ---------------------------------------------------------------------------
# mine_hard_negatives: contrastive-training negative selection
# ---------------------------------------------------------------------------

def test_mine_hard_negatives_matches_bruteforce_duckdb(spark):
    """With nprobe >= n_cells the mining is exact: the filtered,
    skip_top-shifted rank window over ALL corpus items replays in
    DuckDB (brute-force cosine, anti-join of known positives, same
    (cosine desc, id) order)."""
    from conduino_spark import mine_hard_negatives
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = emb.where(F.col("vec_id") % 50 == 0)
    pos_pairs = [(int(q), int((q + 7) % 500)) for q in range(0, 500, 50)]
    pos = spark.createDataFrame(pos_pairs, "query_id long, pos_id long")
    got = sorted((r.vec_id, r.neg_id, r.neg_cosine, r.neg_rank) for r in
                 mine_hard_negatives(emb, pos, k=5, skip_top=1,
                                     nprobe=99)(batch).collect())
    vals = ", ".join(f"({q}, {p})" for q, p in pos_pairs)
    want = _duck_with_views().execute(f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
        pos AS (SELECT * FROM (VALUES {vals}) p(qid, pid)),
        sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
                      round(list_sum([q.v[i] * c.v[i]
                                      for i in range(1, len(q.v) + 1)])
                            / (sqrt(list_sum([x * x for x in q.v]))
                               * sqrt(list_sum([x * x for x in c.v]))),
                            6) AS cos
               FROM q JOIN e c ON c.vec_id <> q.vec_id),
        filt AS (SELECT sc.* FROM sc
                 LEFT JOIN pos ON pos.qid = sc.qid AND pos.pid = sc.nid
                 WHERE pos.qid IS NULL),
        rk AS (SELECT qid, nid, cos,
                      CAST(row_number() OVER (
                        PARTITION BY qid
                        ORDER BY cos DESC, nid) AS INT) AS r
               FROM filt)
        SELECT qid, nid, cos, r FROM rk WHERE r > 1 AND r <= 6"""
        ).fetchall()
    assert got == sorted(tuple(r) for r in want)
    # every excluded positive and self is absent; ranks are 2..6
    gset = {(q, n) for q, n, _, _ in got}
    assert all((q, p) not in gset for q, p in pos_pairs)
    assert all(q != n for q, n in gset)
    assert {r for _, _, _, r in got} == {2, 3, 4, 5, 6}


def test_mine_hard_negatives_validation(spark):
    from conduino_spark import mine_hard_negatives
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="skip_top"):
        mine_hard_negatives(emb, k=0)
    with pytest.raises(ValueError, match="fetch"):
        mine_hard_negatives(emb, k=5, skip_top=2, fetch=3)


# ---------------------------------------------------------------------------
# profile_diff: snapshot drift report
# ---------------------------------------------------------------------------

def test_profile_diff_matches_duckdb(spark):
    """The whole drift report — exact per-column stats AND the
    md5-register-exact HLL distinct estimates — replays in DuckDB for
    an old (doc_id < 400) vs current documents snapshot."""
    from conduino_spark import profile_diff
    from conduino_spark.operators.sketches import hll_estimate_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    got = sorted(tuple(r) for r in profile_diff(old)(docs).collect())

    def prof_arms(table):
        arms = []
        for c in ("doc_id", "text", "lang", "source", "n_chars"):
            est = hll_estimate_sql(f"CAST({c} AS VARCHAR)", p=12,
                                   table=table)
            arms.append(f"""
              SELECT '{c}' AS "column", COUNT(*) AS n_rows,
                     COUNT(*) - COUNT({c}) AS n_nulls,
                     round((COUNT(*) - COUNT({c}))
                           / greatest(COUNT(*), 1) * 1.0, 6)
                       AS null_frac,
                     (SELECT approx_distinct FROM ({est})) AS ad,
                     MIN(CAST({c} AS VARCHAR)) AS mn,
                     MAX(CAST({c} AS VARCHAR)) AS mx
              FROM {table}""")
        return " UNION ALL ".join(arms)

    want = _duck_with_views().execute(f"""
        WITH po AS ({prof_arms("(SELECT * FROM documents WHERE doc_id < 400)")}),
        pn AS ({prof_arms("documents")})
        SELECT COALESCE(po.column, pn.column) AS column,
               CASE WHEN po.n_rows IS NULL THEN 'added'
                    WHEN pn.n_rows IS NULL THEN 'removed'
                    ELSE 'common' END AS status,
               po.n_rows AS n_rows_old, pn.n_rows AS n_rows_new,
               po.null_frac AS null_frac_old,
               pn.null_frac AS null_frac_new,
               round(coalesce(pn.null_frac, 0)
                     - coalesce(po.null_frac, 0), 6) AS d_null_frac,
               round(po.ad, 6) AS approx_distinct_old,
               round(pn.ad, 6) AS approx_distinct_new,
               CASE WHEN round(po.ad, 6) > 0
                    THEN round(round(pn.ad, 6) / round(po.ad, 6), 6)
               END AS distinct_ratio,
               NOT (po.mn IS NOT DISTINCT FROM pn.mn) AS min_changed,
               NOT (po.mx IS NOT DISTINCT FROM pn.mx) AS max_changed
        FROM po FULL JOIN pn ON po.column = pn.column""").fetchall()
    assert got == sorted(tuple(r) for r in want)
    by_col = {r[0]: r for r in got}
    assert by_col["doc_id"][1] == "common"
    assert by_col["doc_id"][3] == 500 and by_col["doc_id"][2] == 400
    # min/max are STRING stats (profile_table's design): max of
    # 0..499 as varchar is "99" in both snapshots — unchanged; the
    # drift shows up in the distinct-count ratio instead
    assert by_col["doc_id"][11] is False
    assert by_col["doc_id"][9] is not None and by_col["doc_id"][9] > 1.0


def test_profile_diff_schema_changes(spark):
    """A column only in the new snapshot reports 'added'; only in the
    old, 'removed'."""
    from conduino_spark import profile_diff
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = {r.column: r.status for r in
           profile_diff(docs.drop("source"))(docs.drop("lang"))
           .collect()}
    assert out["source"] == "added" and out["lang"] == "removed"
    assert out["doc_id"] == "common"


def test_quantile_buckets_all_null_group_survives(spark):
    """A group whose values are ALL NULL keeps its rows (LEFT join of
    the cut table) with a NULL label — it doesn't silently vanish."""
    from conduino_spark import quantile_buckets
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", None)],
        "grp string, v double")
    out = {(r.grp, r.v): r.bucket for r in
           quantile_buckets("v", {"lo": 0.5}, rest="hi",
                            keys=("grp",), bins=16)(df).collect()}
    assert len(out) == 4
    assert out[("b", None)] is None
    assert out[("a", 1.0)] == "lo" and out[("a", 3.0)] == "hi"


# ---------------------------------------------------------------------------
# bm25_join: batched sparse retrieval
# ---------------------------------------------------------------------------

def _bm25_queries(spark):
    """Deterministic query batch: the first 5 tokens of every 50th
    document (tokens round-trip through the space join, so re-tokenizing
    the query string recovers exactly these tokens)."""
    from conduino_spark.operators.text import tokens_col
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return (docs.where(F.col("doc_id") % 50 == 0)
            .select(F.col("doc_id").alias("query_id"),
                    F.concat_ws(" ", F.slice(
                        tokens_col(F.col("text")), 1, 5)).alias("query")))


def test_bm25_join_exact_mode_matches_duckdb(spark):
    """term_round mode: scores AND top-k membership replay bit-for-bit
    (scaled-long per-term sums, same (score desc, doc) rank order)."""
    from conduino_spark import bm25_join
    from conduino_spark.operators.search import bm25_join_sql
    from conduino_spark.operators.text import tokens_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in
                 bm25_join(docs, k=5, term_round=6)(_bm25_queries(spark))
                 .select("query_id", "doc_id", "bm25", "rank").collect())
    toks = tokens_sql("text")
    qsql = f"""(SELECT doc_id AS query_id,
                       array_to_string(({toks})[1:5], ' ') AS query
                FROM documents WHERE doc_id % 50 = 0)"""
    want = _duck_with_views().execute(
        bm25_join_sql(5, queries=qsql, term_round=6)).fetchall()
    assert got == sorted(tuple(r) for r in want)
    # structural sanity: every query fills exactly k=5 ranks (the
    # shared synthetic vocabulary means "own doc at rank 1" does NOT
    # hold — short docs win on tf_norm; the replay above is the
    # correctness contract)
    ranks = {}
    for q, _, _, r in got:
        ranks.setdefault(q, set()).add(r)
    assert all(v == {1, 2, 3, 4, 5} for v in ranks.values())
    assert len(ranks) == 10


def test_bm25_join_matches_single_query_search(spark):
    """Consistency with the single-query operator: for each query row,
    bm25_join's hits equal bm25_search(query) over the same corpus
    (same scores at 6dp, same order), modulo the join's term_round.
    With term_round=None both paths sum doubles — compare at 4dp."""
    from conduino_spark import bm25_join, bm25_search
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qrows = _bm25_queries(spark).collect()[:3]
    joined = bm25_join(docs, k=5)(_bm25_queries(spark)) \
        .collect()
    by_q = {}
    for r in joined:
        by_q.setdefault(r.query_id, []).append(r)
    for qr in qrows:
        want = [(r.doc_id, round(r.bm25, 4)) for r in
                bm25_search(qr.query, k=5)(docs).collect()]
        got = [(r.doc_id, round(r.bm25, 4)) for r in
               sorted(by_q[qr.query_id], key=lambda r: r.rank)]
        assert got == want, qr.query_id


def test_bm25_join_edges(spark):
    """Empty/NULL queries and no-hit queries yield no rows; k
    validation raises."""
    from conduino_spark import bm25_join
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qs = spark.createDataFrame(
        [(1, "zzzzqqqq xyzzy"), (2, None), (3, "")],
        "query_id long, query string")
    assert bm25_join(docs, k=3)(qs).count() == 0
    with pytest.raises(ValueError, match="k >= 1"):
        bm25_join(docs, k=0)


# ---------------------------------------------------------------------------
# label_propagation: semi-supervised spreading over an edge graph
# ---------------------------------------------------------------------------

def _lp_sql(edge_rows, seed_rows, iters):
    """Static unrolled-CTE DuckDB replay of label_propagation: one
    votes/pick/state CTE triple per round (the _sql_logreg_quality /
    _sql_bpe_train precedent for iterative operators)."""
    evals = ", ".join(f"({a}, {b})" for a, b in edge_rows)
    svals = ", ".join(
        f"({i}, {'NULL' if l is None else repr(l)})" for i, l in seed_rows)
    sql = [f"""
        WITH e0 AS (SELECT * FROM (VALUES {evals}) v(s, d)),
        sym AS (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0),
        seeds AS (SELECT * FROM (VALUES {svals}) v(id, seed)),
        lab0 AS (SELECT id, seed AS lbl FROM seeds)"""]
    for r in range(1, iters + 1):
        sql.append(f"""
        , votes{r} AS (
            SELECT sym.d AS id, l.lbl, COUNT(*) AS c
            FROM sym JOIN lab{r - 1} l ON l.id = sym.s
            WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
        mx{r} AS (SELECT id, MAX(c) AS mc FROM votes{r} GROUP BY id),
        pick{r} AS (
            SELECT v.id, MIN(v.lbl) AS new FROM votes{r} v
            JOIN mx{r} USING (id) WHERE v.c = mx{r}.mc GROUP BY v.id),
        lab{r} AS (
            SELECT s.id, COALESCE(s.seed, p.new) AS lbl
            FROM seeds s LEFT JOIN pick{r} p USING (id))""")
    sql.append(f" SELECT id, lbl FROM lab{iters} ORDER BY id")
    return "".join(sql)


def test_label_propagation_matches_unrolled_cte(spark):
    """4 rounds over the REAL minhash near-dup pair graph with every
    10th doc's lang as a seed: the whole synchronous clamped-majority
    run replays in one static unrolled-CTE SQL."""
    from conduino_spark import label_propagation, minhash_dedup_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = [(r.id_a, r.id_b) for r in
             minhash_dedup_pairs()(docs)
             .select("id_a", "id_b").collect()]
    assert len(pairs) > 20  # the graph is non-trivial
    nodes = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.col("lang"))
        .alias("label"))
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = sorted((r.doc_id, r.label_prop) for r in
                 label_propagation(edges, "label", "doc_id", iters=4)(
                     nodes).select("doc_id", "label_prop").collect())
    seeds = [(r.doc_id, r.label) for r in nodes.collect()]
    want = duckdb.connect().execute(_lp_sql(pairs, seeds, 4)).fetchall()
    assert got == [tuple(r) for r in want]
    spread = sum(1 for i, l in got if l is not None)
    seeded = sum(1 for _, l in seeds if l is not None)
    assert spread > seeded  # labels actually propagated


def test_label_propagation_semantics(spark):
    """Hand graph: seeds clamp, majority wins, ties go to the
    lexicographically smallest label, disconnected nodes stay NULL,
    and a node with only unlabeled neighbors reverts when recomputed."""
    from conduino_spark import label_propagation
    #   a(x) - c - b(y),  c also - d(x);  e isolated
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 3), (9, 9)], "s long, d long")
    nodes = spark.createDataFrame(
        [(1, "x"), (2, "y"), (4, "x"), (3, None), (5, None)],
        "id long, label string")
    out = {r.id: r.label_prop for r in
           label_propagation(edges, iters=2)(nodes).collect()}
    assert out[1] == "x" and out[2] == "y" and out[4] == "x"  # clamped
    assert out[3] == "x"   # majority 2x vs 1y
    assert out[5] is None  # disconnected
    # tie case: equal votes -> smallest label
    edges2 = spark.createDataFrame([(1, 3), (2, 3)], "s long, d long")
    nodes2 = spark.createDataFrame(
        [(1, "z"), (2, "a"), (3, None)], "id long, label string")
    out2 = {r.id: r.label_prop for r in
            label_propagation(edges2, iters=1)(nodes2).collect()}
    assert out2[3] == "a"
    with pytest.raises(ValueError, match="iters"):
        label_propagation(edges, iters=0)


def test_label_propagation_weighted_votes(spark):
    """weight_col: scaled-long vote sums — a heavier single edge
    outvotes two light ones."""
    from conduino_spark import label_propagation
    edges = spark.createDataFrame(
        [(1, 4, 5.0), (2, 4, 1.0), (3, 4, 1.0)],
        "s long, d long, w double")
    nodes = spark.createDataFrame(
        [(1, "h"), (2, "l"), (3, "l"), (4, None)],
        "id long, label string")
    out = {r.id: r.label_prop for r in
           label_propagation(edges, iters=1, weight_col="w")(
               nodes).collect()}
    assert out[4] == "h"


def test_nb_score_microbatch_replay_equals_batch(spark):
    """nb_score against a FROZEN model is per-document (one explode +
    join + per-doc sum), so the foreachBatch deployment replays the
    batch run exactly — the dsir_logratio law, classifier edition."""
    from conduino_spark import nb_score, nb_train
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = nb_train(docs, "text", "lang")
    stage = nb_score(m)

    def labels(df):
        return {r.doc_id: (r.nb_label, r.nb_score) for r in
                stage(df).select("doc_id", "nb_label", "nb_score")
                .collect()}

    want = labels(docs)
    got = {**labels(docs.filter(F.col("doc_id") % 2 == 0)),
           **labels(docs.filter(F.col("doc_id") % 2 == 1))}
    assert got == want and len(got) == 500


# ---------------------------------------------------------------------------
# cosine_prefix_pairs: exact WEIGHTED similarity self-join
# ---------------------------------------------------------------------------

def _brute_cosine_sql(threshold: float, scale: int = 10 ** 6) -> str:
    """Brute-force TF-IDF cosine pairs in DuckDB over the SAME rounded
    integer weights — exactness of the max-weight-suffix prune is the
    claim under test."""
    from conduino_spark.functions.hashing import h32_sql
    from conduino_spark.operators.text import tokens_sql
    toks = tokens_sql("text")
    tau = int(threshold * scale * scale)
    return f"""
        WITH tk AS (SELECT doc_id,
                           unnest([{h32_sql('t')} for t in {toks}]) AS g
                    FROM documents),
        tf AS (SELECT doc_id, g, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
        dfq AS (SELECT g, COUNT(*) AS df FROM tf GROUP BY g),
        nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
        w AS (SELECT doc_id, g, tf * ln(1.0 + n * 1.0 / df) AS w
              FROM tf JOIN dfq USING (g) CROSS JOIN nn),
        nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nr FROM w
                GROUP BY doc_id),
        w6 AS (SELECT w.doc_id, w.g,
                      CAST(ROUND(w.w / nrm.nr * {scale}) AS BIGINT) AS w6
               FROM w JOIN nrm USING (doc_id) WHERE nrm.nr > 0),
        dot AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       SUM(a.w6 * b.w6) AS d
                FROM w6 a JOIN w6 b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(d / {float(scale * scale)}, 6) AS cosine
        FROM dot WHERE d >= {tau}"""


@pytest.mark.parametrize("threshold", [0.3, 0.7])
def test_cosine_prefix_matches_duckdb_bruteforce(spark, threshold):
    from conduino_spark import cosine_prefix_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted((r.id_a, r.id_b, r.cosine) for r in
                 cosine_prefix_pairs(threshold=threshold)(docs)
                 .collect())
    want = _duck_with_views().execute(
        _brute_cosine_sql(threshold)).fetchall()
    assert got == sorted(tuple(r) for r in want)
    assert len(got) > 0


@settings(**_LAW9)
@given(docs=st.lists(st.lists(_TOK, min_size=0, max_size=6),
                     min_size=2, max_size=6),
       threshold=st.sampled_from([0.3, 0.6, 0.9]))
def test_cosine_prefix_law_any_corpora(spark, docs, threshold):
    """For ANY tiny corpus, the pruned join equals a pure-Python
    brute force over the SAME rounded integer weights (worst case for
    the prune: every doc shares the 3-letter alphabet)."""
    import math
    from collections import Counter
    from conduino_spark import cosine_prefix_pairs
    import hashlib
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string")
    got = sorted((r.id_a, r.id_b) for r in
                 cosine_prefix_pairs(threshold=threshold)(df).collect())

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    tfs = [Counter(h(t) for t in d) for d in docs]
    dfc = Counter(g for tf in tfs for g in tf)
    n = sum(1 for tf in tfs if tf)
    w6s = []
    for tf in tfs:
        w = {g: c * math.log(1.0 + n / dfc[g]) for g, c in tf.items()}
        nr = math.sqrt(sum(x * x for x in w.values()))
        w6s.append({} if nr == 0 else
                   {g: int(_r_half_up(x / nr * 1e6))
                    for g, x in w.items()})
    tau = threshold * 1e12
    want = sorted(
        (i, j)
        for i in range(len(docs)) for j in range(i + 1, len(docs))
        if sum(w6s[i][g] * w6s[j].get(g, 0) for g in w6s[i]) >= tau)
    assert got == want


def _r_half_up(x):
    import math
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_cosine_prefix_edges(spark):
    from conduino_spark import cosine_prefix_pairs
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, None), (4, "")],
        "doc_id long, text string")
    got = sorted((r.id_a, r.id_b, r.cosine) for r in
                 cosine_prefix_pairs(threshold=0.99)(df).collect())
    # identical docs: dot of ROUNDED unit weights lands a hair under
    # 1.0 (sum of squared 6dp-rounded components), not exactly 1.0
    assert [(a, b) for a, b, _ in got] == [(1, 2)]
    assert got[0][2] > 0.999
    with pytest.raises(ValueError, match="threshold"):
        cosine_prefix_pairs(threshold=1.5)


# ---------------------------------------------------------------------------
# edit_distance_pairs: exact string similarity self-join (Ed-Join)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [2, 6])
def test_edit_distance_matches_duckdb_bruteforce(spark, k):
    from conduino_spark import edit_distance_pairs
    from conduino_spark.operators.dedup import edit_distance_pairs_sql
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.substring("text", 1, 40).alias("s")))
    got = sorted(tuple(r) for r in
                 edit_distance_pairs(text_col="s", k=k)(docs).collect())
    want = _duck_with_views().execute(
        edit_distance_pairs_sql(k, expr="substr(text, 1, 40)")).fetchall()
    assert got == sorted(tuple(r) for r in want)
    assert len(got) > 0


def _lev(a, b):
    """Reference Levenshtein, pure Python DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(**_LAW9)
@given(strs=st.lists(st.text(alphabet="ab", min_size=0, max_size=8),
                     min_size=2, max_size=8),
       k=st.sampled_from([0, 1, 2, 3]))
def test_edit_distance_law_any_strings(spark, strs, k):
    """For ANY tiny corpus of short strings, the pruned join equals a
    pure-Python brute force — the worst case for the q-gram filter:
    most strings are SHORT (n_grams <= k*q, the length-bucket arm),
    the 2-letter alphabet maximizes gram collisions, and empties pair
    with anything within k characters."""
    from conduino_spark import edit_distance_pairs
    df = spark.createDataFrame(list(enumerate(strs)),
                               "doc_id long, s string")
    got = sorted((r.id_a, r.id_b, r.dist) for r in
                 edit_distance_pairs(text_col="s", k=k)(df).collect())
    want = sorted((i, j, _lev(strs[i], strs[j]))
                  for i in range(len(strs))
                  for j in range(i + 1, len(strs))
                  if _lev(strs[i], strs[j]) <= k)
    assert got == want


def test_edit_distance_edges(spark):
    from conduino_spark import edit_distance_pairs
    df = spark.createDataFrame(
        [(1, "conduit"), (2, "conduits"), (3, None), (4, ""),
         (5, "x"), (6, "a completely different sentence")],
        "doc_id long, s string")
    got = sorted((r.id_a, r.id_b, r.dist) for r in
                 edit_distance_pairs(text_col="s", k=1)(df).collect())
    # conduit~conduits (1 insert); ''~'x' (1 insert); NULL dropped
    assert got == [(1, 2, 1), (4, 5, 1)]
    with pytest.raises(ValueError, match="k must be"):
        edit_distance_pairs(k=-1)
    with pytest.raises(ValueError, match="q must be"):
        edit_distance_pairs(q=1)


# ---------------------------------------------------------------------------
# phrase_search + bm25 index persistence
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("phrase", ["row scan", "the part data",
                                    "value", "no such phrase zz"])
def test_phrase_search_matches_duckdb(spark, phrase):
    from conduino_spark.operators.search import (
        phrase_search, phrase_search_sql)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in phrase_search(phrase)(docs).collect())
    want = _duck_with_views().execute(phrase_search_sql(phrase)).fetchall()
    assert got == sorted(tuple(r) for r in want)


def test_phrase_search_overlaps_duplicates_edges(spark):
    from conduino_spark.operators.search import phrase_search
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a b a"), (3, None), (4, ""),
         (5, "x a a y a a")],
        "doc_id long, text string")
    # 'a a' overlaps in doc 1 (anchors 0,1); doc 2 has none (gap);
    # doc 5 has two separated runs (anchors 1, 4)
    got = sorted(tuple(r) for r in phrase_search("a a")(df).collect())
    assert got == [(1, 2, 0), (5, 2, 1)]
    with pytest.raises(ValueError, match="phrase"):
        phrase_search("   ")


@settings(**_LAW9)
@given(docs=st.lists(st.lists(st.sampled_from("ab"), min_size=0,
                              max_size=8), min_size=1, max_size=6),
       phrase=st.lists(st.sampled_from("ab"), min_size=1, max_size=3))
def test_phrase_search_law_any_corpora(spark, docs, phrase):
    """For ANY tiny corpus over {a,b}, anchor-join phrase search
    equals a pure-Python sliding-window scan (worst case: maximal
    self-overlap, duplicate phrase terms)."""
    from conduino_spark.operators.search import phrase_search
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string")
    got = sorted(tuple(r) for r in phrase_search(phrase)(df).collect())
    m = len(phrase)
    want = []
    for i, toks in enumerate(docs):
        hits = [p for p in range(len(toks) - m + 1)
                if toks[p:p + m] == phrase]
        if hits:
            want.append((i, len(hits), hits[0]))
    assert got == sorted(want)


def test_bm25_index_join_equals_bm25_join_and_oracle(spark, tmp_path):
    """The persisted-index probe returns bit-identical rows to the
    in-memory join AND to the DuckDB replay (term_round=6)."""
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_write, bm25_join, bm25_join_sql)
    from conduino_spark.operators.text import tokens_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "idx")
    bm25_index_write(docs, d, n_shards=16)
    got = sorted(tuple(r) for r in
                 bm25_index_join(d, k=5, term_round=6)
                 (_bm25_queries(spark))
                 .select("query_id", "doc_id", "bm25", "rank").collect())
    mem = sorted(tuple(r) for r in
                 bm25_join(docs, k=5, term_round=6)(_bm25_queries(spark))
                 .select("query_id", "doc_id", "bm25", "rank").collect())
    assert got == mem
    toks = tokens_sql("text")
    qsql = f"""(SELECT doc_id AS query_id,
                       array_to_string(({toks})[1:5], ' ') AS query
                FROM documents WHERE doc_id % 50 = 0)"""
    want = _duck_with_views().execute(
        bm25_join_sql(5, queries=qsql, term_round=6)).fetchall()
    assert got == sorted(tuple(r) for r in want)


def test_bm25_index_partition_pruning(spark, tmp_path):
    """The probe plan carries a dynamic partition pruning filter on
    the postings scan — whole token shards the query batch doesn't
    hash into are never read."""
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "idx")
    bm25_index_write(docs, d, n_shards=16)
    # a parquet-backed probe batch (the real usage shape): DPP's
    # benefit estimate needs relation stats on the filtering side —
    # an in-memory createDataFrame probe has none and is not pruned
    plan = (bm25_index_join(d, k=3)(_bm25_queries(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan
    with pytest.raises(ValueError, match="n_shards"):
        bm25_index_write(docs, d, n_shards=0)


# ---------------------------------------------------------------------------
# rrf_fuse: hybrid sparse+dense retrieval fusion
# ---------------------------------------------------------------------------

def test_rrf_fuse_hand_example(spark):
    """Exact scaled-long RRF arithmetic + doc-id tie-break."""
    from conduino_spark.operators.search import rrf_fuse
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id long, doc_id long, rank int")
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (2, 21, 1)],
        "query_id long, doc_id long, rank int")
    got = {(r.query_id, r.doc_id): (r.rrf, r.rank) for r in
           rrf_fuse({"a": a, "b": b}, c=60, k=10).collect()}
    s = 10 ** 9

    def contrib(rank):
        return round(s / (rank + 60))
    # doc 11 appears in both lists: rank 2 in a, rank 1 in b
    assert got[(1, 11)][0] == round((contrib(2) + contrib(1)) / s, 6)
    assert got[(1, 11)][1] == 1  # fused top
    assert got[(1, 10)][0] == round(contrib(1) / s, 6)
    # 10 and 12 tie on score (both single rank-1/rank-2?) — no: 10 has
    # rank 1, 12 has rank 2; 10 outranks 12
    assert got[(1, 10)][1] == 2 and got[(1, 12)][1] == 3
    # ties break by doc id: 20 and 21 both rank-1 singletons
    assert got[(2, 20)][1] == 1 and got[(2, 21)][1] == 2
    with pytest.raises(ValueError, match="ranked"):
        rrf_fuse({})
    with pytest.raises(ValueError, match="c must"):
        rrf_fuse({"a": a}, c=-1)


def test_hybrid_retrieval_bit_replay(spark):
    """The COMPOSED hybrid stack — bm25_join (sparse) + ann_join
    (dense) fused by RRF — replays bit-for-bit in DuckDB (scaled-long
    contributions over both systems' exact-mode ranks)."""
    from conduino_spark.operators.search import bm25_join_sql, rrf_fuse_sql
    from conduino_spark.operators.text import tokens_sql
    e = _load_entry()
    got = sorted(tuple(r) for r in
                 e.bench_extras()["hybrid_retrieval_docs"](spark, SF)
                 .collect())
    toks = tokens_sql("text")
    qsql = f"""(SELECT doc_id AS query_id,
                       array_to_string(({toks})[1:5], ' ') AS query
                FROM documents WHERE doc_id % 50 = 0)"""
    dense_sql = f"""SELECT vec_id AS query_id,
                           neighbor_id AS doc_id, rank
                    FROM ({e._sql_ann_join(10, 2,
                           sample="vec_id % 50 = 0")})"""
    want = _duck_with_views().execute(rrf_fuse_sql(
        {"sparse": bm25_join_sql(10, queries=qsql, term_round=6),
         "dense": dense_sql}, c=60, k=10)).fetchall()
    assert got == sorted(tuple(r) for r in want)
    assert len(got) > 0


def test_bm25_index_join_microbatch_replay_equals_batch(spark, tmp_path):
    """The retrieval-service deployment shape: queries arrive as
    micro-batches scored against the FROZEN persisted index.  Scoring
    is per-query (candidates, stats, and ranks never cross query
    ids), so the foreachBatch replay equals the batch run exactly."""
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "idx")
    bm25_index_write(docs, d, n_shards=16)
    stage = bm25_index_join(d, k=5, term_round=6)

    def hits(qdf):
        return {(r.query_id, r.rank): (r.doc_id, r.bm25) for r in
                stage(qdf).collect()}

    qs = _bm25_queries(spark)
    want = hits(qs)
    got = {**hits(qs.filter(F.col("query_id") % 100 == 0)),
           **hits(qs.filter(F.col("query_id") % 100 != 0))}
    assert got == want and len(want) == 50


def test_phrase_search_microbatch_replay_equals_batch(spark):
    """phrase_search is per-document (anchors never cross doc ids), so
    the streaming foreachBatch deployment replays the batch run."""
    from conduino_spark.operators.search import phrase_search
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stage = phrase_search("row scan")

    def hits(df):
        return {r.doc_id: (r.n_hits, r.first_pos) for r in
                stage(df).collect()}

    want = hits(docs)
    got = {**hits(docs.filter(F.col("doc_id") % 2 == 0)),
           **hits(docs.filter(F.col("doc_id") % 2 == 1))}
    assert got == want and len(want) == 29


# ---------------------------------------------------------------------------
# ann_recall: quality audit for approximate dense retrieval
# ---------------------------------------------------------------------------

def test_ann_recall_hand_example(spark):
    from conduino_spark.operators.similarity import ann_recall
    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "vec_id long, neighbor_id long, rank int")
    approx = spark.createDataFrame(
        # query 1: found 2 of 3 (one beyond k excluded); query 2: none
        [(1, 10, 1), (1, 12, 2), (1, 11, 9), (3, 99, 1)],
        "vec_id long, neighbor_id long, rank int")
    got = {r.vec_id: (r.n_truth, r.n_hit, r.recall) for r in
           ann_recall(truth, k=3)(approx).collect()}
    assert got == {1: (3, 2, round(2 / 3, 6)), 2: (2, 0, 0.0)}
    with pytest.raises(ValueError, match="k >= 1"):
        ann_recall(truth, k=0)


def test_ann_recall_ivf_vs_exact_replay(spark):
    """Real audit: ann_join at nprobe=2 measured against nprobe=8
    (= all cells, exact), replayed bit-for-bit in DuckDB through the
    same two oracles."""
    from conduino_spark import ann_join, hash_sample
    from conduino_spark.operators.similarity import ann_recall, ann_recall_sql
    e = _load_entry()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = hash_sample("vec_id", 0.1, salt="annq")(emb)
    approx = ann_join(emb, k=5, nprobe=2, exclude_self=True)(batch)
    exact = ann_join(emb, k=5, nprobe=8, exclude_self=True)(batch)
    got = sorted(tuple(r) for r in
                 ann_recall(exact, k=5)(approx).collect())
    want = _duck_with_views().execute(ann_recall_sql(
        e._sql_ann_join(5, 2), e._sql_ann_join(5, 8), 5)).fetchall()
    assert got == sorted(tuple(r) for r in want)
    # structural: nprobe=2 on 8 cells should miss SOMETHING (else the
    # audit is vacuous) yet find most neighbors
    rec = [r[3] for r in got]
    assert 0.3 < sum(rec) / len(rec) <= 1.0


# ---------------------------------------------------------------------------
# dup_span_trim: the removal half of exact-substring dedup (Lee et al.)
# ---------------------------------------------------------------------------

def _ref_trim(docs, L):
    """Pure-Python model: mask every occurrence of a duplicated
    L-window except the global-first (doc, pos); cut masked tokens."""
    occ = {}
    for d, t in docs.items():
        for p in range(max(len(t) - L + 1, 0)):
            occ.setdefault(tuple(t[p:p + L]), []).append((d, p))
    masked = {d: set() for d in docs}
    for hits in occ.values():
        if len(hits) >= 2:
            for d, p in sorted(hits)[1:]:
                masked[d].update(range(p, p + L))
    out = {}
    for d, t in docs.items():
        kept = [tok for i, tok in enumerate(t) if i not in masked[d]]
        out[d] = (" ".join(kept) if masked[d] else None,  # None = untouched
                  len(t), len(t) - len(kept))
    return out


def test_dup_span_trim_hand_example(spark):
    from conduino_spark import dup_span_trim
    # doc 1 holds the first occurrence of "a b c"; doc 2 repeats it
    # twice (once mid-text, once at the end); doc 3 is clean; doc 4's
    # repetition is WITHIN the doc (second copy still cut)
    df = spark.createDataFrame(
        [(1, "a b c x y"), (2, "q a b c r a b c"), (3, "u v w"),
         (4, "m n o m n o"), (None, "a b c"), (9, None)],
        "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed)
           for r in dup_span_trim(window_tokens=3)(df).collect()}
    assert got == {1: ("a b c x y", 5, 0),     # global first, untouched
                   2: ("q r", 8, 6),           # both later copies cut
                   3: ("u v w", 3, 0),
                   4: ("m n o", 6, 3),         # within-doc repeat cut
                   9: (None, 0, 0)}            # NULL text: untouched
    assert None not in got                     # NULL ids dropped
    with pytest.raises(ValueError, match="window_tokens"):
        dup_span_trim(window_tokens=0)


def test_dup_span_trim_untouched_keeps_original_bytes(spark):
    from conduino_spark import dup_span_trim
    df = spark.createDataFrame(
        [(1, "  Mixed   CASE\ttext  "), (2, "other words here")],
        "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in dup_span_trim(window_tokens=2)(df).collect()}
    # no duplication anywhere -> original text preserved byte-for-byte
    assert got[1] == "  Mixed   CASE\ttext  "


@pytest.mark.parametrize("L", [4, 8])
def test_dup_span_trim_duckdb_replay(spark, L):
    from conduino_spark import dup_span_trim
    from conduino_spark.operators.dedup import dup_span_trim_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in
                 dup_span_trim(window_tokens=L)(docs).collect())
    want = _duck_with_views().execute(dup_span_trim_sql(L)).fetchall()
    assert got == sorted(tuple(r) for r in want)
    assert sum(r[3] for r in got) > 0      # the corpus HAS duplication


_TRIM_DOC = st.lists(st.sampled_from("abc"), min_size=0, max_size=12)


@given(docs=st.lists(_TRIM_DOC, min_size=1, max_size=6),
       L=st.integers(min_value=1, max_value=4))
@settings(**_LAW9)
def test_dup_span_trim_matches_python_model(spark, docs, L):
    from conduino_spark import dup_span_trim
    data = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in data.items()],
        "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed)
           for r in dup_span_trim(window_tokens=L)(df).collect()}
    for d, (txt, nt, nrm) in _ref_trim(data, L).items():
        exp_txt = " ".join(data[d]) if txt is None else txt
        assert got[d] == (exp_txt, nt, nrm), (d, data, L)


# ---------------------------------------------------------------------------
# bm25_index_merge: incremental index maintenance
# ---------------------------------------------------------------------------

def test_bm25_index_merge_equals_full_rebuild(spark, tmp_path):
    """write(A) + merge(B) + merge(C) must be indistinguishable from a
    from-scratch build over A∪B∪C — bit-equal probes in both scoring
    modes (long-additive stats/dfreq make this exact, not approximate)."""
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_merge, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where(F.col("doc_id") % 3 == 0)
    b = docs.where(F.col("doc_id") % 3 == 1)
    c = docs.where(F.col("doc_id") % 3 == 2)

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    bm25_index_write(a, inc, n_shards=16)
    bm25_index_merge(b, inc)
    bm25_index_merge(c, inc)
    bm25_index_write(docs, full, n_shards=16)

    qs = _bm25_queries(spark)
    for mode in (6, None):
        got = sorted(tuple(r) for r in
                     bm25_index_join(inc, k=5, term_round=mode)(qs)
                     .collect())
        want = sorted(tuple(r) for r in
                      bm25_index_join(full, k=5, term_round=mode)(qs)
                      .collect())
        assert got == want and len(got) > 0


def test_bm25_index_merge_empty_batch_is_noop(spark, tmp_path):
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_merge, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "idx")
    bm25_index_write(docs, d, n_shards=16)
    qs = _bm25_queries(spark)
    before = sorted(tuple(r) for r in
                    bm25_index_join(d, k=5, term_round=6)(qs).collect())
    bm25_index_merge(docs.where(F.lit(False)), d)
    after = sorted(tuple(r) for r in
                   bm25_index_join(d, k=5, term_round=6)(qs).collect())
    assert before == after


def test_bm25_index_inconsistent_shards_raises(spark, tmp_path):
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "idx")
    bm25_index_write(docs.limit(5), d, n_shards=16)
    # simulate drift: a second writer appends with a DIFFERENT modulus
    from pyspark.sql import functions as SF_
    (docs.limit(3).agg(SF_.count(SF_.lit(1)).alias("__n"),
                       SF_.lit(7).cast("long").alias("__sum_dl"),
                       SF_.lit(32).alias("__n_shards"))
         .write.mode("append").parquet(f"{d}/stats"))
    with pytest.raises(ValueError, match="inconsistent n_shards"):
        bm25_index_join(d, k=5)(_bm25_queries(spark)).collect()


# ---------------------------------------------------------------------------
# SQ8: scalar-quantized ANN (train / encode / asymmetric search)
# ---------------------------------------------------------------------------

def test_sq_hand_example(spark):
    from conduino_spark import SQModel, sq_encode, sq_search, sq_train
    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0]), (3, [0.5, 15.0]),
         (4, None), (6, [2.0, None])],
        "vec_id long, embedding array<double>")
    m = sq_train(df, vec_col="embedding")
    # NULL vector and NULL-element rows excluded from the bounds
    assert (m.mins, m.maxs) == ([0.0, 10.0], [1.0, 20.0])
    enc = {r.vec_id: r.sq_codes
           for r in sq_encode(m)(df).collect()}
    # NULL / NULL-element rows dropped; bounds map to 0/255
    assert set(enc) == {1, 2, 3}
    assert enc[1] == [0, 0] and enc[2] == [255, 255]
    assert enc[3] == [128, 128]            # 0.5 -> 127.5 rounds HALF_UP
    got = sq_search(m, [0.0, 10.0], kk=2)(
        sq_encode(m)(df)).collect()
    assert [r.vec_id for r in got] == [1, 3]
    assert got[0].approx_dist == 0.0
    with pytest.raises(ValueError, match="query dim"):
        sq_search(m, [0.0], kk=2)
    with pytest.raises(ValueError, match="kk"):
        sq_search(m, [0.0, 1.0], kk=0)
    with pytest.raises(ValueError, match="mismatch"):
        SQModel([0.0], [1.0, 2.0])
    # mixed dimensions RAISE (an arbitrary-row d would make the model
    # partition-order-dependent); all-unusable raises too
    mixed = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="mixed vector dimensions"):
        sq_train(mixed)
    bad = spark.createDataFrame(
        [(1, None), (2, [1.0, None])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no usable vectors"):
        sq_train(bad)


def test_sq_degenerate_dim(spark):
    from conduino_spark import sq_encode, sq_search, sq_train
    df = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 3.0])],
        "vec_id long, embedding array<double>")
    m = sq_train(df)
    assert m.mins[0] == m.maxs[0] == 5.0
    enc = {r.vec_id: r.sq_codes for r in sq_encode(m)(df).collect()}
    assert enc[1][0] == 0 and enc[2][0] == 0    # mx == mn encodes 0
    # decode of the degenerate dim is mn (scale 0): dist ignores it
    got = sq_search(m, [5.0, 1.0], kk=1)(sq_encode(m)(df)).collect()
    assert got[0].vec_id == 1 and got[0].approx_dist == 0.0


def test_sq_duckdb_replay(spark):
    """Full train+encode+search pipeline replayed bit-for-bit."""
    from conduino_spark import sq_encode, sq_search, sq_train
    from conduino_spark.operators.similarity import sq_sql
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qid = emb.agg(F.min("vec_id")).first()[0]
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == qid).first()["embedding"]]
    m = sq_train(emb)
    got = [tuple(r) for r in
           sq_search(m, qvec, kk=10)(sq_encode(m)(emb)).collect()]
    want = _duck_with_views().execute(sq_sql(10, query_id=qid)).fetchall()
    assert got == [tuple(r) for r in want]
    # the self-row's quantization error is small but real
    assert got[0][0] == qid and 0.0 <= got[0][1] < 1.0


def test_sq_quantization_error_bounded(spark):
    """SQ8 ranks must agree with exact brute-force on clearly
    separated neighbors: recall@10 of SQ vs exact > 0.5 on the real
    embeddings (quantization is lossy, not random)."""
    from conduino_spark import sq_encode, sq_search, sq_train
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qid = emb.agg(F.min("vec_id")).first()[0]
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == qid).first()["embedding"]]
    m = sq_train(emb)
    approx = {r.vec_id for r in
              sq_search(m, qvec, kk=10)(sq_encode(m)(emb)).collect()}
    q = F.array(*[F.lit(x) for x in qvec])
    l2 = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), q,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda a, t: a + t)
    exact = {r.vec_id for r in
             emb.select("vec_id", l2.alias("d"))
                .orderBy("d", "vec_id").limit(10).collect()}
    assert len(approx & exact) >= 5


# ---------------------------------------------------------------------------
# IVF persisted index: ivf_index_write / ivf_index_join + ann_join centroids
# ---------------------------------------------------------------------------

def test_ann_join_centroids_param_matches_data_means(spark):
    """ann_join with an explicit centroids model equal to the data
    means must reproduce the data-derived path bit-for-bit (same
    scaled-long arithmetic both ways)."""
    from conduino_spark import ann_join, cell_centroids, hash_sample
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = hash_sample("vec_id", 0.1, salt="annq")(emb)
    cents = cell_centroids(emb, cell_col="label")
    got = sorted(tuple(r) for r in
                 ann_join(emb, k=5, nprobe=2, exclude_self=True,
                          centroids=cents)(batch).collect())
    want = sorted(tuple(r) for r in
                  ann_join(emb, k=5, nprobe=2,
                           exclude_self=True)(batch).collect())
    assert got == want and len(got) > 0


def test_ivf_index_join_equals_in_memory(spark, tmp_path):
    """The persisted-index probe reproduces the in-memory ann_join
    over the same quantizer assignment, bit-for-bit."""
    from conduino_spark import (ann_join, hash_sample, ivf_index_join,
                                ivf_index_write, kmeans_assign,
                                kmeans_fit)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = kmeans_fit(emb, k=8, iters=2)
    d = str(tmp_path / "ivf")
    ivf_index_write(emb, d, model)
    batch = hash_sample("vec_id", 0.1, salt="annq")(emb)
    got = sorted(tuple(r) for r in
                 ivf_index_join(d, k=5, nprobe=2,
                                exclude_self=True)(batch).collect())
    assigned = kmeans_assign(model)(emb)
    want = sorted(tuple(r) for r in
                  ann_join(assigned, k=5, nprobe=2, cell_col="cell",
                           exclude_self=True,
                           centroids=model.centroids)(batch).collect())
    assert got == want and len(got) > 0


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The probe plan prunes the partitioned vectors scan to the
    probed cells — dynamic partition pruning on the cell directory
    column, the bm25_index DPP posture for the dense side."""
    from conduino_spark import (hash_sample, ivf_index_join,
                                ivf_index_write, kmeans_fit)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = kmeans_fit(emb, k=8, iters=2)
    d = str(tmp_path / "ivf")
    ivf_index_write(emb, d, model)
    batch = hash_sample("vec_id", 0.02, salt="annq")(emb)
    plan = (ivf_index_join(d, k=5, nprobe=1)(batch)
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan


def test_bm25_index_merge_streaming_ingestion(spark, tmp_path):
    """The ingestion-service deployment made REAL: a file-source
    stream of document batches folds into the persisted index via
    foreachBatch(bm25_index_merge) — one micro-batch per arriving
    file — and probes against the final index are bit-equal to a
    from-scratch rebuild over everything ingested.  Merge order never
    matters (all three index tables are additive), so the law holds
    whatever order the stream delivers the files."""
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_merge, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where(F.col("doc_id") % 3 == 0)
    inbox = str(tmp_path / "inbox")
    docs.where(F.col("doc_id") % 3 == 1).coalesce(1) \
        .write.parquet(f"{inbox}/b1")
    docs.where(F.col("doc_id") % 3 == 2).coalesce(1) \
        .write.parquet(f"{inbox}/b2")

    idx = str(tmp_path / "idx")
    bm25_index_write(a, idx, n_shards=16)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid: bm25_index_merge(b, idx))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    full = str(tmp_path / "full")
    bm25_index_write(docs, full, n_shards=16)
    qs = _bm25_queries(spark)
    got = sorted(tuple(r) for r in
                 bm25_index_join(idx, k=5, term_round=6)(qs).collect())
    want = sorted(tuple(r) for r in
                  bm25_index_join(full, k=5, term_round=6)(qs).collect())
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# hashing_tf: vocab-free featurizer (hashing trick)
# ---------------------------------------------------------------------------

def test_hashing_tf_hand_example(spark):
    from conduino_spark import hashing_tf
    from conduino_spark.functions.hashing import h32
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.tf for r in hashing_tf(dim=8)(df).collect()}
    slot = {t: spark.range(1).select(
        F.pmod(h32(F.lit(t)), F.lit(8)).cast("int")).first()[0]
        for t in ("a", "b")}
    want1 = [0] * 8
    want1[slot["a"]] += 2
    want1[slot["b"]] += 1
    assert got[1] == want1
    assert got[2] == [0] * 8 and got[3] == [0] * 8   # empty/NULL text
    assert sum(got[1]) == 3
    with pytest.raises(ValueError, match="dim"):
        hashing_tf(dim=0)


def test_hashing_tf_duckdb_replay_and_dense_consistency(spark):
    from conduino_spark import hashing_tf
    from conduino_spark.operators.text import hashing_tf_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dense = {r.doc_id: r.tf
             for r in hashing_tf(dim=64)(docs).collect()}
    sparse = {(d, s): c for d, s, c in
              _duck_with_views().execute(hashing_tf_sql(64)).fetchall()}
    # every oracle count appears at its slot; every other slot is 0
    for d, vec in dense.items():
        for s, c in enumerate(vec):
            assert c == sparse.get((d, s), 0), (d, s)
    assert len(sparse) > 0
    # sparse mode carries the same content
    sm = {r.doc_id: dict(r.tf) for r in
          hashing_tf(dim=64, dense=False)(docs).collect()}
    for d, vec in dense.items():
        assert all(vec[s] == c for s, c in sm[d].items())
        assert sum(vec) == sum(sm[d].values())


def test_hashing_tf_feeds_logreg(spark):
    """The canonical composition: hashing_tf slots as feature columns
    into the distributed logreg trainer — a full text classifier with
    no vocabulary table."""
    from conduino_spark import hashing_tf
    from conduino_spark.operators.classifier import (logreg_score,
                                                     logreg_train)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feat = hashing_tf(dim=16)(docs).select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y"),
        *[F.element_at("tf", i + 1).cast("double").alias(f"f{i}")
          for i in range(16)])
    model = logreg_train(feat, [f"f{i}" for i in range(16)], "y",
                         iters=5, lr=0.5)
    scored = logreg_score(model)(feat)
    rows = scored.select("doc_id", "score").collect()
    assert len(rows) > 0 and all(0.0 <= r.score <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# winnow_fingerprints: MOSS winnowing (Schleimer et al. SIGMOD'03)
# ---------------------------------------------------------------------------

def _ref_winnow(tokens, k, w):
    """Pure-Python winnowing with the rightmost-min rule."""
    import hashlib
    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
    grams = [" ".join(tokens[i:i + k])
             for i in range(max(len(tokens) - k + 1, 0))]
    hs = [h(g) for g in grams]
    out = set()
    for i in range(max(len(hs) - w + 1, 0)):
        win = hs[i:i + w]
        mn = min(win)
        pos = i + max(j for j in range(w) if win[j] == mn)
        out.add((pos, mn))
    return out


def test_winnow_hand_and_model(spark):
    from conduino_spark import winnow_fingerprints
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x"), (None, "a b c d e")],
        "doc_id long, text string")
    got = {(r.doc_id, r.pos, r.fp) for r in
           winnow_fingerprints(k=2, w=3)(df).collect()}
    want = {(1, p, fp) for p, fp in
            _ref_winnow("a b c d e f g h".split(), 2, 3)}
    assert got == want                     # doc 2 too short, NULL id out
    with pytest.raises(ValueError, match="k >= 1"):
        winnow_fingerprints(k=0)


@given(toks=st.lists(st.sampled_from("abcd"), min_size=0, max_size=20),
       k=st.integers(min_value=1, max_value=3),
       w=st.integers(min_value=1, max_value=4))
@settings(**_LAW9)
def test_winnow_matches_python_model(spark, toks, k, w):
    from conduino_spark import winnow_fingerprints
    df = spark.createDataFrame([(1, " ".join(toks))],
                               "doc_id long, text string")
    got = {(r.pos, r.fp) for r in
           winnow_fingerprints(k=k, w=w)(df).collect()}
    assert got == _ref_winnow(toks, k, w), (toks, k, w)


def test_winnow_duckdb_replay_and_guarantee(spark):
    from conduino_spark import winnow_fingerprints
    from conduino_spark.operators.dedup import winnow_fingerprints_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in
                 winnow_fingerprints(k=5, w=4)(docs).collect())
    want = _duck_with_views().execute(
        winnow_fingerprints_sql(5, 4)).fetchall()
    assert got == sorted(tuple(r) for r in want) and len(got) > 0
    # the paper's guarantee: two docs sharing a >= w+k-1 token run
    # share at least one fingerprint HASH
    a = "p q r s t u v w x y z"
    pair = spark.createDataFrame(
        [(1, "zz1 zz2 " + a), (2, a + " qq8 qq9")],
        "doc_id long, text string")
    fps = winnow_fingerprints(k=3, w=3)(pair)   # w+k-1 = 5 <= 11 shared
    common = (fps.where(F.col("doc_id") == 1).select("fp").intersect(
              fps.where(F.col("doc_id") == 2).select("fp")))
    assert common.count() >= 1


def test_bm25_index_v1_format_fails_fast(spark, tmp_path):
    """A pre-additive (v1, __avgdl) index raises a clear rebuild
    message from BOTH the probe and the merge — appending v2 partials
    into v1 stats would leave mixed-schema files."""
    from conduino_spark.operators.search import (
        bm25_index_join, bm25_index_merge, bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "idx")
    bm25_index_write(docs.limit(5), d, n_shards=8)
    # rewrite stats in the old v1 shape
    (spark.createDataFrame([(5, 12.5, 8)],
                           "__n long, __avgdl double, __n_shards int")
     .write.mode("overwrite").parquet(f"{d}/stats"))
    with pytest.raises(ValueError, match="v1 stats format"):
        bm25_index_join(d, k=3)(_bm25_queries(spark)).collect()
    with pytest.raises(ValueError, match="v1 stats format"):
        bm25_index_merge(docs.limit(2), d)


def test_hashing_tf_null_id_dropped(spark):
    from conduino_spark import hashing_tf
    df = spark.createDataFrame([(1, "a b"), (None, "a b a")],
                               "doc_id long, text string")
    rows = hashing_tf(dim=8)(df).collect()
    assert [r.doc_id for r in rows] == [1]
