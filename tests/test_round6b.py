"""Round-6 second-half operators: corpus line dedup (Falcon-style),
interpolated bigram LM scoring, SemDeDup-style semantic dedup.

Oracles: DuckDB replay for line_dedup and semantic_dedup (exact), a
pure-Python 1e-9 reference for bigram_logprob (libm ln — the
unigram/BM25 tolerance contract).
"""
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    bigram_logprob, bigram_vocab, line_dedup, semantic_dedup,
    unigram_vocab,
)

# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------

_BOILER = "subscribe to our newsletter today"
_COOKIE = "this site uses cookies"
_DOCS = [
    (1, f"unique opening line alpha\n{_BOILER}\nreal content one here\n"
        f"{_COOKIE}"),
    (2, f"{_BOILER}\nreal content two differs\nx\n{_COOKIE}"),
    (3, f"  {_BOILER.upper()}  \nonly original text in three"),
    (4, f"{_BOILER}\n{_COOKIE}"),          # every countable line dropped
    (5, "x\ny"),                            # short lines: exempt
    (6, None),                              # NULL text passes through
]


def _line_docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_line_dedup_matches_duckdb(spark):
    out = (line_dedup(min_count=2, min_chars=5)(_line_docs(spark))
           .select("doc_id", "text", "n_lines", "n_lines_dropped"))
    got = sorted(tuple(r) for r in out.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", _DOCS)
    want = sorted(tuple(r) for r in con.execute("""
        WITH lines AS (
          SELECT doc_id, pos, line, lower(trim(line)) AS nl
          FROM (SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1)
                         AS pos
                FROM docs)),
        dup AS (SELECT nl FROM lines WHERE len(nl) >= 5
                GROUP BY nl HAVING COUNT(*) >= 2),
        fl AS (SELECT l.*,
                      (len(nl) >= 5 AND nl IN (SELECT nl FROM dup)) AS drp
               FROM lines l),
        re AS (SELECT doc_id, COUNT(*) AS n_lines,
                      SUM(CASE WHEN drp THEN 1 ELSE 0 END)
                        AS n_lines_dropped,
                      coalesce(string_agg(CASE WHEN NOT drp THEN line END,
                                          chr(10) ORDER BY pos), '') AS t
               FROM fl GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN re.doc_id IS NULL THEN d.text ELSE re.t END
                 AS text,
               coalesce(n_lines, 0) AS n_lines,
               coalesce(n_lines_dropped, 0) AS n_lines_dropped
        FROM docs d LEFT JOIN re USING (doc_id)""").fetchall())
    assert got == want
    # the boilerplate lines are really gone, case/pad-insensitively
    txt = dict((r[0], r[1]) for r in got)
    assert _BOILER not in (txt[1] or "") and _COOKIE not in (txt[1] or "")
    assert txt[4] == ""
    assert txt[5] == "x\ny"          # short lines exempt
    assert txt[6] is None            # NULL passthrough


def test_line_dedup_second_pass_is_noop(spark):
    first = line_dedup(min_count=2, min_chars=5)(_line_docs(spark))
    again = line_dedup(min_count=2, min_chars=5)(
        first.select("doc_id", "text"))
    assert again.where(F.col("n_lines_dropped") > 0).count() == 0
    assert sorted((r.doc_id, r.text) for r in again.collect()) == \
        sorted((r.doc_id, r.text) for r in first.collect())


def test_line_dedup_min_count_validation():
    with pytest.raises(ValueError):
        line_dedup(min_count=1)


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------

_CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat"),
]
_SCORED = [
    (10, "the cat sat"),        # all bigrams seen
    (11, "the zebra sat"),      # unseen bigrams, one OOV token
    (12, "cat"),                # single token -> NULL
    (13, ""),                   # empty -> NULL
]


def _py_bigram_ref(alpha, lam):
    """Pure-Python reference over _CORPUS / _SCORED."""
    uni, big = {}, {}
    for _, t in _CORPUS:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    N, V = sum(uni.values()), len(uni)
    prefix = {}
    for (a, _), c in big.items():
        prefix[a] = prefix.get(a, 0) + c

    def p_uni(t):
        return (uni.get(t, 0) + alpha) / (N + alpha * (V + 1))

    out = {}
    for did, t in _SCORED:
        toks = t.split()
        if len(toks) < 2:
            out[did] = None
            continue
        lps = []
        for a, b in zip(toks, toks[1:]):
            pb = big.get((a, b), 0) / prefix[a] if prefix.get(a) else 0.0
            lps.append(math.log(lam * pb + (1 - lam) * p_uni(b)))
        out[did] = sum(lps) / len(lps)
    return out


@pytest.mark.parametrize("alpha,lam", [(0.5, 0.7), (1.0, 0.0)])
def test_bigram_logprob_reference(spark, alpha, lam):
    corpus = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    uni = unigram_vocab()(corpus)
    big = bigram_vocab()(corpus)
    docs = spark.createDataFrame(_SCORED, "doc_id long, text string")
    got = {r.doc_id: r.bigram_logprob_per_token
           for r in bigram_logprob(big, uni, alpha=alpha, lam=lam)(docs)
           .collect()}
    want = _py_bigram_ref(alpha, lam)
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, k
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_bigram_logprob_validation(spark):
    corpus = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    uni = unigram_vocab()(corpus)
    big = bigram_vocab()(corpus)
    with pytest.raises(ValueError):
        bigram_logprob(big, uni, lam=1.0)
    with pytest.raises(ValueError):
        bigram_logprob(big, uni, alpha=0.0)


def test_bigram_vocab_counts(spark):
    corpus = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {(r.prev, r.token): r["count"]
           for r in bigram_vocab()(corpus).collect()}
    assert got[("the", "cat")] == 2
    assert got[("cat", "sat")] == 1
    assert ("mat", "the") not in got        # no cross-document pairs
    assert sum(got.values()) == sum(len(t.split()) - 1 for _, t in _CORPUS)


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_matches_duckdb(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = semantic_dedup(threshold=0.2, bucket_col="label")(emb)
    got = sorted(r.vec_id for r in kept.select("vec_id").collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    want = [r[0] for r in con.execute("""
        WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                        sqrt(list_sum([x * x
                                       for x in embedding::DOUBLE[]])) AS n
                      FROM embeddings),
        losers AS (SELECT DISTINCT b.vec_id
                   FROM base a JOIN base b
                     ON a.label = b.label AND a.vec_id < b.vec_id
                   WHERE round(list_sum([a.v[i] * b.v[i]
                                for i in range(1, len(a.v) + 1)])
                               / (a.n * b.n), 6) >= 0.2)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT vec_id FROM losers)
        ORDER BY vec_id""").fetchall()]
    assert got == want
    assert 0 < len(got) < emb.count()       # non-vacuous both ways


def test_semantic_dedup_greedy_law(spark, sf_dir):
    """Survivor rule: a dropped id has a similar LOWER id; the MINIMUM
    id of every bucket always survives."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = {r.vec_id
            for r in semantic_dedup(threshold=0.2, bucket_col="label")(emb)
            .select("vec_id").collect()}
    mins = {r[0] for r in
            emb.groupBy("label").agg(F.min("vec_id")).collect()}
    assert mins <= kept
