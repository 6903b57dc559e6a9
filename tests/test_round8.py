"""Round 8: driver-faithful oracle typing, gemm NULL parity,
tunable MinHash banding, gate-rotation pins.

Reference semantics anchors cited per test; the oracle-typing guards
exist because the driver fetches DuckDB results via Arrow/pandas,
where HUGEINT (DuckDB's SUM-over-BIGINT output) coerces to float64
and value-hashes differently from Spark's long even when the values
are identical (the r7 json_props red row).
"""

import importlib.util
import os
import sys
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conduino_spark import from_dataframe, run_pipe, sink_df  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "entry_r8", REPO / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# ---------------------------------------------------------------------------
# oracle typing: no driver-side HUGEINT coercion anywhere in the gate
# ---------------------------------------------------------------------------

def test_no_oracle_outputs_hugeint():
    """DESCRIBE every gate oracle in DuckDB: no output column may be
    HUGEINT/UHUGEINT — those coerce to float64 in the driver's
    Arrow/pandas fetch and hash-mismatch Spark's long ("99111.0" vs
    "99111") even when values are identical.  This is the static pin
    that would have caught the r7 json_props red row."""
    m = _load_entry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    offenders = []
    for name, sql in m.oracle_sql().items():
        for col, typ, *_ in con.execute("DESCRIBE " + sql).fetchall():
            if typ.upper().startswith(("HUGEINT", "UHUGEINT")):
                offenders.append((name, col, typ))
    assert offenders == [], (
        f"uncast SUM-over-BIGINT (wrap in CAST(... AS BIGINT)): "
        f"{offenders}")


def test_kind_audit_catches_json_props_class(spark):
    """The check_oracle kind audit flags an uncast SUM (long vs
    HUGEINT→float) and passes the cast convention."""
    sys.path.insert(0, str(REPO / "tools"))
    from check_oracle import duck_kind, kind_mismatches, spark_kind

    assert duck_kind("HUGEINT") == "f" and duck_kind("BIGINT") == "i"
    assert duck_kind("DECIMAL(38,0)") == "f" and duck_kind("VARCHAR") is None
    assert spark_kind("bigint") == "i" and spark_kind("double") == "f"

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM "
                "(VALUES (1::BIGINT), (2::BIGINT)) v(x)")
    sdf = spark.createDataFrame([(3,)], "s long")
    bad = kind_mismatches(con, sdf, "SELECT SUM(x) AS s FROM t")
    assert [c for c, *_ in bad] == ["s"]
    good = kind_mismatches(
        con, sdf, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t")
    assert good == []


# ---------------------------------------------------------------------------
# gemm NULL parity (r7 ADVICE): NULL bucket keys / NULL vectors are
# degenerate input; both kernels must agree (the exact equi-join never
# matches NULLs, so the pandas kernels must drop them too)
# ---------------------------------------------------------------------------

def _pairs_set(df):
    return {(r.id_a, r.id_b, r.cosine) for r in df.collect()}


def test_embedding_near_dup_gemm_null_parity(spark):
    from conduino_spark import embedding_near_dup_pairs
    rows = [
        (1, [1.0, 0.0], "a"), (2, [1.0, 0.001], "a"),   # near-dup pair
        (3, [0.0, 1.0], "a"),
        (4, [1.0, 0.0], None), (5, [1.0, 0.0], None),   # NULL bucket
        (6, None, "a"),                                  # NULL vector
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    exact = run_pipe(from_dataframe(df)
                     | embedding_near_dup_pairs(threshold=0.9)
                     | sink_df(), spark)
    gemm = run_pipe(from_dataframe(df)
                    | embedding_near_dup_pairs(threshold=0.9,
                                               kernel="gemm")
                    | sink_df(), spark)
    es, gs = _pairs_set(exact), _pairs_set(gemm)
    assert es == gs
    assert {(a, b) for a, b, _ in es} == {(1, 2)}  # NULLs never pair


def test_ann_join_gemm_null_parity(spark):
    from conduino_spark import ann_join
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0], "c0"), (11, [0.9, 0.1], "c0"),
         (12, [0.0, 1.0], "c1"), (13, None, "c0"),      # NULL vector
         (14, [1.0, 1.0], None)],                        # NULL cell
        "vec_id long, embedding array<double>, label string")
    queries = spark.createDataFrame(
        [(1, [1.0, 0.05]), (2, [0.1, 1.0]), (3, None)],  # NULL query
        "vec_id long, embedding array<double>")
    out = {}
    for kernel in ("exact", "gemm"):
        res = run_pipe(from_dataframe(queries)
                       | ann_join(corpus, k=2, nprobe=2, kernel=kernel)
                       | sink_df(), spark)
        out[kernel] = {(r.vec_id, r.neighbor_id, r.cosine, r.rank)
                       for r in res.collect()}
    assert out["exact"] == out["gemm"]
    ids = {q for q, *_ in out["exact"]}
    nbrs = {n for _, n, *_ in out["exact"]}
    assert 3 not in ids                      # NULL query dropped
    assert not {13, 14} & nbrs               # NULL corpus rows dropped

# ---------------------------------------------------------------------------
# countmin_assemble merges duplicate cells by summing (r7 ADVICE):
# unioned partial-sketch cell tables are the canonical CM merge
# ---------------------------------------------------------------------------

def test_countmin_assemble_sums_duplicate_cells(spark):
    from conduino_spark import countmin_assemble, countmin_build
    from conduino_spark.streaming import windowed_countmin_cells
    xs = ["a", "b", "a", "c", "b", "a"]
    rows = [(i, "2024-01-01 10:%02d:00" % (i % 60), x)
            for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i long, ts string, v string") \
        .select("i", F.col("ts").cast("timestamp").alias("ts"), "v")
    cells = windowed_countmin_cells("ts", "1 hour", "v",
                                    width=16, depth=2)(df)
    # two partial runs of the same window union to duplicate cells;
    # assemble must SUM them (was: DUPLICATED_MAP_KEY crash)
    asm = countmin_assemble(width=16, depth=2)(cells.union(cells)).first()
    built = countmin_build("v", width=16, depth=2)(
        df.union(df)).first()
    assert list(map(list, asm["cms"])) == list(map(list, built["cms"]))
    assert asm["n_total"] == built["n_total"] == 2 * len(xs)

# ---------------------------------------------------------------------------
# tunable MinHash banding (VERDICT r7 #3): tune_minhash_bands output is
# directly consumable by the signature/banding family, and a tuned
# config moves candidate recall the way the S-curve predicts
# ---------------------------------------------------------------------------

def _dup_corpus(spark):
    """Deterministic corpus with known near-dup pairs: 12 base docs,
    each followed by a one-word-perturbed copy (high Jaccard) and an
    unrelated doc (near-zero Jaccard)."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    rows, did = [], 0
    for i in range(12):
        base = " ".join(words[(i * 7 + j) % len(words)] for j in range(30))
        toks = base.split()
        toks[15] = f"changed{i}"
        rows += [(did, base), (did + 1, " ".join(toks)),
                 (did + 2, " ".join(f"uniq{i}w{j}" for j in range(30)))]
        did += 3
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tuned_banding_end_to_end(spark):
    from conduino_spark import (minhash_dedup, minhash_dedup_pairs,
                                minhash_eval, tune_minhash_bands)
    df = _dup_corpus(spark)

    # tuner output feeds straight into the family
    lo = tune_minhash_bands(0.3, n_perm=16)   # recall-ish: many bands
    hi = tune_minhash_bands(0.9, n_perm=16)   # precision-ish: few bands
    assert lo[0] > hi[0]                      # S-curve direction

    def run_eval(bands):
        p = (from_dataframe(df)
             | minhash_eval(0.5, n_perm=16, bands=bands) | sink_df())
        return run_pipe(p, spark).first()

    e_lo, e_hi = run_eval(lo[0]), run_eval(hi[0])
    # monotone law: more bands = a superset of candidates -> recall and
    # candidate count can only go up (prefix layouts nest per band? no —
    # but P(candidate) is monotone in bands at fixed n_perm // bands
    # rows; empirically the perturbed copies are caught)
    assert e_lo.n_candidates >= e_hi.n_candidates
    assert e_lo.recall >= e_hi.recall
    assert e_lo.n_true > 0                    # ground truth non-vacuous
    assert e_lo.recall >= 0.9                 # tuned-for-0.3 catches dups

    # end-to-end: tune -> dedup with the tuned config
    surv = run_pipe(from_dataframe(df)
                    | minhash_dedup(n_perm=16, bands=lo[0])
                    | sink_df(), spark)
    ids = {r.doc_id for r in surv.collect()}
    # every perturbed copy (id % 3 == 1) whose base was caught is gone;
    # with the recall-tuned config that's all of them
    assert not {i for i in ids if i % 3 == 1}
    # unrelated docs (id % 3 == 2) all survive
    assert {i for i in range(36) if i % 3 == 2} <= ids

    # default-config results are bit-stable: explicit defaults == bare
    base_pairs = run_pipe(from_dataframe(df)
                          | minhash_dedup_pairs() | sink_df(), spark)
    expl_pairs = run_pipe(from_dataframe(df)
                          | minhash_dedup_pairs(n_perm=16, bands=4)
                          | sink_df(), spark)
    key = lambda d: {(r.id_a, r.id_b) for r in d.collect()}  # noqa: E731
    assert key(base_pairs) == key(expl_pairs)


def test_banding_config_validation():
    from conduino_spark import minhash_dedup_pairs, minhash_signatures
    with pytest.raises(ValueError):
        minhash_dedup_pairs(bands=0)
    with pytest.raises(ValueError):
        minhash_dedup_pairs(n_perm=8, bands=9)
    with pytest.raises(ValueError):
        minhash_signatures(n_perm=1)

# ---------------------------------------------------------------------------
# composed web-ingestion pipeline (VERDICT r7 #5): the bench's
# end-to-end flagship replays the plain chain exactly — markup wrap is
# lossless under strip_html, so every downstream stage sees identical
# input
# ---------------------------------------------------------------------------

def test_web_ingest_pipeline_replays_plain_chain(spark):
    from conduino_spark import (chunk_text, corpus_filter, minhash_dedup,
                                pack_chunks, strip_html)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(150))
    # the bench entry's wrap (q_web_ingest_pipeline), on a subset the
    # suite can afford — identical markup, identical chain
    wrapped = docs.select(
        "doc_id",
        F.concat(F.lit("<html><script>a();\r\nb();</script><body><p>"),
                 F.coalesce(F.col("text"), F.lit("")),
                 F.lit("</p><!-- note\r\n --></body></html>"))
         .alias("text"))
    tail = (corpus_filter(keep_only=True) | minhash_dedup()
            | chunk_text(64, 16) | pack_chunks(512))
    got = {(r.doc_id, r.chunk_id, r.n_tokens, r.bin) for r in
           run_pipe(from_dataframe(wrapped) | strip_html() | tail
                    | sink_df(), spark).collect()}
    want = {(r.doc_id, r.chunk_id, r.n_tokens, r.bin) for r in
            run_pipe(from_dataframe(docs) | tail | sink_df(),
                     spark).collect()}
    assert got == want and len(got) > 0
