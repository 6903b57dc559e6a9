"""Round-6: regression tests for the r5 ADVICE findings, plus the
round's new operators."""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    bloom_build, bloom_contains, from_dataframe, mixture, read_table,
    run_pipe, sessionize, sink_df,
)


# --- ADVICE r5: bloom geometry carried with the sketch -----------------------
def test_bloom_probe_reads_carried_geometry(spark, sf_dir):
    """Probe with NO m_bits/k args: geometry comes from the sketch row
    itself, so a non-default build can never be probed with defaults."""
    ev = read_table(sf_dir, "events").df(spark)
    inserted = ev.where("user_id < 40").select("user_id").distinct()
    bloom = run_pipe(from_dataframe(inserted)
                     | bloom_build("user_id", m_bits=1 << 13, k=3)
                     | sink_df(), spark)
    assert {"bloom", "m_bits", "k"} <= set(bloom.columns)
    probe = spark.range(0, 500).select(F.col("id").alias("user_id"))
    got = run_pipe(from_dataframe(probe)
                   | bloom_contains(bloom, "user_id")  # no args: carried
                   | sink_df(), spark)
    res = {r.user_id: r.might_contain for r in got.collect()}
    ins = {r.user_id for r in inserted.collect()}
    assert all(res[u] for u in ins)  # no false negatives


def test_bloom_probe_mismatched_geometry_raises(spark, sf_dir):
    ev = read_table(sf_dir, "events").df(spark)
    inserted = ev.where("user_id < 40").select("user_id").distinct()
    bloom = run_pipe(from_dataframe(inserted)
                     | bloom_build("user_id", m_bits=1 << 13, k=3)
                     | sink_df(), spark)
    probe = spark.range(0, 10).select(F.col("id").alias("user_id"))
    with pytest.raises(ValueError, match="m_bits"):
        run_pipe(from_dataframe(probe)
                 | bloom_contains(bloom, "user_id", m_bits=1 << 20, k=3)
                 | sink_df(), spark)
    with pytest.raises(ValueError, match="k="):
        run_pipe(from_dataframe(probe)
                 | bloom_contains(bloom, "user_id", m_bits=1 << 13, k=5)
                 | sink_df(), spark)
    # legacy sketch (no geometry columns) requires explicit args
    legacy = bloom.select("bloom")
    with pytest.raises(ValueError, match="explicit"):
        run_pipe(from_dataframe(probe)
                 | bloom_contains(legacy, "user_id")
                 | sink_df(), spark)
    # ... and works when they are passed
    ok = run_pipe(from_dataframe(probe)
                  | bloom_contains(legacy, "user_id", m_bits=1 << 13, k=3)
                  | sink_df(), spark)
    assert ok.count() == 10


# --- ADVICE r5: stream_sessionize must not cast string keys ------------------
def test_stream_sessionize_string_keys(spark, sf_dir):
    """String keys used to be cast("long") -> NULL, collapsing every
    key into one session stream; now the key keeps its own type and
    the replay law holds for string-keyed streams too."""
    from conduino_spark.streaming import (
        file_stream_source, run_stream_to_memory, stage_events_dir,
        stream_sessionize)
    import duckdb
    import os
    import tempfile

    con = duckdb.connect()
    d = tempfile.mkdtemp(prefix="r6_strkey_")
    # re-key events by event_type (a string) and keep ts order
    con.execute(f"""
      COPY (SELECT event_id, ts, event_type, user_id, value, props
            FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id)
      TO '{os.path.join(d, "part0.parquet")}' (FORMAT PARQUET)""")
    src_dir = stage_events_dir(os.path.join(d, "part0.parquet"),
                               n_chunks=3)
    schema = ("event_id long, ts timestamp, event_type string, "
              "user_id long, value double, props string")
    out = run_stream_to_memory(
        file_stream_source(src_dir, schema)
        | stream_sessionize(1800.0, key_col="event_type"), spark)
    got = {r.event_id: (r.key, r.session_id) for r in out.collect()}
    assert out.schema["key"].dataType.simpleString() == "string"

    ev = read_table(sf_dir, "events").df(spark)
    batch = run_pipe(from_dataframe(ev)
                     | sessionize("ts", 1800.0, keys=("event_type",))
                     | sink_df(), spark)
    want = {r.event_id: (r.event_type, r.session_id)
            for r in batch.select("event_id", "event_type",
                                  "session_id").collect()}
    assert got == want


# --- ADVICE r5: mixture salt/name injectivity --------------------------------
def test_mixture_salt_name_injective(spark, sf_dir):
    """(salt='a', name='b') and (salt='', name='ab') used to hash with
    the identical effective salt 'ab|'; the delimited form keeps
    nominally independent configurations decorrelated."""
    docs = read_table(sf_dir, "documents").df(spark)
    m1 = mixture({"b": (docs, 0.5)}, salt="a")
    m2 = mixture({"ab": (docs, 0.5)}, salt="")
    ids1 = {r.doc_id for r in m1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in m2.select("doc_id").collect()}
    assert ids1 != ids2


# --- ADVICE r5: corpus_filter between-op validation --------------------------
def test_corpus_filter_scalar_between_raises_valueerror():
    from conduino_spark import corpus_filter

    with pytest.raises(ValueError, match="between needs"):
        corpus_filter(rules={"mean_word_len": ("between", 5.0)})


# --- COVERAGE.md must reference only live gate queries (r5 verdict #3) -------
def test_coverage_doc_names_resolve():
    """Every query name COVERAGE.md claims an oracle for must exist in
    queries() or bench_extras() — phantom (pre-merge historical) names
    made r5's coverage audit unmechanizable."""
    import importlib.util
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "entry", root / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    known = set(m.queries()) | set(m.bench_extras())
    txt = (root / "COVERAGE.md").read_text()
    claimed = set(re.findall(r"\b([a-z][a-z0-9_]{3,})\b(?= \(oracle)", txt))
    claimed.discard("query")  # column-header artifact of the regex
    missing = sorted(claimed - known)
    assert not missing, f"COVERAGE.md cites phantom gate queries: {missing}"


# --- r6 NEW: count-min sketch -------------------------------------------------
def test_countmin_cells_match_duckdb(spark, sf_dir):
    """The sparse (d, c, n) cell table the DuckDB oracle rebuilds
    equals the dense arrays' non-zero cells — bit-identical layout."""
    import duckdb
    from conduino_spark import countmin_build
    from conduino_spark.operators.sketches import countmin_build_sql

    ev = read_table(sf_dir, "events").df(spark)
    cms = run_pipe(from_dataframe(ev)
                   | countmin_build("event_type", width=64, depth=3)
                   | sink_df(), spark)
    row = cms.collect()[0]
    got = {(d, c): n for d, arr in enumerate(row.cms)
           for c, n in enumerate(arr) if n != 0}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    want = {(d, c): n for d, c, n in con.execute(
        countmin_build_sql("event_type", width=64, depth=3,
                           table="events")).fetchall()}
    assert got == want

    with pytest.raises(ValueError):
        countmin_build("event_type", width=0)
    with pytest.raises(ValueError):
        countmin_build("event_type", depth=0)


def test_countmin_never_underestimates(spark, sf_dir):
    from conduino_spark import countmin_build, countmin_estimate

    ev = read_table(sf_dir, "events").df(spark)
    cms = run_pipe(from_dataframe(ev)
                   | countmin_build("user_id", width=256, depth=4)
                   | sink_df(), spark)
    truth = ev.groupBy("user_id").count()
    est = run_pipe(from_dataframe(truth)
                   | countmin_estimate(cms, "user_id")
                   | sink_df(), spark)
    rows = est.collect()
    assert rows and all(r.est_count >= r["count"] for r in rows)
    # width 256 >> #users at sf0.001: most estimates exact
    exact = sum(1 for r in rows if r.est_count == r["count"])
    assert exact / len(rows) > 0.5

    # carried-geometry validation (same contract as bloom)
    probe = ev.select("user_id").limit(5)
    with pytest.raises(ValueError, match="width"):
        run_pipe(from_dataframe(probe)
                 | countmin_estimate(cms, "user_id", width=512, depth=4)
                 | sink_df(), spark)
    legacy = cms.select("cms")
    with pytest.raises(ValueError, match="explicit"):
        run_pipe(from_dataframe(probe)
                 | countmin_estimate(legacy, "user_id")
                 | sink_df(), spark)


# --- r6 NEW: bloom-prefiltered exact join -------------------------------------
@pytest.mark.parametrize("how", ["semi", "anti"])
def test_bloom_prefilter_join_equals_plain_join(spark, sf_dir, how):
    """The sketch accelerates, never changes, the result: equality with
    the plain semi/anti join is the no-false-negatives law in action."""
    from conduino_spark import bloom_prefilter_join

    ev = read_table(sf_dir, "events").df(spark)
    cust = read_table(sf_dir, "customer").df(spark) \
        .where("c_mktsegment = 'BUILDING'")
    st = bloom_prefilter_join(cust, "user_id", other_key="c_custkey",
                              how=how, m_bits=1 << 13, k=3)
    got = {r.event_id for r in st(ev).select("event_id").collect()}
    want = {r.event_id for r in
            ev.join(cust, ev.user_id == cust.c_custkey, how)
              .select("event_id").collect()}
    assert got == want

    with pytest.raises(ValueError):
        bloom_prefilter_join(cust, "user_id", how="left")


# --- r6 NEW: winsorize --------------------------------------------------------
def test_winsorize_matches_duckdb(spark, sf_dir):
    import duckdb
    from conduino_spark import winsorize
    from conduino_spark.operators.sketches import winsorize_sql

    ev = read_table(sf_dir, "events").df(spark)
    out = run_pipe(from_dataframe(ev)
                   | winsorize("value", lo=0.05, hi=0.95, bins=256,
                               keys=("event_type",), out="w")
                   | sink_df(), spark)
    got = {r.event_id: r.w for r in out.select("event_id", "w").collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    want = dict(con.execute(winsorize_sql(
        "value", lo=0.05, hi=0.95, bins=256, keys=("event_type",),
        out="w", table="events",
        select_cols="t.event_id")).fetchall())
    assert got == want  # bit-identical doubles

    with pytest.raises(ValueError):
        winsorize("value", lo=0.9, hi=0.1)


def test_winsorize_clamps_to_quantile_range(spark):
    from conduino_spark import winsorize

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)],
                               "id long, v double")
    out = run_pipe(from_dataframe(df)
                   | winsorize("v", lo=0.10, hi=0.90, bins=1000)
                   | sink_df(), spark)
    vs = [r.v for r in out.collect()]
    assert min(vs) >= 10.0 - 0.1 and max(vs) <= 90.0 + 0.1
    assert len(vs) == 100  # winsorize clips, never drops


# --- r6 NEW: normalize_text ---------------------------------------------------
def test_normalize_text_matches_duckdb(spark, sf_dir):
    import duckdb
    from conduino_spark import normalize_text
    from conduino_spark.operators.text import normalize_text_sql

    docs = read_table(sf_dir, "documents").df(spark)
    out = run_pipe(from_dataframe(docs)
                   | normalize_text(strip_punct=True)
                   | sink_df(), spark)
    got = {r.doc_id: r.normalized
           for r in out.select("doc_id", "normalized").collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = dict(con.execute(
        f"SELECT doc_id, {normalize_text_sql(strip_punct=True)} "
        f"FROM documents").fetchall())
    assert got == want


def test_normalize_text_canonicalizes_variants(spark):
    from conduino_spark import dedup_exact, normalize_text

    rows = [(1, "Hello  World"), (2, "hello world"),
            (3, "HELLO\tWORLD\n"), (4, "different text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    norm = run_pipe(from_dataframe(df) | normalize_text() | sink_df(),
                    spark)
    # all three variants collapse to one normalized form
    kept = run_pipe(
        from_dataframe(norm.select("doc_id",
                                   F.col("normalized").alias("text")))
        | dedup_exact() | sink_df(), spark)
    assert {r.doc_id for r in kept.collect()} == {1, 4}
    # NULL text normalizes to empty string, not NULL
    df2 = spark.createDataFrame([(1, None)], "doc_id long, text string")
    out = run_pipe(from_dataframe(df2) | normalize_text() | sink_df(),
                   spark)
    assert out.collect()[0].normalized == ""


# --- r6 NEW: weighted_sample --------------------------------------------------
def test_weighted_sample_deterministic_and_monotone(spark, sf_dir):
    import duckdb
    from conduino_spark import weighted_sample
    from conduino_spark.functions.hashing import h32_sql

    docs = read_table(sf_dir, "documents").df(spark)
    # weight rises with doc_id: p = (doc_id % 10) / 10
    w = (F.col("doc_id") % 10) / 10.0
    out = run_pipe(from_dataframe(docs)
                   | weighted_sample("doc_id", w, salt="s|")
                   | sink_df(), spark)
    got = {r.doc_id for r in out.select("doc_id").collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    h = h32_sql("concat('s|', CAST(doc_id AS VARCHAR))")
    want = {r[0] for r in con.execute(f"""
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL
          AND CAST({h} AS DOUBLE)
              < greatest(0.0, least(1.0, (doc_id % 10) / 10.0)) * 4294967296.0
        """).fetchall()}
    assert got == want
    # weight 0 keeps nothing, weight 1 keeps everything
    none = run_pipe(from_dataframe(docs)
                    | weighted_sample("doc_id", F.lit(0.0))
                    | sink_df(), spark)
    assert none.count() == 0
    all_ = run_pipe(from_dataframe(docs)
                    | weighted_sample("doc_id", F.lit(1.0))
                    | sink_df(), spark)
    assert all_.count() == docs.count()


# --- r6 NEW: deterministic_shuffle --------------------------------------------
def test_deterministic_shuffle_matches_duckdb(spark, sf_dir):
    """shuffle_pos is a dense 0-based permutation equal to the DuckDB
    rank under the same hash — reproducible training order across
    engines."""
    import duckdb
    from conduino_spark import deterministic_shuffle
    from conduino_spark.functions.hashing import h32_sql

    docs = read_table(sf_dir, "documents").df(spark)
    out = run_pipe(from_dataframe(docs)
                   | deterministic_shuffle("doc_id", salt="e1|")
                   | sink_df(), spark)
    got = {r.doc_id: r.shuffle_pos
           for r in out.select("doc_id", "shuffle_pos").collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    h = h32_sql("concat('e1|', CAST(doc_id AS VARCHAR))")
    want = dict(con.execute(f"""
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY {h},
                                  CAST(doc_id AS VARCHAR)) - 1 AS pos
        FROM documents WHERE doc_id IS NOT NULL""").fetchall())
    assert got == want
    assert sorted(got.values()) == list(range(len(got)))  # dense perm


def test_deterministic_shuffle_salt_gives_new_order(spark, sf_dir):
    from conduino_spark import deterministic_shuffle

    docs = read_table(sf_dir, "documents").df(spark)
    a = run_pipe(from_dataframe(docs)
                 | deterministic_shuffle("doc_id", salt="epoch0|")
                 | sink_df(), spark)
    b = run_pipe(from_dataframe(docs)
                 | deterministic_shuffle("doc_id", salt="epoch1|")
                 | sink_df(), spark)
    oa = {r.doc_id: r.shuffle_pos for r in a.collect()}
    ob = {r.doc_id: r.shuffle_pos for r in b.collect()}
    assert oa != ob                       # epochs reshuffle
    assert sorted(oa) == sorted(ob)       # same rows either way


# --- r6 NEW: unigram LM scoring -----------------------------------------------
def test_unigram_logprob_reference(spark):
    """Exact small-case reference: smoothed unigram logprob math."""
    import math
    from conduino_spark import unigram_logprob, unigram_vocab

    corpus = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat")],
        "doc_id long, text string")
    vocab = run_pipe(from_dataframe(corpus) | unigram_vocab()
                     | sink_df(), spark)
    # N=6, V=4 (the:2, sat:2, cat:1, dog:1); alpha=0.5 -> denom=8.5
    score = run_pipe(from_dataframe(
        spark.createDataFrame([(10, "the cat"), (11, "zebra")],
                              "doc_id long, text string"))
        | unigram_logprob(vocab) | sink_df(), spark)
    got = {r.doc_id: r.logprob_per_token for r in score.collect()}
    want10 = (math.log(2.5 / 8.5) + math.log(1.5 / 8.5)) / 2
    want11 = math.log(0.5 / 8.5)  # OOV
    assert abs(got[10] - want10) < 1e-9
    assert abs(got[11] - want11) < 1e-9
    assert got[11] < got[10]  # gibberish scores below fluent text

    with pytest.raises(ValueError):
        unigram_logprob(vocab, alpha=0.0)


def test_unigram_logprob_corpus_self_score(spark, sf_dir):
    """Self-scoring the corpus: every document with tokens gets a
    finite negative score; token-free documents get NULL."""
    from conduino_spark import unigram_logprob, unigram_vocab

    docs = read_table(sf_dir, "documents").df(spark)
    vocab = run_pipe(from_dataframe(docs) | unigram_vocab()
                     | sink_df(), spark)
    out = run_pipe(from_dataframe(docs) | unigram_logprob(vocab)
                   | sink_df(), spark)
    rows = out.select("doc_id", "logprob_per_token").collect()
    assert len(rows) == docs.count()
    scored = [r.logprob_per_token for r in rows
              if r.logprob_per_token is not None]
    assert scored and all(s < 0 for s in scored)


# --- r6 NEW: int8 embedding quantization --------------------------------------
def test_vec_quantize_int8_roundtrip_and_recall(spark, sf_dir):
    """Quantize→dequantize reconstruction error is bounded by scale/2
    per dim, and brute-force top-10 on dequantized vectors overlaps
    the exact top-10 heavily."""
    from conduino_spark import (knn_brute, vec_dequantize,
                                vec_quantize_int8)

    emb = read_table(sf_dir, "embeddings").df(spark)
    q = run_pipe(from_dataframe(emb) | vec_quantize_int8() | sink_df(),
                 spark)
    rows = q.select("embedding", "q_embedding", "q_scale").collect()
    for r in rows[:50]:
        assert all(-127 <= int(x) <= 127 for x in r.q_embedding)
        for x, qi in zip(r.embedding, r.q_embedding):
            assert abs(float(x) - int(qi) * r.q_scale) <= r.q_scale / 2 + 1e-9

    deq = run_pipe(
        from_dataframe(q.drop("embedding"))
        | vec_dequantize() | sink_df(), spark)
    qrow = emb.where(F.col("vec_id") == 3).first()
    qv = [float(x) for x in qrow["embedding"]]
    exact = {r.vec_id for r in
             run_pipe(from_dataframe(emb) | knn_brute(qv, k=10)
                      | sink_df(), spark).collect()}
    approx = {r.vec_id for r in
              run_pipe(from_dataframe(deq) | knn_brute(qv, k=10)
                       | sink_df(), spark).collect()}
    assert len(exact & approx) >= 8  # int8 recall@10


def test_vec_quantize_int8_per_dim_and_zero_vector(spark):
    from conduino_spark import vec_dequantize, vec_quantize_int8

    rows = [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]),
            (3, [10.0, 0.1, -0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = run_pipe(from_dataframe(df) | vec_quantize_int8(per_dim=True)
                 | sink_df(), spark)
    got = {r.vec_id: (list(r.q_embedding), list(r.q_scale))
           for r in q.collect()}
    # per-dim scales: max|x| per dim / 127 = (10/127, 2/127, 0.5/127)
    s = got[1][1]
    assert abs(s[0] - 10.0 / 127) < 1e-12
    assert abs(s[1] - 2.0 / 127) < 1e-12
    # zero vector quantizes to all-zero codes
    assert got[2][0] == [0, 0, 0]
    # dim with max component hits ±127 exactly
    assert got[3][0][0] == 127
    assert got[1][0][1] == -127

    deq = run_pipe(from_dataframe(q.drop("embedding"))
                   | vec_dequantize() | sink_df(), spark)
    back = {r.vec_id: list(r.embedding) for r in deq.collect()}
    for vid, (qs, scales) in got.items():
        orig = dict(rows)[vid]
        for o, b, sc in zip(orig, back[vid], scales):
            assert abs(o - b) <= sc / 2 + 1e-12


# --- r6 NEW: windowed quantile sketch (batch + streaming) ---------------------
def test_windowed_quantiles_batch_equals_binned(spark, sf_dir):
    """On batch input, windowed_quantiles == binned_quantiles(lo, hi)
    grouped by the same hour window — BIT-identical (same clamp, bins,
    edge arithmetic, cum-threshold pick)."""
    from conduino_spark import binned_quantiles
    from conduino_spark.streaming import windowed_quantiles

    qs = {"p50": 0.5, "p90": 0.9}
    ev = read_table(sf_dir, "events").df(spark)
    got = run_pipe(
        from_dataframe(ev)
        | windowed_quantiles("ts", "1 hour", "value", qs,
                             lo=0.0, hi=100.0, bins=64)
        | sink_df(), spark)
    g = {r.w_start: (r.p50, r.p90)
         for r in got.select("w_start", "p50", "p90").collect()}

    w = ev.withColumn("w_start", F.window("ts", "1 hour").start)
    want_df = run_pipe(
        from_dataframe(w)
        | binned_quantiles("value", qs, bins=64, keys=("w_start",),
                           lo=0.0, hi=100.0)
        | sink_df(), spark)
    want = {r.w_start: (r.p50, r.p90) for r in want_df.collect()}
    assert g == want  # bit-identical doubles

    with pytest.raises(ValueError):
        windowed_quantiles("ts", "1 hour", "value", lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        windowed_quantiles("ts", "1 hour", "value", {"p0": 0.0},
                           lo=0.0, hi=1.0)


def test_windowed_quantiles_stream_replay_equals_batch(spark, sf_dir):
    """Append-mode streaming replay (watermarked, sentinel-advanced)
    emits the same per-window quantiles as the batch run — the sketch
    really is streaming-hostable, as binned_quantiles' docstring
    claims."""
    from conduino_spark.streaming import (
        SENTINEL_TYPE, file_stream_source, run_stream_to_memory,
        stage_events_dir, windowed_quantiles)

    d = stage_events_dir(f"{sf_dir}/events.parquet", n_chunks=4,
                         sentinel_hours=4.0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    qs = {"p50": 0.5}
    st = windowed_quantiles("ts", "1 hour", "value", qs,
                            lo=0.0, hi=100.0, bins=64,
                            keys=("event_type",), watermark="2 hours")
    out = run_stream_to_memory(file_stream_source(d, schema) | st, spark)
    got = {(r.w_start, r.event_type): r.p50
           for r in out.where(F.col("event_type") != SENTINEL_TYPE)
                       .collect()}

    ev = read_table(sf_dir, "events").df(spark)
    batch = run_pipe(from_dataframe(ev) | st | sink_df(), spark)
    want = {(r.w_start, r.event_type): r.p50 for r in batch.collect()}
    assert got == want


# --- r6 NEW: product quantization ---------------------------------------------
def test_pq_roundtrip_deterministic_and_recall(spark, sf_dir):
    """PQ codebook is deterministic; every code is in range; ADC top-k
    overlaps the exact L2 top-k and finds the query itself first."""
    from conduino_spark import pq_encode, pq_search, pq_train

    emb = read_table(sf_dir, "embeddings").df(spark)
    # m=32 (2-dim subspaces) for the synthetic near-random embeddings:
    # PQ recall depends on subspace count, and random data is its worst
    # case — real text embeddings cluster and quantize far better
    book = pq_train(emb, m=32, k=16, iters=1)
    book2 = pq_train(emb, m=32, k=16, iters=1)
    assert book == book2  # deterministic training

    dim = len(emb.first()["embedding"])
    assert len(book) == 32 and len(book[0][0]) == dim // 32

    enc = run_pipe(from_dataframe(emb) | pq_encode(book) | sink_df(),
                   spark)
    codes = {r.vec_id: list(r.pq_codes) for r in enc.collect()}
    assert all(0 <= c < 16 for cs in codes.values() for c in cs)
    assert all(len(cs) == 32 for cs in codes.values())

    qrow = emb.where(F.col("vec_id") == 5).first()
    qv = [float(x) for x in qrow["embedding"]]
    got = run_pipe(from_dataframe(enc) | pq_search(book, qv, kk=10)
                   | sink_df(), spark)
    approx = [r.vec_id for r in got.collect()]

    v = F.col("embedding").cast("array<double>")
    qarr = F.array(*[F.lit(x) for x in qv])
    d2 = F.aggregate(F.zip_with(v, qarr, lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda s, x: s + x)
    exact = [r.vec_id for r in
             emb.select("vec_id", d2.alias("d"))
                .orderBy(F.asc("d"), F.col("vec_id")).limit(10).collect()]
    assert len(set(approx) & set(exact)) >= 4  # coarse-PQ recall@10
    assert approx[0] == 5  # the query's own row wins ADC

    with pytest.raises(ValueError):
        pq_train(emb, m=7, k=16)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        pq_search(book, qv[:-1], kk=5)


# --- r6 NEW: JSON props extraction --------------------------------------------
def test_json_props_matches_duckdb(spark, sf_dir):
    import importlib.util
    from pathlib import Path

    import duckdb

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "entry", root / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    got = {r.event_type: (r.sum_k, r.n_with_k)
           for r in m.queries()["json_props"](spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    want = {t: (s, n) for t, s, n in con.execute("""
        SELECT event_type,
               SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k,
               COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n
        FROM events GROUP BY event_type""").fetchall()}
    assert got == want


# --- r6 NEW: multimodal format sniffing (real, codec-free) --------------------
def test_sniff_format_magic_bytes(spark):
    from conduino_spark import sniff_format

    blobs = [
        (1, bytes.fromhex("89504e470d0a1a0a") + b"rest"),        # png
        (2, bytes.fromhex("ffd8ffe0") + b"jfif"),                # jpeg
        (3, b"GIF89a" + b"x" * 4),                               # gif
        (4, b"RIFF" + b"\x24\x08\x00\x00" + b"WAVEfmt "),        # wav
        (5, b"RIFF" + b"\x00\x00\x00\x00" + b"WEBPVP8 "),        # webp
        (6, b"%PDF-1.7 ..."),                                    # pdf
        (7, b"PK\x03\x04zipzip"),                                # zip
        (8, b"ID3\x04tagged mp3"),                               # mp3
        (9, b"fLaC\x00\x00\x00\x22"),                            # flac
        (10, b"plain text, no magic"),                           # unknown
        (11, None),                                              # NULL
        (12, b"\x89P"),                                          # truncated
    ]
    df = spark.createDataFrame(blobs, "id long, content binary")
    out = {r.id: r.format for r in sniff_format()(df).collect()}
    assert out == {1: "png", 2: "jpeg", 3: "gif", 4: "wav", 5: "webp",
                   6: "pdf", 7: "zip", 8: "mp3", 9: "flac",
                   10: "unknown", 11: "unknown", 12: "unknown"}


# --- r6 NEW: TPC-H Q14/Q19 (bench extras, local oracle) -----------------------
@pytest.mark.parametrize("qname,sql", [
    ("tpch_q14", """
        SELECT round(100.0 * (
            SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                 * 10000) AS BIGINT)) / 10000.0) / (
            SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) / 10000.0), 6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-03-01 00:00:00'"""),
    ("tpch_q19", """
        SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
               AS BIGINT)) / 10000.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)"""),
])
def test_tpch_extras_match_duckdb(spark, sf_dir, qname, sql):
    import importlib.util
    from pathlib import Path

    import duckdb

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "entry", root / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    got = m.bench_extras()[qname](spark, sf_dir).collect()
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    want = con.execute(sql).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


# --- r6 NEW: exact-substring duplication spans --------------------------------
def test_dup_span_stats_reference(spark):
    """Hand-built corpus against a pure-Python sliding-window
    reference: two docs share an exact 6-token run; a third is
    unrelated."""
    from conduino_spark import dup_span_stats

    shared = "alpha beta gamma delta epsilon zeta"
    texts = {1: f"one two {shared} three four",
             2: f"{shared} five six seven",
             3: "totally different words here entirely now"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    L = 4
    out = {r.doc_id: r for r in
           dup_span_stats(window_tokens=L, min_dup=2)(df).collect()}

    # pure-Python reference
    toks = {d: t.lower().split() for d, t in texts.items()}
    from collections import Counter
    wc = Counter()
    wins = {}
    for d, ts in toks.items():
        wins[d] = [" ".join(ts[i:i + L]) for i in range(len(ts) - L + 1)]
        wc.update(set())
        for w in wins[d]:
            wc[w] += 1
    for d, ts in toks.items():
        dpos = [i for i, w in enumerate(wins[d]) if wc[w] >= 2]
        r = out[d]
        assert r.n_windows == len(wins[d])
        assert r.n_dup_windows == len(dpos)
        # interval union + span count
        cov, spans, end = 0, 0, -10 ** 9
        for p in dpos:
            if p >= end:
                spans += 1
            cov += min(L, p + L - max(end, p))
            end = p + L
        assert r.n_dup_spans == spans
        assert abs(r.dup_token_frac - min(1.0, cov / len(ts))) < 1e-12
    assert out[3].n_dup_windows == 0 and out[3].dup_token_frac == 0.0
    assert out[1].n_dup_spans == 1 and out[2].n_dup_spans == 1
    # the shared 6-token run yields 3 duplicated windows of length 4
    assert out[1].n_dup_windows == 3

    with pytest.raises(ValueError):
        dup_span_stats(window_tokens=0)
    with pytest.raises(ValueError):
        dup_span_stats(min_dup=1)


def test_dup_span_stats_corpus_and_gate(spark, sf_dir):
    """On the real corpus: exact duplicate docs get dup_token_frac 1.0
    and can be gated through corpus_filter."""
    from conduino_spark import corpus_filter, dup_span_stats

    docs = read_table(sf_dir, "documents").df(spark).limit(100)
    # append a verbatim copy of doc 0 under a new id
    first = docs.where(F.col("doc_id") == 0) \
                .select(F.lit(99999).alias("doc_id"), "text")
    corpus = docs.select("doc_id", "text").unionByName(first)
    st = dup_span_stats(window_tokens=16)
    stats = st(corpus)
    r = {x.doc_id: x for x in stats.collect()}
    if r[0].n_windows > 0:  # doc 0 long enough to window
        assert r[0].dup_token_frac == 1.0
        assert r[99999].dup_token_frac == 1.0

    gated = corpus_filter(rules={"dup_token_frac": ("<=", 0.5)})(
        corpus.join(stats.select("doc_id", "dup_token_frac"), "doc_id"))
    flagged = {x.doc_id for x in gated.where(~F.col("keep")).collect()}
    assert {0, 99999} <= flagged


# --- r6 edge sweep: empty and singleton inputs --------------------------------
def test_round6_ops_on_empty_and_singleton(spark):
    from conduino_spark import (
        cdc_apply, countmin_build, countmin_estimate, deterministic_shuffle,
        normalize_text, triangle_count, vec_dequantize, vec_quantize_int8,
        weighted_sample, winsorize,
    )

    empty = spark.createDataFrame([], "k long, v double")
    one = spark.createDataFrame([(7, 3.0)], "k long, v double")

    # count-min over empty input: zero-filled sketch, probes estimate 0
    cms = run_pipe(from_dataframe(empty)
                   | countmin_build("k", width=8, depth=2)
                   | sink_df(), spark)
    row = cms.collect()[0]
    assert all(x == 0 for arr in row.cms for x in arr)
    est = run_pipe(from_dataframe(one) | countmin_estimate(cms, "k")
                   | sink_df(), spark)
    assert est.collect()[0].est_count == 0

    assert deterministic_shuffle("k")(empty).count() == 0
    assert deterministic_shuffle("k")(one).collect()[0].shuffle_pos == 0

    assert weighted_sample("k", F.col("v"))(empty).count() == 0

    # winsorize singleton: degenerate range clamps to the value itself
    w = winsorize("v", lo=0.1, hi=0.9, bins=8)
    assert w(empty).count() == 0
    assert w(one).collect()[0].v == 3.0

    assert triangle_count()(
        spark.createDataFrame([], "id_a long, id_b long")) \
        .collect()[0].triangles == 0

    ed = spark.createDataFrame([], "doc_id long, text string")
    assert normalize_text()(ed).count() == 0

    # quantize/dequantize singleton roundtrip
    ev = spark.createDataFrame([(1, [0.0, 0.0])],
                               "vec_id long, embedding array<double>")
    q = vec_quantize_int8()(ev)
    back = vec_dequantize()(q.drop("embedding")).collect()[0]
    assert list(back.embedding) == [0.0, 0.0]

    # cdc over empty snapshot = surviving changes only
    chg = spark.createDataFrame([(1, 1.0, "U", 10), (2, 2.0, "D", 11)],
                                "k long, v double, op string, ord long")
    snap = spark.createDataFrame([], "k long, v double")
    got = {(r.k, r.v) for r in cdc_apply(chg, ["k"], "ord")(snap).collect()}
    assert got == {(1, 1.0)}


# --- r6 NEW: triangle counting ------------------------------------------------
def test_triangle_count_matches_duckdb(spark, sf_dir):
    """Node-iterator triangle count vs a DuckDB oracle over the
    minhash near-dup graph (reusing the already-oracled band-pair
    edges), plus hand-checked small graphs."""
    import duckdb

    from conduino_spark import minhash_dedup_pairs, triangle_count

    # hand-checked: K4 has 4 triangles; adding an isolated edge adds 0
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 6),
             (2, 1)]  # duplicate reversed edge must not double-count
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = run_pipe(from_dataframe(df) | triangle_count() | sink_df(),
                   spark)
    assert got.collect()[0].triangles == 4

    pv = run_pipe(from_dataframe(df) | triangle_count(per_vertex=True)
                  | sink_df(), spark)
    per = {r.id: r.triangles for r in pv.collect()}
    assert per == {1: 3, 2: 3, 3: 3, 4: 3}  # K4: each vertex in 3

    # real graph: near-dup pairs of the documents table
    docs = read_table(sf_dir, "documents").df(spark)
    pairs = minhash_dedup_pairs()(docs)
    n = run_pipe(from_dataframe(pairs) | triangle_count() | sink_df(),
                 spark).collect()[0].triangles
    pd_edges = pairs.toPandas()
    con = duckdb.connect()
    con.register("edges", pd_edges)
    want = con.execute("""
      WITH canon AS (
        SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
        FROM edges WHERE id_a <> id_b)
      SELECT COUNT(*) FROM canon e1
      JOIN canon e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN canon e3 ON e3.a = e1.b AND e3.b = e2.b""").fetchone()[0]
    assert n == want


# --- r6 NEW: temperature sampling fractions -----------------------------------
def test_temperature_fractions_math_and_mixture(spark, sf_dir):
    from conduino_spark import mixture, temperature_fractions

    counts = {"web": 1000, "code": 100, "books": 10}
    # alpha=1: proportional -> every fraction equal (default budget
    # saturates the largest feasible draw: all 1.0)
    fr1 = temperature_fractions(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in fr1.values())
    # alpha=0: uniform target -> budget bound by the SMALLEST source
    fr0 = temperature_fractions(counts, 0.0)
    assert abs(fr0["books"] - 1.0) < 1e-12
    assert abs(fr0["code"] - 0.1) < 1e-12
    assert abs(fr0["web"] - 0.01) < 1e-12
    # explicit budget: expected draw sizes hit B*q_i
    fr = temperature_fractions(counts, 0.5, budget=300)
    q = {k: (n ** 0.5) for k, n in counts.items()}
    tot = sum(q.values())
    for k in counts:
        want = min(1.0, 300 * (q[k] / tot) / counts[k])
        assert abs(fr[k] - want) < 1e-12

    # feeds mixture directly
    docs = read_table(sf_dir, "documents").df(spark)
    halves = {"even": docs.where(F.col("doc_id") % 2 == 0),
              "odd": docs.where(F.col("doc_id") % 2 == 1)}
    sizes = {k: v.count() for k, v in halves.items()}
    fr = temperature_fractions(sizes, 0.5, budget=sum(sizes.values()) // 4)
    mix = mixture({k: (halves[k], fr[k]) for k in halves})
    assert 0 < mix.count() < sum(sizes.values())

    with pytest.raises(ValueError):
        temperature_fractions({}, 1.0)
    with pytest.raises(ValueError):
        temperature_fractions(counts, -0.1)
    with pytest.raises(ValueError):
        temperature_fractions({"a": 0}, 1.0)


# --- r6 NEW: distributed BPE training -----------------------------------------
def _bpe_reference(word_counts, n_merges, min_count=2):
    """Pure-Python reference BPE (Sennrich-style greedy) with the same
    (count desc, pair lexicographic) tie-break."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, cnt in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + cnt
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    from collections import Counter

    from conduino_spark import bpe_train
    from conduino_spark.operators.text import tokens_col  # noqa: F401

    texts = ["the cat sat on the mat", "the catalog of cats",
             "low lower lowest", "newer newest new",
             "the the the thee"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = bpe_train(df, n_merges=12, min_count=2)

    wc = Counter(w for t in texts for w in t.lower().split())
    want = _bpe_reference(wc, 12, min_count=2)
    assert got == want
    assert len(got) > 0

    with pytest.raises(ValueError):
        bpe_train(df, n_merges=-1)
    with pytest.raises(ValueError):
        bpe_train(df, min_count=0)


def test_bpe_encode_reconstructs_and_scales_by_vocab(spark, sf_dir):
    """Pieces concatenate back to the original tokens, in order."""
    from conduino_spark import bpe_encode, bpe_train
    from conduino_spark.operators.text import tokens_col

    docs = read_table(sf_dir, "documents").df(spark).limit(50)
    merges = bpe_train(docs, n_merges=20)
    enc = run_pipe(from_dataframe(docs) | bpe_encode(merges)
                   | sink_df(), spark)
    back = enc.select(
        "doc_id",
        F.concat_ws("", F.col("pieces")).alias("joined"),
        F.concat_ws("", tokens_col(F.col("text"))).alias("orig"))
    for r in back.collect():
        assert r.joined == r.orig
    # multi-char pieces actually formed
    any_merged = enc.where(
        F.exists("pieces", lambda p: F.length(p) > 1)).count()
    assert any_merged > 0


# --- r6 NEW: CDC apply (MERGE as one aggregate) -------------------------------
def test_cdc_apply_matches_duckdb(spark):
    """Upsert/delete batch over a snapshot: change outranks snapshot,
    latest order wins within the batch, deletes drop the key — replayed
    by a DuckDB arg_max oracle."""
    import duckdb

    from conduino_spark import cdc_apply

    snap_rows = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
                 (4, "d", 40.0)]
    chg_rows = [
        (2, "b2", 21.0, "U", 100),   # update key 2
        (2, "b3", 22.0, "U", 200),   # later update wins
        (3, None, 0.0, "D", 150),    # delete key 3
        (5, "e", 50.0, "I", 120),    # insert new key 5
        (4, "dx", 41.0, "U", 90),    # update then...
        (4, None, 0.0, "D", 95),     # ...delete key 4
    ]
    snap = spark.createDataFrame(snap_rows, "k long, s string, v double")
    chg = spark.createDataFrame(
        chg_rows, "k long, s string, v double, op string, ord long")
    out = cdc_apply(chg, ["k"], "ord")(snap)
    got = {(r.k, r.s, r.v) for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE snap(k BIGINT, s VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO snap VALUES (?, ?, ?)", snap_rows)
    con.execute("CREATE TABLE chg(k BIGINT, s VARCHAR, v DOUBLE, "
                "op VARCHAR, ord BIGINT)")
    con.executemany("INSERT INTO chg VALUES (?, ?, ?, ?, ?)", chg_rows)
    want = {tuple(r) for r in con.execute("""
        WITH u AS (
          SELECT k, s, v, NULL AS op, 0 AS is_chg, 0 AS ord FROM snap
          UNION ALL
          SELECT k, s, v, op, 1, ord FROM chg),
        w AS (SELECT k,
                     arg_max(s, is_chg * 1000000 + ord) AS s,
                     arg_max(v, is_chg * 1000000 + ord) AS v,
                     arg_max(coalesce(op, ''), is_chg * 1000000 + ord) AS op
              FROM u GROUP BY k)
        SELECT k, s, v FROM w WHERE op <> 'D'""").fetchall()}
    assert got == want
    assert got == {(1, "a", 10.0), (2, "b3", 22.0), (5, "e", 50.0)}


# --- r6 composition: LM score feeding the quality gate ------------------------
def test_unigram_logprob_feeds_corpus_filter_rule(spark, sf_dir):
    """corpus_filter rules can reference ANY column already on the
    frame — here the LM score gates documents alongside the built-in
    Gopher rules, the composed filter a real pipeline runs."""
    from conduino_spark import (corpus_filter, unigram_logprob,
                                unigram_vocab)
    from conduino_spark.operators.text import CORPUS_FILTER_DEFAULT

    docs = read_table(sf_dir, "documents").df(spark)
    vocab = run_pipe(from_dataframe(docs) | unigram_vocab()
                     | sink_df(), spark)
    scored = unigram_logprob(vocab)(docs)
    rules = dict(CORPUS_FILTER_DEFAULT)
    rules["logprob_per_token"] = (">=", -12.0)
    out = run_pipe(from_dataframe(scored) | corpus_filter(rules=rules)
                   | sink_df(), spark)
    rows = out.select("doc_id", "keep", "drop_reasons",
                      "logprob_per_token").collect()
    assert len(rows) == docs.count()
    for r in rows:
        lm_fail = (r.logprob_per_token is None
                   or r.logprob_per_token < -12.0)
        assert (("logprob_per_token" in list(r.drop_reasons)) == lm_fail)


# --- r6 Hypothesis laws -------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

LAW_SETTINGS = dict(max_examples=6, deadline=None,
                    suppress_health_check=[
                        HealthCheck.function_scoped_fixture])


@settings(**LAW_SETTINGS)
@given(xs=st.lists(st.integers(min_value=0, max_value=30),
                   min_size=1, max_size=40),
       width=st.sampled_from([8, 64]))
def test_countmin_overestimate_law(spark, xs, width):
    """For ANY multiset and ANY geometry: estimate(v) >= true count(v);
    with a roomy width, estimates are exact."""
    from collections import Counter

    from conduino_spark import countmin_build, countmin_estimate

    df = spark.createDataFrame([(x,) for x in xs], "v long")
    cms = run_pipe(from_dataframe(df)
                   | countmin_build("v", width=width, depth=3)
                   | sink_df(), spark)
    probe = spark.createDataFrame([(x,) for x in set(xs)], "v long")
    est = run_pipe(from_dataframe(probe)
                   | countmin_estimate(cms, "v")
                   | sink_df(), spark)
    truth = Counter(xs)
    for r in est.collect():
        assert r.est_count >= truth[r.v]


@settings(**LAW_SETTINGS)
@given(keys=st.lists(st.integers(min_value=0, max_value=1000),
                     min_size=1, max_size=40, unique=True),
       w1=st.floats(min_value=0.0, max_value=1.0),
       w2=st.floats(min_value=0.0, max_value=1.0))
def test_weighted_sample_monotone_law(spark, keys, w1, w2):
    """Raising every row's weight can only ADD rows (hash membership is
    monotone in the cut) — the property that makes weight sweeps
    predictable."""
    from conduino_spark import weighted_sample

    lo, hi = sorted([w1, w2])
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    a = {r.k for r in run_pipe(
        from_dataframe(df) | weighted_sample("k", F.lit(lo))
        | sink_df(), spark).collect()}
    b = {r.k for r in run_pipe(
        from_dataframe(df) | weighted_sample("k", F.lit(hi))
        | sink_df(), spark).collect()}
    assert a <= b


@settings(**LAW_SETTINGS)
@given(keys=st.lists(st.integers(min_value=0, max_value=10_000),
                     min_size=1, max_size=30, unique=True),
       npart=st.integers(min_value=1, max_value=5))
def test_deterministic_shuffle_partition_independence_law(spark, keys,
                                                          npart):
    """The assigned order is a dense permutation and does not depend on
    the physical partitioning of the input."""
    from conduino_spark import deterministic_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    base = {r.k: r.shuffle_pos for r in run_pipe(
        from_dataframe(df) | deterministic_shuffle("k")
        | sink_df(), spark).collect()}
    re = {r.k: r.shuffle_pos for r in run_pipe(
        from_dataframe(df.repartition(npart))
        | deterministic_shuffle("k") | sink_df(), spark).collect()}
    assert base == re
    assert sorted(base.values()) == list(range(len(keys)))


# --- r6 NEW: IVF-PQ composition -----------------------------------------------
def test_ivfpq_search_prunes_and_matches_pq_within_cells(spark, sf_dir):
    """ivfpq == pq_search restricted to the nprobe closest cells; the
    query's own row (in a probed cell by construction) wins ADC."""
    from conduino_spark import (cell_centroids, ivf_build, ivfpq_search,
                                pq_encode, pq_search, pq_train)

    emb = read_table(sf_dir, "embeddings").df(spark)
    cells = ivf_build(k=4, iters=1)(emb)
    joined = emb.join(cells, "vec_id")
    cents = cell_centroids(joined)
    assert set(cents) <= set(range(4))

    book = pq_train(emb, m=32, k=16, iters=1)
    enc = run_pipe(from_dataframe(joined) | pq_encode(book) | sink_df(),
                   spark)

    qrow = joined.where(F.col("vec_id") == 5).first()
    qv = [float(x) for x in qrow["embedding"]]
    got = run_pipe(from_dataframe(enc)
                   | ivfpq_search(book, cents, qv, kk=10, nprobe=2)
                   | sink_df(), spark)
    approx = [(r.vec_id, r.approx_dist) for r in got.collect()]

    # reference: rank cells the same way, restrict, plain pq_search
    ranked = sorted(
        (round(sum((q - c) * (q - c) for q, c in zip(qv, cv)), 6), cid)
        for cid, cv in cents.items())
    probe = [cid for _, cid in ranked[:2]]
    ref = run_pipe(from_dataframe(enc.where(F.col("cell").isin(probe)))
                   | pq_search(book, qv, kk=10) | sink_df(), spark)
    want = [(r.vec_id, r.approx_dist) for r in ref.collect()]
    assert approx == want
    assert qrow["cell"] in probe      # own cell is the closest cell
    assert approx[0][0] == 5          # own row wins ADC

    with pytest.raises(ValueError):
        ivfpq_search(book, cents, qv, nprobe=0)


# --- r6 NEW: compaction sink --------------------------------------------------
def test_sink_parquet_compacted_file_count(spark, sf_dir, tmp_path):
    import glob

    from conduino_spark import read_table, run_pipe, sink_parquet_compacted

    src = read_table(sf_dir, "events")
    d = str(tmp_path / "compacted")
    run_pipe(src | sink_parquet_compacted(d, target_rows_per_file=3000),
             spark)
    files = glob.glob(f"{d}/*.parquet")
    n_rows = spark.read.parquet(d).count()
    assert n_rows == src.df(spark).count()
    assert len(files) == -(-n_rows // 3000)  # ceil

    # partitioned: files bounded per hive partition, rows preserved
    d2 = str(tmp_path / "compacted_part")
    run_pipe(src | sink_parquet_compacted(
        d2, target_rows_per_file=5000, partition_by=["event_type"]), spark)
    back = spark.read.parquet(d2)
    assert back.count() == n_rows
    n_files_total = -(-n_rows // 5000)
    for pdir in glob.glob(f"{d2}/event_type=*"):
        assert len(glob.glob(f"{pdir}/*.parquet")) <= n_files_total

    with pytest.raises(ValueError):
        sink_parquet_compacted(d, target_rows_per_file=0)


# --- r6 plan-shape asserts ----------------------------------------------------
def _plan_of(df, mode="formatted") -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_weighted_sample_is_pure_projection(spark, sf_dir):
    """No exchange anywhere: the sampler must stay a scan-side filter."""
    from conduino_spark import weighted_sample

    docs = read_table(sf_dir, "documents").df(spark)
    out = weighted_sample("doc_id", (F.col("doc_id") % 10) / 10.0)(docs)
    plan = _plan_of(out)
    assert "Exchange" not in plan, "weighted_sample must not shuffle"


def test_normalize_text_is_pure_projection(spark, sf_dir):
    from conduino_spark import normalize_text

    docs = read_table(sf_dir, "documents").df(spark)
    out = normalize_text()(docs)
    plan = _plan_of(out)
    assert "Exchange" not in plan, "normalize_text must not shuffle"


def test_bloom_prefilter_join_probe_side_broadcasts(spark, sf_dir):
    """The probe side must see the sketch as a broadcast (the single
    bloom row + the distinct key set), never a sort-merge join of the
    big side."""
    from conduino_spark import bloom_prefilter_join

    ev = read_table(sf_dir, "events").df(spark)
    cust = read_table(sf_dir, "customer").df(spark)
    out = bloom_prefilter_join(cust, "user_id", other_key="c_custkey",
                               how="semi", m_bits=1 << 13, k=3)(ev)
    plan = _plan_of(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_countmin_probe_no_shuffle_of_probed_data(spark, sf_dir):
    """The estimate is the broadcast single sketch row + a pure
    expression: the probed side must not exchange."""
    from conduino_spark import countmin_build, countmin_estimate

    ev = read_table(sf_dir, "events").df(spark)
    cms = run_pipe(from_dataframe(ev)
                   | countmin_build("user_id", width=64, depth=2)
                   | sink_df(), spark)
    probe = read_table(sf_dir, "events").df(spark)
    out = countmin_estimate(cms, "user_id")(probe)
    plan = _plan_of(out)
    # the ONLY exchanges allowed belong to the (cached-side) sketch
    # subtree feeding the broadcast — the probe scan itself must flow
    # into the join without an exchange.  Assert by join strategy:
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# --- ADVICE r5: lsh_index_write must not call df.rdd -------------------------
def test_lsh_index_write_no_rdd_guard(spark, sf_dir, tmp_path):
    """The spread guard is plan-only now (inputFiles metadata); the
    index it writes still probes correctly for a non-scan input (a
    transformed plan, where inputFiles() is empty)."""
    from conduino_spark import knn_lsh, lsh_index_write

    emb = read_table(sf_dir, "embeddings").df(spark)
    derived = emb.where(F.col("vec_id") >= 0).select("vec_id", "embedding")
    row = emb.where(F.col("vec_id") == 7).first()
    qv = [float(x) for x in row["embedding"]]
    d = str(tmp_path / "idx")
    lsh_index_write(derived, d, dim=len(qv))
    idx = spark.read.parquet(d)
    got = run_pipe(from_dataframe(idx)
                   | knn_lsh(qv, k=5, bucket_col="bucket")
                   | sink_df(), spark)
    assert got.count() == 5
