"""Round-6 third batch: HyperLogLog distinct sketch, count-min-backed
exact heavy hitters, ORC connector.

Oracles: DuckDB register-table replay for hll_build (bit-identical —
the sketch IS the contract), DuckDB formula replay for hll_estimate
(1e-9 relative: the linear-counting branch rides libm ln, the
BM25/unigram tolerance contract), plain exact GROUP BY/HAVING for
heavy_hitters (the sketch is an accelerator, results are exact).
"""
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    heavy_hitters, hll_build, hll_estimate, hll_merge, read_orc,
    release_caches, run_pipe, sink_df, sink_orc,
)
from conduino_spark.operators.sketches import (
    heavy_hitters_sql, hll_build_sql, hll_estimate_sql,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
EVENTS = "/root/testdata/sf0.001/events.parquet"


def _con(view, path):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {view} AS SELECT * FROM '{path}'")
    return con


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_registers_bit_identical_to_duckdb(spark):
    df = spark.read.parquet(DOCS)
    row = hll_build("text", p=10)(df).first()
    assert row["p"] == 10
    got = {e["b"]: e["rho"] for e in row["hll"]}
    con = _con("documents", DOCS)
    sparse = dict(con.sql(hll_build_sql("text", p=10,
                                        table="documents")).fetchall())
    assert got == sparse


def test_hll_estimate_matches_sql_and_error_bound(spark):
    df = spark.read.parquet(DOCS)
    for p in (8, 12):
        sk = hll_build("text", p=p)(df)
        est = hll_estimate()(sk).first()[0]
        con = _con("documents", DOCS)
        want = con.sql(hll_estimate_sql("text", p=p,
                                        table="documents")).fetchone()[0]
        assert est == pytest.approx(want, rel=1e-9)
        exact = df.select(F.countDistinct("text")).first()[0]
        # 5 sigma of the standard 1.04/sqrt(m) relative error
        assert abs(est - exact) <= 5 * 1.04 / math.sqrt(1 << p) * exact


def test_hll_merge_of_shards_equals_whole(spark):
    df = spark.read.parquet(DOCS)
    whole = hll_build("text", p=9)(df).first()["hll"]
    parts = [hll_build("text", p=9)(df.where(f"doc_id % 3 = {i}"))
             for i in range(3)]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = hll_merge()(u).first()
    assert list(merged["hll"]) == list(whole)
    assert merged["p"] == 9


def test_hll_merge_mixed_p_raises(spark):
    df = spark.read.parquet(DOCS)
    u = hll_build("text", p=8)(df).unionByName(hll_build("text", p=9)(df))
    with pytest.raises(Exception, match="different p"):
        hll_merge()(u).first()


def test_hll_small_range_linear_counting(spark):
    # 50 distinct into 2^10 buckets: deep linear-counting territory,
    # where the estimate should be near-exact
    df = spark.range(50).selectExpr("cast(id as string) AS v")
    est = hll_estimate()(hll_build("v", p=10)(df)).first()[0]
    assert abs(est - 50) <= 3


def test_hll_nulls_skipped_and_empty_input(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "v string")
    row = hll_build("v", p=6)(df).first()
    assert len(row["hll"]) <= 2  # only a & b hashed
    empty = hll_build("v", p=6)(df.where("v IS NULL AND v IS NOT NULL"))
    erow = empty.first()
    assert list(erow["hll"]) == []
    assert hll_estimate()(empty).first()[0] == 0.0


def test_hll_p_validation():
    with pytest.raises(ValueError, match=r"p must be in"):
        hll_build("v", p=3)
    with pytest.raises(ValueError, match=r"p must be in"):
        hll_build("v", p=19)


# ---------------------------------------------------------------------------
# heavy hitters
# ---------------------------------------------------------------------------

def test_heavy_hitters_exact_vs_duckdb(spark):
    df = spark.read.parquet(EVENTS)
    got = sorted(tuple(r) for r in
                 heavy_hitters("event_type", min_frac=0.05)(df).collect())
    release_caches()
    con = _con("events", EVENTS)
    want = sorted(con.sql(heavy_hitters_sql(
        "event_type", min_frac=0.05, table="events")).fetchall())
    assert got == want and len(got) > 0


def test_heavy_hitters_tokens_tight_width(spark):
    # width=64 forces heavy collision traffic; results must STILL be
    # exact (collisions only admit extra candidates, never drop one)
    docs = spark.read.parquet(DOCS)
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    got = sorted(tuple(r) for r in
                 heavy_hitters("tok", min_frac=0.01, width=64, depth=2)(
                     toks).collect())
    release_caches()
    con = _con("documents", DOCS)
    want = sorted(con.sql("""
        WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
                   FROM documents),
        n AS (SELECT count(*) AS total FROM t WHERE tok IS NOT NULL)
        SELECT tok, count(*) AS c FROM t, n WHERE tok IS NOT NULL
        GROUP BY tok, total
        HAVING count(*) >= greatest(CAST(ceil(0.01 * total) AS BIGINT), 1)
        """).fetchall())
    assert got == want and len(got) > 0


def test_heavy_hitters_min_frac_one(spark):
    uni = spark.createDataFrame([("x",)] * 5 + [("y",)], "v string")
    got = heavy_hitters("v", min_frac=1.0)(uni).collect()
    release_caches()
    assert got == []  # no value occupies every row
    only = spark.createDataFrame([("x",)] * 4, "v string")
    got2 = [tuple(r) for r in
            heavy_hitters("v", min_frac=1.0)(only).collect()]
    release_caches()
    assert got2 == [("x", 4)]


def test_heavy_hitters_validation():
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters("v", min_frac=0.0)
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters("v", min_frac=1.5)


# ---------------------------------------------------------------------------
# ORC connector
# ---------------------------------------------------------------------------

def test_orc_round_trip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "docs_orc")
    df = spark.read.parquet(DOCS)
    run_pipe(_wrap(df) | sink_orc(path), spark)
    back = run_pipe(read_orc(path) | sink_df(), spark)
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in df.select("doc_id").collect())
    # predicate pushdown reaches the ORC scan
    plan = (read_orc(path).df(spark).where("n_chars > 100")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "n_chars" in plan


def test_orc_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "docs_orc_part")
    df = spark.read.parquet(DOCS)
    run_pipe(_wrap(df) | sink_orc(path, partition_by=["lang"]), spark)
    scan = spark.read.orc(path).where("lang = 'en'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    want = df.where("lang = 'en'").count()
    assert scan.count() == want


def _wrap(df):
    """Adapt a DataFrame to a Source for pipe composition."""
    from conduino_spark.sources import from_dataframe
    return from_dataframe(df)


# ---------------------------------------------------------------------------
# streaming corpus ingestion (foreachBatch integration)
# ---------------------------------------------------------------------------

def test_ingest_corpus_stream_replay_equals_batch_loop(spark, tmp_path):
    """Replay law for the ingestion loop: a drained availableNow run of
    ingest_corpus_stream equals the same per-batch pipeline run as
    plain batch jobs in the same batch order — quality gate, within-
    batch dedup, and dedup-against-kept-corpus all included."""
    import os as _os
    import time as _time

    from conduino_spark.operators.dedup import minhash_dedup, \
        minhash_dedup_against
    from conduino_spark.operators.text import corpus_filter
    from conduino_spark.streaming import file_stream_source, \
        ingest_corpus_stream

    base = [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(DOCS).orderBy("doc_id").limit(50).collect()]
    junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    batches = [
        # batch 0: 20 fresh docs + one junk (fails the quality rule)
        base[:20] + [(900, junk)],
        # batch 1: 10 fresh + 5 exact copies of batch-0 texts under new
        # ids (must be dropped by dedup-against) + an internal dup pair
        base[20:30] + [(1000 + i, base[i][1]) for i in range(5)]
        + [(1100, base[30][1]), (1101, base[30][1])],
        # batch 2: 10 fresh + copies of batch-1 texts (cross-batch)
        base[31:41] + [(2000 + i, base[20 + i][1]) for i in range(3)],
    ]

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    t0 = _time.time()
    for i, rows in enumerate(batches):
        p = str(src_dir / f"b{i:02d}.parquet")
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(p)
        # file source orders pending files by modification time
        for f in _os.listdir(p):
            _os.utime(_os.path.join(p, f), (t0 + i, t0 + i))
        _os.utime(p, (t0 + i, t0 + i))

    rules = {"quality": (">=", 0.3)}
    stream = file_stream_source(
        str(src_dir) + "/*", "doc_id long, text string").df(spark)
    got = ingest_corpus_stream(
        stream, spark, out_dir=str(tmp_path / "kept"),
        sig_dir=str(tmp_path / "sigs"),
        checkpoint_dir=str(tmp_path / "ckpt"), rules=rules)
    got_ids = sorted(r["doc_id"] for r in got.collect())

    # batch-loop reference: same steps, plain batch jobs, raw-doc
    # reference side (test_round5 pins sig-table path equivalence)
    kept_all = None
    for rows in batches:
        b = spark.createDataFrame(rows, "doc_id long, text string")
        kept = corpus_filter(rules=rules, keep_only=True)(b) \
            .select("doc_id", "text")
        kept = minhash_dedup()(kept)
        if kept_all is not None:
            kept = minhash_dedup_against(kept_all)(kept)
        kept_all = kept if kept_all is None else kept_all.unionByName(kept)
        kept_all = kept_all.localCheckpoint()
    want_ids = sorted(r["doc_id"] for r in kept_all.collect())

    assert got_ids == want_ids
    assert 900 not in got_ids                      # quality gate fired
    assert not any(1000 <= i < 1005 for i in got_ids)  # cross-batch dedup
    assert 1101 not in got_ids                     # within-batch dedup
    assert 1100 in got_ids                         # lower id survived
    assert len(got_ids) >= 40                      # fresh docs kept


# ---------------------------------------------------------------------------
# source_overlap (cross-source contamination matrix)
# ---------------------------------------------------------------------------

def test_source_overlap_matches_duckdb(spark):
    from conduino_spark import source_overlap
    df = spark.read.parquet(DOCS)
    got = sorted(tuple(r) for r in source_overlap()(df).collect())

    con = _con("documents", DOCS)
    # same shingle definition as the engine (_sql_shingles contract)
    want = sorted(tuple(r) for r in con.sql("""
        WITH toks AS (
          SELECT source,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t != '') AS t
          FROM documents),
        sh AS (
          SELECT DISTINCT source,
                 unnest([('0x' || substr(md5(s), 1, 8))::BIGINT
                         for s in list_distinct(
                           [array_to_string(t[i:i+2], ' ')
                            for i in range(1, len(t) - 1)])]) AS h
          FROM toks),
        sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        common AS (
          SELECT a.source AS ga, b.source AS gb, count(*) AS c
          FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
          GROUP BY ga, gb)
        SELECT ga, gb, sa.n, sb.n, c,
               CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS j
        FROM common
        JOIN sizes sa ON sa.source = ga
        JOIN sizes sb ON sb.source = gb
        """).fetchall())
    assert got == want and len(got) > 0


def test_source_overlap_identical_and_disjoint_groups(spark):
    from conduino_spark import source_overlap
    df = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon"),
         ("b", "alpha beta gamma delta epsilon"),      # == a
         ("c", "zeta eta theta iota kappa lambda")],   # disjoint
        "source string, text string")
    rows = {(r["group_a"], r["group_b"]): r
            for r in source_overlap()(df).collect()}
    assert rows[("a", "b")]["jaccard"] == 1.0
    assert ("a", "c") not in rows  # zero common shingles -> no row
    assert source_overlap(min_jaccard=0.5)(df).count() == 1


def test_hll_grouped_build_equals_per_group_and_merges_to_whole(spark):
    """keys= law: a grouped build row equals the filtered ungrouped
    build for that group, and merging the grouped rows equals the
    whole-corpus build (mergeability)."""
    df = spark.read.parquet(DOCS).withColumn(
        "shard", (F.col("doc_id") % 3).cast("long"))
    grouped = {r["shard"]: list(r["hll"])
               for r in hll_build("text", p=8, keys=("shard",))(
                   df).collect()}
    assert len(grouped) == 3
    for s in range(3):
        solo = hll_build("text", p=8)(df.where(f"shard = {s}")).first()
        assert grouped[s] == list(solo["hll"])
    merged = hll_merge()(
        hll_build("text", p=8, keys=("shard",))(df)).first()
    whole = hll_build("text", p=8)(df).first()
    assert list(merged["hll"]) == list(whole["hll"])


def test_hll_estimate_keeps_group_keys(spark):
    df = spark.read.parquet(DOCS).withColumn(
        "shard", (F.col("doc_id") % 2).cast("long"))
    out = hll_estimate()(hll_build("text", p=8, keys=("shard",))(df))
    rows = {r["shard"]: r["approx_distinct"] for r in out.collect()}
    assert set(rows) == {0, 1} and all(v > 0 for v in rows.values())


# ---------------------------------------------------------------------------
# property laws for the third-batch operators
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_LAW = dict(max_examples=6, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**_LAW)
@given(xs=st.lists(st.text(alphabet="abcde", min_size=1, max_size=3),
                   min_size=1, max_size=40),
       frac=st.sampled_from([0.05, 0.2, 0.5]))
def test_heavy_hitters_equals_brute_force_law(spark, xs, frac):
    from collections import Counter
    import math as _m
    df = spark.createDataFrame([(x,) for x in xs], "v string")
    got = sorted(tuple(r) for r in
                 heavy_hitters("v", min_frac=frac, width=16, depth=2)(
                     df).collect())
    release_caches()
    th = max(_m.ceil(frac * len(xs)), 1)
    want = sorted((v, c) for v, c in Counter(xs).items() if c >= th)
    assert got == want


@settings(**_LAW)
@given(xs=st.lists(st.integers(min_value=0, max_value=99),
                   min_size=0, max_size=60),
       cut=st.integers(min_value=0, max_value=99))
def test_hll_merge_commutes_with_union_law(spark, xs, cut):
    """build(A) ⊔ build(B) == build(A ∪ B) for ANY split — the sketch
    is a semilattice homomorphism."""
    df = spark.createDataFrame([(str(x),) for x in xs] or [(None,)],
                               "v string")
    whole = hll_build("v", p=6)(df).first()["hll"]
    a = hll_build("v", p=6)(df.where(f"v < '{cut}' OR v IS NULL"))
    b = hll_build("v", p=6)(df.where(f"v >= '{cut}'"))
    merged = hll_merge()(a.unionByName(b)).first()["hll"]
    assert sorted(map(tuple, merged)) == sorted(map(tuple, whole))


# ---------------------------------------------------------------------------
# minhash_eval (LSH quality audit)
# ---------------------------------------------------------------------------

def test_minhash_eval_consistency_with_constituents(spark):
    """The metrics row must equal what the two already-oracled
    constituent operators report when composed by hand."""
    from conduino_spark import (
        minhash_dedup_pairs, minhash_eval, ngram_jaccard_pairs,
    )
    df = spark.read.parquet(DOCS)
    row = minhash_eval(threshold=0.2)(df).first()
    release_caches()
    cand = {(r["id_a"], r["id_b"]) for r in
            minhash_dedup_pairs()(df).collect()}
    release_caches()
    true = {(r["id_a"], r["id_b"]) for r in
            ngram_jaccard_pairs(threshold=0.2)(df).collect()}
    release_caches()
    hit = cand & true
    assert row["n_candidates"] == len(cand)
    assert row["n_true"] == len(true)
    assert row["n_hit"] == len(hit)
    if cand:
        assert row["precision"] == pytest.approx(
            round(len(hit) / len(cand), 6))
    if true:
        assert row["recall"] == pytest.approx(
            round(len(hit) / len(true), 6))


def test_minhash_eval_clone_corpus_full_recall(spark):
    """Exact clones collide in EVERY band — recall must be 1.0; a
    corpus with no similar pairs is vacuously perfect."""
    from conduino_spark import minhash_eval
    base = spark.read.parquet(DOCS).limit(10).collect()
    clones = [(r["doc_id"], r["text"]) for r in base] + \
             [(1000 + r["doc_id"], r["text"]) for r in base]
    df = spark.createDataFrame(clones, "doc_id long, text string")
    row = minhash_eval(threshold=0.99)(df).first()
    release_caches()
    assert row["n_true"] >= 10 and row["recall"] == 1.0

    solo = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string")
    row2 = minhash_eval(threshold=0.5)(solo).first()
    release_caches()
    assert row2["n_true"] == 0 and row2["recall"] == 1.0
    assert row2["n_candidates"] == 0 and row2["precision"] == 1.0


# ---------------------------------------------------------------------------
# streaming windowed distinct (HLL registers)
# ---------------------------------------------------------------------------

def test_windowed_hll_batch_matches_grouped_build_and_exact(spark):
    """On batch input, windowed register rows assembled per window ==
    hll_build grouped by the same window (identical md5 bucket/rho
    split), and the per-window estimates track exact distincts."""
    from conduino_spark import hll_build
    from conduino_spark.operators.sketches import hll_assemble
    from conduino_spark.streaming import windowed_hll_registers

    ev = spark.read.parquet(EVENTS)
    regs = windowed_hll_registers("ts", "1 hour", "user_id", p=10)(ev)
    sk = hll_assemble(p=10)(regs)
    got = {(r["w_start"], r["w_end"]): list(map(tuple, r["hll"]))
           for r in sk.collect()}

    w = ev.withColumn("w_start", F.window("ts", "1 hour").start) \
          .withColumn("w_end", F.window("ts", "1 hour").end)
    want_rows = hll_build("user_id", p=10,
                          keys=("w_start", "w_end"))(w).collect()
    want = {(r["w_start"], r["w_end"]): list(map(tuple, r["hll"]))
            for r in want_rows}
    assert got == want and len(got) > 1

    ests = {r["w_start"]: r["approx_distinct"]
            for r in hll_estimate()(sk).collect()}
    exact = {r["w_start"]: r["n"]
             for r in w.groupBy("w_start")
                       .agg(F.countDistinct("user_id").alias("n"))
                       .collect()}
    for ws, n in exact.items():
        assert abs(ests[ws] - n) <= 5 * 1.04 / math.sqrt(1 << 10) * max(n, 1)


def test_windowed_hll_stream_replay_equals_batch(spark, sf_dir):
    """Drained append-mode streaming run emits the same register rows
    as the batch run — per-window distinct sketching really is a
    single valid streaming aggregation."""
    from conduino_spark.sources import from_dataframe, read_table
    from conduino_spark import run_pipe
    from conduino_spark.streaming import (
        file_stream_source, run_stream_to_memory, stage_events_dir,
        windowed_hll_registers,
    )

    d = stage_events_dir(f"{sf_dir}/events.parquet", n_chunks=4,
                         sentinel_hours=4.0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    st = windowed_hll_registers("ts", "1 hour", "user_id", p=9,
                                watermark="2 hours")
    out = run_stream_to_memory(file_stream_source(d, schema) | st, spark)
    ev = read_table(sf_dir, "events").df(spark)
    batch = run_pipe(from_dataframe(ev) | st | sink_df(), spark)
    max_real = ev.agg(F.max("ts")).first()[0]
    got = sorted(tuple(r) for r in out.collect()
                 if r["w_start"] <= max_real)
    want = sorted(tuple(r) for r in batch.collect()
                  if r["w_start"] <= max_real)
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# snapshot_diff + profile_table
# ---------------------------------------------------------------------------

def test_snapshot_diff_matches_duckdb(spark):
    from conduino_spark import snapshot_diff
    old = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30),
         (4, None, 40)],
        "id long, txt string, v long")
    new = spark.createDataFrame(
        [(1, "alpha", 10),        # unchanged -> dropped
         (2, "beta2", 20),        # changed
         (4, None, 41),           # changed (NULL-safe compare)
         (5, "new", 50)],         # added; 3 removed
        "id long, txt string, v long")
    got = sorted(tuple(r) for r in
                 snapshot_diff(old, "id")(new).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE o (id BIGINT, txt VARCHAR, v BIGINT)")
    con.execute("CREATE TABLE n (id BIGINT, txt VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO o VALUES (?,?,?)",
                    [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30),
                     (4, None, 40)])
    con.executemany("INSERT INTO n VALUES (?,?,?)",
                    [(1, "alpha", 10), (2, "beta2", 20), (4, None, 41),
                     (5, "new", 50)])
    want = sorted(tuple(r) for r in con.execute("""
        WITH c AS (
          SELECT coalesce(n.id, o.id) AS id,
                 CASE WHEN o.id IS NULL THEN 'added'
                      WHEN n.id IS NULL THEN 'removed'
                      WHEN n.txt IS DISTINCT FROM o.txt
                        OR n.v IS DISTINCT FROM o.v THEN 'changed'
                 END AS change
          FROM n FULL OUTER JOIN o USING (id))
        SELECT t.id, t.txt, t.v, c.change
        FROM c JOIN (SELECT * FROM n UNION ALL
                     SELECT * FROM o WHERE id NOT IN (SELECT id FROM n)) t
          USING (id)
        WHERE c.change IS NOT NULL""").fetchall())
    assert got == want
    changes = {r[0]: r[3] for r in got}
    assert changes == {2: "changed", 3: "removed", 4: "changed",
                       5: "added"}


def test_profile_table_matches_duckdb(spark):
    from conduino_spark import profile_table
    df = spark.read.parquet(DOCS)
    got = {r["column"]: r for r in profile_table()(df).collect()}
    con = _con("documents", DOCS)
    for c in ("doc_id", "text", "lang", "source", "n_chars"):
        n, nn, mn, mx, nd = con.sql(f"""
            SELECT count(*), count(*) - count({c}),
                   min(CAST({c} AS VARCHAR)), max(CAST({c} AS VARCHAR)),
                   count(DISTINCT {c})
            FROM documents""").fetchone()
        r = got[c]
        assert r["n_rows"] == n and r["n_nulls"] == nn
        assert r["min"] == mn and r["max"] == mx
        assert r["null_frac"] == pytest.approx(round(nn / n, 6))
        import math as _m
        assert abs(r["approx_distinct"] - nd) \
            <= 5 * 1.04 / _m.sqrt(1 << 12) * max(nd, 1)


# ---------------------------------------------------------------------------
# empty / degenerate input sweep for the third-batch operators
# ---------------------------------------------------------------------------

def test_third_batch_empty_inputs(spark):
    from conduino_spark import (
        minhash_eval, profile_table, snapshot_diff, source_overlap,
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string")

    assert source_overlap()(
        empty_docs.withColumnRenamed("doc_id", "source")).count() == 0

    row = minhash_eval()(empty_docs).first()
    release_caches()
    assert (row["n_candidates"], row["n_true"]) == (0, 0)
    assert row["precision"] == 1.0 and row["recall"] == 1.0

    prof = {r["column"]: r for r in profile_table()(empty_docs).collect()}
    assert set(prof) == {"doc_id", "text"}
    for r in prof.values():
        assert r["n_rows"] == 0 and r["n_nulls"] == 0
        assert r["approx_distinct"] == 0.0 and r["min"] is None

    some = spark.createDataFrame([(1, "a b c d"), (2, "e f g h")],
                                 "doc_id long, text string")
    # empty old snapshot: everything is added
    d1 = snapshot_diff(empty_docs, "doc_id")(some)
    assert {r["change"] for r in d1.collect()} == {"added"}
    # empty new snapshot: everything is removed
    d2 = snapshot_diff(some, "doc_id")(empty_docs)
    assert sorted((r["doc_id"], r["change"]) for r in d2.collect()) == \
        [(1, "removed"), (2, "removed")]

    hh = heavy_hitters("text", min_frac=0.5)(empty_docs).collect()
    release_caches()
    assert hh == []


# ---------------------------------------------------------------------------
# script_profile
# ---------------------------------------------------------------------------

def test_script_profile_matches_duckdb(spark):
    from conduino_spark import script_profile
    from conduino_spark.operators.text import SCRIPT_RANGES
    rows = [
        (1, "hello world abc"),
        (2, "привет мир hello"),
        (3, "你好世界 こんにちは 안녕하세요"),
        (4, "مرحبا بالعالم 123"),
        (5, "mixed 你好 text 123 !!"),
        (6, None),
        (7, "   "),
        (8, "∑∆π≈ √∫"),  # Greek/symbols only — no class matches
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_profile()(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    parts = []
    for name, pat in SCRIPT_RANGES.items():
        parts.append(
            f"CASE WHEN text IS NULL THEN NULL "
            f"WHEN length(s) = 0 THEN 0.0 "
            f"ELSE round((length(s) - length(regexp_replace(s, '{pat}', "
            f"'', 'g'))) / CAST(length(s) AS DOUBLE), 6) END AS {name}_frac")
    sql = (f"SELECT doc_id, {', '.join(parts)} FROM "
           f"(SELECT doc_id, text, "
           f"regexp_replace(text, '\\s', '', 'g') AS s FROM t)")
    for w in con.sql(sql).fetchall():
        doc_id = w[0]
        for i, name in enumerate(SCRIPT_RANGES):
            g = got[doc_id][f"{name}_frac"]
            assert g == w[i + 1] or (
                g is None and w[i + 1] is None), (doc_id, name, g, w[i+1])

    # spot semantics
    assert got[1]["latin_frac"] == 1.0 and got[1]["other_frac"] == 0.0
    assert got[3]["cjk_frac"] == 1.0
    assert got[6]["latin_frac"] is None
    assert got[7]["latin_frac"] == 0.0
    assert got[8]["other_frac"] == 1.0
    # fractions sum to 1 for non-null non-empty
    for i in (1, 2, 3, 4, 5, 8):
        tot = sum(got[i][f"{n}_frac"] for n in SCRIPT_RANGES) \
            + got[i]["other_frac"]
        assert tot == pytest.approx(1.0, abs=1e-5)
