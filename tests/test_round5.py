"""Round-5 additions: sessionize (row-level session labeling),
binned_quantiles (deterministic histogram quantiles + DuckDB replay),
sink_parquet_sorted (globally-ordered shard layout)."""

import math

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    binned_quantiles, from_dataframe, read_table, run_pipe, sessionize,
    sink_df, sink_parquet_sorted, source_list,
)
from conduino_spark.operators.sketches import binned_quantiles_sql


# --- sessionize --------------------------------------------------------------
def test_sessionize_known_values(spark):
    # user 1: events at 0, 100, 2000, 2100  (gap 600 -> sessions 0,0,1,1)
    # user 2: events at 50, 5000            (sessions 0,1)
    rows = [(1, 0.0), (1, 100.0), (1, 2000.0), (1, 2100.0),
            (2, 50.0), (2, 5000.0)]
    df = spark.createDataFrame(rows, "user_id long, t double")
    out = run_pipe(from_dataframe(df)
                   | sessionize("t", 600.0, keys=("user_id",))
                   | sink_df(), spark)
    got = {(r.user_id, r.t): r.session_id for r in out.collect()}
    assert got == {(1, 0.0): 0, (1, 100.0): 0, (1, 2000.0): 1,
                   (1, 2100.0): 1, (2, 50.0): 0, (2, 5000.0): 1}


def test_sessionize_tie_determinism(spark):
    # two events at the SAME timestamp after a session boundary: the
    # tie's internal gap is 0, so both land in the new session no
    # matter which of them the window visits first
    rows = [(1, 0.0), (1, 1000.0), (1, 1000.0)]
    df = spark.createDataFrame(rows, "user_id long, t double")
    out = run_pipe(from_dataframe(df)
                   | sessionize("t", 600.0, keys=("user_id",))
                   | sink_df(), spark)
    sess = sorted((r.t, r.session_id) for r in out.collect())
    assert sess == [(0.0, 0), (1000.0, 1), (1000.0, 1)]


def test_sessionize_matches_duckdb(spark, sf_dir):
    import duckdb

    ev = read_table(sf_dir, "events")
    out = run_pipe(from_dataframe(ev.df(spark))
                   | sessionize("ts", 1800.0, keys=("user_id",))
                   | sink_df(), spark)
    got = {r.event_id: r.session_id
           for r in out.select("event_id", "session_id").collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    oracle = con.execute("""
      WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
      f AS (SELECT event_id, user_id, t,
              CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                     > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM t)
      SELECT event_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM f""").fetchall()
    want = {eid: int(s) for eid, s in oracle}
    assert got == want


def test_stream_sessionize_replay_equals_batch(spark, sf_dir):
    """In-order replay law: streaming per-event session labels over a
    ts-ordered chunked replay equal the batch sessionize labels."""
    from conduino_spark.streaming import (
        file_stream_source, run_stream_to_memory, stage_events_dir,
        stream_sessionize)

    d = stage_events_dir(f"{sf_dir}/events.parquet", n_chunks=3)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = run_stream_to_memory(
        file_stream_source(d, schema) | stream_sessionize(1800.0), spark)
    got = {r.event_id: (r.key, r.session_id) for r in out.collect()}

    ev = read_table(sf_dir, "events").df(spark)
    batch = run_pipe(from_dataframe(ev)
                     | sessionize("ts", 1800.0, keys=("user_id",))
                     | sink_df(), spark)
    want = {r.event_id: (r.user_id, r.session_id)
            for r in batch.select("event_id", "user_id",
                                  "session_id").collect()}
    assert got == want

    with pytest.raises(ValueError):
        stream_sessionize(-1.0)


# --- binned_quantiles --------------------------------------------------------
def test_binned_quantiles_exact_on_uniform(spark):
    # 1..1000 with 1000 bins: every value its own bin; quantile = the
    # upper edge of the first bin reaching q*n, within one bin width
    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)],
                               "v double")
    out = run_pipe(from_dataframe(df)
                   | binned_quantiles("v", {"p50": 0.5, "p90": 0.9},
                                      bins=1000)
                   | sink_df(), spark)
    row = out.collect()[0]
    assert abs(row.p50 - 500.5) <= 999 / 1000 + 1e-9
    assert abs(row.p90 - 900.1) <= 999 / 1000 + 1e-9


def test_binned_quantiles_degenerate_single_value(spark):
    df = spark.createDataFrame([(7.0,), (7.0,), (7.0,)], "v double")
    out = run_pipe(from_dataframe(df) | binned_quantiles("v", {"p50": 0.5})
                   | sink_df(), spark)
    # lo == hi: single bin, edge = lo + 1*(0/bins) = 7.0 exactly
    assert out.collect()[0].p50 == 7.0


def test_binned_quantiles_matches_duckdb(spark, sf_dir):
    import duckdb

    ev = read_table(sf_dir, "events")
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")

    # global
    out = run_pipe(from_dataframe(ev.df(spark))
                   | binned_quantiles("value", qs, bins=512)
                   | sink_df(), spark).collect()[0]
    want = con.execute(
        binned_quantiles_sql("value", qs, bins=512, table="events")
    ).fetchone()
    for got_v, want_v in zip([out.p25, out.p50, out.p90, out.p99], want):
        assert got_v == want_v, "bit-identical claim violated"

    # keyed
    outk = run_pipe(from_dataframe(ev.df(spark))
                    | binned_quantiles("value", qs, bins=512,
                                       keys=("event_type",))
                    | sink_df(), spark)
    gotk = {r.event_type: (r.p25, r.p50, r.p90, r.p99)
            for r in outk.collect()}
    wantk = {r[0]: tuple(r[1:]) for r in con.execute(
        binned_quantiles_sql("value", qs, bins=512, table="events",
                             keys=("event_type",))).fetchall()}
    assert gotk == wantk


def test_binned_quantiles_explicit_bounds(spark, sf_dir):
    """Explicit lo/hi equal to the data's min/max reproduce the
    derived-bounds result exactly; mismatched lo/hi raise."""
    ev = read_table(sf_dir, "events").df(spark)
    mn, mx = ev.agg(F.min("value"), F.max("value")).collect()[0]
    derived = run_pipe(from_dataframe(ev)
                       | binned_quantiles("value", {"p50": 0.5}, bins=128)
                       | sink_df(), spark).collect()[0]
    explicit = run_pipe(from_dataframe(ev)
                        | binned_quantiles("value", {"p50": 0.5}, bins=128,
                                           lo=float(mn), hi=float(mx))
                        | sink_df(), spark).collect()[0]
    assert explicit.p50 == derived.p50
    with pytest.raises(ValueError):
        binned_quantiles("value", lo=1.0, hi=None)
    with pytest.raises(ValueError):
        binned_quantiles("value", lo=2.0, hi=1.0)


def test_binned_quantiles_explicit_bounds_clamps(spark):
    # values beyond [lo, hi] land in the edge bins instead of erroring
    df = spark.createDataFrame(
        [(float(x),) for x in (-50.0, 0.1, 0.5, 0.9, 99.0)], "v double")
    row = run_pipe(from_dataframe(df)
                   | binned_quantiles("v", {"p50": 0.5}, bins=10,
                                      lo=0.0, hi=1.0)
                   | sink_df(), spark).collect()[0]
    assert 0.0 <= row.p50 <= 1.0


def test_binned_quantiles_explicit_bounds_sql_replay(spark, sf_dir):
    """The explicit-bounds mode has its own DuckDB rendering, and it
    stays bit-identical even when values fall OUTSIDE [lo, hi] (both
    sides clamp into the edge bins the same way)."""
    import duckdb

    ev = read_table(sf_dir, "events").df(spark)
    qs = {"p50": 0.5, "p90": 0.9}
    # bounds narrower than the data: clamping is exercised
    got = run_pipe(from_dataframe(ev)
                   | binned_quantiles("value", qs, bins=64,
                                      lo=10.0, hi=50.0)
                   | sink_df(), spark).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    want = con.execute(
        binned_quantiles_sql("value", qs, bins=64, lo=10.0, hi=50.0,
                             table="events")).fetchone()
    assert (got.p50, got.p90) == want


def test_binned_quantiles_error_bound(spark, sf_dir):
    # error <= (max-min)/bins vs the exact quantile
    ev = read_table(sf_dir, "events").df(spark)
    stats = ev.agg(F.min("value"), F.max("value"),
                   F.expr("percentile(value, 0.5)")).collect()[0]
    width = (stats[1] - stats[0]) / 256
    out = run_pipe(from_dataframe(ev)
                   | binned_quantiles("value", {"p50": 0.5}, bins=256)
                   | sink_df(), spark).collect()[0]
    assert abs(out.p50 - stats[2]) <= width + 1e-9


# --- bloom filter -------------------------------------------------------------
def test_bloom_no_false_negatives_and_fp_rate(spark, sf_dir):
    from conduino_spark import bloom_build, bloom_contains

    ev = read_table(sf_dir, "events").df(spark)
    inserted = ev.where("user_id < 50").select("user_id").distinct()
    bloom = run_pipe(from_dataframe(inserted)
                     | bloom_build("user_id", m_bits=1 << 14, k=5)
                     | sink_df(), spark)
    probe = spark.range(0, 2000).select(F.col("id").alias("user_id"))
    got = run_pipe(from_dataframe(probe)
                   | bloom_contains(bloom, "user_id", m_bits=1 << 14, k=5)
                   | sink_df(), spark)
    res = {r.user_id: r.might_contain for r in got.collect()}
    ins = {r.user_id for r in inserted.collect()}
    # NO false negatives, ever
    assert all(res[u] for u in ins)
    # false-positive rate sane: (1 - e^{-kn/m})^k ~ 0.1% here; allow 5%
    absent = [u for u in res if u not in ins]
    fp = sum(1 for u in absent if res[u]) / max(1, len(absent))
    assert fp < 0.05, f"false-positive rate {fp}"


def test_bloom_words_match_duckdb(spark, sf_dir):
    """The sparse word table the DuckDB oracle rebuilds equals the
    dense array's non-zero entries — bit-identical layout."""
    import duckdb
    from conduino_spark import bloom_build
    from conduino_spark.operators.sketches import (BLOOM_WORD_BITS,
                                                   bloom_build_sql)

    docs = read_table(sf_dir, "documents").df(spark)
    bloom = run_pipe(from_dataframe(docs)
                     | bloom_build("doc_id", m_bits=1 << 12, k=3)
                     | sink_df(), spark)
    arr = bloom.collect()[0].bloom
    got = {w: bits for w, bits in enumerate(arr) if bits != 0}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = dict(con.execute(
        bloom_build_sql("doc_id", m_bits=1 << 12, k=3,
                        table="documents")).fetchall())
    assert got == want

    with pytest.raises(ValueError):
        bloom_build("doc_id", m_bits=10)
    with pytest.raises(ValueError):
        bloom_build("doc_id", k=0)


# --- mixture (training-mixture composer) --------------------------------------
def test_mixture_deterministic_and_tagged(spark, sf_dir):
    from conduino_spark import mixture

    docs = read_table(sf_dir, "documents").df(spark)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    mix = mixture({"even": (a, 0.5), "odd": (b, 0.25)})
    rows = [(r.doc_id, r.mix_source) for r in
            mix.select("doc_id", "mix_source").collect()]
    rows2 = [(r.doc_id, r.mix_source) for r in
             mixture({"even": (a, 0.5), "odd": (b, 0.25)})
             .select("doc_id", "mix_source").collect()]
    assert sorted(rows) == sorted(rows2)          # reproducible
    n_even = sum(1 for _, s in rows if s == "even")
    n_odd = sum(1 for _, s in rows if s == "odd")
    # h32 is uniform: expect ~125/~62 with generous slack
    assert 0.3 * a.count() < n_even < 0.7 * a.count()
    assert 0.1 * b.count() < n_odd < 0.45 * b.count()
    # per-source salting decorrelates: same doc sampled independently
    # when offered through different source names
    m2 = mixture({"x": (a, 0.5), "y": (a, 0.5)}, salt="s")
    xs = {r.doc_id for r in m2.where("mix_source = 'x'").collect()}
    ys = {r.doc_id for r in m2.where("mix_source = 'y'").collect()}
    assert xs != ys

    with pytest.raises(ValueError):
        mixture({})
    with pytest.raises(ValueError):
        mixture({"a": (a, 2.0)})


# --- corpus_filter (one-pass quality gate) ------------------------------------
def test_corpus_filter_reasons_and_keep(spark, sf_dir):
    from conduino_spark import corpus_filter

    docs = read_table(sf_dir, "documents").df(spark)
    out = run_pipe(from_dataframe(docs) | corpus_filter() | sink_df(), spark)
    rows = out.collect()
    assert len(rows) == docs.count()          # audit mode keeps all rows
    for r in rows:
        assert r.keep == (len(r.drop_reasons) == 0)
    # every reason names a real rule
    from conduino_spark.operators.text import CORPUS_FILTER_DEFAULT
    for r in rows:
        assert set(r.drop_reasons) <= set(CORPUS_FILTER_DEFAULT)
    kept = run_pipe(from_dataframe(docs) | corpus_filter(keep_only=True)
                    | sink_df(), spark)
    assert kept.count() == sum(1 for r in rows if r.keep)
    assert "keep" not in kept.columns and "drop_reasons" not in kept.columns


def test_corpus_filter_flags_repetitive_doc(spark):
    from conduino_spark import corpus_filter

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks away into the quiet evening with a friend of his "
            "from the farm near the old river bank ") * 6
    spam = "buy now " * 200
    df = spark.createDataFrame([(0, good), (1, spam)],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in
           run_pipe(from_dataframe(df) | corpus_filter() | sink_df(),
                    spark).collect()}
    assert out[0].keep
    assert not out[1].keep and "top_2gram_char_frac" in out[1].drop_reasons

    with pytest.raises(ValueError):
        corpus_filter(rules={"quality": ("??", 1)})(df)


def test_corpus_filter_streaming_equals_batch(spark, sf_dir):
    """The docstring claims streaming compatibility (pure projections):
    a chunked file-stream replay must produce exactly the batch
    labels."""
    from conduino_spark import corpus_filter
    from conduino_spark.streaming import (
        file_stream_source, run_stream_to_memory, stage_events_dir)

    d = stage_events_dir(f"{sf_dir}/documents.parquet", n_chunks=2)
    schema = "doc_id long, text string, lang string, source string"
    out = run_stream_to_memory(
        file_stream_source(d, schema) | corpus_filter(), spark)
    got = {r.doc_id: (r.keep, tuple(r.drop_reasons))
           for r in out.collect()}

    docs = read_table(sf_dir, "documents").df(spark)
    want = {r.doc_id: (r.keep, tuple(r.drop_reasons))
            for r in run_pipe(from_dataframe(docs) | corpus_filter()
                              | sink_df(), spark).collect()}
    assert got == want


# --- r5 edge battery: empty and single-row inputs -----------------------------
def test_round5_ops_on_empty_and_singleton(spark):
    from conduino_spark import corpus_filter, zorder_key

    empty_ev = spark.createDataFrame([], "user_id long, t double")
    one_ev = spark.createDataFrame([(1, 5.0)], "user_id long, t double")
    s = sessionize("t", 60.0, keys=("user_id",))
    assert s(empty_ev).count() == 0
    assert [r.session_id for r in s(one_ev).collect()] == [0]

    q = binned_quantiles("t", {"p50": 0.5}, bins=16)
    # GLOBAL aggregate over empty input = one all-NULL row (standard
    # SQL semantics — DuckDB's rendering does the same); keyed = empty
    erow = q(empty_ev).collect()
    assert len(erow) == 1 and erow[0].p50 is None
    qk = binned_quantiles("t", {"p50": 0.5}, bins=16, keys=("user_id",))
    assert qk(empty_ev).count() == 0
    assert q(one_ev).collect()[0].p50 == 5.0

    z = zorder_key(["user_id", "t"], bits=8)
    assert z(empty_ev).count() == 0
    assert z(one_ev).collect()[0]["__z"] == 0  # degenerate bounds -> bin 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert corpus_filter()(empty_docs).count() == 0


# --- incremental dedup against a reference corpus ----------------------------
def test_minhash_dedup_against_consistency(spark, sf_dir):
    """Internal-consistency oracle built from the already-oracled
    primitive: on the union corpus, minhash_dedup_pairs enumerates all
    band collisions — a new doc must be dropped by dedup-against iff it
    collides with some REFERENCE doc (collisions among new docs don't
    count)."""
    from conduino_spark import (minhash_dedup_against, minhash_dedup_pairs,
                                minhash_signatures)

    docs = read_table(sf_dir, "documents").df(spark)
    ref = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)

    kept = run_pipe(from_dataframe(new)
                    | minhash_dedup_against(ref) | sink_df(), spark)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}

    pairs = run_pipe(from_dataframe(docs)
                     | minhash_dedup_pairs() | sink_df(), spark).collect()
    ref_ids = {r.doc_id for r in ref.select("doc_id").collect()}
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    dropped = set()
    for p in pairs:
        if p.id_a in ref_ids and p.id_b in new_ids:
            dropped.add(p.id_b)
        if p.id_b in ref_ids and p.id_a in new_ids:
            dropped.add(p.id_a)
    assert kept_ids == new_ids - dropped
    assert dropped, "want a non-trivial test: some new doc must collide"

    # precomputed-signature path is equivalent (the 100 TB shape)
    ref_sig = run_pipe(from_dataframe(ref) | minhash_signatures()
                       | sink_df(), spark)
    kept2 = run_pipe(from_dataframe(new)
                     | minhash_dedup_against(ref_sig, ref_sigs=True)
                     | sink_df(), spark)
    assert {r.doc_id for r in kept2.select("doc_id").collect()} == kept_ids


def test_minhash_dedup_against_keeps_internal_dups(spark):
    # identical docs INSIDE the batch survive (dropping them is
    # minhash_dedup's job); only reference collisions drop
    from conduino_spark import minhash_dedup_against
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    ref = spark.createDataFrame(
        [(100, "totally different reference corpus text here")],
        "doc_id long, text string")
    kept = run_pipe(from_dataframe(new) | minhash_dedup_against(ref)
                    | sink_df(), spark)
    assert kept.count() == 2


# --- sliding event windows (oracle) ------------------------------------------
def test_sliding_window_matches_duckdb(spark, sf_dir):
    """event_window(slide=...) vs a DuckDB oracle that explodes each
    event into every window covering it (hop enumeration)."""
    import duckdb
    from conduino_spark import event_window

    ev = read_table(sf_dir, "events")
    out = run_pipe(from_dataframe(ev.df(spark))
                   | event_window("ts", "1 hour", slide="15 minutes",
                                  keys=("event_type",))
                   | sink_df(), spark)
    got = {(r.w_start.timestamp(), r.event_type): r.n
           for r in out.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    # a 1h/15m hop covers each event in 4 windows: the one starting at
    # floor-to-15m minus {0,1,2,3} hops (clipped so ts < start + 1h)
    oracle = con.execute("""
      WITH hops AS (SELECT unnest(range(4)) AS i),
      e AS (SELECT event_type,
                   to_timestamp(floor(epoch(ts) / 900) * 900) AS base, ts
            FROM events)
      SELECT epoch(base - i * INTERVAL 15 MINUTE) AS w_start,
             event_type, count(*) AS n
      FROM e, hops
      WHERE ts < base - i * INTERVAL 15 MINUTE + INTERVAL 1 HOUR
      GROUP BY 1, 2""").fetchall()
    want = {(float(w), et): n for w, et, n in oracle}
    assert got == want


# --- property laws (hypothesis) ---------------------------------------------
from hypothesis import HealthCheck, given, settings, strategies as st

LAW_SETTINGS = dict(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**LAW_SETTINGS)
@given(xs=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                             allow_nan=False, allow_infinity=False),
                   min_size=1, max_size=60),
       bins=st.sampled_from([1, 4, 64]))
def test_binned_quantiles_laws(spark, xs, bins):
    """Quantiles are monotone in q, lie within [min, max+binwidth], and
    the pick for q is within one bin width of the exact quantile."""
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    qs = {"p10": 0.1, "p50": 0.5, "p100": 1.0}
    row = run_pipe(from_dataframe(df) | binned_quantiles("v", qs, bins=bins)
                   | sink_df(), spark).collect()[0]
    lo, hi = min(xs), max(xs)
    width = (hi - lo) / bins
    assert row.p10 <= row.p50 <= row.p100
    for name, q in qs.items():
        v = getattr(row, name)
        assert lo <= v <= hi + width + 1e-6 * max(1.0, abs(hi))
        exact = sorted(xs)[min(len(xs) - 1,
                               max(0, math.ceil(q * len(xs)) - 1))]
        assert abs(v - exact) <= width + 1e-6 * max(1.0, abs(hi))


@settings(**LAW_SETTINGS)
@given(ts=st.lists(st.integers(min_value=0, max_value=10_000),
                   min_size=1, max_size=40))
def test_sessionize_law(spark, ts):
    """Labels equal the sequential reference on one key: 0-based,
    incremented whenever the sorted gap exceeds the threshold."""
    gap = 100.0
    rows = [(1, float(t)) for t in ts]
    df = spark.createDataFrame(rows, "user_id long, t double")
    out = run_pipe(from_dataframe(df)
                   | sessionize("t", gap, keys=("user_id",))
                   | sink_df(), spark)
    got = sorted((r.t, r.session_id) for r in out.collect())
    want, sess, last = [], 0, None
    for t in sorted(ts):
        if last is not None and t - last > gap:
            sess += 1
        want.append((float(t), sess))
        last = t
    assert got == sorted(want)


# --- sink_parquet_sorted -----------------------------------------------------
def test_sink_parquet_sorted_disjoint_shards(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sorted_events")
    ev = read_table(sf_dir, "events")
    run_pipe(from_dataframe(ev.df(spark))
             | sink_parquet_sorted(path, ["event_id"], npart=8), spark)

    back = spark.read.parquet(path)
    assert back.count() == ev.df(spark).count()

    # per-file key ranges must be pairwise DISJOINT (global order across
    # shards) ...
    ranges = (back.groupBy(F.input_file_name().alias("f"))
                  .agg(F.min("event_id").alias("lo"),
                       F.max("event_id").alias("hi"))
                  .collect())
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) > 1, "want multiple shards for a disjointness test"
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a < lo_b, "shard key ranges overlap"

    # ... and rows inside each file must be sorted (row-group stats only
    # help pruning when the data is physically ordered)
    import pyarrow.parquet as pq
    import glob
    one = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    col = pq.read_table(one, columns=["event_id"])["event_id"].to_pylist()
    assert col == sorted(col)


def test_zorder_key_locality_law(spark):
    """Morton key interleaves correctly: on a [0,3]x[0,3] grid with
    bits=2, the key of (x, y) is the classic Z curve order."""
    from conduino_spark import zorder_key
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = zorder_key(["x", "y"], bits=2)(df).collect()
    got = {(r.x, r.y): r["__z"] for r in out}
    # bounds are [0,3]; normalized cell = min(floor(v/3*4), 3)
    def norm(v):
        return min(int(v / 3 * 4), 3)
    def interleave(a, b):
        z = 0
        for i in range(2):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    for (x, y), z in got.items():
        assert z == interleave(norm(x), norm(y))


def test_sink_parquet_zorder_prunes_both_dims(spark, sf_dir, tmp_path):
    """Z-order layout: a narrow range predicate on EITHER clustered
    column touches a strict subset of files; a lexicographic sort by
    (user_id, event_id) can only prune its leading column."""
    from conduino_spark import sink_parquet_zorder
    ev = read_table(sf_dir, "events")
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "lex")
    run_pipe(from_dataframe(ev.df(spark))
             | sink_parquet_zorder(zpath, ["user_id", "event_id"],
                                   npart=8), spark)
    run_pipe(from_dataframe(ev.df(spark))
             | sink_parquet_sorted(spath, ["user_id", "event_id"],
                                   npart=8), spark)

    def touched(path, pred):
        df = spark.read.parquet(path).where(pred)
        return len({r[0] for r in
                    df.select(F.input_file_name()).distinct().collect()})

    zf = spark.read.parquet(zpath)
    total = len({r[0] for r in
                 zf.select(F.input_file_name()).distinct().collect()})
    assert zf.count() == ev.df(spark).count()
    assert total > 1
    # narrow slice on each dimension: z-layout concentrates both
    p_user = "user_id >= 10 AND user_id < 15"
    p_event = "event_id >= 100 AND event_id < 200"
    assert touched(zpath, p_user) < total
    assert touched(zpath, p_event) < total
    # the lex layout serves its leading column but NOT the second:
    # every file spans nearly the full event_id range
    assert touched(spath, p_user) < total
    assert touched(spath, p_event) >= touched(zpath, p_event)


def test_sink_parquet_sorted_range_predicate_prunes(spark, sf_dir, tmp_path):
    # a range predicate on the sort key must not read every file:
    # with 8 disjoint shards, one point-range hits 1 shard
    path = str(tmp_path / "sorted_events2")
    ev = read_table(sf_dir, "events")
    run_pipe(from_dataframe(ev.df(spark))
             | sink_parquet_sorted(path, ["event_id"], npart=8), spark)
    back = spark.read.parquet(path)
    hit = back.where((F.col("event_id") >= 10) & (F.col("event_id") < 20))
    files = {r[0] for r in
             hit.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 1
