"""Round-2 regression tests: the r1 VERDICT/ADVICE findings.

Each test pins a specific defect found by the round-1 review:
  * scan('count') chunked offsets (ADVICE high)
  * consecutive() chunked plan == window plan (VERDICT wrong #1)
  * concat_map __seq packing overflow (VERDICT wrong #2)
  * cache-registry release after a materializing run (VERDICT wrong #3)
  * salted_join with same-named key columns (ADVICE low)
"""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    SEQ, Stage, concat_map, consecutive, from_dataframe, range_source,
    release_caches, run_pipe, salted_join, scan, sink_df, sink_list,
    source_list,
)


# --- scan('count') chunked (ADVICE high) -----------------------------------
def test_scan_count_chunked_matches_window(spark):
    vals = [7.0] * 6
    chunked = run_pipe(source_list(vals) | scan("count") | sink_list(), spark)
    window = run_pipe(
        source_list(vals) | scan("count", strategy="window") | sink_list(), spark)
    assert chunked == window == [1, 2, 3, 4, 5, 6]


def test_scan_count_chunked_many_partitions(spark):
    # force several range partitions so phase-2 offsets actually combine
    p = range_source(100, num_partitions=8) | scan("count", npart=8) | sink_list()
    assert run_pipe(p, spark) == list(range(1, 101))


# --- consecutive chunked (VERDICT wrong #1) --------------------------------
def test_consecutive_chunked_matches_window(spark):
    src = range_source(50, num_partitions=7)
    chunked = run_pipe(src | consecutive(4, npart=5) | sink_list(), spark)
    window = run_pipe(src | consecutive(4, strategy="window") | sink_list(), spark)
    assert chunked == window
    # golden shape: empty prefix first, terminal window last
    assert chunked[0] == []
    assert chunked[-1] == [46, 47, 48, 49]


def test_consecutive_chunked_short_partitions(spark):
    # n larger than any single partition: the carry must recurse across
    # MULTIPLE preceding partitions' tails
    src = range_source(12, num_partitions=6)
    got = run_pipe(src | consecutive(5, npart=6) | sink_list(), spark)
    want = run_pipe(src | consecutive(5, strategy="window") | sink_list(), spark)
    assert got == want


def test_consecutive_no_global_window_over_data(spark):
    import io, contextlib
    df = run_pipe(range_source(100, num_partitions=4)
                  | consecutive(3) | sink_df(), spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # every data-bearing Window must be partitioned by __pid; the only
    # unpartitioned windows run over the npart-row tails table
    for frag in plan.split("Window")[1:]:
        header = frag.splitlines()[0]
        if "__pid" not in header and "__w" in header:
            pytest.fail(f"unpartitioned window over data rows: {header}")


# --- concat_map reseq (VERDICT wrong #2) -----------------------------------
def _shift_seq(bits: int) -> Stage:
    # simulate monotonically_increasing_id seqs at high partition ids
    return Stage(lambda df: df.withColumn(SEQ, F.col(SEQ) * (1 << bits)),
                 name="shift_seq")


def test_concat_map_rank_survives_sparse_parent_seqs(spark):
    # parent seqs in the pid<<33 regime (would overflow the old packing)
    p = (source_list([1.0, 2.0, 3.0])
         | _shift_seq(43)
         | concat_map(F.array(F.col("v"), F.col("v") + 0.5))
         | sink_list())
    assert run_pipe(p, spark) == [1.0, 1.5, 2.0, 2.5, 3.0, 3.5]


def test_concat_map_pack_overflow_raises(spark):
    p = (source_list([1.0, 2.0])
         | _shift_seq(43)
         | concat_map(F.array(F.col("v")), reseq="pack")
         | sink_list())
    with pytest.raises(Exception, match="overflow|raise_error|__seq"):
        run_pipe(p, spark)


def test_concat_map_pack_fast_path_still_works(spark):
    p = (source_list([1.0, 2.0])
         | concat_map(F.array(F.col("v"), -F.col("v")), reseq="pack")
         | sink_list())
    assert run_pipe(p, spark) == [1.0, -1.0, 2.0, -2.0]


# --- cache registry (VERDICT wrong #3) -------------------------------------
def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_materializing_run_releases_caches(spark):
    # DELTA vs a baseline, not absolute zero: earlier tests' lingering
    # localCheckpoint RDDs (feedback/CC plans) stay in
    # getPersistentRDDs until JVM GC and are invisible to both the
    # registry and catalog.clearCache — the assertion's intent is "THIS
    # pipeline leaks nothing", which the delta measures exactly
    release_caches()
    spark.catalog.clearCache()
    base = _n_cached(spark)
    for _ in range(2):  # back-to-back pipelines must not accumulate
        out = run_pipe(range_source(1000, num_partitions=4)
                       | scan("sum") | sink_list(), spark)
        assert len(out) == 1000
        assert _n_cached(spark) <= base, "pipeline leaked cached blocks"


def test_lazy_sink_keeps_caches_until_released(spark):
    from conduino_spark.plans import cachereg
    release_caches()
    spark.catalog.clearCache()
    base = _n_cached(spark)
    df = run_pipe(range_source(100, num_partitions=4)
                  | scan("sum") | sink_df(), spark)
    assert df.count() == 100          # caller's action uses the cache
    # still registered for further actions (registry check: the JVM
    # persistent-RDD list can race with executor eviction)
    assert len(cachereg._TRACKED) > 0
    release_caches()
    assert len(cachereg._TRACKED) == 0
    assert _n_cached(spark) <= base   # see delta note above


# --- salted_join same-named keys (ADVICE low) ------------------------------
def test_salted_join_same_named_key(spark):
    left = spark.createDataFrame([(i % 3, i) for i in range(30)], "k int, a int")
    right = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k int, b string")
    p = from_dataframe(left) | salted_join(from_dataframe(right), "k", "k") | sink_df()
    out = run_pipe(p, spark)
    assert out.count() == 30
    assert out.where(F.col("b").isNull()).count() == 0


# --- typed-result source variants (VERDICT missing #3) ----------------------
def test_iterate_either_terminal_result(spark):
    from conduino_spark import Left, iterate_either

    # iterate doubling from 1 until > 50: yields 2..64? no — stops AT Left
    src, result = iterate_either(
        lambda x: Left(f"overflow:{x}") if x * 2 > 50 else x * 2, 1)
    assert result == "overflow:32"
    out = run_pipe(src | sink_list(), spark)
    assert out == [2, 4, 8, 16, 32]  # seed NOT yielded (reference golden)


def test_iterate_either_max_elems_gives_none(spark):
    from conduino_spark import iterate_either
    src, result = iterate_either(lambda x: x + 1, 0, max_elems=5)
    assert result is None
    assert run_pipe(src | sink_list(), spark) == [1, 2, 3, 4, 5]


def test_repeat_either_m_terminal_result(spark):
    from conduino_spark import Left, repeat_either_m
    it = iter([10, 20, 30, Left("done"), 40])
    src, result = repeat_either_m(lambda: next(it))
    assert result == "done"
    assert run_pipe(src | sink_list(), spark) == [10, 20, 30]


def test_feedback_pipe_either_provenance(spark):
    # stage sees provenance: halve fed-back values only, pass upstream
    # through doubled; upstream (False) rows must be distinguishable.
    from conduino_spark import feedback_pipe_either, source_list

    def fn(df):
        halved = (df.where(F.col("__fed_back") & (F.col("v") > 1))
                    .select(SEQ, (F.col("v") / 2).cast("long").alias("v")))
        seeded = (df.where(~F.col("__fed_back"))
                    .select(SEQ, (F.col("v") * 2).alias("v")))
        return seeded.unionByName(halved)

    out = feedback_pipe_either(Stage(fn, name="prov"), source_list([8]),
                               spark, max_iters=10)
    vals = sorted(r["v"] for r in out.collect())
    # round0: 8*2=16 (upstream), then fed back: 8, 4, 2, 1
    assert vals == [1, 2, 4, 8, 16]


# --- connected-components dedup (VERDICT next #7) ---------------------------
def test_cc_min_label_transitive_chain(spark):
    from conduino_spark.operators.dedup import _cc_min_label
    # chain 1-2-3-4 plus separate pair 10-11: components {1,2,3,4}, {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    got = {r["id"]: r["lbl"] for r in _cc_min_label(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_minhash_dedup_cc_keeps_one_per_cluster(spark, sf_dir):
    from conduino_spark import minhash_dedup_cc, minhash_dedup_pairs
    from conduino_spark.sources import read_table
    src = read_table(sf_dir, "documents")
    kept = run_pipe(src | minhash_dedup_cc() | sink_df(), spark)
    pairs = run_pipe(src | minhash_dedup_pairs() | sink_df(), spark).collect()
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # build components driver-side and check exactly-one-min-per-cluster
    import collections
    adj = collections.defaultdict(set)
    for r in pairs:
        adj[r["id_a"]].add(r["id_b"]); adj[r["id_b"]].add(r["id_a"])
    seen = set()
    for start in list(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x); stack.extend(adj[x] - comp)
        seen |= comp
        assert kept_ids & comp == {min(comp)}, f"component {sorted(comp)}"


# --- n-ary zip_sink (VERDICT next #10) --------------------------------------
def test_zip_sink_n_matches_applicative_chain(spark):
    from conduino_spark import fold, lift_zip_sink, sink_count, zip_sink, zip_sink_n
    src = range_source(100)
    a, b, c = fold("v", how="sum"), fold("v", how="max"), sink_count()
    # Applicative chain law: n-ary == nested binary (Data/Conduino.hs:651-653)
    nested = run_pipe(src | zip_sink(a, zip_sink(b, c)), spark)
    flat = run_pipe(src | zip_sink_n(a, b, c), spark)
    assert flat == (nested[0], *nested[1]) == (4950, 99, 100)
    # pure-sink identity: zipping in lift_zip_sink keeps the others
    with_pure = run_pipe(src | zip_sink_n(a, lift_zip_sink("k"), c), spark)
    assert with_pure == (4950, "k", 100)


def test_zip_sink_n_non_agg_fallback(spark):
    from conduino_spark import fold, sink_list, zip_sink_n
    got = run_pipe(range_source(5) | zip_sink_n(fold("v", how="sum"), sink_list()), spark)
    assert got == (10, [0, 1, 2, 3, 4])


# --- temporal joins (engine extensions) -------------------------------------
def test_asof_join_backward_golden(spark):
    from conduino_spark import asof_join
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 20, "b"), (2, 9, "c")], "k long, t long, v string")
    st = asof_join(from_dataframe(right), on="k", left_time="t",
                   right_cols={"rv": "v"})
    got = {(r["k"], r["t"]): r["rv"] for r in st(left).collect()}
    assert got == {(1, 10): "a", (1, 25): "b", (2, 5): None}


def test_asof_join_equal_time_inclusive_and_inner(spark):
    from conduino_spark import asof_join
    left = spark.createDataFrame([(1, 20), (1, 19)], "k long, t long")
    right = spark.createDataFrame([(1, 20, "x")], "k long, t long, v string")
    st = asof_join(from_dataframe(right), on="k", left_time="t",
                   right_cols={"rv": "v"}, how="inner")
    got = [(r["t"], r["rv"]) for r in st(left).collect()]
    assert got == [(20, "x")]  # t=20 matches inclusively; t=19 dropped


def test_asof_join_forward_with_tolerance(spark):
    from conduino_spark import asof_join
    left = spark.createDataFrame([(1, 10), (1, 30)], "k long, t long")
    right = spark.createDataFrame([(1, 12, "a"), (1, 50, "b")],
                                  "k long, t long, v string")
    st = asof_join(from_dataframe(right), on="k", left_time="t",
                   right_cols={"rv": "v"}, direction="forward", tolerance=10)
    got = {r["t"]: r["rv"] for r in st(left).collect()}
    assert got == {10: "a", 30: None}  # 50-30=20 > tolerance


def test_interval_join_bins(spark):
    from conduino_spark import interval_join
    points = spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, 95.0), (3, 2, 50.0)], "pid long, k long, t double")
    iv = spark.createDataFrame(
        [(100, 1, 0.0, 10.0), (200, 1, 90.0, 95.0), (300, 2, 40.0, 60.0)],
        "iid long, k long, s double, e double")
    st = interval_join(from_dataframe(iv), point="t", start="s", end="e",
                       on="k", out_cols={"iid": "iid"}, bin_width=7.0)
    got = sorted((r["pid"], r["iid"]) for r in st(points).collect())
    # pid2 at t=95 is NOT in [90,95) (left-closed); pid1 in [0,10); pid3 in [40,60)
    assert got == [(1, 100), (3, 300)]
    st2 = interval_join(from_dataframe(iv), point="t", start="s", end="e",
                        on="k", out_cols={"iid": "iid"}, bin_width=7.0,
                        closed="both")
    got2 = sorted((r["pid"], r["iid"]) for r in st2(points).collect())
    assert got2 == [(1, 100), (2, 200), (3, 300)]


def test_zip_source_n_truncates_at_shortest(spark):
    from conduino_spark import zip_source_n
    a = source_list([1, 2, 3, 4])
    b = source_list(["x", "y", "z"])
    c = source_list([10.0, 20.0, 30.0, 40.0, 50.0])
    p = zip_source_n(a, b, c) | sink_list()
    assert run_pipe(p, spark) == [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)]


def test_ivf_build_partitions_all_vectors(spark, sf_dir):
    from conduino_spark import ivf_build, ivf_search, read_table
    src = read_table(sf_dir, "embeddings")
    cells = run_pipe(src | ivf_build(k=4, iters=2) | sink_df(), spark)
    n = src.df(spark).count()
    assert cells.count() == n                      # every vector assigned
    assert cells.select("cell").distinct().count() <= 4
    assert cells.groupBy("vec_id").count().where("count > 1").count() == 0
    # the trained cells feed ivf_search as the coarse quantizer
    emb = src.df(spark).join(cells, "vec_id")
    q = [r["embedding"] for r in src.df(spark).where("vec_id = 0").collect()][0]
    st = ivf_search(list(q), k=5, cell_col="cell")
    top = st(emb).collect()
    assert top[0]["vec_id"] == 0 and len(top) == 5


# --- csv/json sources -------------------------------------------------------
def test_read_csv_and_json_roundtrip(spark, tmp_path):
    from conduino_spark import read_csv, read_json
    csv_p, json_p = str(tmp_path / "c"), str(tmp_path / "j")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, s string")
    df.write.option("header", "true").csv(csv_p)
    df.write.json(json_p)
    got_c = run_pipe(read_csv(csv_p, schema="id long, s string", seq_col="id")
                     | sink_df(), spark)
    got_j = run_pipe(read_json(json_p, schema="id long, s string", seq_col="id")
                     | sink_df(), spark)
    want = {(1, "a"), (2, "b"), (3, "c")}
    assert {(r["id"], r["s"]) for r in got_c.collect()} == want
    assert {(r["id"], r["s"]) for r in got_j.collect()} == want


# --- KMV distinct sketch ----------------------------------------------------
def test_kmv_distinct_accuracy_and_exact_path(spark):
    from conduino_spark import kmv_distinct
    # large-distinct: estimate within ~3/sqrt(k) of truth
    big = spark.range(20_000).selectExpr("cast(id as string) as s")
    est = kmv_distinct("s", k=256)(big).collect()[0][0]
    assert abs(est - 20_000) / 20_000 < 3 / (256 ** 0.5)
    # fewer than k distinct -> exact
    small = spark.range(100).selectExpr("cast(id % 37 as string) as s")
    assert kmv_distinct("s", k=256)(small).collect()[0][0] == 37.0


def test_kmv_bottom_k_is_heap_not_sort(spark):
    import io, contextlib
    from conduino_spark import kmv_distinct
    df = spark.range(1000).selectExpr("cast(id as string) as s")
    # inspect the plan of the bottom-k subtree via the full stage
    out = kmv_distinct("s", k=16)(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


# --- bucketed chunk ids (r2: one shuffle for ordered operators) -------------
def test_ordered_ops_with_value_gapped_seqs(spark):
    # __seq in the mono-id regime (pid<<33 blocks): buckets go EMPTY —
    # pairs must stitch to the next NON-EMPTY chunk, scan offsets must
    # combine across gaps
    from conduino_spark import pairs
    src = range_source(40, num_partitions=4) | _shift_seq(33)
    got_scan = run_pipe(src | scan("sum", npart=8) | sink_list(), spark)
    want_scan = [sum(range(i + 1)) for i in range(40)]
    assert got_scan == want_scan
    got_pairs = run_pipe(src | pairs(npart=8) | sink_list(), spark)
    assert got_pairs == [(i, i + 1) for i in range(39)]
    got_cons = run_pipe(src | consecutive(3, npart=8) | sink_list(), spark)
    want_cons = run_pipe(src | consecutive(3, strategy="window") | sink_list(), spark)
    assert got_cons == want_cons


def test_scan_chunked_single_full_shuffle(spark):
    import io, contextlib
    df = run_pipe(range_source(1000, num_partitions=4) | scan("sum") | sink_df(), spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    # the r1 plan paid rangepartitioning AND hashpartitioning over the
    # full data; the bucketed pid keeps only the window's hash exchange
    assert "rangepartitioning" not in plan.lower()


def test_scan_product_chunked_matches_window(spark):
    vals = [1.0, 2.0, 3.0, 1.5, 2.0]
    chunked = run_pipe(source_list(vals) | scan("product", npart=3) | sink_list(), spark)
    window = run_pipe(source_list(vals) | scan("product", strategy="window")
                      | sink_list(), spark)
    assert chunked == window == [1.0, 2.0, 6.0, 9.0, 18.0]


def test_asof_and_interval_empty_right_side(spark):
    from conduino_spark import asof_join, interval_join
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    empty_r = spark.createDataFrame([], "k long, t long, v string")
    got = asof_join(from_dataframe(empty_r), on="k", left_time="t",
                    right_cols={"rv": "v"})(left).collect()
    assert len(got) == 1 and got[0]["rv"] is None
    empty_iv = spark.createDataFrame([], "iid long, k long, s double, e double")
    got2 = interval_join(from_dataframe(empty_iv), point="t", start="s", end="e",
                         on="k", out_cols={"iid": "iid"})(
        spark.createDataFrame([(1, 1, 5.0)], "pid long, k long, t double")).collect()
    assert got2 == []


def test_scan_empty_stream(spark):
    assert run_pipe(source_list([]) | scan("sum") | sink_list(), spark) == []


def test_pivot_agg_declared_domain(spark):
    from conduino_spark import pivot_agg
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 5.0), (2, "a", 1.0)], "k long, t string, v double")
    st = pivot_agg(["k"], "t", ["a", "b", "c"], F.sum("v"))
    got = {r["k"]: (r["a"], r["b"], r["c"]) for r in st(df).collect()}
    assert got == {1: (10.0, 5.0, None), 2: (1.0, None, None)}


def test_percentiles_exact_vs_approx(spark):
    from conduino_spark import percentiles
    df = spark.range(1001).selectExpr("'g' as g", "cast(id as double) as v")
    exact = percentiles(["g"], "v", {"p50": 0.5})(df).collect()[0]["p50"]
    approx = percentiles(["g"], "v", {"p50": 0.5}, exact=False)(df).collect()[0]["p50"]
    assert exact == 500.0
    assert abs(approx - 500.0) <= 5


# --- reproducible sampling --------------------------------------------------
def test_hash_sample_stable_and_consistent_across_tables(spark):
    from conduino_spark import hash_sample
    users = spark.createDataFrame([(i,) for i in range(500)], "uid long")
    events = spark.createDataFrame([(i % 500, i) for i in range(2000)],
                                   "uid long, eid long")
    su = {r["uid"] for r in hash_sample("uid", 0.2)(users).collect()}
    su2 = {r["uid"] for r in hash_sample("uid", 0.2)(users.repartition(7)).collect()}
    assert su == su2                       # partitioning-independent
    se = {r["uid"] for r in hash_sample("uid", 0.2)(events).collect()}
    assert se == su                        # consistent across tables
    assert 0.1 < len(su) / 500 < 0.3       # near the asked fraction


def test_hash_split_partitions_and_weights(spark):
    from conduino_spark import hash_split
    df = spark.range(5000).selectExpr("id as k")
    out = hash_split("k", {"train": 0.8, "val": 0.1, "test": 0.1})(df)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000    # total partition, no overlap
    assert abs(counts["train"] / 5000 - 0.8) < 0.05


def test_shard_by_deterministic_and_repartitioned(spark):
    from conduino_spark import shard_by
    df = spark.range(1000).selectExpr("id as k")
    a = {r["k"]: r["shard"] for r in shard_by("k", 8)(df).collect()}
    b = {r["k"]: r["shard"] for r in
         shard_by("k", 8, repartition=True)(df.repartition(3)).collect()}
    assert a == b and set(a.values()) == set(range(8))


def test_chunk_text_windows(spark):
    from conduino_spark import chunk_text
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    st = chunk_text(4, 2, out="chunk")
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_tokens"])
            for r in st(df).collect()}
    assert rows[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert rows[(1, 1)] == ("t2 t3 t4 t5", 4)   # stride 2, overlap 2
    assert rows[(1, 3)] == ("t6 t7 t8 t9", 4)
    assert rows[(2, 0)] == ("a b", 2)           # short doc: itself
    assert rows[(3, 0)] == ("", 0)              # empty doc: one empty chunk
    assert max(c for _, c in rows) == 3


def test_pack_chunks_bins_respect_budget(spark):
    from conduino_spark import chunk_text, pack_chunks
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(d, text) for d in range(5)],
                               "doc_id long, text string")
    out = pack_chunks(64)(chunk_text(16, 0)(df))
    rows = out.collect()
    assert len(rows) == 5 * 7  # ceil(100/16) = 7 chunks per doc
    got = {(r["doc_id"], r["chunk_id"]): r["bin"] for r in rows}
    # exact greedy-contiguous reference: bin = floor(cum_before / budget)
    cum, want = 0, {}
    for d in range(5):
        for c in range(7):
            n = 16 if c < 6 else 4
            want[(d, c)] = cum // 64
            cum += n
    assert got == want


def test_asof_join_multi_key(spark):
    from conduino_spark import asof_join
    left = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 10), (2, "x", 10)], "k long, g string, t long")
    right = spark.createDataFrame(
        [(1, "x", 8, "a"), (1, "y", 9, "b"), (2, "z", 5, "c")],
        "k long, g string, t long, v string")
    st = asof_join(from_dataframe(right), on=["k", "g"], left_time="t",
                   right_cols={"rv": "v"})
    got = {(r["k"], r["g"]): r["rv"] for r in st(left).collect()}
    assert got == {(1, "x"): "a", (1, "y"): "b", (2, "x"): None}


def test_interval_join_guards(spark):
    from conduino_spark import interval_join
    pts = spark.createDataFrame([(1, 5.0)], "pid long, t double")
    # malformed interval (end < start) silently dropped
    bad = spark.createDataFrame([(9, 10.0, 0.0)], "iid long, s double, e double")
    st = interval_join(from_dataframe(bad), point="t", start="s", end="e",
                       out_cols={"iid": "iid"}, bin_width=1.0)
    assert st(pts).collect() == []
    # absurdly long interval raises instead of exploding
    huge = spark.createDataFrame([(9, 0.0, 1e12)], "iid long, s double, e double")
    st2 = interval_join(from_dataframe(huge), point="t", start="s", end="e",
                        out_cols={"iid": "iid"}, bin_width=1.0, max_bins=1000)
    with pytest.raises(Exception, match="bins|raise_error"):
        st2(pts).collect()


def test_map_accum_chunked_matches_sequential(spark):
    from conduino_spark import map_accum, map_accum_chunked

    # running max with "count of new records" output — genuinely
    # order-dependent output, monoid-mergeable state
    def step(v, s):
        return (max(s, v), 1.0 if v > s else 0.0)

    src = range_source(200, num_partitions=5) | Stage(
        lambda df: df.withColumn("v", (F.col("v") * 37 % 101).cast("double")),
        name="scramble")
    par = run_pipe(src | map_accum_chunked(
        step, -1.0, merge=max, identity=float("-inf"), npart=6) | sink_list(), spark)
    seq = run_pipe(src | map_accum(step, -1.0) | sink_list(), spark)
    assert par == seq and len(par) == 200


def test_dedup_latest_keeps_newest_per_key(spark):
    from conduino_spark import dedup_latest
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (2, 5, "dd")],
        "k long, t long, v string")
    st = dedup_latest(["k"], F.col("t") * 10 + F.length("v"))
    got = {r["k"]: r["v"] for r in st(df).collect()}
    assert got == {1: "b", 2: "dd"}  # tie at t=5 pinned by the order key


def test_source_binary_reads_files(spark, tmp_path):
    # sourceHandle binary (Combinators.hs:280-288) — untested in r1
    from conduino_spark import source_binary
    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02")
    (tmp_path / "b.bin").write_bytes(b"hello")
    out = run_pipe(source_binary(str(tmp_path) + "/*.bin") | sink_df(), spark)
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in out.collect()}
    assert rows == {"a.bin": b"\x00\x01\x02", "b.bin": b"hello"}
    assert out.where("length < 0").count() == 0


def test_results_independent_of_shuffle_partitions(spark):
    # the driver's session may run ANY shuffle.partitions — ordered ops
    # must not depend on the partition count (newSession shares the
    # context but carries its own SQLConf)
    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "200")

    def run_on(s):
        src = range_source(500, num_partitions=4)
        return run_pipe(src | scan("sum") | sink_list(), s)

    assert run_on(spark) == run_on(s2)
