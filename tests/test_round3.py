"""Round-3 regression tests: the r2 VERDICT/ADVICE findings.

Each test pins a specific defect found by the round-2 review:
  * cache-registry releases scoped to the owning pipeline run (ADVICE medium)
  * connected-components non-convergence raises, never splits (ADVICE low)
  * chunk_text on NULL text emits an empty chunk with n_tokens=0 (ADVICE low)
  * hash_sample / hash_split NULL-key consistency (ADVICE low)
  * _scaled_sum 2^53 representability guard raises loudly (ADVICE low)
"""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    Stage, chunk_text, hash_sample, hash_split, run_pipe, sink_list,
    source_list,
)
from conduino_spark.plans import cachereg


# --- cache registry scoping (ADVICE medium) ---------------------------------
def test_release_scoped_to_owning_pipeline_run(spark):
    # the registry is process-global: earlier tests' lazy flows (sink_df)
    # legitimately leave tracked entries — drain so the counts below are
    # about THIS test's caches (r3 VERDICT: order-dependent failure)
    cachereg.release_caches()

    # an "other still-live lazy flow" holds a tracked cache...
    outer = cachereg.track(spark.range(10))
    outer.count()
    assert outer.storageLevel.useMemory
    base = len(cachereg._TRACKED)

    # ...while a materializing pipeline tracks and releases its OWN cache
    tracker = Stage(lambda df: cachereg.track(df), name="tracker")
    got = run_pipe(source_list([1, 2, 3]) | tracker | sink_list(), spark)
    assert got == [1, 2, 3]

    # the pipeline's cache is gone, the outer flow's cache survives
    assert len(cachereg._TRACKED) == base
    assert outer.storageLevel.useMemory, \
        "pipeline run must not release caches owned by other live flows"
    assert cachereg.release_caches() == 1
    assert not outer.storageLevel.useMemory


def test_release_caches_default_releases_everything(spark):
    a = cachereg.track(spark.range(5))
    b = cachereg.track(spark.range(6))
    a.count(), b.count()
    assert cachereg.release_caches() == 2
    assert not a.storageLevel.useMemory and not b.storageLevel.useMemory


# --- connected components: bounded rounds (ADVICE low) -----------------------
def _chain_pairs(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long")


def test_cc_nonconvergence_raises(spark):
    from conduino_spark.operators.dedup import _cc_min_label
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_min_label(_chain_pairs(spark, 8), max_iters=1).collect()


def test_cc_chain_converges_to_min_label(spark):
    from conduino_spark.operators.dedup import _cc_min_label
    labels = _cc_min_label(_chain_pairs(spark, 8), max_iters=25)
    assert {r.lbl for r in labels.collect()} == {1}


# --- chunk_text NULL text (ADVICE low) ---------------------------------------
def test_chunk_text_null_text_yields_empty_chunk(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, None), (3, "")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_text(4, 1)(df).collect()}
    assert out[2].chunk == "" and out[2].n_tokens == 0
    assert out[3].chunk == "" and out[3].n_tokens == 0
    assert out[1].n_tokens == 3
    # downstream pack_chunks cumulative sums stay sane (no -1 rows)
    assert all(r.n_tokens >= 0 for r in out.values())


# --- sampling NULL keys (ADVICE low) -----------------------------------------
def test_hash_sample_drops_null_keys(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    kept = hash_sample("k", 1.0)(df)  # fraction 1.0: every hashed key kept
    assert sorted(r.k for r in kept.collect()) == [1, 2]


def test_hash_split_null_key_gets_null_label(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    out = {r.k: r.split for r in hash_split("k", {"a": 0.5, "b": 0.5})(df).collect()}
    assert out[None] is None          # never silently lands in 'b'
    assert out[1] in ("a", "b")


# --- _scaled_sum representability guard (ADVICE low) --------------------------
def test_scaled_sum_within_bound(spark):
    import __spark_entry__ as entry
    df = spark.createDataFrame([(1.5,), (2.25,)], "v double")
    row = df.agg(entry._scaled_sum(F.col("v"), 100).alias("s")).collect()[0]
    assert row.s == 3.75


def test_scaled_sum_empty_group_passes(spark):
    import __spark_entry__ as entry
    df = spark.createDataFrame([], "v double")
    row = df.agg(entry._scaled_sum(F.col("v"), 100).alias("s")).collect()[0]
    assert row.s is None


def test_scaled_sum_overflow_raises(spark):
    import __spark_entry__ as entry
    df = spark.createDataFrame([(1e10,), (1e10,)], "v double")
    with pytest.raises(Exception, match="_scaled_sum"):
        df.agg(entry._scaled_sum(F.col("v"), 1_000_000).alias("s")).collect()


# --- ivf_search centroid plan (VERDICT wrong #1) ------------------------------
def _embeddings(spark, n=40, dim=4, cells=3):
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)], i % cells)
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_ivf_search_no_collect_list(spark):
    from conduino_spark import ivf_search
    df = _embeddings(spark)
    out = ivf_search([1.0, 2.0, -1.0, 0.5], k=5, cell_col="label", nprobe=2)(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, \
        "centroids must aggregate per (cell, dim), never buffer whole cells"
    assert "TakeOrderedAndProject" in plan


def test_ivf_search_matches_bruteforce_on_probed_cells(spark):
    from conduino_spark import ivf_search
    from conduino_spark.operators.similarity import cosine_to
    df = _embeddings(spark)
    q = [1.0, 2.0, -1.0, 0.5]
    got = [(r.vec_id, r.cosine) for r in
           ivf_search(q, k=5, cell_col="label", nprobe=3)(df).collect()]
    # nprobe = all cells → identical to exact brute force
    brute = (cosine_to(q)(df).select("vec_id", "cosine")
             .orderBy(F.desc("cosine"), "vec_id").limit(5).collect())
    assert got == [(r.vec_id, r.cosine) for r in brute]


def test_ivf_search_accepts_trained_centroids(spark):
    from conduino_spark import ivf_search
    df = _embeddings(spark)
    q = [1.0, 2.0, -1.0, 0.5]
    cents = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [-1.0, -1.0, -1.0, -1.0]),
         (2, [0.0, 0.0, 0.0, 0.0])],
        "label int, centroid array<double>")
    out = ivf_search(q, k=5, cell_col="label", nprobe=1, centroids=cents)(df)
    # cell 0 has the most q-aligned centroid; all hits come from it
    assert all(r.vec_id % 3 == 0 for r in out.collect())
