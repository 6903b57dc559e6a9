"""Round-7 fixes: snapshot_diff under pipe composition (__seq) and
NULL-key payload fetch (ADVICE r6), source_overlap round-robin spread,
bench output budget, ingest_corpus_stream signature probe.
"""
import duckdb
import pytest
from pyspark.sql import functions as F

from conduino_spark import SEQ, run_pipe, sink_df, snapshot_diff, source_overlap
from conduino_spark.sources import read_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# snapshot_diff (ADVICE r6: __seq in composition; NULL-key payload rows)
# ---------------------------------------------------------------------------

def test_snapshot_diff_in_pipe_composition_drops_seq(spark):
    """Every read_table source attaches __seq; snapshot_diff must drop
    it like its siblings (cdc_apply) instead of raising when selecting
    df.columns from the plain old snapshot (ADVICE r6, medium)."""
    old = spark.read.parquet(f"{SF}/orders.parquet").limit(50)
    p = (read_table(SF, "orders")
         | snapshot_diff(old, "o_orderkey")
         | sink_df())
    out = run_pipe(p, spark)
    assert SEQ not in out.columns
    # everything past the first 50 orderkeys is 'added'
    assert out.where(F.col("change") == "added").count() > 0
    assert out.where(F.col("change") == "removed").count() == 0


def test_snapshot_diff_null_keys_survive_payload_fetch(spark):
    """NULL keys never equi-match: the old NULL-key row is 'removed',
    the new one 'added' — and BOTH must appear in the output (the
    payload fetch is null-safe; ADVICE r6, low)."""
    old = spark.createDataFrame(
        [(1, "a"), (None, "old-null"), (None, "old-null-2")],
        "id long, txt string")
    new = spark.createDataFrame(
        [(1, "a"), (None, "new-null"), (2, "b")],
        "id long, txt string")
    rows = sorted(((r.id, r.txt, r.change)
                   for r in snapshot_diff(old, "id")(new).collect()),
                  key=lambda t: (t[0] is None, t[0] or 0, t[1]))
    assert rows == [
        (2, "b", "added"),
        (None, "new-null", "added"),
        (None, "old-null", "removed"),
        (None, "old-null-2", "removed"),
    ]


# ---------------------------------------------------------------------------
# source_overlap spread (ADVICE r6: group col is low-cardinality)
# ---------------------------------------------------------------------------

def test_source_overlap_spreads_beyond_group_count(spark):
    """The pre-shingle exchange must be round-robin, not hash(source):
    2 sources on a 32-core box would otherwise run the tokenize+md5
    pass on 2 tasks."""
    df = spark.read.parquet(f"{SF}/documents.parquet") \
        .withColumn("source", (F.col("doc_id") % 2).cast("string"))
    out = source_overlap()(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan
    # and the result itself is still correct (oracle lives in round6c;
    # here just the 2-group shape)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["group_a"] < rows[0]["group_b"]


# ---------------------------------------------------------------------------
# ingest_corpus_stream fault posture (ADVICE r6: Spark-level probe,
# idempotent batch_id-scoped writes)
# ---------------------------------------------------------------------------

def _ingest_batch(spark, rows, batch_id, tmp_path):
    from conduino_spark.streaming import _ingest_one_batch
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _ingest_one_batch(df, batch_id,
                      out_dir=str(tmp_path / "kept"),
                      sig_dir=str(tmp_path / "sigs"),
                      cols=["doc_id", "text"], text_col="text",
                      id_col="doc_id", rules={"quality": (">=", 0.0)},
                      within_batch_dedup=True)


def _kept_ids(spark, tmp_path):
    out = str(tmp_path / "kept")
    return sorted(r.doc_id for r in
                  spark.read.option("basePath", out).parquet(out)
                  .select("doc_id").collect())


def test_ingest_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a COMPLETED batch with
    the same batch_id must neither duplicate its docs (old append-mode
    bug) nor dedup the batch against its own signatures and vanish."""
    docs = [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .orderBy("doc_id").limit(30).collect()]
    _ingest_batch(spark, docs[:15], 0, tmp_path)
    first = _kept_ids(spark, tmp_path)
    assert len(first) > 0
    _ingest_batch(spark, docs[:15], 0, tmp_path)     # the retry
    assert _kept_ids(spark, tmp_path) == first       # no dupes, no loss


def test_ingest_cross_batch_dedup_via_spark_probe(spark, tmp_path, monkeypatch):
    """Cross-batch dedup must key off a SPARK read of sig_dir, never a
    driver-local os.path probe (which is always False on s3/hdfs).  The
    listdir tripwire guards against the old code path coming back."""
    import conduino_spark.streaming as st

    def _no_listdir(path):
        raise AssertionError(f"driver-local listdir probe on {path}")

    monkeypatch.setattr(st.os, "listdir", _no_listdir)
    docs = [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .orderBy("doc_id").limit(30).collect()]
    _ingest_batch(spark, docs[:15], 0, tmp_path)
    n0 = len(_kept_ids(spark, tmp_path))
    # batch 1: 10 fresh + 3 exact copies of batch-0 texts under new ids
    copies = [(9000 + i, docs[i][1]) for i in range(3)]
    _ingest_batch(spark, docs[15:25] + copies, 1, tmp_path)
    ids = _kept_ids(spark, tmp_path)
    assert not any(i >= 9000 for i in ids)   # cross-batch dedup fired
    assert len(ids) > n0                     # fresh docs were kept


# ---------------------------------------------------------------------------
# bpe_train driver-local fast path (VERDICT r6 #5)
# ---------------------------------------------------------------------------

def test_bpe_train_local_path_equals_distributed(spark):
    """The collected-vocab Python learner and the per-merge Spark loop
    must produce the IDENTICAL merge list — selection ties, overlap
    counting, min_count stop, everything."""
    from conduino_spark import bpe_train
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    fast = bpe_train(docs, n_merges=25, min_count=2)
    slow = bpe_train(docs, n_merges=25, min_count=2,
                     local_vocab_limit=0)   # force the distributed loop
    assert fast == slow and len(fast) == 25


def test_bpe_train_local_path_early_stop(spark):
    from conduino_spark import bpe_train
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    # only 'ab' reaches min_count=2; 'cd' pairs stop the loop early
    merges = bpe_train(df, n_merges=10, min_count=2)
    assert merges == [("a", "b")]


# ---------------------------------------------------------------------------
# bigram_logprob term_round (the r7 gate's exact-mean mode)
# ---------------------------------------------------------------------------

def test_bigram_term_round_tracks_full_precision(spark):
    """term_round=4 (scaled-long exact mean — order-free, the driver
    gate mode) must agree with the full-precision avg to the rounding
    granularity, and NULL exactly where it NULLs."""
    from conduino_spark import bigram_logprob, bigram_vocab, unigram_vocab
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    uni, big = unigram_vocab()(docs), bigram_vocab()(docs)
    full = {r.doc_id: r.bigram_logprob_per_token
            for r in bigram_logprob(big, uni)(docs).collect()}
    gate = {r.doc_id: r.bigram_logprob_per_token
            for r in bigram_logprob(big, uni, term_round=4)(docs).collect()}
    assert set(full) == set(gate)
    for k in full:
        if full[k] is None:
            assert gate[k] is None
        else:
            assert abs(full[k] - gate[k]) < 5e-5

    import pytest as _pt
    with _pt.raises(ValueError):
        bigram_logprob(big, uni, term_round=0)


# ---------------------------------------------------------------------------
# plan audit: benign vs REAL cartesian classification (VERDICT r6 #6)
# ---------------------------------------------------------------------------

def _classify(df):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "plan_audit", "/root/repo/tools/plan_audit.py")
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)
    df.sparkSession.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return pa.classify_cartesians(
            df._jdf.queryExecution().executedPlan())
    finally:
        df.sparkSession.conf.set("spark.sql.adaptive.enabled", "true")


def test_plan_audit_flags_real_cartesian_not_bounds_join(spark):
    """A genuinely quadratic crossJoin must classify as REAL; the
    sanctioned 1-row-aggregate bounds join must stay benign."""
    li = spark.read.parquet(f"{SF}/orders.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    real = li.crossJoin(docs.select(F.col("doc_id").alias("d")))
    total, n_real = _classify(real)
    assert (total, n_real) == (1, 1)

    bound = docs.agg(F.max("doc_id").alias("mx"))
    benign = li.crossJoin(F.broadcast(bound)) \
               .where(F.col("o_orderkey") <= F.col("mx"))
    total, n_real = _classify(benign)
    assert total == 1 and n_real == 0

    # limit-1 side is also a provable bound
    benign2 = li.crossJoin(F.broadcast(docs.select("doc_id").limit(1)))
    total, n_real = _classify(benign2)
    assert total == 1 and n_real == 0
