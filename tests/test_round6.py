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
