"""The EIGHTH persisted index family: exact content-hash dedup
reference (exact_index_write / exact_index_merge /
dedup_exact_against) — merge==rebuild law both probe modes, clone
drop vs batch-internal keep, DuckDB bit replay, DPP plan assert,
guards, and the foreachBatch streaming ingestion law the seven
sibling families carry.

Reference anchor: conduino has no relational layer — north-star
engine extension (SURVEY §7, M6).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from conduino_spark import (dedup_exact_against, exact_index_merge,
                            exact_index_write)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _batch(docs):
    # genuinely fresh texts (doc_id suffix) + a guaranteed clone of a
    # reference doc
    clone = docs.where(F.col("doc_id") % 2 == 0).limit(1).select(
        F.lit(9_999_999).cast("long").alias("doc_id"),
        "text", "lang", "source", "n_chars")
    fresh = docs.where(F.col("doc_id") % 5 == 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" #"),
                 F.col("doc_id").cast("string")).alias("text"),
        "lang", "source", "n_chars")
    return fresh.unionByName(clone)


@pytest.mark.parametrize("broadcast_batch", [True, False])
def test_exact_merge_equals_rebuild(spark, tmp_path, broadcast_batch):
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    exact_index_write(docs.where(F.col("doc_id") % 2 == 0), idx,
                      n_shards=8)
    exact_index_merge(docs.where(F.col("doc_id") % 2 == 1), idx)
    full = str(tmp_path / "full")
    exact_index_write(docs, full, n_shards=8)
    batch = _batch(docs)
    got = sorted(r.doc_id for r in dedup_exact_against(
        idx, broadcast_batch=broadcast_batch)(batch).collect())
    want = sorted(r.doc_id for r in dedup_exact_against(
        full, broadcast_batch=broadcast_batch)(batch).collect())
    assert got == want
    assert 9_999_999 not in got            # the clone is dropped
    assert len(got) == batch.count() - 1   # everything else survives


def test_exact_against_duckdb_replay(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    exact_index_write(docs.where(F.col("doc_id") % 2 == 0), idx,
                      n_shards=4)
    batch = _batch(docs)
    got = sorted(r.doc_id for r in
                 dedup_exact_against(idx)(batch).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF}/documents.parquet'")
    want = [r[0] for r in con.execute("""
        WITH ref AS (SELECT md5(text) AS h FROM documents
                     WHERE doc_id % 2 = 0),
        batch AS (SELECT doc_id + 1000000 AS doc_id,
                         text || ' #' || CAST(doc_id AS VARCHAR) AS text
                  FROM documents WHERE doc_id % 5 = 3
                  UNION ALL
                  SELECT 9999999, text FROM (
                      SELECT text FROM documents
                      WHERE doc_id % 2 = 0
                      ORDER BY doc_id LIMIT 1))
        SELECT doc_id FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM ref
                          WHERE ref.h = md5(b.text))
        ORDER BY doc_id""").fetchall()]
    # the limit(1) clone row isn't deterministic in Spark; compare
    # on the fresh half exactly and the clone by membership
    assert [d for d in got if d != 9_999_999] == \
        [d for d in want if d != 9_999_999]
    assert (9_999_999 in got) == (9_999_999 in want)


def test_exact_against_keeps_batch_internal_dupes(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    exact_index_write(docs.where(F.col("doc_id") % 2 == 0), idx,
                      n_shards=4)
    twin = spark.createDataFrame(
        [(1, "a fresh never-indexed text"),
         (2, "a fresh never-indexed text")],
        "doc_id long, text string")
    got = sorted(r.doc_id for r in
                 dedup_exact_against(idx)(twin).collect())
    assert got == [1, 2]                   # dedup_exact's job, not ours


def test_exact_index_probe_prunes_shards(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    exact_index_write(docs.where(F.col("doc_id") % 2 == 0), idx,
                      n_shards=8)
    one = docs.where(F.col("doc_id") == 1)
    plan = (dedup_exact_against(idx)(one)
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan


def test_exact_index_guards(spark, tmp_path):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="no exact-dedup index"):
        exact_index_merge(docs, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="no exact-dedup index"):
        dedup_exact_against(str(tmp_path / "nope"))(docs).count()
    with pytest.raises(ValueError, match="n_shards"):
        exact_index_write(docs, str(tmp_path / "bad"), n_shards=0)


def test_exact_index_streaming_ingestion(spark, tmp_path):
    """foreachBatch(exact_index_merge) ingestion == one-shot build
    over everything ingested (the eight-family law)."""
    docs = _docs(spark)
    a = docs.where(F.col("doc_id") % 3 == 0)
    inbox = str(tmp_path / "inbox")
    docs.where(F.col("doc_id") % 3 == 1).coalesce(1) \
        .write.parquet(f"{inbox}/b1")
    docs.where(F.col("doc_id") % 3 == 2).coalesce(1) \
        .write.parquet(f"{inbox}/b2")
    idx = str(tmp_path / "idx")
    exact_index_write(a, idx, n_shards=8)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid: exact_index_merge(b, idx))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    exact_index_write(docs, full, n_shards=8)
    batch = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        "text", "lang", "source", "n_chars")
    got = sorted(r.doc_id for r in
                 dedup_exact_against(idx)(batch).collect())
    want = sorted(r.doc_id for r in
                  dedup_exact_against(full)(batch).collect())
    assert got == want
    assert got == []                       # every remapped doc is a clone
