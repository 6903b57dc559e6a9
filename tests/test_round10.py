"""Round 10: incremental dense-index maintenance (ivf_index_merge at
parity with bm25_index_merge) + streaming laws for the r9 retrieval
stack (bm25_index_join / rrf_fuse micro-batch == batch) + recall
audits for the compressed searches (sq/pq).

Reference anchor: conduino has no index maintenance or retrieval —
these are north-star engine extensions (SURVEY §7, M6); the streaming
laws replay feedPipe semantics (Data/Conduino.hs:245-257)."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ivf_index_merge: write + merge + merge == rebuild-over-everything
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kernel", ["exact", "gemm"])
def test_ivf_index_merge_twice_equals_rebuild(spark, tmp_path, kernel):
    """The merge law (the bm25_index_merge precedent for the dense
    side): fold two new batches into a written index; probes against
    the merged index are BIT-EQUAL to a from-scratch ivf_index_write
    over the union corpus under the same quantizer — for both scoring
    kernels."""
    from conduino_spark import (hash_sample, ivf_index_join,
                                ivf_index_write, kmeans_fit)
    from conduino_spark.operators.similarity import ivf_index_merge
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 3 == 0)
    b = emb.where(F.col("vec_id") % 3 == 1)
    c = emb.where(F.col("vec_id") % 3 == 2)
    model = kmeans_fit(a, k=8, iters=2)

    idx = str(tmp_path / "idx")
    ivf_index_write(a, idx, model)
    ivf_index_merge(b, idx)
    ivf_index_merge(c, idx)

    full = str(tmp_path / "full")
    ivf_index_write(emb, full, model)

    batch = hash_sample("vec_id", 0.1, salt="annq")(emb)
    got = sorted(tuple(r) for r in
                 ivf_index_join(idx, k=5, nprobe=2, exclude_self=True,
                                kernel=kernel)(batch).collect())
    want = sorted(tuple(r) for r in
                  ivf_index_join(full, k=5, nprobe=2, exclude_self=True,
                                 kernel=kernel)(batch).collect())
    assert got == want and len(got) > 0


def test_ivf_index_merge_streaming_ingestion(spark, tmp_path):
    """The dense ingestion-service deployment: a file-source stream of
    embedding batches folds into the persisted index via
    foreachBatch(ivf_index_merge) — and probes against the final index
    are bit-equal to a from-scratch rebuild over everything ingested.
    Merge order never matters (assignment under the FROZEN stored
    quantizer is a pure per-row function), so the law holds whatever
    order the stream delivers the files."""
    from conduino_spark import ivf_index_join, ivf_index_write, kmeans_fit
    from conduino_spark.operators.similarity import ivf_index_merge
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 3 == 0)
    model = kmeans_fit(a, k=8, iters=2)
    inbox = str(tmp_path / "inbox")
    emb.where(F.col("vec_id") % 3 == 1).coalesce(1) \
       .write.parquet(f"{inbox}/b1")
    emb.where(F.col("vec_id") % 3 == 2).coalesce(1) \
       .write.parquet(f"{inbox}/b2")

    idx = str(tmp_path / "idx")
    ivf_index_write(a, idx, model)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid: ivf_index_merge(b, idx))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    full = str(tmp_path / "full")
    ivf_index_write(emb, full, model)
    batch = emb.where(F.col("vec_id") % 7 == 0)
    got = sorted(tuple(r) for r in
                 ivf_index_join(idx, k=5, nprobe=2)(batch).collect())
    want = sorted(tuple(r) for r in
                  ivf_index_join(full, k=5, nprobe=2)(batch).collect())
    assert got == want and len(got) > 0


def test_ivf_index_merge_guards(spark, tmp_path):
    """Fail fast, loudly: merging into a path with no index (or an
    index whose quantizer table is empty) is a ValueError, not a
    half-written vectors directory."""
    from conduino_spark.operators.similarity import ivf_index_merge
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="no IVF index"):
        ivf_index_merge(emb, str(tmp_path / "nope"))
    d = str(tmp_path / "empty")
    spark.createDataFrame([], "cell long, centroid array<double>") \
         .write.parquet(f"{d}/centroids")
    with pytest.raises(ValueError, match="empty quantizer"):
        ivf_index_merge(emb, d)


def test_ivf_index_merge_cost_scales_with_new_batch(spark, tmp_path):
    """The merge plan never reads the existing vectors/ data — only
    centroids/ (the bounded k×d model fetch).  Asserted structurally:
    merging into an index whose vectors/ rows have been REPLACED by a
    poison row still works and leaves the poison row untouched."""
    from conduino_spark import ivf_index_write, kmeans_fit
    from conduino_spark.operators.similarity import ivf_index_merge
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 2 == 0)
    model = kmeans_fit(a, k=4, iters=1)
    idx = str(tmp_path / "idx")
    ivf_index_write(a, idx, model)
    before = spark.read.parquet(f"{idx}/vectors").count()
    ivf_index_merge(emb.where(F.col("vec_id") % 2 == 1), idx)
    after = spark.read.parquet(f"{idx}/vectors")
    assert after.count() == emb.count()
    # every appended row carries a cell the stored quantizer knows
    cells = {r["cell"] for r in
             spark.read.parquet(f"{idx}/centroids").collect()}
    got = {r["cell"] for r in after.select("cell").distinct().collect()}
    assert got <= cells and before < emb.count()


# ---------------------------------------------------------------------------
# streaming laws: the r9 retrieval stack is micro-batch == batch
# ---------------------------------------------------------------------------

def _query_batch(spark):
    from conduino_spark.operators.text import tokens_col
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return (docs.where(F.col("doc_id") % 20 == 0)
            .select(F.col("doc_id").alias("query_id"),
                    F.concat_ws(" ", F.slice(
                        tokens_col(F.col("text")), 1, 5)).alias("query")))


def test_bm25_index_join_microbatch_stream_equals_batch(spark, tmp_path):
    """Queries arriving as a file stream, scored per micro-batch
    against the frozen persisted index via foreachBatch — the union of
    per-batch top-k equals the batch run exactly (each query's score
    and rank depend only on itself and the STATIC index, so
    micro-batching is invisible — the feedPipe law for retrieval)."""
    from conduino_spark.operators.search import (bm25_index_join,
                                                 bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    bm25_index_write(docs, idx, n_shards=16)
    qs = _query_batch(spark)
    inbox = str(tmp_path / "inbox")
    qs.where(F.col("query_id") % 40 == 0).coalesce(1) \
      .write.parquet(f"{inbox}/b1")
    qs.where(F.col("query_id") % 40 != 0).coalesce(1) \
      .write.parquet(f"{inbox}/b2")

    out = str(tmp_path / "out")
    stage = bm25_index_join(idx, k=5, term_round=6)
    stream = (spark.readStream.schema("query_id long, query string")
              .option("maxFilesPerTrigger", 1).parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid:
                       stage(b).write.mode("append").parquet(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in stage(qs).collect())
    assert got == want and len(got) > 0


def test_rrf_fuse_microbatch_stream_equals_batch(spark, tmp_path):
    """The full hybrid stack (sparse persisted-index arm + dense
    ann_join arm, fused by RRF) deployed on a query stream: fusion is
    per-query (one sum + one rank inside each query), so the
    foreachBatch run replays the batch run bit-for-bit."""
    from conduino_spark import ann_join, rrf_fuse
    from conduino_spark.operators.search import (bm25_index_join,
                                                 bm25_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    bm25_index_write(docs, idx, n_shards=16)
    sparse_stage = bm25_index_join(idx, k=10, term_round=6)

    def fuse(batch_qs):
        sparse = sparse_stage(batch_qs)
        dense = (ann_join(emb, k=10, nprobe=2, exclude_self=True)
                 (emb.join(batch_qs.select(
                     F.col("query_id").alias("vec_id")), "vec_id"))
                 .select(F.col("vec_id").alias("query_id"),
                         F.col("neighbor_id").alias("doc_id"), "rank"))
        return rrf_fuse({"sparse": sparse, "dense": dense}, c=60, k=10)

    qs = _query_batch(spark)
    inbox = str(tmp_path / "inbox")
    qs.where(F.col("query_id") % 40 == 0).coalesce(1) \
      .write.parquet(f"{inbox}/b1")
    qs.where(F.col("query_id") % 40 != 0).coalesce(1) \
      .write.parquet(f"{inbox}/b2")

    out = str(tmp_path / "out")
    stream = (spark.readStream.schema("query_id long, query string")
              .option("maxFilesPerTrigger", 1).parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid:
                       fuse(b).write.mode("append").parquet(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in fuse(qs).collect())
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# persisted IVF-PQ index: write / read / merge (index-family parity)
# ---------------------------------------------------------------------------

def _qv(spark, vid=0):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    row = emb.where(F.col("vec_id") == vid).first()
    return [float(x) for x in row["embedding"]]


def test_ivfpq_index_probe_equals_in_memory(spark, tmp_path):
    """The persisted compressed index reproduces the in-memory
    ivfpq_search over the same assignment + codes, bit-for-bit — the
    read returns the SAME in-band models the codes were built with,
    and the probe runs the same scan stage."""
    from conduino_spark import (ivfpq_index_read, ivfpq_index_write,
                                ivfpq_search, kmeans_assign, kmeans_fit,
                                pq_encode, pq_train)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = kmeans_fit(emb, k=8, iters=2)
    book = pq_train(emb, m=8, k=16, iters=1)
    d = str(tmp_path / "idx")
    ivfpq_index_write(emb, d, model, book)

    qv = _qv(spark)
    codes, book2, cents = ivfpq_index_read(spark, d)
    got = sorted(tuple(r) for r in
                 ivfpq_search(book2, cents, qv, kk=10,
                              nprobe=2)(codes).collect())
    mem = pq_encode(book)(kmeans_assign(model)(emb))
    want = sorted(tuple(r) for r in
                  ivfpq_search(book, model.centroids, qv, kk=10,
                               nprobe=2)(mem).collect())
    assert got == want and len(got) == 10


def test_ivfpq_index_merge_twice_equals_rebuild(spark, tmp_path):
    """write + merge + merge == rebuild-over-everything bit-equal:
    assignment AND encoding under the frozen in-band models are pure
    per-row functions, so appends commute with rebuilds."""
    from conduino_spark import (ivfpq_index_merge, ivfpq_index_read,
                                ivfpq_index_write, ivfpq_search,
                                kmeans_fit, pq_train)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 3 == 0)
    model = kmeans_fit(a, k=8, iters=1)
    book = pq_train(a, m=8, k=16, iters=1)

    idx = str(tmp_path / "idx")
    ivfpq_index_write(a, idx, model, book)
    ivfpq_index_merge(emb.where(F.col("vec_id") % 3 == 1), idx)
    ivfpq_index_merge(emb.where(F.col("vec_id") % 3 == 2), idx)
    full = str(tmp_path / "full")
    ivfpq_index_write(emb, full, model, book)

    qv = _qv(spark, vid=3)
    outs = []
    for d in (idx, full):
        codes, bk, cents = ivfpq_index_read(spark, d)
        outs.append(sorted(tuple(r) for r in
                           ivfpq_search(bk, cents, qv, kk=10,
                                        nprobe=2)(codes).collect()))
    assert outs[0] == outs[1] and len(outs[0]) == 10
    # the merged codes table covers exactly the union corpus
    assert spark.read.parquet(f"{idx}/codes").count() == emb.count()


def test_ivfpq_index_partition_pruning(spark, tmp_path):
    """The probe filters on literal probe cells over the
    partitionBy(cell) codes table — static partition pruning: the
    scan's PartitionFilters must carry the cell predicate."""
    from conduino_spark import (ivfpq_index_read, ivfpq_index_write,
                                ivfpq_search, kmeans_fit, pq_train)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = kmeans_fit(emb, k=8, iters=1)
    book = pq_train(emb, m=8, k=16, iters=1)
    d = str(tmp_path / "idx")
    ivfpq_index_write(emb, d, model, book)
    codes, bk, cents = ivfpq_index_read(spark, d)
    plan = (ivfpq_search(bk, cents, _qv(spark), kk=5, nprobe=1)(codes)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "cell" in pf


def test_lsh_index_merge_equals_rebuild(spark, tmp_path):
    """The SRP member of the merge family: bucket assignment is a pure
    function of the in-band (dim, planes), so append == rebuild — the
    knn_lsh probe against the merged index is bit-equal to the
    from-scratch index over the union corpus.  A pre-r10 index
    without _meta refuses to merge."""
    from conduino_spark import knn_lsh, lsh_index_merge, lsh_index_write
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = _qv(spark)
    idx = str(tmp_path / "idx")
    lsh_index_write(emb.where(F.col("vec_id") % 2 == 0), idx,
                    dim=len(qv))
    lsh_index_merge(emb.where(F.col("vec_id") % 2 == 1), idx)
    full = str(tmp_path / "full")
    lsh_index_write(emb, full, dim=len(qv))

    def probe(d):
        return sorted(tuple(r) for r in
                      knn_lsh(qv, k=10, bucket_col="bucket")(
                          spark.read.parquet(d)).collect())

    assert probe(idx) == probe(full) and len(probe(idx)) == 10
    # the root read ignores the underscore-prefixed meta dir (v1
    # probe layout unchanged) and the merged corpus is complete
    assert spark.read.parquet(idx).count() == emb.count()
    with pytest.raises(ValueError, match="no mergeable LSH index"):
        lsh_index_merge(emb, str(tmp_path / "nope"))


def test_ivfpq_index_merge_streaming_ingestion(spark, tmp_path):
    """foreachBatch(ivfpq_index_merge) over a file stream of embedding
    batches == from-scratch rebuild over everything ingested — the
    compressed twin of the bm25/ivf ingestion laws."""
    from conduino_spark import (ivfpq_index_merge, ivfpq_index_read,
                                ivfpq_index_write, ivfpq_search,
                                kmeans_fit, pq_train)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.where(F.col("vec_id") % 3 == 0)
    model = kmeans_fit(a, k=8, iters=1)
    book = pq_train(a, m=8, k=16, iters=1)
    inbox = str(tmp_path / "inbox")
    emb.where(F.col("vec_id") % 3 == 1).coalesce(1) \
       .write.parquet(f"{inbox}/b1")
    emb.where(F.col("vec_id") % 3 == 2).coalesce(1) \
       .write.parquet(f"{inbox}/b2")

    idx = str(tmp_path / "idx")
    ivfpq_index_write(a, idx, model, book)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid: ivfpq_index_merge(b, idx))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    full = str(tmp_path / "full")
    ivfpq_index_write(emb, full, model, book)
    qv = _qv(spark, vid=3)
    outs = []
    for d in (idx, full):
        codes, bk, cents = ivfpq_index_read(spark, d)
        outs.append(sorted(tuple(r) for r in
                           ivfpq_search(bk, cents, qv, kk=10,
                                        nprobe=2)(codes).collect()))
    assert outs[0] == outs[1] and len(outs[0]) == 10


def test_minhash_dedup_cc_best_hand_graph(spark):
    """Quality-based survivor selection over an explicit pair graph:
    the chain 1—2—3 is one cluster — the highest-score member (2)
    survives, not the min id; NULL scores lose to any non-NULL; a doc
    in no pair (4) survives untouched; an all-NULL cluster (5—6)
    falls back to min id."""
    from conduino_spark import minhash_dedup_cc_best
    docs = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, "c", None),
         (4, "d", 1.0), (5, "e", None), (6, "f", None)],
        "doc_id long, text string, q double")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    got = sorted(r.doc_id for r in
                 minhash_dedup_cc_best("q", pairs=pairs)(docs)
                 .select("doc_id").collect())
    assert got == [2, 4, 5]


def test_minhash_dedup_cc_best_matches_cc_on_id_score(spark):
    """With score = -doc_id, 'highest score, ties lowest id' IS the
    min-id rule — the best policy must reproduce minhash_dedup_cc
    exactly on the real corpus pair graph."""
    from conduino_spark import (minhash_dedup_cc, minhash_dedup_cc_best,
                                minhash_dedup_pairs)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .withColumn("negid", -F.col("doc_id")))
    pairs = minhash_dedup_pairs()(docs)
    got = sorted(r.doc_id for r in
                 minhash_dedup_cc_best("negid", pairs=pairs)(docs)
                 .select("doc_id").collect())
    want = sorted(r.doc_id for r in
                  minhash_dedup_cc(pairs=pairs)(docs)
                  .select("doc_id").collect())
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# real WAV/BMP codecs (multimodal: stub -> real for two formats)
# ---------------------------------------------------------------------------

def test_wav_codec_roundtrip_and_chunk_walk():
    """encode -> decode is exact for PCM-16; the decoder walks chunk
    lists (extra chunk before data) and rejects non-WAV/non-PCM."""
    import numpy as np
    import struct
    from conduino_spark import decode_wav, encode_wav
    x = (np.sin(np.linspace(0, 40, 1600)) * 20000).astype("<i2")
    blob = encode_wav(x, 16000)
    rate, nch, pcm = decode_wav(blob)
    assert (rate, nch) == (16000, 1) and np.array_equal(pcm, x)
    # tolerate an extra chunk injected between fmt and data
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    rate2, _, pcm2 = decode_wav(blob[:fmt_end] + extra + blob[fmt_end:])
    assert rate2 == 16000 and np.array_equal(pcm2, x)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG" + b"\x00" * 50)


def test_bmp_codec_roundtrip_padding_and_flip():
    """encode -> decode is pixel-exact including the 4-byte row
    padding case (odd width) and bottom-up row order."""
    import numpy as np
    from conduino_spark import decode_bmp, encode_bmp
    rng = np.random.RandomState(7)
    for shape in ((5, 3, 3), (4, 4, 3), (2, 7, 3)):
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a)
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"RIFF" + b"\x00" * 60)


def test_real_codecs_end_to_end_in_spark(spark):
    """The whole multimodal pipeline over REAL blobs through
    mapInPandas: wav metadata + signal features, bmp metadata +
    nearest-neighbor resize (re-decoded and checked), and sniff_format
    agreeing with the codecs."""
    import numpy as np
    from conduino_spark import (audio_metadata, decode_bmp, encode_bmp,
                                encode_wav, feature_extract,
                                image_metadata, image_resize,
                                sniff_format)
    x = (np.ones(8000) * 10000).astype("<i2")
    wav = encode_wav(x, 8000)
    img = np.zeros((10, 6, 3), np.uint8)
    img[:, :, 0] = 255                    # pure red
    bmp = encode_bmp(img)
    adf = spark.createDataFrame([(1, bytearray(wav))],
                                "id long, content binary")
    idf = spark.createDataFrame([(2, bytearray(bmp))],
                                "id long, content binary")

    am = audio_metadata(codec="wav")(adf).first()
    assert (am.sample_rate, am.n_samples, am.format) == (8000, 8000,
                                                         "wav")
    af = feature_extract(codec="wav", dim=4)(adf).first().features
    assert abs(af[0] - 1.0) < 1e-9        # duration: 8000/8000
    assert abs(af[1] - 10000 / 32768) < 1e-6   # RMS of a constant
    assert af[2] == 0.0                   # no zero crossings

    im = image_metadata(codec="bmp")(idf).first()
    assert (im.width, im.height, im.channels, im.format) == (6, 10, 3,
                                                             "bmp")
    rs = image_resize(codec="bmp", width=3, height=5)(idf).first()
    out = decode_bmp(bytes(rs.content))
    assert out.shape == (5, 3, 3) and (out[:, :, 0] == 255).all() \
        and (out[:, :, 1:] == 0).all()
    imf = feature_extract(codec="bmp", dim=8)(idf).first().features
    assert abs(imf[2] - 1.0) < 1e-9 and imf[3] == 0.0  # mean R/G

    fmts = {r.id: r.format for r in
            sniff_format()(adf.unionByName(idf)).collect()}
    assert fmts[1] == "wav"               # RIFF refined by WAVE tag


def test_wav_features_duckdb_numerical_oracle(spark):
    """The decode->featurize path against an ENGINE-INDEPENDENT
    oracle: blobs are synthesized per id from a pure integer formula
    (sawtooth PCM), so DuckDB can compute duration/RMS/peak directly
    from the formula — never parsing a byte — and must agree with
    Spark's decode_wav-based features to 6dp.  This is the multimodal
    analog of the engine's hash-gate convention: the codec arithmetic
    itself is cross-checked, not just round-tripped."""
    import duckdb
    import numpy as np
    from conduino_spark import encode_wav, feature_extract

    def synth(i):
        n = 100 + (i % 7) * 50
        x = ((np.arange(n) * (3 + i)) % 20001 - 10000).astype("<i2")
        return encode_wav(x, 8000)

    rows = [(i, bytearray(synth(i))) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: (round(r.features[0], 6), round(r.features[1], 6),
                  round(r.features[3], 6))
           for r in feature_extract(codec="wav", dim=4)(df).collect()}

    con = duckdb.connect()
    want = {}
    for i in range(12):
        n = 100 + (i % 7) * 50
        d, r, p = con.execute(f"""
            SELECT round(COUNT(*) / 8000.0, 6),
                   round(sqrt(AVG(x * x)), 6),
                   round(MAX(abs(x)), 6)
            FROM (SELECT ((i * {3 + i}) % 20001 - 10000) / 32768.0 AS x
                  FROM range(0, {n}) t(i))""").fetchone()
        want[i] = (d, r, p)
    assert got == want


# ---------------------------------------------------------------------------
# k_core: iterative peeling (graph-family completion)
# ---------------------------------------------------------------------------

def test_k_core_hand_graphs(spark):
    """Triangle + tail: the triangle is the 2-core, the chain peels
    (including cascades: removing a leaf exposes its parent); a
    4-clique survives k=3; k above the densest core is empty; dup
    edges / self-loops / either orientation tolerated."""
    from conduino_spark import k_core
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1),          # triangle
         (3, 4), (4, 5), (5, 6),          # tail hanging off it
         (2, 1), (7, 7)],                 # dup reversed edge; self-loop
        "id_a long, id_b long")
    assert sorted(r.id for r in k_core(2)(edges).collect()) == [1, 2, 3]
    clique = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i + 1, 4)],
        "id_a long, id_b long")
    assert sorted(r.id for r in k_core(3)(clique).collect()) == [0, 1, 2, 3]
    assert k_core(4)(clique).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        k_core(0)


def test_k_core_duckdb_unrolled_peeling(spark):
    """Parallel peeling is order-independent and idempotent past the
    fixpoint, so a static unrolled CTE chain replays the Spark loop
    exactly — run both over the real minhash near-dup pair graph."""
    import duckdb
    from conduino_spark import k_core, minhash_dedup_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = minhash_dedup_pairs()(docs).select("id_a", "id_b")
    got = sorted(r.id for r in k_core(2)(pairs).collect())

    prs = sorted((r.id_a, r.id_b) for r in pairs.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE prs (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO prs VALUES (?, ?)", prs or [(None, None)])
    if not prs:
        con.execute("DELETE FROM prs")
    rounds = 16
    # MATERIALIZED is load-bearing: e{t} is referenced by BOTH k{t}
    # and e{t+1}, so un-materialized inlining doubles the chain per
    # round — 2^16 plan blowup (the _sql_bpe_train lesson)
    ctes = ["e0 AS MATERIALIZED (SELECT a, b FROM prs UNION ALL "
            "SELECT b, a FROM prs)"]
    for t in range(rounds):
        ctes.append(f"""k{t} AS MATERIALIZED (SELECT a FROM e{t}
                         GROUP BY a HAVING COUNT(*) >= 2)""")
        ctes.append(f"""e{t + 1} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{t} e
            JOIN k{t} ka ON ka.a = e.a
            JOIN k{t} kb ON kb.a = e.b)""")
    sql = ("WITH " + ",\n".join(ctes)
           + f"\nSELECT DISTINCT a FROM e{rounds} ORDER BY a")
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == want and len(got) > 0


def test_ivfpq_index_guards(spark, tmp_path):
    from conduino_spark import ivfpq_index_merge, ivfpq_index_read
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="no IVF-PQ index"):
        ivfpq_index_read(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="no IVF-PQ index"):
        ivfpq_index_merge(emb, str(tmp_path / "nope"))
