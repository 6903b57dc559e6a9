"""Tests for the engine extensions: relational ops (SURVEY §2.7),
LLM-pipeline ops (dedup / similarity / text / multimodal), and the
effect layer (Lift mapping)."""

import pytest
from pyspark.sql import functions as F

from conduino_spark import (
    WriterTap, cosine_to, dedup_exact, distinct, embedding_near_dup_pairs,
    except_p, feature_extract, feedback_pipe, filter_, fingerprint,
    frame_sample, from_dataframe, group_agg, image_metadata, image_resize,
    join, knn_brute, knn_lsh, lang_id, lsh_bucket, minhash_dedup,
    minhash_dedup_pairs, ngram_jaccard_pairs, order_by, partition_errors,
    quality_score, ranked, read_table, run_pipe, run_state_p, simhash,
    simhash_dedup_pairs, sink_df, sink_list, source_list, token_count,
    tokenize, top_k, Stage,
)


def df_of(p, spark):
    return run_pipe(p, spark)


# ---- relational ---------------------------------------------------------

def test_join_group_agg(spark, sf_dir):
    orders = read_table(sf_dir, "orders", seq_col="o_orderkey")
    cust = read_table(sf_dir, "customer")
    p = (orders
         | join(cust, on=[F.expr("o_custkey = c_custkey")], broadcast=True)
         | group_agg(["c_mktsegment"], {"total": F.sum("o_totalprice"),
                                        "n": F.count(F.lit(1))})
         | sink_df())
    out = df_of(p, spark)
    rows = {r["c_mktsegment"]: r["n"] for r in out.collect()}
    assert sum(rows.values()) == 1500  # every order joined exactly once


def test_distinct_topk_ranked(spark, sf_dir):
    li = read_table(sf_dir, "lineitem")
    d = df_of(li | distinct(["l_returnflag"]) | sink_df(), spark)
    assert d.count() <= 3
    t = df_of(li | top_k(5, F.desc("l_extendedprice")) | sink_df(), spark)
    prices = [r["l_extendedprice"] for r in t.collect()]
    assert prices == sorted(prices, reverse=True) and len(prices) == 5
    r = df_of(li | ranked(["l_returnflag"], [F.desc("l_quantity")], top=2) | sink_df(), spark)
    assert r.groupBy("l_returnflag").count().agg(F.max("count")).collect()[0][0] <= 2


# ---- text analysis -------------------------------------------------------

def test_token_count_and_quality(spark, sf_dir):
    docs = read_table(sf_dir, "documents")
    out = df_of(docs | token_count() | quality_score() | sink_df(), spark)
    row = out.orderBy("doc_id").first()
    assert row["n_tokens"] > 0
    assert 0.0 <= row["quality"] <= 1.0


def test_lang_id_deterministic(spark):
    docs = source_list([
        {"doc_id": 1, "text": "the cat and the dog sat in the house"},
        {"doc_id": 2, "text": "der Hund und die Katze sind nicht da"},
        {"doc_id": 3, "text": "le chat et les chiens sont pour la maison"},
        {"doc_id": 4, "text": "xyzzy qwerty"},
    ])
    out = {r["doc_id"]: r["lang_pred"]
           for r in df_of(docs | lang_id() | sink_df(), spark).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_order_sensitive(spark):
    docs = source_list([
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "gamma beta alpha"},
        {"doc_id": 3, "text": "alpha beta gamma"},
    ])
    out = {r["doc_id"]: r["fingerprint"]
           for r in df_of(docs | fingerprint() | sink_df(), spark).collect()}
    assert out[1] == out[3] and out[1] != out[2]


# ---- dedup ----------------------------------------------------------------

def test_dedup_exact(spark):
    docs = source_list([
        {"doc_id": 1, "text": "hello world"},
        {"doc_id": 2, "text": "hello world"},
        {"doc_id": 3, "text": "different"},
    ])
    out = df_of(docs | dedup_exact() | sink_df(), spark)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_minhash_finds_near_dups(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest while birds sing songs")
    docs = source_list([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("green", "blue")},  # near-dup
        {"doc_id": 3, "text": "completely unrelated text about spark engines "
                              "processing massive distributed datasets quickly"},
    ])
    pairs = df_of(docs | minhash_dedup_pairs() | sink_df(), spark).collect()
    assert (1, 2) in [(r["id_a"], r["id_b"]) for r in pairs]
    kept = df_of(docs | minhash_dedup() | sink_df(), spark)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 1 in ids and 2 not in ids and 3 in ids


def test_simhash_and_jaccard(spark):
    base = ("streaming data pipelines need careful partitioning and "
            "shuffle management to scale across many executor nodes")
    docs = source_list([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("careful", "cautious")},
        {"doc_id": 3, "text": "pelicans fly south for winter wearing hats"},
    ])
    sh = df_of(docs | simhash() | sink_df(), spark).collect()
    assert len(sh) == 3 and all(r["simhash"] >= 0 for r in sh)
    pairs = df_of(docs | simhash_dedup_pairs(max_hamming=6) | sink_df(), spark).collect()
    assert (1, 2) in [(r["id_a"], r["id_b"]) for r in pairs]
    jac = df_of(docs | ngram_jaccard_pairs(threshold=0.3) | sink_df(), spark).collect()
    assert [(r["id_a"], r["id_b"]) for r in jac] == [(1, 2)]


def test_embedding_near_dup_and_knn(spark):
    vecs = source_list([
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0], "label": 0},
        {"vec_id": 2, "embedding": [0.99, 0.01, 0.0], "label": 0},
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0], "label": 1},
        {"vec_id": 4, "embedding": [0.0, 0.98, 0.1], "label": 1},
    ])
    pairs = df_of(vecs | embedding_near_dup_pairs(threshold=0.95) | sink_df(), spark).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (3, 4) in got and (1, 3) not in got
    knn = df_of(vecs | knn_brute([1.0, 0.0, 0.0], k=2) | sink_df(), spark).collect()
    assert [r["vec_id"] for r in knn] == [1, 2]


def test_knn_lsh_agrees_with_brute_on_testdata(spark, sf_dir):
    emb = read_table(sf_dir, "embeddings")
    q = emb.df(spark).orderBy("vec_id").first()["embedding"]
    q = [float(x) for x in q]
    brute = df_of(emb | knn_brute(q, k=5) | sink_df(), spark).collect()
    ann = df_of(emb | knn_lsh(q, k=5) | sink_df(), spark).collect()
    # ANN must at least find the exact-match head of the brute list
    assert ann[0]["vec_id"] == brute[0]["vec_id"]
    assert ann[0]["cosine"] == pytest.approx(1.0, abs=1e-4)


# ---- multimodal plumbing ---------------------------------------------------

def test_multimodal_stubs(spark):
    blobs = source_list([
        {"id": 1, "content": b"fake-image-bytes-aaa"},
        {"id": 2, "content": b"fake-image-bytes-bbb"},
    ])
    meta = df_of(blobs | image_metadata() | sink_df(), spark)
    assert meta.columns == ["id", "width", "height", "channels", "format", "n_bytes"]
    m = {r["id"]: r for r in meta.collect()}
    assert m[1]["n_bytes"] == 20 and m[1]["width"] >= 64
    rs = df_of(blobs | image_resize(width=128, height=96) | sink_df(), spark).collect()
    assert all(r["width"] == 128 and len(r["content"]) == 16 for r in rs)
    fr = df_of(blobs | frame_sample() | sink_df(), spark)
    assert fr.columns == ["id", "frame_no", "frame"] and fr.count() >= 2
    fe = df_of(blobs | feature_extract(dim=8) | sink_df(), spark).collect()
    assert all(len(r["features"]) == 8 for r in fe)
    # determinism: same bytes → same features
    fe2 = df_of(blobs | feature_extract(dim=8) | sink_df(), spark).collect()
    assert sorted(map(str, fe)) == sorted(map(str, fe2))


def test_audio_metadata_stub(spark):
    from conduino_spark import audio_metadata
    blobs = source_list([
        {"id": 1, "content": b"fake-audio-bytes-aaa"},
        {"id": 2, "content": b"fake-audio-bytes-bbb"},
        {"id": 3, "content": None},
    ])
    meta = df_of(blobs | audio_metadata() | sink_df(), spark)
    assert meta.columns == ["id", "sample_rate", "n_samples", "format"]
    rows = {r["id"]: r for r in meta.collect()}
    assert len(rows) == 3
    assert rows[1]["sample_rate"] in (8000, 16000, 22050, 44100, 48000)
    assert rows[1]["n_samples"] >= 1
    # determinism
    again = {r["id"]: tuple(r) for r in
             df_of(blobs | audio_metadata() | sink_df(), spark).collect()}
    assert again == {k: tuple(v) for k, v in rows.items()}
    with pytest.raises(Exception, match="NotImplementedError|real audio"):
        df_of(blobs | audio_metadata(codec="real") | sink_df(),
              spark).collect()


def test_multimodal_real_codec_raises(spark):
    blobs = source_list([{"id": 1, "content": b"x"}])
    with pytest.raises(Exception, match="NotImplementedError|real image codecs"):
        df_of(blobs | image_metadata(codec="real") | sink_df(), spark).collect()


# ---- effect layer -----------------------------------------------------------

def test_writer_tap(spark):
    tap = WriterTap({"n": F.count(F.lit(1)), "s": F.sum("v")})
    p = source_list(range(1, 11)) | tap.stage() | sink_list()
    assert run_pipe(p, spark) == list(range(1, 11))
    log = tap.log()
    assert log["n"] == 10 and log["s"] == 55


def test_except_p_dead_letter(spark):
    def risky(x):
        if x == 3:
            raise ValueError("poison")
        return x * 2.0

    p = source_list([1, 2, 3, 4]) | except_p(risky) | sink_df()
    ok, dead = partition_errors(run_pipe(p, spark))
    assert sorted(r["v"] for r in ok.collect()) == [2.0, 4.0, 8.0]
    d = dead.collect()
    assert len(d) == 1 and "ValueError: poison" in d[0]["__err"]


def test_run_state_p(spark):
    # stage-local state: running count of elements seen
    p = (source_list([5, 5, 5])
         | run_state_p(lambda v, s: (s + 1, s + 1), 0, returns="long")
         | sink_list())
    assert run_pipe(p, spark) == [1, 2, 3]


def test_feedback_pipe_fixpoint(spark):
    # halve every element, keep those > 1: iterates to fixpoint
    halve = Stage(lambda df: df.where(F.col("v") > 1).withColumn("v", F.col("v") / 2),
                  name="halve")
    src = source_list([8.0, 3.0])
    out = feedback_pipe(halve, src, spark, max_iters=10)
    # rounds: {8,3}→{4,1.5}→{2,0.75}→{1}→∅ ; output = union of rounds
    vals = sorted(r["v"] for r in out.collect())
    assert vals == [0.75, 1.0, 1.5, 2.0, 4.0]


def test_lift_completeness(spark):
    from conduino_spark import (eval_state_p, exec_state_p, map_,
                                run_except_p_, rws_p, run_pipe, sink_list,
                                source_list)

    p = (source_list([5, 5])
         | eval_state_p(lambda v, s: (s + v, s + v), 0, returns="long")
         | sink_list())
    assert run_pipe(p, spark) == [5, 10]

    assert exec_state_p(lambda v, s: s + v, 0, [1, 2, 3]) == 6

    def risky(x):
        if x == 2:
            raise ValueError("x")
        return float(x)

    p2 = source_list([1, 2, 3]) | run_except_p_(risky) | sink_list()
    assert run_pipe(p2, spark) == [1.0, 3.0]

    stage, tap = rws_p({"mult": 3},
                       lambda env: map_(F.col("v") * env["mult"], name="m"),
                       {"n": F.count(F.lit(1))})
    out = run_pipe(source_list([1, 2]) | stage | sink_list(), spark)
    assert out == [3, 6] and tap.log()["n"] == 2
