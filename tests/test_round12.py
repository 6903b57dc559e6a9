"""Round 12: ADVICE r11 codec defect regressions (FLAC escape raw
width, GIF disposal-2 background color table, WAV 'fact' sample-count
truncation, JPEG non-interleaved single-component scans), the
multimodal driver-gate pin's underlying law, and the dup-span window
index family.

Reference anchor: conduino has no codecs or indexes — north-star
engine extensions (SURVEY §7, M6)."""

import struct
import sys
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# FLAC: escape partitions size their raw width from the residual range
# ---------------------------------------------------------------------------

def test_flac_escape_raw_width_sized_to_residuals():
    """ADVICE r11 (medium): the escape path hard-coded 17-bit raw
    residuals; explicit-LPC residuals near 2^30 truncated and the
    'lossless' stream decoded to garbage.  The width now covers the
    actual signed range."""
    from conduino_spark.operators.flac import decode_flac, encode_flac
    rng = np.random.RandomState(7)
    x = rng.randint(-32768, 32768, 4096).astype(np.int16)
    # residual magnitude ~2 * 16000 * 32768 ~ 2^30: escape triggers,
    # raw width must be 31 (17 truncated before the fix)
    blob = encode_flac(x, 16000, lpc=([16000, -16000], 0))
    sr, nch, y = decode_flac(blob)
    assert sr == 16000 and nch == 1
    assert np.array_equal(y, x)


def test_flac_escape_raises_when_residuals_exceed_31_bits():
    """Residuals wider than the 5-bit raw field can express (31 bits)
    raise at encode time instead of writing a corrupt stream."""
    from conduino_spark.operators.flac import encode_flac
    rng = np.random.RandomState(7)
    x = rng.randint(-32768, 32768, 4096).astype(np.int16)
    with pytest.raises(ValueError, match="escape residuals"):
        encode_flac(x, 16000, lpc=([16000, -16000, 12000, -9000], 0))


# ---------------------------------------------------------------------------
# GIF: disposal-2 background restore uses the GLOBAL color table
# ---------------------------------------------------------------------------

def _tiny_gif_disposal2_small_lct() -> bytes:
    """2x2 GIF: global table of 4 colors with bg index 3; frame 1
    carries a 2-entry LOCAL table and disposal 2 (the ADVICE r11
    IndexError shape); frame 2 paints all four global colors."""
    from conduino_spark.operators.gif import _lzw_encode, _sub_blocks
    gct = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | (1 << 4) | 1, 3, 0)
    out += gct
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 2 << 2, 4, 0) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80)
    out += bytes([1, 2, 3, 4, 5, 6])          # 2-entry local table
    out.append(2)
    out += _sub_blocks(_lzw_encode(2, bytes([0, 1, 1, 0])))
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, 4, 0) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(2)
    out += _sub_blocks(_lzw_encode(2, bytes([0, 1, 2, 3])))
    out += b"\x3b"
    return bytes(out)


def test_gif_disposal2_with_small_local_color_table():
    """ADVICE r11 (low): disposal-2 indexed the CURRENT frame's color
    table with the GLOBAL background index — a local table smaller
    than bg crashed with IndexError.  The background color comes from
    the global table."""
    from conduino_spark.operators.gif import decode_gif
    frames, delays = decode_gif(_tiny_gif_disposal2_small_lct())
    assert frames.shape == (2, 2, 2, 3)
    # frame 1 painted from the local table
    assert frames[0].reshape(-1, 3).tolist() == [
        [1, 2, 3], [4, 5, 6], [4, 5, 6], [1, 2, 3]]
    # frame 2 paints every global color over the restored background
    assert frames[1].reshape(-1, 3).tolist() == [
        [10, 20, 30], [40, 50, 60], [70, 80, 90], [200, 210, 220]]


def test_gif_disposal2_background_color_is_global():
    """With NO second image drawn over it, the disposal-2 restore
    itself must show the GLOBAL table's bg color (partial-frame
    frame 2 leaves the restored area visible)."""
    from conduino_spark.operators.gif import (_lzw_encode, _sub_blocks,
                                              decode_gif)
    gct = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | (1 << 4) | 1, 3, 0)
    out += gct
    # frame 1: full canvas, local 2-entry table, disposal 2
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 2 << 2, 4, 0) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80)
    out += bytes([1, 2, 3, 4, 5, 6])
    out.append(2)
    out += _sub_blocks(_lzw_encode(2, bytes([0, 1, 1, 0])))
    # frame 2: 1x1 sub-rectangle at (0,0) — rest of canvas shows the
    # disposal-2 restored background
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, 4, 0) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
    out.append(2)
    out += _sub_blocks(_lzw_encode(2, bytes([0])))
    out += b"\x3b"
    frames, _ = decode_gif(bytes(out))
    assert frames[1][0, 0].tolist() == [10, 20, 30]       # drawn pixel
    assert frames[1][1, 1].tolist() == [200, 210, 220]    # gct[bg]


# ---------------------------------------------------------------------------
# WAV: 'fact' chunk carries the true sample count
# ---------------------------------------------------------------------------

def test_wav_ima_fact_chunk_truncates_block_padding():
    """ADVICE r11 (low): IMA ADPCM decode returned the encoder's
    final-block zero padding as samples.  encode_wav now writes a
    'fact' chunk and decode_wav truncates to it — decode(encode(x))
    has EXACTLY len(x) samples for every compressed format."""
    from conduino_spark.operators.multimodal import decode_wav, encode_wav
    rng = np.random.RandomState(3)
    for n in (1, 5, 252, 253, 1013):          # never block-aligned
        x = rng.randint(-3000, 3000, n).astype(np.int16)
        for fmt in ("ima", "alaw", "mulaw"):
            sr, nch, y = decode_wav(encode_wav(x, 8000, fmt=fmt))
            assert len(y) == n, (fmt, n, len(y))
    # PCM-16 unchanged: bit-exact, no fact chunk required
    x = rng.randint(-3000, 3000, 777).astype(np.int16)
    blob = encode_wav(x, 8000)
    assert b"fact" not in blob[:60]
    assert np.array_equal(decode_wav(blob)[2], x)


def test_wav_fact_chunk_absent_still_decodes():
    """Blobs from pre-r12 writers (no 'fact') still decode — the
    padding tail is kept, matching the old length contract."""
    from conduino_spark.operators.multimodal import decode_wav, encode_wav
    x = np.arange(-500, 500, dtype=np.int16)
    blob = encode_wav(x, 8000, fmt="ima")
    # strip the fact chunk (8 header + 4 body bytes) to simulate r11
    i = blob.find(b"fact")
    assert i > 0
    stripped = bytearray(blob[:i] + blob[i + 12:])
    struct.pack_into("<I", stripped, 4, len(stripped) - 8)
    sr, nch, y = decode_wav(bytes(stripped))
    assert len(y) >= len(x)
    assert np.array_equal(y[: len(x)], decode_wav(blob)[2])


def test_wav_metadata_reports_true_ima_sample_count(spark):
    """audio_metadata over fmt 0x11 blobs reports the encoded count,
    not the padded one."""
    from conduino_spark.operators.multimodal import (audio_metadata,
                                                     encode_wav)
    x = np.arange(-500, 513, dtype=np.int16)      # 1013 samples
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(x, 8000, fmt="ima")))],
        "id long, content binary")
    row = audio_metadata(codec="wav")(df).first()
    assert row.n_samples == 1013


# ---------------------------------------------------------------------------
# JPEG: single-component scans are non-interleaved
# ---------------------------------------------------------------------------

def test_jpeg_grayscale_ignores_sof_sampling_factors():
    """ADVICE r11 (low): per T.81 A.2.2 a 1-component scan uses one
    8x8 block per MCU row-major, ignoring SOF sampling factors — a
    grayscale JPEG declaring 2x2 sampling must decode identically to
    the 1x1 declaration, not with scrambled block order."""
    from conduino_spark.operators.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 24, 1)).astype(np.uint8)
    blob = encode_jpeg(img, quality=95)
    ref = decode_jpeg(blob)
    b = bytearray(blob)
    i = b.find(b"\xff\xc0")
    hv_off = i + 11        # marker(2)+len(2)+prec(1)+h(2)+w(2)+ncomp(1)
    #                        +compid(1) -> sampling byte of component 1
    assert b[hv_off] == 0x11
    b[hv_off] = 0x22
    out = decode_jpeg(bytes(b))
    assert np.array_equal(out, ref)


# ---------------------------------------------------------------------------
# media_profile: exact integer media stats (the r12 gate-arm operator)
# ---------------------------------------------------------------------------

def test_media_profile_mixed_dispatch(spark):
    """One pass over a MIXED media column: sniff_format detects the
    container, media_profile dispatches per row and emits exact
    integer stats; junk rows land as format='error' zeros instead of
    aborting the batch."""
    from conduino_spark import (encode_png, encode_wav, media_profile,
                                sniff_format)
    x = ((np.arange(200, dtype=np.int64) * 5) % 20001 - 10000) \
        .astype("<i2")
    img = ((np.arange(9 * 7 * 3, dtype=np.int64) * 3) % 251) \
        .astype(np.uint8).reshape(9, 7, 3)
    rows = [(1, bytearray(encode_wav(x, 8000))),
            (2, bytearray(encode_png(img, filter_type=2))),
            (3, bytearray(b"\x00\x01junk"))]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: r for r in media_profile(codec_col="format")(
        sniff_format("content")(df)).collect()}
    a = np.abs(x.astype(np.int64))
    assert (got[1].format, got[1].n_units, got[1].meta,
            got[1].sum_abs, got[1].max_abs) == (
        "wav", 200, 80001, int(a.sum()), int(a.max()))
    assert (got[2].format, got[2].n_units, got[2].meta,
            got[2].sum_abs, got[2].max_abs) == (
        "png", 9 * 7 * 3, 9_007_003, int(img.sum()), int(img.max()))
    assert (got[3].format, got[3].n_units, got[3].sum_abs) == \
        ("error", 0, 0)


def test_media_profile_homogeneous_and_validation(spark):
    """codec= profiles a homogeneous column without a format column;
    passing both/neither raises; flac audio and tiff images dispatch
    through the same stats contract."""
    from conduino_spark import media_profile
    from conduino_spark.operators.flac import encode_flac
    from conduino_spark.operators.tiff import encode_tiff
    x = (np.sin(np.linspace(0, 9, 333)) * 12345).astype(np.int16)
    img = ((np.arange(6 * 5 * 3) * 7) % 256).astype(np.uint8) \
        .reshape(6, 5, 3)
    adf = spark.createDataFrame(
        [(1, bytearray(encode_flac(x, 16000)))], "id long, content binary")
    idf = spark.createDataFrame(
        [(2, bytearray(encode_tiff(img)))], "id long, content binary")
    fa = media_profile(codec="flac")(adf).first()
    assert (fa.format, fa.n_units, fa.meta) == ("flac", 333, 160001)
    assert fa.sum_abs == int(np.abs(x.astype(np.int64)).sum())
    ti = media_profile(codec="tiff")(idf).first()
    assert (ti.format, ti.n_units, ti.meta, ti.sum_abs) == (
        "tiff", 90, 6_005_003, int(img.sum()))
    with pytest.raises(ValueError, match="exactly one"):
        media_profile()
    with pytest.raises(ValueError, match="exactly one"):
        media_profile(codec="png", codec_col="format")


def test_media_profile_stats_merge_downstream(spark):
    """The per-blob integer stats are mergeable with plain column
    algebra — a corpus-level media profile is one groupBy away (the
    100 TB posture: decode once, aggregate exactly)."""
    from pyspark.sql import functions as F
    from conduino_spark import encode_wav, media_profile
    rows = []
    sums = {}
    for i in range(6):
        n = 50 + 10 * i
        x = ((np.arange(n, dtype=np.int64) * (3 + i)) % 20001 - 10000) \
            .astype("<i2")
        rows.append((i, bytearray(encode_wav(x, 8000))))
        sums[i] = int(np.abs(x.astype(np.int64)).sum())
    df = spark.createDataFrame(rows, "id long, content binary")
    agg = media_profile(codec="wav")(df).groupBy("format").agg(
        F.sum("n_units").alias("units"),
        F.sum("sum_abs").alias("energy"),
        F.count("*").alias("n")).first()
    assert (agg.format, agg.n, agg.units) == ("wav", 6,
                                              sum(50 + 10 * i
                                                  for i in range(6)))
    assert agg.energy == sum(sums.values())


# ---------------------------------------------------------------------------
# dup-span window-key index: the SIXTH persisted index family
# ---------------------------------------------------------------------------

def test_dupspan_index_merge_equals_union_trim(spark, tmp_path):
    """write(half the reference) + merge(the other half) + trim the
    batch must rewrite EXACTLY as dup_span_trim over reference ∪ batch
    restricted to the batch rows (reference ids order first, so the
    corpus-global first copy always lives reference-side) — the
    merge == rebuild law for the dup-span family, full row equality
    (text, n_tokens, n_removed) not just survivors."""
    from pyspark.sql import functions as F
    from conduino_spark import (dup_span_trim, dup_span_trim_against,
                                dupspan_index_merge, dupspan_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ref = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    d = str(tmp_path / "ds")
    dupspan_index_write(ref.where(F.col("doc_id") % 2 == 0), d,
                        window_tokens=16, n_shards=8)
    dupspan_index_merge(ref.where(F.col("doc_id") % 2 == 1), d)
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed) for r in
           dup_span_trim_against(d)(batch).collect()}
    union = dup_span_trim(16)(ref.unionByName(batch))
    want = {r.doc_id: (r.text, r.n_tokens, r.n_removed) for r in
            union.where(F.col("doc_id") >= 250).collect()}
    assert got == want
    assert sum(1 for t in got.values() if t[2] > 0) > 0   # real trims
    assert sum(1 for t in got.values() if t[2] == 0) > 0  # untouched too
    # non-broadcast probe path: same rewrite
    got2 = {r.doc_id: (r.text, r.n_tokens, r.n_removed) for r in
            dup_span_trim_against(d, broadcast_batch=False)(batch)
            .collect()}
    assert got2 == want


def test_dupspan_index_probe_prunes_shards(spark, tmp_path):
    """The broadcast probe's key scan carries dynamic partition
    pruning on the shard directory column (the family posture)."""
    from pyspark.sql import functions as F
    from conduino_spark import dup_span_trim_against, dupspan_index_write
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "ds")
    dupspan_index_write(docs.where(F.col("doc_id") % 2 == 0), d,
                        window_tokens=16, n_shards=8)
    one = docs.where(F.col("doc_id") == 1)
    plan = (dup_span_trim_against(d)(one)
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan


def test_dupspan_index_guards(spark, tmp_path):
    from conduino_spark import (dup_span_trim_against, dupspan_index_merge,
                                dupspan_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="no dup-span index"):
        dupspan_index_merge(docs, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="no dup-span index"):
        dup_span_trim_against(str(tmp_path / "nope"))(docs).count()
    with pytest.raises(ValueError, match="n_shards"):
        dupspan_index_write(docs, str(tmp_path / "bad"), n_shards=0)
    with pytest.raises(ValueError, match="window_tokens"):
        dupspan_index_write(docs, str(tmp_path / "bad"), window_tokens=0)


def test_dupspan_index_streaming_ingestion(spark, tmp_path):
    """The daily-crawl ingestion loop: a file-source stream of kept
    batches folds into the key index via
    foreachBatch(dupspan_index_merge); trims against the final index
    equal trims against a one-shot build over everything ingested."""
    from pyspark.sql import functions as F
    from conduino_spark import (dup_span_trim_against,
                                dupspan_index_merge, dupspan_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where(F.col("doc_id") % 3 == 0)
    inbox = str(tmp_path / "inbox")
    docs.where(F.col("doc_id") % 3 == 1).coalesce(1) \
        .write.parquet(f"{inbox}/b1")
    docs.where(F.col("doc_id") % 3 == 2).coalesce(1) \
        .write.parquet(f"{inbox}/b2")
    idx = str(tmp_path / "idx")
    dupspan_index_write(a, idx, window_tokens=16, n_shards=8)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid: dupspan_index_merge(b, idx))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    dupspan_index_write(docs, full, window_tokens=16, n_shards=8)
    batch = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars")
    got = {r.doc_id: (r.text, r.n_removed) for r in
           dup_span_trim_against(idx)(batch).collect()}
    want = {r.doc_id: (r.text, r.n_removed) for r in
            dup_span_trim_against(full)(batch).collect()}
    assert got == want
    assert sum(1 for t in got.values() if t[1] > 0) > 0


def test_dup_span_trim_against_sql_replay(spark, tmp_path):
    """DuckDB bit-replay of the index probe with INTERLEAVED ids (ref
    = even docs, batch = odd docs — where the union-trim law doesn't
    apply): dup_span_trim_against_sql's direct semantics must match
    the Spark rewrite row for row."""
    import duckdb
    from pyspark.sql import functions as F
    from conduino_spark import dup_span_trim_against, dupspan_index_write
    from conduino_spark.operators.dedup import dup_span_trim_against_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "ds")
    dupspan_index_write(docs.where(F.col("doc_id") % 2 == 0), d,
                        window_tokens=16, n_shards=8)
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed) for r in
           dup_span_trim_against(d)(docs.where(F.col("doc_id") % 2 == 1))
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    sql = dup_span_trim_against_sql(
        16,
        batch="(SELECT * FROM documents WHERE doc_id % 2 = 1)",
        ref="(SELECT * FROM documents WHERE doc_id % 2 = 0)")
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(sql).fetchall()}
    assert got == want
    assert sum(1 for t in got.values() if t[2] > 0) > 0


# ---------------------------------------------------------------------------
# PNM + AIFF codecs (r12): netpbm interchange + big-endian audio
# ---------------------------------------------------------------------------

def test_pnm_roundtrip_and_validation():
    """Binary P5/P6 round-trip identity; header comments/whitespace
    per spec; ASCII / bitmap / 16-bit / truncation raise."""
    from conduino_spark import decode_pnm, encode_pnm
    img = ((np.arange(9 * 7 * 3) * 5) % 251).astype(np.uint8) \
        .reshape(9, 7, 3)
    assert np.array_equal(decode_pnm(encode_pnm(img)), img)
    g = img[:, :, 0]
    assert np.array_equal(decode_pnm(encode_pnm(g)), g[:, :, None])
    blob = b"P5\n# a comment\n 7   9 \n255\n" + g.tobytes()
    assert np.array_equal(decode_pnm(blob), g[:, :, None])
    with pytest.raises(ValueError, match="ASCII/bitmap"):
        decode_pnm(b"P2\n2 2\n255\n0 1 2 3")
    with pytest.raises(ValueError, match="16-bit"):
        decode_pnm(b"P5\n2 2\n65535\n" + bytes(8))
    with pytest.raises(ValueError, match="truncated netpbm raster"):
        decode_pnm(encode_pnm(img)[:-5])
    with pytest.raises(ValueError, match="not a netpbm"):
        decode_pnm(b"\x89PNG....")
    with pytest.raises(ValueError, match="encode_pnm wants"):
        encode_pnm(img[:, :, :2])


def test_aiff_roundtrip_and_validation():
    """AIFF round-trips mono + stereo int16 exactly, including the
    80-bit extended-float sample rate; odd-size chunk padding, frame
    truncation via COMM nframes; AIFC / other depths / junk raise."""
    from conduino_spark import decode_aiff, encode_aiff
    from conduino_spark.operators.multimodal import (_f80_pack,
                                                     _f80_unpack)
    for sr in (8000, 44100, 48000, 22050, 11025):
        assert _f80_unpack(_f80_pack(float(sr))) == float(sr)
    x = ((np.arange(1013) * 7) % 20001 - 10000).astype(np.int16)
    sr, nch, y = decode_aiff(encode_aiff(x, 44100))
    assert (sr, nch) == (44100, 1) and np.array_equal(y, x)
    xs = ((np.arange(2000) * 3) % 20001 - 10000).astype(np.int16)
    sr, nch, y = decode_aiff(encode_aiff(xs, 8000, 2))
    assert (sr, nch) == (8000, 2) and np.array_equal(y, xs)
    blob = bytearray(encode_aiff(x, 8000))
    blob[8:12] = b"AIFC"
    with pytest.raises(ValueError, match="AIFC"):
        decode_aiff(bytes(blob))
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="truncated AIFF"):
        decode_aiff(encode_aiff(x, 8000)[:-7])
    with pytest.raises(ValueError, match="samples not divisible"):
        encode_aiff(x, 8000, 2)


def test_pnm_aiff_operators_and_sniff(spark):
    """The new containers ride the standard dispatch: sniff_format
    tags P5/P6 and FORM/AIFF, media_profile and the metadata/feature
    operators decode them for real."""
    from conduino_spark import (audio_metadata, encode_aiff, encode_pnm,
                                image_metadata, media_profile,
                                sniff_format)
    img = ((np.arange(10 * 6 * 3) * 5) % 251).astype(np.uint8) \
        .reshape(10, 6, 3)
    x = ((np.arange(500) * 7) % 20001 - 10000).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_pnm(img))),
         (2, bytearray(encode_aiff(x, 8000)))],
        "id long, content binary")
    fmts = {r.id: r.format for r in sniff_format("content")(df).collect()}
    assert fmts == {1: "pnm", 2: "aiff"}
    prof = {r.id: r for r in media_profile(codec_col="format")(
        sniff_format("content")(df)).collect()}
    assert (prof[1].format, prof[1].n_units, prof[1].meta,
            prof[1].sum_abs) == ("pnm", 180, 10_006_003, int(img.sum()))
    assert (prof[2].format, prof[2].n_units, prof[2].meta) == \
        ("aiff", 500, 80001)
    assert prof[2].sum_abs == int(np.abs(x.astype(np.int64)).sum())
    im = image_metadata(codec="pnm")(
        df.where(F.col("id") == 1)).first()
    assert (im.width, im.height, im.channels) == (6, 10, 3)
    am = audio_metadata(codec="aiff")(
        df.where(F.col("id") == 2)).first()
    assert (am.sample_rate, am.n_samples) == (8000, 500)


# ---------------------------------------------------------------------------
# SimHash hamming-ball index: the SEVENTH persisted index family
# ---------------------------------------------------------------------------

def test_simhash_against_and_index_merge_law(spark, tmp_path):
    """write(half the reference) + merge(the other half) + probe must
    keep EXACTLY the docs simhash_dedup_against keeps vs the full
    reference (merge == rebuild for the hamming-ball family), both
    probe modes; clones of reference docs must drop."""
    from conduino_spark import (simhash_dedup_against,
                                simhash_index_dedup, simhash_index_merge,
                                simhash_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "sh")
    simhash_index_write(ref.where(F.col("doc_id") % 4 == 0), d,
                        n_shards=8)
    simhash_index_merge(ref.where(F.col("doc_id") % 4 == 2), d)
    got = sorted(r.doc_id for r in
                 simhash_index_dedup(d)(batch).select("doc_id").collect())
    want = sorted(r.doc_id for r in
                  simhash_dedup_against(ref)(batch)
                  .select("doc_id").collect())
    assert got == want and len(got) < batch.count()
    got2 = sorted(r.doc_id for r in
                  simhash_index_dedup(d, broadcast_batch=False)(batch)
                  .select("doc_id").collect())
    assert got2 == want
    # exact clones of indexed docs (hamming 0) always drop
    clones = ref.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
        "lang", "source", "n_chars")
    assert simhash_index_dedup(d)(clones).count() == 0


def test_simhash_index_probe_prunes_shards(spark, tmp_path):
    from conduino_spark import simhash_index_dedup, simhash_index_write
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "sh")
    simhash_index_write(docs.where(F.col("doc_id") % 2 == 0), d,
                        n_shards=8)
    one = docs.where(F.col("doc_id") == 1)
    plan = (simhash_index_dedup(d)(one)
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan


def test_simhash_index_guards(spark, tmp_path):
    from conduino_spark import (simhash_index_dedup, simhash_index_merge,
                                simhash_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="no SimHash index"):
        simhash_index_merge(docs, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="no SimHash index"):
        simhash_index_dedup(str(tmp_path / "nope"))(docs).count()
    with pytest.raises(ValueError, match="n_shards"):
        simhash_index_write(docs, str(tmp_path / "bad"), n_shards=0)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_index_write(docs, str(tmp_path / "bad"), max_hamming=0)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_index_write(docs, str(tmp_path / "bad"),
                            max_hamming=32, bits=32)


def test_simhash_index_streaming_ingestion(spark, tmp_path):
    """foreachBatch(simhash_index_merge) ingestion == one-shot build
    over everything ingested (the family streaming law)."""
    from conduino_spark import (simhash_index_dedup, simhash_index_merge,
                                simhash_index_write)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where(F.col("doc_id") % 3 == 0)
    inbox = str(tmp_path / "inbox")
    docs.where(F.col("doc_id") % 3 == 1).coalesce(1) \
        .write.parquet(f"{inbox}/b1")
    docs.where(F.col("doc_id") % 3 == 2).coalesce(1) \
        .write.parquet(f"{inbox}/b2")
    idx = str(tmp_path / "idx")
    simhash_index_write(a, idx, n_shards=8)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{inbox}/*"))
    q = (stream.writeStream
         .foreachBatch(lambda b, _bid: simhash_index_merge(b, idx))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    simhash_index_write(docs, full, n_shards=8)
    fresh = F.concat(F.lit("zq xv qj blorptex "),
                     F.col("doc_id").cast("string"),
                     F.lit(" wubfrak vexqoz jiblun kroxvat"))
    batch = (docs.where(F.col("doc_id") % 7 == 0)
                 .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                         F.when(F.col("doc_id") % 2 == 0, F.col("text"))
                          .otherwise(fresh).alias("text"),
                         "lang", "source", "n_chars"))
    got = sorted(r.doc_id for r in
                 simhash_index_dedup(idx)(batch).collect())
    want = sorted(r.doc_id for r in
                  simhash_index_dedup(full)(batch).collect())
    assert got == want and len(got) < batch.count()


# ---------------------------------------------------------------------------
# Motion-JPEG AVI: REAL video container (r12)
# ---------------------------------------------------------------------------

def test_avi_container_roundtrip_is_blob_lossless():
    """Wrapping pre-encoded JPEG blobs and walking them back out is
    bit-lossless — pins the container walk independently of JPEG's
    own lossiness; header dims/fps survive."""
    from conduino_spark import decode_avi, encode_avi_mjpeg, encode_jpeg
    imgs = [((np.arange(24 * 16 * 3) * (3 + i)) % 251)
            .astype(np.uint8).reshape(24, 16, 3) for i in range(5)]
    blobs = [encode_jpeg(a, quality=90) for a in imgs]
    fps, w, h, out = decode_avi(encode_avi_mjpeg(blobs, fps=12))
    assert (fps, w, h) == (12, 16, 24)
    assert out == blobs


def test_avi_frames_early_stop_and_validation():
    from conduino_spark import avi_frames, decode_avi, encode_avi_mjpeg
    imgs = [((np.arange(24 * 16 * 3) * (3 + i)) % 251)
            .astype(np.uint8).reshape(24, 16, 3) for i in range(6)]
    avi = encode_avi_mjpeg(imgs, fps=30, quality=95)
    frames = avi_frames(avi, max_frames=2)
    assert len(frames) == 2 and frames[0].shape == (24, 16, 3)
    _, _, _, two = decode_avi(avi, max_frames=2)
    assert len(two) == 2
    # high-quality jpeg frames stay close to the source
    err = np.abs(frames[1].astype(int) - imgs[1].astype(int)).max()
    assert err <= 40
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated AVI"):
        decode_avi(avi[:-9])
    with pytest.raises(ValueError, match="share one size"):
        encode_avi_mjpeg([imgs[0], imgs[0][:16]])
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([])
    blob = bytearray(avi)
    i = blob.find(b"vids") + 4
    blob[i:i + 4] = b"H264"
    with pytest.raises(ValueError, match="MJPG only"):
        decode_avi(bytes(blob))


def test_avi_operators_end_to_end(spark):
    """sniff_format tags the RIFF/AVI container; video_metadata reads
    real header facts; frame_sample(codec='avi') re-emits the
    stream's own JPEG blobs (bit-equal, no generation loss) and
    composes with image_resize(codec='jpeg')."""
    from conduino_spark import (encode_avi_mjpeg, encode_jpeg,
                                frame_sample, image_resize,
                                sniff_format, video_metadata)
    from conduino_spark.operators.jpeg import decode_jpeg
    imgs = [((np.arange(32 * 24 * 3) * (3 + i)) % 251)
            .astype(np.uint8).reshape(32, 24, 3) for i in range(7)]
    blobs = [encode_jpeg(a, quality=92) for a in imgs]
    avi = encode_avi_mjpeg(blobs, fps=25)
    df = spark.createDataFrame([(1, bytearray(avi))],
                               "id long, content binary")
    assert sniff_format("content")(df).first().format == "avi"
    vm = video_metadata(codec="avi")(df).first()
    assert (vm.width, vm.height, vm.n_frames, vm.fps, vm.format) == \
        (24, 32, 7, 25, "avi")
    fs = frame_sample(codec="avi", every_n=3, max_frames=2)(df)
    rows = sorted(fs.collect(), key=lambda r: r.frame_no)
    assert [r.frame_no for r in rows] == [0, 3]
    assert bytes(rows[0].frame) == blobs[0]
    assert bytes(rows[1].frame) == blobs[3]
    rs = image_resize(codec="jpeg", width=12, height=16)(
        fs.select("id", F.col("frame").alias("content"))).first()
    assert decode_jpeg(bytes(rs.content)).shape == (16, 12, 3)


def test_media_profile_avi_dispatch(spark):
    """A mixed corpus containing an AVI profiles as video: frame
    count in n_units, dims packed in meta, first-frame pixel stats."""
    from conduino_spark import (encode_avi_mjpeg, encode_jpeg,
                                media_profile, sniff_format)
    from conduino_spark.operators.jpeg import decode_jpeg
    imgs = [((np.arange(16 * 8 * 3) * (3 + i)) % 251)
            .astype(np.uint8).reshape(16, 8, 3) for i in range(3)]
    blobs = [encode_jpeg(a, quality=92) for a in imgs]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi_mjpeg(blobs, fps=10)))],
        "id long, content binary")
    r = media_profile(codec_col="format")(
        sniff_format("content")(df)).first()
    first = decode_jpeg(blobs[0]).astype(np.int64)
    assert (r.format, r.n_units, r.meta) == ("avi", 3, 16_008_000)
    assert (r.sum_abs, r.max_abs) == (int(first.sum()), int(first.max()))


def test_dup_span_flag_against_duckdb_replay(spark, tmp_path):
    """The measure half of the dupspan family: per-doc window counts
    and reference-membership counts replay exactly in DuckDB
    (distinct-digest membership over the even half, odd docs as the
    batch), and short docs score 0.0."""
    import duckdb
    from conduino_spark import dup_span_flag_against, dupspan_index_write
    from conduino_spark.operators.text import tokens_sql
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "ds")
    dupspan_index_write(docs.where(F.col("doc_id") % 2 == 0), d,
                        window_tokens=16, n_shards=8)
    got = {r.doc_id: (r.n_windows, r.n_ref_windows, r.ref_dup_frac)
           for r in dup_span_flag_against(d)(
               docs.where(F.col("doc_id") % 2 == 1)).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    toks = tokens_sql("coalesce(text, '')")
    L = 16
    win = f"md5(array_to_string(t[i:i+{L - 1}], ' '))"
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(f"""
        WITH tk AS (SELECT doc_id AS d, {toks} AS t FROM documents
                    WHERE doc_id IS NOT NULL),
        wins AS (SELECT d, unnest([{win} for i in
                                   range(1, len(t) - {L - 2})]) AS h
                 FROM tk WHERE d % 2 = 1),
        refk AS (SELECT DISTINCT unnest([{win} for i in
                                         range(1, len(t) - {L - 2})]) AS h
                 FROM tk WHERE d % 2 = 0),
        tot AS (SELECT d, COUNT(*) AS nw FROM wins GROUP BY d),
        hit AS (SELECT d, COUNT(*) AS nr FROM wins
                WHERE h IN (SELECT h FROM refk) GROUP BY d)
        SELECT tk.d, CAST(coalesce(nw, 0) AS BIGINT),
               CAST(coalesce(nr, 0) AS BIGINT),
               CASE WHEN coalesce(nw, 0) > 0
                    THEN round(coalesce(nr, 0) / (nw * 1.0), 6)
                    ELSE 0.0 END
        FROM tk LEFT JOIN tot ON tot.d = tk.d
                LEFT JOIN hit ON hit.d = tk.d
        WHERE tk.d % 2 = 1""").fetchall()}
    assert got == want
    assert sum(1 for v in got.values() if v[1] > 0) > 0
    # probe plan carries shard pruning, like the trim
    plan = (dup_span_flag_against(d)(docs.where(F.col("doc_id") == 1))
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan


# ---------------------------------------------------------------------------
# Hypothesis laws for the r12 codecs (any-input round trips)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 9), st.integers(1, 9), st.sampled_from([1, 3]),
       st.integers(0, 2**31 - 1))
def test_pnm_roundtrip_law(h, w, c, seed):
    from conduino_spark import decode_pnm, encode_pnm
    rng = np.random.RandomState(seed % (2**32 - 1))
    img = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(img)), img)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 400), st.sampled_from([8000, 16000, 44100]),
       st.sampled_from([1, 2]), st.integers(0, 2**31 - 1))
def test_aiff_roundtrip_law(nframes, rate, nch, seed):
    from conduino_spark import decode_aiff, encode_aiff
    rng = np.random.RandomState(seed % (2**32 - 1))
    x = rng.randint(-32768, 32768, nframes * nch).astype(np.int16)
    sr, ch, y = decode_aiff(encode_aiff(x, rate, nch))
    assert (sr, ch) == (rate, nch) and np.array_equal(y, x)


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 4), st.integers(0, 2**31 - 1),
       st.integers(1, 60))
def test_avi_container_law(n_frames, seed, fps):
    """Wrapping any JPEG blobs round-trips bit-equal with the declared
    frame count and fps."""
    from conduino_spark import decode_avi, encode_avi_mjpeg, encode_jpeg
    rng = np.random.RandomState(seed % (2**32 - 1))
    h, w = 8 * rng.randint(1, 4), 8 * rng.randint(1, 4)
    blobs = [encode_jpeg(rng.randint(0, 256, (h, w, 3))
                         .astype(np.uint8), quality=85)
             for _ in range(n_frames)]
    out_fps, ow, oh, out = decode_avi(encode_avi_mjpeg(blobs, fps=fps))
    assert (out_fps, ow, oh) == (fps, w, h)
    assert out == blobs


# ---------------------------------------------------------------------------
# semantic_dedup_against: embedding near-dup at the daily-crawl shape
# ---------------------------------------------------------------------------

def test_semantic_dedup_against_exact_law(spark, tmp_path):
    """With nprobe >= n_cells the probe is exhaustive: survivors must
    equal the brute rule 'no reference vector with cosine >=
    threshold' computed in pure numpy; write(half)+merge(half) keeps
    the same survivors; exact clones of indexed vectors drop."""
    import numpy as np
    from conduino_spark import (ivf_index_merge, ivf_index_write,
                                kmeans_fit, semantic_dedup_against)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ref = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "ivf")
    model = kmeans_fit(ref, k=4, iters=1)
    ivf_index_write(ref.where(F.col("vec_id") % 4 == 0), d, model)
    ivf_index_merge(ref.where(F.col("vec_id") % 4 == 2), d)
    R = {r.vec_id: np.array(r.embedding) for r in ref.collect()}
    B = {r.vec_id: np.array(r.embedding) for r in batch.collect()}
    Rm = np.stack(list(R.values()))
    Rn = Rm / np.linalg.norm(Rm, axis=1, keepdims=True)
    maxcos = {vid: round(float((Rn @ (v / np.linalg.norm(v))).max()), 6)
              for vid, v in B.items()}
    # data-derived threshold: median nearest-ref cosine, so BOTH drop
    # and survive sides are non-trivial at any sf
    thr = float(np.median(list(maxcos.values())))
    got = sorted(r.vec_id for r in semantic_dedup_against(
        d, threshold=thr, nprobe=4)(batch).select("vec_id").collect())
    want = [vid for vid, c in maxcos.items() if c < thr]
    assert got == sorted(want)
    assert 0 < len(got) < batch.count()
    # clones of indexed vectors always drop (cosine 1.0)
    clones = ref.limit(5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "label",
        "embedding")
    assert semantic_dedup_against(d, threshold=0.99,
                                  nprobe=4)(clones).count() == 0
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup_against(d, threshold=0.0)


def test_semantic_dedup_against_gemm_kernel(spark, tmp_path):
    """The gemm kernel keeps the same survivor set (the ann_join
    kernel law carried through the dedup composition)."""
    from conduino_spark import (ivf_index_write, kmeans_fit,
                                semantic_dedup_against)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ref = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "ivf")
    ivf_index_write(ref, d, kmeans_fit(ref, k=4, iters=1))
    import numpy as np
    R = np.stack([np.array(r.embedding) for r in ref.collect()])
    Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    mx = [float((Rn @ (np.array(r.embedding)
                       / np.linalg.norm(r.embedding))).max())
          for r in batch.collect()]
    thr = float(np.median(mx))
    a = sorted(r.vec_id for r in semantic_dedup_against(
        d, threshold=thr, nprobe=2)(batch).collect())
    b = sorted(r.vec_id for r in semantic_dedup_against(
        d, threshold=thr, nprobe=2, kernel="gemm")(batch).collect())
    assert a == b and len(a) > 0
