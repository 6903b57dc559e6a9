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
