"""Header-level container metadata (operators/mediainfo.py): round
trips through the synthetic writers, table/edge validation, sniffing,
and the container_info mixed dispatch on Spark.

Reference anchor: conduino has no media types — north-star engine
extension (SURVEY §7, M6).
"""

from __future__ import annotations

import struct

import pytest

from conduino_spark.operators.mediainfo import (
    encode_mp3_stub, encode_mp4_stub, encode_ogg_stub,
    encode_webm_stub, mp3_info, mp4_info, ogg_info, webm_info,
)


# ---------------------------------------------------------------------------
# mp3 frame walk
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kbps,rate,ch", [(128, 44100, 2),
                                          (320, 48000, 1),
                                          (32, 32000, 2)])
def test_mp3_walk_roundtrip(kbps, rate, ch):
    b = encode_mp3_stub(25, kbps=kbps, rate=rate, channels=ch)
    i = mp3_info(b)
    assert (i["rate"], i["channels"], i["n_frames"]) == (rate, ch, 25)
    assert i["n_samples"] == 25 * 1152
    assert i["duration_ms"] == round(1000 * 25 * 1152 / rate)


def test_mp3_id3v2_and_id3v1_skipped():
    b = encode_mp3_stub(10, id3_bytes=200)
    b += b"TAG" + b"\x00" * 125              # ID3v1 tail
    assert mp3_info(b)["n_frames"] == 10


def test_mp3_resync_and_errors():
    good = encode_mp3_stub(5)
    assert mp3_info(b"\x00junk\xff" + good)["n_frames"] == 5
    with pytest.raises(ValueError):
        mp3_info(b"definitely not audio")
    with pytest.raises(ValueError):
        mp3_info(b"")


# ---------------------------------------------------------------------------
# ogg page walk
# ---------------------------------------------------------------------------

def test_ogg_vorbis_and_opus():
    v = ogg_info(encode_ogg_stub("vorbis", rate=44100,
                                 n_samples=88200, channels=2))
    assert (v["codec"], v["rate"], v["channels"], v["n_pages"]) == \
        ("vorbis", 44100, 2, 2)
    assert v["duration_ms"] == 2000
    o = ogg_info(encode_ogg_stub("opus", rate=48000, n_samples=96000,
                                 channels=1, pre_skip=312))
    assert (o["codec"], o["rate"], o["channels"]) == ("opus", 48000, 1)
    assert o["duration_ms"] == 2000          # granule minus pre-skip


def test_ogg_errors():
    with pytest.raises(ValueError):
        ogg_info(b"RIFFxxxxWAVE")
    # an Ogg page whose first packet is neither id header
    from conduino_spark.operators.mediainfo import _ogg_page
    with pytest.raises(ValueError, match="neither"):
        ogg_info(_ogg_page(1, 0, 0, b"garbage packet"))
    with pytest.raises(ValueError):
        encode_ogg_stub("mp3")


# ---------------------------------------------------------------------------
# mp4 box walk
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("version", [0, 1])
def test_mp4_box_walk(version):
    b = encode_mp4_stub(width=1920, height=1080, timescale=90000,
                        duration=270000, version=version)
    i = mp4_info(b)
    assert (i["width"], i["height"]) == (1920, 1080)
    assert i["timescale"] == 90000
    assert i["duration_ms"] == 3000
    assert i["n_tracks"] == 1


def test_mp4_errors():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_info(b"\x00\x00\x00\x08mdat")
    good = encode_mp4_stub()
    with pytest.raises(ValueError):
        mp4_info(good[:20])                  # truncated moov
    # corrupt box size
    bad = bytearray(good)
    off = good.index(b"moov") - 4
    bad[off:off + 4] = struct.pack(">I", 3)
    with pytest.raises(ValueError, match="corrupt"):
        mp4_info(bytes(bad))


# ---------------------------------------------------------------------------
# webm EBML walk
# ---------------------------------------------------------------------------

def test_webm_walk():
    b = encode_webm_stub(width=854, height=480, duration_ms=12345)
    i = webm_info(b)
    assert (i["width"], i["height"], i["n_tracks"]) == (854, 480, 1)
    assert i["duration_ms"] == 12345


def test_webm_nondefault_timescale_and_errors():
    b = encode_webm_stub(duration_ms=2000, tscale=500_000)
    assert webm_info(b)["duration_ms"] == 2000
    with pytest.raises(ValueError):
        webm_info(b"RIFF not ebml")
    with pytest.raises(ValueError, match="Segment"):
        webm_info(b"\x1a\x45\xdf\xa3\x40\x00")


# ---------------------------------------------------------------------------
# Spark integration: sniff + container_info mixed dispatch
# ---------------------------------------------------------------------------

def test_sniff_format_tags_containers(spark):
    from conduino_spark import sniff_format
    rows = [(1, bytearray(encode_mp3_stub(3, id3_bytes=8))),
            (2, bytearray(encode_mp3_stub(3))),          # bare sync
            (3, bytearray(encode_ogg_stub("vorbis"))),
            (4, bytearray(encode_mp4_stub())),
            (5, bytearray(encode_webm_stub()))]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: r.format
           for r in sniff_format("content")(df).collect()}
    assert got == {1: "mp3", 2: "mp3", 3: "ogg", 4: "mp4", 5: "webm"}


def test_container_info_mixed_dispatch(spark):
    from conduino_spark import container_info, sniff_format
    rows = [(1, bytearray(encode_mp3_stub(20, kbps=128, rate=44100))),
            (2, bytearray(encode_ogg_stub("opus", n_samples=48000,
                                          channels=2))),
            (3, bytearray(encode_mp4_stub(width=640, height=360,
                                          duration=7000))),
            (4, bytearray(encode_webm_stub(width=1280, height=720,
                                           duration_ms=9000))),
            (5, bytearray(b"junk bytes"))]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: r for r in container_info(codec_col="format")(
        sniff_format("content")(df)).collect()}
    assert (got[1].format, got[1].sample_rate, got[1].channels,
            got[1].n_units) == ("mp3", 44100, 2, 20)
    assert got[1].duration_ms == round(1000 * 20 * 1152 / 44100)
    assert (got[2].format, got[2].channels,
            got[2].duration_ms) == ("opus", 2, 1000)
    assert (got[3].format, got[3].width, got[3].height,
            got[3].duration_ms) == ("mp4", 640, 360, 7000)
    assert (got[4].format, got[4].width, got[4].height,
            got[4].duration_ms) == ("webm", 1280, 720, 9000)
    assert got[5].format == "error"


def test_container_info_homogeneous_and_validation(spark):
    from conduino_spark import container_info
    df = spark.createDataFrame(
        [(1, bytearray(encode_mp3_stub(4)))],
        "id long, content binary")
    row = container_info(codec="mp3")(df).first()
    assert (row.format, row.n_units) == ("mp3", 4)
    with pytest.raises(ValueError):
        container_info()
    with pytest.raises(ValueError):
        container_info(codec="mp3", codec_col="format")
    with pytest.raises(ValueError, match="unknown container"):
        container_info(codec="wav")


# ---------------------------------------------------------------------------
# TIFF LZW (compression 5) + horizontal-differencing predictor (r12b)
# ---------------------------------------------------------------------------

def test_tiff_lzw_roundtrip_matrix():
    import numpy as np
    from conduino_spark.operators.tiff import decode_tiff, encode_tiff
    rng = np.random.default_rng(2)
    for shape in ((7, 9), (12, 5, 3), (6, 6, 4), (1, 1), (40, 33, 3)):
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        want = a[:, :, None] if a.ndim == 2 else a
        for kw in ({"compression": "lzw"},
                   {"compression": "lzw", "predictor": True}):
            np.testing.assert_array_equal(
                decode_tiff(encode_tiff(a, **kw)), want)


def test_tiff_lzw_table_reset_and_predictor_gain():
    import numpy as np
    from conduino_spark.operators.tiff import decode_tiff, encode_tiff
    rng = np.random.default_rng(3)
    # >4094 phrases forces the 12-bit table reset path
    big = rng.integers(0, 256, (120, 200, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(big, compression="lzw")), big)
    # smooth gradients: differencing must compress far better
    g = np.clip(np.arange(100)[None, :] + np.arange(80)[:, None],
                0, 255).astype(np.uint8)
    plain = encode_tiff(g, compression="lzw")
    pred = encode_tiff(g, compression="lzw", predictor=True)
    np.testing.assert_array_equal(decode_tiff(pred), g[:, :, None])
    assert len(pred) < len(plain) / 2


def test_tiff_lzw_hypothesis_law():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from conduino_spark.operators.tiff import decode_tiff, encode_tiff

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([1, 3, 4]), st.integers(0, 2**31 - 1),
           st.booleans())
    def law(h, w, c, seed, pred):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        got = decode_tiff(encode_tiff(a, compression="lzw",
                                      predictor=pred))
        np.testing.assert_array_equal(got, a)

    law()


def test_tiff_lzw_validation():
    import numpy as np
    import pytest as _pytest
    from conduino_spark.operators.tiff import encode_tiff
    a = np.zeros((3, 3, 3), np.uint8)
    with _pytest.raises(ValueError, match="unknown compression"):
        encode_tiff(a, compression="deflate")
    with _pytest.raises(ValueError, match="predictor"):
        encode_tiff(a, compression="packbits", predictor=True)


# ---------------------------------------------------------------------------
# PNG 16-bit depth + Adam7 interlace (r12b)
# ---------------------------------------------------------------------------

def test_png_adam7_all_filters_and_shapes():
    import numpy as np
    from conduino_spark.operators.multimodal import (decode_png,
                                                     encode_png)
    rng = np.random.default_rng(4)
    for h, w, c in ((13, 17, 3), (7, 5, 1), (9, 4, 4), (1, 1, 2),
                    (3, 10, 2), (8, 8, 3), (2, 2, 1)):
        a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        for ft in range(5):
            np.testing.assert_array_equal(
                decode_png(encode_png(a, filter_type=ft,
                                      interlace=True)), a)


def test_png_16bit_depth():
    import numpy as np
    from conduino_spark.operators.multimodal import (decode_png,
                                                     encode_png)
    rng = np.random.default_rng(5)
    for h, w, c in ((6, 9, 3), (5, 5, 1), (11, 3, 4)):
        a16 = rng.integers(0, 65536, (h, w, c), dtype=np.uint16)
        for il in (False, True):
            got = decode_png(encode_png(a16, filter_type=4,
                                        interlace=il))
            assert got.dtype == np.uint16
            np.testing.assert_array_equal(got, a16)


def test_png_16bit_hypothesis_law():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from conduino_spark.operators.multimodal import (decode_png,
                                                     encode_png)

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 10), st.integers(1, 10),
           st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**31 - 1),
           st.booleans(), st.booleans(), st.integers(0, 4))
    def law(h, w, c, seed, deep, il, ft):
        rng = np.random.default_rng(seed)
        if deep:
            a = rng.integers(0, 65536, (h, w, c), dtype=np.uint16)
        else:
            a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        got = decode_png(encode_png(a, filter_type=ft, interlace=il))
        assert got.dtype == a.dtype
        np.testing.assert_array_equal(got, a)

    law()


def test_png_16bit_feature_extract_normalization(spark):
    import numpy as np
    from conduino_spark import feature_extract
    from conduino_spark.operators.multimodal import encode_png
    # a full-scale 16-bit image must normalize to mean 1.0, not 257
    a = np.full((4, 6, 3), 65535, np.uint16)
    df = spark.createDataFrame([(1, bytearray(encode_png(a)))],
                               "id long, content binary")
    v = feature_extract(codec="png", dim=8)(df).first()["features"]
    assert v[0] == 4.0 and v[1] == 6.0       # dims
    assert abs(v[2] - 1.0) < 1e-12           # channel mean at full scale


def test_png_16bit_guards():
    import numpy as np
    import pytest as _pytest
    from conduino_spark.operators.multimodal import decode_png, encode_png
    # forge a 16-bit palette IHDR: must raise
    blob = bytearray(encode_png(np.zeros((2, 2, 1), np.uint16)))
    i = blob.index(b"IHDR") + 4
    blob[i + 9] = 3                          # color type -> palette
    with _pytest.raises(ValueError, match="palette"):
        decode_png(bytes(blob))


def test_ogg_crc_written_and_verified():
    from conduino_spark.operators.mediainfo import (encode_ogg_stub,
                                                    ogg_info)
    b = encode_ogg_stub("opus", n_samples=48000)
    assert ogg_info(b, verify_crc=True)["codec"] == "opus"
    bad = bytearray(b)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ogg_info(bytes(bad), verify_crc=True)
    # structure-only mode still reads the corrupted page
    assert ogg_info(bytes(bad))["n_pages"] == 2


# ---------------------------------------------------------------------------
# fuzz hardening (r12b): every decode path must surface corrupt input
# as ValueError ONLY — profiling a dirty corpus catches one exception
# type and never aborts a batch on KeyError/IndexError/zlib.error/...
# ---------------------------------------------------------------------------

def _decode_fixtures():
    import warnings
    import numpy as np
    warnings.filterwarnings("ignore")
    from conduino_spark.operators.multimodal import (
        decode_aiff, decode_bmp, decode_png, decode_pnm, decode_wav,
        encode_aiff, encode_bmp, encode_png, encode_pnm, encode_wav)
    from conduino_spark.operators.jpeg import (decode_jpeg,
                                               encode_jpeg,
                                               encode_jpeg_progressive)
    from conduino_spark.operators.tiff import decode_tiff, encode_tiff
    from conduino_spark.operators.gif import decode_gif, encode_gif
    from conduino_spark.operators.flac import decode_flac, encode_flac
    from conduino_spark.operators.webp import (anim_frames, decode_webp,
                                               encode_webp,
                                               encode_webp_anim)
    from conduino_spark.operators import mediainfo as mi
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    x = ((np.arange(300) * 37) % 65536 - 32768).astype(np.int16)
    pal = np.array([[i * 16 % 256] * 3 for i in range(16)], np.uint8)
    gimg = pal[(np.arange(9 * 11) * 7 % 16)].reshape(9, 11, 3)
    return {
        "png": (encode_png(img), decode_png),
        "png16": (encode_png(img.astype(np.uint16) * 257,
                             interlace=True), decode_png),
        "jpeg": (encode_jpeg(img), decode_jpeg),
        "jpeg_prog": (encode_jpeg_progressive(img), decode_jpeg),
        "tiff_lzw": (encode_tiff(img, compression="lzw",
                                 predictor=True), decode_tiff),
        "wav": (encode_wav(x, 8000), decode_wav),
        "wav_f32": (encode_wav(x, 8000, fmt="float32"), decode_wav),
        "wav_ima": (encode_wav(x, 8000, fmt="ima"), decode_wav),
        "flac": (encode_flac(x, 8000), decode_flac),
        "webp": (encode_webp(img), decode_webp),
        "webp_anim": (encode_webp_anim([img, img]), anim_frames),
        "gif": (encode_gif(gimg), decode_gif),
        "pnm": (encode_pnm(img), decode_pnm),
        "aiff": (encode_aiff(x, 8000), decode_aiff),
        "bmp": (encode_bmp(img), decode_bmp),
        "mp3": (mi.encode_mp3_stub(6), mi.mp3_info),
        "ogg": (mi.encode_ogg_stub("vorbis"), mi.ogg_info),
        "mp4": (mi.encode_mp4_stub(), mi.mp4_info),
        "webm": (mi.encode_webm_stub(), mi.webm_info),
    }


@pytest.mark.parametrize("name", sorted(_decode_fixtures()))
def test_decoder_fuzz_valueerror_only(name):
    import random
    blob, dec = _decode_fixtures()[name]
    random.seed(hash(name) & 0xFFFF)
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(random.randint(1, 6)):
            op = random.random()
            if op < 0.5 and len(b) > 4:
                b[random.randrange(len(b))] = random.randrange(256)
            elif op < 0.8 and len(b) > 8:
                del b[random.randrange(len(b)):][:random.randint(1, 30)]
            else:
                pos = random.randrange(len(b))
                b[pos:pos] = bytes(random.randrange(256)
                                   for _ in range(random.randint(1, 8)))
        try:
            dec(bytes(b))
        except ValueError:
            pass                             # the ONLY sanctioned type


def test_png_decompression_bomb_guard():
    import struct as st
    import zlib
    # forged IHDR declaring absurd dims must raise BEFORE allocating
    def chunk(tag, body):
        return (st.pack(">I", len(body)) + tag + body
                + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    from conduino_spark.operators.multimodal import decode_png
    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", st.pack(">IIBBBBB", 50_000, 50_000, 8, 2,
                                     0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="sanity cap"):
        decode_png(bomb)


def test_decoder_contract_regressions_from_review():
    """r12b review findings: the specific corrupt shapes the fuzz
    matrix's 150 trials missed — truncated VP8X/ANMF, truncated
    Ogg id headers, forged count-0 TIFF predictor tags."""
    import struct as st
    import numpy as np
    from conduino_spark.operators.webp import (anim_frames,
                                               encode_webp_anim)
    from conduino_spark.operators.mediainfo import _ogg_page, ogg_info
    from conduino_spark.operators.tiff import decode_tiff, encode_tiff
    img = np.zeros((4, 4, 3), np.uint8)
    blob = encode_webp_anim([img, img])
    with pytest.raises(ValueError):
        anim_frames(blob[:20])               # truncated VP8X
    # truncated id headers pass the magic check but not the parse
    with pytest.raises(ValueError, match="truncated Vorbis"):
        ogg_info(_ogg_page(1, 0, 0, b"\x01vorbis\x00\x00"))
    with pytest.raises(ValueError, match="truncated Opus"):
        ogg_info(_ogg_page(1, 0, 0, b"OpusHead\x01"))
    # forged predictor tag with count 0
    t = bytearray(encode_tiff(img, compression="lzw", predictor=True))
    i = t.find(st.pack("<HHI", 317, 3, 1))
    t[i + 4:i + 8] = st.pack("<I", 0)        # count -> 0
    with pytest.raises(ValueError, match="count 0"):
        decode_tiff(bytes(t))
