"""MPEG-1 video codec laws (operators/mpeg1.py, r14).

The synthetic-writer convention (FIXTURES.md): a conformant-subset
encoder pins the decoder — exactness laws where the arithmetic is
exactly invertible (gray blockwise-constant content: flat chroma at
128, DC-only luma with step-8 reconstruction), SNR bounds elsewhere,
hand-built bitstreams for decoder-only paths, loud-refusal laws for
the documented uncertified tables, and fuzz = ValueError always.
"""

import numpy as np
import pytest

from conduino_spark.operators.mpeg1 import (
    _BitWriter, _Bits, _decode_mv_component, _mc_predict,
    decode_mpeg1, encode_mpeg1, mpeg1_info)


def _gray_blocks(seed, h=48, w=64):
    """Grayscale 8x8-blockwise-constant frame: chroma flat 128, luma
    DC-only — the exactly-invertible content class."""
    r = np.random.RandomState(seed)
    blocks = r.randint(0, 256, (h // 8, w // 8, 1))
    g = np.repeat(np.repeat(blocks, 8, axis=0), 8,
                  axis=1).astype(np.uint8)
    return np.repeat(g, 3, axis=2)


def _gradient(h=32, w=48):
    y, x = np.mgrid[0:h, 0:w]
    g = np.zeros((h, w, 3), np.uint8)
    g[:, :, 0] = (x * 4) % 256
    g[:, :, 1] = (y * 6) % 256
    g[:, :, 2] = ((x + y) * 3) % 256
    return g


# ---------------------------------------------------------------------------
# exactness laws
# ---------------------------------------------------------------------------

def test_i_picture_gray_exact():
    f = _gray_blocks(1)
    fps, (w, h), frames = decode_mpeg1(encode_mpeg1([f], fps=25))
    assert (fps, w, h, len(frames)) == (25.0, 64, 48, 1)
    np.testing.assert_array_equal(frames[0], f)


def test_static_p_pictures_skip_and_stay_exact():
    f = _gray_blocks(2)
    blob = encode_mpeg1([f] * 4)
    _, _, frames = decode_mpeg1(blob)
    assert len(frames) == 4
    for fr in frames:
        np.testing.assert_array_equal(fr, f)
    # the three P pictures must actually be skip-coded: the whole
    # 4-frame stream is barely bigger than the I frame alone
    solo = len(encode_mpeg1([f]))
    assert len(blob) < solo + 120


def test_translated_p_motion_compensation_exact():
    # 8-grid-aligned wrap keeps every block constant, so the motion
    # path must reproduce the translation EXACTLY (and cheaply)
    f0 = _gray_blocks(3)
    f1 = np.roll(f0, (8, 8), axis=(0, 1))
    blob = encode_mpeg1([f0, f1], mv_search=8)
    _, _, frames = decode_mpeg1(blob)
    np.testing.assert_array_equal(frames[1], f1)
    assert len(blob) < len(encode_mpeg1([f0])) + 200


def test_translated_interior_exact_unaligned():
    # (2, -4) translation: wrapped border MBs fall back to lossy
    # intra, but every interior macroblock must MC-match exactly
    f0 = _gray_blocks(4, 64, 96)
    f1 = np.roll(f0, (2, -4), axis=(0, 1))
    _, _, frames = decode_mpeg1(encode_mpeg1([f0, f1], mv_search=4))
    np.testing.assert_array_equal(frames[1][16:-16, 16:-16],
                                  f1[16:-16, 16:-16])


def test_gradient_snr_and_quality_scaling():
    g = _gradient()
    snrs = []
    for q in (2, 8):
        _, _, fr = decode_mpeg1(encode_mpeg1([g], qscale=q))
        d = fr[0].astype(float) - g.astype(float)
        snrs.append(10 * np.log10((g.astype(float) ** 2).sum()
                                  / (d ** 2).sum()))
    assert snrs[0] > 25.0                 # fine quant: high fidelity
    assert snrs[0] > snrs[1]              # SNR falls with qscale


def test_custom_intra_matrix_roundtrip():
    g = _gradient()
    flat = np.full(64, 16, np.int64)
    flat[0] = 8
    _, _, fr = decode_mpeg1(encode_mpeg1([g], qscale=2,
                                         intra_matrix=flat))
    d = fr[0].astype(float) - g.astype(float)
    snr = 10 * np.log10((g.astype(float) ** 2).sum() / (d ** 2).sum())
    assert snr > 28.0                     # flat fine matrix beats default
    with pytest.raises(ValueError, match="intra matrix"):
        encode_mpeg1([g], intra_matrix=np.zeros(64))


def test_odd_dimensions_crop():
    f = _gray_blocks(5, 48, 64)[:41, :53]
    _, (w, h), frames = decode_mpeg1(encode_mpeg1([f]))
    assert (w, h) == (53, 41)
    assert frames[0].shape == (41, 53, 3)
    # content is no longer 8-aligned-constant at the crop edge, so
    # just require high fidelity
    d = frames[0].astype(float) - f.astype(float)
    assert np.abs(d).mean() < 4.0


def test_gop_structure_and_info():
    f = _gray_blocks(6)
    blob = encode_mpeg1([f] * 7, fps=30, gop=3)
    info = mpeg1_info(blob)
    assert info["width"] == 64 and info["height"] == 48
    assert info["fps"] == 30.0
    assert info["n_pictures"] == 7
    assert info["picture_types"] == [1, 2, 2, 1, 2, 2, 1]
    _, _, frames = decode_mpeg1(blob)
    assert len(frames) == 7
    # max_frames early stop
    _, _, head = decode_mpeg1(blob, max_frames=2)
    assert len(head) == 2


# ---------------------------------------------------------------------------
# decoder-only paths (hand-built bits)
# ---------------------------------------------------------------------------

def test_mv_component_fcode_arithmetic():
    # f_code 3 (f=4): delta = 1 + 4*(|code|-1) + r; round-trip a
    # hand-written (code, r) pair through the decoder
    bw = _BitWriter()
    bw.write_code("001")          # |motion_code| = 2
    bw.write(0, 1)                # positive
    bw.write(3, 2)                # r = 3 (f_code-1 = 2 bits)
    br = _Bits(bw.bytes())
    mv = _decode_mv_component(br, 3, 0)
    assert mv == 1 + 4 * 1 + 3    # = 8
    # modulo wrap at the top of the range
    bw = _BitWriter()
    bw.write_code("01")           # |code| = 1
    bw.write(0, 1)                # positive
    br = _Bits(bw.bytes())
    assert _decode_mv_component(br, 1, 15) == -16   # 16 wraps


def test_mc_half_pel_truncating_average():
    plane = np.arange(64, dtype=np.int64).reshape(8, 8) * 3
    # right-half: truncating average of horizontal neighbors
    got = _mc_predict(plane, 2, 2, 4, 4, 0, 1)
    want = (plane[2:6, 2:6] + plane[2:6, 3:7]) // 2
    np.testing.assert_array_equal(got, want)
    # both halves: 4-tap truncating average
    got = _mc_predict(plane, 1, 1, 4, 4, 3, 3)
    a = plane[2:6, 2:6] + plane[2:6, 3:7] \
        + plane[3:7, 2:6] + plane[3:7, 3:7]
    np.testing.assert_array_equal(got, a // 4)
    with pytest.raises(ValueError, match="outside"):
        _mc_predict(plane, 0, 0, 4, 4, -1, 0)


def _patch_picture_type(blob: bytes, new_type: int) -> bytes:
    b = bytearray(blob)
    i = b.index(b"\x00\x00\x01\x00")
    # picture header byte 1: tr[1:0] | type(3) | vbv[15:13]
    b[i + 5] = (b[i + 5] & 0xC7) | (new_type << 3)
    return bytes(b)


def test_patched_picture_types_raise_loudly():
    # (r15: B and D pictures decode now — a type-3/4 patch of an
    # I-coded payload is simply malformed and must still refuse:
    # type 3 reads f_codes that aren't there; type 4 desyncs on the
    # AC/EOB bits a D-picture cannot contain)
    blob = encode_mpeg1([_gray_blocks(7)])
    with pytest.raises(ValueError):
        decode_mpeg1(_patch_picture_type(blob, 3))
    with pytest.raises(ValueError):
        decode_mpeg1(_patch_picture_type(blob, 4))


def test_d_pictures_roundtrip_exact_and_flat():
    # blockwise-constant frames are EXACT through a D-only stream
    # (block DC = rounded mean; flat dc/8 reconstruction)
    frames = [_gray_blocks(i, 48, 64) for i in range(3)]
    es = encode_mpeg1(frames, d_pictures=True, qscale=5)
    fps, (w, h), dec = decode_mpeg1(es)
    assert (w, h) == (64, 48) and len(dec) == 3
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    assert mpeg1_info(es)["picture_types"] == [4, 4, 4]
    # arbitrary content decodes blockwise-FLAT (DC-only pictures)
    r = np.random.RandomState(5)
    fr = r.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    _, _, dec2 = decode_mpeg1(encode_mpeg1([fr], d_pictures=True))
    blocks = dec2[0].reshape(4, 8, 6, 8, 3)
    assert all(np.ptp(blocks[i, :, j], axis=(0, 1)).max() == 0
               for i in range(4) for j in range(6))
    # max_frames early stop
    assert len(decode_mpeg1(es, max_frames=2)[2]) == 2


def test_d_pictures_sequence_exclusive():
    # 2.4.1: D cannot mix with I/P/B — splice an I picture onto a
    # D stream (and vice versa) and the decoder must refuse
    frames = [_gray_blocks(i, 32, 32) for i in range(2)]
    ds = encode_mpeg1(frames, d_pictures=True)
    ip = encode_mpeg1(frames)
    i_pic = ip[ip.find(b"\x00\x00\x01\x00"):]
    d_pic = ds[ds.find(b"\x00\x00\x01\x00"):]
    with pytest.raises(ValueError, match="cannot mix"):
        decode_mpeg1(ds[:-4] + i_pic)
    with pytest.raises(ValueError, match="cannot mix"):
        decode_mpeg1(ip[:-4] + d_pic)
    # option conflicts refuse at encode time
    with pytest.raises(ValueError, match="D-only"):
        encode_mpeg1(frames, d_pictures=True, b_frames=1)
    with pytest.raises(ValueError, match="D-only"):
        encode_mpeg1(frames, d_pictures=True, inter_residual=True)


def test_d_pictures_fuzz():
    blob = encode_mpeg1([_gray_blocks(11, 32, 32)] * 2,
                        d_pictures=True)
    for cut in range(3, len(blob), 5):
        try:
            _, _, frames = decode_mpeg1(blob[:cut])
            assert 1 <= len(frames) <= 2
        except ValueError:
            pass
    rng = np.random.RandomState(1)
    for _ in range(40):
        b = bytearray(blob)
        b[rng.randint(4, len(b))] ^= 1 << rng.randint(8)
        try:
            decode_mpeg1(bytes(b))
        except ValueError:
            pass                       # loud refusal is the law


def _mini_stream(slice_bits: "list[tuple]", ptype: int = 1) -> bytes:
    """Sequence + picture header + ONE hand-written slice."""
    out = bytearray()
    bw = _BitWriter()
    bw.write(16, 12)
    bw.write(16, 12)
    bw.write(1, 4)
    bw.write(3, 4)                # 25 fps
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    out += b"\x00\x00\x01\xb3" + bw.bytes()
    bw = _BitWriter()
    bw.write(0, 10)
    bw.write(ptype, 3)
    bw.write(0xFFFF, 16)
    if ptype == 2:
        bw.write(0, 1)
        bw.write(1, 3)
    out += b"\x00\x00\x01\x00" + bw.bytes()
    bw = _BitWriter()
    bw.write(8, 5)                # quantizer_scale
    bw.write(0, 1)                # no extra info
    for kind, val in slice_bits:
        if kind == "code":
            bw.write_code(val)
        else:
            bw.write(val[0], val[1])
    out += b"\x00\x00\x01\x01" + bw.bytes()
    return bytes(out)


def test_uncertified_ac_tail_raises():
    # intra MB, DC size 0, then the 8-bit dct_coeff code '00100000'
    # (outside the certified head) must refuse loudly
    blob = _mini_stream([("code", "1"),          # addr inc 1
                         ("code", "1"),          # mb_type I: intra
                         ("code", "100"),        # dc size 0 (luma)
                         ("code", "00100000")])  # uncertified AC
    with pytest.raises(ValueError, match="certified"):
        decode_mpeg1(blob)


def test_invalid_cbp_code_raises():
    # (r15: B.3 is certified and coded P-macroblocks decode; an
    # INVALID coded_block_pattern codeword must still refuse loudly)
    blob_i = encode_mpeg1([_gray_blocks(8, 16, 16)])
    p_tail = _mini_stream([("code", "1"),      # addr inc 1
                           ("code", "01"),     # no MC, coded
                           ("code", "000000000001")],  # not a code
                          ptype=2)
    blob = blob_i[:-4] + p_tail[p_tail.index(b"\x00\x00\x01\x00"):]
    with pytest.raises(ValueError,
                       match="coded_block_pattern|truncated"):
        decode_mpeg1(blob)


def test_skipped_mb_in_i_picture_raises():
    # 16x16 = 1 MB: inc 2 at slice start overshoots the picture (r15:
    # slice-start inc>1 is legal positioning, so the failure is now
    # the address bound, not a blanket gap check)
    blob = _mini_stream([("code", "011"),        # addr inc 2 at start
                         ("code", "1"),
                         ("code", "100")])
    with pytest.raises(ValueError,
                       match="I-slice|I-picture|cover|overflow"):
        decode_mpeg1(blob)


# ---------------------------------------------------------------------------
# fuzz + validation
# ---------------------------------------------------------------------------

def test_fuzz_truncation_and_bitflips_raise_valueerror():
    blob = encode_mpeg1([_gray_blocks(9, 32, 32)] * 2)
    # a prefix cut is either a LOUD refusal or a valid shorter video
    # (cutting at a picture boundary legitimately yields a decodable
    # prefix) — never a crash, never extra frames
    for cut in range(3, len(blob), 5):
        try:
            _, _, frames = decode_mpeg1(blob[:cut])
            assert 1 <= len(frames) <= 2
            assert frames[0].shape == (32, 32, 3)
        except ValueError:
            pass
    rng = np.random.RandomState(0)
    for _ in range(40):
        b = bytearray(blob)
        b[rng.randint(4, len(b))] ^= 1 << rng.randint(8)
        try:
            decode_mpeg1(bytes(b))
        except ValueError:
            pass                       # loud refusal is the law


def test_encoder_validation():
    f = _gray_blocks(1)
    with pytest.raises(ValueError, match="at least one"):
        encode_mpeg1([])
    with pytest.raises(ValueError, match="qscale"):
        encode_mpeg1([f], qscale=0)
    with pytest.raises(ValueError, match="one"):
        encode_mpeg1([f, _gray_blocks(1, 32, 32)])
    with pytest.raises(ValueError, match="dims"):
        encode_mpeg1([np.zeros((8, 8, 3), np.uint8)])
    with pytest.raises(ValueError, match="sequence header"):
        decode_mpeg1(b"not mpeg")


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def test_spark_frame_sample_and_video_metadata(spark):
    import pandas as pd

    from conduino_spark.operators.multimodal import (decode_png,
                                                     frame_sample,
                                                     sniff_format,
                                                     video_metadata)

    fs = [_gray_blocks(s, 32, 32) for s in (1, 2, 3, 4, 5, 6)]
    blob = encode_mpeg1(fs, fps=30, gop=3)
    df = spark.createDataFrame(pd.DataFrame({"id": [1],
                                             "content": [blob]}))
    meta = video_metadata(codec="mpeg1")(df).collect()[0]
    assert (meta.width, meta.height, meta.n_frames, meta.fps,
            meta.format) == (32, 32, 6, 30, "mpeg1")
    out = (frame_sample(codec="mpeg1", every_n=2, max_frames=3)(df)
           .orderBy("frame_no").collect())
    assert [r.frame_no for r in out] == [0, 2, 4]
    for r in out:
        np.testing.assert_array_equal(decode_png(bytes(r.frame)),
                                      fs[r.frame_no])
    tag = sniff_format()(df).select("format").collect()[0][0]
    assert tag == "mpeg1"


# ---------------------------------------------------------------------------
# MPEG-1 program streams (11172-1 pack/PES layer)
# ---------------------------------------------------------------------------

def test_ps_mux_demux_roundtrip_bit_exact():
    from conduino_spark.operators.mpeg1 import (demux_mpeg_ps,
                                                mpeg_ps_video_es,
                                                mux_mpeg_ps)
    es = encode_mpeg1([_gray_blocks(1, 32, 32)] * 3)
    for pkt in (64, 500, 2034, len(es) + 7):
        ps = mux_mpeg_ps(es, packet_bytes=pkt)
        assert mpeg_ps_video_es(ps) == es
        streams = demux_mpeg_ps(ps)
        assert list(streams) == [0xE0]


def test_ps_decode_equals_es_decode():
    from conduino_spark.operators.mpeg1 import (mpeg_ps_info,
                                                mpeg_ps_video_es,
                                                mux_mpeg_ps)
    fs = [_gray_blocks(s, 32, 32) for s in (1, 2, 3)]
    es = encode_mpeg1(fs, fps=25)
    ps = mux_mpeg_ps(es, packet_bytes=300, mux_rate=1234)
    _, _, frames = decode_mpeg1(mpeg_ps_video_es(ps))
    for fr, want in zip(frames, fs):
        np.testing.assert_array_equal(fr, want)
    info = mpeg_ps_info(ps)
    assert info["mux_rate_50Bps"] == 1234
    assert info["n_packs"] == -(-len(es) // 300)
    assert info["streams"]["0xe0"] == len(es)
    assert info["video"]["width"] == 32
    assert info["video"]["picture_types"] == [1, 2, 2]


def test_ps_pes_header_variants():
    # hand-built packets: stuffing run, STD buffer field, PTS and
    # PTS+DTS forms must all skip to the payload (11172-1 2.4.3.3)
    from conduino_spark.operators.mpeg1 import demux_mpeg_ps
    def pes(body):
        return b"\x00\x00\x01\xe0" + len(body).to_bytes(2, "big") + body
    pack = b"\x00\x00\x01\xba" + bytes([0x21, 0x00, 0x01, 0x00,
                                        0x01, 0x01, 0x00, 0x03])
    blob = (pack
            + pes(b"\xff\xff\xff" + b"\x0f" + b"AB")        # stuffing
            + pes(bytes([0x40 | 0x20, 0x30]) + b"\x0f" + b"CD")  # STD
            + pes(bytes([0x21, 0, 1, 0, 1]) + b"EF")        # PTS
            + pes(bytes([0x31, 0, 1, 0, 1,
                         0x11, 0, 1, 0, 1]) + b"GH")        # PTS+DTS
            + b"\x00\x00\x01\xb9")
    streams = demux_mpeg_ps(blob)
    assert streams[0xE0] == b"ABCDEFGH"


def test_ps_fuzz_and_validation():
    from conduino_spark.operators.mpeg1 import (demux_mpeg_ps,
                                                mux_mpeg_ps)
    es = encode_mpeg1([_gray_blocks(4, 32, 32)])
    ps = mux_mpeg_ps(es)
    with pytest.raises(ValueError, match="pack start"):
        demux_mpeg_ps(b"not a program stream")
    with pytest.raises(ValueError, match="empty"):
        mux_mpeg_ps(b"")
    rng = np.random.RandomState(1)
    for cut in (5, 11, 20, len(ps) // 2):
        with pytest.raises(ValueError):
            demux_mpeg_ps(ps[:cut])
    for _ in range(30):
        b = bytearray(ps)
        b[rng.randint(4, 30)] ^= 1 << rng.randint(8)
        try:
            demux_mpeg_ps(bytes(b))
        except ValueError:
            pass


def test_ps_spark_dispatch(spark):
    import pandas as pd

    from conduino_spark.operators.mpeg1 import mux_mpeg_ps
    from conduino_spark.operators.multimodal import (decode_png,
                                                     frame_sample,
                                                     sniff_format,
                                                     video_metadata)
    fs = [_gray_blocks(s, 32, 32) for s in (5, 6, 7, 8)]
    ps = mux_mpeg_ps(encode_mpeg1(fs, fps=30, gop=2), packet_bytes=512)
    df = spark.createDataFrame(pd.DataFrame({"id": [1],
                                             "content": [ps]}))
    tag = sniff_format()(df).select("format").collect()[0][0]
    assert tag == "mpeg_ps"
    meta = video_metadata(codec="mpeg_ps")(df).collect()[0]
    assert (meta.width, meta.height, meta.n_frames,
            meta.format) == (32, 32, 4, "mpeg_ps")
    out = (frame_sample(codec="mpeg_ps", every_n=1, max_frames=2)(df)
           .orderBy("frame_no").collect())
    for r in out:
        np.testing.assert_array_equal(decode_png(bytes(r.frame)),
                                      fs[r.frame_no])


def test_container_info_mpeg(spark):
    import pandas as pd

    from conduino_spark.operators.mpeg1 import mux_mpeg_ps
    from conduino_spark.operators.multimodal import (container_info,
                                                     sniff_format)
    es = encode_mpeg1([_gray_blocks(1, 32, 48)] * 5, fps=25)
    ps = mux_mpeg_ps(es, packet_bytes=256)
    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2], "content": [es, ps]}))
    rows = {r.id: r for r in container_info(
        "content", "id", codec_col="format")(
        sniff_format("content")(df)).collect()}
    for rid, fmt in ((1, "mpeg1"), (2, "mpeg_ps")):
        r = rows[rid]
        assert (r.format, r.width, r.height, r.n_units,
                r.duration_ms) == (fmt, 48, 32, 5, 200)


def test_random_roundtrip_sweep():
    # randomized encoder<->decoder consistency: shapes, counts and a
    # fidelity floor at fine quant; no exception for any config
    rng = np.random.RandomState(42)
    for _ in range(6):
        h = int(rng.choice([16, 24, 40]))
        w = int(rng.choice([16, 32, 48]))
        n = int(rng.randint(1, 4))
        frames = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                  for _ in range(n)]
        q = int(rng.choice([1, 2, 4, 8, 16, 31]))
        blob = encode_mpeg1(frames, fps=float(rng.choice([24, 25, 30])),
                            qscale=q, gop=int(rng.choice([1, 2, 12])))
        _, (ww, hh), out = decode_mpeg1(blob)
        assert (ww, hh) == (w, h) and len(out) == n
        if q <= 2:
            # fidelity floor on SMOOTH random content (full-band
            # noise at fine quant exceeds MPEG-1's ±255 escape-level
            # ceiling, where the encoder saturates by design)
            base = rng.randint(0, 256, (h // 8 + 1, w // 8 + 1, 3))
            smooth = np.repeat(np.repeat(base, 8, 0), 8,
                               1)[:h, :w].astype(np.uint8)
            _, _, sm = decode_mpeg1(encode_mpeg1([smooth], qscale=q))
            d = sm[0].astype(float) - smooth.astype(float)
            snr = 10 * np.log10((smooth.astype(float) ** 2).sum()
                                / max((d ** 2).sum(), 1e-9))
            assert snr > 20.0


def test_slice_spanning_mb_rows():
    # a single slice carrying macroblocks across TWO rows (legal; our
    # encoder emits one slice per row, so hand-build it): 16x32 image
    # = 1x2 MBs, slice vertical position 1, two intra MBs in one slice
    from conduino_spark.operators.mpeg1 import _BitWriter
    out = bytearray()
    bw = _BitWriter()
    bw.write(16, 12)
    bw.write(32, 12)
    bw.write(1, 4)
    bw.write(3, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    out += b"\x00\x00\x01\xb3" + bw.bytes()
    bw = _BitWriter()
    bw.write(0, 10)
    bw.write(1, 3)                 # I picture
    bw.write(0xFFFF, 16)
    out += b"\x00\x00\x01\x00" + bw.bytes()
    bw = _BitWriter()
    bw.write(8, 5)                 # qscale
    bw.write(0, 1)
    for _mb in range(2):           # two MBs: rows 0 and 1
        bw.write_code("1")         # addr inc 1
        bw.write_code("1")         # intra
        for blk in range(6):
            luma = blk < 4
            # DC diff 0 for every block, EOB immediately
            bw.write_code("100" if luma else "00")
            bw.write_code("10")
    out += b"\x00\x00\x01\x01" + bw.bytes()
    out += b"\x00\x00\x01\xb7"
    fps, (w, h), frames = decode_mpeg1(bytes(out))
    assert (w, h) == (16, 32) and len(frames) == 1
    # DC predictors start at 1024 = mid-gray 128
    assert frames[0].min() >= 127 and frames[0].max() <= 129
