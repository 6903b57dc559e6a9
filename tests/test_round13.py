"""Round-13 hardening (ADVICE r12): JPEG FF fill bytes, Ogg serial
tracking for multiplexed streams, mp3 mid-stream resync, WebP VP8X
canvas dims, sub-canvas ANMF frames raising loudly, plus the bench
loadavg guard's threshold arithmetic.

Reference anchor: conduino has no media types — north-star engine
extension (SURVEY §7, M6).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from conduino_spark.operators.mediainfo import (
    _ogg_page, encode_mp3_stub, mp3_info, ogg_info,
)


# ---------------------------------------------------------------------------
# JPEG: 0xFF fill bytes before markers (T.81 B.1.1.2)
# ---------------------------------------------------------------------------

def _stuff_fill_bytes(blob: bytes) -> bytes:
    """Insert one legal 0xFF fill byte before every marker except SOI.
    In entropy-coded data 0xFF is always followed by 0x00 (stuffing)
    or an RST marker, so any other FF-pair IS a marker boundary."""
    out = bytearray()
    i = 0
    while i < len(blob):
        if (i > 0 and blob[i] == 0xFF and i + 1 < len(blob)
                and blob[i + 1] not in (0x00, 0xFF)
                and not (0xD0 <= blob[i + 1] <= 0xD7)):
            out.append(0xFF)                 # fill byte, then marker
        out.append(blob[i])
        i += 1
    return bytes(out)


def _photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.zeros((h, w, 3), float)
    base[:, :, 0] = np.linspace(30, 220, w)[None, :]
    base[:, :, 1] = np.linspace(0, 160, h)[:, None]
    base[:, :, 2] = 120
    return np.clip(base + rng.normal(0, 10, (h, w, 3)), 0,
                   255).astype(np.uint8)


def test_jpeg_baseline_tolerates_fill_bytes():
    from conduino_spark.operators.jpeg import decode_jpeg, encode_jpeg
    blob = encode_jpeg(_photo(24, 17), quality=85)
    stuffed = _stuff_fill_bytes(blob)
    assert len(stuffed) > len(blob)
    np.testing.assert_array_equal(decode_jpeg(stuffed),
                                  decode_jpeg(blob))


def test_jpeg_progressive_tolerates_fill_bytes():
    from conduino_spark.operators.jpeg import (decode_jpeg,
                                               encode_jpeg_progressive)
    blob = encode_jpeg_progressive(_photo(21, 30, seed=4), quality=85)
    stuffed = _stuff_fill_bytes(blob)
    assert len(stuffed) > len(blob)
    np.testing.assert_array_equal(decode_jpeg(stuffed),
                                  decode_jpeg(blob))


# ---------------------------------------------------------------------------
# mp3: bounded mid-stream resync after damaged frames
# ---------------------------------------------------------------------------

def test_mp3_midstream_junk_resyncs():
    a = encode_mp3_stub(5)
    b = encode_mp3_stub(7)
    # splice damage with no 0xFF bytes — the walk must skip it and
    # keep counting the back half
    junk = b"\xaa" * 137
    info = mp3_info(a + junk + b)
    assert info["n_frames"] == 12
    assert info["n_samples"] == 12 * 1152


def test_mp3_midstream_junk_beyond_bound_stops():
    a = encode_mp3_stub(5)
    b = encode_mp3_stub(7)
    info = mp3_info(a + b"\xaa" * 8192 + b)   # > RESYNC_MAX
    assert info["n_frames"] == 5              # honest trailing-junk stop


def test_mp3_resync_rejects_rate_change():
    # a 'frame' at a different sample rate after the junk is a false
    # sync for THIS stream — the walk must not splice streams together
    a = encode_mp3_stub(5, rate=44100)
    b = encode_mp3_stub(7, rate=32000)
    assert mp3_info(a + b"\xaa" * 50 + b)["n_frames"] == 5


# ---------------------------------------------------------------------------
# ogg: multiplexed / chained streams follow the first BOS serial
# ---------------------------------------------------------------------------

def _vorbis_id(rate=44100, channels=2) -> bytes:
    return (b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([channels])
            + struct.pack("<I", rate) + b"\x00" * 16 + b"\x01")


def test_ogg_multiplexed_serials_tracked_separately():
    # logical stream 7 (vorbis, 2 s) interleaved with stream 9 whose
    # pages carry a huge granule — duration must come from serial 7
    p0 = _ogg_page(7, 0, 0, _vorbis_id(44100, 2), header_type=2)
    px = _ogg_page(9, 0, 0, b"OpusHead\x01\x02" + b"\x00" * 9,
                   header_type=2)
    p1 = _ogg_page(7, 1, 88200, b"\x00" * 64, header_type=4)
    p2 = _ogg_page(9, 1, 48_000_000, b"\x00" * 64, header_type=4)
    info = ogg_info(p0 + px + p1 + p2)
    assert info["codec"] == "vorbis"
    assert info["duration_ms"] == 2000
    assert info["n_pages"] == 2              # serial-7 pages only


def test_ogg_chained_stream_uses_first_chain():
    # a chained stream (new BOS after an EOS) must not extend the
    # first chain's duration
    p0 = _ogg_page(5, 0, 0, _vorbis_id(48000, 1), header_type=2)
    p1 = _ogg_page(5, 1, 48000, b"\x00" * 32, header_type=4)
    q0 = _ogg_page(6, 0, 0, _vorbis_id(48000, 1), header_type=2)
    q1 = _ogg_page(6, 1, 480_000, b"\x00" * 32, header_type=4)
    info = ogg_info(p0 + p1 + q0 + q1)
    assert info["duration_ms"] == 1000


# ---------------------------------------------------------------------------
# webp: VP8X canvas dims + sub-canvas ANMF frames raise
# ---------------------------------------------------------------------------

def _gradient(h, w):
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    return np.stack([y + 0 * x, x + 0 * y, (y + x) / 2],
                    axis=2).astype(np.uint8)


def test_webp_canvas_dims_bare_and_extended():
    from conduino_spark.operators.webp import (canvas_dims, encode_webp,
                                               encode_webp_anim)
    plain = encode_webp(_gradient(9, 13))
    assert canvas_dims(plain) == (13, 9)
    anim = encode_webp_anim([_gradient(6, 11)] * 3)
    assert canvas_dims(anim) == (11, 6)
    with pytest.raises(ValueError):
        canvas_dims(b"not webp")


def test_webp_out_of_bounds_anmf_raises():
    # r14: sub-canvas frames COMPOSITE now (test_round14); a frame
    # rect exceeding the VP8X canvas is still a hard error
    from conduino_spark.operators.webp import anim_frames, encode_webp_anim
    blob = bytearray(encode_webp_anim([_gradient(8, 8)] * 2))
    i = blob.find(b"ANMF")
    assert i > 0
    blob[i + 8:i + 11] = (3).to_bytes(3, "little")   # frame_x = 6
    with pytest.raises(ValueError, match="exceeds"):
        anim_frames(bytes(blob))


def test_webp_video_metadata_uses_vp8x_canvas(spark):
    import pandas as pd

    from conduino_spark.operators.multimodal import video_metadata
    from conduino_spark.operators.webp import encode_webp_anim

    blob = encode_webp_anim([_gradient(10, 14)] * 4, [25, 25, 25, 25])
    df = spark.createDataFrame(pd.DataFrame({"id": [1],
                                             "content": [blob]}))
    row = video_metadata(codec="webp")(df).collect()[0]
    assert (row.width, row.height, row.n_frames) == (14, 10, 4)
    assert row.fps == 40


# ---------------------------------------------------------------------------
# streaming feedbackPipe (SURVEY M7 streaming half, VERDICT r12 #6)
# ---------------------------------------------------------------------------

def test_feedback_pipe_stream_replay_equals_batch(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from conduino_spark.lift import fixpoint_rounds
    from conduino_spark.plans.core import Stage
    from conduino_spark.streaming import (feedback_pipe_stream,
                                          file_stream_source)

    halve = Stage(lambda df: (df.where(F.col("v") > 1)
                              .withColumn("v", F.col("v") / 2)),
                  name="halve")
    import pyarrow as pa
    import pyarrow.parquet as pq

    batches = [[8.0, 3.0], [16.0, 0.5], [2.0]]
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    for i, b in enumerate(batches):   # flat FILES: the stream source
        pq.write_table(pa.table({"v": pa.array(b, pa.float64())}),
                       str(src_dir / f"b{i}.parquet"))

    out = feedback_pipe_stream(
        halve, file_stream_source(str(src_dir), "v double"), spark,
        out_dir=str(tmp_path / "out"), max_iters=10)
    got = sorted(r["v"] for r in out.collect())

    # replay law: the streaming result == concatenation of per-batch
    # driver fixpoints (feedback drains fully inside each micro-batch,
    # exactly as fed-back elements take priority in the reference)
    want = []
    for b in batches:
        bdf = spark.createDataFrame(pd.DataFrame({"v": b}))
        want += [r["v"] for r in
                 fixpoint_rounds(halve, bdf, max_iters=10).collect()]
    assert got == sorted(want)
    # spot-check the actual fixpoint values for the first batch's seed
    assert {4.0, 2.0, 1.5, 1.0, 0.75} <= set(got)


def test_feedback_pipe_stream_all_empty(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from conduino_spark.plans.core import Stage
    from conduino_spark.streaming import (feedback_pipe_stream,
                                          file_stream_source)

    import pyarrow as pa
    import pyarrow.parquet as pq

    never = Stage(lambda df: df.where(F.lit(False)), name="never")
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    pq.write_table(pa.table({"v": pa.array([1.0, 2.0], pa.float64())}),
                   str(src_dir / "b0.parquet"))
    out = feedback_pipe_stream(
        never, file_stream_source(str(src_dir), "v double"), spark,
        out_dir=str(tmp_path / "out"), max_iters=5)
    assert out.count() == 0
    assert "v" in out.columns
