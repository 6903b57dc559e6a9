"""Motion-JPEG AVI — a REAL video container codec in pure Python.

AVI is a RIFF container (the WAV sibling, little-endian) and MJPEG
frames are baseline JPEGs — which operators/jpeg.py already decodes
for real — so the classic capture/surveillance/dataset interchange
video format decodes end-to-end with zero external dependencies:
container walk here, per-frame entropy/DCT in jpeg.py.  mp4/webm
(inter-frame DSP codecs) keep the ffmpeg raise slots in
multimodal.py — this module is the proof the video PLUMBING is real,
not a stand-in for H.264.

Layout written/read (strict enough to read our own writes and typical
MJPG-fourcc files):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56 bytes: us/frame, ..., total_frames, ..., w, h, ...)
        LIST 'strl'  ('strh' fccType=vids fccHandler=MJPG, 'strf' BIH)
      LIST 'movi'   ('00dc' <jpeg bytes> per frame, word-aligned)
      'idx1'        (written for player compatibility; reader ignores)

Reference anchor: conduino has no media types — north-star engine
extension (SURVEY §7, M6; the multimodal column contract in
operators/multimodal.py).

Scale note: the container walk is O(bytes); early-stop via
``max_frames`` never touches later frame chunks (the gif.py
convention), so frame sampling at position k costs reading k frames'
headers, not decoding the whole clip.
"""

from __future__ import annotations

import struct


def encode_avi_mjpeg(frames, *, fps: int = 30,
                     quality: int = 90) -> bytes:
    """Serialize frames into a Motion-JPEG AVI.

    ``frames``: a list of (H, W, 3) uint8 RGB arrays (each encoded
    through :func:`~conduino_spark.operators.jpeg.encode_jpeg` at
    ``quality``) OR a list of ready JPEG byte blobs (wrapped as-is —
    the container round-trip is then bit-lossless per frame, which is
    how the tests pin the walk independently of JPEG's lossiness).
    All frames must share one (H, W)."""
    import numpy as np
    from conduino_spark.operators.jpeg import decode_jpeg, encode_jpeg
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    blobs = []
    w = h = None
    for f in frames:
        if isinstance(f, (bytes, bytearray)):
            blob = bytes(f)
            a = decode_jpeg(blob)          # dims + validity check
        else:
            a = np.asarray(f, dtype=np.uint8)
            blob = encode_jpeg(a, quality=quality)
        fh, fw = a.shape[0], a.shape[1]
        if w is None:
            w, h = fw, fh
        elif (fw, fh) != (w, h):
            raise ValueError(
                f"all AVI frames must share one size: {fw}x{fh} vs "
                f"{w}x{h}")
        blobs.append(blob)

    n = len(blobs)
    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1,
                       0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF,
                          0)[:40]
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (tag + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) % 2 else b""))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00dc", b) for b in blobs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' kind tag)
    idx, off = [], 4
    for b in blobs:
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes, *, max_frames: "int | None" = None):
    """Parse an AVI blob → ``(fps, width, height, jpeg_blobs)`` with
    ``jpeg_blobs`` the raw per-frame JPEG byte strings IN ORDER (feed
    :func:`~conduino_spark.operators.jpeg.decode_jpeg` or re-emit
    as-is).  ``max_frames`` stops the container walk early — later
    frame bytes are never touched.  Non-MJPEG streams (fourcc other
    than MJPG/mjpg/empty) raise ValueError; so do truncated chunks."""
    if not data or len(data) < 12 or data[:4] != b"RIFF" \
            or data[8:12] != b"AVI ":
        raise ValueError("not an AVI blob")
    fps, w, h = None, None, None
    fourcc = None
    blobs: "list[bytes]" = []

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal fps, w, h, fourcc
        pos = lo
        while pos + 8 <= hi:
            tag = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if pos + 8 + size > hi:
                raise ValueError(
                    f"truncated AVI: chunk {tag!r} declares {size} "
                    f"bytes, {hi - pos - 8} remain")
            body_lo, body_hi = pos + 8, pos + 8 + size
            if tag == b"LIST":
                kind = data[body_lo:body_lo + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(body_lo + 4, body_hi, depth + 1)
            elif tag == b"avih":
                if size < 40:
                    raise ValueError("truncated AVI avih chunk")
                vals = struct.unpack("<10I", data[body_lo:body_lo + 40])
                if vals[0]:
                    fps = round(1_000_000 / vals[0])
                w, h = vals[8], vals[9]
            elif tag == b"strh":
                if data[body_lo:body_lo + 4] == b"vids":
                    fourcc = data[body_lo + 4:body_lo + 8]
                    if size >= 32:
                        scale, rate = struct.unpack(
                            "<II", data[body_lo + 20:body_lo + 28])
                        if scale:
                            fps = round(rate / scale)
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                if max_frames is None or len(blobs) < max_frames:
                    blobs.append(data[body_lo:body_hi])
                else:
                    return                  # early stop: skip the rest
            pos = body_hi + (size & 1)      # chunks are word-aligned

    walk(12, len(data), 0)
    if fourcc is not None and fourcc not in (b"MJPG", b"mjpg",
                                             b"\x00\x00\x00\x00", b""):
        raise ValueError(
            f"AVI stream fourcc {fourcc!r} not supported — MJPG only "
            "(mp4/webm need ffmpeg; see multimodal codec slots)")
    if w is None or not blobs:
        raise ValueError("AVI missing avih header or frame chunks")
    return int(fps or 0), int(w), int(h), blobs


def avi_frames(data: bytes, *, max_frames: "int | None" = None):
    """Decode an MJPEG AVI's frames → list of (H, W, 3) uint8 arrays
    (each frame through the real baseline-JPEG decoder)."""
    from conduino_spark.operators.jpeg import decode_jpeg
    _, _, _, blobs = decode_avi(data, max_frames=max_frames)
    return [decode_jpeg(b) for b in blobs]
