"""Baseline TIFF in pure numpy — no external codec library.

Why this exists: TIFF is the scanned-document container (OCR corpora,
archival dumps).  Baseline TIFF 6.0 is a tag directory over raw strip
data — nothing but struct parses — and PackBits is a 20-line RLE.

Scope:
  * decode: both byte orders (II/MM), 8-bit grayscale and RGB(A),
    multi-strip, compression 1 (none) and 32773 (PackBits), first IFD
    (page 1 of multi-page files).  Tiled, LZW/JPEG-compressed, and
    non-8-bit TIFFs raise ValueError — re-encode upstream.
  * encode: (H, W), (H, W, 1), (H, W, 3) or (H, W, 4) uint8, single
    strip, little-endian, optional PackBits — the round-trip test
    double and a real writer.

Same cost posture as the sibling codecs (operators/jpeg.py): decode
runs once per blob inside Arrow-batched ``mapInPandas`` at ingestion.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:                     # literal run of n+1 bytes
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                   # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits stream")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError(f"truncated PackBits strip: {len(out)} of "
                         f"{expected} bytes")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while j < n and (j - i) < 128 \
                and not (j + 1 < n and data[j] == data[j + 1]):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def encode_tiff(arr, *, packbits: bool = False) -> bytes:
    """Serialize an 8-bit array as a little-endian baseline TIFF with
    one strip (PackBits-compressed when ``packbits``)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3, 4):
        raise ValueError(f"encode_tiff: 1/3/4 samples per pixel, got {c}")
    raw = a.tobytes()
    strip = _packbits_encode(raw) if packbits else raw
    comp = 32773 if packbits else 1
    photometric = 1 if c == 1 else 2

    entries = []                       # (tag, type, count, value)
    extra = bytearray()
    data_start = 8 + 2 + 12 * 8 + 4    # header + count + 8 entries + next

    def short(tag, value):
        entries.append(struct.pack("<HHI", tag, 3, 1)
                       + struct.pack("<HH", value, 0))

    def long_(tag, value):
        entries.append(struct.pack("<HHII", tag, 4, 1, value))

    short(_TAG_WIDTH, w)
    short(_TAG_HEIGHT, h)
    if c == 1:
        short(_TAG_BITS, 8)
    else:
        bits_off = data_start + len(extra)
        extra += struct.pack(f"<{c}H", *([8] * c))
        entries.append(struct.pack("<HHII", _TAG_BITS, 3, c, bits_off))
    short(_TAG_COMPRESSION, comp)
    short(_TAG_PHOTOMETRIC, photometric)
    strip_off_pos = data_start + len(extra)
    extra += strip                      # strip payload inline
    long_(_TAG_STRIP_OFFSETS, strip_off_pos)
    short(_TAG_SPP, c)
    long_(_TAG_STRIP_COUNTS, len(strip))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)        # no next IFD
    out += extra
    return bytes(out)


def decode_tiff(data: bytes) -> "np.ndarray":
    """Parse a baseline TIFF blob → (H, W, C) uint8 array (first
    IFD).  Raises ValueError on non-TIFF input, truncation, tiled
    layout, non-8-bit samples, or compressions other than none /
    PackBits."""
    if not data or len(data) < 8:
        raise ValueError("not a TIFF blob")
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF blob")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF: IFD offset past buffer")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries > len(data):
        raise ValueError("truncated TIFF IFD")

    tags: "dict[int, list[int]]" = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", data[off:off + 8])
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            body = data[off + 8:off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8:off + 12])
            if voff + size > len(data):
                raise ValueError(f"truncated TIFF tag {tag}")
            body = data[voff:voff + size]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", body))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", body))
        elif typ == 1:
            vals = list(body)
        elif typ == 5:
            vals = [struct.unpack(bo + "II", body[k:k + 8])[0]
                    for k in range(0, size, 8)]
        else:
            vals = []
        tags[tag] = vals

    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strip layout only)")
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_HEIGHT][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit TIFF supported (bits={bits})")
    if comp not in (1, 32773):
        raise ValueError(f"TIFF compression {comp} unsupported "
                         f"(none/PackBits decode here)")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts mismatch")

    raw = bytearray()
    remaining = h
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        if so + sc > len(data):
            raise ValueError(f"truncated TIFF strip {si}")
        body = data[so:so + sc]
        rows = min(rows_per_strip, remaining)
        expected = rows * w * spp
        if comp == 32773:
            raw += _packbits_decode(body, expected)
        else:
            if len(body) < expected:
                raise ValueError(f"short TIFF strip {si}: {len(body)} "
                                 f"< {expected}")
            raw += body[:expected]
        remaining -= rows
    if len(raw) < h * w * spp:
        raise ValueError(f"TIFF pixel data short: {len(raw)} < "
                         f"{h * w * spp}")
    return np.frombuffer(bytes(raw), np.uint8,
                         count=h * w * spp).reshape(h, w, spp).copy()
