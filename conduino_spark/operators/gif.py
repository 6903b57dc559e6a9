"""GIF87a/89a in pure Python + numpy — no external codec library.

Why this exists: GIF is the one remaining image container common in
web-scraped corpora after bmp/png/jpeg (operators/multimodal.py,
operators/jpeg.py), and it is ALSO the engine's first real multi-frame
container — :func:`decode_gif` returns every frame, which makes the
``frame_sample`` operator's 1:N fan-out REAL instead of a digest fake.

Scope:
  * decode: GIF87a + GIF89a, global/local color tables, interlaced
    images, transparency, disposal methods 0-2 (unspecified / keep /
    restore-to-background), multi-frame animations.  Raises ValueError
    on truncation and non-GIF input.
  * encode: one or more (H, W, 3) uint8 frames sharing ≤256 distinct
    colors — a real writer and the round-trip test double (palette
    built from the frames; LZW per T.81's LZW variant with dynamic
    code widths).

The LZW inner loop is per-blob Python inside Arrow-batched
``mapInPandas`` — the declared decode-once ingestion path (the same
cost posture as operators/jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant: dynamic code width 3..12 bits, clear + EOI codes)
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes) -> "list[int]":
    clear = 1 << min_code_size
    eoi = clear + 1
    out: "list[int]" = []
    table: "list[bytes]" = []

    def reset():
        nonlocal table, width, nxt
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        nxt = eoi + 1

    width = nxt = 0
    reset()
    acc = nbits = 0
    prev: "bytes | None" = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < nxt:
                entry = table[code]
            elif code == nxt:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF: LZW code out of range")
            out.extend(entry)
            if prev is not None and nxt < 4096:
                table.append(prev + entry[:1])
                nxt += 1
                if nxt == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(min_code_size: int, idx: "bytes") -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    nxt = eoi + 1
    put(clear)
    w = b""
    for ch in idx:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w])
        if nxt < 4096:
            table[wc] = nxt
            # GIF writers grow the width when the NEXT code to assign
            # would not fit — after assigning 2^width - 1
            if nxt == (1 << width) and width < 12:
                width += 1
            nxt += 1
        else:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            nxt = eoi + 1
        w = bytes([ch])
    if w:
        put(table[w])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Split a byte payload into ≤255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: "np.ndarray") -> "np.ndarray":
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_gif(frames, *, delay_cs: int = 4,
               interlace: bool = False) -> bytes:
    """Serialize one (H, W, 3) frame or a list of same-shape frames
    (all frames together must use ≤256 distinct colors) into a GIF89a
    with a global color table.  ``delay_cs`` is the per-frame delay in
    centiseconds; ``interlace`` writes rows in four-pass order (the
    decoder's de-interlace path)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all GIF frames must share one (H, W, 3) shape")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif needs <=256 distinct colors, "
                         f"got {len(palette)} (quantize upstream)")
    depth = max(2, int(len(palette) - 1).bit_length())  # GCT size >= 2
    gct = np.zeros((1 << depth, 3), np.uint8)
    gct[:len(palette)] = palette
    idx_all = inverse.astype(np.uint8).reshape(len(frames), h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4)
                       | (depth - 1), 0, 0)
    out += gct.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + b"\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for fi, f in enumerate(frames):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) \
            + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        rows = idx_all[fi]
        if interlace:
            order = [y for start, step in _INTERLACE_PASSES
                     for y in range(start, h, step)]
            rows = rows[order]
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(mcs, rows.tobytes()))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_gif(data: bytes, *, max_frames: "int | None" = None):
    """Parse a GIF blob → ``(frames, delays_cs)`` with frames a
    (N, H, W, 3) uint8 RGB array composited per the disposal methods
    and delays the per-frame centisecond list.  ``max_frames`` stops
    decoding early (the frame-sampling fast path — later frames are
    never LZW-decoded)."""
    if not data or len(data) < 13 or data[:4] != b"GIF8" \
            or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF blob")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames, delays = [], []
    transparent: "int | None" = None
    delay = 0
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            n = data[p]
            p += 1 + n
            if n == 0:
                return p

    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: no trailer")
        b = data[pos]
        if b == 0x3B:                                   # trailer
            break
        if b == 0x21:                                   # extension
            if pos + 2 > len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos + 1]
            if label == 0xF9 and pos + 7 < len(data):   # graphic control
                packed, delay = data[pos + 3], struct.unpack(
                    "<H", data[pos + 4:pos + 6])[0]
                disposal = (packed >> 2) & 0x07
                transparent = data[pos + 6] if packed & 1 else None
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02x}")
        if pos + 10 > len(data):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB",
                                               data[pos + 1:pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
            if len(ct) < 3 * n:
                raise ValueError("truncated GIF local color table")
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW code size")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF image data")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            lzw += data[pos:pos + n]
            pos += n
        idx = _lzw_decode(mcs, bytes(lzw))
        if len(idx) < iw * ih:
            raise ValueError(f"corrupt GIF: {len(idx)} pixels decoded, "
                             f"{iw * ih} expected")
        rows = np.array(idx[:iw * ih], np.uint16).reshape(ih, iw)
        if iflags & 0x40:
            rows = _deinterlace(rows)
        prev = canvas.copy()
        region = canvas[iy:iy + ih, ix:ix + iw]
        if transparent is not None:
            mask = rows != transparent
            region[mask] = ct[rows[mask] % len(ct)]
        else:
            region[:] = ct[rows % len(ct)]
        frames.append(canvas.copy())
        delays.append(delay)
        if max_frames is not None and len(frames) >= max_frames:
            break
        if disposal == 2:                 # restore to background
            bgcol = gct[bg] if gct is not None and bg < len(gct) else 0
            canvas[iy:iy + ih, ix:ix + iw] = bgcol
        elif disposal == 3:               # restore to previous
            canvas = prev
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def _valueerror_only(fn):
    """r12b fuzz hardening: corrupt GIFs surface as ValueError only
    (the dirty-corpus profiling contract)."""
    import functools

    @functools.wraps(fn)
    def wrapped(data, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except (KeyError, IndexError, struct.error) as e:
            raise ValueError(
                f"corrupt GIF ({type(e).__name__}: {e})") from e
    return wrapped


decode_gif = _valueerror_only(decode_gif)
