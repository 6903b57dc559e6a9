"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) in pure
numpy + stdlib — no external codec library.

Why this exists: JPEG is THE image container of web-scraped training
data; the multimodal operators previously stubbed it behind a raise
slot.  Baseline JPEG needs no external dependency — the entropy layer
is canonical Huffman over a byte stream, the transform is an 8×8
DCT-II (one 8×8 matrix product each way), and every table the decoder
needs (quantization, Huffman) RIDES IN THE FILE (DQT/DHT segments), so
decode correctness never depends on constants transcribed here.

Scope (documented, loud):
  * decode: baseline + extended-sequential Huffman (SOF0/SOF1) AND
    progressive (SOF2, r12b — spectral selection, successive
    approximation, EOB runs; most web JPEGs are progressive), gray
    or 3-component YCbCr, sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0),
    restart markers, APPn/COM skipped.  Arithmetic / 12-bit / CMYK
    raise ValueError — re-encode upstream.
  * encode: 4:4:4 or 4:2:0 YCbCr (or gray), Annex-K tables scaled by
    ``quality`` (the libjpeg formula), fixed Annex-K Huffman tables.
    The encoder is a real writer AND the test double: round-trip
    error bounds are what the tests pin.  encode_jpeg_progressive
    (r12b) writes SOF2 with a jpegtran-style scan script; progressive
    coding is lossless over the quantized coefficients, so its decode
    must equal the baseline decode bit-for-bit (the law the tests
    pin).
  * chroma upsampling is pixel replication (nearest) — the fast path
    real decoders offer; tests bound the error accordingly.

Cost shape at 100 TB: decode runs once per blob inside Arrow-batched
``mapInPandas`` at ingestion; features/resized outputs persist.  The
per-block Python loop is the entropy decode — unavoidable without a
C codec, explicitly the declared slow path (SURVEY §6 multimodal).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K — used by the ENCODER only; the decoder
# reads whatever tables the file carries)
# ---------------------------------------------------------------------------

_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

#: (bits[1..16], values) per Annex K; canonical-code assignment below
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _zigzag_indices() -> "np.ndarray":
    """Linear (row*8+col) indexes in zigzag order — GENERATED from the
    anti-diagonal rule (odd diagonals run top-right→bottom-left, even
    run bottom-left→top-right), not transcribed."""
    out = []
    for s in range(15):
        if s % 2:
            pts = [(i, s - i) for i in range(s + 1)]
        else:
            pts = [(s - j, j) for j in range(s + 1)]
        out += [r * 8 + c for r, c in pts if r < 8 and c < 8]
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_indices()
_UNZIGZAG = np.argsort(_ZIGZAG)

#: 8×8 DCT-II basis: forward F = T @ B @ T.T, inverse B = T.T @ F @ T
_T = np.array([[float(np.cos((2 * j + 1) * i * np.pi / 16))
                * (np.sqrt(0.5) if i == 0 else 1.0) / 2.0
                for j in range(8)] for i in range(8)])


def _dct8(block: "np.ndarray") -> "np.ndarray":
    return _T @ block @ _T.T


def _idct8(coef: "np.ndarray") -> "np.ndarray":
    return _T.T @ coef @ _T


def _scaled_qt(base: "np.ndarray", quality: int) -> "np.ndarray":
    """libjpeg quality scaling: 50 = Annex K verbatim."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------

def _huff_codes(bits, vals) -> "dict[int, tuple[int, int]]":
    """value → (code, length) by the T.81 canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """length-indexed canonical decode tables: (min_code, max_code,
    first_value_index) per length — the classic T.81 DECODE proc."""

    def __init__(self, bits, vals):
        self.vals = list(vals)
        self.mincode, self.maxcode, self.valptr = {}, {}, {}
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1
        # r13: 8-bit LUT fast path — entry = (value << 5) | hlen + 1
        # for codes of <= 8 bits (the overwhelming majority of
        # symbols), 0 = fall back to the canonical per-length walk
        lut = [0] * 256
        code, k = 0, 0
        for length in range(1, 9):
            for _ in range(bits[length - 1]):
                base = code << (8 - length)
                entry = (self.vals[k] << 5) | (length + 0x10)
                for j in range(1 << (8 - length)):
                    lut[base + j] = entry
                code += 1
                k += 1
            code <<= 1
        self.lut = lut

    def read(self, br: "_BitReader") -> int:
        e = self.lut[br.peek(8)]
        if e:
            br.consume((e & 0x1F) - 0x10)
            return e >> 5
        code, length = 0, 0
        while True:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: Huffman code > 16 bits")
            mx = self.maxcode.get(length, -1)
            if mx >= 0 and code <= mx:
                return self.vals[self.valptr[length]
                                 + code - self.mincode[length]]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad(self) -> None:
        """Pad with 1-bits to the byte boundary (T.81 fill bits) —
        stuffing applies if the pad byte lands on 0xFF."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)

    def raw_marker(self, byte2: int) -> None:
        """Emit a literal marker (NOT stuffed) — caller must pad()
        first so the stream is byte-aligned."""
        assert self.n == 0
        self.out += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


class _BitReader:
    """entropy-coded segment reader: unstuffs 0xFF00, stops at any
    other marker (caller handles RST).

    r14 vectorization pass: the whole entropy segment is unstuffed
    ONCE (C-level ``bytes.replace``) into 24-bit MSB window views —
    every read is then pure window arithmetic on a Python list, no
    per-byte accumulator fill (the r13 accumulator's ``_fill`` was
    the progressive decoder's hottest path).  ``peek`` may look past
    the last real bit (virtual zeros — the Huffman LUT wants 8 bits
    of lookahead), but consuming a virtual bit still raises, which
    preserves the strict truncation behavior."""

    __slots__ = ("d", "pos", "bitpos", "nbits", "w24")

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self._load_segment(pos)

    def _load_segment(self, pos: int) -> None:
        d = self.d
        n = len(d)
        i = d.find(b"\xff", pos)
        while i != -1:
            if i + 1 >= n or d[i + 1] != 0x00:
                break                    # marker (or trailing FF)
            i = d.find(b"\xff", i + 2)
        end = i if i != -1 else n
        u = d[pos:end].replace(b"\xff\x00", b"\xff")
        self.pos = end                   # ON the terminating marker
        self.bitpos = 0
        self.nbits = len(u) * 8
        a = np.frombuffer(u + b"\x00\x00\x00", np.uint8) \
              .astype(np.uint32)
        self.w24 = ((a[:-2] << np.uint32(16)) | (a[1:-1] << np.uint32(8))
                    | a[2:]).tolist()

    def peek(self, k: int) -> int:
        p = self.bitpos
        return (self.w24[p >> 3] >> (24 - k - (p & 7))) & ((1 << k) - 1)

    def consume(self, k: int) -> None:
        p = self.bitpos + k
        if p > self.nbits:
            raise ValueError("truncated JPEG entropy stream")
        self.bitpos = p

    def bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            raise ValueError("truncated JPEG entropy stream")
        self.bitpos = p + 1
        return (self.w24[p >> 3] >> (23 - (p & 7))) & 1

    def receive(self, length: int) -> int:
        if not length:
            return 0
        p = self.bitpos
        if p + length > self.nbits:
            raise ValueError("truncated JPEG entropy stream")
        self.bitpos = p + length
        return (self.w24[p >> 3] >> (24 - length - (p & 7))) \
            & ((1 << length) - 1)

    def align_to_marker(self) -> "int | None":
        """Drop partial pad bits; if an RST marker terminates the
        segment (and at most 7 unconsumed bits remain — more means
        the decoder lost sync before the restart), consume it and
        return its index (0-7), else None."""
        if self.nbits - self.bitpos >= 8:
            return None
        d = self.d
        if (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7):
            m = d[self.pos + 1] - 0xD0
            self._load_segment(self.pos + 2)
            return m
        return None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# entropy layer (unit-tested as an identity on quantized coefficients)
# ---------------------------------------------------------------------------

def _encode_block(bw: "_BitWriter", zz: "np.ndarray", pred: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged quantized block; returns the new
    DC predictor."""
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]     # ZRL
            bw.put(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, ln = ac_codes[0x00]         # EOB
        bw.put(code, ln)
    return int(zz[0])


def _decode_block(br: "_BitReader", pred: int, dc: "_HuffDecoder",
                  ac: "_HuffDecoder") -> "tuple[np.ndarray, int]":
    """Huffman-decode one block → (zigzagged coefficients, new DC
    predictor).  r14: window reads inlined over local aliases (the
    one_block convention) — per-coefficient method calls dominated the
    baseline scan."""
    zz = [0] * 64                # plain list: scalar writes are hot
    trunc = "truncated JPEG entropy stream"
    w24 = br.w24
    pos = br.bitpos
    nbits = br.nbits
    dlut = dc.lut
    e = dlut[(w24[pos >> 3] >> (16 - (pos & 7))) & 0xFF]
    if e:
        pos += (e & 0x1F) - 0x10
        if pos > nbits:
            raise ValueError(trunc)
        t = e >> 5
    else:
        br.bitpos = pos
        t = dc.read(br)
        pos = br.bitpos
    if t:
        if pos + t > nbits:
            raise ValueError(trunc)
        v = (w24[pos >> 3] >> (24 - t - (pos & 7))) & ((1 << t) - 1)
        pos += t
        pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
    zz[0] = pred
    lut = ac.lut
    k = 1
    while k < 64:
        e = lut[(w24[pos >> 3] >> (16 - (pos & 7))) & 0xFF]
        if e:
            pos += (e & 0x1F) - 0x10
            if pos > nbits:
                raise ValueError(trunc)
            rs = e >> 5
        else:
            br.bitpos = pos
            rs = ac.read(br)
            pos = br.bitpos
        r, t = rs >> 4, rs & 0x0F
        if t == 0:
            if r == 15:       # ZRL
                k += 16
                continue
            break             # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        if pos + t > nbits:
            raise ValueError(trunc)
        v = (w24[pos >> 3] >> (24 - t - (pos & 7))) & ((1 << t) - 1)
        pos += t
        zz[k] = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
        k += 1
    br.bitpos = pos
    return zz, pred


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _to_blocks(plane: "np.ndarray") -> "np.ndarray":
    """(H, W) → (nby, nbx, 8, 8) with edge replication padding."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)


def _rgb_to_ycbcr(a: "np.ndarray") -> "np.ndarray":
    r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y, cb, cr) -> "np.ndarray":
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0,
                   255).astype(np.uint8)


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def encode_jpeg(arr, *, quality: int = 90, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Serialize an (H, W, 3) RGB or (H, W)/(H, W, 1) gray uint8 array
    as baseline JPEG (Annex-K tables scaled by ``quality``; 4:4:4 or
    4:2:0 via ``subsample``; optional DRI/RST markers every
    ``restart_interval`` MCUs).  A real writer and the test double for
    :func:`decode_jpeg` — lossy, so the tests pin error BOUNDS."""
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', "
                         f"got {subsample!r}")
    # the SHARED front half with encode_jpeg_progressive — both
    # encoders must produce identical quantized coefficients or the
    # pinned progressive==baseline bit-equality law silently breaks
    h, w, gray, qt, samp, qsel, mcux, mcuy, qb = \
        _quantized_blocks(arr, quality, subsample)

    dc_tabs = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    tsel = [0] if gray else [0, 1, 1]

    bw = _BitWriter()
    preds = [0] * len(samp)
    mcu_idx = rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                bw.pad()
                bw.raw_marker(0xD0 + (rst_idx % 8))
                rst_idx += 1
                preds = [0] * len(samp)
            mcu_idx += 1
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = qb[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci],
                            dc_tabs[tsel[ci]], ac_tabs[tsel[ci]])
    scan = bw.flush()

    out = [b"\xff\xd8"]                                     # SOI
    for i, t in enumerate(qt[:1 if gray else 2]):
        out.append(_marker(0xDB, bytes([i])
                           + bytes(t.reshape(64)[_ZIGZAG].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out.append(_marker(0xC0, sof))
    for cls, i, (bits, vals) in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
                                 (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)):
        if gray and i == 1:
            continue
        out.append(_marker(0xC4, bytes([(cls << 4) | i]) + bytes(bits)
                           + bytes(vals)))
    if restart_interval:
        out.append(_marker(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out.append(_marker(0xDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")                                 # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> "np.ndarray":
    """Parse a baseline/extended-sequential JPEG blob → (H, W, 3) RGB
    (or (H, W, 1) for grayscale scans) uint8 array.  All tables come
    from the file's own DQT/DHT segments; restart intervals honored;
    chroma upsampling is pixel replication.  Raises ValueError on
    progressive/arithmetic/12-bit/4-component streams and truncation."""
    if not data or len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt: "dict[int, np.ndarray]" = {}
    huff: "dict[tuple[int, int], _HuffDecoder]" = {}
    frame = None
    restart = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: no SOS marker")
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        m = data[pos + 1]
        if m == 0xFF:                     # T.81 B.1.1.2: FF fill byte
            pos += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:                                       # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, np.int32)
                t[_ZIGZAG] = np.frombuffer(body[p + 1:p + 65], np.uint8)
                qt[tq] = t.reshape(8, 8)
                p += 65
        elif m == 0xC4:                                     # DHT
            p = 0
            while p < len(body):
                cls, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                huff[(cls, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif m in (0xC0, 0xC1):                             # SOF0/1
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            if fh * fw > 100_000_000 or fh == 0 or fw == 0:
                raise ValueError(f"JPEG dims {fw}x{fh} out of range")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                sh, sv = hv >> 4, hv & 0x0F
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    raise ValueError(f"sampling {sh}x{sv} unsupported")
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            frame = (fh, fw, comps)
        elif m == 0xC2:                                     # SOF2
            # progressive (r12b): hand the whole stream to the
            # multi-scan coefficient-accumulating decoder
            return _decode_progressive(data)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline/extended-sequential/"
                             "progressive Huffman JPEG supported "
                             f"(got SOF marker 0x{m:02x})")
        elif m == 0xDD:                                     # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:                                     # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            pos = pos + 2 + seglen
            break
        pos = pos + 2 + seglen

    fh, fw, comps = frame
    if len(comps) == 1:
        # T.81 A.2.2 non-interleaved rule: a single-component scan
        # ignores the SOF sampling factors — one 8x8 block per MCU in
        # row-major order (some encoders emit grayscale declaring 2x2
        # sampling; the interleaved v*h layout scrambles block order).
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
              for c in comps]

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    # pass 1: entropy-decode every block into a Python grid; pass 2
    # below batch-dequantizes and IDCTs each whole component in three
    # numpy ops (r13 — the per-block IDCT was the render bottleneck)
    grids = [[[None] * (mcux * c["h"])
              for _ in range(mcuy * c["v"])] for c in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                if br.align_to_marker() is None:
                    raise ValueError("corrupt JPEG: missing RST marker")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                dq = qt.get(c["tq"])
                dh = huff.get((0, dc_t))
                ah = huff.get((1, ac_t))
                if dq is None or dh is None or ah is None:
                    raise ValueError("JPEG references an undefined "
                                     "quant/Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(br, preds[ci],
                                                      dh, ah)
                        grids[ci][my * c["v"] + by][mx * c["h"] + bx] \
                            = zz
            mcu_count += 1
    for ci, c in enumerate(comps):
        dqz = qt[c["tq"]].reshape(64)[_ZIGZAG].astype(np.float64)
        arr = np.asarray(grids[ci], np.float64)
        dz = np.empty_like(arr)
        dz[:, :, _ZIGZAG] = arr * dqz
        bh, bw = arr.shape[:2]
        idct = np.einsum("ij,byjk,kl->byil", _T.T,
                         dz.reshape(bh, bw, 8, 8), _T,
                         optimize=True) + 128.0
        planes[ci] = idct.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)

    if len(comps) == 1:
        y = np.clip(planes[0][:fh, :fw].round(), 0, 255).astype(np.uint8)
        return y[:, :, None].copy()
    full = []
    for p, c in zip(planes, comps):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:                 # pixel-replication upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2) — r12b.  Most JPEGs on the web are
# progressive; the coefficient array accumulates across scans
# (spectral selection Ss..Se, successive approximation Ah/Al) and one
# IDCT pass reconstructs at EOI.  encode_jpeg_progressive is the
# mirrored writer (jpegtran-style scan script over the standard
# Annex-K tables) used as the round-trip test double: progressive
# coding is LOSSLESS over the quantized coefficients, so
# decode(progressive(x)) must equal decode(baseline(x)) bit-for-bit.
# ---------------------------------------------------------------------------

def _comp_geometry(fh, fw, comps):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    geo = []
    for c in comps:
        cw = (fw * c["h"] + hmax - 1) // hmax
        ch = (fh * c["v"] + vmax - 1) // vmax
        geo.append({
            "bw_full": mcux * c["h"], "bh_full": mcuy * c["v"],
            "bw": (cw + 7) // 8, "bh": (ch + 7) // 8,
        })
    return hmax, vmax, mcux, mcuy, geo


def _decode_progressive(data: bytes) -> "np.ndarray":
    """Decode a progressive (SOF2) Huffman JPEG — all four scan kinds
    (DC/AC × first/refinement), EOB runs, restart intervals."""
    pos = 2
    qt: "dict[int, np.ndarray]" = {}
    huff: "dict[tuple[int, int], _HuffDecoder]" = {}
    frame = None
    restart = 0
    coefs = None        # per comp: (bh_full, bw_full, 64) int32
    geo = None
    eobrun = 0

    def decode_scan(br, scan_comps, sel, ss, se, ah, al):
        nonlocal eobrun
        eobrun = 0
        preds = [0] * len(scan_comps)
        interleaved = len(scan_comps) > 1
        # r15: per-scan table hoist — the (class, id) dict lookup ran
        # once per BLOCK in the r14 inline path; tables are fixed per
        # scan component, so resolve them once (None still raises at
        # first use with the same message)
        dc_tabs = [huff.get((0, sc[0])) for sc in sel]
        ac_tabs = [huff.get((1, sc[1])) for sc in sel]

        def one_block(i, ci, by, bx):
            # r14: the reader's window reads are inlined over local
            # aliases (w24/pos/nbits) — method-call overhead per
            # coefficient dominated this, the progressive decoder's
            # hottest path; the slow Huffman path (codes > 8 bits)
            # syncs state and delegates.  Truncation stays loud: every
            # inline consume checks nbits exactly like br.consume.
            nonlocal eobrun
            cf = coefs[ci][by][bx]           # plain Python list: per-
            # coefficient access beats numpy scalar views ~5x
            trunc = "truncated JPEG entropy stream"
            w24 = br.w24
            pos = br.bitpos
            nbits = br.nbits
            if ss == 0 and ah == 0:              # DC first
                dh = dc_tabs[i]
                if dh is None:
                    raise ValueError("scan references undefined DC "
                                     "table")
                e = dh.lut[(w24[pos >> 3] >> (16 - (pos & 7))) & 0xFF]
                if e:
                    pos += (e & 0x1F) - 0x10
                    if pos > nbits:
                        raise ValueError(trunc)
                    t = e >> 5
                else:
                    br.bitpos = pos
                    t = dh.read(br)
                    pos = br.bitpos
                if t:
                    if pos + t > nbits:
                        raise ValueError(trunc)
                    v = (w24[pos >> 3] >> (24 - t - (pos & 7))) \
                        & ((1 << t) - 1)
                    pos += t
                    preds[i] += v if v >= (1 << (t - 1)) \
                        else v - (1 << t) + 1
                cf[0] = preds[i] << al
                br.bitpos = pos
            elif ss == 0:                        # DC refinement
                if pos >= nbits:
                    raise ValueError(trunc)
                if (w24[pos >> 3] >> (23 - (pos & 7))) & 1:
                    cf[0] |= (1 << al)
                br.bitpos = pos + 1
            elif ah == 0:                        # AC first
                if eobrun > 0:
                    eobrun -= 1
                    return
                ac = ac_tabs[i]
                if ac is None:
                    raise ValueError("scan references undefined AC "
                                     "table")
                lut = ac.lut
                k = ss
                while k <= se:
                    e = lut[(w24[pos >> 3] >> (16 - (pos & 7))) & 0xFF]
                    if e:
                        pos += (e & 0x1F) - 0x10
                        if pos > nbits:
                            raise ValueError(trunc)
                        rs = e >> 5
                    else:
                        br.bitpos = pos
                        rs = ac.read(br)
                        pos = br.bitpos
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            if pos + r > nbits:
                                raise ValueError(trunc)
                            eobrun += (w24[pos >> 3]
                                       >> (24 - r - (pos & 7))) \
                                & ((1 << r) - 1)
                            pos += r
                        break
                    k += r
                    if k > se:
                        raise ValueError("corrupt JPEG: AC run past "
                                         "band end")
                    if pos + s > nbits:
                        raise ValueError(trunc)
                    v = (w24[pos >> 3] >> (24 - s - (pos & 7))) \
                        & ((1 << s) - 1)
                    pos += s
                    cf[k] = (v if v >= (1 << (s - 1))
                             else v - (1 << s) + 1) << al
                    k += 1
                br.bitpos = pos
            else:                                # AC refinement
                ac = ac_tabs[i]
                if ac is None:
                    raise ValueError("scan references undefined AC "
                                     "table")
                lut = ac.lut
                p1, m1 = 1 << al, -1 << al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        e = lut[(w24[pos >> 3]
                                 >> (16 - (pos & 7))) & 0xFF]
                        if e:
                            pos += (e & 0x1F) - 0x10
                            if pos > nbits:
                                raise ValueError(trunc)
                            rs = e >> 5
                        else:
                            br.bitpos = pos
                            rs = ac.read(br)
                            pos = br.bitpos
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "corrupt JPEG: AC refinement size "
                                    "> 1")
                            if pos >= nbits:
                                raise ValueError(trunc)
                            newval = p1 if (w24[pos >> 3]
                                            >> (23 - (pos & 7))) & 1 \
                                else m1
                            pos += 1
                        else:
                            if r != 15:
                                eobrun = (1 << r)
                                if r:
                                    if pos + r > nbits:
                                        raise ValueError(trunc)
                                    eobrun += (w24[pos >> 3]
                                               >> (24 - r - (pos & 7))) \
                                        & ((1 << r) - 1)
                                    pos += r
                                break
                        while k <= se:
                            if cf[k] != 0:
                                if pos >= nbits:
                                    raise ValueError(trunc)
                                b1 = (w24[pos >> 3]
                                      >> (23 - (pos & 7))) & 1
                                pos += 1
                                if b1 and not (cf[k] & p1):
                                    cf[k] += p1 if cf[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            cf[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if cf[k] != 0:
                            if pos >= nbits:
                                raise ValueError(trunc)
                            b1 = (w24[pos >> 3] >> (23 - (pos & 7))) & 1
                            pos += 1
                            if b1 and not (cf[k] & p1):
                                cf[k] += p1 if cf[k] > 0 else m1
                        k += 1
                    eobrun -= 1
                br.bitpos = pos

        if interleaved:                          # DC scans only (T.81)
            _, _, mcux, mcuy, _ = _comp_geometry(*frame)
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and n and n % restart == 0:
                        if br.align_to_marker() is None:
                            raise ValueError("corrupt JPEG: missing "
                                             "RST marker")
                        preds[:] = [0] * len(scan_comps)
                        eobrun = 0
                    for i, ci in enumerate(scan_comps):
                        c = frame[2][ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                one_block(i, ci,
                                          my * c["v"] + by,
                                          mx * c["h"] + bx)
                    n += 1
        else:
            ci = scan_comps[0]
            g = geo[ci]
            n = 0
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    if restart and n and n % restart == 0:
                        if br.align_to_marker() is None:
                            raise ValueError("corrupt JPEG: missing "
                                             "RST marker")
                        preds[:] = [0]
                        eobrun = 0
                    one_block(0, ci, by, bx)
                    n += 1

    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: no EOI")
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        m = data[pos + 1]
        if m == 0xFF:                     # T.81 B.1.1.2: FF fill byte
            pos += 1
            continue
        if m == 0xD9:                                       # EOI
            break
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, np.int32)
                t[_ZIGZAG] = np.frombuffer(body[p + 1:p + 65],
                                           np.uint8)
                qt[tq] = t.reshape(8, 8)
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(body):
                cls, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                huff[(cls, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif m == 0xC2:                                     # SOF2
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            if fh * fw > 100_000_000 or fh == 0 or fw == 0:
                raise ValueError(f"JPEG dims {fw}x{fh} out of range")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                sh, sv = hv >> 4, hv & 0x0F
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    raise ValueError(f"sampling {sh}x{sv} unsupported")
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            if nc == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            frame = (fh, fw, comps)
            _, _, _, _, geo = _comp_geometry(fh, fw, comps)
            coefs = [[[[0] * 64 for _ in range(g["bw_full"])]
                      for _ in range(g["bh_full"])] for g in geo]
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF in progressive "
                             f"decode (0x{m:02x})")
        elif m == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = []
            scan_comps = []
            ids = [c["id"] for c in frame[2]]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append(ids.index(cid))
                sel.append((tabs >> 4, tabs & 0x0F))
            ss, se, a = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not (0 <= ss <= se <= 63) or al > 13 or ah > 13:
                raise ValueError(f"corrupt JPEG: scan params "
                                 f"Ss={ss} Se={se} Ah={ah} Al={al}")
            if ns > 1 and ss != 0:
                raise ValueError("progressive AC scans must be "
                                 "non-interleaved")
            br = _BitReader(data, pos + 2 + seglen)
            decode_scan(br, scan_comps, sel, ss, se, ah, al)
            # resync to the next marker after the entropy data
            pos = br.pos
            # next marker = LAST 0xFF of a fill run followed by a
            # non-00/non-RST/non-FF byte (T.81 B.1.1.2 allows FF fill
            # bytes before any marker)
            while pos + 1 < len(data):
                if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF) \
                        and not (0xD0 <= data[pos + 1] <= 0xD7):
                    break
                pos += 1
            continue
        pos = pos + 2 + seglen

    if frame is None or coefs is None:
        raise ValueError("progressive JPEG without SOF2/scan data")
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        dq = qt.get(c["tq"])
        if dq is None:
            raise ValueError("JPEG references an undefined quant "
                             "table")
        g = geo[ci]
        bh, bw = g["bh_full"], g["bw_full"]
        dqz = dq.reshape(64)[_ZIGZAG]
        # whole-component batch: dequant + de-zigzag + IDCT of every
        # block in three einsum-shaped numpy ops (r13 — the per-block
        # loop was the render bottleneck)
        arr = np.asarray(coefs[ci], np.float64).reshape(bh, bw, 64)
        dz = np.empty_like(arr)
        dz[:, :, _ZIGZAG] = arr * dqz
        blocks = dz.reshape(bh, bw, 8, 8)
        idct = np.einsum("ij,byjk,kl->byil", _T.T, blocks, _T,
                         optimize=True) + 128.0
        plane = idct.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane)

    if len(comps) == 1:
        y = np.clip(planes[0][:fh, :fw].round(), 0, 255) \
            .astype(np.uint8)
        return y[:, :, None].copy()
    full = []
    for p, c in zip(planes, comps):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _quantized_blocks(arr, quality, subsample):
    """Shared front half of both encoders: quantized coefficient
    blocks per component + frame metadata."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2 or a.shape[2] == 1
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    h, w = a.shape[:2]
    qt = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
    if gray:
        planes, samp, qsel = [a.astype(np.float64)], [(1, 1)], [0]
    else:
        ycc = _rgb_to_ycbcr(a)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsample == "420":
            ph, pw = (-h) % 2, (-w) % 2
            cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes, qsel = [y, cb, cr], [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qblocks = []
    for p, (sh, sv), qs in zip(planes, samp, qsel):
        tgt_h, tgt_w = mcuy * 8 * sv, mcux * 8 * sh
        pp = np.pad(p, ((0, tgt_h - p.shape[0]),
                        (0, tgt_w - p.shape[1])), mode="edge")
        blks = _to_blocks(pp)
        out = np.zeros(blks.shape[:2] + (64,), np.int32)
        for by in range(blks.shape[0]):
            for bx in range(blks.shape[1]):
                q = np.round(_dct8(blks[by, bx] - 128.0)
                             / qt[qs]).astype(np.int32)
                out[by, bx] = q.reshape(64)[_ZIGZAG]
        qblocks.append(out)
    return h, w, gray, qt, samp, qsel, mcux, mcuy, qblocks


#: jpegtran-style default progressive scan script:
#: (comp_indices, Ss, Se, Ah, Al)
_PROG_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),     # DC first, 1 bit held back
    ((0,), 1, 5, 0, 2),          # luma low AC, 2 bits held back
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),         # luma high AC
    ((0,), 1, 63, 2, 1),         # luma AC refine 2 -> 1
    ((0, 1, 2), 0, 0, 1, 0),     # DC refine
    ((0,), 1, 63, 1, 0),         # final AC refines
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
)
_PROG_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def encode_jpeg_progressive(arr, *, quality: int = 90,
                            subsample: str = "444",
                            scans=None) -> bytes:
    """Progressive (SOF2) writer over the standard Annex-K tables —
    the jpegtran-style default script exercises every scan kind (DC/
    AC first + refinement, spectral bands, two Al levels).  EOB runs
    are held at 1 (the standard tables carry no EOBn>0 symbols);
    the decoder handles general runs.  Lossless over the quantized
    coefficients: decoding this must equal decoding
    :func:`encode_jpeg` at the same quality/subsampling exactly."""
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', "
                         f"got {subsample!r}")
    h, w, gray, qt, samp, qsel, mcux, mcuy, qb = \
        _quantized_blocks(arr, quality, subsample)
    script = scans if scans is not None else (
        _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR)
    dc_tabs = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    tsel = [0] if gray else [0, 1, 1]
    ncomp = 1 if gray else 3
    geo = []
    for ci in range(ncomp):
        sh, sv = samp[ci]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        cw = (w * sh + hmax - 1) // hmax
        ch = (h * sv + vmax - 1) // vmax
        geo.append(((ch + 7) // 8, (cw + 7) // 8))

    def encode_scan(comp_ids, ss, se, ah, al):
        bw = _BitWriter()
        preds = [0] * len(comp_ids)

        def dc_first(i, zz):
            s_val = zz[0] >> al              # arithmetic shift
            diff = s_val - preds[i]
            preds[i] = s_val
            t = _category(diff)
            code, ln = dc_tabs[tsel[comp_ids[i]]][t]
            bw.put(code, ln)
            if t:
                bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)

        def ac_first(ci, zz):
            tab = ac_tabs[tsel[ci]]
            run = 0
            for k in range(ss, se + 1):
                v = zz[k]
                mag = -v if v < 0 else v
                sv = mag >> al
                if sv == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = tab[0xF0]
                    bw.put(code, ln)
                    run -= 16
                coded = sv if v > 0 else -sv
                t = _category(coded)
                code, ln = tab[(run << 4) | t]
                bw.put(code, ln)
                bw.put(coded if coded >= 0 else coded + (1 << t) - 1,
                       t)
                run = 0
            if run:
                code, ln = tab[0x00]         # EOB (run of 1)
                bw.put(code, ln)

        def ac_refine(ci, zz):
            tab = ac_tabs[tsel[ci]]
            p1 = 1 << al
            # classify band positions
            newly = []                       # newly-significant ks
            for k in range(ss, se + 1):
                v = zz[k]
                mag = -v if v < 0 else v
                if (mag >> al) != 0 and (mag >> ah) == 0:
                    newly.append(k)
            k = ss
            correction = []

            def corr_flush():
                for b in correction:
                    bw.put(b, 1)
                correction.clear()

            for nk in newly:
                run = 0
                while k < nk:
                    v = zz[k]
                    mag = -v if v < 0 else v
                    if (mag >> ah) != 0:     # history coefficient
                        correction.append((mag >> al) & 1)
                    else:
                        run += 1
                        if run == 16:
                            code, ln = tab[0xF0]
                            bw.put(code, ln)
                            corr_flush()
                            run = 0
                    k += 1
                code, ln = tab[(run << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if zz[nk] > 0 else 0, 1)
                corr_flush()
                k = nk + 1
            # EOB with correction bits for the remaining history
            rest = []
            for kk in range(k, se + 1):
                v = zz[kk]
                mag = -v if v < 0 else v
                if (mag >> ah) != 0:
                    rest.append((mag >> al) & 1)
            if k <= se or not newly:
                # emit EOB only when the band didn't end exactly on
                # the last newly-significant coefficient
                if k <= se:
                    code, ln = tab[0x00]
                    bw.put(code, ln)
                    for b in rest:
                        bw.put(b, 1)
                elif not newly:
                    code, ln = tab[0x00]
                    bw.put(code, ln)
            return

        interleaved = len(comp_ids) > 1
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    for i, ci in enumerate(comp_ids):
                        sh, sv = samp[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                zz = qb[ci][my * sv + by, mx * sh + bx]
                                if ss == 0 and ah == 0:
                                    dc_first(i, zz)
                                else:
                                    bw.put((zz[0] >> al) & 1, 1)
        else:
            ci = comp_ids[0]
            bh, bwid = geo[ci]
            for by in range(bh):
                for bx in range(bwid):
                    zz = qb[ci][by, bx]
                    if ss == 0 and ah == 0:
                        dc_first(0, zz)
                    elif ss == 0:
                        bw.put((zz[0] >> al) & 1, 1)
                    elif ah == 0:
                        ac_first(ci, zz)
                    else:
                        ac_refine(ci, zz)
        return bw.flush()

    out = [b"\xff\xd8"]
    for i, t in enumerate(qt[:1 if gray else 2]):
        out.append(_marker(0xDB, bytes([i])
                           + bytes(t.reshape(64)[_ZIGZAG]
                                   .astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      qsel[ci]])
    out.append(_marker(0xC2, sof))
    for cls, i, (bits, vals) in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
                                 (0, 1, _DC_CHROMA),
                                 (1, 1, _AC_CHROMA)):
        if gray and i == 1:
            continue
        out.append(_marker(0xC4, bytes([(cls << 4) | i]) + bytes(bits)
                           + bytes(vals)))
    for comp_ids, ss, se, ah, al in script:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
        sos += bytes([ss, se, (ah << 4) | al])
        out.append(_marker(0xDA, sos))
        out.append(encode_scan(comp_ids, ss, se, ah, al))
    out.append(b"\xff\xd9")
    return b"".join(out)


def _valueerror_only(fn):
    """Decode-contract wrapper (r12b fuzz hardening): corrupt input
    must surface as ValueError — never KeyError/IndexError/
    struct.error — so profiling a dirty corpus can catch ONE type and
    never abort a batch."""
    import functools

    @functools.wraps(fn)
    def wrapped(data):
        try:
            return fn(data)
        except (KeyError, IndexError, struct.error,
                OverflowError) as e:
            raise ValueError(
                f"corrupt JPEG ({type(e).__name__}: {e})") from e
    return wrapped


decode_jpeg = _valueerror_only(decode_jpeg)
