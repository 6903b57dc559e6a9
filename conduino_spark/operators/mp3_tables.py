"""Spec data tables for MPEG-1/2 Layer III decode (operators/mp3.py).

Transcribed from the public standards ISO/IEC 11172-3 (Tables B.6-B.9)
and ISO/IEC 13818-3 (LSF additions).  Two independent validation
layers guard the transcription:

* structural — every Huffman table must be a complete prefix code
  (Kraft sum == 1, no code a prefix of another): ``_validate()`` runs
  at import time;
* empirical — decoding a third-party (LAME) stream must consume
  exactly ``part2_3_length`` bits per granule; a single wrong code
  desynchronizes immediately (tests/test_mp3.py records which tables
  that stream exercises).

Reference anchor: conduino has no media types — north-star extension
(SURVEY §7, M6).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# scalefactor band boundaries (11172-3 Table B.8 / 13818-3 annex)
# key: (mpeg1, mpeg25, sr_idx) — sr_idx as in the frame header
# ---------------------------------------------------------------------------

SFB_LONG = {
    # MPEG-1: 44100 / 48000 / 32000
    (True, False, 0): (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62,
                       74, 90, 110, 134, 162, 196, 238, 288, 342, 418,
                       576),
    (True, False, 1): (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60,
                       72, 88, 106, 128, 156, 190, 230, 276, 330, 384,
                       576),
    (True, False, 2): (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66,
                       82, 102, 126, 156, 194, 240, 296, 364, 448, 550,
                       576),
    # MPEG-2: 22050 / 24000 / 16000
    (False, False, 0): (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96,
                        116, 140, 168, 200, 238, 284, 336, 396, 464,
                        522, 576),
    (False, False, 1): (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96,
                        114, 136, 162, 194, 232, 278, 332, 394, 464,
                        540, 576),
    (False, False, 2): (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96,
                        116, 140, 168, 200, 238, 284, 336, 396, 464,
                        522, 576),
    # MPEG-2.5: 11025 / 12000 / 8000
    (False, True, 0): (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96,
                       116, 140, 168, 200, 238, 284, 336, 396, 464,
                       522, 576),
    (False, True, 1): (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96,
                       116, 140, 168, 200, 238, 284, 336, 396, 464,
                       522, 576),
    (False, True, 2): (0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160,
                       192, 232, 280, 336, 400, 476, 566, 568, 570,
                       572, 574, 576),
}

SFB_SHORT = {
    (True, False, 0): (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106,
                       136, 192),
    (True, False, 1): (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100,
                       126, 192),
    (True, False, 2): (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138,
                       180, 192),
    (False, False, 0): (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132,
                        174, 192),
    (False, False, 1): (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136,
                        180, 192),
    (False, False, 2): (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134,
                        174, 192),
    (False, True, 0): (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132,
                       174, 192),
    (False, True, 1): (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132,
                       174, 192),
    (False, True, 2): (0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162,
                       164, 192),
}

#: 11172-3 Table B.6 right column: high-band preemphasis, sfb 0..21
PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
          2, 0)

#: linbits per big-values table (Table B.7); tables 16-23 share table
#: 16's codes, 24-31 share table 24's (differing only in linbits)
LINBITS = {0: 0, 1: 0, 2: 0, 3: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0,
           10: 0, 11: 0, 12: 0, 13: 0, 15: 0,
           16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
           24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}

# ---------------------------------------------------------------------------
# Huffman code tables (11172-3 Table B.7), as {codestring: x*16+y}
# ---------------------------------------------------------------------------

_T1 = {"1": (0, 0), "001": (0, 1), "01": (1, 0), "000": (1, 1)}

_T2 = {"1": (0, 0), "010": (0, 1), "000001": (0, 2),
       "011": (1, 0), "001": (1, 1), "00001": (1, 2),
       "00011": (2, 0), "00010": (2, 1), "000000": (2, 2)}

_T3 = {"11": (0, 0), "10": (0, 1), "000001": (0, 2),
       "001": (1, 0), "01": (1, 1), "00001": (1, 2),
       "00011": (2, 0), "00010": (2, 1), "000000": (2, 2)}


def _pairs(n: int, lens, codes) -> dict:
    """Row-major (hlen, hcod) arrays → {codestring: (x, y)}."""
    out = {}
    for i, (l, c) in enumerate(zip(lens, codes)):
        out[format(c, f"0{l}b")] = (i // n, i % n)
    return out


# tables 5-10 in row-major (hlen, hcod) pairs — each passed the
# structural checksum (complete prefix code) on transcription, which a
# single wrong length or code value breaks loudly
_T5 = _pairs(4, (1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
             (0x1, 0x2, 0x6, 0x5, 0x3, 0x1, 0x4, 0x4,
              0x7, 0x5, 0x7, 0x1, 0x6, 0x1, 0x1, 0x0))

_T6 = _pairs(4, (3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7),
             (0x7, 0x3, 0x5, 0x1, 0x6, 0x2, 0x3, 0x2,
              0x5, 0x4, 0x4, 0x1, 0x3, 0x3, 0x2, 0x0))

_T7 = _pairs(6, (1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8,
                 6, 5, 7, 8, 8, 9, 7, 7, 8, 9, 9, 9,
                 7, 7, 8, 9, 9, 10, 8, 8, 9, 10, 10, 10),
             (0x1, 0x2, 0xa, 0x13, 0x10, 0xa, 0x3, 0x3, 0x7, 0xa,
              0x5, 0x3, 0xb, 0x4, 0xd, 0x11, 0x8, 0x4, 0xc, 0xb,
              0x12, 0xf, 0xb, 0x2, 0x7, 0x6, 0x9, 0xe, 0x3, 0x1,
              0x6, 0x4, 0x5, 0x3, 0x2, 0x0))

_T8 = _pairs(6, (2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8,
                 6, 4, 6, 8, 8, 9, 8, 8, 8, 9, 9, 10,
                 8, 7, 8, 9, 10, 10, 9, 8, 9, 9, 11, 11),
             (0x3, 0x4, 0x6, 0x12, 0xc, 0x5, 0x5, 0x1, 0x2, 0x10,
              0x9, 0x3, 0x7, 0x3, 0x5, 0xe, 0x7, 0x3, 0x13, 0x11,
              0xf, 0xd, 0xa, 0x4, 0xd, 0x5, 0x8, 0xb, 0x5, 0x1,
              0xc, 0x4, 0x4, 0x1, 0x1, 0x0))

_T9 = _pairs(6, (3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8,
                 4, 4, 5, 6, 7, 8, 6, 5, 6, 7, 7, 8,
                 7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9),
             (0x7, 0x5, 0x9, 0xe, 0xf, 0x7, 0x6, 0x4, 0x5, 0x5,
              0x6, 0x7, 0x7, 0x6, 0x8, 0x8, 0x8, 0x5, 0xf, 0x6,
              0x9, 0xa, 0x5, 0x1, 0xb, 0x7, 0x9, 0x6, 0x4, 0x1,
              0xe, 0x4, 0x6, 0x2, 0x6, 0x0))

_T10 = _pairs(8, (1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
                  6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
                  8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11,
                  10, 11, 8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10,
                  10, 11, 11, 11),
              (0x1, 0x2, 0xa, 0x17, 0x23, 0x1e, 0xc, 0x11, 0x3, 0x3,
               0x8, 0xc, 0x12, 0x15, 0xc, 0x7, 0xb, 0x9, 0xf, 0x15,
               0x20, 0x28, 0x13, 0x6, 0xe, 0xd, 0x16, 0x22, 0x2e,
               0x17, 0x12, 0x7, 0x14, 0x13, 0x21, 0x2f, 0x1b, 0x16,
               0x9, 0x3, 0x1f, 0x16, 0x29, 0x1a, 0x15, 0x14, 0x5,
               0x3, 0xe, 0xd, 0xa, 0xb, 0x10, 0x6, 0x5, 0x1, 0x9,
               0x8, 0x7, 0x8, 0x4, 0x4, 0x2, 0x0))

_CODE_TABLES = {1: _T1, 2: _T2, 3: _T3, 5: _T5, 6: _T6, 7: _T7,
                8: _T8, 9: _T9, 10: _T10}

#: big-values tables whose transcription could not be certified
#: offline (no spectral-content reference stream exists in this
#: container, and their structural checksum did not converge from
#: memory): streams selecting them raise a loud ValueError rather
#: than risk silently-wrong audio.  The bundled encoder only ever
#: emits certified tables.
UNCERTIFIED_TABLES = frozenset(
    {11, 12, 13, 15} | set(range(16, 24)) | set(range(24, 32)))

#: count1 table A (quadruples): {codestring: v*8+w*4+x*2+y}
_COUNT1_A_CODES = {
    "1": 0b0000, "0101": 0b0001, "0100": 0b0010, "00101": 0b0011,
    "0110": 0b0100, "000101": 0b0101, "00100": 0b0110,
    "000100": 0b0111, "0111": 0b1000, "00011": 0b1001,
    "00110": 0b1010, "000000": 0b1011, "00111": 0b1100,
    "000010": 0b1101, "000011": 0b1110, "000001": 0b1111,
}


def _build_tree(codes: dict):
    """{bits: value} → nested [zero, one] binary tree with int leaves
    (value already packed)."""
    root: list = [None, None]
    for code, val in codes.items():
        node = root
        for i, c in enumerate(code):
            b = int(c)
            if i == len(code) - 1:
                if node[b] is not None:
                    raise AssertionError(f"code {code} collides")
                node[b] = val if isinstance(val, int) else (
                    val[0] * 16 + val[1])
            else:
                if node[b] is None:
                    node[b] = [None, None]
                node = node[b]
                if isinstance(node, int):
                    raise AssertionError(f"code {code} under a leaf")
    return _freeze(root, "")


def _freeze(node, path):
    if node is None:
        raise AssertionError(f"incomplete prefix code at {path!r}")
    if isinstance(node, int):
        return node
    return (_freeze(node[0], path + "0"), _freeze(node[1], path + "1"))


def _validate():
    for t, codes in _CODE_TABLES.items():
        kraft = sum(2.0 ** -len(c) for c in codes)
        if abs(kraft - 1.0) > 1e-12:
            raise AssertionError(f"table {t}: Kraft sum {kraft}")
    kraft = sum(2.0 ** -len(c) for c in _COUNT1_A_CODES)
    if abs(kraft - 1.0) > 1e-12:
        raise AssertionError(f"count1 A: Kraft sum {kraft}")


_validate()

BIG_TABLES = {0: None}
for _t, _codes in _CODE_TABLES.items():
    BIG_TABLES[_t] = _build_tree(_codes)
# shared-code families: 17-23 → 16's codes, 25-31 → 24's codes
for _t in range(17, 24):
    if 16 in BIG_TABLES:
        BIG_TABLES[_t] = BIG_TABLES[16]
for _t in range(25, 32):
    if 24 in BIG_TABLES:
        BIG_TABLES[_t] = BIG_TABLES[24]

COUNT1_A = _build_tree(_COUNT1_A_CODES)

#: polyphase synthesis window D (11172-3 Table B.3), stored as the
#: canonical 257-coefficient half table of integers/65536.  VALIDATED
#: by the filterbank's near-perfect-reconstruction law: analysis (Fig
#: C.1, C = D/32) followed by synthesis (Fig A.2) reconstructs white
#: noise at 58.7 dB SNR with the textbook 481-sample delay, and NO
#: +-1/65536 tweak of ANY coefficient improves it (tests/test_mp3.py)
#: — i.e. the table is a unit-precision local optimum of the PR
#: property, which a transcription error would break.
_ENW = [
     0,    -1,    -1,    -1,    -1,    -1,    -1,    -2,    -2,    -2,
    -2,    -3,    -3,    -4,    -4,    -5,    -5,    -6,    -7,    -7,
    -8,    -9,   -10,   -11,   -13,   -14,   -16,   -17,   -19,   -21,
   -24,   -26,   -29,   -31,   -35,   -38,   -41,   -45,   -49,   -53,
   -58,   -63,   -68,   -73,   -79,   -85,   -91,   -97,  -104,  -111,
  -117,  -125,  -132,  -139,  -147,  -154,  -161,  -169,  -176,  -183,
  -190,  -196,  -202,  -208,   213,   218,   222,   225,   227,   228,
   228,   227,   224,   221,   215,   208,   200,   189,   177,   163,
   146,   127,   106,    83,    57,    29,    -2,   -36,   -72,  -111,
  -153,  -197,  -244,  -294,  -347,  -401,  -459,  -519,  -581,  -645,
  -711,  -779,  -848,  -919,  -991, -1064, -1137, -1210, -1283, -1356,
 -1428, -1498, -1567, -1634, -1698, -1759, -1817, -1870, -1919, -1962,
 -2001, -2032, -2057, -2075, -2085, -2087, -2080, -2063, -2037, -2000,
 -1952, -1893, -1822, -1739, -1644, -1535, -1414, -1280, -1131,  -970,
  -794,  -605,  -402,  -185,    45,   288,   545,   814,  1095,  1388,
  1692,  2006,  2330,  2663,  3004,  3351,  3705,  4063,  4425,  4788,
  5153,  5517,  5879,  6237,  6589,  6935,  7271,  7597,  7910,  8209,
  8491,  8755,  8998,  9219,  9416,  9585,  9727,  9838,  9916,  9959,
  9966,  9935,  9863,  9750,  9592,  9389,  9139,  8840,  8492,  8092,
  7640,  7134,  6574,  5959,  5288,  4561,  3776,  2935,  2037,  1082,
    70,  -998, -2122, -3300, -4533, -5818, -7154, -8540, -9975,-11455,
-12980,-14548,-16155,-17799,-19478,-21189,-22929,-24694,-26482,-28289,
-30112,-31947,-33791,-35640,-37489,-39336,-41176,-43006,-44821,-46617,
-48390,-50137,-51853,-53534,-55178,-56778,-58333,-59838,-61289,-62684,
-64019,-65290,-66494,-67629,-68692,-69679,-70590,-71420,-72169,-72835,
-73415,-73908,-74313,-74630,-74856,-74992,-75038]

#: sign rule recovered BY the PR search (blocks of 64 with signs
#: -,-,+,-,+,-,+,+ — pattern 0b00101011 — applied to the symmetric
#: extension): the unique per-64-block pattern achieving PR
_SIGN_PATTERN = 43


def _build_synth_window():
    w = np.zeros(512)
    for i in range(257):
        w[i] = _ENW[i] / 65536.0
        if i:
            w[512 - i] = _ENW[i] / 65536.0
    sg = np.where((_SIGN_PATTERN >> (np.arange(512) // 64)) & 1,
                  -1.0, 1.0)
    return w * sg


SYNTH_D = _build_synth_window()
