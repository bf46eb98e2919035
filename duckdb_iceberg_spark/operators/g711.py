"""ITU-T G.711 companded telephony audio: μ-law (PCMU) and A-law (PCMA).

The first COMPRESSED audio format in the multimodal family (2:1 over
PCM-16, the telephony-corpus staple). Pure-Python/numpy from the
public ITU-T G.711 spec; the segment/mantissa formulation follows the
widely-published CCITT reference code (Sun g711.c), which is the
de-facto interop standard every telephony stack reproduces bit-exactly:

- μ-law: 14-bit magnitude domain (PCM >> 2), bias 33, clip 8159,
  segment thresholds 0x3F..0x1FFF, codeword ~(sign|seg<<4|mantissa).
- A-law: 13-bit magnitude domain (PCM >> 3, negatives as -x-1),
  segment thresholds 0x1F..0xFFF, codeword (sign|seg<<4|mantissa)^0x55.

Encode is vectorized numpy (runs inside Arrow batches on executors);
decode is a 256-entry int16 lookup table — O(1) per sample, the right
shape for decoding billions of telephony frames at 100 TB.

Reference parity: the reference engine (duckdb_iceberg) has no audio
codecs; this extends the engine's multimodal feature family.
"""

from __future__ import annotations

import numpy as np

_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int64)
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int64)

_ULAW_BIAS = 0x84  # 132 in the 16-bit domain; 33 in the 14-bit domain
_ULAW_CLIP = 8159  # 14-bit magnitude clip


def ulaw_encode(samples) -> np.ndarray:
    """int16 PCM -> μ-law codewords (uint8), vectorized."""
    x = np.asarray(samples, dtype=np.int64)
    x14 = x >> 2  # arithmetic shift into the 14-bit domain
    neg = x14 < 0
    mag = np.minimum(np.where(neg, -x14, x14), _ULAW_CLIP) + 33
    mask = np.where(neg, 0x7F, 0xFF)
    seg = np.searchsorted(_SEG_UEND, mag, side="left")
    in_range = seg < 8
    seg_c = np.minimum(seg, 7)
    uval = (seg_c << 4) | ((mag >> (seg_c + 1)) & 0xF)
    return np.where(in_range, uval ^ mask, 0x7F ^ mask).astype(np.uint8)


def alaw_encode(samples) -> np.ndarray:
    """int16 PCM -> A-law codewords (uint8), vectorized."""
    x = np.asarray(samples, dtype=np.int64)
    x13 = x >> 3  # arithmetic shift into the 13-bit domain
    neg = x13 < 0
    mag = np.where(neg, -x13 - 1, x13)  # -x-1 mirrors the floor asymmetry
    mask = np.where(neg, 0x55, 0xD5)
    seg = np.searchsorted(_SEG_AEND, mag, side="left")  # always < 8 for int16
    aval = (seg << 4) | np.where(seg < 2, (mag >> 1) & 0xF, (mag >> seg) & 0xF)
    return (aval ^ mask).astype(np.uint8)


def _ulaw_decode_one(byte: int) -> int:
    u = ~byte & 0xFF
    t = ((u & 0xF) << 3) + _ULAW_BIAS
    t <<= (u & 0x70) >> 4
    return (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)


def _alaw_decode_one(byte: int) -> int:
    a = byte ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


ULAW_DECODE_TABLE = np.array([_ulaw_decode_one(b) for b in range(256)], dtype=np.int16)
ALAW_DECODE_TABLE = np.array([_alaw_decode_one(b) for b in range(256)], dtype=np.int16)


def ulaw_decode(codes) -> np.ndarray:
    """μ-law codewords (uint8) -> int16 PCM via table lookup."""
    return ULAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes) -> np.ndarray:
    """A-law codewords (uint8) -> int16 PCM via table lookup."""
    return ALAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]
