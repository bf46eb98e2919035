"""IMA/DVI ADPCM (WAVE format tag 0x11): 4-bit adaptive differential PCM.

Pure-Python/numpy implementation from the public IMA Digital Audio
Pack recommendation (the step/index tables and quantizer are the
canonical published ones; same algorithm as the `imaadpcm` codec every
container library ships). 4:1 compression over PCM-16. The reference
engine has no audio surface at all — this extends the engine's
multimodal column support (SURVEY.md LLM-pipeline family) with a
second compressed-audio codec next to G.711 (operators/g711.py).

Encoding is stateful per channel (predictor + step index); WAVE blocks
re-anchor both in a 4-byte per-channel block header (first sample
verbatim as int16, step index as uint8), so decode needs no cross-block
state. Signals whose successive differences stay on the quantizer grid
of the current step (e.g. +-1 deltas at step index 0) round-trip
EXACTLY — the property the oracle-checked entry is built on.
"""

from __future__ import annotations

import struct

import numpy as np

# canonical 89-entry step-size table (IMA ADPCM reference algorithm)
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)

INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _encode_one(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one delta; returns (code, new_pred, new_index). The
    predictor update mirrors the decoder bit-for-bit (it reconstructs
    the decoder's value, not the true sample) so encoder and decoder
    state never diverge."""
    step = int(STEP_TABLE[index])
    delta = sample - pred
    code = 0
    if delta < 0:
        code = 8
        delta = -delta
    if delta >= step:
        code |= 4
        delta -= step
    if delta >= step >> 1:
        code |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        code |= 1
    return code, *_step(code, pred, index)


def _step(code: int, pred: int, index: int) -> tuple[int, int]:
    """Decoder state transition shared by encode and decode."""
    step = int(STEP_TABLE[index])
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    pred = _clamp16(pred - diff if code & 8 else pred + diff)
    index = min(88, max(0, index + int(INDEX_TABLE[code])))
    return pred, index


def ima_encode_blocks(samples: np.ndarray, frames_per_block: int) -> bytes:
    """Encode an (N, CH) int16 array as IMA ADPCM WAVE data blocks.

    Block layout per the WAVE spec: a 4-byte header per channel (first
    frame's sample verbatim int16-LE, step index uint8, reserved 0),
    then the remaining frames_per_block-1 frames as 4-bit codes —
    mono: low nibble first; stereo: alternating 4-byte (8-code) words
    per channel. The final partial block is padded by repeating the
    last frame (code 0 at unchanged state — decoders truncate via the
    fact chunk)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    idx = [0] * ch  # step index carries ACROSS blocks (headers re-anchor it)
    out = bytearray()
    for start in range(0, n, frames_per_block):
        blk = s[start : start + frames_per_block]
        if blk.shape[0] < frames_per_block:  # pad: repeat last frame
            pad = np.repeat(blk[-1:], frames_per_block - blk.shape[0], axis=0)
            blk = np.vstack([blk, pad])
        preds = []
        for c in range(ch):
            first = int(blk[0, c])
            out += struct.pack("<hBB", first, idx[c], 0)
            preds.append(first)
        codes = [[] for _ in range(ch)]
        for f in range(1, frames_per_block):
            for c in range(ch):
                code, preds[c], idx[c] = _encode_one(int(blk[f, c]), preds[c], idx[c])
                codes[c].append(code)
        # pad each channel's code list to a multiple of 8 (one 4-byte word)
        for c in range(ch):
            while len(codes[c]) % 8:
                codes[c].append(0)  # padding codes never decode past fact count
        words = len(codes[0]) // 8
        for w in range(words):
            for c in range(ch):
                grp = codes[c][w * 8 : w * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(grp[k] | (grp[k + 1] << 4))
    return bytes(out)


def ima_decode_blocks(
    data: bytes, channels: int, block_align: int, frames_per_block: int, n_frames: int
) -> np.ndarray:
    """Decode IMA ADPCM WAVE data blocks to an (n_frames, CH) int16
    array (the fact-chunk frame count truncates final-block padding)."""
    ch = channels
    out = np.empty((0, ch), dtype=np.int16)
    rows = []
    for boff in range(0, len(data) - block_align + 1, block_align):
        blk = data[boff : boff + block_align]
        preds, idx = [], []
        for c in range(ch):
            p, i, _r = struct.unpack_from("<hBB", blk, c * 4)
            preds.append(int(p))
            idx.append(min(88, max(0, int(i))))
        frames = np.empty((frames_per_block, ch), dtype=np.int16)
        frames[0] = preds
        body = blk[ch * 4 :]
        # per-channel code streams: mono is contiguous nibbles; multi-
        # channel interleaves 4-byte words per channel
        nwords = len(body) // (4 * ch)
        codes = [[] for _ in range(ch)]
        for w in range(nwords):
            for c in range(ch):
                word = body[(w * ch + c) * 4 : (w * ch + c) * 4 + 4]
                for b in word:
                    codes[c].append(b & 0xF)
                    codes[c].append(b >> 4)
        for f in range(1, frames_per_block):
            for c in range(ch):
                if f - 1 < len(codes[c]):
                    preds[c], idx[c] = _step(codes[c][f - 1], preds[c], idx[c])
                frames[f, c] = preds[c]
        rows.append(frames)
    if rows:
        out = np.vstack(rows)
    return out[:n_frames]


# ---------------------------------------------------------------------------
# Microsoft ADPCM (WAVE format tag 0x0002)
# ---------------------------------------------------------------------------
# Public WAVEFORMAT_ADPCM spec: per-block header carries a predictor-
# coefficient index, the initial quantizer step (idelta) and the two
# seed samples VERBATIM per channel; the body is signed 4-bit codes,
# HIGH nibble first, channels alternating nibbles when stereo.

MS_ADAPTATION = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]
MS_COEF1 = [256, 512, 0, 192, 240, 460, 392]
MS_COEF2 = [0, -256, 0, 64, 0, -208, -232]


def _ms_predict(s1: int, s2: int, c1: int, c2: int) -> int:
    # floor-toward-negative-infinity semantics: C's / on negatives
    # truncates, but every shipping decoder uses >> 8 on the signed
    # product — arithmetic shift, i.e. floor division
    return (s1 * c1 + s2 * c2) >> 8


def ms_encode_blocks(
    samples: np.ndarray,
    frames_per_block: int,
    predictor: int = 0,
    idelta0: int = 16,
) -> bytes:
    """Encode an (N, CH) int16 array as MS ADPCM blocks (one coefficient
    pair for all blocks — real encoders score all 7; any choice is
    spec-valid and self-describing via the header). The final partial
    block is padded by repeating the last frame."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    c1, c2 = MS_COEF1[predictor], MS_COEF2[predictor]
    out = bytearray()
    for start in range(0, n, frames_per_block):
        blk = s[start : start + frames_per_block]
        if blk.shape[0] < frames_per_block:
            pad = np.repeat(blk[-1:], frames_per_block - blk.shape[0], axis=0)
            blk = np.vstack([blk, pad])
        # header: bPredictor per channel, iDelta per channel,
        # iSamp1 (t-1) per channel, iSamp2 (t-2) per channel.
        # Decoded output order is iSamp2 FIRST, then iSamp1 — so seed
        # iSamp2 = frame 0, iSamp1 = frame 1.
        idelta = [idelta0] * ch
        samp2 = [int(blk[0, c]) for c in range(ch)]
        samp1 = [int(blk[1, c]) for c in range(ch)]
        for c in range(ch):
            out.append(predictor)
        for c in range(ch):
            out += struct.pack("<h", idelta[c])
        for c in range(ch):
            out += struct.pack("<h", samp1[c])
        for c in range(ch):
            out += struct.pack("<h", samp2[c])
        codes = []
        for f in range(2, frames_per_block):
            for c in range(ch):
                pred = _ms_predict(samp1[c], samp2[c], c1, c2)
                delta = int(blk[f, c]) - pred
                code = max(-8, min(7, int(round(delta / idelta[c]))))
                new = _clamp16(pred + idelta[c] * code)
                samp2[c], samp1[c] = samp1[c], new
                idelta[c] = max(16, (idelta[c] * MS_ADAPTATION[code & 0xF]) >> 8)
                codes.append(code & 0xF)
        if len(codes) % 2:
            codes.append(0)
        for i in range(0, len(codes), 2):
            out.append((codes[i] << 4) | codes[i + 1])  # HIGH nibble first
    return bytes(out)


def ms_decode_blocks(
    data: bytes, channels: int, block_align: int, frames_per_block: int, n_frames: int
) -> np.ndarray:
    """Decode MS ADPCM blocks to an (n_frames, CH) int16 array."""
    ch = channels
    rows = []
    for boff in range(0, len(data) - block_align + 1, block_align):
        blk = data[boff : boff + block_align]
        preds = [blk[c] for c in range(ch)]
        # bPredictor indexes the standard 7-entry coefficient table; a
        # file declaring custom coefficient pairs (predictor >= 7 with
        # wNumCoef > 7) must hit the unsupported-codec fallback, not
        # silently decode with a wrapped-around coefficient pair.
        for p in preds:
            if p >= len(MS_COEF1):
                raise ValueError(
                    f"MS ADPCM predictor index {p} >= {len(MS_COEF1)}: "
                    "custom coefficient tables are not supported"
                )
        pos = ch
        idelta = list(struct.unpack_from(f"<{ch}h", blk, pos))
        pos += 2 * ch
        samp1 = list(struct.unpack_from(f"<{ch}h", blk, pos))
        pos += 2 * ch
        samp2 = list(struct.unpack_from(f"<{ch}h", blk, pos))
        pos += 2 * ch
        frames = np.empty((frames_per_block, ch), dtype=np.int16)
        frames[0] = samp2
        frames[1] = samp1
        nib = []
        for b in blk[pos:]:
            nib.append(b >> 4)
            nib.append(b & 0xF)
        k = 0
        for f in range(2, frames_per_block):
            for c in range(ch):
                code4 = nib[k] if k < len(nib) else 0
                k += 1
                code = code4 - 16 if code4 > 7 else code4  # sign-extend
                c1, c2 = MS_COEF1[preds[c]], MS_COEF2[preds[c]]
                pred = _ms_predict(samp1[c], samp2[c], c1, c2)
                new = _clamp16(pred + idelta[c] * code)
                samp2[c], samp1[c] = samp1[c], new
                idelta[c] = max(16, (idelta[c] * MS_ADAPTATION[code4]) >> 8)
                frames[f, c] = new
        rows.append(frames)
    out = np.vstack(rows) if rows else np.empty((0, ch), dtype=np.int16)
    return out[:n_frames]
