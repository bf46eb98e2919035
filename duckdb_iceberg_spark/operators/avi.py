"""MJPEG-in-AVI video container: RIFF 'AVI ' with Motion-JPEG frames.

The first REAL video *file* format in the multimodal family: an AVI is
a RIFF container (the same chunk grammar as WAVE, already walked by
``decode_wav``) whose 'movi' list carries one baseline-JPEG image per
frame ('00dc' chunks, handler 'MJPG') — so the existing from-spec T.81
codec (operators/jpeg.py) does all the pixel work and this module only
implements the public container layout (Microsoft AVI RIFF form:
hdrl(avih, strl(strh, strf=BITMAPINFOHEADER)) + movi + idx1).

Reference parity: the reference engine (duckdb_iceberg) has no video
codecs; this extends the engine's multimodal feature family with the
one compressed-video format expressible from already-present parts.
"""

from __future__ import annotations

import struct

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF word alignment
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 95) -> bytes:
    """Encode a list of (H, W, 3) uint8 arrays as an MJPEG AVI."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    # AVISTREAMHEADER: fccType/fccHandler + dwFlags, wPriority,
    # wLanguage, dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize + rcFrame (4 WORDs)
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate = frame duration
            0,  # dwStart
            len(jpegs),  # dwLength (frames)
            max_sz,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = one sample per chunk)
            0, 0, w, h,  # rcFrame
        )
    )
    bmih = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", bmih))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_chunks, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for j in jpegs:
        c = _chunk(b"00dc", j)
        movi_chunks.append(c)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))  # AVIIF_KEYFRAME
        off += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) for each RIFF chunk in range."""
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        yield tag, pos + 8, length
        pos += 8 + length + (length & 1)


def decode_avi_mjpeg(payload: bytes):
    """Decode an MJPEG AVI payload to a list of (H, W, 3) uint8 frames.

    Walks the RIFF chunk tree to the 'movi' list and decodes every
    video-data chunk ('##dc'/'##db') with the T.81 decoder; tolerates
    extra chunks (JUNK padding, idx1, additional streams). Raises
    ValueError on non-AVI payloads or non-JPEG frame data — callers
    fall back to the stub feature, same contract as the other codecs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames = []
    for tag, start, length in _walk(payload, 12, len(payload)):
        if tag != b"LIST" or payload[start : start + 4] != b"movi":
            continue
        for ctag, cstart, clen in _walk(payload, start + 4, start + length):
            if ctag[2:4] in (b"dc", b"db"):
                frames.append(decode_jpeg(payload[cstart : cstart + clen]))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames
