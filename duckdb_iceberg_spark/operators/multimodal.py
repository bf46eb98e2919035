"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payloads plus a typed metadata struct —
the storage model a 100 TB multimodal corpus uses (payload bytes in
parquet, metadata columns for pruning). The Spark-side plumbing —
schema, Arrow-batched ``mapInPandas`` UDFs, batch shapes, partition
behavior — is real and tested; image decode/resize is REAL for
BMP, PPM, PNG (stdlib zlib), and baseline JPEG (operators/jpeg.py —
full T.81 baseline decode incl. 4:2:0 subsampling and restart
markers; verified against libjpeg-produced files). Audio decode is
REAL for RIFF/WAVE PCM-16 (pure stdlib struct parsing below);
compressed audio and video are stubbed (those libraries are not in
this container) behind ``_decode_payload``: a clearly-marked
deterministic fake, with the real-library hook raising
``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (payload = utf-8 text bytes; metadata derived from doc_id) — lets
    the multimodal path run on the driver's fixtures."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("format"),
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# real image codecs (pure Python/numpy — no PIL needed): 24-bit
# uncompressed BMP (BI_RGB, bottom-up), binary PPM (P6), and PNG
# (stdlib zlib inflate + the five scanline filters, per the public
# W3C/RFC 2083 spec; 8-bit gray/RGB/RGBA, non-interlaced). JPEG and
# audio/video still route to the documented NotImplementedError hook
# below.
# ---------------------------------------------------------------------------

import struct as _struct
import zlib as _zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        _struct.pack(">I", len(data))
        + tag
        + data
        + _struct.pack(">I", _zlib.crc32(tag + data))
    )


def encode_png(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG
    (filter 0 scanlines, one zlib IDAT, no interlace)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit non-interlaced PNG (grayscale, RGB, or RGBA —
    color types 0/2/6) to an (H, W, 3) uint8 RGB array: chunk walk,
    zlib inflate of the concatenated IDATs, then per-scanline
    unfiltering (None/Sub/Up/Average/Paeth). Gray replicates to three
    channels; alpha is dropped. Raises ValueError on anything the
    baseline profile doesn't cover (16-bit, palette, interlace)."""
    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,), tag = _struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
        )
    raw = _zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: per-byte cumsum along x with stride bpp
            cur = line.copy().reshape(-1, bpp)
            np.cumsum(cur, axis=0, dtype=np.uint8, out=cur)
            cur = cur.reshape(-1)
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    cur[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = _struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    return header + info + bytes(body)


def decode_image(payload: bytes):
    """Decode a BMP (24-bit BI_RGB), PPM (P6), PNG (8-bit
    gray/RGB/RGBA, non-interlaced), or baseline JPEG payload to an
    (H, W, 3) uint8 RGB numpy array. Raises ValueError on anything
    else (callers fall back to the stub feature)."""
    import numpy as np

    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(payload)[0]  # still image = first frame
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except ValueError:
            raise
        except Exception as ex:  # truncated/corrupt stream -> uniform error type
            raise ValueError(f"corrupt JPEG payload: {ex}") from ex
    if payload[:2] == b"BM":
        off, = _struct.unpack_from("<I", payload, 10)
        hdr_size, w, h, planes, bpp, comp = _struct.unpack_from("<IiiHHI", payload, 14)
        if bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
        bottom_up = h > 0
        h = abs(h)
        row = w * 3
        stride = row + ((-row) % 4)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for i in range(h):
            y = (h - 1 - i) if bottom_up else i
            line = np.frombuffer(payload, dtype=np.uint8, count=row, offset=off + i * stride)
            out[y] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
        return out
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
        pos, fields = 2, []
        while len(fields) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3).copy()
    raise ValueError("not a BMP/PPM payload")


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode an (N,) or (N, CH) int16 sample array as a RIFF/WAVE
    PCM-16 file (the public canonical WAVE layout: RIFF header, 16-byte
    PCM fmt chunk, one data chunk; interleaved frames)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    data = s.tobytes()  # row-major == interleaved frames
    fmt = _struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def encode_wav_pcm(samples, sample_rate: int, depth: str = "s16") -> bytes:
    """Encode an (N,) or (N, CH) int16 sample array as RIFF/WAVE PCM at
    an alternate bit depth: ``u8`` (unsigned, offset-128 — top 8 bits),
    ``s24`` / ``s32`` (little-endian, int16 value in the TOP bytes, the
    WAV convention for widened PCM), or ``f32`` (IEEE-float format tag
    3, value/32768 — exact for every int16). All four depths decode
    back to the original int16 exactly (u8 exactly when the sample is a
    multiple of 256)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    if depth == "u8":
        data = ((s.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        tag, bits = 1, 8
    elif depth == "s24":
        wide = (s.astype(np.int32) << 8).astype("<i4").tobytes()
        # drop the high byte of each 4-byte word -> 3-byte LE samples
        data = b"".join(wide[i : i + 3] for i in range(0, len(wide), 4))
        tag, bits = 1, 24
    elif depth == "s32":
        data = (s.astype(np.int32) << 16).astype("<i4").tobytes()
        tag, bits = 1, 32
    elif depth == "f32":
        data = (s.astype(np.float32) / np.float32(32768.0)).astype("<f4").tobytes()
        tag, bits = 3, 32
    else:
        raise ValueError(f"unsupported PCM depth: {depth}")
    frame = ch * bits // 8
    fmt = _struct.pack("<HHIIHH", tag, ch, sample_rate, sample_rate * frame, frame, bits)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def encode_wav_g711(samples, sample_rate: int, law: str = "ulaw") -> bytes:
    """Encode an (N,) or (N, CH) int16 sample array as a RIFF/WAVE
    G.711 file (format tag 7 = μ-law / 6 = A-law, 8 bits per sample,
    2:1 over PCM-16). Includes the fact chunk the WAVE spec requires
    for compressed formats and an 18-byte fmt chunk (cbSize=0)."""
    import numpy as np

    from .g711 import alaw_encode, ulaw_encode

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    fmt_code, enc = {"ulaw": (7, ulaw_encode), "alaw": (6, alaw_encode)}[law]
    data = enc(s).tobytes()  # row-major == interleaved frames
    fmt = _struct.pack(
        "<HHIIHHH", fmt_code, ch, sample_rate, sample_rate * ch, ch, 8, 0
    )
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"fact" + _struct.pack("<II", 4, s.shape[0])
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def encode_wav_ima(samples, sample_rate: int, frames_per_block: int = 65) -> bytes:
    """Encode an (N,) or (N, CH) int16 sample array as a RIFF/WAVE
    IMA/DVI ADPCM file (format tag 0x11, 4 bits per sample, 4:1 over
    PCM-16). frames_per_block - 1 must be a multiple of 8 (one 4-byte
    code word per channel); the fmt chunk carries the cbSize=2
    wSamplesPerBlock extension and the fact chunk the true frame count
    (the final block is padded)."""
    import numpy as np

    from .adpcm import ima_encode_blocks

    if (frames_per_block - 1) % 8:
        raise ValueError("frames_per_block - 1 must be a multiple of 8")
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    block_align = 4 * ch + (frames_per_block - 1) // 2 * ch
    data = ima_encode_blocks(s, frames_per_block)
    byte_rate = sample_rate * block_align // frames_per_block
    fmt = _struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate, byte_rate, block_align, 4, 2,
        frames_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"fact" + _struct.pack("<II", 4, s.shape[0])
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def encode_wav_msadpcm(samples, sample_rate: int, frames_per_block: int = 66) -> bytes:
    """Encode an (N,) or (N, CH) int16 sample array as a RIFF/WAVE
    Microsoft ADPCM file (format tag 0x0002, 4 bits per sample).
    frames_per_block must be even (whole code bytes per channel). The
    fmt chunk carries the full WAVEFORMAT_ADPCM extension
    (wSamplesPerBlock, wNumCoef=7, the 7 published coefficient pairs)
    and the fact chunk the true frame count."""
    import numpy as np

    from .adpcm import MS_COEF1, MS_COEF2, ms_encode_blocks

    if frames_per_block % 2:
        raise ValueError("frames_per_block must be even")
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    block_align = 7 * ch + (frames_per_block - 2) // 2 * ch
    data = ms_encode_blocks(s, frames_per_block)
    byte_rate = sample_rate * block_align // frames_per_block
    ext = _struct.pack("<HH", frames_per_block, 7)
    for c1, c2 in zip(MS_COEF1, MS_COEF2):
        ext += _struct.pack("<hh", c1, c2)
    fmt = _struct.pack(
        "<HHIIHHH", 0x0002, ch, sample_rate, byte_rate, block_align, 4, len(ext)
    ) + ext
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"fact" + _struct.pack("<II", 4, s.shape[0])
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE payload to ((N_frames, CH) int16 array,
    sample_rate). Handles PCM-16 (format 1), G.711 μ-law/A-law
    (formats 7/6, 8-bit — expanded to int16 via the operators.g711
    lookup tables), and IMA/DVI ADPCM (format 0x11, 4-bit — decoded by
    operators.adpcm). Walks the chunk list (tolerates extra chunks like
    LIST/INFO, odd-length chunk padding per the RIFF spec; the fact
    chunk truncates ADPCM final-block padding);
    raises ValueError on other codecs — callers fall back to the stub
    feature, same contract as the image codecs."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_chunk, data, fact_frames = 12, None, b"", None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = _struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", chunk, 0)
            fmt_chunk = chunk
        elif tag == b"data":
            data = chunk
        elif tag == b"fact" and length >= 4:
            (fact_frames,) = _struct.unpack_from("<I", chunk, 0)
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format == 0x0002 and bits == 4:
        from .adpcm import ms_decode_blocks

        if len(fmt_chunk) >= 20:
            (frames_per_block,) = _struct.unpack_from("<H", fmt_chunk, 18)
        else:
            frames_per_block = (_block_align - 7 * ch) * 2 // ch + 2
        n_blocks = len(data) // _block_align
        total = n_blocks * frames_per_block
        n = fact_frames if fact_frames is not None and fact_frames <= total else total
        return ms_decode_blocks(data, ch, _block_align, frames_per_block, n), rate
    if audio_format == 0x11 and bits == 4:
        from .adpcm import ima_decode_blocks

        if len(fmt_chunk) >= 20:
            (frames_per_block,) = _struct.unpack_from("<H", fmt_chunk, 18)
        else:  # derive from block geometry when the extension is absent
            frames_per_block = (_block_align - 4 * ch) * 2 // ch + 1
        n_blocks = len(data) // _block_align
        total = n_blocks * frames_per_block
        n = fact_frames if fact_frames is not None and fact_frames <= total else total
        return ima_decode_blocks(data, ch, _block_align, frames_per_block, n), rate
    if audio_format == 1 and bits == 16:
        n = len(data) // (2 * ch)
        s = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
        return s, rate
    if audio_format == 1 and bits == 8:
        # unsigned offset-128 PCM: top 8 bits of the int16 range
        n = len(data) // ch
        u = np.frombuffer(data, dtype=np.uint8, count=n * ch).astype(np.int16)
        return ((u - 128) << 8).reshape(n, ch), rate
    if audio_format == 1 and bits == 24:
        n = len(data) // (3 * ch)
        raw = np.frombuffer(data, dtype=np.uint8, count=n * ch * 3).reshape(-1, 3)
        v = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend 24-bit
        return (v >> 8).astype(np.int16).reshape(n, ch), rate
    if audio_format == 1 and bits == 32:
        n = len(data) // (4 * ch)
        v = np.frombuffer(data, dtype="<i4", count=n * ch)
        return (v >> 16).astype(np.int16).reshape(n, ch), rate
    if audio_format == 3 and bits == 32:
        # IEEE float in [-1, 1): scale to int16 with round-half-even
        n = len(data) // (4 * ch)
        f = np.frombuffer(data, dtype="<f4", count=n * ch).astype(np.float64)
        v = np.clip(np.rint(f * 32768.0), -32768, 32767)
        return v.astype(np.int16).reshape(n, ch), rate
    if audio_format in (6, 7) and bits == 8:
        from .g711 import ALAW_DECODE_TABLE, ULAW_DECODE_TABLE

        table = ULAW_DECODE_TABLE if audio_format == 7 else ALAW_DECODE_TABLE
        n = len(data) // ch
        codes = np.frombuffer(data, dtype=np.uint8, count=n * ch)
        return table[codes].reshape(n, ch), rate
    raise ValueError(f"unsupported WAVE: format={audio_format} bits={bits}")


def _audio_feature(samples, rate: int) -> list[float]:
    """8-dim feature of decoded PCM audio. Every slot is a small
    integer scaled by a power of two (exact in float32), so an entry
    can invert the normalization losslessly: rms/32768, peak/32768,
    n_frames/65536, zero_crossings/65536 (first channel, strict sign
    flips), rate/65536, channels/8, mean/32768, energy Σx²/2^32
    (power-of-two scaled like the rest; float32-exact whenever
    Σx² < 2^24 — the ADPCM entry's fixtures are sized for that)."""
    import numpy as np

    x = samples.astype(np.float64)
    n = x.shape[0]
    c0 = x[:, 0]
    flips = int(np.count_nonzero(c0[1:] * c0[:-1] < 0))
    return [
        float(np.sqrt(np.mean(x * x))) / 32768.0,
        float(np.max(np.abs(x))) / 32768.0,
        n / 65536.0,
        flips / 65536.0,
        rate / 65536.0,
        samples.shape[1] / 8.0,
        float(np.mean(x)) / 32768.0,
        float(np.sum(x * x)) / 4294967296.0,
    ]


def _image_feature(px) -> list[float]:
    """8-dim feature of a decoded image: per-channel means (RGB,
    normalized), dims, pixel count — every term has a closed form the
    DuckDB oracle recomputes analytically for generated fixtures."""
    h, w = px.shape[0], px.shape[1]
    means = px.reshape(-1, 3).mean(axis=0)
    return [
        float(means[0]) / 255.0,
        float(means[1]) / 255.0,
        float(means[2]) / 255.0,
        w / 256.0,
        h / 256.0,
        (w * h) / 65536.0,
        0.0,
        0.0,
    ]


def _is_image_magic(payload: bytes) -> bool:
    return bool(payload) and (
        payload[:2] in (b"BM", b"P6", b"\xff\xd8")
        or payload[:8] == _PNG_SIG
        or payload[:4] == b"GIF8"
    )


def _is_wav_magic(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _decode_payload(media_type: str, payload: bytes, use_real_codecs: bool = False) -> list[float]:
    """Feature extraction: REAL decode for BMP/PPM/PNG/baseline-JPEG
    image payloads (pure-Python codecs above + operators/jpeg.py) and
    RIFF/WAVE PCM-16 audio; other formats are stubbed — the
    deterministic fake derives an 8-dim feature from the payload
    digest, so the distributed plumbing is fully exercised and results
    are reproducible. ``use_real_codecs=True`` makes undecodable
    payloads raise instead of falling back (the librosa/av hook for
    compressed audio and video)."""
    if media_type == "image" and _is_image_magic(payload):
        try:
            return _image_feature(decode_image(payload))
        except Exception:
            # magic-bytes false positive OR corrupt payload: the codecs
            # surface zlib.error / struct.error / IndexError on truncated
            # streams, not only ValueError — all mean "not decodable",
            # never fail the Spark task for one bad row.
            pass
    if media_type == "audio" and _is_wav_magic(payload):
        try:
            return _audio_feature(*decode_wav(payload))
        except Exception:
            pass  # non-PCM / truncated / corrupt WAV -> stub feature
    if use_real_codecs:
        raise NotImplementedError(
            "BMP/PPM/PNG/baseline-JPEG and WAVE-PCM decode natively; plug "
            "librosa/av into _decode_payload here for compressed audio/video"
        )
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def _ramp_pixels(did: int):
    """The shared synthetic image: pixel(x, y) channels are modular
    ramps — R=(id+x+y)%256, G=(id+y)%256, B=(id+x)%256, dims
    w=id%16+8, h=id%12+8 — so every statistic of the DECODED image has
    a closed form a SQL oracle can recompute analytically."""
    import numpy as np

    w, h = did % 16 + 8, did % 12 + 8
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return np.stack(
        [
            (did + x + y) % 256,  # R
            np.broadcast_to((did + y) % 256, (h, w)),  # G
            np.broadcast_to((did + x) % 256, (h, w)),  # B
        ],
        axis=-1,
    ).astype(np.uint8)


def _synth_image_media(documents: DataFrame, fmt: str) -> DataFrame:
    """Deterministic REAL-codec media derived from doc_id (see
    :func:`_ramp_pixels` for the closed-form pixel law). The payloads
    are genuine BMP or PNG files; the feature path exercises the real
    codec, not the digest stub."""

    if fmt == "jpeg":
        from .jpeg import encode_jpeg

        enc = lambda px: encode_jpeg(px, quality=95)  # noqa: E731
    elif fmt == "jpeg_prog":
        from .jpeg import encode_jpeg_progressive

        enc = lambda px: encode_jpeg_progressive(px, quality=95)  # noqa: E731
    else:
        enc = {"bmp": encode_bmp, "png": encode_png}[fmt]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _ramp_pixels(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "image",
                        "payload": enc(px),
                        "meta": {
                            "format": fmt,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "duration_ms": 0,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def _square_wave(did: int):
    """The shared synthetic audio signal: a ±A square wave whose every
    statistic has a closed form a SQL oracle can recompute from the id
    alone — A = (id%100+1)*300, half-period P = id%20+2 samples,
    n = 2*P*(id%30+5) frames (whole periods, so the mean is exactly 0,
    RMS is exactly A, and strict sign flips = (n-1)//P = 2*(id%30+5)-1),
    channels = id%2+1 (stereo duplicates the channel), rate 16000."""
    import numpy as np

    amp = (did % 100 + 1) * 300
    half = did % 20 + 2
    n = 2 * half * (did % 30 + 5)
    ch = did % 2 + 1
    i = np.arange(n)
    s = np.where((i // half) % 2 == 0, amp, -amp).astype(np.int16)
    return np.repeat(s[:, None], ch, axis=1), 16000


def synth_wav_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec audio media derived from doc_id (see
    :func:`_square_wave` for the closed-form signal law). The payloads
    are genuine RIFF/WAVE PCM-16 files; the feature path exercises the
    real WAV parser, not the digest stub."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                s, rate = _square_wave(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "audio",
                        "payload": encode_wav(s, rate),
                        "meta": {
                            "format": "wav",
                            "width": 0,
                            "height": 0,
                            "duration_ms": s.shape[0] * 1000 // rate,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def _g711_wave(did: int):
    """Square wave for the G.711 entries: same period/frame/channel law
    as :func:`_square_wave`, but amplitude A = (id%100+1)*8 + 4 — ALWAYS
    divisible by 4 (so the μ-law >>2 floors identically for ±A) and
    NEVER divisible by 8 (so the A-law >>3 with its -x-1 negative
    mirror lands both signs in the same quantization cell). Both laws
    then decode ±A to exactly ±A' — mean stays exactly 0, RMS == peak
    == A', and A' has the closed companding form a SQL oracle
    recomputes (segment + mantissa arithmetic on A alone)."""
    import numpy as np

    amp = (did % 100 + 1) * 8 + 4
    half = did % 20 + 2
    n = 2 * half * (did % 30 + 5)
    ch = did % 2 + 1
    i = np.arange(n)
    s = np.where((i // half) % 2 == 0, amp, -amp).astype(np.int16)
    return np.repeat(s[:, None], ch, axis=1), 8000


def synth_g711_media(documents: DataFrame, law: str = "ulaw") -> DataFrame:
    """Deterministic REAL-codec compressed audio media: genuine
    RIFF/WAVE G.711 μ-law or A-law files of the closed-form square
    wave (see :func:`_g711_wave`), one per doc_id."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                s, rate = _g711_wave(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "audio",
                        "payload": encode_wav_g711(s, rate, law=law),
                        "meta": {
                            "format": law,
                            "width": 0,
                            "height": 0,
                            "duration_ms": s.shape[0] * 1000 // rate,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def _adpcm_wave(did: int):
    """Triangle wave for the IMA ADPCM entry, EXACT under the codec by
    construction: period 2P with P = 8 + 2*(id%8) (even), values
    (i mod 2P <= P ? i mod 2P : 2P - i mod 2P) - P/2 — every successive
    delta is ±1, which the IMA quantizer represents exactly at step
    index 0 (step 7: code 1 → diff 7>>2 = 1) and the index transition
    for codes 0/1 is -1 (clamped at 0), so the index stays pinned and
    the reconstruction equals the input sample-for-sample. Block
    headers re-anchor the first sample of every block verbatim. The
    stereo channel is the negated wave (deltas ∓1, equally exact).
    Whole periods only, P even → mean is exactly 0; the signal crosses
    zero ON a sample, so strict sign flips are exactly 0."""
    import numpy as np

    p = 8 + 2 * (did % 8)
    reps = did % 10 + 2
    ch = did % 2 + 1
    i = np.arange(2 * p * reps)
    r = i % (2 * p)
    v = (np.where(r <= p, r, 2 * p - r) - p // 2).astype(np.int16)
    s = v[:, None] if ch == 1 else np.stack([v, -v], axis=1)
    return s, 8000


def synth_pcm_depth_media(documents: DataFrame) -> DataFrame:
    """Deterministic PCM media across the four alternate WAV sample
    depths (u8 / s24 / s32 / f32 by doc_id % 4): the square wave with
    amplitude (id%100+1)*256 — a multiple of 256, so even the 8-bit
    offset-128 path round-trips exactly and every depth decodes to the
    identical int16 signal; all features share one closed form."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        depths = ["u8", "s24", "s32", "f32"]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                amp = (did % 100 + 1) * 256
                half = did % 20 + 2
                n = 2 * half * (did % 30 + 5)
                ch = did % 2 + 1
                i = np.arange(n)
                s = np.where((i // half) % 2 == 0, amp, -amp).astype(np.int16)
                s = np.repeat(s[:, None], ch, axis=1)
                depth = depths[did % 4]
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "audio",
                        "payload": encode_wav_pcm(s, 16000, depth),
                        "meta": {
                            "format": f"pcm_{depth}",
                            "width": 0,
                            "height": 0,
                            "duration_ms": n * 1000 // 16000,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def _msadpcm_wave(did: int):
    """16x-scaled triangle wave for the MS ADPCM entry, EXACT under
    the codec by construction: with coefficient pair 0 (pred = prev
    sample) every successive delta is ±16 = ±1 * idelta at the spec's
    idelta floor of 16, so code ±1 reconstructs exactly AND the step
    adaptation for |code| <= 3 (ratio 230/256, integer >> 8, then the
    max(16, ·) floor) keeps idelta PINNED at 16 — both block seed
    samples are stored verbatim anyway. Same period/channel law as the
    IMA fixture (:func:`_adpcm_wave`), amplitude x16; energy stays
    under 2^24 so the float32 energy slot is exact."""
    import numpy as np

    s, rate = _adpcm_wave(did)
    return (s.astype(np.int32) * 16).astype(np.int16), rate


def synth_msadpcm_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec compressed audio media: genuine
    RIFF/WAVE Microsoft ADPCM files (operators/adpcm.py — signed 4-bit
    codes against the published 7-pair predictor table, multi-block,
    two seed samples per channel per block header) of the closed-form
    scaled triangle wave (:func:`_msadpcm_wave`), one per doc_id."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                s, rate = _msadpcm_wave(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "audio",
                        "payload": encode_wav_msadpcm(s, rate),
                        "meta": {
                            "format": "ms_adpcm",
                            "width": 0,
                            "height": 0,
                            "duration_ms": s.shape[0] * 1000 // rate,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def synth_adpcm_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec compressed audio media: genuine
    RIFF/WAVE IMA ADPCM files (operators/adpcm.py — 4-bit adaptive
    quantizer codes, multi-block with per-channel headers) of the
    closed-form triangle wave (:func:`_adpcm_wave`), one per doc_id."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                s, rate = _adpcm_wave(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "audio",
                        "payload": encode_wav_ima(s, rate),
                        "meta": {
                            "format": "ima_adpcm",
                            "width": 0,
                            "height": 0,
                            "duration_ms": s.shape[0] * 1000 // rate,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def synth_bmp_media(documents: DataFrame) -> DataFrame:
    return _synth_image_media(documents, "bmp")


def synth_png_media(documents: DataFrame) -> DataFrame:
    return _synth_image_media(documents, "png")


def synth_jpeg_media(documents: DataFrame) -> DataFrame:
    return _synth_image_media(documents, "jpeg")


def synth_jpeg_progressive_media(documents: DataFrame) -> DataFrame:
    """Progressive (SOF2) twin of :func:`synth_jpeg_media`: same
    quantized coefficients emitted through the Annex-G scan script, so
    decode is bit-identical to the baseline stream's."""
    return _synth_image_media(documents, "jpeg_prog")


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas keeps the binary payloads off the driver and processes
    them partition-local in Arrow batches — the correct shape for
    payloads that are MBs each at 100 TB total.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(mt, pl)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (decode stubbed; timestamps computed JVM-side from metadata)."""
    video = media.where(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("h", T.LongType()),
        T.StructField("gray_sum", T.LongType()),
    ]
)


def _gray_gif_frames(did: int):
    """The shared synthetic moving picture: grayscale modular-ramp
    frames (value (did + 131*f + x + y) % 256 at frame f), dims from
    the image law (w=did%16+8, h=did%12+8), did%5+2 frames — every
    per-frame statistic has a closed form a SQL oracle recomputes."""
    import numpy as np

    w, h = did % 16 + 8, did % 12 + 8
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    out = []
    for f in range(did % 5 + 2):
        g = ((did + 131 * f + x + y) % 256).astype(np.uint8)
        out.append(np.repeat(g[:, :, None], 3, axis=2))
    return out


def synth_gif_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec video media: genuine animated GIF89a
    payloads (operators/gif.py) of the closed-form grayscale ramp
    frames, one per doc_id."""
    import numpy as np

    from .gif import encode_gif

    grays = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = _gray_gif_frames(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "video",
                        "payload": encode_gif(frames, 10, palette=grays),
                        "meta": {
                            "format": "gif",
                            "width": frames[0].shape[1],
                            "height": frames[0].shape[0],
                            "duration_ms": len(frames) * 100,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame extraction: decode animated-GIF payloads on the
    executors (Arrow-batched mapInPandas, payloads never leave the
    workers) and keep every ``every_n``-th frame, emitting per-frame
    dims + grayscale pixel sum — the decode-then-subsample shape a
    vision-pipeline frame sampler runs at 100 TB. Non-GIF payloads
    raise (compressed video is the documented av hook)."""
    from .gif import decode_gif

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "w", "h", "gray_sum")}
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                for fi, frame in enumerate(decode_gif(pl)):
                    if fi % every_n:
                        continue
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["w"].append(frame.shape[1])
                    out["h"].append(frame.shape[0])
                    # all three channels equal for grayscale sources;
                    # sum channel 0 (int64 — no uint8 overflow)
                    out["gray_sum"].append(int(frame[:, :, 0].astype("int64").sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, FRAME_SCHEMA)


def synth_avi_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec video media: genuine MJPEG AVI payloads
    (operators/avi.py container + operators/jpeg.py T.81 frames, q95)
    of the same closed-form grayscale ramp frames as the GIF entry."""
    from .avi import encode_avi_mjpeg

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = _gray_gif_frames(did)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "video",
                        "payload": encode_avi_mjpeg(frames, fps=10),
                        "meta": {
                            "format": "avi",
                            "width": frames[0].shape[1],
                            "height": frames[0].shape[0],
                            "duration_ms": len(frames) * 100,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


FRAME_MEAN_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("h", T.LongType()),
        T.StructField("gray_mean", T.DoubleType()),
    ]
)


def sample_frames_avi(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video-file frame extraction: decode MJPEG AVI payloads on
    the executors (RIFF walk + per-frame T.81 decode, Arrow-batched
    mapInPandas) and keep every ``every_n``-th frame, emitting per-frame
    dims + grayscale channel mean. JPEG frames are lossy, so the
    emitted statistic is a float mean the caller bounds against the
    closed form (the mm_features_jpeg contract), unlike the exact GIF
    pixel sums."""
    from .avi import decode_avi_mjpeg

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "w", "h", "gray_mean")}
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                for fi, frame in enumerate(decode_avi_mjpeg(pl)):
                    if fi % every_n:
                        continue
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["w"].append(frame.shape[1])
                    out["h"].append(frame.shape[0])
                    out["gray_mean"].append(float(frame[:, :, 0].astype("float64").mean()))
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, FRAME_MEAN_SCHEMA)


def resize_pixels(px, w: int, h: int):
    """Nearest-neighbor resize of an (H, W, 3) array to (h, w, 3) —
    numpy fancy-indexing, no PIL (the same pixel-center sampling PIL's
    NEAREST uses: src = floor((dst + 0.5) * scale))."""
    import numpy as np

    sh, sw = px.shape[0], px.shape[1]
    ys = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(int), sh - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(int), sw - 1)
    return px[ys][:, xs]


def _resize_payload(payload: bytes, w: int, h: int, use_real_codecs: bool = False) -> bytes:
    """REAL nearest-neighbor resize for BMP/PPM/PNG/JPEG payloads
    (decode -> numpy index -> re-encode in the source family: PNG
    stays PNG, JPEG stays JPEG, BMP/PPM re-encode as BMP). Other
    formats: deterministic content-addressed fake so the distribution
    plumbing stays testable; ``use_real_codecs=True`` raises instead
    (the librosa/av hook)."""
    px = None
    if _is_image_magic(payload):
        try:
            px = resize_pixels(decode_image(payload), w, h)
        except Exception:
            px = None  # corrupt payload / magic false positive -> fake path
    if px is not None:
        if payload[:8] == _PNG_SIG:
            return encode_png(px)
        if payload[:4] == b"GIF8":
            import numpy as np

            from .gif import encode_gif

            # nearest-neighbor resize only samples existing pixels, so
            # the color set stays within the source palette (<= 256) —
            # the re-encode is exact
            pal = np.unique(px.reshape(-1, 3), axis=0)
            return encode_gif([px], palette=pal if len(pal) <= 256 else None)
        if payload[:2] == b"\xff\xd8":
            from .jpeg import encode_jpeg

            return encode_jpeg(px, quality=95)
        return encode_bmp(px)
    if use_real_codecs:
        raise NotImplementedError(
            "BMP/PPM/PNG/baseline-JPEG resize natively; plug librosa/av "
            "into _resize_payload here for audio/video"
        )
    return b"RESIZED:%dx%d:" % (w, h) + hashlib.md5(payload or b"").digest()


def resize_images(media: DataFrame, width: int, height: int, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched image resize: image rows get a new payload and
    updated meta dims; non-image rows pass through untouched.

    Same scale shape as extract_features — payloads never leave the
    executors, Arrow batches bound memory, output schema is identical
    to the input (so resize composes with any downstream media op).
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for mt, pl, meta in zip(pdf["media_type"], pdf["payload"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                if mt == "image":
                    out_payload.append(_resize_payload(pl, width, height))
                    m["width"], m["height"] = width, height
                else:
                    out_payload.append(pl)
                out_meta.append(m)
            pdf = pdf.assign(payload=out_payload, meta=out_meta)
            yield pdf

    return media.mapInPandas(do_resize, MEDIA_SCHEMA)
