"""Pure-Python animated-GIF codec (GIF89a, public spec + the LZW
variant it mandates).

This gives the multimodal frame-sampling path a REAL moving-picture
format: `decode_gif` returns every frame as an (H, W, 3) uint8 RGB
array (global/local palettes, interlace, transparency + draw-over
disposal), and `encode_gif` writes a spec-valid animated GIF (one
global 256-entry palette, per-frame graphic-control delay, genuine
variable-width LZW code stream — literal codes with width growth and
table-overflow CLEARs, which every decoder accepts).

The reference engine has no media layer at all; this exists for the
training-data pipeline (frame extraction feeds vision towers), with
compressed video (H.264 etc.) remaining the documented av hook —
those codecs are not pure-Python territory.
"""

from __future__ import annotations

import struct

_GIF_MAGIC = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width 3..12,
# CLEAR / EOI codes, table grows by one entry per emitted code)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while pos + width <= nbits:
        code = (acc >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW stream: code {code} of {len(table)}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _lzw_encode_literals(min_code_size: int, indices: bytes) -> bytes:
    """Spec-valid LZW stream of pure literal codes: no compression, but
    the width/CLEAR bookkeeping mirrors the decoder's table growth
    exactly, so any conforming decoder reproduces the indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    pos = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, pos
        acc |= code << pos
        pos += width
        while pos >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            pos -= 8

    emit(clear)
    table_len = clear + 2
    first = True
    for b in indices:
        emit(b)
        if first:
            first = False
        else:
            table_len += 1  # the decoder adds one entry per non-first code
        if table_len == (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear)
                table_len = clear + 2
                width = min_code_size + 1
                first = True
    emit(eoi)
    if pos:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_gif(frames, delays_cs=10, palette=None) -> bytes:
    """Encode a list of (H, W, 3) uint8 RGB frames (equal dims) as an
    animated GIF89a. ``delays_cs`` is a per-frame delay in centiseconds
    (int or list). Colors are mapped through one global 256-entry
    palette: pass ``palette`` as an (N<=256, 3) array, or None to use
    the 6x6x6 web-safe cube + 40-step grayscale ramp (exact for pixels
    already on those lattices; others snap to the web-safe cube)."""
    import numpy as np

    if palette is None:
        cube = np.array(
            [(r, g, b) for r in range(0, 256, 51) for g in range(0, 256, 51) for b in range(0, 256, 51)],
            dtype=np.uint8,
        )
        gray = np.stack([np.arange(8, 248, 6, dtype=np.uint8)] * 3, axis=1)
        pal = np.vstack([cube, gray])[:256]
    else:
        pal = np.asarray(palette, dtype=np.uint8)
    npal = len(pal)
    bits = max(1, (npal - 1).bit_length())
    pal_full = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal_full[:npal] = pal

    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)

    f0 = np.asarray(frames[0], dtype=np.uint8)
    h, w = f0.shape[0], f0.shape[1]
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    # NETSCAPE2.0 looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    # palette index lookup: exact match via a dict of packed rgb
    lut = {(int(r) << 16) | (int(g) << 8) | int(b): i for i, (r, g, b) in enumerate(pal)}

    def to_indices(px):
        flat = px.reshape(-1, 3).astype(np.int64)
        packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
        idx = np.empty(len(packed), dtype=np.uint8)
        misses = []
        for i, p in enumerate(packed.tolist()):
            j = lut.get(p)
            if j is None:
                misses.append(i)
            else:
                idx[i] = j
        if misses:  # snap to web-safe cube
            m = flat[misses]
            snapped = ((m + 25) // 51).clip(0, 5)
            idx[misses] = (snapped[:, 0] * 36 + snapped[:, 1] * 6 + snapped[:, 2]).astype(np.uint8)
        return idx.tobytes()

    min_code = max(2, bits)
    for frame, delay in zip(frames, delays_cs):
        px = np.asarray(frame, dtype=np.uint8)
        if px.shape[:2] != (h, w):
            raise ValueError("all GIF frames must share dimensions")
        # graphic control: disposal=1 (leave in place), no transparency
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, int(delay), 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode_literals(min_code, to_indices(px)))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """Decode an (animated) GIF to a list of (H, W, 3) uint8 RGB
    frames, composed on the logical screen: global/local color tables,
    interlaced images, transparent-index skip, disposal methods 0/1
    (draw over) and 2 (restore background = palette bg color).
    Raises ValueError on anything outside the spec profile."""
    import numpy as np

    if payload[:6] not in _GIF_MAGIC:
        raise ValueError("not a GIF payload")
    w, h, packed, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg_idx < len(global_pal):
        canvas[:] = global_pal[bg_idx]
    frames: list = []
    transparent = None
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                flags, _delay, tidx = struct.unpack_from("<BHB", payload, pos + 1)
                transparent = tidx if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("unterminated graphic control extension")
                pos += 1
            else:  # application / comment / plain text: skip sub-blocks
                while True:
                    size = payload[pos]
                    pos += 1
                    if size == 0:
                        break
                    pos += size
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while True:
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            chunks.append(payload[pos : pos + size])
            pos += size
        idx = np.frombuffer(_lzw_decode(min_code, b"".join(chunks)), dtype=np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        idx = idx[: fw * fh].reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, fh, step))
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        region = canvas[top : top + fh, left : left + fw]
        colors = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = colors[mask]
        else:
            region[:] = colors
        frames.append(canvas.copy())
        if disposal == 2:  # restore background
            bgc = pal[bg_idx] if bg_idx < len(pal) else 0
            canvas[top : top + fh, left : left + fw] = bgc
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contained no image frames")
    return frames
