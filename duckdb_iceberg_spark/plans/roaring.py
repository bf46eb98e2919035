"""Roaring-bitmap (de)serialization for Iceberg v3 deletion vectors.

Pure-Python/numpy implementation of the PUBLIC formats only:

- the 32-bit Roaring serialization (RoaringFormatSpec: cookies 12346/
  12347, array/bitmap/run containers, little-endian throughout);
- the "portable" 64-bit format (Roaring64NavigableMap: int64 LE bucket
  count, then per bucket an int32 LE high-key + a 32-bit bitmap);
- the Iceberg v3 `deletion-vector-v1` blob framing (spec "Deletion
  Vectors"): 4-byte BIG-endian length of (magic + vector), magic bytes
  D1 D3 39 64, the portable-64 vector, then a 4-byte BIG-endian CRC-32
  of (magic + vector).

The writer emits array/bitmap containers (runs are never required);
the reader additionally accepts run containers so foreign-written DVs
decode. Positions decode straight into a numpy uint64 array — the
executor-side mapInPandas DV reader hands that to Arrow without a
Python-loop per position.

Reference parity note: the reference has NO v3/DV support (its scan
treats every delete file as positional parquet, iceberg_scan.cpp:
167-169); this module is part of the deliberate v3 extension.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # container is an array up to this cardinality

DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])


# ---------------------------------------------------------------------------
# 32-bit roaring
# ---------------------------------------------------------------------------


def _serialize_rb32(values: np.ndarray) -> bytes:
    """Serialize sorted distinct uint32 values (cookie 12346 layout —
    no run containers, offset header always present)."""
    keys = (values >> 16).astype(np.uint32)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    n = len(uniq)
    head = struct.pack("<ii", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    desc = b""
    bodies = []
    for i, k in enumerate(uniq):
        lows = (values[bounds[i] : bounds[i + 1]] & 0xFFFF).astype(np.uint16)
        card = len(lows)
        desc += struct.pack("<HH", int(k), card - 1)
        if card <= _ARRAY_MAX:
            bodies.append(lows.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype="<u8")
            idx = lows.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64))
            bodies.append(bits.tobytes())
    # offsets are byte positions from the start of this 32-bit stream
    off0 = len(head) + len(desc) + 4 * n
    offs, pos = [], off0
    for b in bodies:
        offs.append(pos)
        pos += len(b)
    return head + desc + struct.pack(f"<{n}i", *offs) + b"".join(bodies)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one 32-bit roaring bitmap at ``pos``; returns (sorted
    uint32 values, next position). Accepts both cookies + run
    containers (foreign writers emit them)."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    start = pos
    if (cookie32 & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie32 >> 16) + 1
        pos += 4
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_run = [(run_flags[i >> 3] >> (i & 7)) & 1 == 1 for i in range(n)]
        keys, cards = _read_desc(buf, pos, n)
        pos += 4 * n
        if n >= NO_OFFSET_THRESHOLD:
            pos += 4 * n  # offset header (we parse sequentially)
    elif cookie32 == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        has_run = [False] * n
        keys, cards = _read_desc(buf, pos, n)
        pos += 4 * n
        pos += 4 * n  # offset header always present for this cookie
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie32})")
    del start
    out = []
    for i in range(n):
        card = cards[i]
        base = np.uint32(keys[i]) << np.uint32(16)
        if has_run[i]:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * nruns, offset=pos).reshape(-1, 2)
            pos += 4 * nruns
            lows = np.concatenate(
                [np.arange(s, s + ln + 1, dtype=np.uint32) for s, ln in runs]
            ) if nruns else np.empty(0, dtype=np.uint32)
        elif card <= _ARRAY_MAX:
            lows = np.frombuffer(buf, dtype="<u2", count=card, offset=pos).astype(np.uint32)
            pos += 2 * card
        else:
            bits = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            lows = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little")
            ).astype(np.uint32)
        out.append(lows.astype(np.uint32) + base)
    vals = np.concatenate(out) if out else np.empty(0, dtype=np.uint32)
    return vals, pos


def _read_desc(buf: bytes, pos: int, n: int):
    raw = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos).reshape(-1, 2)
    return raw[:, 0].tolist(), (raw[:, 1].astype(np.int64) + 1).tolist()


# ---------------------------------------------------------------------------
# portable 64-bit roaring
# ---------------------------------------------------------------------------


def serialize_portable64(positions) -> bytes:
    """Portable Roaring64NavigableMap bytes for a set of uint64
    positions (sorted/deduped here; Iceberg requires the MSB clear)."""
    vals = np.unique(np.asarray(list(positions) if not isinstance(positions, np.ndarray) else positions, dtype=np.uint64))
    if len(vals) and int(vals[-1]) >> 63:
        raise ValueError("deletion-vector positions must fit in 63 bits")
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [len(vals)]
    out = [struct.pack("<q", len(uniq))]
    for i, hk in enumerate(uniq):
        lows32 = (vals[bounds[i] : bounds[i + 1]] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out.append(struct.pack("<I", int(hk)))
        out.append(_serialize_rb32(lows32))
    return b"".join(out)


def deserialize_portable64(buf: bytes) -> np.ndarray:
    """Portable bytes -> sorted uint64 numpy positions."""
    (nbuckets,) = struct.unpack_from("<q", buf, 0)
    pos = 8
    parts = []
    for _ in range(nbuckets):
        (hk,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _deserialize_rb32(buf, pos)
        parts.append(lows.astype(np.uint64) | (np.uint64(hk) << np.uint64(32)))
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Iceberg deletion-vector-v1 blob framing
# ---------------------------------------------------------------------------


def encode_dv_blob(positions) -> bytes:
    """`deletion-vector-v1` blob bytes: BE length of (magic+vector),
    magic D1D33964, portable-64 vector, BE CRC-32 of (magic+vector)."""
    vec = serialize_portable64(positions)
    payload = DV_MAGIC + vec
    return (
        struct.pack(">i", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )


def decode_dv_blob(blob: bytes) -> np.ndarray:
    """Blob bytes (exactly content_size_in_bytes long) -> positions.

    Length-checked against the 4-byte BE length prefix + CRC framing
    BEFORE unpacking, so a truncated/empty blob (e.g. a manifest entry
    whose content_size_in_bytes was null and read 0 bytes) raises a
    diagnosable ValueError instead of struct.error inside a task."""
    if len(blob) < 4:
        raise ValueError("deletion vector blob truncated (shorter than length prefix)")
    (plen,) = struct.unpack_from(">i", blob, 0)
    if plen < 4 or len(blob) < 4 + plen + 4:
        raise ValueError(
            f"deletion vector blob truncated ({len(blob)} bytes for declared payload {plen})"
        )
    payload = blob[4 : 4 + plen]
    if payload[:4] != DV_MAGIC:
        raise ValueError("deletion vector blob: bad magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + plen)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector blob: CRC mismatch")
    return deserialize_portable64(payload[4:])
