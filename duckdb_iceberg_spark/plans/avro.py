"""Minimal pure-Python Avro Object Container File reader.

Used for Iceberg manifest-list and manifest files, which are small
(KBs) and read once on the driver — the reference does the same
(single-threaded whole-file reads, see reference
``src/common/iceberg.cpp:41-42,70-71``). Unlike the reference, we do
NOT hand-write partial Avro schemas: we decode against the writer
schema embedded in the file header, so every field (partition data,
column bounds, null counts) is available for pruning.

Supports the full subset of Avro 1.x used by Iceberg metadata:
records, unions, arrays, maps, all primitives, fixed, enums;
``null``, ``deflate``, ``snappy`` and ``zstandard`` codecs (the
reference inherits codec support from avro-cpp,
``src/common/iceberg.cpp:38-91``; manifests written by Java/Flink
engines commonly use snappy, and engines configured for zstd write
``avro.codec=zstandard`` — raw zstd frames, no CRC suffix).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Any

_MAGIC = b"Obj\x01"


def _snappy_decompress(data: bytes) -> bytes:
    """Pure-Python snappy raw-format decompressor (public format spec:
    google/snappy format_description.txt). Metadata blocks are KBs and
    read once on the driver, so Python speed is irrelevant; this keeps
    the codec dependency-free (no python-snappy in the environment)."""
    # preamble: little-endian base-128 varint uncompressed length
    n, shift, pos = 0, 0, 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    out = bytearray()
    end = len(data)
    while pos < end:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63: length in the next 1..4 bytes
                nb = ln - 59
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 11-bit offset, len 4..11
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte little-endian offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("corrupt snappy stream: bad copy offset")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-at-a-time (RLE-style) semantics
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError(
            f"corrupt snappy stream: declared {n} bytes, produced {len(out)}"
        )
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Snappy raw-format compressor: pyarrow's C++ codec when present
    (it always is in this engine's environment), else an all-literal
    encoding — valid snappy by the format spec, just uncompressed."""
    try:
        import pyarrow as pa

        return bytes(pa.Codec("snappy").compress(data))
    except Exception:
        out = bytearray()
        n = len(data)
        while True:  # varint preamble
            b = n & 0x7F
            n >>= 7
            out.append(b | 0x80 if n else b)
            if not n:
                break
        pos = 0
        while pos < len(data):  # literals of <=2^16 bytes (2-byte length form)
            chunk = data[pos : pos + 65536]
            out.append((61 << 2) | 0)  # literal, 2 extra length bytes
            out += (len(chunk) - 1).to_bytes(2, "little")
            out += chunk
            pos += len(chunk)
        return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes) -> None:
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("unexpected end of Avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        """Zigzag varint decode (Avro int/long share the encoding)."""
        shift = 0
        accum = 0
        buf = self.buf
        pos = self.pos
        while True:
            b = buf[pos]
            pos += 1
            accum |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        self.pos = pos
        return (accum >> 1) ^ -(accum & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(reader: _Reader, schema: Any) -> Any:
    """Decode one datum of ``schema`` (parsed-JSON Avro schema)."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return reader.read(1) == b"\x01"
        if t in ("int", "long"):
            return reader.read_long()
        if t == "float":
            return struct.unpack("<f", reader.read(4))[0]
        if t == "double":
            return struct.unpack("<d", reader.read(8))[0]
        if t == "bytes":
            return reader.read_bytes()
        if t == "string":
            return reader.read_string()
        raise ValueError(f"unknown Avro primitive {t!r}")
    if isinstance(schema, list):  # union: long index then value
        return _decode(reader, schema[reader.read_long()])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(reader, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = reader.read_long()
            if n == 0:
                break
            if n < 0:  # block size prefix follows; skip it
                n = -n
                reader.read_long()
            for _ in range(n):
                out.append(_decode(reader, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = reader.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                reader.read_long()
            for _ in range(n):
                k = reader.read_string()
                out[k] = _decode(reader, schema["values"])
        return out
    if t == "fixed":
        return reader.read(schema["size"])
    if t == "enum":
        return schema["symbols"][reader.read_long()]
    # named-type shorthand: {"type": "string", "logicalType": ...} etc.
    return _decode(reader, t)


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro container file → (metadata dict, list of records)."""
    from .fs import get_fs

    return read_avro_bytes(get_fs(path).read_bytes(path))


class _Writer:
    __slots__ = ("out",)

    def __init__(self) -> None:
        self.out = bytearray()

    def write(self, b: bytes) -> None:
        self.out += b

    def write_long(self, n: int) -> None:
        """Zigzag varint encode (Avro int/long share the encoding)."""
        n = (n << 1) ^ (n >> 63)
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                break

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.write(b)

    def write_string(self, s: str) -> None:
        self.write_bytes(s.encode("utf-8"))


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch for a value: None -> 'null', else the first
    non-null branch (Iceberg metadata unions are all [null, X])."""
    for i, branch in enumerate(schema):
        if value is None and branch == "null":
            return i
        if value is not None and branch != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def _encode(writer: _Writer, schema: Any, value: Any) -> None:
    """Encode one datum of ``schema`` (parsed-JSON Avro schema)."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            writer.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            writer.write_long(int(value))
        elif t == "float":
            writer.write(struct.pack("<f", float(value)))
        elif t == "double":
            writer.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            writer.write_bytes(bytes(value))
        elif t == "string":
            writer.write_string(str(value))
        else:
            raise ValueError(f"unknown Avro primitive {t!r}")
        return
    if isinstance(schema, list):
        i = _union_branch(schema, value)
        writer.write_long(i)
        _encode(writer, schema[i], value)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(writer, f["type"], value.get(f["name"]) if isinstance(value, dict) else None)
    elif t == "array":
        if value:
            writer.write_long(len(value))
            for item in value:
                _encode(writer, schema["items"], item)
        writer.write_long(0)
    elif t == "map":
        if value:
            writer.write_long(len(value))
            for k, v in value.items():
                writer.write_string(str(k))
                _encode(writer, schema["values"], v)
        writer.write_long(0)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        writer.write(b)
    elif t == "enum":
        writer.write_long(schema["symbols"].index(value))
    else:
        _encode(writer, t, value)


def _zstd_compress(data: bytes) -> bytes:
    """Zstandard one-shot frame via pyarrow's bundled C++ codec (always
    present in this engine's environment; Avro's ``zstandard`` codec is
    bare zstd frames with no checksum suffix, spec 1.9+)."""
    import pyarrow as pa

    return bytes(pa.Codec("zstd").compress(data))


def _zstd_decompress(data: bytes) -> bytes:
    """Streaming decompress — zstd frames legally omit
    Frame_Content_Size (RFC 8878 §3.1.1), so a one-shot decompress
    that needs the size up front cannot cover every writer; the
    CompressedInputStream path handles both."""
    import pyarrow as pa

    return bytes(pa.CompressedInputStream(pa.BufferReader(data), "zstd").read())


def write_avro_file(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict | None = None,
    codec: str = "null",
) -> int:
    """Write an Avro object container file (one block; ``null``,
    ``deflate``, ``snappy`` or ``zstandard`` codec).

    Returns the file length in bytes (Iceberg manifest lists record it).
    """
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    header = _Writer()
    header.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    for k, v in (metadata or {}).items():
        meta[k] = v
    header.write_long(len(meta))
    for k, v in meta.items():
        header.write_string(k)
        header.write_bytes(v.encode("utf-8") if isinstance(v, str) else v)
    header.write_long(0)
    sync = hashlib.md5(path.encode("utf-8")).digest()  # deterministic 16-byte marker
    header.write(sync)
    body = _Writer()
    for r in records:
        _encode(body, schema, r)
    block = bytes(body.out)
    if codec == "deflate":
        block = zlib.compress(block)[2:-4]  # raw deflate (no zlib wrapper)
    elif codec == "snappy":
        block = _snappy_compress(block) + (
            zlib.crc32(block) & 0xFFFFFFFF
        ).to_bytes(4, "big")
    elif codec == "zstandard":
        block = _zstd_compress(block)
    header.write_long(len(records))
    header.write_long(len(block))
    header.write(block)
    header.write(sync)
    from .fs import get_fs

    get_fs(path).write_bytes(path, bytes(header.out))
    return len(header.out)


def read_avro_bytes(data: bytes) -> tuple[dict, list[dict]]:
    reader = _Reader(data)
    if reader.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = reader.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            reader.read_long()
        for _ in range(n):
            k = reader.read_string()
            meta[k] = reader.read_bytes()
    sync = reader.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[dict] = []
    while not reader.at_end():
        count = reader.read_long()
        size = reader.read_long()
        block = reader.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            # Avro spec: snappy blocks end with a 4-byte BIG-ENDIAN
            # CRC32 of the UNCOMPRESSED data
            crc = int.from_bytes(block[-4:], "big")
            block = _snappy_decompress(block[:-4])
            if zlib.crc32(block) & 0xFFFFFFFF != crc:
                raise ValueError("Avro snappy block CRC32 mismatch")
        elif codec == "zstandard":
            block = _zstd_decompress(block)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        block_reader = _Reader(block)
        for _ in range(count):
            records.append(_decode(block_reader, schema))
        if reader.read(16) != sync:
            raise ValueError("Avro sync marker mismatch")
    return {k: v for k, v in meta.items()}, records
