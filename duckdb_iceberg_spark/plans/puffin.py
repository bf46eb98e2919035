"""Minimal Puffin file support (Iceberg's stats/DV container format,
public spec "Puffin file format"): enough to WRITE deletion-vector-v1
blobs for v3 tables and to READ any Puffin footer back.

Layout: Magic, Blob_1..Blob_n, Footer; Footer = Magic, FooterPayload
(UTF-8 JSON, optionally gzip per flag bit 0), PayloadSize (int32 LE),
Flags (4 bytes), Magic.
"""

from __future__ import annotations

import gzip
import json
import struct

from .roaring import encode_dv_blob

MAGIC = b"PFA1"


def write_puffin_dv_file(path: str, dvs: dict[str, list], *, snapshot_id: int = 1, sequence_number: int = 1) -> dict[str, tuple[int, int, int]]:
    """Write one Puffin file holding a `deletion-vector-v1` blob per
    referenced data file. ``dvs``: {referenced_data_file: positions}.
    Returns {referenced_data_file: (content_offset,
    content_size_in_bytes, cardinality)} — exactly the three values a
    v3 delete manifest entry records."""
    out: dict[str, tuple[int, int, int]] = {}
    blobs_meta = []
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        for ref, positions in dvs.items():
            blob = encode_dv_blob(positions)
            off = fh.tell()
            fh.write(blob)
            card = len(set(int(p) for p in positions))
            out[ref] = (off, len(blob), card)
            blobs_meta.append(
                {
                    "type": "deletion-vector-v1",
                    "fields": [],
                    "snapshot-id": snapshot_id,
                    "sequence-number": sequence_number,
                    "offset": off,
                    "length": len(blob),
                    "properties": {
                        "referenced-data-file": ref,
                        "cardinality": str(card),
                    },
                }
            )
        payload = json.dumps({"blobs": blobs_meta, "properties": {}}).encode("utf-8")
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: footer payload uncompressed
        fh.write(MAGIC)
    return out


def write_puffin_blobs(path: str, blobs: list[tuple[str, bytes, int]], *, snapshot_id: int = 1, sequence_number: int = 1) -> dict[str, tuple[int, int, int]]:
    """Write one Puffin file from PRE-ENCODED deletion-vector blobs
    (``[(referenced_data_file, blob_bytes, cardinality), ...]`` —
    encoding happened executor-side). Assembled in memory and written
    through plans/fs (write_atomic), so v3 tables on object stores get
    their DV files too. Returns {referenced_data_file:
    (content_offset, content_size_in_bytes, cardinality)}."""
    from .fs import get_fs

    out: dict[str, tuple[int, int, int]] = {}
    blobs_meta = []
    buf = bytearray(MAGIC)
    for ref, blob, card in blobs:
        off = len(buf)
        buf += blob
        out[ref] = (off, len(blob), card)
        blobs_meta.append(
            {
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(card),
                },
            }
        )
    payload = json.dumps({"blobs": blobs_meta, "properties": {}}).encode("utf-8")
    buf += MAGIC + payload + struct.pack("<i", len(payload)) + b"\x00\x00\x00\x00" + MAGIC
    get_fs(path).write_atomic(path, bytes(buf))
    return out


def write_puffin_stats_file(path: str, blobs: list[dict], *, snapshot_id: int, sequence_number: int) -> dict:
    """Write a Puffin TABLE-STATISTICS file (Iceberg spec "Table
    statistics"): ``blobs`` entries are ``{"type": str, "fields":
    [field_id, ...], "properties": {str: str}, "payload": bytes}``.
    Returns the metadata.json ``statistics`` list entry for this file
    (statistics-path / file-size-in-bytes / file-footer-size-in-bytes
    / blob-metadata), which interoperable planners read to get e.g.
    each column's ``ndv`` property without touching the payloads."""
    from .fs import get_fs

    blobs_meta = []
    buf = bytearray(MAGIC)
    for b in blobs:
        payload = b["payload"]
        off = len(buf)
        buf += payload
        blobs_meta.append(
            {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(payload),
                "properties": dict(b.get("properties", {})),
            }
        )
    fpayload = json.dumps({"blobs": blobs_meta, "properties": {}}).encode("utf-8")
    footer = MAGIC + fpayload + struct.pack("<i", len(fpayload)) + b"\x00\x00\x00\x00" + MAGIC
    buf += footer
    get_fs(path).write_atomic(path, bytes(buf))
    return {
        "snapshot-id": snapshot_id,
        "statistics-path": path,
        "file-size-in-bytes": len(buf),
        "file-footer-size-in-bytes": len(footer),
        "blob-metadata": blobs_meta,
    }


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin footer -> the payload JSON dict."""
    from .fs import get_fs

    data = get_fs(path).read_bytes(path)
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("not a Puffin file (magic mismatch)")
    (size,) = struct.unpack_from("<i", data, len(data) - 12)
    flags = data[len(data) - 8 : len(data) - 4]
    payload = data[len(data) - 12 - size : len(data) - 12]
    if flags[0] & 1:
        payload = gzip.decompress(payload)
    return json.loads(payload.decode("utf-8"))
