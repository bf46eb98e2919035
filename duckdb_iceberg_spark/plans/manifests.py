"""Iceberg manifest layer: manifest-list + manifest entry reading.

Mirrors the reference's manifest walk (``src/common/iceberg.cpp:15-91``)
but decodes against the full writer schema, so partition values and
column bounds are retained — the reference drops them (its partial Avro
schemas omit stats; SURVEY.md §4 "partition pruning: NOT implemented").
We use them for file-level pruning, an intentional improvement.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import Optional

from .avro import read_avro_file
from .table_metadata import IcebergSnapshot, TableMetadata, rebase_path


class ManifestContent(IntEnum):
    DATA = 0
    DELETE = 1


class EntryStatus(IntEnum):
    EXISTING = 0
    ADDED = 1
    DELETED = 2


class FileContent(IntEnum):
    DATA = 0
    POSITION_DELETES = 1
    EQUALITY_DELETES = 2


@dataclass
class ManifestFile:
    manifest_path: str
    sequence_number: int
    content: ManifestContent
    partition_spec_id: int = 0
    added_rows_count: int = 0
    existing_rows_count: int = 0
    # v3 row lineage (spec field 520): start of the _row_id space
    # assigned to this data manifest; data-file entries with null
    # first_row_id inherit from it cumulatively on read
    first_row_id: Optional[int] = None


@dataclass
class ManifestEntry:
    status: EntryStatus
    content: FileContent
    file_path: str
    file_format: str
    record_count: int
    sequence_number: Optional[int] = None
    partition: dict = field(default_factory=dict)
    lower_bounds: dict = field(default_factory=dict)
    upper_bounds: dict = field(default_factory=dict)
    null_value_counts: dict = field(default_factory=dict)
    value_counts: dict = field(default_factory=dict)
    equality_ids: Optional[list[int]] = None
    file_size_in_bytes: int = 0
    raw_file_path: str = ""  # as stored in the manifest (pre-rebase)
    spec_id: int = 0  # partition spec of the manifest that listed this file
    # Iceberg v3 deletion vectors (spec fields 143-145): a content=1
    # entry whose file is a Puffin blob rather than a parquet delete
    # table. content_offset is the discriminator (None = classic
    # positional-delete parquet).
    referenced_data_file: Optional[str] = None
    content_offset: Optional[int] = None
    content_size: Optional[int] = None
    # Iceberg v3 row lineage (spec field 142): the _row_id of this
    # data file's first row; row N in the file has _row_id
    # first_row_id + N. None = lineage not tracked (v1/v2 files).
    first_row_id: Optional[int] = None


def read_manifest_list(path: str, format_version: int) -> list[ManifestFile]:
    _, records = read_avro_file(path)
    out = []
    for r in records:
        out.append(
            ManifestFile(
                manifest_path=r["manifest_path"],
                # v1 manifest lists lack content/sequence_number -> DATA/0
                sequence_number=r.get("sequence_number", 0) or 0,
                content=ManifestContent(r.get("content", 0) or 0),
                partition_spec_id=r.get("partition_spec_id", 0) or 0,
                added_rows_count=r.get("added_rows_count") or r.get("added_files_count") or 0,
                existing_rows_count=r.get("existing_rows_count") or 0,
                first_row_id=r.get("first_row_id"),
            )
        )
    return out


def read_manifest_entries(path: str, format_version: int, manifest: Optional[ManifestFile] = None) -> list[ManifestEntry]:
    _, records = read_avro_file(path)
    out = []
    # v3 row-lineage inheritance: a data file with null first_row_id is
    # assigned the manifest's first_row_id plus the cumulative
    # record_count of preceding null-first_row_id data files in this
    # manifest (Iceberg spec "Row Lineage" / "First Row ID
    # Inheritance"). Spec-conformant foreign writers leave the per-file
    # field null and only stamp the manifest-list entry; explicit
    # per-file ids (this repo's writer) never consume inherited space.
    lineage_cursor = manifest.first_row_id if manifest is not None else None
    for r in records:
        df = r["data_file"]
        # v1 entries have no per-file content field -> DATA; for v2 delete
        # manifests the data_file carries content 1 (pos) or 2 (eq).
        content = FileContent(df.get("content", 0) or 0)
        seq = r.get("sequence_number")
        if seq is None and manifest is not None:
            # inherited sequence number (entry written in same commit)
            seq = manifest.sequence_number
        frid = df.get("first_row_id")
        if frid is None and lineage_cursor is not None and content == FileContent.DATA:
            frid = lineage_cursor
            lineage_cursor += df.get("record_count", 0) or 0
        out.append(
            ManifestEntry(
                status=EntryStatus(r["status"]),
                content=content,
                file_path=df["file_path"],
                file_format=str(df.get("file_format", "PARQUET")),
                record_count=df.get("record_count", 0) or 0,
                sequence_number=seq,
                partition=df.get("partition") or {},
                lower_bounds=_kv(df.get("lower_bounds")),
                upper_bounds=_kv(df.get("upper_bounds")),
                null_value_counts=_kv(df.get("null_value_counts")),
                value_counts=_kv(df.get("value_counts")),
                equality_ids=df.get("equality_ids"),
                file_size_in_bytes=df.get("file_size_in_bytes", 0) or 0,
                spec_id=(manifest.partition_spec_id if manifest is not None else 0),
                referenced_data_file=df.get("referenced_data_file"),
                content_offset=df.get("content_offset"),
                content_size=df.get("content_size_in_bytes"),
                first_row_id=frid,
            )
        )
    return out


def _kv(v) -> dict:
    """Iceberg avro k/v lists: [{'key': k, 'value': v}, ...] -> dict."""
    if not v:
        return {}
    if isinstance(v, dict):
        return v
    return {e["key"]: e["value"] for e in v}


@dataclass
class IcebergTableScan:
    """Fully-resolved file listing for one snapshot (reference
    ``IcebergTable::Load``, iceberg.cpp:15-36)."""

    snapshot: IcebergSnapshot
    manifests: list[tuple[ManifestFile, list[ManifestEntry]]]

    @property
    def entries(self) -> list[ManifestEntry]:
        return [e for _, es in self.manifests for e in es]

    def data_files(self) -> list[ManifestEntry]:
        return [e for e in self.entries if e.content == FileContent.DATA and e.status != EntryStatus.DELETED]

    def positional_delete_files(self) -> list[ManifestEntry]:
        return [e for e in self.entries if e.content == FileContent.POSITION_DELETES and e.status != EntryStatus.DELETED]

    def equality_delete_files(self) -> list[ManifestEntry]:
        return [e for e in self.entries if e.content == FileContent.EQUALITY_DELETES and e.status != EntryStatus.DELETED]

    def data_cardinality(self) -> int:
        return sum(e.record_count for e in self.data_files())

    def delete_cardinality(self) -> int:
        return sum(e.record_count for e in self.positional_delete_files())


# LRU over resolved manifest walks. Sound because Iceberg metadata is
# immutable by spec: every commit writes a NEW manifest-list file, so
# (path, size, mtime) identifies its full transitive content forever.
# Callers must treat the shared ManifestEntry objects as read-only
# (load_table_scan performs the one rebase mutation BEFORE caching).
# Bounded: ~thousands of entries per walk is metadata-sized; 64 walks
# cover a session's working set of (table, snapshot) pairs.
_SCAN_CACHE: dict = {}
_SCAN_CACHE_MAX = 64


def _stat_key(path: str):
    import os

    try:
        st = os.stat(path)
        return (path, st.st_size, st.st_mtime_ns)
    except OSError:
        return None


def load_table_scan(
    metadata: TableMetadata,
    snapshot: IcebergSnapshot,
    table_path: str,
    allow_moved_paths: bool = False,
) -> IcebergTableScan:
    """Walk snapshot → manifest list → manifests, rebasing moved paths.

    Manifests are decoded CONCURRENTLY (IO-bound Avro reads, thread
    pool) — the reference walks them single-threaded
    (iceberg.cpp:15-36); at thousands of manifests on object storage,
    sequential metadata latency dominates scan planning. Order is
    preserved. Walks are memoized on the manifest-list file identity
    (see _SCAN_CACHE) so repeated scans of the same snapshot pay the
    Avro decode once per process, the way a long-lived engine caches
    its metastore."""
    ml_path = rebase_path(snapshot.manifest_list, table_path, allow_moved_paths)
    ck = _stat_key(ml_path)
    if ck is not None:
        ck = (ck, table_path, allow_moved_paths)
        hit = _SCAN_CACHE.pop(ck, None)
        if hit is not None:
            _SCAN_CACHE[ck] = hit  # re-insert: LRU recency
            return IcebergTableScan(snapshot=snapshot, manifests=hit)
    manifests = read_manifest_list(ml_path, metadata.format_version)

    def _one(mf):
        mpath = rebase_path(mf.manifest_path, table_path, allow_moved_paths)
        entries = read_manifest_entries(mpath, metadata.format_version, mf)
        for e in entries:
            e.raw_file_path = e.file_path
            e.file_path = rebase_path(e.file_path, table_path, allow_moved_paths)
            if e.referenced_data_file:
                e.referenced_data_file = rebase_path(
                    e.referenced_data_file, table_path, allow_moved_paths
                )
        return (mf, entries)

    if len(manifests) <= 1:
        loaded = [_one(mf) for mf in manifests]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(manifests))) as pool:
            loaded = list(pool.map(_one, manifests))
    if ck is not None:
        _SCAN_CACHE[ck] = loaded
        while len(_SCAN_CACHE) > _SCAN_CACHE_MAX:
            _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
    return IcebergTableScan(snapshot=snapshot, manifests=loaded)
