"""Iceberg table-metadata layer: path/version resolution, metadata.json
parsing, snapshot selection, schema → Spark StructType.

Re-implements (Spark-first, from public Iceberg spec + observed
reference behavior) the reference's metadata operators:

- metadata path resolution   (reference src/common/iceberg.cpp:191-219)
- version-hint resolution    (iceberg.cpp:256-267)
- version guessing           (iceberg.cpp:276-312, gated)
- gzip metadata codec        (iceberg.cpp:222-227, utils.cpp:18-22)
- snapshot select latest / by-id / by-timestamp (iceberg.cpp:133-168)
- schema parse               (src/common/schema.cpp:77-184)

All pure Python — no Spark needed; runs once on the driver per scan.
"""

from __future__ import annotations

import gzip
import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import types as T

DEFAULT_TABLE_VERSION_FORMAT = "v%s%s.metadata.json,%s%s.metadata.json"
VERSION_HINT_FILE = "version-hint.text"

# ---------------------------------------------------------------------------
# schema parsing (Iceberg JSON type -> Spark type; table in SURVEY.md §1.2)
# ---------------------------------------------------------------------------

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    # No Spark TIME type: surface micros-since-midnight as long (the
    # reference's own generator stores a bigint surrogate too).
    "time": T.LongType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    # No Spark UUID type: string (reference generator does the same).
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    # Iceberg v3 variant <-> Spark 4 VARIANT (both implement the same
    # public binary-variant encoding lineage; Spark's parquet writer
    # stores the (metadata, value) pair).
    "variant": T.VariantType(),
}

_DECIMAL_RE = re.compile(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)")
_FIXED_RE = re.compile(r"fixed\[\s*(\d+)\s*\]")


def parse_iceberg_type(t: Any) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        m = _DECIMAL_RE.fullmatch(t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if _FIXED_RE.fullmatch(t):
            return T.BinaryType()
        raise ValueError(f"unrecognized Iceberg type {t!r}")
    kind = t["type"]
    if kind == "struct":
        return T.StructType([_parse_struct_field(f) for f in t["fields"]])
    if kind == "list":
        return T.ArrayType(parse_iceberg_type(t["element"]), not t.get("element-required", True))
    if kind == "map":
        return T.MapType(
            parse_iceberg_type(t["key"]),
            parse_iceberg_type(t["value"]),
            not t.get("value-required", True),
        )
    raise ValueError(f"unrecognized Iceberg complex type {kind!r}")


def _parse_struct_field(f: dict) -> T.StructField:
    md = {"parquet.field.id": f["id"]}
    if "doc" in f:
        md["comment"] = f["doc"]
    return T.StructField(f["name"], parse_iceberg_type(f["type"]), not f.get("required", False), metadata=md)


@dataclass
class IcebergColumn:
    field_id: int
    name: str
    spark_type: T.DataType
    required: bool = False
    initial_default: Any = None
    write_default: Any = None
    doc: Optional[str] = None
    # raw Iceberg primitive name (e.g. "time", "uuid") for types Spark
    # has no native equivalent of; None for complex types
    iceberg_type: Optional[str] = None

    def to_struct_field(self) -> T.StructField:
        md = {"parquet.field.id": self.field_id}
        if self.doc:
            md["comment"] = self.doc
        return T.StructField(self.name, self.spark_type, not self.required, metadata=md)


@dataclass
class IcebergSchema:
    schema_id: int
    columns: list[IcebergColumn]

    def to_struct_type(self) -> T.StructType:
        return T.StructType([c.to_struct_field() for c in self.columns])


def parse_schema_json(s: dict) -> IcebergSchema:
    cols = []
    for f in s.get("fields", []):
        cols.append(
            IcebergColumn(
                field_id=f["id"],
                name=f["name"],
                spark_type=parse_iceberg_type(f["type"]),
                required=f.get("required", False),
                initial_default=f.get("initial-default"),
                write_default=f.get("write-default"),
                doc=f.get("doc"),
                iceberg_type=f["type"] if isinstance(f["type"], str) else None,
            )
        )
    return IcebergSchema(schema_id=s.get("schema-id", 0), columns=cols)


# ---------------------------------------------------------------------------
# metadata.json parsing + snapshot selection
# ---------------------------------------------------------------------------


@dataclass
class IcebergSnapshot:
    snapshot_id: int
    sequence_number: int
    timestamp_ms: int
    manifest_list: str
    schema_id: Optional[int]
    summary: dict = field(default_factory=dict)
    parent_snapshot_id: Optional[int] = None


@dataclass
class TableMetadata:
    """Parsed *.metadata.json."""

    location: str
    format_version: int
    table_uuid: str
    current_snapshot_id: Optional[int]
    current_schema_id: int
    snapshots: list[IcebergSnapshot]
    schemas: dict[int, IcebergSchema]
    partition_specs: list[dict]
    properties: dict
    metadata_path: str
    raw: dict

    # -- snapshot selection (reference iceberg.cpp:133-168) --------------
    def latest_snapshot(self) -> IcebergSnapshot:
        if not self.snapshots:
            raise ValueError(f"No snapshots found in table metadata {self.metadata_path}")
        # prefer current-snapshot-id when set; else argmax timestamp
        if self.current_snapshot_id is not None:
            for s in self.snapshots:
                if s.snapshot_id == self.current_snapshot_id:
                    return s
        return max(self.snapshots, key=lambda s: s.timestamp_ms)

    def snapshot_by_id(self, snapshot_id: int) -> IcebergSnapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise ValueError(f"Could not find snapshot with id {snapshot_id}")

    def snapshot_by_timestamp(self, timestamp_ms: int) -> IcebergSnapshot:
        eligible = [s for s in self.snapshots if s.timestamp_ms <= timestamp_ms]
        if not eligible:
            # verbatim reference message (test/sql/iceberg_scan.test:62:
            # "Could not find latest snapshots for timestamp <ts>")
            import datetime as _dt

            ts = _dt.datetime.fromtimestamp(
                timestamp_ms / 1000, tz=_dt.timezone.utc
            ).replace(tzinfo=None)
            txt = ts.strftime("%Y-%m-%d %H:%M:%S")
            if timestamp_ms % 1000:
                txt += f".{timestamp_ms % 1000:03d}"
            raise ValueError(f"Could not find latest snapshots for timestamp {txt}")
        return max(eligible, key=lambda s: s.timestamp_ms)

    def main_lineage(self) -> list[IcebergSnapshot]:
        """Snapshots reachable from the main head (current-snapshot-id,
        falling back to ``refs['main']``) by walking parent-snapshot-id,
        oldest first.  Snapshots staged on OTHER branches
        (``append(to_branch=...)`` write-audit-publish) are excluded —
        they are unpublished and must stay invisible to readers until
        :meth:`~duckdb_iceberg_spark.writer.IcebergTable.fast_forward`.
        """
        head_id = self.current_snapshot_id
        if head_id is None or head_id == -1:
            ref = self.raw.get("refs", {}).get("main")
            head_id = ref["snapshot-id"] if ref else None
        by_id = {s.snapshot_id: s for s in self.snapshots}
        out: list[IcebergSnapshot] = []
        sid = head_id
        while sid is not None and sid in by_id:
            snap = by_id[sid]
            out.append(snap)
            sid = snap.parent_snapshot_id
        return out[::-1]

    def schema_for_snapshot(self, snap: IcebergSnapshot) -> IcebergSchema:
        # The reference always resolves the *current* schema id of the
        # metadata file, not the snapshot's own schema-id
        # (iceberg.cpp:100-103,249 — schema time travel happens by
        # pointing at an older vN.metadata.json, not by snapshot).
        return self.schemas[self.current_schema_id]


def _read_metadata_bytes(path: str, metadata_compression_codec: str = "none") -> bytes:
    from .fs import get_fs

    data = get_fs(path).read_bytes(path)
    # decompress when declared gzip OR on magic sniff (tolerant either way)
    if metadata_compression_codec == "gzip" or data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def parse_table_metadata(metadata_path: str, metadata_compression_codec: str = "none") -> TableMetadata:
    doc = json.loads(_read_metadata_bytes(metadata_path, metadata_compression_codec))
    fv = doc.get("format-version", 1)
    schemas: dict[int, IcebergSchema] = {}
    if "schemas" in doc:
        for s in doc["schemas"]:
            sch = parse_schema_json(s)
            schemas[sch.schema_id] = sch
        current_schema_id = doc.get("current-schema-id", 0)
    else:  # v1 single-schema fallback
        sch = parse_schema_json(doc["schema"])
        schemas[sch.schema_id] = sch
        current_schema_id = sch.schema_id
    snaps = []
    for s in doc.get("snapshots", []):
        snaps.append(
            IcebergSnapshot(
                snapshot_id=s["snapshot-id"],
                # v1 snapshots have no sequence numbers -> 0
                sequence_number=s.get("sequence-number", 0),
                timestamp_ms=s["timestamp-ms"],
                manifest_list=s["manifest-list"],
                schema_id=s.get("schema-id"),
                summary=s.get("summary", {}),
                parent_snapshot_id=s.get("parent-snapshot-id"),
            )
        )
    return TableMetadata(
        location=doc.get("location", os.path.dirname(os.path.dirname(metadata_path))),
        format_version=fv,
        table_uuid=doc.get("table-uuid", ""),
        current_snapshot_id=doc.get("current-snapshot-id"),
        current_schema_id=current_schema_id,
        snapshots=snaps,
        schemas=schemas,
        partition_specs=doc.get("partition-specs", []),
        properties=doc.get("properties", {}),
        metadata_path=metadata_path,
        raw=doc,
    )


# ---------------------------------------------------------------------------
# metadata path resolution
# ---------------------------------------------------------------------------


def _codec_suffix(codec: str) -> str:
    return ".gz" if codec == "gzip" else ""


def resolve_metadata_path(
    table_path: str,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    unsafe_enable_version_guessing: bool = False,
) -> str:
    """Table dir (or direct .json/.json.gz path) → concrete metadata file.

    Resolution order matches the reference: explicit file path, explicit
    ``version``, ``version-hint.text``, then (gated) glob-guessing.
    """
    from .fs import get_fs

    fs = get_fs(table_path)
    suffix = _codec_suffix(metadata_compression_codec)
    if table_path.endswith(".metadata.json") or table_path.endswith(".metadata.json.gz") or table_path.endswith(".json") or table_path.endswith(".json.gz"):
        if not fs.isfile(table_path):
            raise FileNotFoundError(f"Metadata file {table_path} does not exist")
        return table_path
    meta_dir = os.path.join(table_path, "metadata")
    if not fs.isdir(meta_dir):
        # verbatim reference message (iceberg_metadata.test:54,
        # iceberg_snapshots.test:44)
        raise FileNotFoundError(f'Cannot open "{table_path}": Metadata directory does not exist')

    formats = version_name_format.split(",")

    def candidates(ver: str) -> list[str]:
        return [os.path.join(meta_dir, fmt % (ver, suffix)) for fmt in formats]

    if version is not None and version != "?":
        for cand in candidates(str(version)):
            if fs.isfile(cand):
                return cand
        raise FileNotFoundError(
            f"Iceberg metadata file not found for table version '{version}' using '{metadata_compression_codec}' compression and format(s): '{version_name_format}'"
        )

    hint = os.path.join(meta_dir, VERSION_HINT_FILE)
    if version != "?" and fs.isfile(hint):
        import time as _time

        ver = ""
        for _ in range(5):
            ver = fs.read_bytes(hint).decode().strip()
            if ver:
                break
            # transient empty hint: a (pre-atomic-rename) writer mid-swap
            _time.sleep(0.02)
        for cand in candidates(ver):
            if fs.isfile(cand):
                return cand
        # exact error-message parity: reference iceberg_metadata.test:36-40
        raise FileNotFoundError(
            f"Iceberg metadata file not found for table version '{ver}' using '{metadata_compression_codec}' compression and format(s): '{version_name_format}'"
        )

    if not unsafe_enable_version_guessing and version != "?":
        raise FileNotFoundError(
            f"Failed to read iceberg table. No version was provided and no version-hint could be found, globbing the filesystem to locate the latest version is disabled by default as this is considered unsafe and could result in reading uncommitted data. To enable this use 'SET unsafe_enable_version_guessing = true;' (table: {table_path})"
        )

    # glob-guess: pick lexicographically-max version number
    found = []
    for fmt in formats:
        pat = os.path.join(meta_dir, fmt % ("*", suffix))
        found.extend(fs.glob(pat))
    if not found:
        raise FileNotFoundError(f"Could not guess Iceberg table version using '{metadata_compression_codec}' compression and format(s): '{version_name_format}' (table: {table_path})")

    def version_key(p: str) -> tuple:
        base = os.path.basename(p)
        m = re.match(r"v?(\d+)[.-]", base)
        num = int(m.group(1)) if m else -1
        return (num, base)

    return max(found, key=version_key)


def load_table_metadata(
    table_path: str,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    unsafe_enable_version_guessing: bool = False,
) -> TableMetadata:
    mp = resolve_metadata_path(
        table_path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )
    codec = metadata_compression_codec
    if mp.endswith(".gz"):
        codec = "gzip"
    return parse_table_metadata(mp, codec)


# ---------------------------------------------------------------------------
# moved-path normalization (reference utils.cpp:24-36)
# ---------------------------------------------------------------------------


def rebase_path(stored_path: str, table_path: str, allow_moved_paths: bool) -> str:
    """Rebase an absolute stored path onto ``table_path`` by splitting at
    ``/metadata/`` or ``/data/`` when ``allow_moved_paths`` is set."""
    p = stored_path
    if p.startswith("file:"):
        p = re.sub(r"^file:/*", "/", p)
        if not os.path.exists(p) and os.path.exists(p.lstrip("/")):
            p = p.lstrip("/")
    if not allow_moved_paths:
        return p
    for anchor in ("/metadata/", "/data/"):
        idx = p.find(anchor)
        if idx >= 0:
            return os.path.join(table_path, p[idx + 1 :])
    # relative stored path (e.g. "lineitem_iceberg/metadata/x.avro")
    for anchor in ("metadata/", "data/"):
        idx = p.find(anchor)
        if idx >= 0:
            return os.path.join(table_path, p[idx:])
    return p
