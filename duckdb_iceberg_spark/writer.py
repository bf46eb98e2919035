"""Native Iceberg v2 write surface, Spark-first.

The reference extension has **no write path** (SURVEY.md §2A "absent:
writes" — its test generator shells out to Spark+iceberg-runtime,
reference ``scripts/test_data_generator/generate_iceberg.py:31-52``).
This module supplies the write surface the north star requires
(create/append/DML/DDL + compaction via the DataFrame API), producing
standard Iceberg v2 table layouts that our own reader
(:func:`duckdb_iceberg_spark.iceberg_scan`) and any spec-compliant
reader can scan: ``metadata/vN.metadata.json`` + ``version-hint.text``,
Avro manifest lists/manifests, parquet data + positional-delete files.

Scale design:
- Data and delete rows are written BY SPARK EXECUTORS (``df.write``)
  — never collected to the driver. The driver only moves/renames the
  resulting part files and writes KB-scale Avro/JSON metadata, exactly
  the division of labor of every production Iceberg writer.
- DELETE/UPDATE are merge-on-read: matched row positions come from
  ``_metadata.file_path``/``_metadata.row_index`` (split-safe, computed
  by the parquet reader per file) and become position-delete files; no
  rewrite of unaffected data files.
- ``rewrite_data_files`` (compaction) sizes output partitions by bytes,
  so a 100 TB table compacts with one Spark job and bounded task size.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .plans.avro import write_avro_file
from .plans.table_metadata import (
    IcebergColumn,
    IcebergSchema,
    TableMetadata,
    load_table_metadata,
    parse_iceberg_type,
)
from .plans.transforms import PartitionField, spark_partition_column

__all__ = ["IcebergTable", "CommitConflictError"]


class CommitConflictError(RuntimeError):
    """Another writer committed the next metadata version first."""

# ---------------------------------------------------------------------------
# Spark type -> Iceberg JSON type
# ---------------------------------------------------------------------------


def _spark_to_iceberg_type(dt: T.DataType, next_id) -> Any:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.VariantType):
        return "variant"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": next_id(),
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_to_iceberg_type(f.dataType, next_id),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": next_id(),
            "element": _spark_to_iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": next_id(),
            "key": _spark_to_iceberg_type(dt.keyType, next_id),
            "value-id": next_id(),
            "value": _spark_to_iceberg_type(dt.valueType, next_id),
            "value-required": not dt.valueContainsNull,
        }
    raise ValueError(f"cannot map Spark type {dt} to Iceberg")


def _schema_to_json(schema: IcebergSchema) -> dict:
    counter = [max([c.field_id for c in schema.columns], default=0)]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    fields = []
    for c in schema.columns:
        f: dict[str, Any] = {
            "id": c.field_id,
            "name": c.name,
            "required": c.required,
            "type": _spark_to_iceberg_type(c.spark_type, next_id),
        }
        if c.initial_default is not None:
            f["initial-default"] = c.initial_default
        if c.write_default is not None:
            f["write-default"] = c.write_default
        fields.append(f)
    return {"type": "struct", "schema-id": schema.schema_id, "fields": fields}


def _schema_from_df(df: DataFrame) -> IcebergSchema:
    counter = [len(df.schema.fields)]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    cols = []
    for i, f in enumerate(df.schema.fields, start=1):
        _spark_to_iceberg_type(f.dataType, next_id)  # validates + reserves nested ids
        cols.append(IcebergColumn(field_id=i, name=f.name, spark_type=f.dataType, required=not f.nullable))
    return IcebergSchema(schema_id=0, columns=cols)


# ---------------------------------------------------------------------------
# Avro schemas for manifest list / manifest (Iceberg v2 field ids)
# ---------------------------------------------------------------------------

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        # v3 row lineage (spec field 520): starting _row_id of the id
        # space assigned to this data manifest; entries with null
        # first_row_id inherit from it cumulatively on read
        {"name": "first_row_id", "type": ["null", "long"], "default": None, "field-id": 520},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    {
                        "name": "null_value_counts",
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "items": {
                                    "type": "record",
                                    "name": "k121_v122",
                                    "fields": [
                                        {"name": "key", "type": "int", "field-id": 121},
                                        {"name": "value", "type": "long", "field-id": 122},
                                    ],
                                },
                            },
                        ],
                        "default": None,
                        "field-id": 110,
                    },
                    {
                        "name": "lower_bounds",
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "items": {
                                    "type": "record",
                                    "name": "k126_v127",
                                    "fields": [
                                        {"name": "key", "type": "int", "field-id": 126},
                                        {"name": "value", "type": "bytes", "field-id": 127},
                                    ],
                                },
                            },
                        ],
                        "default": None,
                        "field-id": 125,
                    },
                    {
                        "name": "upper_bounds",
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "items": {
                                    "type": "record",
                                    "name": "k129_v130",
                                    "fields": [
                                        {"name": "key", "type": "int", "field-id": 129},
                                        {"name": "value", "type": "bytes", "field-id": 130},
                                    ],
                                },
                            },
                        ],
                        "default": None,
                        "field-id": 128,
                    },
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int", "element-id": 136}],
                        "default": None,
                        "field-id": 135,
                    },
                    # Iceberg v3 row lineage (spec field 142)
                    {
                        "name": "first_row_id",
                        "type": ["null", "long"],
                        "default": None,
                        "field-id": 142,
                    },
                    # Iceberg v3 deletion vectors (spec fields 143-145)
                    {
                        "name": "referenced_data_file",
                        "type": ["null", "string"],
                        "default": None,
                        "field-id": 143,
                    },
                    {
                        "name": "content_offset",
                        "type": ["null", "long"],
                        "default": None,
                        "field-id": 144,
                    },
                    {
                        "name": "content_size_in_bytes",
                        "type": ["null", "long"],
                        "default": None,
                        "field-id": 145,
                    },
                ],
            },
        },
    ],
}

def _metadata_json_bytes(doc: dict, codec: str) -> bytes:
    data = json.dumps(doc, indent=2).encode()
    if codec == "gzip":
        import gzip

        # mtime=0: byte-deterministic output (no wall-clock in the header)
        data = gzip.compress(data, mtime=0)
    return data


def _dump_metadata_json(mpath: str, doc: dict, codec: str) -> None:
    from .plans.fs import get_fs

    get_fs(mpath).write_bytes(mpath, _metadata_json_bytes(doc, codec))


def _cmp_lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


def _parse_partition_dirs(rel: str, pfields: list[PartitionField], dtypes: dict) -> dict:
    """`_p_name=value[/...]` path → {partition_field_name: typed_value}.

    Typed per Iceberg manifest conventions: temporal transforms and
    identity-on-date store ordinal ints; identity keeps the source type."""
    import datetime as _dt
    import urllib.parse

    if rel == "." or not pfields:
        return {}
    by_dir = {f"_p_{pf.name}": pf for pf in pfields}
    out: dict = {}
    for seg in rel.split(os.sep):
        if "=" not in seg:
            continue
        k, raw = seg.split("=", 1)
        pf = by_dir.get(k)
        if pf is None:
            continue
        raw = urllib.parse.unquote(raw)
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[pf.name] = None
            continue
        if pf.transform == "days" or (pf.transform == "identity" and dtypes.get(pf.source) == "date"):
            out[pf.name] = (_dt.date.fromisoformat(raw) - _dt.date(1970, 1, 1)).days
        elif pf.transform in ("months", "years", "hours", "bucket"):
            out[pf.name] = int(raw)
        elif pf.transform == "truncate":
            out[pf.name] = raw if dtypes.get(pf.source) == "string" else int(raw)
        else:  # identity
            st = dtypes.get(pf.source, "string")
            if st in ("int", "bigint", "smallint", "tinyint"):
                out[pf.name] = int(raw)
            elif st in ("double", "float"):
                out[pf.name] = float(raw)
            elif st == "boolean":
                out[pf.name] = raw == "true"
            else:
                out[pf.name] = raw
    return out


def _partition_avro_fields(pfields: list[PartitionField], schema: IcebergSchema) -> list[dict]:
    """r102 record fields for the current partition spec."""
    by_name = {c.name: c for c in schema.columns}
    fields = []
    for pf in pfields:
        src = by_name.get(pf.source)
        st = src.spark_type.simpleString() if src else "string"
        if pf.transform == "days" or (pf.transform == "identity" and st == "date"):
            t: Any = {"type": "int", "logicalType": "date"}
        elif pf.transform in ("months", "years", "hours", "bucket"):
            t = "int"
        elif pf.transform == "truncate":
            t = "string" if st == "string" else ("long" if st == "bigint" else "int")
        elif st in ("int", "smallint", "tinyint"):
            t = "int"
        elif st == "bigint":
            t = "long"
        elif st in ("double",):
            t = "double"
        elif st in ("float",):
            t = "float"
        elif st == "boolean":
            t = "boolean"
        else:
            t = "string"
        fields.append({"name": pf.name, "type": ["null", t], "default": None, "field-id": pf.field_id})
    return fields


def _parse_spec_entry(p, field_id: int) -> PartitionField:
    """One partition_by entry -> PartitionField: ``"col"`` (identity),
    ``"years(col)"`` / ``"bucket(16, col)"`` SQL syntax, or the tuple
    forms ``(transform, col)`` / ``(transform, N, col)``."""
    if isinstance(p, str) and "(" in p:
        tname, _, rest = p.partition("(")
        args = [a.strip() for a in rest.rstrip(")").split(",")]
        p = (tname.strip(), *args) if len(args) == 1 else (tname.strip(), int(args[0]), args[1])
    if isinstance(p, str):
        return PartitionField("identity", p, None, field_id)
    if len(p) == 2:
        return PartitionField(p[0], p[1], None, field_id)
    return PartitionField(p[0], p[2], int(p[1]), field_id)


def _now_ms() -> int:
    return int(time.time() * 1000)


def _new_snapshot_id() -> int:
    return uuid.uuid4().int >> 65  # 63-bit positive


class IcebergTable:
    """Writable Iceberg v2 table at a filesystem path (hadoop layout).

    ``create`` → CTAS; then ``append`` / ``delete_where`` /
    ``update_where`` (merge-on-read) / ``add_column`` /
    ``alter_column_type`` / ``rewrite_data_files`` (compaction) /
    ``expire_snapshots`` / ``remove_orphan_files``.
    """

    def __init__(self, spark: SparkSession, path: str, metadata_compression_codec: str = "none"):
        from .plans.fs import abspath

        self.spark = spark
        self.path = abspath(path)
        self.codec = metadata_compression_codec
        self.meta: TableMetadata = load_table_metadata(self.path, metadata_compression_codec=self.codec)

    @property
    def partition_fields(self) -> list[PartitionField]:
        """Current partition-spec fields (default spec)."""
        spec_id = self.meta.raw.get("default-spec-id", 0)
        spec = next((s for s in self.meta.partition_specs if s.get("spec-id", 0) == spec_id), None)
        if not spec:
            return []
        id_to_name = {c.field_id: c.name for c in self.schema.columns}
        return [PartitionField.from_json(f, id_to_name[f["source-id"]]) for f in spec.get("fields", [])]

    # -- construction -----------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        *,
        partition_by: Optional[list] = None,
        properties: Optional[dict] = None,
        metadata_compression_codec: str = "none",
        format_version: int = 2,
    ) -> "IcebergTable":
        """CTAS. ``partition_by`` entries: ``"col"`` (identity),
        ``("days"|"months"|"years"|"hours", col)``, or
        ``("bucket"|"truncate", N, col)`` — Iceberg hidden partitioning
        (the reference's own provisioner uses ``days(dt)``,
        reference scripts/provision.py:92).

        ``format_version=3`` writes an Iceberg v3 table: DELETE /
        UPDATE / MERGE emit Puffin deletion vectors instead of
        position-delete parquet (beyond the reference, which has no v3
        support at all)."""
        if format_version not in (2, 3):
            raise ValueError(f"format_version must be 2 or 3, got {format_version}")
        from .plans.fs import abspath, get_fs

        path = abspath(path)
        fs = get_fs(path)
        if fs.exists(os.path.join(path, "metadata")):
            raise FileExistsError(f"Iceberg table already exists at {path}")
        fs.makedirs(os.path.join(path, "metadata"))
        fs.makedirs(os.path.join(path, "data"))
        schema = _schema_from_df(df)
        last_col = _max_field_id(schema)
        name_to_id = {c.name: c.field_id for c in schema.columns}
        spec_fields = []
        for i, p in enumerate(partition_by or []):
            pf = _parse_spec_entry(p, 1000 + i)
            spec_fields.append(
                {
                    "name": pf.name,
                    "transform": pf.transform_str(),
                    "source-id": name_to_id[pf.source],
                    "field-id": pf.field_id,
                }
            )
        doc = {
            "format-version": format_version,
            "table-uuid": str(uuid.uuid4()),
            "location": path,
            "last-sequence-number": 0,
            "last-updated-ms": _now_ms(),
            "last-column-id": last_col,
            "current-schema-id": 0,
            "schemas": [_schema_to_json(schema)],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": properties or {},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        if format_version >= 3:
            # v3 makes next-row-id required in table metadata from the
            # very first document (row-lineage cursor; no rows assigned
            # yet -> 0). Spec-conformant validators reject v3 metadata
            # lacking the key.
            doc["next-row-id"] = 0
        suffix = ".gz" if metadata_compression_codec == "gzip" else ""
        mpath = os.path.join(path, "metadata", f"v1{suffix}.metadata.json")
        _dump_metadata_json(mpath, doc, metadata_compression_codec)
        fs.write_atomic(os.path.join(path, "metadata", "version-hint.text"), b"1")
        table = cls(spark, path, metadata_compression_codec)
        table.append(df)
        return table

    # -- read-side helpers ------------------------------------------------

    def scan(self, *, tag: Optional[str] = None, branch: Optional[str] = None, **kwargs) -> DataFrame:
        from .sources.iceberg import iceberg_scan

        if tag is not None or branch is not None:
            kwargs["snapshot_id"] = self.ref_snapshot_id(tag if tag is not None else branch)
        kwargs.setdefault("metadata_compression_codec", self.codec)
        return iceberg_scan(self.spark, self.path, **kwargs)

    def scan_appends(self, since_snapshot_id: int, until_snapshot_id: Optional[int] = None) -> DataFrame:
        """Incremental read: rows in data files committed AFTER
        ``since_snapshot_id`` (exclusive) up to ``until_snapshot_id``
        (inclusive; default latest). The lakehouse CDC primitive — a
        downstream pipeline consumes each new snapshot's appends
        without rescanning the table. Sequence numbers scope the file
        set; deletes newer than the window still apply to it."""
        from .plans.manifests import load_table_scan
        from .sources.iceberg import iceberg_scan

        lo = self.meta.snapshot_by_id(since_snapshot_id).sequence_number
        snap = (
            self.meta.snapshot_by_id(until_snapshot_id)
            if until_snapshot_id is not None
            else self.meta.latest_snapshot()
        )
        scan = load_table_scan(self.meta, snap, self.path, False)
        new_files = {
            e.file_path
            for e in scan.data_files()
            if (e.sequence_number or 0) > lo
        }
        df = iceberg_scan(
            self.spark,
            self.path,
            snapshot_id=snap.snapshot_id,
            metadata_compression_codec=self.codec,
            _keep_position_columns=True,
        )
        norm = F.regexp_replace(F.col("__file"), r"^file:/+", "/")
        return df.where(norm.isin([*new_files])).drop("__file", "__pos")

    def scan_changelog(self, from_snapshot_id: int, to_snapshot_id: Optional[int] = None) -> DataFrame:
        """Net row-level changelog between two snapshots: the current
        rows added ('insert') and removed ('delete') going from
        ``from_snapshot_id`` (exclusive baseline) to ``to_snapshot_id``
        (inclusive; default latest). Schema: change_type + table columns.

        Scale design: a naive changelog is
        ``new EXCEPT ALL old  /  old EXCEPT ALL new`` over two FULL
        table reads — 2 x 100 TB scanned and shuffled. Here the
        manifest diff bounds the work first: a data file live in both
        snapshots and subject to the same delete files contributes
        identical rows to both sides, so it cancels from both EXCEPTs
        and is never read. Only added/removed files (plus, when the
        delete-file set changed, the surviving common files) are
        scanned — O(changed data), not O(table).

        Rewrite-neutrality falls out of the EXCEPT ALL: compaction
        moves rows between files without changing content, and those
        rows cancel.
        """
        from .plans.manifests import load_table_scan
        from .sources.iceberg import iceberg_scan

        old_snap = self.meta.snapshot_by_id(from_snapshot_id)
        new_snap = (
            self.meta.snapshot_by_id(to_snapshot_id)
            if to_snapshot_id is not None
            else self.meta.latest_snapshot()
        )
        old_scan = load_table_scan(self.meta, old_snap, self.path, False)
        new_scan = load_table_scan(self.meta, new_snap, self.path, False)
        old_files = {e.file_path for e in old_scan.data_files()}
        new_files = {e.file_path for e in new_scan.data_files()}
        # equality deletes count too: a delete_where_equality commit adds
        # no data files and no positional deletes, yet removes live rows
        # from common data files — the delete-set diff must see it
        old_deletes = {e.file_path for e in old_scan.positional_delete_files()} | {
            e.file_path for e in old_scan.equality_delete_files()
        }
        new_deletes = {e.file_path for e in new_scan.positional_delete_files()} | {
            e.file_path for e in new_scan.equality_delete_files()
        }
        cand_old = old_files - new_files
        cand_new = new_files - old_files
        if old_deletes != new_deletes:
            # common files' live rows may differ through new/removed
            # delete files — pull them into the diff (still only the
            # affected snapshot window, never the whole table)
            common = old_files & new_files
            cand_old |= common
            cand_new |= common

        def _read(snap_id: int, files: set[str]) -> DataFrame:
            df = iceberg_scan(
                self.spark,
                self.path,
                snapshot_id=snap_id,
                metadata_compression_codec=self.codec,
                _keep_position_columns=True,
            )
            norm = F.regexp_replace(F.col("__file"), r"^file:/+", "/")
            return df.where(norm.isin([*files])).drop("__file", "__pos")

        rows_old = _read(old_snap.snapshot_id, cand_old)
        rows_new = _read(new_snap.snapshot_id, cand_new)
        inserts = rows_new.exceptAll(rows_old)
        deletes = rows_old.exceptAll(rows_new)
        return inserts.select(F.lit("insert").alias("change_type"), "*").unionAll(
            deletes.select(F.lit("delete").alias("change_type"), "*")
        )

    def snapshots(self, **kwargs) -> DataFrame:
        from .sources.iceberg import iceberg_snapshots

        kwargs.setdefault("metadata_compression_codec", self.codec)
        return iceberg_snapshots(self.spark, self.path, **kwargs)

    def metadata(self, **kwargs) -> DataFrame:
        from .sources.iceberg import iceberg_metadata

        kwargs.setdefault("metadata_compression_codec", self.codec)
        return iceberg_metadata(self.spark, self.path, **kwargs)

    def partitions(self, **kwargs) -> DataFrame:
        from .sources.iceberg import iceberg_partitions

        kwargs.setdefault("metadata_compression_codec", self.codec)
        return iceberg_partitions(self.spark, self.path, **kwargs)

    def history(self, **kwargs) -> DataFrame:
        from .sources.iceberg import iceberg_history

        kwargs.setdefault("metadata_compression_codec", self.codec)
        return iceberg_history(self.spark, self.path, **kwargs)

    def _scan_with_pos(self) -> DataFrame:
        """Current live rows + (__file, __pos) virtual columns."""
        from .sources.iceberg import iceberg_scan

        return iceberg_scan(self.spark, self.path, metadata_compression_codec=self.codec, _keep_position_columns=True)

    @property
    def schema(self) -> IcebergSchema:
        return self.meta.schemas[self.meta.current_schema_id]

    @property
    def format_version(self) -> int:
        return int(self.meta.raw.get("format-version", 2))

    # -- low-level writers ------------------------------------------------

    def _write_position_deletes(self, matched: DataFrame) -> list[dict]:
        """Position deletes for ``matched`` rows (must carry the scan's
        ``__file``/``__pos`` metadata columns), in the table's
        format-version dialect: v2 writes position-delete parquet
        (spec field ids 2147483546/2147483545); v3 writes Puffin
        DELETION VECTORS — one roaring bitmap per affected data file,
        encoded EXECUTOR-side (applyInPandas over file_path groups) so
        only the compressed blobs return to the driver (the same
        per-file bound every Iceberg DV writer holds in memory), then
        assembled into a single Puffin file through plans/fs.

        v3 merge rule: the spec forbids adding a second DV for a data
        file without merging, so existing DV positions for the
        affected files are unioned in before encoding, and the
        superseded DV entries are tombstoned (status=DELETED) in the
        new snapshot's manifests by _commit — no snapshot ever
        exposes two live DVs for one data file, which strict v3
        readers (Iceberg Java, DuckDB) reject."""
        self._pending_superseded = None
        dels = (
            matched.select(
                F.regexp_replace(F.col("__file"), r"^file:/+", "/").alias("file_path"),
                F.col("__pos").cast("long").alias("pos"),
            )
            .dropDuplicates()
            .repartition("file_path")
            .sortWithinPartitions("file_path", "pos")
        )
        if self.format_version < 3:
            dels = dels.select(
                F.col("file_path").alias("file_path", metadata={"parquet.field.id": 2147483546}),
                F.col("pos").alias("pos", metadata={"parquet.field.id": 2147483545}),
            )
            files = self._write_parquet_files(dels)
            for f in files:
                f["content"] = 1
            return files
        return self._write_deletion_vectors(dels)

    def _write_deletion_vectors(self, dels: DataFrame) -> list[dict]:
        """v3 path of :meth:`_write_position_deletes`: ``dels`` is a
        deduplicated (file_path, pos) frame."""
        from .plans.manifests import load_table_scan
        from .plans.puffin import write_puffin_blobs
        from .sources.iceberg import _dv_deletes_df

        snap = self.meta.latest_snapshot()
        prior = []
        if snap is not None:
            scan = load_table_scan(self.meta, snap, self.path, False)
            prior = [
                e
                for e in scan.positional_delete_files()
                if e.content_offset is not None
            ]
            if prior:
                affected = dels.select("file_path").distinct()
                dels = dels.unionByName(
                    _dv_deletes_df(self.spark, prior).join(
                        F.broadcast(affected), "file_path", "left_semi"
                    )
                ).dropDuplicates()

        def _encode(pdf):
            import pandas as pd

            from .plans.roaring import encode_dv_blob

            positions = pdf["pos"].to_numpy()
            blob = encode_dv_blob(sorted(set(int(p) for p in positions)))
            return pd.DataFrame(
                {
                    "file_path": [pdf["file_path"].iloc[0]],
                    "blob": [blob],
                    "cardinality": [len(set(positions))],
                }
            )

        encoded = (
            dels.groupBy("file_path")
            .applyInPandas(_encode, "file_path string, blob binary, cardinality long")
            .collect()
        )
        if not encoded:
            return []
        # v3 merge rule bookkeeping: any prior DV whose referenced data
        # file just got a merged superset DV is SUPERSEDED — record it
        # so _commit tombstones the old entry in the new snapshot's
        # manifests (the spec forbids two live DVs for one data file)
        # and callers can subtract the merged-in prior positions from
        # their added-position-deletes summary.
        written = {r.file_path for r in encoded}
        self._pending_superseded = {
            ((e.raw_file_path or e.file_path), e.content_offset): e.record_count
            for e in prior
            if e.referenced_data_file in written
        }
        puffin = os.path.join(
            self.path, "data", f"{uuid.uuid4().hex}-deletes.puffin"
        )
        seq = self.meta.raw.get("last-sequence-number", 0) + 1
        info = write_puffin_blobs(
            puffin,
            [(r.file_path, bytes(r.blob), r.cardinality) for r in encoded],
            sequence_number=seq,
        )
        total = sum(s for _o, s, _c in info.values())
        return [
            {
                "file_path": puffin,
                "file_format": "PUFFIN",
                "content": 1,
                "record_count": card,
                "file_size_in_bytes": total,
                "referenced_data_file": ref,
                "content_offset": off,
                "content_size_in_bytes": sz,
            }
            for ref, (off, sz, card) in info.items()
        ]

    def _column_bounds(self, pqmeta) -> tuple[dict, dict, dict]:
        """Per-file lower/upper bounds and null counts keyed by field
        id, from the parquet footer statistics (free — the footer is
        already read for the row count). These become Iceberg manifest
        lower_bounds/upper_bounds (zone-map file skipping) and
        null_value_counts (residual-filter elimination needs a proven
        zero null count — see sources/iceberg._residual_implied)."""
        name_to_id = {c.name: c.field_id for c in self.schema.columns}
        lowers: dict[int, Any] = {}
        uppers: dict[int, Any] = {}
        nulls: dict[int, int] = {}
        no_nulls: set[int] = set()  # fids with a row group lacking a null count
        for rg in range(pqmeta.num_row_groups):
            g = pqmeta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                fid = name_to_id.get(col.path_in_schema)
                if fid is None:
                    continue  # nested leaf (a.b) or unknown column
                try:
                    st = col.statistics
                except Exception:  # unsupported physical type for stats
                    st = None
                if st is None:
                    no_nulls.add(fid)
                    continue
                if not getattr(st, "has_null_count", False) or st.null_count is None:
                    no_nulls.add(fid)
                else:
                    nulls[fid] = nulls.get(fid, 0) + int(st.null_count)
                try:
                    if not st.has_min_max:
                        continue
                    mn, mx = st.min, st.max
                except Exception:  # unsupported physical type for min/max
                    continue
                if fid not in lowers or _cmp_lt(mn, lowers[fid]):
                    lowers[fid] = mn
                if fid not in uppers or _cmp_lt(uppers[fid], mx):
                    uppers[fid] = mx
        # a single stats-less row group makes the file's count unknowable
        return lowers, uppers, {f: n for f, n in nulls.items() if f not in no_nulls}

    def _write_parquet_files(self, df: DataFrame, subdir: str = "data", partitioned: bool = False) -> list[dict]:
        """Write df as parquet via Spark executors; move part files into
        the table tree; return manifest data_file dicts.

        Partitioned tables: rows are routed by `_p_<field>` computed
        columns (JVM-side transforms) so each output file belongs to
        exactly one partition (Iceberg invariant); the source columns
        stay in the file (unlike plain hive layout). Partition values
        are recovered from the directory names into typed manifest
        values used for read-side file pruning."""
        import pyarrow.parquet as pq

        from .plans.fs import is_local

        self.spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        pfields = self.partition_fields if partitioned else []
        local = is_local(self.path)
        if local:
            tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}")
        else:
            # Spark can't write to the python-side metadata filesystems
            # (memory://); stage locally — a non-empty result errors below
            import tempfile

            tmp = tempfile.mkdtemp(prefix="ice_stage_")
        if pfields:
            dtypes = dict(df.dtypes)
            writer = df.select(
                "*", *[spark_partition_column(pf, dtypes[pf.source]).alias(f"_p_{pf.name}") for pf in pfields]
            ).write.partitionBy(*[f"_p_{pf.name}" for pf in pfields])
        else:
            writer = df.write
        writer.mode("overwrite").parquet(tmp)
        out = []
        for root, _dirs, names in os.walk(tmp):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                try:
                    md = pq.ParquetFile(src).metadata
                    n_rows = md.num_rows
                except OSError:
                    # footer carries a logical type this pyarrow can't
                    # parse (e.g. Spark 4 VARIANT): count through Spark
                    # and skip column bounds for the file —
                    # correctness-safe (files without stats are never
                    # pruned), variant columns have no zone maps anyway
                    md = None
                    n_rows = self.spark.read.parquet(src).count()
                if n_rows == 0:
                    continue
                if not local:
                    from .plans.fs import scheme_of

                    raise ValueError(
                        f"Cannot write data files to a {scheme_of(self.path)}:// table: "
                        f"Spark itself must be able to write them. Point the table at a "
                        f"Spark-accessible location, or register existing parquet with "
                        f"add_files()."
                    )
                rel = os.path.relpath(root, tmp)
                partition = _parse_partition_dirs(rel, pfields, dict(df.dtypes) if pfields else {})
                pdir = os.path.join(self.path, subdir, rel) if rel != "." else os.path.join(self.path, subdir)
                os.makedirs(pdir, exist_ok=True)
                dest = os.path.join(pdir, f"{uuid.uuid4().hex}.parquet")
                shutil.move(src, dest)
                lowers, uppers, nullcounts = (
                    self._column_bounds(md) if md is not None else ({}, {}, {})
                )
                out.append(
                    {
                        "file_path": dest,
                        "file_format": "PARQUET",
                        "record_count": n_rows,
                        "file_size_in_bytes": os.path.getsize(dest),
                        "partition": partition,
                        "lower_bounds": lowers,
                        "upper_bounds": uppers,
                        "null_value_counts": nullcounts,
                    }
                )
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    def _aligned(self, df: DataFrame) -> DataFrame:
        """Conform df to the current schema (order, types, field-id
        metadata) so written parquet carries Iceberg field ids."""
        cols = [
            F.col(c.name)
            .cast(c.spark_type)
            .alias(c.name, metadata={"parquet.field.id": c.field_id})
            for c in self.schema.columns
        ]
        return df.select(*cols)

    def _current_manifests(self, base_snapshot_id: Optional[int] = None) -> list[dict]:
        if base_snapshot_id is not None:
            snap = self.meta.snapshot_by_id(base_snapshot_id)
        else:
            snap = self.meta.latest_snapshot() if self.meta.snapshots else None
        if snap is None:
            return []
        from .plans.avro import read_avro_file

        _, records = read_avro_file(snap.manifest_list)
        return records

    def _tombstone_delete_entries(
        self,
        manifests: list[dict],
        keys: set[tuple],
        snap_id: int,
        meta_dir: str,
    ) -> list[dict]:
        """Rewrite carried delete manifests so entries matching
        ``keys`` — ``(file_path-as-stored, content_offset)`` of
        superseded deletion vectors — are marked status=DELETED in the
        new snapshot. The v3 spec forbids two live DVs for one data
        file; without this, a merged superset DV would coexist with
        the older DV it replaced and strict readers (Iceberg Java,
        DuckDB) could reject the table. Entries keep their original
        sequence numbers (coalesced explicit, since the rewritten
        manifest-list record retains the source manifest's
        sequence_number); counts are recomputed by status."""
        import copy

        from .plans.avro import read_avro_file
        from .plans.transforms import PartitionField

        id_to_name = {c.field_id: c.name for c in self.schema.columns}

        def entry_schema_for(spec_id: int) -> dict:
            es = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
            spec = next(
                (s for s in self.meta.partition_specs if s.get("spec-id", 0) == spec_id),
                None,
            )
            fields = spec.get("fields", []) if spec else []
            if fields:
                pfields = [
                    PartitionField.from_json(f, id_to_name[f["source-id"]]) for f in fields
                ]
                r102 = next(f for f in es["fields"] if f["name"] == "data_file")["type"]
                next(f for f in r102["fields"] if f["name"] == "partition")["type"][
                    "fields"
                ] = _partition_avro_fields(pfields, self.schema)
            return es

        out = []
        for m in manifests:
            if (m.get("content", 0) or 0) != 1:
                out.append(m)
                continue
            _, entries = read_avro_file(m["manifest_path"])
            live_hit = any(
                e.get("status") != 2
                and (e["data_file"].get("file_path"), e["data_file"].get("content_offset"))
                in keys
                for e in entries
            )
            if not live_hit:
                out.append(m)
                continue
            mseq = m.get("sequence_number", 0) or 0
            new_entries = []
            for e in entries:
                seq_no = e.get("sequence_number")
                fseq_no = e.get("file_sequence_number")
                rec = {
                    "status": e.get("status", 0),
                    "snapshot_id": e.get("snapshot_id"),
                    "sequence_number": mseq if seq_no is None else seq_no,
                    "file_sequence_number": mseq if fseq_no is None else fseq_no,
                    "data_file": e["data_file"],
                }
                df_ = e["data_file"]
                if rec["status"] != 2 and (
                    df_.get("file_path"),
                    df_.get("content_offset"),
                ) in keys:
                    rec["status"] = 2
                    rec["snapshot_id"] = snap_id
                new_entries.append(rec)
            spec_id = m.get("partition_spec_id", 0) or 0
            mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m1.avro")
            length = write_avro_file(
                mpath,
                entry_schema_for(spec_id),
                new_entries,
                metadata={
                    "schema": json.dumps(_schema_to_json(self.schema)),
                    "partition-spec": "[]",
                    "partition-spec-id": str(spec_id),
                    "format-version": str(self.format_version),
                    "content": "deletes",
                },
            )
            by_status: dict[int, list[int]] = {0: [], 1: [], 2: []}
            for rec in new_entries:
                by_status.setdefault(rec["status"], []).append(
                    rec["data_file"].get("record_count", 0) or 0
                )
            nm = dict(m)
            nm["manifest_path"] = mpath
            nm["manifest_length"] = length
            nm["existing_files_count"] = len(by_status.get(0, []))
            nm["added_files_count"] = len(by_status.get(1, []))
            nm["deleted_files_count"] = len(by_status.get(2, []))
            nm["existing_rows_count"] = sum(by_status.get(0, []))
            nm["added_rows_count"] = sum(by_status.get(1, []))
            nm["deleted_rows_count"] = sum(by_status.get(2, []))
            out.append(nm)
        return out

    def _commit(
        self,
        *,
        operation: str,
        new_data_files: list[dict] | None = None,
        new_delete_files: list[dict] | None = None,
        keep_previous: bool = True,
        schemas_json: Optional[list[dict]] = None,
        current_schema_id: Optional[int] = None,
        last_column_id: Optional[int] = None,
        extra_summary: Optional[dict] = None,
        doc_updates: Optional[dict] = None,
        to_branch: Optional[str] = None,
    ) -> None:
        """Write manifests + manifest list + next vN metadata json.

        ``to_branch`` targets a named branch ref instead of the main
        head (Iceberg write-audit-publish): the new snapshot's base is
        the branch head (created from the current head if the branch
        doesn't exist yet), the branch ref advances, and
        current-snapshot-id / snapshot-log stay untouched until
        :meth:`fast_forward` publishes the branch."""
        doc = dict(self.meta.raw)
        seq = doc.get("last-sequence-number", 0) + 1
        snap_id = _new_snapshot_id()
        ts = _now_ms()
        meta_dir = os.path.join(self.path, "metadata")
        base_snapshot_id = None
        if to_branch is not None:
            ref = doc.get("refs", {}).get(to_branch)
            if ref is not None:
                if ref.get("type") != "branch":
                    raise ValueError(f"ref {to_branch!r} is a tag; writes require a branch")
                base_snapshot_id = ref["snapshot-id"]
            elif doc.get("current-snapshot-id", -1) != -1:
                base_snapshot_id = doc["current-snapshot-id"]
        manifests = self._current_manifests(base_snapshot_id) if keep_previous else []
        superseded = getattr(self, "_pending_superseded", None)
        self._pending_superseded = None
        if superseded and manifests:
            manifests = self._tombstone_delete_entries(
                manifests, set(superseded), snap_id, meta_dir
            )

        import copy

        entry_schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
        pfields = self.partition_fields
        if pfields:
            r102 = next(f for f in entry_schema["fields"] if f["name"] == "data_file")["type"]
            next(f for f in r102["fields"] if f["name"] == "partition")["type"]["fields"] = _partition_avro_fields(
                pfields, self.schema
            )

        from .plans.bounds import serialize_bound

        id_to_type = {c.field_id: c.spark_type for c in self.schema.columns}

        def kv_bounds(bounds: dict | None) -> list | None:
            if not bounds:
                return None
            out = []
            for fid, v in sorted(bounds.items()):
                if isinstance(v, bytes):
                    # already spec-serialized (entry carried over from an
                    # existing manifest, e.g. overwrite_partitions keep-list)
                    b = v
                else:
                    b = serialize_bound(v, id_to_type[fid]) if fid in id_to_type else None
                if b is not None:
                    out.append({"key": fid, "value": b})
            return out or None

        def kv_longs(counts: dict | None) -> list | None:
            if not counts:
                return None
            return [
                {"key": int(fid), "value": int(n)} for fid, n in sorted(counts.items())
            ] or None

        spec_id = doc.get("default-spec-id", 0)

        def write_manifest(files: list[dict], content: int) -> dict:
            mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m{content}.avro")
            entries = [
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snap_id,
                    "sequence_number": seq,
                    "file_sequence_number": seq,
                    "data_file": {
                        "content": f.get("content", content),
                        "file_path": f["file_path"],
                        "file_format": f.get("file_format", "PARQUET"),
                        "partition": f.get("partition") or {},
                        "record_count": f["record_count"],
                        "file_size_in_bytes": f.get("file_size_in_bytes", 0),
                        "null_value_counts": kv_longs(f.get("null_value_counts")),
                        "lower_bounds": kv_bounds(f.get("lower_bounds")),
                        "upper_bounds": kv_bounds(f.get("upper_bounds")),
                        "equality_ids": f.get("equality_ids"),
                        "first_row_id": f.get("first_row_id"),
                        "referenced_data_file": f.get("referenced_data_file"),
                        "content_offset": f.get("content_offset"),
                        "content_size_in_bytes": f.get("content_size_in_bytes"),
                    },
                }
                for f in files
            ]
            length = write_avro_file(
                mpath,
                entry_schema,
                entries,
                metadata={
                    "schema": json.dumps(_schema_to_json(self.schema)),
                    "partition-spec": "[]",
                    "partition-spec-id": str(spec_id),
                    "format-version": str(self.format_version),
                    "content": "data" if content == 0 else "deletes",
                },
            )
            rows = sum(f["record_count"] for f in files)
            frids = [
                f["first_row_id"]
                for f in files
                if content == 0 and f.get("first_row_id") is not None
            ]
            return {
                "manifest_path": mpath,
                "manifest_length": length,
                "partition_spec_id": spec_id,
                "content": 0 if content == 0 else 1,
                # v3: manifest-level first_row_id = start of this
                # manifest's assigned id space (files carry explicit
                # ids too, so readers of either convention agree)
                "first_row_id": (min(frids) if frids else None),
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(files),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }

        # Iceberg v3 row lineage: every new data file gets the _row_id
        # of its first row, chained off the table's next-row-id cursor
        # (spec field 142 + "next-row-id"); row N of the file is
        # first_row_id + N on read. Delete files never consume ids.
        # Known divergence: MoR UPDATE rewrites assign FRESH ids to the
        # rewritten rows (delete+insert lineage) rather than carrying
        # the old _row_id through — documented in iceberg_scan's
        # row_lineage doc.
        first_row_id_base = None
        if self.format_version >= 3:
            # every v3 snapshot carries first-row-id (spec: required),
            # equal to the pre-commit next-row-id when the commit
            # assigns no new ids (e.g. delete-only snapshots)
            cursor = int(doc.get("next-row-id", 0))
            first_row_id_base = cursor
            for f in new_data_files or []:
                # carried entries (overwrite keep-list) keep their ids
                if f.get("first_row_id") is None:
                    f["first_row_id"] = cursor
                    cursor += int(f["record_count"])
            doc["next-row-id"] = cursor
        if new_data_files:
            manifests = manifests + [write_manifest(new_data_files, 0)]
        if new_delete_files:
            manifests = manifests + [write_manifest(new_delete_files, 1)]

        ml_path = os.path.join(meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
        write_avro_file(
            ml_path,
            _MANIFEST_FILE_SCHEMA,
            manifests,
            metadata={
                "format-version": str(self.format_version),
                "snapshot-id": str(snap_id),
                "sequence-number": str(seq),
            },
        )

        summary = {"operation": operation}
        summary.update(extra_summary or {})
        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": ts,
            "manifest-list": ml_path,
            **({"first-row-id": first_row_id_base} if first_row_id_base is not None else {}),
            "schema-id": current_schema_id if current_schema_id is not None else doc.get("current-schema-id", 0),
            "summary": summary,
        }
        if base_snapshot_id is not None:
            snapshot["parent-snapshot-id"] = base_snapshot_id
        elif doc.get("current-snapshot-id", -1) != -1 and to_branch is None:
            snapshot["parent-snapshot-id"] = doc["current-snapshot-id"]
        doc["last-sequence-number"] = seq
        doc["last-updated-ms"] = ts
        doc["snapshots"] = doc.get("snapshots", []) + [snapshot]
        if to_branch is None:
            doc["current-snapshot-id"] = snap_id
            doc["snapshot-log"] = doc.get("snapshot-log", []) + [{"timestamp-ms": ts, "snapshot-id": snap_id}]
        else:
            refs = dict(doc.get("refs", {}))
            refs[to_branch] = {"snapshot-id": snap_id, "type": "branch"}
            doc["refs"] = refs
        if schemas_json is not None:
            doc["schemas"] = schemas_json
        if current_schema_id is not None:
            doc["current-schema-id"] = current_schema_id
        if last_column_id is not None:
            doc["last-column-id"] = last_column_id
        if doc_updates:
            doc.update(doc_updates)
        self._write_metadata(doc)

    def _write_metadata(self, doc: dict) -> None:
        meta_dir = os.path.join(self.path, "metadata")
        cur = int(os.path.basename(self.meta.metadata_path).lstrip("v").split(".")[0])
        nxt = cur + 1
        doc["metadata-log"] = doc.get("metadata-log", []) + [
            {"timestamp-ms": doc["last-updated-ms"], "metadata-file": self.meta.metadata_path}
        ]
        from .plans.fs import get_fs

        fs = get_fs(self.path)
        suffix = ".gz" if self.codec == "gzip" else ""
        mpath = os.path.join(meta_dir, f"v{nxt}{suffix}.metadata.json")
        # optimistic concurrency: the metadata version file is the CAS
        # token (hadoop-catalog convention). Exclusive-create makes the
        # commit atomic; a concurrent committer gets CommitConflictError
        # and should reload + replay (real catalogs do the same swap).
        try:
            fs.create_exclusive(mpath, _metadata_json_bytes(doc, self.codec))
        except FileExistsError as e:
            raise CommitConflictError(
                f"metadata version v{nxt} was committed concurrently for table {self.path}; "
                f"reload the table and retry the operation"
            ) from e
        # atomic hint swap: a plain truncate+write lets a concurrent
        # reader observe an EMPTY hint mid-write (seen as a streaming
        # source polling latestOffset during an append) — write-aside
        # + rename is atomic on POSIX.
        hint = os.path.join(meta_dir, "version-hint.text")
        fs.write_atomic(hint, str(nxt).encode())
        self.meta = load_table_metadata(self.path, metadata_compression_codec=self.codec)

    # -- write operations -------------------------------------------------

    def append(self, df: DataFrame, to_branch: Optional[str] = None) -> None:
        """Append a snapshot; ``to_branch`` stages the commit on a
        branch ref (write-audit-publish) instead of the main head —
        readers of the table see nothing until :meth:`fast_forward`."""
        files = self._write_parquet_files(self._aligned(df), partitioned=True)
        self._commit(
            operation="append",
            new_data_files=files,
            extra_summary={"added-data-files": str(len(files)), "added-records": str(sum(f["record_count"] for f in files))},
            to_branch=to_branch,
        )

    def add_files(self, parquet_paths: list[str], file_format: str = "PARQUET") -> None:
        """Register existing data files into the table WITHOUT
        rewriting them (Iceberg's `add_files` migration procedure):
        footers are read for record counts and zone-map bounds, a new
        append snapshot references the files in place. O(#files)
        driver work, zero data movement — the way to adopt an existing
        100 TB parquet lake into Iceberg metadata.

        ``file_format`` may also be ``"ORC"`` (row counts from the ORC
        footer via pyarrow.orc; no column bounds — ORC files are never
        stats-pruned) or ``"AVRO"`` (decoded once driver-side by the
        pure-Python codec for the record count — adopt-time cost only;
        scans decode executor-side). The manifests record the per-file
        format and iceberg_scan routes each format to its reader —
        the reference parses file_format but assumes PARQUET
        (src/common/iceberg.cpp), mis-reading such tables.

        Files must match the table schema (verified against footer
        column names) and the table must be unpartitioned (partition
        values can't be derived from externally-laid-out files)."""
        import pyarrow.parquet as pq

        if self.partition_fields:
            raise ValueError("add_files requires an unpartitioned table")
        fmt = file_format.upper()
        if fmt not in ("PARQUET", "ORC", "AVRO"):
            raise ValueError(f"add_files supports PARQUET/ORC/AVRO, got {file_format!r}")
        cols = {c.name for c in self.schema.columns}
        entries = []
        any_without_ids = False
        from .plans.fs import abspath as _fs_abspath
        from .plans.fs import arrow_fs_path

        for p in parquet_paths:
            p = _fs_abspath(p)  # URLs (s3://...) pass through unchanged
            afs, ap = arrow_fs_path(p)
            if fmt == "ORC":
                import pyarrow.orc as _orc

                of = _orc.ORCFile(ap) if afs is None else _orc.ORCFile(afs.open_input_file(ap))
                got = set(of.schema.names)
                n_rows, lowers, uppers, nullcounts = of.nrows, {}, {}, {}
            elif fmt == "AVRO":
                from .plans.avro import read_avro_file

                _, records = read_avro_file(p)
                got = set(records[0]) if records else cols
                n_rows, lowers, uppers, nullcounts = len(records), {}, {}, {}
            else:
                md = pq.ParquetFile(ap, filesystem=afs).metadata
                arrow_schema = md.schema.to_arrow_schema()
                got = set(arrow_schema.names)
                if not any(
                    (f.metadata or {}).get(b"PARQUET:field_id") is not None
                    for f in arrow_schema
                ):
                    any_without_ids = True
                n_rows = md.num_rows
                lowers, uppers, nullcounts = self._column_bounds(md)
            if not cols <= got:
                raise ValueError(
                    f"File {p} is missing table columns {sorted(cols - got)}"
                )
            entries.append(
                {
                    "file_path": p,
                    "file_format": fmt,
                    "record_count": n_rows,
                    "file_size_in_bytes": (
                        afs.get_file_info(ap).size if afs is not None else os.path.getsize(p)
                    ),
                    "partition": {},
                    "lower_bounds": lowers,
                    "upper_bounds": uppers,
                    "null_value_counts": nullcounts,
                }
            )
        doc_updates = None
        if any_without_ids:
            # Imported footers carry no parquet field ids, so field-id
            # resolution would read them as all-NULL. Record the Iceberg
            # name mapping (spec: schema.name-mapping.default) binding
            # each field id to the column names it may appear under;
            # the scan reads such files by mapped name. Merged with any
            # existing mapping so files imported before a rename keep
            # resolving under their old names.
            props = dict(self.meta.raw.get("properties", {}))
            existing = {}
            if "schema.name-mapping.default" in props:
                for e in json.loads(props["schema.name-mapping.default"]):
                    existing[e["field-id"]] = list(e.get("names", []))
            for c in self.schema.columns:
                names = existing.setdefault(c.field_id, [])
                if c.name not in names:
                    names.append(c.name)
            props["schema.name-mapping.default"] = json.dumps(
                [{"field-id": fid, "names": names} for fid, names in sorted(existing.items())]
            )
            doc_updates = {"properties": props}
        self._commit(
            operation="append",
            new_data_files=entries,
            extra_summary={"added-data-files": str(len(entries)), "added-files-imported": "true"},
            doc_updates=doc_updates,
        )

    def insert_sql(self, select_sql: str) -> None:
        """INSERT INTO t <select> with the current table visible as `t`."""
        self.scan().createOrReplaceTempView("t")
        self.append(self.spark.sql(select_sql))

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Dynamic partition overwrite (INSERT OVERWRITE semantics):
        atomically replace exactly the partitions present in `df`,
        keeping every other partition's files untouched (file-level
        metadata swap — untouched partitions are never read or
        rewritten, so the cost is O(changed partitions) at any table
        size).

        Tables with outstanding delete files must be compacted first
        (`rewrite_data_files()`): carrying old delete files across an
        overwrite while re-sequencing kept data files would corrupt
        sequence-scoped delete semantics, so this refuses instead."""
        from .plans.manifests import load_table_scan

        if not self.partition_fields:
            raise ValueError("overwrite_partitions requires a partitioned table")
        snap = self.meta.latest_snapshot() if self.meta.snapshots else None
        kept: list[dict] = []
        if snap is not None:
            scan = load_table_scan(self.meta, snap, self.path, False)
            if scan.positional_delete_files() or scan.equality_delete_files():
                raise ValueError(
                    "overwrite_partitions on a table with delete files: run "
                    "rewrite_data_files() first to materialize deletes"
                )
            new_files = self._write_parquet_files(self._aligned(df), partitioned=True)
            targets = {tuple(sorted(f["partition"].items())) for f in new_files}
            for e in scan.data_files():
                if tuple(sorted((e.partition or {}).items())) not in targets:
                    kept.append(
                        {
                            "file_path": e.file_path,
                            "file_format": e.file_format,
                            "record_count": e.record_count,
                            "file_size_in_bytes": e.file_size_in_bytes,
                            "partition": e.partition,
                            "lower_bounds": e.lower_bounds,
                            "upper_bounds": e.upper_bounds,
                            "null_value_counts": e.null_value_counts,
                            # v3 row lineage: carried files keep their ids
                            "first_row_id": e.first_row_id,
                        }
                    )
        else:
            new_files = self._write_parquet_files(self._aligned(df), partitioned=True)
            targets = {tuple(sorted(f["partition"].items())) for f in new_files}
        self._commit(
            operation="overwrite",
            new_data_files=kept + new_files,
            keep_previous=False,
            extra_summary={
                "replaced-partitions": str(len(targets)),
                "kept-data-files": str(len(kept)),
            },
        )

    def delete_where(self, condition) -> None:
        """Merge-on-read DELETE: write position-delete files for matched
        rows (no data-file rewrite). `condition` is a Column or SQL string."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        matched = self._scan_with_pos().filter(cond)
        files = self._write_position_deletes(matched)
        if not files:
            return
        n = self._added_pos_deletes(files)
        self._commit(
            operation="delete",
            new_delete_files=files,
            extra_summary={"added-position-deletes": str(n), "total-position-deletes": str(self._total_pos_deletes() + n)},
        )

    def update_where(self, condition, assignments: dict) -> None:
        """Merge-on-read UPDATE: position-delete matched rows + append
        re-written rows with `assignments` applied."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        live = self._scan_with_pos()
        matched = live.filter(cond)
        updated = matched
        for col, val in assignments.items():
            expr = F.expr(val) if isinstance(val, str) else (val if isinstance(val, Column) else F.lit(val))
            updated = updated.withColumn(col, expr)
        updated = updated.drop("__file", "__pos")
        new_files = self._write_parquet_files(self._aligned(updated), partitioned=True)
        del_files = self._write_position_deletes(matched)
        if not del_files and not new_files:
            return
        n = self._added_pos_deletes(del_files)
        self._commit(
            operation="overwrite",
            new_data_files=new_files,
            new_delete_files=del_files,
            extra_summary={"added-position-deletes": str(n), "total-position-deletes": str(self._total_pos_deletes() + n)},
        )

    def merge(
        self,
        source: DataFrame,
        on: str | list[str],
        *,
        when_matched_update: Optional[dict] = None,
        when_matched_delete: bool = False,
        when_not_matched_insert: bool = True,
    ) -> None:
        """MERGE INTO (merge-on-read): one commit containing
        position-deletes for matched target rows plus appended rows for
        their replacements and for unmatched source rows.

        - ``when_matched_update``: {col: sql_expr/Column/literal} —
          expressions may reference target columns and source columns
          as ``src.<col>``;
        - ``when_matched_delete=True``: matched rows are deleted
          (mutually exclusive with update);
        - ``when_not_matched_insert``: source rows with no target match
          are appended (source must be schema-compatible).

        The classic upsert is ``merge(src, on=key,
        when_matched_update={...}, when_not_matched_insert=True)``.
        """
        if when_matched_update and when_matched_delete:
            raise ValueError("choose either when_matched_update or when_matched_delete")
        keys = [on] if isinstance(on, str) else list(on)
        tgt = self._scan_with_pos()
        src = source.alias("src")
        cond = None
        for k in keys:
            clause = tgt[k].eqNullSafe(F.col(f"src.{k}"))
            cond = clause if cond is None else (cond & clause)
        matched = tgt.alias("tgt").join(src, cond, "inner")

        del_files: list[dict] = []
        new_files: list[dict] = []
        if when_matched_update or when_matched_delete:
            del_files = self._write_position_deletes(matched)
        if when_matched_update:
            sel = []
            for c in (cc.name for cc in self.schema.columns):
                if c in when_matched_update:
                    val = when_matched_update[c]
                    expr = F.expr(val) if isinstance(val, str) else (val if isinstance(val, Column) else F.lit(val))
                    sel.append(expr.alias(c))
                else:
                    sel.append(F.col(f"tgt.{c}").alias(c))
            new_files += self._write_parquet_files(self._aligned(matched.select(*sel)), partitioned=True)
        if when_not_matched_insert:
            # anti join source rows against target keys
            tkeys = tgt.select(*[F.col(k).alias(f"__t_{k}") for k in keys])
            acond = None
            for k in keys:
                clause = F.col(f"src.{k}").eqNullSafe(F.col(f"__t_{k}"))
                acond = clause if acond is None else (acond & clause)
            unmatched = src.join(tkeys, acond, "left_anti")
            new_files += self._write_parquet_files(self._aligned(unmatched), partitioned=True)
        if not del_files and not new_files:
            return
        n = self._added_pos_deletes(del_files)
        self._commit(
            operation="overwrite",
            new_data_files=new_files or None,
            new_delete_files=del_files or None,
            extra_summary={"added-position-deletes": str(n), "total-position-deletes": str(self._total_pos_deletes() + n)},
        )

    def delete_where_equality(self, keys_df: DataFrame) -> None:
        """Equality-delete commit: rows matching ANY row of ``keys_df``
        (on its columns) are deleted. Writes an Iceberg
        equality-delete file (content=2, equality_ids = the key
        columns' field ids) scoped by sequence number.

        The reference reads such tables INCORRECTLY (treats every
        delete file as positional, reference iceberg_scan.cpp:167-169);
        our scan applies them as a sequence-scoped anti join —
        deliberate spec-correct divergence (SURVEY.md §7.5)."""
        name_to_id = {c.name: c.field_id for c in self.schema.columns}
        cols = keys_df.columns
        unknown = [c for c in cols if c not in name_to_id]
        if unknown:
            raise ValueError(f"equality-delete columns not in schema: {unknown}")
        aligned = keys_df.select(
            *[
                F.col(c).cast(dict((cc.name, cc.spark_type) for cc in self.schema.columns)[c])
                .alias(c, metadata={"parquet.field.id": name_to_id[c]})
                for c in cols
            ]
        ).dropDuplicates()
        files = self._write_parquet_files(aligned)
        for f in files:
            f["content"] = 2
            f["equality_ids"] = [name_to_id[c] for c in cols]
        if not files:
            return
        self._commit(
            operation="delete",
            new_delete_files=files,
            extra_summary={"added-equality-deletes": str(sum(f["record_count"] for f in files))},
        )

    # -- DDL (schema evolution) -------------------------------------------

    def add_column(self, name: str, iceberg_type: str, default: Any = None) -> None:
        """ALTER TABLE ADD COLUMN [DEFAULT] — new schema version;
        existing rows surface `default` via initial-default (v2 spec)."""
        new_id = self.meta.raw.get("last-column-id", _max_field_id(self.schema)) + 1
        col = IcebergColumn(
            field_id=new_id,
            name=name,
            spark_type=parse_iceberg_type(iceberg_type),
            required=False,
            initial_default=default,
            write_default=default,
        )
        self._evolve_schema(self.schema.columns + [col], last_column_id=new_id)

    def alter_column_type(self, name: str, iceberg_type: str) -> None:
        """ALTER COLUMN TYPE (widening: int→long, float→double,
        decimal precision growth)."""
        cols = []
        for c in self.schema.columns:
            if c.name == name:
                c = IcebergColumn(
                    field_id=c.field_id,
                    name=c.name,
                    spark_type=parse_iceberg_type(iceberg_type),
                    required=c.required,
                    initial_default=c.initial_default,
                    write_default=c.write_default,
                )
            cols.append(c)
        self._evolve_schema(cols, last_column_id=self.meta.raw.get("last-column-id"))

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN — field-id identity keeps data files
        readable with no rewrite."""
        cols = [
            IcebergColumn(c.field_id, new if c.name == old else c.name, c.spark_type, c.required, c.initial_default, c.write_default)
            for c in self.schema.columns
        ]
        self._evolve_schema(cols, last_column_id=self.meta.raw.get("last-column-id"))

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMN — metadata-only."""
        cols = [c for c in self.schema.columns if c.name != name]
        self._evolve_schema(cols, last_column_id=self.meta.raw.get("last-column-id"))

    def add_partition_field(self, spec_entry) -> None:
        """Partition evolution (`ALTER TABLE ... ADD PARTITION FIELD`):
        append a field to the partition spec as a NEW spec-id and make
        it the default. Metadata-only — existing data files keep their
        old-spec partition structs; only future writes are routed (and
        prunable) by the new field. The read side keeps old-spec files
        on a new-field partition_filter (their rows may match), which
        is exactly the Iceberg spec's mixed-spec scan behavior.

        Accepts the same syntax as ``create(partition_by=...)``:
        ``"col"``, ``"years(col)"``, ``("bucket", 4, "col")`` ...
        """
        doc = dict(self.meta.raw)
        specs = doc.get("partition-specs", [])
        cur_id = doc.get("default-spec-id", 0)
        cur = next((s for s in specs if s.get("spec-id", 0) == cur_id), {"fields": []})
        max_pfid = max(
            (f["field-id"] for s in specs for f in s.get("fields", [])), default=999
        )
        pf = _parse_spec_entry(spec_entry, max_pfid + 1)
        name_to_id = {c.name: c.field_id for c in self.schema.columns}
        if pf.source not in name_to_id:
            raise ValueError(f"partition source column {pf.source!r} not in schema")
        if any(f["name"] == pf.name for f in cur.get("fields", [])):
            raise ValueError(f"partition field {pf.name!r} already exists")
        new_spec = {
            "spec-id": max((s.get("spec-id", 0) for s in specs), default=-1) + 1,
            "fields": list(cur.get("fields", []))
            + [
                {
                    "name": pf.name,
                    "transform": pf.transform_str(),
                    "source-id": name_to_id[pf.source],
                    "field-id": pf.field_id,
                }
            ],
        }
        doc["partition-specs"] = specs + [new_spec]
        doc["default-spec-id"] = new_spec["spec-id"]
        doc["last-partition-id"] = pf.field_id
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    def remove_partition_field(self, name: str) -> None:
        """Partition evolution (`DROP PARTITION FIELD`): new default
        spec without the field. Metadata-only; existing files keep
        their partition values and stay prunable through their own
        spec, new writes stop routing by the dropped field."""
        doc = dict(self.meta.raw)
        specs = doc.get("partition-specs", [])
        cur_id = doc.get("default-spec-id", 0)
        cur = next((s for s in specs if s.get("spec-id", 0) == cur_id), {"fields": []})
        if not any(f["name"] == name for f in cur.get("fields", [])):
            raise ValueError(f"partition field {name!r} not in current spec")
        new_spec = {
            "spec-id": max((s.get("spec-id", 0) for s in specs), default=-1) + 1,
            "fields": [f for f in cur.get("fields", []) if f["name"] != name],
        }
        doc["partition-specs"] = specs + [new_spec]
        doc["default-spec-id"] = new_spec["spec-id"]
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    def _evolve_schema(self, cols: list[IcebergColumn], last_column_id: Optional[int]) -> None:
        doc = dict(self.meta.raw)
        new_schema_id = max(self.meta.schemas) + 1
        new_schema = IcebergSchema(schema_id=new_schema_id, columns=cols)
        doc["schemas"] = doc.get("schemas", []) + [_schema_to_json(new_schema)]
        doc["current-schema-id"] = new_schema_id
        if last_column_id is not None:
            doc["last-column-id"] = last_column_id
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    def set_properties(self, props: dict) -> None:
        """ALTER TABLE SET TBLPROPERTIES — metadata-only version bump."""
        doc = dict(self.meta.raw)
        merged = dict(doc.get("properties", {}))
        merged.update({str(k): str(v) for k, v in props.items()})
        doc["properties"] = merged
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    def remove_properties(self, keys: list[str]) -> None:
        """ALTER TABLE UNSET TBLPROPERTIES."""
        doc = dict(self.meta.raw)
        props = dict(doc.get("properties", {}))
        for k in keys:
            props.pop(k, None)
        doc["properties"] = props
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    # -- maintenance ------------------------------------------------------

    def compute_statistics(self, columns: Optional[list[str]] = None, *, exact: bool = True) -> dict:
        """Write a Puffin TABLE-STATISTICS file with one NDV blob per
        column and register it under metadata.json ``statistics``
        (Iceberg spec "Table statistics" — the reference reads no
        stats at all; Trino/Spark planners use the blob ``ndv``
        property for join sizing, and so does this engine's
        :func:`~.sources.iceberg.iceberg_join`).

        ``exact=True`` computes COUNT(DISTINCT col) — one aggregation
        pass over the live rows, oracle-comparable, the
        'exact-from-distincts-projection' option; ``exact=False`` uses
        approx_count_distinct (HLL, single no-shuffle-heavy pass), the
        100 TB path where a 2% ndv error is irrelevant to a broadcast
        decision. The blob payload is the 8-byte LE ndv
        (``ndv-long-v1``, an engine extension type — a
        spec-conformant reader that only understands theta sketches
        still gets the number from the ``ndv`` property, which is the
        part the ecosystem actually consumes)."""
        import struct as _struct

        from .plans.puffin import write_puffin_stats_file

        atomic = [
            c
            for c in self.schema.columns
            if not str(c.spark_type).startswith(
                ("ArrayType", "MapType", "StructType", "VariantType")
            )
        ]
        cols = [c for c in atomic if columns is None or c.name in set(columns)]
        if not cols:
            raise ValueError("no eligible columns for statistics")
        fn = F.countDistinct if exact else F.approx_count_distinct
        row = self.scan().agg(*[fn(c.name).alias(c.name) for c in cols]).first()
        snap = self.meta.latest_snapshot()
        snap_id = snap.snapshot_id if snap is not None else -1
        seq = self.meta.raw.get("last-sequence-number", 0)
        path = os.path.join(
            self.path, "metadata", f"{uuid.uuid4().hex}-stats.puffin"
        )
        blobs = [
            {
                "type": "ndv-long-v1",
                "fields": [c.field_id],
                "properties": {"ndv": str(int(row[c.name] or 0))},
                "payload": _struct.pack("<q", int(row[c.name] or 0)),
            }
            for c in cols
        ]
        entry = write_puffin_stats_file(
            path, blobs, snapshot_id=snap_id, sequence_number=seq
        )
        doc = dict(self.meta.raw)
        doc["statistics"] = [
            s for s in doc.get("statistics", []) if s.get("snapshot-id") != snap_id
        ] + [entry]
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)
        return entry

    def rewrite_data_files(
        self,
        target_file_size_bytes: int = 128 * 1024 * 1024,
        sort_by: Optional[list[str]] = None,
        zorder_by: Optional[list[str]] = None,
        collect_statistics: bool = False,
    ) -> None:
        """Compaction: materialize current live rows (deletes applied),
        write right-sized data files, commit a `replace` snapshot that
        references ONLY the new files.

        ``sort_by`` range-partitions and sorts rows by the given
        columns, so each output file covers a narrow value range —
        this is what makes the manifest column bounds (zone maps)
        selective: post-sort, a stats_filter point lookup touches one
        file instead of all of them.

        ``zorder_by`` clusters on a Morton (Z-order) curve over 2+
        numeric columns: each column is min-max-quantized to 16 bits
        and the bits interleaved (pure JVM expressions), then files
        are range-partitioned by the z-value — zone maps become
        selective on EVERY z-ordered column at once, where sort_by
        only helps its leading column. The min/max normalization
        scalars are the only driver-side data (2 numbers per column).
        """
        from .plans.manifests import load_table_scan

        if sort_by and zorder_by:
            raise ValueError("sort_by and zorder_by are mutually exclusive")
        snap = self.meta.latest_snapshot()
        scan = load_table_scan(self.meta, snap, self.path, False)
        total_bytes = sum(e.file_size_in_bytes for e in scan.data_files()) or 1
        n_files = max(1, math.ceil(total_bytes / target_file_size_bytes))
        df = self.scan()
        if zorder_by:
            stats = df.agg(
                *[F.min(c).alias(f"mn_{c}") for c in zorder_by],
                *[F.max(c).alias(f"mx_{c}") for c in zorder_by],
            ).first()
            k = len(zorder_by)
            z = F.lit(0).cast("long")
            for j, c in enumerate(zorder_by):
                mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
                span = (mx - mn) or 1.0
                q = F.least(
                    F.lit(65535),
                    F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * 65535).cast("long"),
                )
                for i in range(16):
                    z = z.bitwiseOR(
                        F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j)
                    )
            df = (
                df.withColumn("__z", z)
                .repartitionByRange(n_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif sort_by:
            df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
        else:
            df = df.repartition(n_files)
        files = self._write_parquet_files(self._aligned(df), partitioned=True)
        doc_updates = None
        if sort_by:
            # record the write order in table metadata (Iceberg
            # sort-orders), so readers/planners know files are
            # clustered by these columns
            name_to_id = {c.name: c.field_id for c in self.schema.columns}
            orders = list(self.meta.raw.get("sort-orders", []))
            order_id = max((o.get("order-id", 0) for o in orders), default=0) + 1
            orders.append(
                {
                    "order-id": order_id,
                    "fields": [
                        {
                            "transform": "identity",
                            "source-id": name_to_id[c],
                            "direction": "asc",
                            "null-order": "nulls-first",
                        }
                        for c in sort_by
                    ],
                }
            )
            doc_updates = {"sort-orders": orders, "default-sort-order-id": order_id}
        self._commit(
            operation="replace",
            new_data_files=files,
            keep_previous=False,
            extra_summary={"total-position-deletes": "0", "rewritten-to-files": str(len(files))},
            doc_updates=doc_updates,
        )
        if collect_statistics:
            # compaction just rewrote every live row — the cheapest
            # moment to refresh table statistics (Spark's
            # rewrite_data_files offers the same coupling)
            self.compute_statistics()

    def rewrite_manifests(self) -> None:
        """Consolidate the manifest tree: merge all live manifest
        entries into ONE manifest per (content type, partition spec)
        and commit a snapshot referencing only the merged manifests
        (Spark's `rewrite_manifests` procedure,
        reference scripts/provision.py uses the same runtime surface).

        A long-lived table accumulates one manifest Avro file per
        commit; at 100 TB that is thousands of small metadata files
        the driver must open serially before ANY scan can plan.
        Merging them is pure metadata work — zero data movement,
        O(#entries) driver time — and restores O(specs) manifest opens
        per scan.

        Entry identity is preserved exactly: each carried entry keeps
        its original ``sequence_number`` / ``file_sequence_number`` /
        ``snapshot_id`` and is re-marked status=EXISTING, so
        sequence-scoped delete application is unaffected. Manifests
        are merged per spec-id (never across): an Iceberg manifest's
        partition struct is typed by its spec, and collapsing specs
        would turn "field absent" (old-spec file, must survive
        pruning on the new field) into "field null" (prunable).
        """
        import copy

        from .plans.avro import read_avro_file
        from .plans.transforms import PartitionField

        snap = self.meta.latest_snapshot()
        groups: dict[tuple[int, int], list[dict]] = {}
        _, manifests = read_avro_file(snap.manifest_list)
        for m in manifests:
            _, entries = read_avro_file(m["manifest_path"])
            key = (m.get("content", 0) or 0, m.get("partition_spec_id", 0) or 0)
            for e in entries:
                if e.get("status") == 2:  # DELETED: drop from merged view
                    continue
                # v2 inheritance: ADDED entries carry an EXPLICIT null
                # sequence_number, inheriting the manifest's — coalesce
                # nulls (not just missing keys) to the SOURCE manifest's
                # number, mirroring read_manifest_entries; otherwise the
                # merged manifest's (higher) number would be inherited
                # and sequence-scoped deletes would stop applying.
                seq_no = e.get("sequence_number")
                if seq_no is None:
                    seq_no = m.get("sequence_number", 0) or 0
                fseq_no = e.get("file_sequence_number")
                if fseq_no is None:
                    fseq_no = m.get("sequence_number", 0) or 0
                groups.setdefault(key, []).append(
                    {
                        "status": 0,  # EXISTING
                        "snapshot_id": e.get("snapshot_id"),
                        "sequence_number": seq_no,
                        "file_sequence_number": fseq_no,
                        "data_file": e["data_file"],
                    }
                )

        id_to_name = {c.field_id: c.name for c in self.schema.columns}

        def entry_schema_for(spec_id: int) -> dict:
            es = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
            spec = next(
                (s for s in self.meta.partition_specs if s.get("spec-id", 0) == spec_id), None
            )
            fields = spec.get("fields", []) if spec else []
            if fields:
                pfields = [PartitionField.from_json(f, id_to_name[f["source-id"]]) for f in fields]
                r102 = next(f for f in es["fields"] if f["name"] == "data_file")["type"]
                next(f for f in r102["fields"] if f["name"] == "partition")["type"]["fields"] = (
                    _partition_avro_fields(pfields, self.schema)
                )
            return es

        meta_dir = os.path.join(self.path, "metadata")
        seq = self.meta.raw.get("last-sequence-number", 0) + 1
        snap_id = _new_snapshot_id()
        merged = []
        for (content, spec_id), entries in sorted(groups.items()):
            mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m{content}.avro")
            length = write_avro_file(
                mpath,
                entry_schema_for(spec_id),
                entries,
                metadata={
                    "schema": json.dumps(_schema_to_json(self.schema)),
                    "partition-spec": "[]",
                    "partition-spec-id": str(spec_id),
                    "format-version": "2",
                    "content": "data" if content == 0 else "deletes",
                },
            )
            rows = sum(e["data_file"]["record_count"] for e in entries)
            merged.append(
                {
                    "manifest_path": mpath,
                    "manifest_length": length,
                    "partition_spec_id": spec_id,
                    "content": content,
                    "sequence_number": seq,
                    "min_sequence_number": min(e["sequence_number"] for e in entries),
                    "added_snapshot_id": snap_id,
                    "added_files_count": 0,
                    "existing_files_count": len(entries),
                    "deleted_files_count": 0,
                    "added_rows_count": 0,
                    "existing_rows_count": rows,
                    "deleted_rows_count": 0,
                }
            )

        ml_path = os.path.join(meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
        write_avro_file(
            ml_path,
            _MANIFEST_FILE_SCHEMA,
            merged,
            metadata={"format-version": "2", "snapshot-id": str(snap_id), "sequence-number": str(seq)},
        )
        ts = _now_ms()
        doc = dict(self.meta.raw)
        doc["last-sequence-number"] = seq
        doc["last-updated-ms"] = ts
        doc["current-snapshot-id"] = snap_id
        doc["snapshots"] = doc.get("snapshots", []) + [
            {
                "snapshot-id": snap_id,
                "sequence-number": seq,
                "timestamp-ms": ts,
                "manifest-list": ml_path,
                "schema-id": doc.get("current-schema-id", 0),
                "summary": {
                    "operation": "replace",
                    "manifests-replaced": str(len(manifests)),
                    "manifests-created": str(len(merged)),
                    "total-position-deletes": str(self._total_pos_deletes()),
                },
            }
        ]
        doc["snapshot-log"] = doc.get("snapshot-log", []) + [{"timestamp-ms": ts, "snapshot-id": snap_id}]
        self._write_metadata(doc)

    def expire_snapshots(self, keep_last: int = 1, older_than_ms: Optional[int] = None) -> None:
        """Drop expired snapshots from metadata (pair with
        remove_orphan_files to reclaim storage). ``keep_last`` retains
        the newest N; ``older_than_ms`` additionally retains everything
        at-or-after that timestamp (the Spark procedure's `older_than`
        — both conditions must agree to expire). Snapshots pinned by a
        tag or branch ref are ALWAYS retained — expiring a named
        version out from under its ref is how real Iceberg deployments
        lose reproducibility, so refs win over both rules. The current
        snapshot is never expired."""
        doc = dict(self.meta.raw)
        snaps = sorted(doc.get("snapshots", []), key=lambda s: s["timestamp-ms"])
        ref_ids = {r["snapshot-id"] for r in doc.get("refs", {}).values()}
        keep_ids = {s["snapshot-id"] for s in snaps[-keep_last:]} | ref_ids
        if older_than_ms is not None:
            keep_ids |= {s["snapshot-id"] for s in snaps if s["timestamp-ms"] >= older_than_ms}
        cur = doc.get("current-snapshot-id", -1)
        if cur != -1:
            keep_ids.add(cur)
        keep = [s for s in snaps if s["snapshot-id"] in keep_ids]
        doc["snapshots"] = keep
        doc["snapshot-log"] = [e for e in doc.get("snapshot-log", []) if e["snapshot-id"] in keep_ids]
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    # -- refs: tags & branches (Iceberg v2 `refs` map) --------------------

    def create_tag(self, name: str, snapshot_id: Optional[int] = None) -> None:
        """Name a snapshot (immutable ref). Tagged snapshots survive
        expire_snapshots-by-count semantics in real Iceberg; here they
        give stable names for time travel: ``scan(tag="v1.0")``."""
        self._set_ref(name, snapshot_id, "tag")

    def create_branch(self, name: str, snapshot_id: Optional[int] = None) -> None:
        """Name a movable ref (branch head). Reads target it via
        ``scan(branch=...)``; writes target it via
        ``append(to_branch=...)`` (write-audit-publish), and
        :meth:`fast_forward` publishes it to the main head."""
        self._set_ref(name, snapshot_id, "branch")

    def fast_forward(self, branch: str) -> None:
        """Publish a branch (`fast_forward` procedure): the main head
        moves to the branch's snapshot. The write-audit-publish
        'publish' step — until this call, snapshots appended with
        ``to_branch=`` are invisible to plain reads.

        Like Iceberg's ``fast_forward`` procedure, the move must be a
        true fast-forward: the current main head must be an ancestor
        of the branch head (walking parent-snapshot-id). If main
        advanced concurrently after the branch was created, publishing
        would silently discard those commits — that case raises
        instead; rebase the branch (re-stage its writes on the new
        head) and retry."""
        ref = self.meta.raw.get("refs", {}).get(branch)
        if ref is None or ref.get("type") != "branch":
            raise ValueError(f"No branch named {branch!r}")
        head = ref["snapshot-id"]
        cur = self.meta.current_snapshot_id
        if cur is not None and cur != -1 and cur != head:
            by_id = {s.snapshot_id: s for s in self.meta.snapshots}
            sid, is_ancestor = head, False
            while sid is not None and sid in by_id:
                if sid == cur:
                    is_ancestor = True
                    break
                sid = by_id[sid].parent_snapshot_id
            if not is_ancestor:
                raise ValueError(
                    f"Cannot fast-forward main to branch {branch!r}: the current "
                    f"main snapshot {cur} is not an ancestor of the branch head "
                    f"{head} (main advanced concurrently; rebase the branch and retry)"
                )
        self.rollback_to(head)

    def _set_ref(self, name: str, snapshot_id: Optional[int], ref_type: str) -> None:
        doc = dict(self.meta.raw)
        sid = snapshot_id if snapshot_id is not None else self.meta.latest_snapshot().snapshot_id
        if sid not in {s["snapshot-id"] for s in doc.get("snapshots", [])}:
            raise ValueError(f"Could not find snapshot with id {sid}")
        refs = dict(doc.get("refs", {}))
        refs[name] = {"snapshot-id": sid, "type": ref_type}
        doc["refs"] = refs
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    def drop_ref(self, name: str) -> None:
        doc = dict(self.meta.raw)
        refs = dict(doc.get("refs", {}))
        if name not in refs:
            raise ValueError(f"Ref {name} does not exist")
        del refs[name]
        doc["refs"] = refs
        doc["last-updated-ms"] = _now_ms()
        self._write_metadata(doc)

    def refs(self) -> dict:
        return dict(self.meta.raw.get("refs", {}))

    def ref_snapshot_id(self, name: str) -> int:
        refs = self.refs()
        if name not in refs:
            raise ValueError(f"Ref {name} does not exist")
        return refs[name]["snapshot-id"]

    def rollback_to(self, snapshot_id: int) -> None:
        """Point the table back at an earlier snapshot (the Spark
        `rollback_to_snapshot` procedure): current-snapshot-id moves,
        a new snapshot-log entry records the change, and NO data or
        snapshot is deleted — the abandoned snapshots stay readable
        via time travel until expire_snapshots()."""
        doc = dict(self.meta.raw)
        ids = {s["snapshot-id"] for s in doc.get("snapshots", [])}
        if snapshot_id not in ids:
            raise ValueError(f"Could not find snapshot with id {snapshot_id}")
        ts = _now_ms()
        doc["current-snapshot-id"] = snapshot_id
        doc["snapshot-log"] = doc.get("snapshot-log", []) + [
            {"timestamp-ms": ts, "snapshot-id": snapshot_id}
        ]
        doc["last-updated-ms"] = ts
        self._write_metadata(doc)

    def remove_orphan_files(self, older_than_ms: Optional[int] = None) -> list[str]:
        """Delete data/delete/avro files referenced by NO remaining
        snapshot. Returns removed paths.

        ``older_than_ms`` (epoch millis) only removes files whose
        mtime predates the cutoff — the Spark procedure's safety
        window: a concurrent writer's just-written files are not yet
        referenced by any snapshot and would otherwise be deleted out
        from under its pending commit."""
        from .plans.avro import read_avro_file
        from .plans.fs import is_local

        if not is_local(self.path):
            raise ValueError(
                "remove_orphan_files requires a local table path (it walks the "
                "directory tree); object-store lifecycles handle remote orphans"
            )
        referenced: set[str] = set()
        for s in self.meta.snapshots:
            referenced.add(os.path.abspath(s.manifest_list))
            _, mans = read_avro_file(s.manifest_list)
            for m in mans:
                mp = os.path.abspath(m["manifest_path"])
                referenced.add(mp)
                _, entries = read_avro_file(mp)
                for e in entries:
                    referenced.add(os.path.abspath(e["data_file"]["file_path"]))
        removed = []
        for sub, exts in (("data", (".parquet",)), ("metadata", (".avro",))):
            top = os.path.join(self.path, sub)
            if not os.path.isdir(top):
                continue
            for root, _dirs, names in os.walk(top):
                for name in names:
                    p = os.path.abspath(os.path.join(root, name))
                    if p.endswith(exts) and p not in referenced:
                        if older_than_ms is not None and os.path.getmtime(p) * 1000 >= older_than_ms:
                            continue
                        os.remove(p)
                        removed.append(p)
        return removed

    # -- stats ------------------------------------------------------------

    def _added_pos_deletes(self, files: list[dict]) -> int:
        """Newly-deleted positions in ``files``: v3 merged-superset
        DVs carry the superseded DVs' prior positions in their
        record_count — subtract them so added-position-deletes counts
        only this commit's deletions (prior positions are disjoint
        from new matches: already-deleted rows never rescan)."""
        merged = sum((getattr(self, "_pending_superseded", None) or {}).values())
        return sum(f["record_count"] for f in files) - merged

    def _total_pos_deletes(self) -> int:
        if not self.meta.snapshots:
            return 0
        last = self.meta.latest_snapshot()
        return int(last.summary.get("total-position-deletes", 0) or 0)


def _max_field_id(schema: IcebergSchema) -> int:
    counter = [max([c.field_id for c in schema.columns], default=0)]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    for c in schema.columns:
        _spark_to_iceberg_type(c.spark_type, next_id)
    return counter[0]
