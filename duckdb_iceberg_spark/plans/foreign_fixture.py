"""Foreign-writer Iceberg interop fixture.

Builds a v2 table the way a *different* engine (Java Iceberg /
pyiceberg) lays one down, sharing NOTHING with this package's own
``writer.py`` code path: metadata JSON, manifests, and parquet data
files are constructed directly here, following the public spec and the
conventions observable in Java-written tables (the reference's own
interop story is Spark-written tables —
``/root/reference/scripts/test_data_generator/generate_iceberg.py:33-39``;
this goes one engine-style further). Every convention below is chosen
to DIFFER from writer.py so a complementary writer/reader bug cannot
cancel out:

- metadata files named ``0000N-<uuid>.metadata.json`` with NO
  version-hint.text (pyiceberg style) -> readers must version-guess;
- Avro manifests + manifest list use the ``zstandard`` codec;
- manifest entries carry Java's full optional field set
  (snapshot_id, file_sequence_number, value_counts, split_offsets,
  sort_order_id) and ADDED entries leave sequence_number null
  (sequence-number INHERITANCE from the manifest list);
- parquet data files carry PARQUET:field_id metadata with the physical
  column order REVERSED vs the table schema (field-id resolution,
  not positional);
- two partition specs: spec 0 unpartitioned (first append), spec 1
  identity(p_brand) (later appends) — a mixed-spec table;
- equality deletes (content=2) land mid-history, so sequence-number
  scoping decides which data files they apply to: appends committed
  AFTER the delete must survive rows matching the delete key.

The row population derives from the driver testdata ``part`` table so
a DuckDB oracle can recompute the expected final state from the same
parquet the fixture was built from (see _iceberg_foreign_eq_deletes
in __spark_entry__.py).
"""

from __future__ import annotations

import json
import os
import struct
import urllib.parse
import uuid

from .avro import write_avro_file

# table schema: a 4-column slice of `part`
_FIELDS = [
    {"id": 1, "name": "p_partkey", "required": False, "type": "long"},
    {"id": 2, "name": "p_brand", "required": False, "type": "string"},
    {"id": 3, "name": "p_size", "required": False, "type": "int"},
    {"id": 4, "name": "p_retailprice", "required": False, "type": "double"},
]
# equality-delete predicates (mirrored verbatim in the oracle SQL)
DELETE_SIZES = [1, 2, 3, 48, 49, 50]
DELETE_BRAND = "Brand#33"


def _pa_schema(reverse: bool = True):
    import pyarrow as pa

    types = {"long": pa.int64(), "string": pa.string(), "int": pa.int32(), "double": pa.float64()}
    fields = [
        pa.field(f["name"], types[f["type"]], metadata={b"PARQUET:field_id": str(f["id"]).encode()})
        for f in _FIELDS
    ]
    return pa.schema(list(reversed(fields)) if reverse else fields)


def _write_parquet(path: str, cols: dict[str, list], reverse: bool = True) -> tuple[int, int]:
    """Write one data/delete parquet file; returns (rows, bytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if set(cols) == {f["name"] for f in _FIELDS}:
        schema = _pa_schema(reverse)
    else:  # delete file: just the key column(s), ids preserved
        by_name = {f["name"]: f for f in _FIELDS}
        types = {"long": pa.int64(), "string": pa.string(), "int": pa.int32(), "double": pa.float64()}
        schema = pa.schema(
            [
                pa.field(n, types[by_name[n]["type"]], metadata={b"PARQUET:field_id": str(by_name[n]["id"]).encode()})
                for n in cols
            ]
        )
    table = pa.table({n: cols[n] for n in schema.names}, schema=schema)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)
    return table.num_rows, os.path.getsize(path)


def _bounds(cols: dict[str, list]) -> tuple[list, list]:
    """Iceberg Appendix-D little-endian bounds for long/int columns."""
    lo, hi = [], []
    for f in _FIELDS:
        vals = cols.get(f["name"])
        if not vals:
            continue
        if f["type"] == "long":
            lo.append({"key": f["id"], "value": struct.pack("<q", min(vals))})
            hi.append({"key": f["id"], "value": struct.pack("<q", max(vals))})
        elif f["type"] == "int":
            lo.append({"key": f["id"], "value": struct.pack("<i", min(vals))})
            hi.append({"key": f["id"], "value": struct.pack("<i", max(vals))})
    return lo, hi


# Java-style manifest entry schema: the full optional field set, which
# is a SUPERSET of what writer.py emits — the reader must decode
# against this embedded writer schema, not assume its own field list.
def _entry_schema(partition_fields: list[dict], v3: bool = False) -> dict:
    kv = lambda name, kf, vf, vtype: {  # noqa: E731
        "name": name,
        "type": [
            "null",
            {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": f"k{kf}_v{vf}",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": kf},
                        {"name": "value", "type": vtype, "field-id": vf},
                    ],
                },
            },
        ],
        "default": None,
    }
    return {
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
                            "type": {"type": "record", "name": "r102", "fields": partition_fields},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        kv("column_sizes", 117, 118, "long"),
                        kv("value_counts", 119, 120, "long"),
                        kv("null_value_counts", 121, 122, "long"),
                        kv("nan_value_counts", 138, 139, "long"),
                        kv("lower_bounds", 126, 127, "bytes"),
                        kv("upper_bounds", 129, 130, "bytes"),
                        {"name": "key_metadata", "type": ["null", "bytes"], "default": None, "field-id": 131},
                        {
                            "name": "split_offsets",
                            "type": ["null", {"type": "array", "items": "long", "element-id": 133}],
                            "default": None,
                            "field-id": 132,
                        },
                        {
                            "name": "equality_ids",
                            "type": ["null", {"type": "array", "items": "int", "element-id": 136}],
                            "default": None,
                            "field-id": 135,
                        },
                        {"name": "sort_order_id", "type": ["null", "int"], "default": None, "field-id": 140},
                    ]
                    + (
                        [
                            # v3 deletion-vector fields (Iceberg spec 143-145)
                            {"name": "referenced_data_file", "type": ["null", "string"], "default": None, "field-id": 143},
                            {"name": "content_offset", "type": ["null", "long"], "default": None, "field-id": 144},
                            {"name": "content_size_in_bytes", "type": ["null", "long"], "default": None, "field-id": 145},
                        ]
                        if v3
                        else []
                    ),
                },
            },
        ],
    }


_SPEC1_PARTITION_FIELDS = [
    {"name": "p_brand", "type": ["null", "string"], "default": None, "field-id": 1000}
]

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
        {"name": "key_metadata", "type": ["null", "bytes"], "default": None, "field-id": 519},
    ],
}


def _data_entry(cols, fpath, size_bytes, *, seq, snap_id, partition=None, eq_ids=None, content=0, dv=None, n=None):
    """``dv``: (referenced_data_file, content_offset, content_size) for
    a v3 deletion-vector entry (content=1, file_format='puffin');
    ``n`` overrides record_count (the DV's cardinality)."""
    lo, hi = _bounds(cols) if cols else ([], [])
    if n is None:
        n = len(next(iter(cols.values())))
    entry = {
        "status": 1,  # ADDED
        "snapshot_id": snap_id,
        "sequence_number": seq,  # None => inherited from manifest list
        "file_sequence_number": None,
        "data_file": {
            "content": content,
            "file_path": fpath,
            "file_format": "PUFFIN" if dv else "PARQUET",
            "partition": partition or {},
            "record_count": n,
            "file_size_in_bytes": size_bytes,
            "column_sizes": None,
            "value_counts": [{"key": f["id"], "value": n} for f in _FIELDS if f["name"] in cols],
            "null_value_counts": [{"key": f["id"], "value": 0} for f in _FIELDS if f["name"] in cols],
            "nan_value_counts": None,
            "lower_bounds": lo or None,
            "upper_bounds": hi or None,
            "key_metadata": None,
            "split_offsets": None if dv else [4],
            "equality_ids": eq_ids,
            "sort_order_id": 0 if content == 0 else None,
        },
    }
    # always present so the v3 entry schema can encode any entry; the
    # v2 schema simply never references these keys
    ref, off, size = dv if dv else (None, None, None)
    entry["data_file"]["referenced_data_file"] = ref
    entry["data_file"]["content_offset"] = off
    entry["data_file"]["content_size_in_bytes"] = size
    return entry


def write_foreign_table(
    part_parquet: str, table_path: str, *, extra_eq_delete_files: int = 0
) -> dict:
    """Build the fixture table at ``table_path`` from the testdata
    ``part`` parquet. Returns a summary dict (counts per commit) so
    tests can sanity-check the construction itself.

    ``extra_eq_delete_files`` > 0 additionally writes that many
    SINGLE-ROW equality-delete files (all ``eq_ids=[1]``, one
    p_partkey each, taken from commit 1's keys) into the same seq-3
    delete commit — the shape a long-lived MoR table converges to
    (one tiny delete file per upsert batch). Used by the plan test
    that asserts delete application stays ONE anti-join per
    equality_ids group no matter how many files carry it."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT p_partkey, p_brand, p_size, p_retailprice "
        f"FROM read_parquet('{part_parquet}') ORDER BY p_partkey"
    ).fetchall()
    con.close()

    def group(mod):
        sel = [r for r in rows if r[0] % 3 == mod]
        return {
            "p_partkey": [r[0] for r in sel],
            "p_brand": [r[1] for r in sel],
            "p_size": [r[2] for r in sel],
            "p_retailprice": [r[3] for r in sel],
        }

    def by_brand(cols):
        out: dict[str, dict[str, list]] = {}
        for i, b in enumerate(cols["p_brand"]):
            g = out.setdefault(b, {k: [] for k in cols})
            for k in cols:
                g[k].append(cols[k][i])
        return out

    meta_dir = os.path.join(table_path, "metadata")
    data_dir = os.path.join(table_path, "data")
    os.makedirs(meta_dir, exist_ok=True)
    manifests: list[dict] = []  # accumulated manifest-file records (newest first)
    snapshots: list[dict] = []
    summary = {}

    def add_manifest(entries, *, spec_id, content, seq, snap_id, partition_fields):
        mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m{len(manifests)}.avro")
        length = write_avro_file(
            mpath,
            _entry_schema(partition_fields),
            entries,
            metadata={
                "schema": json.dumps(_schema_json()),
                "schema-id": "0",
                "partition-spec": json.dumps(partition_fields and _spec_json(1)["fields"] or []),
                "partition-spec-id": str(spec_id),
                "format-version": "2",
                "content": "data" if content == 0 else "deletes",
            },
            codec="zstandard",
        )
        manifests.insert(
            0,
            {
                "manifest_path": mpath,
                "manifest_length": length,
                "partition_spec_id": spec_id,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(e["data_file"]["record_count"] for e in entries),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "key_metadata": None,
            },
        )

    def commit(seq, snap_id, op):
        ml = os.path.join(meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
        write_avro_file(
            ml,
            _MANIFEST_FILE_SCHEMA,
            list(manifests),
            metadata={"format-version": "2"},
            codec="zstandard",
        )
        snapshots.append(
            {
                "snapshot-id": snap_id,
                "sequence-number": seq,
                "timestamp-ms": 1700000000000 + seq * 60000,
                "manifest-list": ml,
                "schema-id": 0,
                "summary": {"operation": op},
            }
        )

    # -- commit 1 (seq 1): unpartitioned append, one file, columns reversed
    a = group(0)
    f1 = os.path.join(data_dir, f"00000-0-{uuid.uuid4().hex}-0-00001.parquet")
    n1, sz1 = _write_parquet(f1, a, reverse=True)
    add_manifest(
        [_data_entry(a, f1, sz1, seq=None, snap_id=1001)],  # inherited seq
        spec_id=0, content=0, seq=1, snap_id=1001, partition_fields=[],
    )
    commit(1, 1001, "append")
    summary["commit1_rows"] = n1

    # -- commit 2 (seq 2): spec evolution, brand-partitioned append
    b = group(1)
    entries = []
    for i, (brand, cols) in enumerate(sorted(by_brand(b).items())):
        enc = urllib.parse.quote(brand, safe="")
        fp = os.path.join(data_dir, f"p_brand={enc}", f"00001-{i}-{uuid.uuid4().hex}-0-00001.parquet")
        _, sz = _write_parquet(fp, cols, reverse=False)
        # half explicit, half inherited sequence numbers — Java emits
        # null on fresh adds but compacted manifests carry explicit ones
        entries.append(
            _data_entry(cols, fp, sz, seq=2 if i % 2 else None, snap_id=1002, partition={"p_brand": brand})
        )
    add_manifest(entries, spec_id=1, content=0, seq=2, snap_id=1002, partition_fields=_SPEC1_PARTITION_FIELDS)
    commit(2, 1002, "append")
    summary["commit2_rows"] = len(b["p_partkey"])

    # -- commit 3 (seq 3): equality deletes (two key shapes)
    d1 = os.path.join(data_dir, f"00002-0-{uuid.uuid4().hex}-deletes-00001.parquet")
    _, dsz1 = _write_parquet(d1, {"p_size": DELETE_SIZES})
    d2 = os.path.join(data_dir, f"00002-1-{uuid.uuid4().hex}-deletes-00002.parquet")
    _, dsz2 = _write_parquet(d2, {"p_brand": [DELETE_BRAND]})
    delete_entries = [
        _data_entry({"p_size": DELETE_SIZES}, d1, dsz1, seq=None, snap_id=1003, eq_ids=[3], content=2),
        _data_entry({"p_brand": [DELETE_BRAND]}, d2, dsz2, seq=None, snap_id=1003, eq_ids=[2], content=2),
    ]
    extra_keys = a["p_partkey"][:extra_eq_delete_files]
    for i, k in enumerate(extra_keys):
        dk = os.path.join(data_dir, f"00002-{i + 2}-{uuid.uuid4().hex}-deletes-{i + 3:05d}.parquet")
        _, dksz = _write_parquet(dk, {"p_partkey": [k]})
        delete_entries.append(
            _data_entry({"p_partkey": [k]}, dk, dksz, seq=None, snap_id=1003, eq_ids=[1], content=2)
        )
    summary["extra_eq_delete_keys"] = extra_keys
    add_manifest(
        delete_entries,
        spec_id=0, content=1, seq=3, snap_id=1003, partition_fields=[],
    )
    commit(3, 1003, "overwrite")

    # -- commit 4 (seq 4): post-delete append — must SURVIVE the deletes
    c = group(2)
    entries = []
    for i, (brand, cols) in enumerate(sorted(by_brand(c).items())):
        enc = urllib.parse.quote(brand, safe="")
        fp = os.path.join(data_dir, f"p_brand={enc}", f"00003-{i}-{uuid.uuid4().hex}-0-00001.parquet")
        _, sz = _write_parquet(fp, cols, reverse=False)
        entries.append(_data_entry(cols, fp, sz, seq=None, snap_id=1004, partition={"p_brand": brand}))
    add_manifest(entries, spec_id=1, content=0, seq=4, snap_id=1004, partition_fields=_SPEC1_PARTITION_FIELDS)
    commit(4, 1004, "append")
    summary["commit4_rows"] = len(c["p_partkey"])

    # -- metadata JSON: pyiceberg-style name, no version-hint
    doc = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table_path,
        "last-sequence-number": 4,
        "last-updated-ms": 1700000000000 + 4 * 60000,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [_schema_json()],
        "default-spec-id": 1,
        "partition-specs": [{"spec-id": 0, "fields": []}, _spec_json(1)],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.metadata.compression-codec": "none"},
        "current-snapshot-id": 1004,
        "refs": {"main": {"snapshot-id": 1004, "type": "branch"}},
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]} for s in snapshots
        ],
        "metadata-log": [],
        "statistics": [],
        "partition-statistics": [],
    }
    mpath = os.path.join(meta_dir, f"00004-{uuid.uuid4().hex[:12]}.metadata.json")
    with open(mpath, "w") as fh:
        json.dump(doc, fh)
    summary["metadata_path"] = mpath
    return summary


def _schema_json() -> dict:
    return {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": f["id"], "name": f["name"], "required": f["required"], "type": f["type"]}
            for f in _FIELDS
        ],
    }


def _spec_json(spec_id: int) -> dict:
    return {
        "spec-id": spec_id,
        "fields": [{"name": "p_brand", "transform": "identity", "source-id": 2, "field-id": 1000}],
    }


def write_dv_table(part_parquet: str, table_path: str) -> dict:
    """Build an Iceberg V3 table whose deletes are DELETION VECTORS
    (Puffin roaring-bitmap blobs, spec fields 143-145) PLUS one classic
    positional-delete parquet — the mix a v2->v3 upgraded table
    legitimately carries and readers must apply together.

    Layout: commit 1 (seq 1) appends three unpartitioned data files
    (p_partkey mod 3); commit 2 (seq 2) adds one Puffin file holding a
    DV per first two data files (rows with p_size in DELETE_SIZES in
    file 0; the first five rows of file 1) and a parquet positional
    delete for the last three rows of file 2. Returns the summary the
    test needs to compute the expected survivors independently."""
    import duckdb

    from .puffin import write_puffin_dv_file

    con = duckdb.connect()
    rows = con.execute(
        "SELECT p_partkey, p_brand, p_size, p_retailprice "
        f"FROM read_parquet('{part_parquet}') ORDER BY p_partkey"
    ).fetchall()
    con.close()

    meta_dir = os.path.join(table_path, "metadata")
    data_dir = os.path.join(table_path, "data")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    files = []  # (path, rows, size)
    for mod in range(3):
        sel = [r for r in rows if r[0] % 3 == mod]
        cols = {
            "p_partkey": [r[0] for r in sel],
            "p_brand": [r[1] for r in sel],
            "p_size": [r[2] for r in sel],
            "p_retailprice": [r[3] for r in sel],
        }
        fp = os.path.join(data_dir, f"00000-{mod}-{uuid.uuid4().hex}-0-00001.parquet")
        _, sz = _write_parquet(fp, cols, reverse=False)
        files.append((fp, sel, cols, sz))

    # deletion vectors: positions are row ordinals within each file
    dv0 = [i for i, r in enumerate(files[0][1]) if r[2] in DELETE_SIZES]
    dv1 = list(range(5))
    puffin = os.path.join(data_dir, f"00001-0-{uuid.uuid4().hex}-deletes.puffin")
    blob_info = write_puffin_dv_file(
        puffin, {files[0][0]: dv0, files[1][0]: dv1},
        snapshot_id=2002, sequence_number=2,
    )
    # classic positional-delete parquet for file 2 (v2 leftover)
    n2 = len(files[2][1])
    pd_path = os.path.join(data_dir, f"00001-1-{uuid.uuid4().hex}-deletes-00001.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {"file_path": [files[2][0]] * 3, "pos": [n2 - 3, n2 - 2, n2 - 1]},
            schema=pa.schema(
                [
                    pa.field("file_path", pa.string(), metadata={b"PARQUET:field_id": b"2147483546"}),
                    pa.field("pos", pa.int64(), metadata={b"PARQUET:field_id": b"2147483545"}),
                ]
            ),
        ),
        pd_path,
    )
    pd_size = os.path.getsize(pd_path)

    manifests: list[dict] = []
    snapshots: list[dict] = []

    def add_manifest(entries, *, content, seq, snap_id, v3):
        mpath = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m{len(manifests)}.avro")
        length = write_avro_file(
            mpath,
            _entry_schema([], v3=v3),
            entries,
            metadata={
                "schema": json.dumps(_schema_json()),
                "schema-id": "0",
                "partition-spec": json.dumps([]),
                "partition-spec-id": "0",
                "format-version": "3" if v3 else "2",
                "content": "data" if content == 0 else "deletes",
            },
        )
        manifests.insert(
            0,
            {
                "manifest_path": mpath,
                "manifest_length": length,
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(e["data_file"]["record_count"] for e in entries),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "key_metadata": None,
            },
        )

    def commit(seq, snap_id, op):
        ml = os.path.join(meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro")
        write_avro_file(ml, _MANIFEST_FILE_SCHEMA, list(manifests), metadata={"format-version": "3"})
        snapshots.append(
            {
                "snapshot-id": snap_id,
                "sequence-number": seq,
                "timestamp-ms": 1700000000000 + seq * 60000,
                "manifest-list": ml,
                "schema-id": 0,
                "summary": {"operation": op},
            }
        )

    add_manifest(
        [
            _data_entry(cols, fp, sz, seq=None, snap_id=2001)
            for fp, _sel, cols, sz in files
        ],
        content=0, seq=1, snap_id=2001, v3=True,
    )
    commit(1, 2001, "append")

    add_manifest(
        [
            _data_entry(
                {}, puffin, os.path.getsize(puffin), seq=None, snap_id=2002,
                content=1, dv=(ref, off, size), n=card,
            )
            for ref, (off, size, card) in blob_info.items()
        ]
        + [
            _data_entry(
                {}, pd_path, pd_size, seq=None, snap_id=2002, content=1, n=3
            )
        ],
        content=1, seq=2, snap_id=2002, v3=True,
    )
    commit(2, 2002, "delete")

    doc = {
        "format-version": 3,
        "table-uuid": str(uuid.uuid4()),
        "location": table_path,
        "last-sequence-number": 2,
        "last-updated-ms": 1700000000000 + 2 * 60000,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [_schema_json()],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.metadata.compression-codec": "none"},
        "current-snapshot-id": 2002,
        "refs": {"main": {"snapshot-id": 2002, "type": "branch"}},
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]} for s in snapshots
        ],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(doc, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return {
        "files": [fp for fp, _s, _c, _z in files],
        "dv0_positions": dv0,
        "dv1_positions": dv1,
        "groups": [[r[0] for r in sel] for _fp, sel, _c, _z in files],
        "n_rows": len(rows),
    }
