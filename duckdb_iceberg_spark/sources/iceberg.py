"""Iceberg table functions, Spark-first.

Public surface mirrors the reference extension's three table functions
(reference ``src/iceberg_functions.cpp:10-24``):

- :func:`iceberg_scan`       (iceberg_scan.cpp:217-337)
- :func:`iceberg_snapshots`  (iceberg_snapshots.cpp)
- :func:`iceberg_metadata`   (iceberg_metadata.cpp)

Architecture (SURVEY.md §3.1): all metadata work (path resolution,
snapshot selection, Avro manifest walk) happens once on the driver in
pure Python — the moral equivalent of the reference's bind-replace —
and the result is a *declarative DataFrame plan* that Catalyst
optimizes: multi-file parquet scan with explicit schema (predicate
pushdown + column pruning reach the scan), positional deletes applied
as a broadcast ANTI join keyed on (`_metadata.file_path`,
`_metadata.row_index`) — the exact Spark equivalents of DuckDB's
``filename``/``file_row_number`` virtual columns the reference uses
(iceberg_scan.cpp:177-182).

Scale notes (100 TB design):
- Manifest metadata is KB-MB scale even for huge tables; driver-side
  parse is what every Iceberg runtime does. If a table had 100k+
  manifests, `read_manifest_entries` calls could be fanned out with a
  thread pool or a Spark job over avro bytes — structured so that's a
  drop-in change.
- Delete files are a small fraction of data (cardinality known from
  manifest `record_count` sums — same numbers the reference injects
  as `explicit_cardinality`); we broadcast them for a shuffle-free
  anti join when under the broadcast cap, else fall back to a shuffled
  anti join automatically.
- One task per parquet file is NOT required: `_metadata.row_index` is
  split-safe (computed by the reader per file), unlike
  monotonically_increasing_id tricks.
"""

from __future__ import annotations

import datetime
import json
import math
import os
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.manifests import (
    EntryStatus,
    FileContent,
    IcebergTableScan,
    ManifestContent,
    load_table_scan,
)
from ..plans.table_metadata import (
    DEFAULT_TABLE_VERSION_FORMAT,
    IcebergSchema,
    TableMetadata,
    load_table_metadata,
)

__all__ = ["iceberg_scan", "iceberg_snapshots", "iceberg_metadata"]


def _load(
    path: str,
    *,
    version: Optional[str],
    version_name_format: str,
    metadata_compression_codec: str,
    unsafe_enable_version_guessing: bool,
) -> TableMetadata:
    return load_table_metadata(
        path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )


def _table_root(path: str) -> str:
    """Table root dir for moved-path rebasing; handles direct
    ``…/metadata/vN.metadata.json`` inputs."""
    if path.endswith(".json") or path.endswith(".json.gz"):
        parent = os.path.dirname(path)
        if os.path.basename(parent) == "metadata":
            return os.path.dirname(parent)
        return parent
    return path


def _select_snapshot(meta: TableMetadata, snapshot_id, timestamp):
    if snapshot_id is not None:
        return meta.snapshot_by_id(int(snapshot_id))
    if timestamp is not None:
        if isinstance(timestamp, datetime.datetime):
            ts_ms = int(timestamp.timestamp() * 1000)
        else:
            ts_ms = int(timestamp)
        return meta.snapshot_by_timestamp(ts_ms)
    return meta.latest_snapshot()


def _norm_path(col):
    """Normalize a file URI/path for exact-path comparison."""
    return F.regexp_replace(col, r"^file:/+", "/")


def _decode_file_uri(col):
    """Spark's ``_metadata.file_path`` is a URI — path segments are
    percent-encoded (a dir literally named ``p_brand=Brand%2333``, as
    Java writers emit for partition value ``Brand#33``, is reported as
    ``...Brand%252333...``), while manifest/delete-file paths are raw
    filesystem paths. Decode ONCE at the ``__file`` source so every
    downstream comparison (positional-delete join, equality-delete
    sequence join, moved-path tail match) compares raw against raw.
    A literal ``+`` is valid raw in a URI path segment and must NOT
    become a space, so escape it before url_decode."""
    return F.url_decode(F.regexp_replace(col, r"\+", "%2B"))


def _tail(col):
    """Last '/'-segment — the reference's moved-path filename match
    (iceberg_scan.cpp:39-62, string_split + list_extract(-1))."""
    return F.substring_index(col, "/", -1)


_DELETE_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("pos", T.LongType()),
    ]
)

# Base-relation memo for iceberg_scan's default read path (see the
# inline comment there). Keyed by session applicationId so a restarted
# session never serves plans bound to a dead JVM.
_READ_CACHE: dict = {}
_READ_CACHE_MAX = 128


def _sniff_footer(path: str) -> tuple[bool, frozenset]:
    """(has_field_ids, column_names) of one parquet footer."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(path)
    has_ids = any((f.metadata or {}).get(b"PARQUET:field_id") is not None for f in sch)
    return has_ids, frozenset(sch.names)


def _split_by_field_ids(files: list) -> tuple[list, list]:
    """Partition files into (with field ids, without) — concurrent
    footer reads, same pattern as the manifest decode fan-out."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        flags = list(ex.map(lambda p: _sniff_footer(p)[0], files))
    with_ids = [p for p, f in zip(files, flags) if f]
    without = [p for p, f in zip(files, flags) if not f]
    return with_ids, without


def _name_mapped_reads(spark, schema: "IcebergSchema", mapping_json: str, files: list):
    """Reads for id-less files under schema.name-mapping.default.

    Files are grouped by which mapped name each field resolves to in
    their footer (files imported before a rename may carry an older
    name), one read per distinct resolution; unmapped fields read as
    NULL. Yields (reader_df, select_columns aliased to current names).
    """
    import json as _json

    if not files:
        return
    mp = {e["field-id"]: e.get("names", []) for e in _json.loads(mapping_json)}
    groups: dict = {}
    for p in files:
        _, names_in_file = _sniff_footer(p)
        sig = tuple(
            next((n for n in (mp.get(c.field_id) or [c.name]) if n in names_in_file), None)
            for c in schema.columns
        )
        groups.setdefault(sig, []).append(p)
    for sig, fl in groups.items():
        fields = [
            T.StructField(n, c.spark_type, True)
            for n, c in zip(sig, schema.columns)
            if n is not None
        ]
        d = spark.read.schema(T.StructType(fields)).parquet(*fl)
        cols = [
            F.col(n).alias(c.name) if n is not None else F.lit(None).cast(c.spark_type).alias(c.name)
            for n, c in zip(sig, schema.columns)
        ]
        yield d, cols


def iceberg_scan(
    spark: SparkSession,
    path: str,
    snapshot_id: Optional[int] = None,
    timestamp=None,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    allow_moved_paths: bool = False,
    mode: str = "default",
    skip_schema_inference: bool = False,
    unsafe_enable_version_guessing: bool = False,
    partition_filter=None,
    stats_filter=None,
    where: Optional[str] = None,
    ref: Optional[str] = None,
    time_as_string: bool = False,
    io: str = "spark",
    row_lineage: bool = False,
    _keep_position_columns: bool = False,
) -> DataFrame:
    """Read an Iceberg table at a snapshot, applying delete files.

    Equivalent of the reference's ``iceberg_scan(path[, snapshot_id |
    timestamp])`` with the same named parameters
    (iceberg_scan.cpp:301-337). Returns a DataFrame Catalyst plans
    normally (pushdown/pruning reach the parquet scan).

    ``partition_filter`` prunes data files from manifest partition
    values BEFORE the DataFrame is constructed — at 100 TB this is the
    difference between scanning a day and scanning a decade. Accepts
    a dict of ``{source_column: literal}`` (the matching transform is
    applied to the literal — hidden partitioning) or a callable
    ``partition_values_dict -> bool``. File pruning the reference
    never does (its partial Avro schemas drop partition data,
    reference iceberg_types.hpp:122-155; SURVEY.md §4).

    ``stats_filter`` is zone-map file skipping from manifest
    lower/upper bounds: ``{column: (lo, hi)}`` with ``None`` for an
    open side; a file is kept iff its [min,max] may intersect every
    range. Files without stats are always kept (correctness-safe).

    ``where`` is the one-stop predicate API: a SQL boolean expression
    that is ALWAYS applied as an exact row filter, and — when it is a
    conjunction of simple ``col op literal`` clauses — is also
    translated into stats_filter ranges (and partition equality) so
    non-matching files are skipped entirely. Anything unparseable
    still filters correctly, it just prunes less.

    ``row_lineage`` (v3 tables) appends the two Iceberg row-lineage
    virtual columns: ``_row_id`` (the data file's ``first_row_id``,
    spec field 142, plus the row's position — inherited executor-side
    from a broadcast per-file map, no shuffle) and
    ``_last_updated_sequence_number`` (the file's data sequence
    number). A data file with a null per-file ``first_row_id``
    inherits it from its manifest's ``first_row_id`` (spec field 520)
    plus the cumulative record counts of preceding null-id data files
    in that manifest — the convention spec-conformant foreign v3
    writers use (plans/manifests.read_manifest_entries). Only when
    neither level carries lineage (v1/v2 history) do rows yield NULL
    ids. Known divergence: this writer's MoR
    UPDATE gives rewritten rows FRESH ids (delete+insert lineage)
    instead of carrying the old ``_row_id`` forward.

    ``time_as_string`` renders Iceberg ``time`` columns (physically
    micros-since-midnight LONGs — Spark has no TIME type) as
    ``HH:MM:SS[.ffffff]`` strings with trailing fractional zeros
    trimmed, matching DuckDB's TIME-to-VARCHAR output (reference
    src/common/schema.cpp:104-106 maps time to a real DuckDB TIME) so
    cross-engine diffs line up. Default off: the LONG form stays
    sortable/arithmetic-friendly.
    """
    meta = _load(
        path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )
    if ref is not None:
        refs = meta.raw.get("refs", {})
        if ref not in refs:
            raise ValueError(f"Ref {ref} does not exist")
        snapshot_id = refs[ref]["snapshot-id"]
    snap = _select_snapshot(meta, snapshot_id, timestamp)
    scan = load_table_scan(meta, snap, _table_root(path), allow_moved_paths)
    data_entries = scan.data_files()
    where_proven = False
    if where is not None:
        w_stats, w_part, w_checks = _predicate_to_pruners(meta, where)
        if w_stats:
            data_entries = _prune_by_stats(meta, data_entries, w_stats)
        if w_part:
            data_entries = _prune_by_partition(meta, data_entries, w_part, strict=False)
        # After pruning, the bounds of every SURVIVING file often prove
        # the predicate outright (e.g. a partition-aligned date range);
        # then the residual per-row filter is pure overhead on exactly
        # the scans pruning was built for. Deletes re-expose rows only
        # WITHIN surviving files, so the proof is delete-safe.
        if w_checks and not _keep_position_columns:
            where_proven = _residual_implied(meta, data_entries, w_checks)
    if partition_filter is not None:
        data_entries = _prune_by_partition(meta, data_entries, partition_filter)
    if stats_filter is not None:
        data_entries = _prune_by_stats(meta, data_entries, stats_filter)
    # Iceberg manifests carry a per-file format; the reference assumes
    # PARQUET silently and would mis-read a foreign ORC/Avro table
    # (file_format parsed then ignored, src/common/iceberg.cpp). Here:
    # PARQUET native, ORC via spark.read.orc (no row positions — Spark
    # exposes _metadata.row_index only for parquet), AVRO via the
    # repo's pure-Python codec decoded executor-side (positions
    # synthesized from record order, so MoR deletes work), anything
    # else fails diagnosably instead of mis-reading.
    def _fmt(e):
        return (e.file_format or "PARQUET").upper()

    unsupported = sorted({_fmt(e) for e in data_entries} - {"PARQUET", "ORC", "AVRO"})
    if unsupported:
        raise ValueError(
            f"Iceberg table contains data files in unsupported format(s) "
            f"{unsupported}; this engine reads PARQUET, ORC and AVRO data files"
        )
    orc_data = [e.file_path for e in data_entries if _fmt(e) == "ORC"]
    avro_data = [e.file_path for e in data_entries if _fmt(e) == "AVRO"]
    data_files = [e.file_path for e in data_entries if _fmt(e) == "PARQUET"]
    pos_entries = scan.positional_delete_files()
    # v3 deletion vectors: content=1 entries whose bytes live at an
    # offset inside a Puffin file (content_offset discriminates them
    # from classic positional-delete parquet)
    dv_entries = [e for e in pos_entries if e.content_offset is not None]
    pos_delete_files = [e.file_path for e in pos_entries if e.content_offset is None]
    eq_deletes = scan.equality_delete_files()

    if mode == "list_files":
        dv_files = list(dict.fromkeys(e.file_path for e in dv_entries))
        rows = [(e.file_path, "data") for e in data_entries] + [
            (f, "delete")
            for f in pos_delete_files + dv_files + [e.file_path for e in eq_deletes]
        ]
        return spark.createDataFrame(rows, "file string, type string")

    schema = meta.schema_for_snapshot(snap)

    if not data_entries:
        st = None if skip_schema_inference else schema.to_struct_type()
        return spark.createDataFrame([], st if st is not None else T.StructType([]))

    if io == "arrow":
        if orc_data or avro_data:
            raise ValueError(
                "io='arrow' supports only PARQUET data files; this table has "
                f"{len(orc_data)} ORC and {len(avro_data)} AVRO data file(s) — "
                "use the default io='spark' path"
            )
        # pyarrow-native executor reads (object-store tables without a
        # JVM connector) — see sources/arrow_scan.py for semantics
        if skip_schema_inference or _keep_position_columns:
            raise ValueError(
                "io='arrow' requires schema inference and does not expose position columns"
            )
        if row_lineage:
            raise ValueError("row_lineage requires the default io='spark' path")
        from .arrow_scan import arrow_scan_df

        nm = meta.properties.get("schema.name-mapping.default")
        mapping = (
            {e["field-id"]: e.get("names", []) for e in json.loads(nm)} if nm else None
        )
        df = arrow_scan_df(
            spark,
            schema,
            data_entries,
            [e for e in pos_entries if e.content_offset is None],
            allow_moved_paths,
            name_mapping=mapping,
            eq_entries=eq_deletes,
            dv_entries=dv_entries,
        )
        for c in schema.columns:
            if c.initial_default is not None:
                df = df.withColumn(
                    c.name, F.coalesce(F.col(c.name), F.lit(c.initial_default).cast(c.spark_type))
                )
        if time_as_string:
            df = _render_time_strings(df, schema)
        if where is not None and not where_proven:
            df = df.filter(where)
        return df
    if io != "spark":
        raise ValueError(f"io must be 'spark' or 'arrow', got {io!r}")

    # Field-id based column resolution (the reference pushes a
    # field_id->column map into the parquet reader, iceberg_scan.cpp:103-128;
    # Spark's native equivalent is parquet.field.id matching). get_spark
    # sets it session-wide; only set here if the caller built a bare
    # session without it (checked, not blind-set: mutating conf per
    # scan() call is a global side effect on concurrent queries).
    if spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false") != "true":
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    want_pos = bool(
        pos_delete_files or dv_entries or eq_deletes or _keep_position_columns or row_lineage
    )
    pos_cols = [
        _decode_file_uri(F.col("_metadata.file_path")).alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    ]
    name_mapping = meta.properties.get("schema.name-mapping.default")
    if not data_files:
        df = None  # ORC/AVRO-only table: parts assembled below
    elif name_mapping and not skip_schema_inference:
        # Some files were imported without parquet field ids
        # (add_files over foreign parquet): under field-id resolution
        # they would read as all-NULL. Apply the Iceberg
        # schema.name-mapping.default (spec §Column-Projection): split
        # the file list by footer-has-ids (one concurrent driver-side
        # footer sniff — only for tables carrying the property) and
        # read id-less files by mapped NAME, aliased back to the
        # current schema.
        with_ids, without_ids = _split_by_field_ids(data_files)
        parts = []
        if with_ids:
            d = spark.read.schema(schema.to_struct_type()).parquet(*with_ids)
            parts.append(d.select("*", *pos_cols) if want_pos else d)
        for d, cols in _name_mapped_reads(spark, schema, name_mapping, without_ids):
            parts.append(d.select(*cols, *pos_cols) if want_pos else d.select(*cols))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
    else:
        reader = spark.read
        if skip_schema_inference:
            # Deliberately NOT the fast path: mergeSchema=true pays a
            # footer merge across every file. This branch exists only
            # for parity with the reference's skip_schema_inference
            # quirk (schema from the files, not the metadata); the
            # default branch pins the metadata schema so no footer
            # merging ever happens.
            reader = reader.option("mergeSchema", "true")
            df = reader.parquet(*data_files)
        else:
            # Memoize the base relation per (session, file set, schema):
            # Iceberg data files are immutable, so the list + pinned
            # schema fully identify the relation, and repeated scans of
            # the same snapshot skip the JVM DataSource resolution +
            # InMemoryFileIndex build (~0.17 s per call on a 224-file
            # table — the dominant plan-time cost for warm queries).
            ck = (
                spark.sparkContext.applicationId,
                schema.to_struct_type().json(),
                tuple(data_files),
            )
            df = _READ_CACHE.pop(ck, None)
            if df is None:
                df = reader.schema(schema.to_struct_type()).parquet(*data_files)
            _READ_CACHE[ck] = df  # (re-)insert: LRU recency
            while len(_READ_CACHE) > _READ_CACHE_MAX:
                _READ_CACHE.pop(next(iter(_READ_CACHE)))
        if want_pos:
            df = df.select("*", *pos_cols)

    if orc_data:
        if want_pos:
            raise ValueError(
                f"Iceberg table has {len(orc_data)} ORC data file(s) and this scan "
                "needs row positions (positional deletes / deletion vectors / "
                "row_lineage): Spark exposes _metadata.row_index only for parquet. "
                "Compact the table to parquet (rewrite_data_files) first."
            )
        if skip_schema_inference:
            raise ValueError("skip_schema_inference is parquet-only; table has ORC data files")
        part = spark.read.schema(schema.to_struct_type()).orc(*orc_data)
        df = part if df is None else df.unionByName(part)
    if avro_data:
        if skip_schema_inference:
            raise ValueError("skip_schema_inference is parquet-only; table has AVRO data files")
        part = _avro_data_df(spark, schema, avro_data, want_pos)
        df = part if df is None else df.unionByName(part)

    if pos_delete_files or dv_entries:
        parts = []
        if pos_delete_files:
            parts.append(spark.read.schema(_DELETE_SCHEMA).parquet(*pos_delete_files))
        if dv_entries:
            # v3 deletion vectors decode executor-side into the SAME
            # (file_path, pos) shape, so both delete kinds share one
            # anti-join
            parts.append(_dv_deletes_df(spark, dv_entries))
        deletes = parts[0]
        for p in parts[1:]:
            deletes = deletes.unionByName(p)
        if allow_moved_paths:
            cond = (_tail(df["__file"]) == _tail(deletes["file_path"])) & (df["__pos"] == deletes["pos"])
        else:
            cond = (_norm_path(df["__file"]) == _norm_path(deletes["file_path"])) & (df["__pos"] == deletes["pos"])
        # Deletes are small relative to data (manifest record_count sums
        # prove it — same stats the reference injects as cardinality);
        # broadcast -> shuffle-free anti join.
        if scan.delete_cardinality() < 50_000_000:
            deletes = F.broadcast(deletes)
        df = df.join(deletes, cond, "left_anti")

    if eq_deletes:
        df = _apply_equality_deletes(spark, df, scan, schema, allow_moved_paths)

    if row_lineage:
        # inherit _row_id / _last_updated_sequence_number from a
        # broadcast (file -> first_row_id, seq) map: O(#files) driver
        # rows, zero shuffle — matches how every v3 reader assigns
        # lineage at scan time
        lrows = [
            (
                e.file_path,
                e.first_row_id if e.first_row_id is not None else None,
                int(e.sequence_number or 0),
            )
            for e in data_entries
        ]
        ldf = spark.createDataFrame(lrows, "lfile string, lfirst long, lseq long")
        if allow_moved_paths:
            lcond = _tail(df["__file"]) == _tail(ldf["lfile"])
        else:
            lcond = _norm_path(df["__file"]) == _norm_path(ldf["lfile"])
        df = (
            df.join(F.broadcast(ldf), lcond, "left")
            .withColumn("_row_id", F.col("lfirst") + F.col("__pos"))
            .withColumn("_last_updated_sequence_number", F.col("lseq"))
            .drop("lfile", "lfirst", "lseq")
        )

    if want_pos and not _keep_position_columns:
        df = df.drop("__file", "__pos")

    # initial-default for columns added after some files were written
    # (Iceberg v2 initial-default; reference passes default_value into the
    # parquet reader map, iceberg_scan.cpp:103-128). Files lacking the
    # field yield NULL under field-id resolution -> coalesce.
    if not skip_schema_inference:
        for c in schema.columns:
            if c.initial_default is not None:
                df = df.withColumn(
                    c.name, F.coalesce(F.col(c.name), F.lit(c.initial_default).cast(c.spark_type))
                )

    if time_as_string and not skip_schema_inference:
        df = _render_time_strings(df, schema)

    if where is not None and not where_proven:
        df = df.filter(where)

    return df


def _render_time_strings(df: DataFrame, schema) -> DataFrame:
    """Render Iceberg ``time`` columns (micros-since-midnight LONGs)
    as ``HH:MM:SS[.ffffff]`` strings, DuckDB TIME-to-VARCHAR style
    (see iceberg_scan's ``time_as_string`` doc)."""
    for c in schema.columns:
        if c.iceberg_type == "time" and c.name in df.columns:
            v = F.col(c.name)
            base = F.format_string(
                "%02d:%02d:%02d",
                F.floor(v / F.lit(3_600_000_000)),
                F.floor((v % F.lit(3_600_000_000)) / F.lit(60_000_000)),
                F.floor((v % F.lit(60_000_000)) / F.lit(1_000_000)),
            )
            us = v % F.lit(1_000_000)
            frac = F.when(us == 0, F.lit("")).otherwise(
                F.concat(F.lit("."), F.regexp_replace(F.format_string("%06d", us), "0+$", ""))
            )
            df = df.withColumn(
                c.name, F.when(v.isNull(), F.lit(None)).otherwise(F.concat(base, frac))
            )
    return df


def _prune_by_partition(meta: TableMetadata, entries, flt, strict: bool = True):
    """Driver-side manifest pruning: keep entries whose partition
    values satisfy ``flt`` (dict of source-col literals, or callable).
    ``strict=False`` silently ignores non-partition columns (used for
    pruners auto-derived from a ``where`` predicate)."""
    from ..plans.transforms import PartitionField

    # Resolve each entry's partition fields from its OWN spec
    # (ManifestEntry.spec_id, carried from the owning manifest's
    # partition_spec_id). After partition evolution the same field
    # NAME can exist in two specs with DIFFERENT transforms (dropped
    # and re-added, e.g. bucket(4) -> bucket(8)); pruning an old-spec
    # file with the new spec's transform would drop matching files.
    schema = meta.schemas[meta.current_schema_id]
    id_to_name = {c.field_id: c.name for c in schema.columns}
    spec_fields: dict[int, dict[str, list]] = {}
    any_fields = False
    for s in meta.partition_specs:
        by_source: dict[str, list] = {}
        for f in s.get("fields", []):
            if f["source-id"] in id_to_name:
                src = id_to_name[f["source-id"]]
                by_source.setdefault(src, []).append(PartitionField.from_json(f, src))
                any_fields = True
        spec_fields[int(s.get("spec-id", 0))] = by_source
    if not any_fields:
        return entries  # never partitioned: nothing to prune
    if callable(flt):
        return [e for e in entries if flt(e.partition)]
    all_sources = set().union(*(set(m) for m in spec_fields.values()))
    for col in flt:
        if col not in all_sources and strict:
            raise ValueError(
                f"partition_filter column {col!r} is not a partition source; sources: {sorted(all_sources)}"
            )
    src_types = {c.name: c.spark_type.simpleString() for c in schema.columns}
    # precompute literal->partition-value per spec (transforms differ)
    targets_by_spec: dict[int, dict[str, Any]] = {}
    for sid, by_source in spec_fields.items():
        targets: dict[str, Any] = {}
        for col, lit in flt.items():
            st = src_types.get(col, "")
            for pf in by_source.get(col, []):
                if pf.transform == "identity" and st.startswith("timestamp"):
                    continue  # identity-timestamp partition values aren't canonical: skip pruning

                def _conv(x):
                    if pf.transform == "identity" and st == "date" and isinstance(x, str):
                        import datetime as _dt

                        return _dt.date.fromisoformat(x)
                    return x

                if isinstance(lit, (list, tuple, set, frozenset)):
                    # multi-value (IN-list) filter: keep files whose
                    # partition value matches ANY of the transformed values
                    targets[pf.name] = frozenset(pf.apply(_conv(x)) for x in lit)
                else:
                    targets[pf.name] = pf.apply(_conv(lit))
        targets_by_spec[sid] = targets

    # an entry written under a spec that lacks the field entirely (vs
    # a present-but-null partition value) may still match on rows, so
    # it must be kept — the Iceberg mixed-spec scan rule after
    # partition evolution. Null partition values (key present) can
    # never equal a literal and are pruned. Unknown spec-id: keep
    # (cannot prune safely).
    def _match(pv, v) -> bool:
        return pv in v if isinstance(v, frozenset) else pv == v

    def _keep(e) -> bool:
        targets = targets_by_spec.get(e.spec_id)
        if targets is None:
            return True
        return all(k not in e.partition or _match(e.partition[k], v) for k, v in targets.items())

    return [e for e in entries if _keep(e)]


import re as _re

_CLAUSE_RE = _re.compile(
    r"^\s*(\w+)\s*(>=|<=|==|=|<|>)\s*(?:(?:DATE|TIMESTAMP)\s+)?('[^']*'|[\w.\-:]+)\s*$",
    _re.IGNORECASE,
)
_BETWEEN_RE = _re.compile(
    r"(\w+)\s+BETWEEN\s+(?:(?:DATE|TIMESTAMP)\s+)?('[^']*'|[\w.\-:]+)\s+AND\s+(?:(?:DATE|TIMESTAMP)\s+)?('[^']*'|[\w.\-:]+)",
    _re.IGNORECASE,
)
# anchored so "col NOT IN (...)" cannot match (NOT breaks \w+\s+IN)
_IN_RE = _re.compile(r"^\s*(\w+)\s+IN\s*\(([^)]*)\)\s*$", _re.IGNORECASE)


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok


def _lit_compatible(lit, dt) -> bool:
    """Only trust a parsed literal for pruning when its Python type
    matches the column's domain (a bare identifier RHS — e.g.
    ``col = other_col`` — parses as a string and must not prune a
    numeric column)."""
    from pyspark.sql import types as _T

    if isinstance(dt, (_T.IntegerType, _T.LongType, _T.ShortType, _T.ByteType, _T.FloatType, _T.DoubleType, _T.DecimalType)):
        return isinstance(lit, (int, float))
    if isinstance(dt, (_T.DateType, _T.TimestampType, _T.TimestampNTZType)):
        if not isinstance(lit, str):
            return False
        import datetime as _dt

        try:
            _dt.datetime.fromisoformat(lit)
            return True
        except ValueError:
            return False
    if isinstance(dt, _T.StringType):
        return isinstance(lit, str)
    return False


def _predicate_to_pruners(
    meta: TableMetadata, where: str
) -> tuple[dict, dict, Optional[list]]:
    """Best-effort translation of a conjunctive SQL predicate into
    (stats_filter ranges, partition equality dict, implication checks).
    Clauses that don't parse contribute nothing — the row filter still
    applies them.

    The third element is a list of (col, op, literal) checks usable to
    PROVE the predicate over a file's manifest bounds (so the residual
    row filter can be dropped — see _residual_implied), or None when
    any conjunct failed to translate exactly (then the row filter is
    mandatory). Unlike the ranges dict, the checks keep </<= strictness."""
    schema = meta.schemas[meta.current_schema_id]
    known = {c.name: c.spark_type for c in schema.columns}
    ranges: dict[str, list] = {}
    part_eq: dict = {}
    checks: list = []
    complete = True

    # Conservative OR guard: a disjunction can scope any clause (e.g.
    # "x BETWEEN 1 AND 2 OR y = 3" must keep rows outside [1,2]), and
    # the clause extractors below assume pure conjunction — prune
    # nothing; the exact row filter still applies the predicate.
    if _re.search(r"\bOR\b", where, _re.IGNORECASE):
        return {}, {}, None

    def add(col: str, lo, hi, lo_strict: bool = False, hi_strict: bool = False):
        cur = ranges.setdefault(col, [None, None, False, False])
        if lo is not None:
            if cur[0] is None or lo > cur[0]:
                cur[0], cur[2] = lo, lo_strict
            elif lo == cur[0]:
                cur[2] = cur[2] or lo_strict
        if hi is not None:
            if cur[1] is None or hi < cur[1]:
                cur[1], cur[3] = hi, hi_strict
            elif hi == cur[1]:
                cur[3] = cur[3] or hi_strict

    rest = where
    for m in _BETWEEN_RE.finditer(where):
        col, lo, hi = m.group(1), _parse_literal(m.group(2)), _parse_literal(m.group(3))
        if col in known and _lit_compatible(lo, known[col]) and _lit_compatible(hi, known[col]):
            add(col, lo, hi)
            checks += [(col, ">=", lo), (col, "<=", hi)]
        else:
            complete = False
        rest = rest.replace(m.group(0), " 1=1 ")
    for clause in _re.split(r"\s+AND\s+", rest, flags=_re.IGNORECASE):
        if clause.strip() in ("1=1", ""):
            continue  # BETWEEN placeholder
        m_in = _IN_RE.match(clause)
        if m_in:
            col = m_in.group(1)
            vals = [
                _parse_literal(t.strip())
                for t in _re.findall(r"'[^']*'|[^,]+", m_in.group(2))
                if t.strip()
            ]
            if col in known and vals and all(_lit_compatible(v, known[col]) for v in vals):
                try:
                    add(col, min(vals), max(vals))
                except TypeError:
                    pass
                part_eq[col] = vals
                if len(vals) == 1:
                    checks.append((col, "=", vals[0]))
                else:
                    complete = False  # membership not provable from bounds
            else:
                complete = False
            continue
        m = _CLAUSE_RE.match(clause)
        if not m:
            complete = False
            continue
        col, op, lit = m.group(1), m.group(2), _parse_literal(m.group(3))
        if col not in known or not _lit_compatible(lit, known[col]):
            complete = False
            continue
        if op in ("=", "=="):
            add(col, lit, lit)
            part_eq[col] = lit
            checks.append((col, "=", lit))
        elif op in (">", ">="):
            add(col, lit, None, lo_strict=(op == ">"))
            checks.append((col, op, lit))
        elif op in ("<", "<="):
            add(col, None, lit, hi_strict=(op == "<"))
            checks.append((col, op, lit))
        else:
            complete = False
    return (
        {c: tuple(v) for c, v in ranges.items()},
        part_eq,
        checks if (complete and checks) else None,
    )


def _residual_implied(meta: TableMetadata, entries, checks: list) -> bool:
    """True iff the manifest bounds of EVERY surviving data file prove
    every (col, op, lit) check — then the residual row filter is a
    no-op and can be dropped (the same reason Hive partition predicates
    never become row filters). Requires a recorded zero null count for
    each checked column (bounds say nothing about nulls: a NULL row
    fails the SQL predicate but survives a bounds-only proof)."""
    from ..plans.bounds import range_implied

    schema = meta.schemas[meta.current_schema_id]
    by_name = {c.name: c for c in schema.columns}
    cols = [(by_name.get(col), op, lit) for col, op, lit in checks]
    if any(c is None for c, _, _ in cols):
        return False
    # NaN is invisible to min/max bounds but fails every SQL comparison:
    # a float/double proof could wrongly keep NaN rows. Never prove there.
    if any(isinstance(c.spark_type, (T.FloatType, T.DoubleType)) for c, _, _ in cols):
        return False
    for e in entries:
        for c, op, lit in cols:
            fid = c.field_id
            nulls = e.null_value_counts.get(fid)
            if nulls is None:
                nulls = e.null_value_counts.get(str(fid))
            if nulls != 0:
                return False
            lower = e.lower_bounds.get(fid) or e.lower_bounds.get(str(fid))
            upper = e.upper_bounds.get(fid) or e.upper_bounds.get(str(fid))
            if not range_implied(lower, upper, op, lit, c.spark_type):
                return False
    return True


def _prune_by_stats(meta: TableMetadata, entries, flt: dict):
    """Zone-map skipping: drop files whose [lower, upper] bounds cannot
    intersect the requested {col: (lo, hi)} ranges (public form) or
    {col: (lo, hi, lo_strict, hi_strict)} (internal where-derived form
    — strictness lets ``col < x`` drop a file whose lower bound == x)."""
    from ..plans.bounds import range_overlaps

    schema = meta.schemas[meta.current_schema_id]
    by_name = {c.name: c for c in schema.columns}
    checks = []
    for col, rng in flt.items():
        c = by_name.get(col)
        if c is None:
            raise ValueError(f"stats_filter column {col!r} not in schema")
        lo, hi, los, his = rng if len(rng) == 4 else (*rng, False, False)
        checks.append((c.field_id, lo, hi, c.spark_type, los, his))
    out = []
    for e in entries:
        keep = True
        for fid, lo, hi, dt, los, his in checks:
            lower = e.lower_bounds.get(fid) or e.lower_bounds.get(str(fid))
            upper = e.upper_bounds.get(fid) or e.upper_bounds.get(str(fid))
            if lower is None and upper is None:
                continue  # no stats for this column: keep
            if not range_overlaps(lower, upper, lo, hi, dt, los, his):
                keep = False
                break
        if keep:
            out.append(e)
    return out


def _avro_data_df(spark: SparkSession, schema, files: list[str], want_pos: bool) -> DataFrame:
    """Iceberg AVRO data files through the repo's pure-Python Avro
    codec (plans/avro — the same decoder the manifest layer uses),
    decoded EXECUTOR-side: one task per file via mapInPandas, so no
    file bytes pass through the driver and a many-file table scales
    like any other scan. Row positions are synthesized from record
    order (Avro container files are strictly ordered), so positional
    deletes / DVs / row_lineage compose exactly as with parquet.
    spark-avro is not assumed on the classpath. Column resolution is
    by NAME against the table schema (missing fields -> NULL); the
    rare foreign table carrying avro data files is the target —
    compaction (rewrite_data_files) converts to parquet."""
    names = [c.name for c in schema.columns]
    fields = [T.StructField(c.name, c.spark_type) for c in schema.columns]
    if want_pos:
        fields += [T.StructField("__file", T.StringType()), T.StructField("__pos", T.LongType())]
    out = T.StructType(fields)

    def _read(batches):
        import pandas as pd

        from ..plans.avro import read_avro_file

        for pdf in batches:
            for p in pdf["path"]:
                _, records = read_avro_file(p)
                d = pd.DataFrame({n: [r.get(n) for r in records] for n in names})
                if want_pos:
                    d["__file"] = p
                    d["__pos"] = range(len(records))
                yield d

    flist = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        max(1, len(files))
    )
    return flist.mapInPandas(_read, out)


def _dv_deletes_df(spark: SparkSession, entries) -> DataFrame:
    """Iceberg v3 deletion vectors -> a (file_path, pos) DataFrame.

    Decode happens EXECUTOR-side: the driver ships only one
    (puffin_path, offset, size, referenced_file) row per DV — one task
    per blob — and each task seeks+reads its blob and explodes the
    roaring bitmap to delete rows through Arrow
    (plans/roaring.decode_dv_blob). No DV bytes or positions pass
    through the driver, so a table with thousands of DVs scales like
    any other scan. Blob reads route through plans/fs.read_range —
    posix seek+read locally, ranged GETs through pyarrow's native S3
    client for object-store tables (connection snapshot captured at
    plan time, same propagation as the arrow scan path).

    The reference has no v3 support at all (its scan mishandles even
    v2 equality deletes, iceberg_scan.cpp:167-169) — this is part of
    the deliberate extension; format per the public Iceberg v3 spec
    ("Deletion Vectors") + Puffin spec.
    """
    from ..plans.fs import s3_env_conf, scheme_of

    for e in entries:
        # plan-time validation: a malformed entry fails HERE with the
        # table context, not as an opaque unpack error inside a task
        if not e.content_size:
            raise ValueError(
                "deletion vector entry for "
                f"{e.referenced_data_file!r} ({e.file_path}) has no "
                "content_size_in_bytes"
            )
    rows = [
        (
            e.file_path,
            int(e.content_offset),
            int(e.content_size),
            e.referenced_data_file or "",
        )
        for e in entries
    ]
    conf = (
        s3_env_conf()
        if any(scheme_of(p) in ("s3", "s3a") for p, *_ in rows)
        else None
    )
    src = spark.createDataFrame(rows, "puffin string, off long, size long, ref string")

    def _decode(batches):
        import pandas as pd

        from ..plans.fs import read_range
        from ..plans.roaring import decode_dv_blob

        for pdf in batches:
            for puffin, off, size, ref in pdf.itertuples(index=False):
                positions = decode_dv_blob(read_range(puffin, off, size, conf))
                yield pd.DataFrame(
                    {"file_path": ref, "pos": positions.astype("int64")}
                )

    return src.repartition(max(1, len(rows))).mapInPandas(
        _decode, "file_path string, pos long"
    )


# Per-equality_ids-group broadcast cap for delete-side tables (compressed
# on-disk bytes from the manifests). Matches the session's 32 MiB
# autoBroadcastJoinThreshold; above it the anti-join shuffles instead.
_EQ_DELETE_BROADCAST_BYTES = 32 * 1024 * 1024


def _apply_equality_deletes(
    spark: SparkSession,
    df: DataFrame,
    scan: IcebergTableScan,
    schema: IcebergSchema,
    allow_moved_paths: bool,
) -> DataFrame:
    """Equality deletes: anti-join on the delete file's equality_ids
    columns, scoped so a delete only applies to rows from data files
    with a strictly smaller sequence number.

    Deliberate improvement over the reference, which treats every
    delete file as positional (iceberg_scan.cpp:167-169) and would
    read equality-delete tables incorrectly (SURVEY.md §2A 'absent').

    Batched for scale (r8 VERDICT #2): all delete files sharing one
    ``equality_ids`` set are read in a SINGLE union scan, their
    per-file sequence numbers re-attached via ``_metadata.file_path``,
    reduced to ``max(seq)`` per key (a row dies iff ANY matching
    delete has a larger seq ⟺ the max does), and applied with ONE
    anti-join — so plan size is O(distinct equality_ids sets), not
    O(delete files), and a MoR table carrying thousands of
    equality-delete files doesn't blow up the analyzer. The broadcast
    is size-gated on the manifests' recorded file sizes; an oversized
    group falls back to a shuffled null-safe-equi anti-join."""
    id_to_name = {c.field_id: c.name for c in schema.columns}
    # data-file -> sequence number lookup (tiny; broadcast)
    seq_rows = [(e.file_path, e.sequence_number or 0) for e in scan.data_files()]
    seq_df = spark.createDataFrame(seq_rows, "___df_path string, ___data_seq long")
    key = _tail(df["__file"]) if allow_moved_paths else _norm_path(df["__file"])
    skey = _tail(seq_df["___df_path"]) if allow_moved_paths else _norm_path(seq_df["___df_path"])
    df = df.join(F.broadcast(seq_df), key == skey, "left").drop("___df_path")

    from collections import defaultdict

    groups: dict[tuple, list] = defaultdict(list)
    for e in scan.equality_delete_files():
        groups[tuple(sorted(e.equality_ids or []))].append(e)
    for eq_ids, entries in groups.items():
        cols = [id_to_name[i] for i in eq_ids if i in id_to_name]
        if not cols:
            continue
        # one union read; per-file seq rejoined on the decoded
        # _metadata URI (raw-vs-raw, same rule as the positional path)
        dseq_rows = [(e.file_path, e.sequence_number or 0) for e in entries]
        dseq_df = spark.createDataFrame(dseq_rows, "___del_path string, ___del_seq long")
        dels = spark.read.parquet(*[e.file_path for e in entries]).select(
            *cols, _decode_file_uri(F.col("_metadata.file_path")).alias("___dfile")
        )
        dels = dels.join(
            F.broadcast(dseq_df),
            _norm_path(dels["___dfile"]) == _norm_path(dseq_df["___del_path"]),
            "inner",
        ).drop("___del_path", "___dfile")
        dels = dels.groupBy(*cols).agg(F.max("___del_seq").alias("___del_seq"))
        renamed = dels.select(
            *[F.col(c).alias(f"___eq_{c}") for c in cols], "___del_seq"
        )
        total_bytes = sum(e.file_size_in_bytes or 0 for e in entries)
        if total_bytes <= _EQ_DELETE_BROADCAST_BYTES:
            renamed = F.broadcast(renamed)
        cond = None
        for c in cols:
            clause = df[c].eqNullSafe(renamed[f"___eq_{c}"])
            cond = clause if cond is None else (cond & clause)
        cond = cond & (df["___data_seq"] < renamed["___del_seq"])
        df = df.join(renamed, cond, "left_anti")
    return df.drop("___data_seq")


_SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("sequence_number", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("timestamp_ms", T.TimestampType()),
        T.StructField("manifest_list", T.StringType()),
    ]
)


def iceberg_snapshots(
    spark: SparkSession,
    path: str,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    unsafe_enable_version_guessing: bool = False,
) -> DataFrame:
    """Snapshot listing — 4-column schema of the reference
    (iceberg_snapshots.cpp:80-91)."""
    meta = _load(
        path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )
    rows = [
        (
            s.sequence_number,
            s.snapshot_id,
            datetime.datetime.fromtimestamp(s.timestamp_ms / 1000.0, tz=datetime.timezone.utc).replace(tzinfo=None),
            s.manifest_list,
        )
        for s in meta.snapshots
    ]
    return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)


_HISTORY_SCHEMA = "made_current_at timestamp, snapshot_id long, parent_id long, is_current_ancestor boolean"


def iceberg_history(
    spark: SparkSession,
    path: str,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    unsafe_enable_version_guessing: bool = False,
) -> DataFrame:
    """Table history from the metadata ``snapshot-log`` — the Spark
    ``<table>.history`` metadata-table schema (made_current_at,
    snapshot_id, parent_id, is_current_ancestor). Beyond-reference:
    the extension exposes snapshots but not the current-ancestry log.
    """
    meta = _load(
        path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )
    parents = {
        s["snapshot-id"]: s.get("parent-snapshot-id") for s in meta.raw.get("snapshots", [])
    }
    # current ancestry: walk parent links from the current snapshot
    ancestors: set[int] = set()
    cur = meta.current_snapshot_id
    if cur is None and meta.snapshots:
        cur = meta.latest_snapshot().snapshot_id
    while cur is not None:
        ancestors.add(cur)
        cur = parents.get(cur)
    rows = [
        (
            datetime.datetime.fromtimestamp(e["timestamp-ms"] / 1000.0, tz=datetime.timezone.utc).replace(
                tzinfo=None
            ),
            e["snapshot-id"],
            parents.get(e["snapshot-id"]),
            e["snapshot-id"] in ancestors,
        )
        for e in meta.raw.get("snapshot-log", [])
    ]
    return spark.createDataFrame(rows, _HISTORY_SCHEMA)


_PARTITIONS_SCHEMA = (
    "partition map<string,string>, record_count long, file_count int, total_size_bytes long"
)


def iceberg_partitions(
    spark: SparkSession,
    path: str,
    snapshot_id: Optional[int] = None,
    timestamp=None,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    allow_moved_paths: bool = False,
    unsafe_enable_version_guessing: bool = False,
) -> DataFrame:
    """Per-partition summary (Spark's ``<table>.partitions`` metadata
    table): record/file/byte counts straight from manifests — no data
    files touched, O(#files) driver work at any data scale.
    Beyond-reference: the extension drops partition values from its
    partial Avro schema (SURVEY §2A 'Partition pruning... NOT
    implemented')."""
    meta = _load(
        path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )
    snap = _select_snapshot(meta, snapshot_id, timestamp)
    scan = load_table_scan(meta, snap, _table_root(path), allow_moved_paths)
    agg: dict[tuple, list] = {}
    for e in scan.data_files():
        key = tuple(sorted((str(k), "" if v is None else str(v)) for k, v in (e.partition or {}).items()))
        slot = agg.setdefault(key, [0, 0, 0])
        slot[0] += e.record_count
        slot[1] += 1
        slot[2] += e.file_size_in_bytes
    rows = [(dict(k), rc, fc, sz) for k, (rc, fc, sz) in sorted(agg.items())]
    return spark.createDataFrame(rows, _PARTITIONS_SCHEMA)


_METADATA_SCHEMA = (
    "manifest_path string, manifest_sequence_number long, manifest_content string, "
    "status string, content string, file_path string, file_format string, record_count long"
)

_STATUS_STR = {EntryStatus.EXISTING: "EXISTING", EntryStatus.ADDED: "ADDED", EntryStatus.DELETED: "DELETED"}
_MANIFEST_CONTENT_STR = {ManifestContent.DATA: "DATA", ManifestContent.DELETE: "DELETE"}
# Reference quirk kept verbatim: entry content DATA renders as
# "EXISTING" (iceberg_types.hpp:47-56).
_ENTRY_CONTENT_STR = {
    FileContent.DATA: "EXISTING",
    FileContent.POSITION_DELETES: "POSITION_DELETES",
    FileContent.EQUALITY_DELETES: "EQUALITY_DELETES",
}


def iceberg_metadata(
    spark: SparkSession,
    path: str,
    snapshot_id: Optional[int] = None,
    timestamp=None,
    *,
    version: Optional[str] = None,
    version_name_format: str = DEFAULT_TABLE_VERSION_FORMAT,
    metadata_compression_codec: str = "none",
    allow_moved_paths: bool = False,
    unsafe_enable_version_guessing: bool = False,
) -> DataFrame:
    """Manifest + entry listing — 8-column schema of the reference
    (iceberg_types.hpp:107-117,190-198)."""
    meta = _load(
        path,
        version=version,
        version_name_format=version_name_format,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=unsafe_enable_version_guessing,
    )
    snap = _select_snapshot(meta, snapshot_id, timestamp)
    scan = load_table_scan(meta, snap, _table_root(path), allow_moved_paths)
    rows = []
    for mf, entries in scan.manifests:
        for e in entries:
            rows.append(
                (
                    mf.manifest_path,
                    mf.sequence_number,
                    _MANIFEST_CONTENT_STR[mf.content],
                    _STATUS_STR[e.status],
                    _ENTRY_CONTENT_STR[e.content],
                    e.raw_file_path or e.file_path,
                    e.file_format.upper(),
                    e.record_count,
                )
            )
    return spark.createDataFrame(rows, _METADATA_SCHEMA)


def iceberg_table_statistics(
    spark: SparkSession,
    path: str,
    *,
    metadata_compression_codec: str = "none",
    verify_payload: bool = False,
) -> DataFrame:
    """Table-statistics metadata table: one row per statistics blob —
    ``(snapshot_id, column, blob_type, ndv)`` — from metadata.json's
    ``statistics`` list (Iceberg spec "Table statistics", written by
    :meth:`IcebergTable.compute_statistics`). Pure driver-side
    metadata: the blob ``ndv`` PROPERTY carries the number (the part
    Trino/Spark planners consume); ``verify_payload=True``
    additionally cross-checks each ndv-long-v1 payload through
    plans/fs.read_range. The reference has no statistics support."""
    import struct as _struct

    from ..plans.fs import read_range

    meta = _load(
        path,
        version=None,
        version_name_format=DEFAULT_TABLE_VERSION_FORMAT,
        metadata_compression_codec=metadata_compression_codec,
        unsafe_enable_version_guessing=False,
    )
    schema = meta.schemas[meta.current_schema_id]
    id_to_name = {c.field_id: c.name for c in schema.columns}
    rows = []
    for s in meta.raw.get("statistics", []):
        for b in s.get("blob-metadata", []):
            fields = b.get("fields") or []
            col = id_to_name.get(fields[0]) if len(fields) == 1 else None
            ndv = b.get("properties", {}).get("ndv")
            ndv = int(ndv) if ndv is not None else None
            if verify_payload and b.get("type") == "ndv-long-v1":
                raw = read_range(s["statistics-path"], b["offset"], b["length"])
                (payload_ndv,) = _struct.unpack("<q", raw)
                if payload_ndv != ndv:
                    raise ValueError(
                        f"statistics blob payload/property mismatch for {col}: "
                        f"{payload_ndv} != {ndv}"
                    )
            rows.append((s.get("snapshot-id"), col, b.get("type"), ndv))
    return spark.createDataFrame(
        rows, "snapshot_id long, column string, blob_type string, ndv long"
    )


def iceberg_join(
    spark: SparkSession,
    fact: DataFrame,
    dim_path: str,
    on: str | list[str],
    *,
    how: str = "inner",
    broadcast_threshold_bytes: int = 32 * 1024 * 1024,
    **scan_opts,
) -> DataFrame:
    """Statistics-informed join of ``fact`` against an Iceberg dim
    table: the broadcast decision comes from TABLE METADATA — total
    live data-file bytes from the manifests. For semi/anti joins the
    estimate is additionally de-rated by the join key's ndv from
    Puffin statistics, because those joins only test key EXISTENCE:
    the build side is first reduced to ``select(keys).distinct()``
    (semantics-preserving for semi/anti), so the broadcast relation
    really does hold ~ndv rows. For inner/outer joins no de-rate
    applies — Spark's broadcast hash relation materializes EVERY
    build row (duplicates must all be kept to emit matches), so raw
    bytes are the honest estimate. No data is read to plan: at 100 TB
    the decision costs two KB-scale metadata reads. Falls back to a
    plain join (AQE decides) above threshold."""
    from ..plans.manifests import load_table_scan

    keys = [on] if isinstance(on, str) else list(on)
    meta = _load(
        dim_path,
        version=None,
        version_name_format=DEFAULT_TABLE_VERSION_FORMAT,
        metadata_compression_codec=scan_opts.get("metadata_compression_codec", "none"),
        unsafe_enable_version_guessing=False,
    )
    snap = meta.latest_snapshot()
    dim = iceberg_scan(spark, dim_path, **scan_opts)
    if snap is None:
        return fact.join(dim, keys, how)
    scan = load_table_scan(meta, snap, _table_root(dim_path), False)
    total_bytes = sum(e.file_size_in_bytes for e in scan.data_files())
    total_rows = sum(e.record_count for e in scan.data_files()) or 1
    # ndv of the (first) join key, when statistics were collected —
    # only usable when the build side is deduplicated by the keys
    # (semi/anti), see docstring
    schema = meta.schemas[meta.current_schema_id]
    name_to_id = {c.name: c.field_id for c in schema.columns}
    ndv = None
    for s in meta.raw.get("statistics", []):
        if s.get("snapshot-id") != snap.snapshot_id:
            continue
        for b in s.get("blob-metadata", []):
            if b.get("fields") == [name_to_id.get(keys[0])]:
                v = b.get("properties", {}).get("ndv")
                ndv = int(v) if v is not None else None
    if total_bytes <= broadcast_threshold_bytes:
        return fact.join(F.broadcast(dim), keys, how)
    semi_like = how.lower().replace("_", "") in ("semi", "leftsemi", "anti", "leftanti")
    if semi_like and ndv is not None and total_rows:
        # semi/anti only test key EXISTENCE, so the build side can be
        # reduced to its distinct keys without changing results; the
        # ndv-derated estimate is then honest — the broadcast relation
        # holds ~ndv key-only rows, not every duplicated dim row.
        derated = math.ceil(total_bytes * (ndv / total_rows))
        if derated <= broadcast_threshold_bytes:
            dim_keys = dim.select(*keys).dropDuplicates(keys)
            return fact.join(F.broadcast(dim_keys), keys, how)
    return fact.join(dim, keys, how)


def register_sql_views(spark, path: str, name: str, **opts) -> list[str]:
    """SQL-first usage parity with the reference extension: register a
    family of temp views so every query a DuckDB user writes against
    ``iceberg_scan('<path>')`` / ``iceberg_snapshots`` /
    ``iceberg_metadata`` becomes plain ``spark.sql`` against
    ``<name>`` / ``<name>_snapshots`` / ``<name>_metadata`` (plus the
    beyond-reference ``_history`` / ``_partitions`` / ``_files``
    metadata tables).

    ``opts`` are forwarded to ``iceberg_scan`` (time travel, codec,
    moved paths, ...). Returns the registered view names.

    The data view is a lazy DataFrame: registration costs one
    driver-side metadata resolution, and every SQL query against it
    re-plans from the same snapshot (stable reads; re-register to see
    new commits).
    """
    scan_opts = dict(opts)
    scan_opts.pop("mode", None)  # the family fixes each view's mode itself
    meta_opts = {
        "metadata_compression_codec": opts.get("metadata_compression_codec", "none")
    }
    # time travel applies uniformly: the metadata views resolve the
    # same snapshot the data view reads (reference usage pins all of
    # iceberg_scan/_snapshots/_metadata to one version in one script,
    # test/sql/iceberg_scan.test:17-32).
    travel = {k: opts[k] for k in ("snapshot_id", "timestamp") if k in opts}
    moved = {"allow_moved_paths": opts.get("allow_moved_paths", False)}
    views = {
        name: iceberg_scan(spark, path, **scan_opts),
        f"{name}_snapshots": iceberg_snapshots(spark, path, **meta_opts),
        f"{name}_metadata": iceberg_metadata(spark, path, **meta_opts, **travel, **moved),
        f"{name}_history": iceberg_history(spark, path, **meta_opts),
        f"{name}_partitions": iceberg_partitions(spark, path, **meta_opts, **travel, **moved),
        f"{name}_files": iceberg_scan(spark, path, mode="list_files", **scan_opts),
    }
    for vname, df in views.items():
        df.createOrReplaceTempView(vname)
    return list(views)
