"""Structured Streaming SOURCE over a native Iceberg table, via the
PySpark 4 Python Data Source API.

``spark.readStream.format("iceberg_stream").option("path", p).load()``
turns the table's commit log into a stream: offsets are positions in
the main-lineage commit log — ``{"seq": S, "idx": K}`` means "every
data file with sequence number < S, plus the first K files (path
order) of sequence S, has been emitted".  Each micro-batch reads
exactly the files in ``(start, end]`` — one ``InputPartition`` per
data file, read executor-side through pyarrow (Arrow-batched, never
on the driver).  Exactly-once follows from the offset log: a replayed
batch re-reads the same immutable files.

Only snapshots reachable from the main head (current-snapshot-id via
parent-snapshot-id links) are consumed: commits staged on a branch
with ``append(to_branch=...)`` (write-audit-publish) stay invisible
until :meth:`fast_forward` publishes them, matching the batch reader
and the writer's documented invariant.

Backpressure: ``.option("maxFilesPerTrigger", n)`` caps each
micro-batch at ``n`` data files, so one giant commit is consumed as
``ceil(files/n)`` batches instead of a single unbounded one.  One
caveat: by default the FIRST trigger of a run is uncapped — Spark
asks for the latest offset before the reader learns the query's
position (it calls ``latestOffset`` before ``initialOffset`` on a
fresh query, and never calls ``initialOffset`` on a checkpoint
restart), and capping from an unknown position could regress the
offset log and re-emit data, so without extra state the reader only
caps once ``partitions(start, end)`` has shown it where the query is.

``.option("positionFile", path)`` closes that first-trigger hole: the
reader durably records each committed end offset there (written in
``commit()``, atomically, through the same filesystem layer as the
table — local/s3/memory), and a fresh reader instance caps its very
first ``latestOffset`` from the recorded position (or from zero when
the file does not yet exist, i.e. a brand-new query).  With it, the
initial load of a 1000-file table under ``maxFilesPerTrigger=10``
starts as 100 bounded batches instead of one giant catch-up batch.
Contract: set it from the query's FIRST start, keep it paired with
the query's ``checkpointLocation`` (one file per query) — a position
file bolted onto a query that has already been running without one
could cap from zero on restart and regress the offset log.

Format-version-1 tables are rejected with an error: v1 snapshots
carry no sequence numbers, so commit-window offsets are undefined
(previously such tables streamed silently empty).

Schema evolution: each file's parquet columns are resolved by Iceberg
*field id* (``PARQUET:field_id`` metadata), not by name, so files
written before a column rename still stream correctly under the
current name; columns added after a file was written read as NULL —
the same field-id mapping the batch path gets from Spark's
``spark.sql.parquet.fieldId.read.enabled`` (reference
src/iceberg_functions/iceberg_multi_file_reader.cpp field_id ->
column mapping).

This is the inverse of ``write_stream_to_iceberg`` (the sink) and the
streaming twin of ``IcebergTable.scan_appends`` — together they chain
tables into incremental pipelines (bronze -> silver -> gold) where
each hop processes only new commits.

Append-only semantics: like Spark's own streaming sources, row-level
deletes newer than a consumed snapshot are NOT retracted (a stream
cannot un-emit); downstream jobs needing delete-awareness should use
the batch ``scan_changelog``.

Register once per session with :func:`register_iceberg_stream_source`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_ALL = float("inf")  # offsets without "idx" (pre-backpressure checkpoints)


class _FileSlice(InputPartition):
    """One data file of one micro-batch (picklable to executors).

    ``fields`` is ``[(field_id, current_name), ...]`` in output order —
    the executor resolves each to the file's own parquet column by
    field id (see module doc).
    """

    def __init__(self, path: str, fields: list, fs_conf: dict | None = None):
        self.path = path
        self.fields = fields
        # S3 connection config captured on the DRIVER at plan time and
        # pickled to executors — Python workers inherit the JVM's env,
        # which was frozen at session start (plans/fs.py:s3_env_conf)
        self.fs_conf = fs_conf


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options: dict):
        self.table_path = options["path"]
        self.codec = options.get("metadata_compression_codec", "none")
        self._schema = schema
        # Spark normalizes data source option keys to lowercase
        lower = {k.lower(): v for k, v in options.items()}
        # version guessing: pyiceberg/Java filesystem tables have no
        # version-hint.text, so a stream over one needs the same gated
        # opt-in the batch scan takes (string option — data source
        # options arrive stringly-typed)
        self.version_guessing = str(
            lower.get("unsafe_enable_version_guessing", "false")
        ).lower() in ("true", "1")
        mft = lower.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        if self.max_files is not None and self.max_files <= 0:
            raise ValueError(f"maxFilesPerTrigger must be positive, got {self.max_files}")
        self.pos_file = lower.get("positionfile")
        # last end-offset this reader produced/served (driver-side state,
        # used only to cap the NEXT batch; correctness never depends on it)
        self._last: dict | None = None
        # _floor: a position everything at-or-below which is KNOWN to
        # have been emitted to this query already (from the position
        # file, then ratcheted up by every partitions() start). File
        # selection never goes below it, so even an offset-log window
        # that regresses (stale position file after a crash between
        # Spark's commit and ours) can never re-emit rows — the log
        # self-heals forward within one empty batch.
        self._floor: dict | None = None
        if self.pos_file and self.max_files is not None:
            # durable position: lets the FIRST latestOffset of this
            # reader instance cap from the query's recorded position
            # (file absent <=> brand-new query <=> position zero)
            import json as _json

            from ..plans.fs import get_fs

            try:
                self._floor = _json.loads(get_fs(self.pos_file).read_bytes(self.pos_file))
            except FileNotFoundError:
                self._floor = {"seq": 0, "idx": 0}

    # -- metadata ---------------------------------------------------------
    def _meta(self):
        from ..plans.table_metadata import load_table_metadata

        meta = load_table_metadata(
            self.table_path,
            metadata_compression_codec=self.codec,
            unsafe_enable_version_guessing=self.version_guessing,
        )
        if meta.format_version == 1:
            raise ValueError(
                "Cannot stream from a format-version-1 Iceberg table: v1 "
                "snapshots carry no sequence numbers, so commit-window "
                "offsets are undefined (the stream would stay silently "
                "empty). Rewrite the table as format-version 2."
            )
        return meta

    def _indexed_files(self, meta):
        """Main-head data files as ``[(seq, idx_within_seq, path)]``,
        ordered by (sequence number, path) — the stream's total order."""
        from ..plans.manifests import load_table_scan

        lineage = meta.main_lineage()
        if not lineage:
            return []
        scan = load_table_scan(meta, lineage[-1], self.table_path, False)
        files = sorted((e.sequence_number or 0, e.file_path) for e in scan.data_files())
        out, prev, i = [], None, 0
        for seq, path in files:
            i = i + 1 if seq == prev else 0
            prev = seq
            out.append((seq, i, path))
        return out

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        self._last = {"seq": 0, "idx": 0}
        return {"seq": 0, "idx": 0}

    @staticmethod
    def _key(off: dict | None):
        return (-1, -1) if off is None else (int(off["seq"]), off.get("idx", _ALL))

    def latestOffset(self) -> dict:
        files = self._indexed_files(self._meta())
        base = max((self._last, self._floor), key=self._key)
        if not files:
            return base or {"seq": 0, "idx": 0}
        end_seq, end_i, _ = files[-1]
        full = {"seq": end_seq, "idx": end_i + 1}
        if self.max_files is None or base is None:
            self._last = full
            return full
        s0, k0 = base["seq"], base.get("idx", _ALL)
        pending = [f for f in files if f[0] > s0 or (f[0] == s0 and f[1] >= k0)]
        if not pending:
            return base
        take = pending[: self.max_files]
        off = {"seq": take[-1][0], "idx": take[-1][1] + 1}
        self._last = off
        return off

    # -- planning (driver): files in the (start, end] window --------------
    def partitions(self, start: dict, end: dict):
        # learn the true position (Spark calls latestOffset before
        # initialOffset on a fresh query, and never calls initialOffset
        # on a restart — partitions() is where the reader reliably sees
        # where the query actually is); both trackers only RATCHET UP
        self._last = max((self._last, end), key=self._key)
        if self._floor is not None:
            self._floor = max((self._floor, start), key=self._key)
            # never emit at-or-below the floor, even if the offset-log
            # window regressed (see _floor comment in __init__)
            start = max((start, self._floor), key=self._key)
        s0, k0 = int(start["seq"]), start.get("idx", _ALL)
        s1, k1 = int(end["seq"]), end.get("idx", _ALL)
        if (s1, k1) <= (s0, k0):
            return []
        import json as _json

        files = self._indexed_files(self._meta())
        fields = []
        for f in self._schema.fields:
            md = f.metadata or {}
            fields.append((md.get("parquet.field.id"), f.name, _json.loads(f.dataType.json())))
        sel = [
            p
            for (seq, i, p) in files
            if (seq > s0 or (seq == s0 and i >= k0)) and (seq < s1 or (seq == s1 and i < k1))
        ]
        from ..plans.fs import s3_env_conf, scheme_of

        conf = s3_env_conf() if any(scheme_of(p) in ("s3", "s3a") for p in sel) else None
        return [_FileSlice(p, fields, conf) for p in sel]

    # -- execution (executors): Arrow-read one file -----------------------
    def read(self, partition: _FileSlice):
        # shared with the batch arrow reader: field-id resolution,
        # per-file cast to the current schema's arrow types (INT ->
        # BIGINT widening), NULL columns for later-added fields;
        # yielding RecordBatches keeps the Arrow path end-to-end
        # (no per-row Python tuples)
        from ..sources.arrow_scan import _read_aligned

        yield from _read_aligned(partition).to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in the query's checkpoint; positionFile (when
        # set) additionally records them durably so the next reader
        # instance can cap its first batch (see module doc)
        if self.pos_file:
            import json as _json

            from ..plans.fs import get_fs

            self._floor = max((self._floor, end), key=self._key)
            get_fs(self.pos_file).write_atomic(
                self.pos_file, _json.dumps(self._floor).encode("utf-8")
            )


_S3_OPT_TO_ENV = {
    "s3.endpoint": "AWS_ENDPOINT_URL",
    "s3.region": "AWS_DEFAULT_REGION",
    "s3.access_key": "AWS_ACCESS_KEY_ID",
    "s3.secret_key": "AWS_SECRET_ACCESS_KEY",
    "s3.session_token": "AWS_SESSION_TOKEN",
}


def _apply_s3_options(options: dict) -> None:
    """Python Data Sources run their driver-side logic (schema(),
    offsets, planning) in a SEPARATE JVM-spawned Python runner whose
    env was frozen at session start — so the S3 connection config
    rides in on the data source options (set by read_table_stream)
    and is applied to this runner's own environment here."""
    import os

    applied = False
    for opt, env in _S3_OPT_TO_ENV.items():
        v = options.get(opt)
        if v:
            os.environ[env] = v
            applied = True
    if applied:
        from ..plans.fs import reset_s3

        reset_s3()


class IcebergStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def schema(self):
        from ..plans.table_metadata import load_table_metadata

        _apply_s3_options(dict(self.options))
        lower = {k.lower(): v for k, v in self.options.items()}
        meta = load_table_metadata(
            self.options["path"],
            metadata_compression_codec=self.options.get("metadata_compression_codec", "none"),
            unsafe_enable_version_guessing=str(
                lower.get("unsafe_enable_version_guessing", "false")
            ).lower()
            in ("true", "1"),
        )
        return meta.schemas[meta.current_schema_id].to_struct_type()

    def streamReader(self, schema):
        opts = dict(self.options)
        _apply_s3_options(opts)
        return _IcebergStreamReader(schema, opts)


def register_iceberg_stream_source(spark: SparkSession) -> None:
    """Register the ``iceberg_stream`` format on this session."""
    spark.dataSource.register(IcebergStreamDataSource)


def read_table_stream(spark: SparkSession, table_path: str, **options):
    """`readStream` over a native Iceberg table (see module doc).

    For an ``s3://`` table, the driver's S3 connection env (endpoint,
    region, credentials) is captured HERE and forwarded as data source
    options — the source's planning and reading both happen in other
    processes (see :func:`_apply_s3_options`)."""
    register_iceberg_stream_source(spark)
    reader = spark.readStream.format("iceberg_stream").option("path", table_path)
    from ..plans.fs import s3_env_conf, scheme_of

    if scheme_of(table_path) in ("s3", "s3a"):
        conf = s3_env_conf()
        for opt, key in (
            ("s3.endpoint", "endpoint"),
            ("s3.region", "region"),
            ("s3.access_key", "access_key"),
            ("s3.secret_key", "secret_key"),
            ("s3.session_token", "session_token"),
        ):
            if conf.get(key):
                reader = reader.option(opt, conf[key])
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
