"""Structured Streaming SOURCE over a native Iceberg table, via the
PySpark 4 Python Data Source API.

``spark.readStream.format("iceberg_stream").option("path", p).load()``
turns the table's commit log into a stream: offsets are the table's
Iceberg *sequence numbers*, each micro-batch reads exactly the data
files whose sequence number lands in ``(start, end]`` — one
``InputPartition`` per data file, read executor-side through pyarrow
(Arrow-batched, never on the driver). Exactly-once follows from the
offset log: a replayed batch re-reads the same immutable files.

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


class _FileSlice(InputPartition):
    """One data file of one micro-batch (picklable to executors)."""

    def __init__(self, path: str, columns: list):
        self.path = path
        self.columns = columns


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options: dict):
        self.table_path = options["path"]
        self.codec = options.get("metadata_compression_codec", "none")
        self._schema = schema

    # -- offsets: the table's last-sequence-number -----------------------
    def _meta(self):
        from ..plans.table_metadata import load_table_metadata

        return load_table_metadata(self.table_path, metadata_compression_codec=self.codec)

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        return {"seq": int(self._meta().raw.get("last-sequence-number", 0))}

    # -- planning (driver): files in the (start, end] commit window ------
    def partitions(self, start: dict, end: dict):
        from ..plans.manifests import load_table_scan

        lo, hi = int(start["seq"]), int(end["seq"])
        if hi <= lo:
            return []
        meta = self._meta()
        eligible = [s for s in meta.snapshots if (s.sequence_number or 0) <= hi]
        if not eligible:
            return []
        snap = max(eligible, key=lambda s: (s.sequence_number or 0, s.timestamp_ms))
        scan = load_table_scan(meta, snap, self.table_path, False)
        cols = [f.name for f in self._schema.fields]
        return [
            _FileSlice(e.file_path, cols)
            for e in scan.data_files()
            if lo < (e.sequence_number or 0) <= hi
        ]

    # -- execution (executors): Arrow-read one file ----------------------
    def read(self, partition: _FileSlice):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=partition.columns)
        for batch in table.to_batches():
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query's checkpoint


class IcebergStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def schema(self):
        from ..plans.table_metadata import load_table_metadata

        meta = load_table_metadata(
            self.options["path"],
            metadata_compression_codec=self.options.get("metadata_compression_codec", "none"),
        )
        return meta.schemas[meta.current_schema_id].to_struct_type()

    def streamReader(self, schema):
        return _IcebergStreamReader(schema, dict(self.options))


def register_iceberg_stream_source(spark: SparkSession) -> None:
    """Register the ``iceberg_stream`` format on this session."""
    spark.dataSource.register(IcebergStreamDataSource)


def read_table_stream(spark: SparkSession, table_path: str, **options):
    """`readStream` over a native Iceberg table (see module doc)."""
    register_iceberg_stream_source(spark)
    reader = spark.readStream.format("iceberg_stream").option("path", table_path)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
