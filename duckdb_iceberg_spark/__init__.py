"""duckdb_iceberg_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the duckdb/duckdb_iceberg
reference extension, plus large-scale pipeline operators.

Public API (SURVEY.md §7.1):

    from duckdb_iceberg_spark import iceberg_scan, iceberg_snapshots, iceberg_metadata
    df = iceberg_scan(spark, "/path/to/table", snapshot_id=..., allow_moved_paths=True)
"""

from .session import get_spark
from .sources.iceberg import (
    iceberg_history,
    iceberg_join,
    iceberg_metadata,
    iceberg_partitions,
    iceberg_scan,
    iceberg_snapshots,
    iceberg_table_statistics,
    register_sql_views,
)
from .sources.rest_catalog import RestCatalog
from .writer import IcebergTable

__all__ = [
    "get_spark",
    "iceberg_scan",
    "iceberg_snapshots",
    "iceberg_metadata",
    "iceberg_history",
    "iceberg_partitions",
    "iceberg_table_statistics",
    "iceberg_join",
    "register_sql_views",
    "IcebergTable",
    "RestCatalog",
]
__version__ = "0.1.0"
