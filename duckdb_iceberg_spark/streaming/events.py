"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2B: "none in
reference") — this is the north-star extension. Batch twins of each
aggregation live in __spark_entry__ with DuckDB oracles; here the
same logic runs as a real stream (file source + watermark + windowed
state), verified in tests via trigger(availableNow=True) equivalence
with the batch result.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ts is stored TIMESTAMP(NANOS) -> read as long (nanosAsLong) and
# converted to a micros timestamp below.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch with availableNow; on a real pipeline this is a Kafka
    source with identical downstream code). The file source needs a
    directory, so the single parquet file is symlinked into a temp dir.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(src_dir, "events.parquet"))
    raw = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type: count + sum(value).

    With a watermark, state for closed windows is dropped — bounded
    memory on an unbounded stream.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based), count + duration."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain a stream with availableNow into an in-memory sink and
    return the materialized result (test/verification harness)."""
    spark = stream_df.sparkSession
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
