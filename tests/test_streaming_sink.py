"""Streaming: custom stateful operator + Iceberg streaming sink."""

import os
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent))

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _events(spark):
    from duckdb_iceberg_spark.session import normalize_event_ts

    return normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))


def test_stateful_user_stats_matches_batch(spark):
    from duckdb_iceberg_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        stateful_user_stats,
    )

    stream = read_events_stream(spark, SF)
    got = run_stream_to_memory(stateful_user_stats(stream), "stateful_stats_test", output_mode="update")
    batch = (
        _events(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("ts").alias("last_seen"),
        )
    )
    # single availableNow batch -> final state per user must equal batch agg
    a = {(r.user_id, r.n_events, r.sum_value, r.last_seen) for r in got.collect()}
    b = {(r.user_id, r.n_events, r.sum_value, r.last_seen) for r in batch.collect()}
    assert a == b


def test_write_stream_to_iceberg(spark, tmp_path):
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.events import read_events_stream, write_stream_to_iceberg

    path = str(tmp_path / "stream_table")
    stream = read_events_stream(spark, SF)
    q = write_stream_to_iceberg(stream, path, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    t = IcebergTable(spark, path)
    src = _events(spark)
    assert t.scan().count() == src.count()
    # each micro-batch committed one append snapshot (>=1), time travel works
    assert len(t.meta.snapshots) >= 1
    first = t.meta.snapshots[0]
    assert t.scan(snapshot_id=first.snapshot_id).count() > 0


def test_dedup_stream_across_batches(spark, tmp_path):
    """The same file delivered twice (two micro-batches) must come out
    once: dedup state survives across batches."""
    from duckdb_iceberg_spark.streaming.events import (
        dedup_stream,
        read_events_files,
        run_stream_to_memory,
    )

    stream = read_events_files(spark, SF, names=("a.parquet", "b.parquet"))
    got = run_stream_to_memory(dedup_stream(stream), "dedup_stream_test", output_mode="append")
    n_distinct = _events(spark).select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_stream_join_matches_batch(spark):
    from duckdb_iceberg_spark.streaming.events import (
        click_purchase_join,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, SF)
    got = run_stream_to_memory(
        click_purchase_join(stream), "ss_join_test", output_mode="append"
    )
    batch = click_purchase_join(_events(spark))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(a) > 0 and a == b


def test_watermark_drops_late_events(spark, tmp_path):
    """Watermark contract, empirically pinned: an event whose window
    closed BEFORE the previous batch's watermark is dropped (counted
    in numRowsDroppedByWatermark) and its window never emits; on-time
    windows finalize exactly once without the late row. Files are
    forced into separate micro-batches (maxFilesPerTrigger=1, mtime
    order) so the watermark is active when the late row arrives.
    Note Spark's guarantee is one-directional: data later than the
    lag MAY be kept for one extra batch — the late row here arrives
    two batches after the watermark passed its window, where the drop
    is guaranteed."""
    import json as _json
    import os as _os
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    files = [
        ("a.json", [{"ts": f"2024-01-01 10:{10 + i:02d}:00", "v": 1} for i in range(3)]),
        ("b.json", [{"ts": "2024-01-01 13:00:00", "v": 1}]),  # wm -> 12:00
        ("c.json", [{"ts": "2024-01-01 00:30:00", "v": 1},  # hours late: dropped
                    {"ts": "2024-01-01 14:00:00", "v": 1}]),
    ]
    for i, (name, rows) in enumerate(files):
        p = src_dir / name
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        _os.utime(p, (1_000_000_000 + i * 100,) * 2)

    schema = T.StructType([T.StructField("ts", T.TimestampType()), T.StructField("v", T.IntegerType())])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src_dir))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("late_drop_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
            for p in q.recentProgress
        )
    got = {r["w"]["start"].strftime("%H:%M"): r["n"] for r in spark.table("late_drop_test").collect()}
    assert got == {"10:00": 3}  # on-time window finalized once, late row absent
    assert dropped == 1  # the late row was dropped by the watermark


def test_iceberg_table_as_streaming_source(spark, tmp_path):
    """readStream over a native Iceberg table (Python Data Source):
    each commit becomes a micro-batch scoped by sequence-number
    offsets; counts and rows are exactly-once across appends."""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    n = _events(spark).limit(0)  # touch fixture loader for parity
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    path = str(tmp_path / "src_table")
    t = IcebergTable.create(spark, path, nation.filter("n_nationkey < 10"))
    stream = read_table_stream(spark, path)
    q = (
        stream.writeStream.format("memory")
        .queryName("ice_src_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("ice_src_test").count() == 10
        t.append(nation.filter("n_nationkey >= 10"))
        q.processAllAvailable()
        got = {r.n_nationkey for r in spark.table("ice_src_test").collect()}
        want = {r.n_nationkey for r in nation.collect()}
        assert got == want
        # exactly-once: no duplicates across the two micro-batches
        assert spark.table("ice_src_test").count() == nation.count()
    finally:
        q.stop()


def test_medallion_chain_iceberg_to_iceberg(spark, tmp_path):
    """Bronze -> silver: stream FROM one native Iceberg table,
    transform, stream INTO another (source + sink composed). New
    bronze commits propagate incrementally to silver."""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.events import write_stream_to_iceberg
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    bt = IcebergTable.create(spark, bronze, cust.filter("c_custkey % 2 = 0"))
    stream = read_table_stream(spark, bronze).filter(F.col("c_acctbal") > 0)
    q = write_stream_to_iceberg(stream, silver, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    st = IcebergTable(spark, silver)
    want1 = cust.filter("c_custkey % 2 = 0 AND c_acctbal > 0").count()
    assert st.scan().count() == want1
    # a new bronze commit flows through on the next drain
    bt.append(cust.filter("c_custkey % 2 = 1"))
    q2 = write_stream_to_iceberg(
        read_table_stream(spark, bronze).filter(F.col("c_acctbal") > 0),
        silver,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    st = IcebergTable(spark, silver)
    assert st.scan().count() == cust.filter("c_acctbal > 0").count()


def test_iceberg_source_append_only_semantics(spark, tmp_path):
    """Documented contract: the streaming source emits appends only —
    a row-level delete in the upstream table is NOT retracted from the
    stream (a stream cannot un-emit), and data files added by later
    commits still flow."""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    nation = spark.read.parquet(f"{SF}/nation.parquet")
    path = str(tmp_path / "t")
    t = IcebergTable.create(spark, path, nation)
    q = (
        read_table_stream(spark, path)
        .writeStream.format("memory")
        .queryName("ice_src_ao")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("ice_src_ao").count() == nation.count()
        t.delete_where("n_nationkey < 5")  # MoR: adds a delete file, no data files
        t.append(nation.limit(2))
        q.processAllAvailable()
        # deletes not retracted; the 2 appended rows arrived
        assert spark.table("ice_src_ao").count() == nation.count() + 2
        # while the TABLE itself reflects the delete
        assert t.scan().count() == nation.count() - 5 + 2
    finally:
        q.stop()
