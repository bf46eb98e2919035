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
            # exact-cents twin of the stateful operator's accumulator
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
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


def test_parquet_drain_matches_memory_drain(spark):
    """run_stream_to_parquet (the executor-parallel drain the dedup and
    stateful entries use since r12) returns exactly the rows the memory
    sink collected — append mode across two micro-batches (stateful
    dedup) and update mode (applyInPandasWithState deltas)."""
    from duckdb_iceberg_spark.streaming.events import (
        dedup_stream,
        read_events_files,
        read_events_stream,
        run_stream_to_memory,
        run_stream_to_parquet,
        stateful_user_stats,
    )

    def dedup_out():
        src = read_events_files(spark, SF, names=("a.parquet", "b.parquet")).select(
            "event_id", "ts", "user_id", "event_type"
        )
        return dedup_stream(src).select("event_id", "user_id", "event_type")

    mem = run_stream_to_memory(dedup_out(), "pq_drain_mem", output_mode="append")
    pq = run_stream_to_parquet(dedup_out(), "pq_drain_pq", output_mode="append")
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, pq.collect()))

    mem2 = run_stream_to_memory(
        stateful_user_stats(read_events_stream(spark, SF)), "pq_drain_mem2", output_mode="update"
    )
    pq2 = run_stream_to_parquet(
        stateful_user_stats(read_events_stream(spark, SF)), "pq_drain_pq2", output_mode="update"
    )
    assert sorted(map(tuple, mem2.collect())) == sorted(map(tuple, pq2.collect()))


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


def test_stream_ignores_unpublished_branch_commits(spark, tmp_path):
    """WAP invariant for the SOURCE: snapshots staged with
    append(to_branch=) are NOT emitted downstream until fast_forward
    publishes them — the stream follows the main lineage only (the
    branch commit bumps last-sequence-number, which must not leak)."""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    nation = spark.read.parquet(f"{SF}/nation.parquet")
    path = str(tmp_path / "t")
    t = IcebergTable.create(spark, path, nation.filter("n_nationkey < 10"))
    q = (
        read_table_stream(spark, path)
        .writeStream.format("memory")
        .queryName("ice_src_wap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("ice_src_wap").count() == 10
        # staged on a branch: invisible to the stream...
        t.append(nation.filter("n_nationkey >= 10"), to_branch="audit")
        q.processAllAvailable()
        assert spark.table("ice_src_wap").count() == 10
        # ...until published
        t.fast_forward("audit")
        q.processAllAvailable()
        got = {r.n_nationkey for r in spark.table("ice_src_wap").collect()}
        assert got == {r.n_nationkey for r in nation.collect()}
        assert spark.table("ice_src_wap").count() == nation.count()
    finally:
        q.stop()


def test_stream_max_files_per_trigger(spark, tmp_path):
    """Backpressure: a 10-file commit with maxFilesPerTrigger=3 is
    consumed as >= ceil(10/3) micro-batches with exactly-once row
    totals. (The commit arrives mid-stream: the first trigger of a run
    is uncapped by design — see the source module doc.)"""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.plans.manifests import load_table_scan
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    path = str(tmp_path / "t")
    t = IcebergTable.create(spark, path, cust.filter("c_custkey <= 10").coalesce(1))
    q = (
        read_table_stream(spark, path, maxFilesPerTrigger=3)
        .writeStream.format("memory")
        .queryName("ice_src_mft")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n0 = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        # one 10-file commit lands mid-stream
        t.append(cust.filter("c_custkey > 10").repartition(10))
        scan = load_table_scan(t.meta, t.meta.latest_snapshot(), path, False)
        nfiles = len(scan.data_files())
        assert nfiles >= 11  # initial file + 10 new ones
        q.processAllAvailable()
        assert spark.table("ice_src_mft").count() == cust.count()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) - n0 >= 4  # 10 files / 3 per trigger -> >= 4 batches
    finally:
        q.stop()


def test_stream_initial_load_bounded_with_position_file(spark, tmp_path):
    """First load of a PRE-POPULATED table must start as bounded
    batches, not one giant catch-up batch: positionFile lets the very
    first latestOffset cap from position zero (without it the first
    trigger is uncapped by design — Spark fixes the first batch's end
    before the reader learns the query's position). Second leg: a
    checkpoint restart caps from the recorded position with no
    re-emission (file sink supports recovery; memory sink does not)."""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    path = str(tmp_path / "t")
    out = str(tmp_path / "out")
    first = cust.filter("c_custkey <= 30")
    n_first = first.count()
    # pre-populate: 12 data files BEFORE the stream ever starts
    t = IcebergTable.create(spark, path, first.repartition(12))

    def _run():
        return (
            read_table_stream(
                spark,
                path,
                maxFilesPerTrigger=3,
                positionFile=str(tmp_path / "pos.json"),
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = _run()
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == n_first
    assert len(batches) >= 4  # 12 files / 3 per trigger
    # bounded: no batch may exceed maxFilesPerTrigger files' worth
    # (repartition spreads rows near-evenly; +2 slack for remainder)
    assert max(p["numInputRows"] for p in batches) <= 3 * (n_first / 12) + 2

    # restart with the same checkpoint + positionFile: new commits are
    # consumed capped from the recorded position, with no re-emission
    second = cust.filter("c_custkey > 30 and c_custkey <= 45")
    n_second = second.count()
    t.append(second.repartition(6))
    q2 = _run()
    try:
        q2.processAllAvailable()
        batches2 = [p for p in q2.recentProgress if p["numInputRows"] > 0]
    finally:
        q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == n_first + n_second  # exactly once, no re-emission
    assert got.select("c_custkey").distinct().count() == n_first + n_second
    assert len(batches2) >= 2  # 6 files / 3 per trigger


def test_stream_v1_table_raises(spark, tmp_path):
    """A format-version-1 table must error loudly instead of streaming
    silently empty (v1 has no sequence numbers to use as offsets)."""
    import json

    import pytest

    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    nation = spark.read.parquet(f"{SF}/nation.parquet")
    path = str(tmp_path / "t")
    IcebergTable.create(spark, path, nation)
    # rewrite the metadata as format-version 1
    meta_dir = os.path.join(path, "metadata")
    with open(os.path.join(meta_dir, "v1.metadata.json")) as f:
        doc = json.load(f)
    doc["format-version"] = 1
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(doc, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")
    q = (
        read_table_stream(spark, path)
        .writeStream.format("memory")
        .queryName("ice_src_v1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        with pytest.raises(Exception, match="format-version-1"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_stream_resolves_columns_by_field_id_after_rename(spark, tmp_path):
    """Schema evolution: files written BEFORE a column rename stream
    correctly under the new name (field-id resolution, like the batch
    path), and files written after the rename mix in seamlessly."""
    from duckdb_iceberg_spark import IcebergTable
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    nation = spark.read.parquet(f"{SF}/nation.parquet").select("n_nationkey", "n_name")
    path = str(tmp_path / "t")
    t = IcebergTable.create(spark, path, nation.filter("n_nationkey < 10"))
    t.rename_column("n_name", "nation_name")
    t.append(
        nation.filter("n_nationkey >= 10").withColumnRenamed("n_name", "nation_name")
    )
    q = (
        read_table_stream(spark, path)
        .writeStream.format("memory")
        .queryName("ice_src_fid")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.n_nationkey, r.nation_name) for r in spark.table("ice_src_fid").collect()}
        want = {(r.n_nationkey, r.n_name) for r in nation.collect()}
        assert got == want
    finally:
        q.stop()


def test_stream_foreign_table_with_version_guessing(spark, tmp_path):
    """The streaming source over a FOREIGN-written table: pyiceberg
    metadata naming (no version-hint -> needs the gated
    unsafe_enable_version_guessing option, now forwarded), zstandard
    manifests, mixed partition specs, inherited sequence numbers. An
    append stream emits every appended row exactly once across the
    four foreign commits (equality deletes are not retractions in an
    append-only stream, per the source's contract)."""
    import duckdb

    from duckdb_iceberg_spark.plans.foreign_fixture import write_foreign_table
    from duckdb_iceberg_spark.streaming.iceberg_source import read_table_stream

    src = "/root/testdata/sf0.001/part.parquet"
    path = str(tmp_path / "foreign")
    write_foreign_table(src, path)
    stream = read_table_stream(spark, path, unsafe_enable_version_guessing="true")
    q = (
        stream.writeStream.format("memory")
        .queryName("foreign_stream_vg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    total = duckdb.sql(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    assert spark.table("foreign_stream_vg").count() == total
