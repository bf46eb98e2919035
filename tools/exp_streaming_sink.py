#!/usr/bin/env python
"""Decompose the streaming_dedup / streaming_stateful cost (r12
follow-up to the verdict's item 4): is the wall the state-store
machinery (the r12 report's hypothesis) or the MEMORY SINK collecting
every output row to the driver (guide §5: the driver should do no data
work)?

Arms, each a full availableNow drain of the same stream:
  dedup_memory    — current entry shape (memory sink, append mode)
  dedup_noop      — foreachBatch { count() } : state machinery + scan,
                    zero sink cost (lower bound for any sink)
  dedup_parquet   — foreachBatch { executor-parallel parquet append }
                    then a batch read-back count (the candidate shape)
  dedup_proj_*    — same, with the stream projected to the columns the
                    entry actually returns (+ts for the watermark)
                    BEFORE dropDuplicatesWithinWatermark (§2.3 —
                    smaller shuffle rows and state payload)
  stateful_memory / stateful_parquet — same question for the
                    applyInPandasWithState entry (update mode).

Usage: python tools/exp_streaming_sink.py <sf_dir> [rounds]
Emits one JSON line per arm.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from pyspark.sql import functions as F  # noqa: E402


def drain_foreach(stream_df, mode, batch_fn):
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.foreachBatch(batch_fn)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_arm(name, fn, rounds=ROUNDS):
    # one warmup + min-of-N, matching bench_streaming.py
    fn()
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"arm": name, "sf_dir": SF_DIR, "sec": round(best, 3), "rows": n}))
    sys.stdout.flush()
    return best


def main():
    from duckdb_iceberg_spark import get_spark
    from duckdb_iceberg_spark.streaming.events import (
        dedup_stream,
        read_events_files,
        read_events_stream,
        run_stream_to_memory,
        stateful_user_stats,
    )

    spark = get_spark("exp_streaming_sink")
    spark.sparkContext.setLogLevel("ERROR")

    def dedup_src():
        return read_events_files(spark, SF_DIR, names=("a.parquet", "b.parquet"))

    def dedup_memory():
        out = run_stream_to_memory(
            dedup_stream(dedup_src()), "exp_dedup_mem", output_mode="append"
        ).select("event_id", "user_id", "event_type")
        return out.count()

    def dedup_noop():
        acc = []
        drain_foreach(
            dedup_stream(dedup_src()),
            "append",
            lambda bdf, bid: acc.append(bdf.count()),
        )
        return sum(acc)

    def _parquet_drain(stream_out, mode):
        out_dir = tempfile.mkdtemp(prefix="exp_sink_pq_")
        try:
            drain_foreach(
                stream_out,
                mode,
                lambda bdf, bid: bdf.write.mode("append").parquet(out_dir),
            )
            return spark.read.parquet(out_dir).count()
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def dedup_parquet():
        return _parquet_drain(dedup_stream(dedup_src()), "append")

    def dedup_proj_parquet():
        src = dedup_src().select("event_id", "ts", "user_id", "event_type")
        return _parquet_drain(dedup_stream(src), "append")

    def dedup_proj_memory():
        src = dedup_src().select("event_id", "ts", "user_id", "event_type")
        out = run_stream_to_memory(
            dedup_stream(src), "exp_dedup_proj_mem", output_mode="append"
        ).select("event_id", "user_id", "event_type")
        return out.count()

    def stateful_memory():
        out = run_stream_to_memory(
            stateful_user_stats(read_events_stream(spark, SF_DIR)),
            "exp_stateful_mem",
            output_mode="update",
        )
        return out.count()

    def stateful_parquet():
        return _parquet_drain(
            stateful_user_stats(read_events_stream(spark, SF_DIR)), "update"
        )

    run_arm("dedup_memory", dedup_memory)
    run_arm("dedup_noop", dedup_noop)
    run_arm("dedup_parquet", dedup_parquet)
    run_arm("dedup_proj_parquet", dedup_proj_parquet)
    run_arm("dedup_proj_memory", dedup_proj_memory)
    run_arm("stateful_memory", stateful_memory)
    run_arm("stateful_parquet", stateful_parquet)


if __name__ == "__main__":
    main()
