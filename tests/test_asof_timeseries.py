"""as-of join vs DuckDB's native ASOF JOIN; EWMA vs pandas reference."""

import os
import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent))
from oracle_harness import canon_rows

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _events(spark):
    from duckdb_iceberg_spark.session import normalize_event_ts

    return normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))


def test_asof_join_matches_duckdb_native(spark):
    ev = _events(spark)
    left = ev.filter("event_type = 'view'").select("user_id", "ts", "event_id")
    right = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    from duckdb_iceberg_spark.operators.asof import asof_join

    got = asof_join(left, right, key="user_id", ts="ts").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"),
        "event_id",
        F.round("purchase_value_r", 2).alias("pv"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("t_r"),
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    orows = con.execute(
        """
        WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
             r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        SELECT l.user_id, strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS t, l.event_id,
               ROUND(r.value, 2) AS pv, strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS t_r
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).fetchall()
    ocols = ["user_id", "t", "event_id", "pv", "t_r"]
    srows = [tuple(r) for r in got.collect()]
    assert len(srows) == len(orows)
    assert canon_rows(got.columns, srows) == canon_rows(ocols, orows)


def test_asof_join_forward_and_unmatched(spark):
    from duckdb_iceberg_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, t long, tag string"
    )
    right = spark.createDataFrame([(1, 12, 100.0), (1, 18, 200.0)], "k long, t long, v double")
    back = {(r.tag, r.v_r) for r in asof_join(left, right, key="k", ts="t").collect()}
    assert back == {("a", None), ("b", 200.0), ("c", None)}
    fwd = {(r.tag, r.v_r) for r in asof_join(left, right, key="k", ts="t", direction="forward").collect()}
    assert fwd == {("a", 100.0), ("b", None), ("c", None)}


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from duckdb_iceberg_spark.operators.timeseries import ewma

    ev = _events(spark).filter("user_id < 50")
    got = ewma(ev, key="user_id", ts="ts", value="value", alpha=0.3)
    gpdf = got.toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    ref = ev.select("user_id", "ts", F.col("value").cast("double")).toPandas()
    outs = []
    for uid, grp in ref.groupby("user_id"):
        grp = grp.sort_values("ts").reset_index(drop=True)
        grp["ewma"] = grp["value"].ewm(alpha=0.3, adjust=False).mean()
        outs.append(grp)
    want = pd.concat(outs).sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert len(gpdf) == len(want)
    assert (gpdf["ewma"].round(6) == want["ewma"].round(6)).all()


def test_range_join_matches_duckdb_inequality(spark):
    """Bucketized range join == DuckDB's native inequality join."""
    from duckdb_iceberg_spark.operators.ranges import range_join_points_to_intervals

    ev = _events(spark)
    points = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")
    intervals = (
        ev.filter("event_type = 'signup'")
        .select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        )
    )
    got = range_join_points_to_intervals(
        points, intervals, "ts", "start_ts", "end_ts", key="user_id", granularity=3600
    ).select(
        "user_id",
        "event_id",
        F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("s"),
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    orows = con.execute(
        """
        WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             i AS (SELECT user_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts
                   FROM events WHERE event_type = 'signup')
        SELECT p.user_id, p.event_id, strftime(i.start_ts, '%Y-%m-%d %H:%M:%S') AS s
        FROM p JOIN i ON p.user_id = i.user_id AND i.start_ts <= p.ts AND p.ts < i.end_ts
        """
    ).fetchall()
    srows = [tuple(r) for r in got.collect()]
    assert len(srows) == len(orows)
    assert canon_rows(got.columns, srows) == canon_rows(["user_id", "event_id", "s"], orows)
    # plan never degenerates into a nested-loop cross product
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
