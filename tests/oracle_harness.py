"""Shared harness mimicking the driver's t2 correctness gate: run each
__spark_entry__ query AND its DuckDB oracle on the same parquet dir,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, name: str, qfn, sql: str | None):
    """Returns (ok: bool, detail: str)."""
    sdf = qfn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        return (len(srows) >= 0, f"rows-only: {len(srows)} rows")
    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return (False, f"SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        return (False, f"ROWS: spark={len(srows)} oracle={len(orows)}")
    a = canon_rows(scols, [tuple(r) for r in srows])
    b = canon_rows(ocols, orows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return (False, f"VALUES: first diffs {diffs}")
    return (True, f"ok: {len(srows)} rows")
