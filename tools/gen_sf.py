#!/usr/bin/env python
"""Generate scale-factor fixtures matching the driver's TESTDATA schema.

The driver ships sf0.001/0.01/0.1 (read-only); this generator produces
LARGER scale factors (sf1 by default) for local scale validation:
same ten tables, same schemas/value distributions (profiled from
/root/testdata/sf0.1), different seed. Correctness at these SFs is
checked the same way as the driver's gate — our Spark query vs the
DuckDB oracle over the *same* parquet — so exact value equality with
the driver's generator is not required, only distributional fidelity
(every query predicate must remain selective in the same way).

Usage:
    python tools/gen_sf.py --sf 1 --out /root/repo/.localdata/sf1

Memory-bounded: large tables are generated and written in chunks.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "zh", "es", "fr"]  # en ~41%, rest ~15% each
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
EPOCH_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)


def _ts_col(micros: np.ndarray) -> pa.Array:
    return pa.array(micros, type=pa.timestamp("us"))


def write_chunked(path: str, schema: pa.Schema, batches) -> int:
    n = 0
    with pq.ParquetWriter(path, schema) as w:
        for b in batches:
            w.write_table(pa.Table.from_arrays(b, schema=schema))
            n += len(b[0])
    return n


def gen_region(out: str) -> None:
    t = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": pa.array(REGIONS),
        }
    )
    pq.write_table(t, f"{out}/region.parquet")


def gen_nation(out: str, rng: np.random.Generator) -> None:
    t = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
        }
    )
    pq.write_table(t, f"{out}/nation.parquet")


def gen_customer(out: str, rng: np.random.Generator, n: int) -> None:
    t = pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2)),
            "c_mktsegment": pa.array([SEGMENTS[i] for i in rng.integers(0, 5, n)]),
        }
    )
    pq.write_table(t, f"{out}/customer.parquet")


def gen_supplier(out: str, rng: np.random.Generator, n: int) -> None:
    t = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2)),
        }
    )
    pq.write_table(t, f"{out}/supplier.parquet")


def gen_part(out: str, rng: np.random.Generator, n: int) -> None:
    adj = rng.integers(0, len(ADJS), n)
    noun = rng.integers(0, len(NOUNS), n)
    t = pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_name": pa.array([f"{ADJS[a]} {NOUNS[b]}" for a, b in zip(adj, noun)]),
            "p_brand": pa.array([f"Brand#{i + 1}" for i in rng.integers(0, 25, n)]),
            "p_type": pa.array([PTYPES[i] for i in rng.integers(0, 6, n)]),
            "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32)),
            "p_retailprice": pa.array(np.round(900.0 + (np.arange(n) % 1000) * 0.1, 2)),
        }
    )
    pq.write_table(t, f"{out}/part.parquet")


def gen_orders(out: str, rng: np.random.Generator, n: int, n_cust: int) -> None:
    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    statuses = np.array(["F", "O", "P"])

    def batches():
        chunk = 500_000
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            m = hi - lo
            days = rng.integers(0, 2404, m)  # 1995-01-01 .. 2001-08-01
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                pa.array(rng.integers(0, n_cust, m).astype(np.int64)),
                pa.array(statuses[rng.integers(0, 3, m)]),
                pa.array(np.round(rng.uniform(1000, 500000, m), 2)),
                _ts_col(EPOCH_1995 + days * DAY_US),
                pa.array([PRIORITIES[i] for i in rng.integers(0, 5, m)]),
            ]

    write_chunked(f"{out}/orders.parquet", schema, batches())


def gen_lineitem(
    out: str, rng: np.random.Generator, n_orders: int, n_part: int, n_supp: int
) -> int:
    schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    )
    flags = np.array(["A", "N", "R"])
    stats = np.array(["F", "O"])

    def batches():
        chunk_orders = 150_000  # ~600k lineitems per chunk
        for lo in range(0, n_orders, chunk_orders):
            hi = min(lo + chunk_orders, n_orders)
            nlines = rng.integers(1, 8, hi - lo)  # avg 4 per order
            okey = np.repeat(np.arange(lo, hi, dtype=np.int64), nlines)
            m = len(okey)
            linenumber = (
                np.arange(m, dtype=np.int64)
                - np.repeat(np.cumsum(nlines) - nlines, nlines)
                + 1
            ).astype(np.int32)
            days = rng.integers(0, 2500, m)  # 1995-01-01 .. ~2001-11
            yield [
                pa.array(okey),
                pa.array(rng.integers(0, n_part, m).astype(np.int64)),
                pa.array(rng.integers(0, n_supp, m).astype(np.int64)),
                pa.array(linenumber),
                pa.array(rng.integers(1, 51, m).astype(np.float64)),
                pa.array(np.round(rng.uniform(900, 105000, m), 2)),
                pa.array(np.round(rng.integers(0, 11, m) * 0.01, 2)),
                pa.array(np.round(rng.integers(0, 9, m) * 0.01, 2)),
                pa.array(flags[rng.integers(0, 3, m)]),
                pa.array(stats[rng.integers(0, 2, m)]),
                _ts_col(EPOCH_1995 + days * DAY_US),
            ]

    return write_chunked(f"{out}/lineitem.parquet", schema, batches())


def gen_events(out: str, rng: np.random.Generator, n: int, n_users: int) -> None:
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )

    def batches():
        chunk = 500_000
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            m = hi - lo
            # value: exponential mean 50, 2-decimal, matches profiled quantiles
            value = np.round(rng.exponential(50.0, m), 2)
            micros = rng.integers(0, 30 * DAY_US, m)  # Jan 2024
            ks = rng.integers(0, 100, m)
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                _ts_col(EPOCH_2024 + micros),
                pa.array(rng.integers(0, n_users, m).astype(np.int64)),
                pa.array([EVENT_TYPES[i] for i in rng.integers(0, 5, m)]),
                pa.array(value),
                pa.array([f'{{"k": {k}}}' for k in ks]),
            ]

    write_chunked(f"{out}/events.parquet", schema, batches())


def gen_documents(out: str, rng: np.random.Generator, n: int) -> None:
    """Word-salad docs from the driver's 31-word vocab; ~0.2% exact
    duplicates and ~0.5% near-duplicates planted (as in the driver's
    data, where sf0.1 has 8 duplicate texts in 5000 docs)."""
    lang_idx = rng.choice(len(LANGS), n, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n):
        nw = int(rng.integers(8, 101))
        words = vocab[rng.integers(0, len(vocab), nw)]
        texts.append(" ".join(words))
    # plant exact dups + near dups (copy an earlier doc, perturb tail)
    n_dup = max(2, n // 500)
    for j in rng.integers(0, n, n_dup):
        texts[int(j)] = texts[int(rng.integers(0, n))]
    n_near = max(2, n // 200)
    for j in rng.integers(0, n, n_near):
        src = texts[int(rng.integers(0, n))].split()
        if len(src) > 4:
            src[-1] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts[int(j)] = " ".join(src)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[i] for i in lang_idx]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
            "n_chars": pa.array(np.array([len(t_) for t_ in texts], dtype=np.int64)),
        }
    )
    pq.write_table(t, f"{out}/documents.parquet")


def gen_embeddings(out: str, rng: np.random.Generator, n: int, dim: int = 64) -> None:
    labels = rng.integers(0, 10, n).astype(np.int32)
    centroids = rng.normal(0, 0.12, (10, dim)).astype(np.float32)
    vecs = centroids[labels] + rng.normal(0, 0.1, (n, dim)).astype(np.float32)
    # plant near-duplicate pairs for the near-dup/ANN entries
    n_near = max(2, n // 100)
    src = rng.integers(0, n, n_near)
    dst = rng.integers(0, n, n_near)
    vecs[dst] = vecs[src] + rng.normal(0, 0.003, (n_near, dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    )
    pq.write_table(t, f"{out}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--tables",
        default="all",
        help="comma list of tables to generate (default all) — lets a "
        "disk-bounded host validate one family (e.g. --tables "
        "documents,embeddings for the sf100 text sweep) without the "
        "~17 GB relational fixtures; RNG streams then differ from a "
        "full-family run, which is fine because every check compares "
        "against an oracle over the SAME parquet",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    sf = args.sf
    want = None if args.tables == "all" else {t.strip() for t in args.tables.split(",")}

    def on(name):
        return want is None or name in want

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    n_li = None
    if on("region"):
        gen_region(args.out)
    if on("nation"):
        gen_nation(args.out, rng)
    if on("customer"):
        gen_customer(args.out, rng, n_cust)
    if on("supplier"):
        gen_supplier(args.out, rng, n_supp)
    if on("part"):
        gen_part(args.out, rng, n_part)
    if on("orders"):
        gen_orders(args.out, rng, n_orders, n_cust)
    if on("lineitem"):
        n_li = gen_lineitem(args.out, rng, n_orders, n_part, n_supp)
    if on("events"):
        gen_events(args.out, rng, n_events, n_users)
    if on("documents"):
        gen_documents(args.out, rng, n_docs)
    if on("embeddings"):
        gen_embeddings(args.out, rng, n_vecs)
    print(json.dumps({"sf": sf, "out": args.out, "lineitem_rows": n_li}))


if __name__ == "__main__":
    main()
