#!/usr/bin/env python
"""Round-12 experiment (verdict item #1): Arrow partial-min aggregation
for minhash_signatures.

Decomposes dedup_minhash_sig's cost, then A/Bs the shipped binary-min
aggregate against a mapInArrow partial-min (numpy min over the two
big-endian uint64 halves of each 16-byte digest — exact 128-bit
lexicographic min) feeding the same final binary-min aggregate.

Usage: python tools/exp_minhash_arrow.py <sf_dir> [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_iceberg_spark import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NUM_PERM = 16


def drain(df):
    from bench import _drain

    return _drain(df)


def build_toks(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    from duckdb_iceberg_spark.functions import text as TX

    col = TX.tokens(F.lower(F.col("text")))
    return d.select("doc_id", F.explode(F.array_distinct(col)).alias("tok"))


def digests(toks):
    return toks.select(
        "doc_id",
        *[
            F.unhex(F.md5(F.concat(F.lit(f"{i}:"), F.col("tok")))).alias(f"h{i}")
            for i in range(NUM_PERM)
        ],
    )


def final_agg(dig):
    agg = dig.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(NUM_PERM)]
    )
    return agg.select(
        "doc_id",
        *[F.lower(F.hex(F.col(f"h{i}"))).alias(f"h{i}") for i in range(NUM_PERM)],
    )


def _arrow_partial_min(
    digests: DataFrame, key_col: str, num_perm: int
) -> DataFrame:
    """Map-side partial min over 16-byte binary digest columns
    (guide §4.2) — the pre-shuffle half of the MinHash aggregation.

    Spark's min-over-BINARY agg buffers are variable-length objects
    compared byte-wise per row (the r11 headroom probe measured
    fixed-width LONG buffers ~35% faster on the same subtree, but no
    exact 128-bit encoding reaches them in pure Spark SQL). This
    kernel does the same partial aggregation in numpy: each digest is
    viewed as two big-endian uint64 halves, and the exact
    128-bit-lexicographic grouped min is two fixed-width vector mins
    per digest (min over hi; min over lo where hi ties the group min
    — md5 bytes compare unsigned, so big-endian uint64 order IS the
    byte order). Emits at most one row per (key, task); the caller's
    existing groupBy(min(binary)) finalizes, so the values — and the
    post-shuffle plan — are bit-identical to the inline aggregate.

    Rows with a NULL key or NULL digest (never produced by
    minhash_signatures — explode yields non-null tokens and md5 of
    non-null is non-null) are passed through unaggregated so the JVM
    final aggregate keeps exact null semantics.
    """
    num_perm = int(num_perm)

    def _partial(batches):
        import numpy as np
        import pyarrow as pa

        out_schema = None
        acc_keys: list = []
        acc_cols: list[list] = [[] for _ in range(num_perm)]
        acc_rows = 0

        def _bin2u64(a, n):
            # binary array, no nulls, every value exactly 16 bytes ->
            # (n, 2) native uint64 [hi, lo] in big-endian VALUE order
            bufs = a.buffers()
            if pa.types.is_large_binary(a.type):
                off = np.frombuffer(
                    bufs[1], dtype=np.int64, count=n + 1, offset=a.offset * 8
                )
            else:
                off = np.frombuffer(
                    bufs[1], dtype=np.int32, count=n + 1, offset=a.offset * 4
                )
            if int(off[-1]) - int(off[0]) != 16 * n:
                raise ValueError("minhash digest column is not 16 bytes/row")
            data = np.frombuffer(
                bufs[2], dtype=np.uint8, count=16 * n, offset=int(off[0])
            ).reshape(n, 16)
            return np.ascontiguousarray(data).view(">u8").astype(np.uint64)

        def _group_min(keys, cols):
            uniq, codes = np.unique(keys, return_inverse=True)
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            n = len(sc)
            starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            counts = np.diff(np.r_[starts, n])
            gidx = np.repeat(np.arange(len(starts)), counts)
            outs = []
            for m in cols:
                hi = m[order, 0]
                lo = m[order, 1]
                mhi = np.minimum.reduceat(hi, starts)
                lo_m = np.where(
                    hi == mhi[gidx], lo, np.uint64(0xFFFFFFFFFFFFFFFF)
                )
                mlo = np.minimum.reduceat(lo_m, starts)
                outs.append(np.column_stack([mhi, mlo]))
            return uniq, outs

        def _to_batch(keys, cols):
            g = len(keys)
            offsets = np.arange(g + 1, dtype=np.int32) * 16
            arrs = [pa.array(keys, type=out_schema.field(0).type)]
            for m in cols:
                arrs.append(
                    pa.Array.from_buffers(
                        pa.binary(),
                        g,
                        [
                            None,
                            pa.py_buffer(offsets.tobytes()),
                            pa.py_buffer(m.astype(">u8").tobytes()),
                        ],
                    )
                )
            return pa.RecordBatch.from_arrays(arrs, schema=out_schema)

        def _merge_acc():
            nonlocal acc_keys, acc_cols, acc_rows
            keys = np.concatenate(acc_keys)
            cols = [np.concatenate(acc_cols[j]) for j in range(num_perm)]
            uniq, outs = _group_min(keys, cols)
            acc_keys = [uniq]
            acc_cols = [[outs[j]] for j in range(num_perm)]
            acc_rows = len(uniq)
            return uniq, outs

        for b in batches:
            if out_schema is None:
                out_schema = b.schema
            n = b.num_rows
            if n == 0:
                continue
            if any(b.column(j).null_count for j in range(num_perm + 1)):
                yield b  # exact-null escape hatch: unaggregated passthrough
                continue
            keys = b.column(0).to_numpy(zero_copy_only=False)
            cols = [_bin2u64(b.column(j + 1), n) for j in range(num_perm)]
            uniq, outs = _group_min(keys, cols)
            acc_keys.append(uniq)
            for j in range(num_perm):
                acc_cols[j].append(outs[j])
            acc_rows += len(uniq)
            if acc_rows > 4_000_000:
                _merge_acc()
        if acc_rows:
            uniq, outs = _merge_acc()
            yield _to_batch(uniq, outs)

    return digests.mapInArrow(_partial, digests.schema)



def arrow_partial(dig):
    return _arrow_partial_min(dig, "doc_id", NUM_PERM)


def main():
    spark = get_spark("exp_minhash_arrow")
    spark.sparkContext.setLogLevel("ERROR")
    toks = build_toks(spark)

    shapes = {
        "explode_only": lambda: toks,
        "digests_only": lambda: digests(toks),
        "binary_min (shipped)": lambda: final_agg(digests(toks)),
        "arrow_partial_min": lambda: final_agg(arrow_partial(digests(toks))),
    }

    # identity check first
    a = final_agg(digests(toks))
    b = final_agg(arrow_partial(digests(toks)))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"identity exceptAll diff rows: {diff}")
    assert diff == 0, "arrow partial-min changed values!"

    # warmup
    for name, f in shapes.items():
        drain(f())
    best = {n: 1e9 for n in shapes}
    for r in range(ROUNDS):
        for name, f in shapes.items():
            t0 = time.perf_counter()
            n = drain(f())
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt:.3f}s ({n} rows)")
    print("=== best of", ROUNDS)
    for name, v in best.items():
        print(f"{name}: {v:.3f}s")


if __name__ == "__main__":
    main()
