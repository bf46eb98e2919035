#!/usr/bin/env python
"""A/B: dedup_boilerplate's small-corpus branch (hashed counting pass +
broadcast join + shuffle reassembly — 2 scans + a broadcast-build job)
vs a SINGLE-PASS window formulation (the substring_span_stats
precedent): one scan explodes (pos, hash, seg) structs, ONE exchange on
the hash runs two windows (row_number per (hash, doc) marks the first
occurrence; a conditional sum per hash counts distinct docs — exactly
the array_distinct + count the two-pass shape computes), and the
reassembly groupBy consumes the same rows. HashPartitioning(h)
satisfies ClusteredDistribution([h, doc]), so both windows share the
one exchange.

All-boilerplate docs survive because nothing is filtered: the
boilerplate decision rides a when() inside collect_list, so every doc
reaches the reassembly aggregate (same trick the shipped branch uses).

Usage: python tools/exp_boilerplate_window.py <sf_dir> [rounds]
Verifies row identity (exceptAll both ways == 0) first, then
interleaved min-of-N timings of the two entry-shaped queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def window_variant(tok, window=8, max_doc_freq=2, key_col="doc_id", joiner=" "):
    toks, ltoks = F.col("toks"), F.col("ltoks")
    w = F.lit(window)
    n_chunks = F.greatest(F.ceil(F.size(toks) / w).cast("int"), F.lit(1))

    def chunk_hash(i):
        return F.xxhash64(
            *[F.try_element_at(ltoks, (i - 1) * w + F.lit(j + 1)) for j in range(window)]
        )

    def chunk_text(i):
        return F.concat_ws(" ", F.slice(toks, (i - 1) * w + 1, w))

    idx = F.sequence(F.lit(1), n_chunks)
    segs = tok.select(
        F.col(key_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.cast("int").alias("__pos"),
                    chunk_hash(i).alias("__h"),
                    chunk_text(i).alias("__seg"),
                ),
            )
        ).alias("s"),
    ).select(key_col, "s.__pos", "s.__h", "s.__seg")
    rn = F.row_number().over(Window.partitionBy("__h", key_col).orderBy("__pos"))
    dfc = F.sum(F.when(F.col("__rn") == 1, 1)).over(Window.partitionBy("__h"))
    return (
        segs.withColumn("__rn", rn)
        .withColumn("__df", dfc)
        .groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__df") <= max_doc_freq,
                                F.struct("__pos", "__seg"),
                            )
                        )
                    ),
                    lambda s: s["__seg"],
                ),
                joiner,
            ).alias("text")
        )
        .orderBy(key_col)
    )


def drain(df):
    row = df.agg(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row["n"], row["chk"]


def main():
    from duckdb_iceberg_spark import get_spark
    import __spark_entry__ as E
    from duckdb_iceberg_spark.entries.pipeline import _t_proj

    spark = get_spark("exp_boilerplate_window")
    spark.sparkContext.setLogLevel("ERROR")
    E.prepare_bucketed_fixtures(spark, SF_DIR)
    qs = E.queries()

    def current():
        # the pre-r12 small-corpus entry shape (two-pass hashed count +
        # broadcast + shuffle reassembly), inlined now that the entry
        # routes to the window mode
        from duckdb_iceberg_spark.operators import dedup as DD

        tok = _t_proj(spark, SF_DIR, "documents", "tokens")
        assert tok is not None, "tokens projection missing"
        return DD.token_window_boilerplate(
            tok, window=8, max_doc_freq=2, reassembly="shuffle"
        ).orderBy("doc_id")

    def variant():
        # the SHIPPED window mode (includes the repartition that pins
        # one shared exchange for both windows); window_variant above
        # is the first prototype kept for the record
        from duckdb_iceberg_spark.operators import dedup as DD

        tok = _t_proj(spark, SF_DIR, "documents", "tokens")
        assert tok is not None, "tokens projection missing"
        return DD.token_window_boilerplate(
            tok, window=8, max_doc_freq=2, reassembly="window"
        ).orderBy("doc_id")

    # identity first
    a, b = current(), variant()
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(json.dumps({"identity": {"a_minus_b": d1, "b_minus_a": d2}}))
    assert d1 == 0 and d2 == 0, "variant is NOT row-identical"

    # interleaved min-of-N
    for fn in (current, variant):
        drain(fn())  # warmup
    best = {"current": 1e9, "variant": 1e9}
    for _ in range(ROUNDS):
        for name, fn in (("current", current), ("variant", variant)):
            t0 = time.perf_counter()
            n, _ = drain(fn())
            best[name] = min(best[name], time.perf_counter() - t0)
    print(json.dumps({"sf_dir": SF_DIR, "rounds": ROUNDS, "rows": n, **{k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
