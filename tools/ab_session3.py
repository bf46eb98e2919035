#!/usr/bin/env python
"""Interleaved old-vs-new A/B for the session-3 r11 changes.

For each changed query the OLD shape is rebuilt inline (the exact
pre-change dataframe), the NEW shape comes from the shipped entry /
operator, result identity is asserted on full collected rows first,
then both run alternately (order-balanced min-of-N with bench._drain)
in ONE session so ambient drift cancels.

Usage: python tools/ab_session3.py <sf_dir> [rounds] [only_csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from bench import _drain
    from duckdb_iceberg_spark import get_spark
    from duckdb_iceberg_spark.functions import text as TX
    from duckdb_iceberg_spark.operators import dedup as DD

    spark = get_spark("ab_session3")
    spark.sparkContext.setLogLevel("ERROR")
    E.prepare_bucketed_fixtures(spark, SF)
    qs = E.queries()

    L = E  # layout namespace (star-imported)

    def old_q21():
        li = L._t(spark, SF, "lineitem")
        o = L._t(spark, SF, "orders").filter(F.col("o_orderstatus") == "F")
        s = L._t(spark, SF, "supplier")
        n = L._t(spark, SF, "nation")
        grp = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "l_suppkey")
            .agg(
                F.sum(
                    (
                        F.col("l_shipdate")
                        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                    ).cast("long")
                ).alias("late_rows")
            )
        )
        late = F.col("late_rows") > 0
        per_order = (
            grp.groupBy("l_orderkey")
            .agg(
                F.count("*").alias("nsupp"),
                F.sum(late.cast("long")).alias("nlate"),
                F.max(F.when(late, F.col("l_suppkey"))).alias("suppkey"),
                F.max(F.when(late, F.col("late_rows"))).alias("late_rows"),
            )
            .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
            .select("suppkey", "late_rows")
        )
        return (
            per_order.join(F.broadcast(s), per_order.suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy("s_name")
            .agg(F.sum("late_rows").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20)
        )

    def old_curate():
        tok = L._t_proj(spark, SF, "documents", "tokens")
        d = (
            L._t(spark, SF, "documents")
            .select("doc_id", "lang", TX.fingerprint(F.col("text")).alias("fp"))
            .join(
                tok.select(
                    "doc_id",
                    F.col("n_ws_tokens").alias("n_tokens"),
                    TX.quality_score_from_stats(
                        F.col("n_ws_tokens"),
                        F.col("n_chars"),
                        F.col("n_stopwords"),
                        F.col("n_punct"),
                    ).alias("quality"),
                ),
                "doc_id",
            )
        )
        q = d.filter((F.col("quality") > 0.5) & (F.col("lang") != "und"))
        keep = q.groupBy("fp").agg(
            F.min_by(F.struct("lang", "n_tokens"), "doc_id").alias("__w")
        )
        return (
            keep.groupBy(F.col("__w.lang").alias("lang"))
            .agg(F.count("*").alias("n_docs"), F.sum("__w.n_tokens").alias("n_tokens"))
            .orderBy("lang")
        )

    def old_dedup_exact():
        d = L._t(spark, SF, "documents")
        return DD.exact_dedup(d, keep_cols=["doc_id", "source"])

    def old_text_fingerprint():
        d = L._t(spark, SF, "documents")
        return (
            d.select(TX.fingerprint(F.col("text")).alias("fp"))
            .groupBy("fp")
            .agg(F.count("*").alias("n"))
        )

    def old_boilerplate():
        # pre-change token_window_boilerplate: global (doc, hash)
        # .distinct() in the counting pass, both reassembly modes
        tok = L._t_proj(spark, SF, "documents", "tokens")
        toks, ltoks = F.col("toks"), F.col("ltoks")
        window = 8
        w = F.lit(window)
        n_chunks = F.greatest(F.ceil(F.size(toks) / w).cast("int"), F.lit(1))

        def chunk_hash(i):
            return F.xxhash64(
                *[
                    F.try_element_at(ltoks, (i - 1) * w + F.lit(j + 1))
                    for j in range(window)
                ]
            )

        def chunk_text(i):
            return F.concat_ws(" ", F.slice(toks, (i - 1) * w + 1, w))

        idx = F.sequence(F.lit(1), n_chunks)
        max_doc_freq = 2
        key_col, joiner = "doc_id", " "
        df = tok
        if not L._docs_big(SF):
            hashes = df.select(
                F.col(key_col), F.explode(F.transform(idx, chunk_hash)).alias("__h")
            )
            common = F.broadcast(
                hashes.distinct()
                .groupBy("__h")
                .agg(F.count("*").alias("__df"))
                .where(F.col("__df") > max_doc_freq)
                .select("__h", F.lit(True).alias("__bad"))
            )
            segs = df.select(
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
            marked = segs.join(common, "__h", "left")
            return marked.groupBy(key_col).agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("__bad").isNull(),
                                    F.struct("__pos", "__seg"),
                                )
                            )
                        ),
                        lambda s: s["__seg"],
                    ),
                    joiner,
                ).alias("text")
            ).orderBy("doc_id")
        hashes = df.select(
            F.col(key_col), F.explode(F.transform(idx, chunk_hash)).alias("__h")
        )
        from duckdb_iceberg_spark.cache import scoped_persist

        dist = scoped_persist(hashes.distinct())
        common = (
            dist.groupBy("__h")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_doc_freq)
            .select("__h")
        )
        removal = (
            dist.join(F.broadcast(common), "__h")
            .groupBy(key_col)
            .agg(F.collect_set("__h").alias("__rm"))
        )
        kept_idx = F.filter(
            idx, lambda i: ~F.array_contains(F.col("__rm"), chunk_hash(i))
        )
        filtered = F.array_join(F.transform(kept_idx, chunk_text), joiner)
        untouched = F.concat_ws(joiner, toks)
        return df.join(F.broadcast(removal), key_col, "left").select(
            F.col(key_col),
            F.when(F.col("__rm").isNull(), untouched).otherwise(filtered).alias(
                "text"
            ),
        ).orderBy("doc_id")

    cases = {
        "q21_waiting_suppliers": (old_q21, lambda: qs["q21_waiting_suppliers"](spark, SF)),
        "curate_pipeline": (old_curate, lambda: qs["curate_pipeline"](spark, SF)),
        "dedup_exact": (old_dedup_exact, lambda: qs["dedup_exact"](spark, SF)),
        "text_fingerprint": (old_text_fingerprint, lambda: qs["text_fingerprint"](spark, SF)),
        "dedup_boilerplate": (old_boilerplate, lambda: qs["dedup_boilerplate"](spark, SF)),
    }
    for name, (old_fn, new_fn) in cases.items():
        if ONLY and name not in ONLY:
            continue
        a = sorted(tuple(r) for r in old_fn().collect())
        b = sorted(tuple(r) for r in new_fn().collect())
        assert a == b, f"{name}: RESULTS DIFFER (old {len(a)} rows, new {len(b)})"
        print(f"# {name}: identity OK ({len(a)} rows)", flush=True)
        # warm both
        _drain(old_fn())
        _drain(new_fn())
        best_old = best_new = None
        for r in range(ROUNDS):
            order = [("old", old_fn), ("new", new_fn)]
            if r % 2:
                order.reverse()
            for tag, fn in order:
                t0 = time.perf_counter()
                _drain(fn())
                dt = time.perf_counter() - t0
                if tag == "old":
                    best_old = dt if best_old is None or dt < best_old else best_old
                else:
                    best_new = dt if best_new is None or dt < best_new else best_new
        print(
            f"{name}: old {best_old:.3f}s -> new {best_new:.3f}s "
            f"({(best_new / best_old - 1) * 100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
