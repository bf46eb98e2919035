"""Plan-shape guards: the properties that make queries survive a 100x
scale-up, asserted on the actual executed/analyzed plans.

- hot-path operators must stay JVM-side (no row-at-a-time
  BatchEvalPython; only Arrow-batched python where declared)
- filters and column pruning must reach the parquet scan
- star joins must broadcast their dimension sides
"""

import os
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent))

import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# every oracle-checked relational/text/dedup/similarity read query must
# be free of row-at-a-time Python UDFs (BatchEvalPython). Arrow-batched
# ops (mapInPandas / applyInPandasWithState) are allowed where declared.
_JVM_ONLY = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_revenue",
    "q17_small_quantity",
    "join_salted",
    "agg_stats",
    "window_topn_per_group",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_sig",
    "sim_topk",
    "events_sessionize",
    "text_repetition",
    "text_pii_scrub",
    "text_entropy",
    "contamination",
    "sim_quantized",
    "resample_events",
    "bitwise_funcs",
]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _JVM_ONLY)
def test_no_python_udf_in_hot_path(spark, name):
    plan = _plan(E.queries()[name](spark, SF))
    assert "BatchEvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_filter_and_pruning_reach_scan(spark):
    df = E.queries()["q6_revenue"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters" in plan
    # projection pruned: q6 needs only 4 lineitem columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) <= 5, m.group(0) if m else plan[:500]


def test_star_join_broadcasts_dims(spark):
    plan = _plan(E.queries()["q5_local_supplier"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at least
    assert "CartesianProduct" not in plan


def test_scalar_subquery_is_broadcast(spark):
    plan = _plan(E.queries()["q22_inactive_customers"](spark, SF))
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_q2_semi_join_before_aggregate(spark):
    """The selective part predicate must reach lineitem BEFORE the
    per-(part,supplier) aggregate — as a broadcast semi join — and the
    window must not add a CartesianProduct."""
    plan = _plan(E.queries()["q2_min_cost_supplier"](spark, SF))
    assert "LeftSemi" in plan
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_q21_single_fact_scan(spark):
    """Decorrelated Q21 reads lineitem ONCE (the naive EXISTS/NOT
    EXISTS form scans it three times)."""
    plan = _plan(E.queries()["q21_waiting_suppliers"](spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")


def test_pack_sequences_no_python(spark):
    plan = _plan(E.queries()["pack_sequences"](spark, SF))
    assert "BatchEvalPython" not in plan


def test_curate_single_shuffle_dedup(spark):
    """Curation's dedup is one hash partitioning by fingerprint: no
    join, no extra exchange beyond the agg."""
    plan = _plan(E.queries()["curate_pipeline"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_bucketed_join_no_exchange(spark):
    """Both sides bucketed on the join key with the same bucket count:
    the join plan must contain NO shuffle Exchange and no broadcast —
    the co-located join a 100 TB fact-fact join needs."""
    from duckdb_iceberg_spark.operators.bucketed import bucketed_join

    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, o, c, "o_custkey", "c_custkey", names=("bt_orders", "bt_cust"))
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan[:800]
    assert "BroadcastHashJoin" not in plan


def test_tpch_join_spine_no_orderkey_exchange(spark):
    """With the bucketed fixture overlay active (lineitem/orders on
    orderkey, customer on custkey), the q3/q5/q10/q18 join spine must
    compile with ZERO Exchange on an orderkey — the sf10 exchange cost
    the round-4 verdict flagged is structural, not tuning. q3/q18 are
    fully exchange-free; q5/q10 keep exactly one (the custkey hop's
    stream side / final agg)."""
    import __spark_entry__ as E2

    E2.prepare_bucketed_fixtures(spark, SF)
    try:
        budget = {
            "q3_shipping_priority": 0,
            "q18_large_orders": 0,
            # q5: the custkey partial-agg hop, the final n_name agg
            # exchange (one row per nation), and the customer build
            # side's exchange for the SHUFFLE_HASH join — a deliberate
            # trade (r6): re-partitioning the 2-column dimension is
            # cheaper at every scale than sort-merge sorting the
            # customers x nations partial-aggregate stream.
            "q5_local_supplier": 3,
            "q10_returned_items": 1,
        }
        for name, max_ex in budget.items():
            plan = _plan(E2.queries()[name](spark, SF))
            okey = [
                ln
                for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln and "orderkey" in ln
            ]
            assert not okey, f"{name}: orderkey exchange present: {okey[0][:200]}"
            assert plan.count("Exchange hashpartitioning") <= max_ex, (
                f"{name}: more exchanges than budgeted"
            )
    finally:
        # do not leak the overlay into other tests' plan assertions
        for k in [k for k, v in E2._BUCKETED_OVERLAY.items() if k[0] == os.path.abspath(SF)]:
            del E2._BUCKETED_OVERLAY[k]


def test_funnel_join_bucketed_no_exchange(spark):
    """With events bucketed on user_id, the purchase->click interval
    self-join compiles to a shuffle-free hash join: zero Exchanges and
    no per-bucket sort (the SHUFFLE_HASH hint in click_purchase_join's
    batch branch — sort-merge would add a Sort per side)."""
    import __spark_entry__ as E2

    E2.prepare_bucketed_fixtures(spark, SF)
    try:
        plan = _plan(E2.queries()["funnel_join"](spark, SF))
        assert "ShuffledHashJoin" in plan, plan[:500]
        assert "Exchange" not in plan, plan[:500]
    finally:
        for k in [k for k, v in E2._BUCKETED_OVERLAY.items() if k[0] == os.path.abspath(SF)]:
            del E2._BUCKETED_OVERLAY[k]


def test_colocated_projection_join_no_fact_exchange(spark):
    """join_colocated_brand through the brand-denormalized partkey
    projection must compile with NO join at all and no Exchange on
    partkey — the only allowed Exchange is the final 25-row brand
    aggregation."""
    import __spark_entry__ as E2

    E2.prepare_bucketed_fixtures(spark, SF)
    try:
        plan = _plan(E2.queries()["join_colocated_brand"](spark, SF))
        assert "Join" not in plan, plan[:500]
        pk = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln and "partkey" in ln
        ]
        assert not pk, f"partkey exchange present: {pk[0][:200]}"
        assert plan.count("Exchange hashpartitioning") <= 1
    finally:
        for k in [k for k, v in E2._BUCKETED_OVERLAY.items() if k[0] == os.path.abspath(SF)]:
            del E2._BUCKETED_OVERLAY[k]


def test_q21_spine_route_no_join_before_aggregate(spark):
    """With the overlay active, q21 rides the o_orderstatus-carrying
    spine projection: no lineitem⋈orders join survives — the only
    joins left are the two dimension broadcasts — and no exchange
    partitions on an orderkey (both hash aggregates are satisfied by
    the bucketed layout)."""
    import __spark_entry__ as E2

    E2.prepare_bucketed_fixtures(spark, SF)
    try:
        plan = _plan(E2.queries()["q21_waiting_suppliers"](spark, SF))
        assert "SortMergeJoin" not in plan, plan[:500]
        assert "prj_spine" in plan, plan[:500]
        okey = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln and "orderkey" in ln
        ]
        assert not okey, f"orderkey exchange present: {okey[0][:200]}"
    finally:
        for k in [k for k, v in E2._BUCKETED_OVERLAY.items() if k[0] == os.path.abspath(SF)]:
            del E2._BUCKETED_OVERLAY[k]


def test_curate_and_dedup_exact_single_projection_scan(spark):
    """With the v6 tokens projection (ingest-time fp stat) active,
    curate_pipeline and dedup_exact read ONE stored projection and
    never touch documents.parquet or any join: the normalize+md5
    kernel and the doc_id join-back are both gone."""
    import __spark_entry__ as E2

    E2.prepare_bucketed_fixtures(spark, SF)
    try:
        for name in ("curate_pipeline", "dedup_exact", "text_fingerprint"):
            plan = _plan(E2.queries()[name](spark, SF))
            assert "Join" not in plan, f"{name}: {plan[:500]}"
            assert "documents.parquet" not in plan, f"{name} still reads raw text"
            assert "prj_doc_tokens" in plan, f"{name} not routed: {plan[:500]}"
    finally:
        for k in [k for k, v in E2._BUCKETED_OVERLAY.items() if k[0] == os.path.abspath(SF)]:
            del E2._BUCKETED_OVERLAY[k]


def test_bucketed_overlay_rows_identical_to_raw(spark):
    """Layout independence: the same entry over bucketed fixtures
    returns row-identical results to the raw-parquet read (the
    correctness driver always runs raw; bench runs bucketed)."""
    import __spark_entry__ as E2

    # q3/q5/q10/q18 cover the denormalized spine projection and
    # events_hourly the aggregate projection (both routed only when the
    # overlay is active); the others cover the split-layout rewrites
    # (documents/embeddings/part round-robin repartition must not
    # change any result — catches order-dependent entries).
    names = [
        "q1_pricing_summary",
        "agg_global",
        "agg_stats",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q10_returned_items",
        "q18_large_orders",
        "events_hourly",
        "curate_pipeline",
        "dedup_exact",
        "text_fingerprint",
        "q21_waiting_suppliers",
        "sim_topk",
        "q19_disjunctive",
        "dedup_minhash_pairs",
        "join_colocated_brand",
        "join_salted",
        "sort_topk",
        "window_topn_per_group",
        "window_running_sum",
        "window_lag_delta",
        "window_range_frame",
        # routed through the bkt_events_type partitioned log since r11;
        # asof's tie-break for equal (key, ts) right rows depends on
        # physical row order, so the layout rewrite must be proven
        # row-identical (r11 ADVICE)
        "asof_join_events",
        "range_join_events",
    ]
    raw = {n: sorted(tuple(r) for r in E2.queries()[n](spark, SF).collect()) for n in names}
    E2.prepare_bucketed_fixtures(spark, SF)
    try:
        bkt = {n: sorted(tuple(r) for r in E2.queries()[n](spark, SF).collect()) for n in names}
    finally:
        for k in [k for k, v in E2._BUCKETED_OVERLAY.items() if k[0] == os.path.abspath(SF)]:
            del E2._BUCKETED_OVERLAY[k]
    assert raw == bkt


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark n-gram set must broadcast; the corpus side must
    not shuffle for the membership join (only the final per-doc
    aggregation exchanges)."""
    plan = _plan(E.queries()["contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_streaming_enrich_is_broadcast(spark):
    """Batch twin of the stream-static enrichment joins map-side."""
    from duckdb_iceberg_spark.streaming.events import enrich_with_dim

    ev = spark.read.parquet(f"{SF}/events.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    plan = _plan(enrich_with_dim(ev, cust))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantized_topk_no_global_sort(spark):
    """int8 top-k must plan as TakeOrderedAndProject (k rows to the
    driver), never a full global Sort."""
    plan = _plan(E.queries()["sim_quantized"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_vocab_topk_partial_agg_and_no_global_sort(spark):
    """Heavy hitters: map-side partial aggregation before the shuffle
    and TakeOrderedAndProject for the top-k (never a full vocabulary
    sort)."""
    plan = _plan(E.queries()["text_vocab_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan


def test_token_window_boilerplate_no_text_shuffle(spark):
    """The pre-tokenized boilerplate path must never exchange document
    text: the only hash exchanges carry the 16-byte (doc, hash) digest
    stream and the tiny removal-set build; reassembly joins are
    broadcasts. A collect_list of segments or a SortMergeJoin anywhere
    means text is crossing an exchange again."""
    from pyspark.sql import functions as F

    from duckdb_iceberg_spark.operators.dedup import token_window_boilerplate

    d = spark.read.parquet(f"{SF}/documents.parquet")
    tok = d.select(
        "doc_id",
        F.split(F.trim("text"), r"\s+").alias("toks"),
        F.split(F.trim(F.lower("text")), r"\s+").alias("ltoks"),
    )
    plan = _plan(token_window_boilerplate(tok, window=8, max_doc_freq=2))
    assert "SortMergeJoin" not in plan
    assert "collect_list" not in plan
    # every join in the output assembly is broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    # the exchanges that remain partition the digest stream, not text
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "toks" not in line and "text" not in line, line


def test_bigram_lm_small_model_no_instance_shuffle(spark):
    """Vocab-gated lm path: both model tables broadcast; the instance
    stream reaches the per-doc aggregate without a bigram-key exchange
    (only the doc-key aggregation exchanges, partial-aggregated)."""
    from duckdb_iceberg_spark.operators.lm import bigram_lm_score

    d = spark.read.parquet(f"{SF}/documents.parquet")
    # the gate is opt-in since r9 (library default 0 keeps construction
    # lazy); this test is ABOUT the gated path, so opt in explicitly
    plan = _plan(bigram_lm_score(d, bigram_broadcast_limit=4_000_000))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" not in plan  # the windowed shape is the big-vocab fallback


def test_stats_informed_broadcast_choice(spark, tmp_path):
    """iceberg_join decides broadcast-vs-shuffle from TABLE METADATA
    (manifest byte totals + Puffin statistics ndv), without reading
    data: a small dim broadcasts; the same dim with the threshold
    forced to 0 does not."""
    from duckdb_iceberg_spark import IcebergTable, iceberg_join, iceberg_table_statistics

    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "dim")
    t = IcebergTable.create(spark, path, n)
    t.rewrite_data_files(collect_statistics=True)
    # the stats round-trip: ndv rows present, payload == property
    stats = {
        r.column: r.ndv
        for r in iceberg_table_statistics(spark, path, verify_payload=True).collect()
    }
    assert stats["n_nationkey"] == n.count()  # key column is unique
    fact = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    joined = iceberg_join(spark, fact, path, "n_nationkey")
    assert "BroadcastHashJoin" in _plan(joined)
    # the decision is OURS, not AQE's: the broadcast hint is in the
    # optimized logical plan when stats say yes, absent when the
    # threshold forbids it (AQE may still convert the tiny join at
    # runtime — that is its job — but the planner hint must differ)
    assert "strategy=broadcast" in joined._jdf.queryExecution().optimizedPlan().toString()
    assert joined.count() == fact.count()
    forced = iceberg_join(spark, fact, path, "n_nationkey", broadcast_threshold_bytes=0)
    assert "strategy=broadcast" not in forced._jdf.queryExecution().optimizedPlan().toString()
    assert forced.count() == fact.count()


def test_stats_ndv_derates_broadcast_estimate(spark, tmp_path):
    """The ndv de-rate applies ONLY to semi/anti joins, where the
    build side is first reduced to its distinct keys (semantics-
    preserving): a dim whose RAW bytes exceed the threshold still
    broadcasts a distinct-key projection for a SEMI join when stats
    show the key is heavily duplicated. The same dim/threshold under
    an INNER join must NOT broadcast — Spark's broadcast hash
    relation keeps every duplicated build row, so the raw bytes are
    the honest estimate there."""
    from duckdb_iceberg_spark import IcebergTable, iceberg_join

    # 150 customers (sf0.001) keyed by 25 distinct nation keys
    dim = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .withColumnRenamed("c_nationkey", "n_nationkey")
    )
    path = str(tmp_path / "dim")
    t = IcebergTable.create(spark, path, dim)
    from duckdb_iceberg_spark.plans.manifests import load_table_scan

    raw_bytes = sum(
        e.file_size_in_bytes
        for e in load_table_scan(t.meta, t.meta.latest_snapshot(), t.path, False).data_files()
    )
    thresh = raw_bytes // 4  # raw size fails the gate on its own
    fact = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    no_stats = iceberg_join(
        spark, fact, path, "n_nationkey", how="semi", broadcast_threshold_bytes=thresh
    )
    assert "strategy=broadcast" not in no_stats._jdf.queryExecution().optimizedPlan().toString()
    t.compute_statistics()
    with_stats = iceberg_join(
        spark, fact, path, "n_nationkey", how="semi", broadcast_threshold_bytes=thresh
    )
    assert "strategy=broadcast" in with_stats._jdf.queryExecution().optimizedPlan().toString()
    assert with_stats.count() == no_stats.count() == 25
    # inner join: duplicates must survive into the hash relation, so
    # stats never talk a too-big dim INTO a broadcast
    inner = iceberg_join(spark, fact, path, "n_nationkey", broadcast_threshold_bytes=thresh)
    assert "strategy=broadcast" not in inner._jdf.queryExecution().optimizedPlan().toString()
    assert inner.count() == 150  # sf0.001: 150 customers
