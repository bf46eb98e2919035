"""End-to-end iceberg_scan/snapshots/metadata tests vs the reference's
golden values (reference test/sql/iceberg_scan.test and
iceberg_scan_generated_data_0_001.test)."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_metadata, iceberg_scan, iceberg_snapshots

BASE = "/root/reference/data/iceberg"
LI = f"{BASE}/lineitem_iceberg"


def test_scan_latest_count(spark):
    assert iceberg_scan(spark, LI, allow_moved_paths=True).count() == 51793


def test_scan_snapshot_id(spark):
    df = iceberg_scan(spark, LI, snapshot_id=3776207205136740581, allow_moved_paths=True)
    assert df.count() == 60175


def test_scan_version_param(spark):
    assert iceberg_scan(spark, LI, version="1", allow_moved_paths=True).count() == 60175


def test_scan_timestamp(spark):
    df = iceberg_scan(spark, LI, timestamp=datetime.datetime(2023, 2, 15, 15, 8, 0), allow_moved_paths=True)
    assert df.count() == 60175
    # verbatim reference message (iceberg_scan.test:62)
    with pytest.raises(ValueError, match="Could not find latest snapshots for timestamp 2000-01-01 00:00:00"):
        iceberg_scan(spark, LI, timestamp=datetime.datetime(2000, 1, 1), allow_moved_paths=True)


def test_scan_gz_metadata(spark):
    df = iceberg_scan(spark, f"{BASE}/lineitem_iceberg_gz", metadata_compression_codec="gzip", allow_moved_paths=True)
    assert df.count() == 111968


def test_scan_pushdown_reaches_parquet(spark):
    """Filters and projection must reach the parquet scan (100 TB
    requirement: file-skipping + column pruning)."""
    df = iceberg_scan(spark, LI, allow_moved_paths=True)
    plan = df.filter(F.col("l_orderkey") == 5).select("l_orderkey", "l_quantity")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,5)]" in plan or "EqualTo(l_orderkey,5)" in plan
    assert "ReadSchema" in plan


def test_snapshots_listing(spark):
    rows = iceberg_snapshots(spark, LI).orderBy("sequence_number").collect()
    assert [(r.sequence_number, r.snapshot_id) for r in rows] == [
        (1, 3776207205136740581),
        (2, 7635660646343998149),
    ]
    assert str(rows[0].timestamp_ms).startswith("2023-02-15 15:07:54.504")


def test_metadata_listing(spark):
    rows = iceberg_metadata(spark, LI, allow_moved_paths=True).collect()
    got = {(r.manifest_sequence_number, r.manifest_content, r.status, r.content, r.record_count) for r in rows}
    assert got == {
        (2, "DATA", "ADDED", "EXISTING", 51793),
        (2, "DATA", "DELETED", "EXISTING", 60175),
    }
    assert all(r.file_path.startswith("lineitem_iceberg/data/") for r in rows)


def test_list_files_mode(spark):
    rows = iceberg_scan(spark, f"{BASE}/generated_spec2_0_001/pyspark_iceberg_table", mode="list_files", allow_moved_paths=True).collect()
    types = {r.type for r in rows}
    assert types == {"data", "delete"}


@pytest.mark.parametrize("spec,final_rows", [("generated_spec1_0_001", 7690), ("generated_spec2_0_001", 6592)])
def test_generated_full_table_equality(spark, spec, final_rows):
    """The reference's core correctness engine (SURVEY §5 layer 2):
    ICEBERG_SCAN(table) ≡ expected parquet, full data, order-insensitive."""
    ours = iceberg_scan(spark, f"{BASE}/{spec}/pyspark_iceberg_table", allow_moved_paths=True)
    exp = spark.read.parquet(f"{BASE}/{spec}/expected_results/last/data")
    assert ours.count() == exp.count() == final_rows
    cols = sorted(ours.columns)
    assert sorted(exp.columns) == cols
    assert ours.select(cols).exceptAll(exp.select(cols)).count() == 0
    assert exp.select(cols).exceptAll(ours.select(cols)).count() == 0


def test_schema_evolution_time_travel(spark):
    t = f"{BASE}/generated_spec2_0_001/pyspark_iceberg_table"
    latest = iceberg_scan(spark, t, allow_moved_paths=True)
    assert dict((f.name, f.dataType.simpleString()) for f in latest.schema.fields)["schema_evol_added_col_1"] == "bigint"
    v8 = iceberg_scan(spark, f"{t}/metadata/v8.metadata.json", allow_moved_paths=True)
    assert dict((f.name, f.dataType.simpleString()) for f in v8.schema.fields)["schema_evol_added_col_1"] == "int"
    v6 = iceberg_scan(spark, f"{t}/metadata/v6.metadata.json", allow_moved_paths=True)
    assert "schema_evol_added_col_1" not in v6.columns


def test_mor_plan_shape(spark):
    """Plan-shape parity with the reference's EXPLAIN assertion
    (ANTI join; deletes side broadcast so no shuffle on the big side)."""
    df = iceberg_scan(spark, f"{BASE}/generated_spec2_0_001/pyspark_iceberg_table", allow_moved_paths=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "Broadcast" in plan


def test_history_ancestry(spark):
    """history(): parent links follow the snapshot chain and every
    logged snapshot on the linear chain is a current ancestor."""
    from duckdb_iceberg_spark import iceberg_history

    df = iceberg_history(spark, "/root/reference/data/iceberg/generated_spec2_0_001/pyspark_iceberg_table")
    rows = sorted(df.collect(), key=lambda r: r.made_current_at)
    assert len(rows) >= 2
    assert rows[0].parent_id is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.parent_id == prev.snapshot_id
    assert all(r.is_current_ancestor for r in rows)


def test_register_sql_views_family(spark):
    """SQL-first parity: the whole reference query surface through
    spark.sql against registered views, golden counts intact."""
    from duckdb_iceberg_spark import register_sql_views

    path = "/root/reference/data/iceberg/lineitem_iceberg"
    names = register_sql_views(spark, path, "li", allow_moved_paths=True)
    assert set(names) == {"li", "li_snapshots", "li_metadata", "li_history", "li_partitions", "li_files"}
    assert spark.sql("SELECT COUNT(*) AS n FROM li").first().n == 51793
    assert spark.sql("SELECT COUNT(*) AS n FROM li_snapshots").first().n == 2
    assert spark.sql("SELECT COUNT(*) AS n FROM li_files WHERE type = 'data'").first().n >= 1
    # time-travel registration
    register_sql_views(spark, path, "li_v1", snapshot_id=3776207205136740581, allow_moved_paths=True)
    assert spark.sql("SELECT COUNT(*) AS n FROM li_v1").first().n == 60175
    # views compose with plain SQL (join metadata to data counts)
    row = spark.sql(
        "SELECT SUM(record_count) AS rc FROM li_metadata WHERE status <> 'DELETED' AND content = 'EXISTING'"
    ).first()
    assert row.rc is None or row.rc >= 0


def test_register_sql_views_opts_forwarding(spark):
    """codec/time-travel/stray-mode opts must forward to ALL six
    views: gzip metadata + snapshot_id registration succeeds and
    every view answers SQL (reference SQL usage pins one version
    across scan+snapshots+metadata, test/sql/iceberg_scan.test)."""
    from duckdb_iceberg_spark import register_sql_views

    path = "/root/reference/data/iceberg/lineitem_iceberg_gz"
    names = register_sql_views(
        spark,
        path,
        "ligz",
        metadata_compression_codec="gzip",
        allow_moved_paths=True,
        mode="default",  # stray mode must not TypeError the _files view
    )
    for v in names:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {v}").first().n >= 0
    assert spark.sql("SELECT COUNT(*) AS n FROM ligz").first().n == 111968
    # snapshot pinning reaches data AND metadata views
    snaps = sorted(r.snapshot_id for r in spark.sql("SELECT snapshot_id FROM ligz_snapshots").collect())
    register_sql_views(
        spark,
        path,
        "ligz_v1",
        metadata_compression_codec="gzip",
        snapshot_id=snaps[0],
        allow_moved_paths=True,
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM ligz_v1").first().n > 0
    assert spark.sql("SELECT COUNT(*) AS n FROM ligz_v1_metadata").first().n > 0
    assert spark.sql("SELECT COUNT(*) AS n FROM ligz_v1_partitions").first().n >= 0


def test_time_as_string_rendering(spark, tmp_path):
    """Iceberg `time` columns (LONG micros — Spark has no TIME type)
    render as DuckDB-compatible HH:MM:SS[.ffffff] strings under
    time_as_string=True, cross-checked against DuckDB's own TIME
    formatting; the default scan keeps the sortable LONG."""
    import json

    import duckdb

    from duckdb_iceberg_spark import IcebergTable, iceberg_scan

    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "metadata"))
    doc = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": path,
        "last-sequence-number": 0,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "t", "required": False, "type": "time"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(doc, f)
    with open(os.path.join(path, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    micros = [45296000000, 45296500000, 3723123456, 0, None]
    rows = [(i, m) for i, m in enumerate(micros)]
    spark.createDataFrame(rows, "id long, t long").coalesce(1).write.parquet(
        str(tmp_path / "data")
    )
    t = IcebergTable(spark, path)
    t.add_files([str(p) for p in (tmp_path / "data").glob("*.parquet")])
    # default: physical LONG micros
    got_long = {r.id: r.t for r in iceberg_scan(spark, path).collect()}
    assert got_long == {i: m for i, m in enumerate(micros)}
    # formatted: equals DuckDB's TIME->VARCHAR for every value
    got_str = {r.id: r.t for r in iceberg_scan(spark, path, time_as_string=True).collect()}
    for i, m in enumerate(micros):
        if m is None:
            assert got_str[i] is None
        else:
            want = duckdb.sql(
                f"SELECT CAST((TIME '00:00:00' + to_microseconds({m})) AS VARCHAR)"
            ).fetchone()[0]
            assert got_str[i] == want, (m, got_str[i], want)


def test_zstandard_manifest_table_scans(spark, tmp_path):
    """Foreign-engine interop: copy the reference lineitem table,
    re-encode every Avro manifest + manifest list with the zstandard
    codec (what a zstd-configured Java/Flink writer emits), and assert
    the scan still matches the 51793 golden count (r7 VERDICT
    missing #3)."""
    import glob
    import json
    import shutil

    from duckdb_iceberg_spark.plans.avro import read_avro_file, write_avro_file

    dst = str(tmp_path / "lineitem_zstd")
    shutil.copytree(LI, dst)
    re_encoded = 0
    for avro_path in glob.glob(os.path.join(dst, "metadata", "*.avro")):
        meta, recs = read_avro_file(avro_path)
        schema = json.loads(meta["avro.schema"])
        extra = {
            k: v.decode() if isinstance(v, bytes) else v
            for k, v in meta.items()
            if k not in ("avro.schema", "avro.codec")
        }
        write_avro_file(avro_path, schema, recs, metadata=extra, codec="zstandard")
        re_encoded += 1
    assert re_encoded >= 3  # manifest lists + manifests
    df = iceberg_scan(spark, dst, allow_moved_paths=True)
    assert df.count() == 51793


def test_foreign_writer_eq_delete_table(spark, tmp_path):
    """Foreign-writer fixture (plans/foreign_fixture.py): pyiceberg-
    style metadata naming (version-guessed), zstandard manifests,
    mixed partition specs, percent-encoded partition dirs, inherited
    sequence numbers, and mid-history equality deletes. The
    percent-encoded dirs are a regression guard: Spark reports
    _metadata.file_path as a percent-encoded URI, and the seq/delete
    joins must compare RAW paths (caught by this fixture in r8)."""
    import duckdb

    from duckdb_iceberg_spark.plans.foreign_fixture import write_foreign_table

    src = "/root/testdata/sf0.001/part.parquet"
    path = str(tmp_path / "t")
    info = write_foreign_table(src, path)
    assert info["commit1_rows"] > 0
    df = iceberg_scan(spark, path, unsafe_enable_version_guessing=True)
    got = sorted((r.p_partkey, r.p_brand, r.p_size, float(r.p_retailprice)) for r in df.collect())
    want = sorted(
        (int(a), b, int(c), float(d))
        for a, b, c, d in duckdb.sql(
            f"""SELECT p_partkey, p_brand, p_size, p_retailprice
            FROM read_parquet('{src}')
            WHERE (p_partkey % 3 = 2)
               OR NOT (p_size IN (1,2,3,48,49,50) OR p_brand = 'Brand#33')"""
        ).fetchall()
    )
    assert got == want
    # snapshot listing exposes all four foreign commits
    snaps = iceberg_snapshots(spark, path, unsafe_enable_version_guessing=True).collect()
    assert [s.sequence_number for s in snaps] == [1, 2, 3, 4]
    # the Arrow executor-read path resolves the same table identically
    # (field-id parquet, percent-encoded dirs, seq-scoped eq deletes)
    arrow = iceberg_scan(
        spark, path, unsafe_enable_version_guessing=True, io="arrow"
    )
    got_arrow = sorted(
        (r.p_partkey, r.p_brand, r.p_size, float(r.p_retailprice))
        for r in arrow.collect()
    )
    assert got_arrow == got


def test_eq_delete_join_count_independent_of_file_count(spark, tmp_path):
    """Batched equality-delete application (r8 VERDICT #2): a table
    carrying MANY equality-delete files must still plan exactly ONE
    anti-join per distinct equality_ids group — plan size is
    O(groups), not O(files) — and the extra single-key delete files
    must apply with correct sequence scoping (commit-4 rows survive
    even when their keys appear in the seq-3 deletes)."""
    import duckdb

    from duckdb_iceberg_spark.plans.foreign_fixture import (
        DELETE_BRAND,
        DELETE_SIZES,
        write_foreign_table,
    )

    src = "/root/testdata/sf0.001/part.parquet"
    path = str(tmp_path / "t20")
    info = write_foreign_table(src, path, extra_eq_delete_files=20)
    keys = info["extra_eq_delete_keys"]
    assert len(keys) == 20 and all(k % 3 == 0 for k in keys)
    df = iceberg_scan(spark, path, unsafe_enable_version_guessing=True)
    # 3 equality_ids groups ([p_size], [p_brand], [p_partkey]) -> 3
    # anti-joins, though the keys arrive spread over 22 delete files
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") == 3, plan
    sizes = ",".join(map(str, DELETE_SIZES))
    in_keys = ",".join(map(str, keys))
    got = sorted((r.p_partkey, r.p_brand) for r in df.collect())
    want = sorted(
        (int(a), b)
        for a, b in duckdb.sql(
            f"""SELECT p_partkey, p_brand FROM read_parquet('{src}')
            WHERE (p_partkey % 3 = 2)
               OR (NOT (p_size IN ({sizes}) OR p_brand = '{DELETE_BRAND}')
                   AND p_partkey NOT IN ({in_keys}))"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_foreign_table_where_prunes_and_filters_exactly(spark, tmp_path):
    """`where=` over the foreign-written mixed-spec table: rows are
    exactly the filtered full scan, AND file pruning engages against
    the foreign manifests — identity-partition values on the spec-1
    entries and Appendix-D bounds on every entry (only the matching
    brand's spec-1 files plus the unpruneable spec-0 file survive)."""
    from duckdb_iceberg_spark.plans.foreign_fixture import write_foreign_table
    from duckdb_iceberg_spark.plans.manifests import load_table_scan
    from duckdb_iceberg_spark.plans.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.iceberg import (
        _predicate_to_pruners,
        _prune_by_partition,
        _prune_by_stats,
    )

    path = str(tmp_path / "t")
    write_foreign_table("/root/testdata/sf0.01/part.parquet", path)
    pred = "p_brand = 'Brand#11' AND p_partkey < 500"
    full = iceberg_scan(spark, path, unsafe_enable_version_guessing=True)
    pruned = iceberg_scan(
        spark, path, unsafe_enable_version_guessing=True, where=pred
    )
    got = sorted(map(tuple, pruned.collect()))
    want = sorted(map(tuple, full.filter(pred).collect()))
    assert got == want and len(got) > 0
    # file-level: the pruners keep strictly fewer data files
    meta = load_table_metadata(path, unsafe_enable_version_guessing=True)
    scan = load_table_scan(meta, meta.latest_snapshot(), path)
    entries = scan.data_files()
    stats_f, part_f, _checks = _predicate_to_pruners(meta, pred)
    kept = _prune_by_stats(meta, entries, stats_f)
    kept = _prune_by_partition(meta, kept, part_f, strict=False)
    assert len(kept) < len(entries) // 4, (len(kept), len(entries))


def test_v3_deletion_vectors_mixed_with_positional(spark, tmp_path):
    """Iceberg v3 deletion vectors (Puffin roaring blobs, fields
    143-145) applied together with a leftover v2 positional-delete
    parquet — the state of an upgraded table. The DV positions decode
    executor-side and feed the same (file_path, pos) anti-join as
    classic deletes."""
    import duckdb

    from duckdb_iceberg_spark.plans.foreign_fixture import DELETE_SIZES, write_dv_table
    from duckdb_iceberg_spark.plans.puffin import read_puffin_footer

    src = "/root/testdata/sf0.001/part.parquet"
    path = str(tmp_path / "dv")
    info = write_dv_table(src, path)
    g0, g1, g2 = info["groups"]
    dead = (
        {g0[i] for i in info["dv0_positions"]}
        | {g1[i] for i in info["dv1_positions"]}
        | set(g2[-3:])
    )
    df = iceberg_scan(spark, path)
    got = sorted(r.p_partkey for r in df.collect())
    want = sorted(k for ks in info["groups"] for k in ks if k not in dead)
    assert got == want and 0 < len(got) < info["n_rows"]
    # the file-0 DV targets exactly the p_size predicate rows
    sizes = ",".join(map(str, DELETE_SIZES))
    n_sized = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{src}') "
        f"WHERE p_partkey % 3 = 0 AND p_size IN ({sizes})"
    ).fetchone()[0]
    assert len(info["dv0_positions"]) == n_sized > 0
    # list_files exposes the puffin once + the parquet delete
    lf = iceberg_scan(spark, path, mode="list_files").collect()
    deletes = [r.file for r in lf if r.type == "delete"]
    assert len(deletes) == 2 and sum(f.endswith(".puffin") for f in deletes) == 1
    # the puffin footer itself parses and declares both DV blobs
    foot = read_puffin_footer(next(f for f in deletes if f.endswith(".puffin")))
    assert [b["type"] for b in foot["blobs"]] == ["deletion-vector-v1"] * 2
    assert sorted(int(b["properties"]["cardinality"]) for b in foot["blobs"]) == sorted(
        [len(info["dv0_positions"]), len(info["dv1_positions"])]
    )


def test_v3_deletion_vectors_arrow_path(spark, tmp_path):
    """io='arrow' applies v3 deletion vectors in-reader (decode via
    plans/fs.read_range + the portable-roaring codec, merged with any
    classic positional deletes for the same file) — byte-identical
    rows to the default JVM path on the mixed DV + positional-delete
    fixture."""
    from duckdb_iceberg_spark.plans.foreign_fixture import write_dv_table

    path = str(tmp_path / "dv_arrow")
    write_dv_table("/root/testdata/sf0.001/part.parquet", path)
    cols = ["p_partkey", "p_brand", "p_size", "p_retailprice"]
    jvm = sorted(map(tuple, iceberg_scan(spark, path).select(cols).collect()))
    arw = sorted(map(tuple, iceberg_scan(spark, path, io="arrow").select(cols).collect()))
    assert jvm == arw and len(jvm) > 0


def test_mixed_format_data_files(spark, tmp_path):
    """One Iceberg table, three data-file formats: parquet (native),
    ORC (spark.read.orc), AVRO (pure-Python codec, executor-side).
    The reference parses file_format but assumes PARQUET and would
    mis-read this table. Positional deletes compose with AVRO files
    (positions synthesized from record order); with ORC files present
    a position-needing scan fails diagnosably instead of mis-reading;
    io='arrow' rejects non-parquet."""
    import glob

    import pytest

    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.plans.avro import write_avro_file
    from duckdb_iceberg_spark.writer import IcebergTable

    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "t")
    t = IcebergTable.create(spark, path, n.filter("n_nationkey < 10"))
    # ORC part: rows 10-17
    orc_dir = str(tmp_path / "orc")
    n.filter("n_nationkey >= 10 AND n_nationkey < 18").coalesce(1).write.orc(orc_dir)
    orc_file = glob.glob(orc_dir + "/part-*.orc")[0]
    t = IcebergTable(spark, path)
    t.add_files([orc_file], file_format="ORC")
    # AVRO part: rows 18-24, written by the pure-Python codec
    avro_schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "n_nationkey", "type": "int"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "int"},
        ],
    }
    recs = [
        {"n_nationkey": r.n_nationkey, "n_name": r.n_name, "n_regionkey": r.n_regionkey}
        for r in n.filter("n_nationkey >= 18").orderBy("n_nationkey").collect()
    ]
    avro_file = str(tmp_path / "tail.avro")
    write_avro_file(avro_file, avro_schema, recs)
    t = IcebergTable(spark, path)
    t.add_files([avro_file], file_format="AVRO")
    got = {
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in iceberg_scan(spark, path).collect()
    }
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in n.collect()}
    assert got == want
    lf = iceberg_scan(spark, path, mode="list_files").collect()
    assert {r.file for r in lf} >= {orc_file, avro_file}
    # ORC + row positions: diagnosable, not silent mis-read
    with pytest.raises(ValueError, match="ORC data file"):
        IcebergTable(spark, path).delete_where("n_nationkey = 1")
    with pytest.raises(ValueError, match="only PARQUET"):
        iceberg_scan(spark, path, io="arrow").collect()

    # parquet+avro only: MoR deletes work across both formats
    p2 = str(tmp_path / "t2")
    t2 = IcebergTable.create(spark, p2, n.filter("n_nationkey < 18"))
    t2 = IcebergTable(spark, p2)
    t2.add_files([avro_file], file_format="AVRO")
    t2 = IcebergTable(spark, p2)
    t2.delete_where("n_nationkey IN (3, 20)")  # one per format
    got2 = sorted(r.n_nationkey for r in iceberg_scan(spark, p2).collect())
    assert got2 == sorted(k for k in range(25) if k not in (3, 20))
