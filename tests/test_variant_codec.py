"""plans/variant: pure-Python Parquet-Variant codec, pinned against
Spark 4's own encoder (parse_json -> VariantVal binaries) plus
encode/decode round trips and the shredded-read merge."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark.plans.variant import (
    decode_metadata,
    decode_value,
    encode_metadata,
    encode_value,
    encode_variant,
    reassemble_shredded,
)


def _spark_variant(spark, sql_expr: str):
    v = spark.sql(f"SELECT {sql_expr} AS v").collect()[0].v
    return bytes(v.metadata), bytes(v.value)


@pytest.mark.parametrize(
    "expr,want",
    [
        ("parse_json('null')", None),
        ("parse_json('true')", True),
        ("parse_json('false')", False),
        ("parse_json('42')", 42),
        ("parse_json('-129')", -129),
        ("parse_json('123456789012')", 123456789012),
        ("parse_json('1.5')", Decimal("1.5")),
        ('parse_json(\'"hello"\')', "hello"),
        ("parse_json('[1, 2, 3]')", [1, 2, 3]),
        (
            'parse_json(\'{"a": 3, "b": "x", "c": [true, null], "d": {"e": 1.25}}\')',
            {"a": 3, "b": "x", "c": [True, None], "d": {"e": Decimal("1.25")}},
        ),
    ],
)
def test_decode_matches_spark_encoder(spark, expr, want):
    meta, val = _spark_variant(spark, expr)
    keys = decode_metadata(meta)
    assert decode_value(val, keys) == want


def test_decode_temporal_types(spark):
    meta, val = _spark_variant(
        spark,
        "to_variant_object(named_struct("
        "'d', DATE'2024-01-02', "
        "'ts', TIMESTAMP_NTZ'2024-01-02 03:04:05.123456'))",
    )
    got = decode_value(val, decode_metadata(meta))
    assert got["d"] == datetime.date(2024, 1, 2)
    assert got["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)


@pytest.mark.parametrize(
    "v",
    [
        None,
        True,
        False,
        0,
        -1,
        127,
        -128,
        32767,
        2**31,
        -(2**40),
        1.5,
        Decimal("123.456"),
        "",
        "short",
        "x" * 100,
        b"\x00\xff bytes",
        datetime.date(1969, 12, 31),
        datetime.datetime(2024, 6, 1, 12, 0, 0, 5),
        [1, "two", None, [True]],
        {"k": 1, "nested": {"a": [1, 2], "b": "s"}, "empty": {}},
        {},
        [],
    ],
)
def test_encode_decode_roundtrip(v):
    meta, val = encode_variant(v)
    assert decode_value(val, decode_metadata(meta)) == v


def test_own_encoding_readable_by_metadata_reuse():
    """encode_value under an existing dictionary (the shredded-merge
    path) produces bytes decode_value reads back under that same
    dictionary."""
    keys = ["a", "b", "z"]
    meta = encode_metadata(keys)
    assert decode_metadata(meta) == keys
    v = {"z": [1, {"a": "deep"}], "b": None}
    blob = encode_value(v, {k: i for i, k in enumerate(keys)})
    assert decode_value(blob, keys) == v


def test_object_fields_sorted_by_name():
    """Spec: object fields are laid out in lexicographic key order —
    insertion order must not leak into the binary."""
    m1, v1 = encode_variant({"b": 1, "a": 2})
    m2, v2 = encode_variant({"a": 2, "b": 1})
    # dictionaries differ (collection order) but each decodes equal
    assert decode_value(v1, decode_metadata(m1)) == decode_value(v2, decode_metadata(m2))


def test_reassemble_shredded_object():
    """The shredding-spec reader merge: typed_value wins, residual
    value fields merge in, absent groups drop out."""
    keys = ["a", "b", "c"]
    meta = encode_metadata(keys)
    kid = {k: i for i, k in enumerate(keys)}
    residual = encode_value({"c": "resid"}, kid)
    typed = {
        "a": {"value": None, "typed_value": 7},
        "b": {"value": encode_value([1, 2], kid), "typed_value": None},
    }
    out = reassemble_shredded(meta, residual, typed)
    assert decode_value(out, keys) == {"a": 7, "b": [1, 2], "c": "resid"}


def test_reassemble_scalar_and_missing():
    meta = encode_metadata([])
    assert decode_value(reassemble_shredded(meta, None, 42), []) == 42
    blob = encode_value("plain", {})
    assert decode_value(reassemble_shredded(meta, blob, None), []) == "plain"
