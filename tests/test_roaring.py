"""Property tests for the roaring-bitmap / Puffin DV codec
(plans/roaring.py, plans/puffin.py — Iceberg v3 deletion vectors)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark.plans.roaring import (
    _deserialize_rb32,
    _serialize_rb32,
    decode_dv_blob,
    deserialize_portable64,
    encode_dv_blob,
    serialize_portable64,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_portable64_roundtrip(vals):
    want = np.unique(np.array(vals, dtype=np.uint64)) if vals else np.empty(0, dtype=np.uint64)
    got = deserialize_portable64(serialize_portable64(vals))
    assert np.array_equal(got, want)
    assert np.array_equal(decode_dv_blob(encode_dv_blob(vals)), want)


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_rb32_dense_bucket_roundtrip(data):
    """Cardinalities straddling the array/bitmap container boundary
    (4096) and multiple 16-bit buckets."""
    n = data.draw(st.integers(min_value=4000, max_value=9000))
    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.RandomState(seed)
    vals = np.unique(rng.randint(0, 1 << 18, n).astype(np.uint32))
    buf = _serialize_rb32(vals)
    got, pos = _deserialize_rb32(buf, 0)
    assert pos == len(buf)
    assert np.array_equal(got, vals)


def test_dv_blob_rejects_corruption():
    blob = bytearray(encode_dv_blob([1, 2, 3]))
    blob[12] ^= 0xFF  # flip a vector byte (past the magic) -> CRC catches it
    with pytest.raises(ValueError, match="CRC"):
        decode_dv_blob(bytes(blob))
    blob2 = bytearray(encode_dv_blob([1]))
    blob2[4:8] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="magic"):
        decode_dv_blob(bytes(blob2))


def test_dv_positions_msb_guard():
    with pytest.raises(ValueError, match="63 bits"):
        serialize_portable64([1 << 63])


def test_puffin_footer_roundtrip(tmp_path):
    from duckdb_iceberg_spark.plans.puffin import read_puffin_footer, write_puffin_dv_file

    p = str(tmp_path / "x.puffin")
    info = write_puffin_dv_file(p, {"/data/a.parquet": [1, 5, 9], "/data/b.parquet": range(100)})
    foot = read_puffin_footer(p)
    assert len(foot["blobs"]) == 2
    by_ref = {b["properties"]["referenced-data-file"]: b for b in foot["blobs"]}
    for ref, (off, size, card) in info.items():
        assert by_ref[ref]["offset"] == off and by_ref[ref]["length"] == size
        assert int(by_ref[ref]["properties"]["cardinality"]) == card
        with open(p, "rb") as fh:
            fh.seek(off)
            assert decode_dv_blob(fh.read(size)).size == card


def test_dv_blob_rejects_truncation():
    """Truncated/empty blobs (e.g. a null content_size_in_bytes read 0
    bytes) must raise a diagnosable ValueError, not struct.error."""
    with pytest.raises(ValueError, match="truncated"):
        decode_dv_blob(b"")
    whole = encode_dv_blob([1, 2, 3])
    with pytest.raises(ValueError, match="truncated"):
        decode_dv_blob(whole[: len(whole) - 2])  # CRC cut off
    with pytest.raises(ValueError, match="truncated"):
        decode_dv_blob(whole[:6])  # mid-payload
