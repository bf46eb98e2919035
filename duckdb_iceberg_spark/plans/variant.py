"""Parquet Variant binary encoding — pure-Python codec.

The open Variant spec (parquet-format VariantEncoding.md /
VariantShredding.md; the same lineage Spark 4's VariantType and
Iceberg v3's `variant` implement) stores a value as two binaries:

- ``metadata``: version header + dictionary of the object keys used
  anywhere in the value,
- ``value``: a tagged tree — first byte's low 2 bits select the
  basic type (0 primitive, 1 short string, 2 object, 3 array), the
  high 6 bits carry the type info / sizes.

This module decodes that format to plain Python values and encodes
Python values back, plus :func:`reassemble_shredded` — the
shredding spec's reader algorithm that merges a shredded parquet
group (``metadata`` / residual ``value`` / ``typed_value`` subtree)
back into one canonical ``value`` binary.

Constants were pinned against Spark 4.1's own encoder output
(``parse_json`` → ``VariantVal.value/metadata``) in
tests/test_variant_codec.py, so the codec is drop-in compatible with
what the writer persists and what strict readers expect. Decimal
values decode to :class:`decimal.Decimal`; date/timestamp to
datetime types (timestamp type 12 is UTC-adjusted per spec and
surfaces as tz-aware).
"""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal
from typing import Any, Optional

_EPOCH = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)
_EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


# -- metadata ---------------------------------------------------------------


def decode_metadata(meta: bytes) -> list[str]:
    """Metadata dictionary -> ordered key list (index == field id)."""
    if not meta:
        raise ValueError("empty variant metadata")
    header = meta[0]
    if header & 0x0F != 1:
        raise ValueError(f"unsupported variant metadata version {header & 0x0F}")
    off_size = ((header >> 6) & 0b11) + 1
    pos = 1

    def read_uint(p: int) -> int:
        return int.from_bytes(meta[p : p + off_size], "little")

    n = read_uint(pos)
    pos += off_size
    offsets = [read_uint(pos + i * off_size) for i in range(n + 1)]
    base = pos + (n + 1) * off_size
    return [meta[base + offsets[i] : base + offsets[i + 1]].decode("utf-8") for i in range(n)]


def encode_metadata(keys: list[str]) -> bytes:
    """Ordered key list -> metadata binary (version 1)."""
    blobs = [k.encode("utf-8") for k in keys]
    total = sum(len(b) for b in blobs)
    off_size = 1 if max(total, len(blobs)) < 256 else (2 if max(total, len(blobs)) < 65536 else 3)
    out = bytearray([0x01 | ((off_size - 1) << 6)])
    out += len(blobs).to_bytes(off_size, "little")
    acc = 0
    offs = [0]
    for b in blobs:
        acc += len(b)
        offs.append(acc)
    for o in offs:
        out += o.to_bytes(off_size, "little")
    for b in blobs:
        out += b
    return bytes(out)


# -- value decode -----------------------------------------------------------

# basic_type 0 primitive type_info ids (spec Variant encoding table)
_P_NULL = 0
_P_TRUE = 1
_P_FALSE = 2
_P_INT8 = 3
_P_INT16 = 4
_P_INT32 = 5
_P_INT64 = 6
_P_DOUBLE = 7
_P_DECIMAL4 = 8
_P_DECIMAL8 = 9
_P_DECIMAL16 = 10
_P_DATE = 11
_P_TIMESTAMP = 12  # micros, UTC-adjusted
_P_TIMESTAMP_NTZ = 13  # micros
_P_FLOAT = 14
_P_BINARY = 15
_P_STRING = 16


def decode_value(value: bytes, keys: list[str]) -> Any:
    """Value binary -> Python value (dicts/lists/scalars)."""
    v, _n = _decode_at(value, 0, keys)
    return v


def _decode_at(buf: bytes, pos: int, keys: list[str]) -> tuple[Any, int]:
    header = buf[pos]
    basic = header & 0b11
    info = header >> 2
    if basic == 1:  # short string
        ln = info
        s = buf[pos + 1 : pos + 1 + ln].decode("utf-8")
        return s, pos + 1 + ln
    if basic == 0:  # primitive
        p = pos + 1
        if info == _P_NULL:
            return None, p
        if info == _P_TRUE:
            return True, p
        if info == _P_FALSE:
            return False, p
        if info == _P_INT8:
            return int.from_bytes(buf[p : p + 1], "little", signed=True), p + 1
        if info == _P_INT16:
            return int.from_bytes(buf[p : p + 2], "little", signed=True), p + 2
        if info == _P_INT32:
            return int.from_bytes(buf[p : p + 4], "little", signed=True), p + 4
        if info == _P_INT64:
            return int.from_bytes(buf[p : p + 8], "little", signed=True), p + 8
        if info == _P_DOUBLE:
            return struct.unpack_from("<d", buf, p)[0], p + 8
        if info == _P_FLOAT:
            return struct.unpack_from("<f", buf, p)[0], p + 4
        if info in (_P_DECIMAL4, _P_DECIMAL8, _P_DECIMAL16):
            scale = buf[p]
            width = {_P_DECIMAL4: 4, _P_DECIMAL8: 8, _P_DECIMAL16: 16}[info]
            unscaled = int.from_bytes(buf[p + 1 : p + 1 + width], "little", signed=True)
            return Decimal(unscaled).scaleb(-scale), p + 1 + width
        if info == _P_DATE:
            days = int.from_bytes(buf[p : p + 4], "little", signed=True)
            return _EPOCH + datetime.timedelta(days=days), p + 4
        if info == _P_TIMESTAMP:
            us = int.from_bytes(buf[p : p + 8], "little", signed=True)
            return _EPOCH_UTC + datetime.timedelta(microseconds=us), p + 8
        if info == _P_TIMESTAMP_NTZ:
            us = int.from_bytes(buf[p : p + 8], "little", signed=True)
            return _EPOCH_TS + datetime.timedelta(microseconds=us), p + 8
        if info == _P_BINARY:
            ln = int.from_bytes(buf[p : p + 4], "little")
            return bytes(buf[p + 4 : p + 4 + ln]), p + 4 + ln
        if info == _P_STRING:
            ln = int.from_bytes(buf[p : p + 4], "little")
            return buf[p + 4 : p + 4 + ln].decode("utf-8"), p + 4 + ln
        raise ValueError(f"unsupported variant primitive type {info}")
    if basic == 2:  # object
        foff_size = (info & 0b11) + 1
        fid_size = ((info >> 2) & 0b11) + 1
        is_large = (info >> 4) & 0b1
        p = pos + 1
        n = int.from_bytes(buf[p : p + (4 if is_large else 1)], "little")
        p += 4 if is_large else 1
        fids = [int.from_bytes(buf[p + i * fid_size : p + (i + 1) * fid_size], "little") for i in range(n)]
        p += n * fid_size
        offs = [
            int.from_bytes(buf[p + i * foff_size : p + (i + 1) * foff_size], "little")
            for i in range(n + 1)
        ]
        p += (n + 1) * foff_size
        out = {}
        for i in range(n):
            v, _ = _decode_at(buf, p + offs[i], keys)
            out[keys[fids[i]]] = v
        return out, p + offs[n]
    # basic == 3: array
    off_size = (info & 0b11) + 1
    is_large = (info >> 2) & 0b1
    p = pos + 1
    n = int.from_bytes(buf[p : p + (4 if is_large else 1)], "little")
    p += 4 if is_large else 1
    offs = [
        int.from_bytes(buf[p + i * off_size : p + (i + 1) * off_size], "little")
        for i in range(n + 1)
    ]
    p += (n + 1) * off_size
    items = [_decode_at(buf, p + offs[i], keys)[0] for i in range(n)]
    return items, p + offs[n]


# -- value encode -----------------------------------------------------------


def _collect_keys(v: Any, keys: list[str], seen: dict) -> None:
    if isinstance(v, dict):
        for k, x in v.items():
            if k not in seen:
                seen[k] = len(keys)
                keys.append(k)
            _collect_keys(x, keys, seen)
    elif isinstance(v, (list, tuple)):
        for x in v:
            _collect_keys(x, keys, seen)


def encode_variant(v: Any) -> tuple[bytes, bytes]:
    """Python value -> (metadata, value) pair, building the key
    dictionary from the value's own object keys."""
    keys: list[str] = []
    seen: dict = {}
    _collect_keys(v, keys, seen)
    return encode_metadata(keys), encode_value(v, seen)


def _int_bytes(i: int) -> tuple[int, int]:
    if -(2**7) <= i < 2**7:
        return _P_INT8, 1
    if -(2**15) <= i < 2**15:
        return _P_INT16, 2
    if -(2**31) <= i < 2**31:
        return _P_INT32, 4
    return _P_INT64, 8


def encode_value(v: Any, key_to_id: dict) -> bytes:
    """Python value -> value binary under an existing key dictionary."""
    if v is None:
        return bytes([_P_NULL << 2])
    if v is True:
        return bytes([_P_TRUE << 2])
    if v is False:
        return bytes([_P_FALSE << 2])
    if isinstance(v, int):
        t, w = _int_bytes(v)
        return bytes([t << 2]) + v.to_bytes(w, "little", signed=True)
    if isinstance(v, float):
        return bytes([_P_DOUBLE << 2]) + struct.pack("<d", v)
    if isinstance(v, Decimal):
        sign, digits, exp = v.as_tuple()
        scale = max(0, -exp)
        unscaled = int(v.scaleb(scale))
        for t, w in ((_P_DECIMAL4, 4), (_P_DECIMAL8, 8), (_P_DECIMAL16, 16)):
            if -(2 ** (8 * w - 1)) <= unscaled < 2 ** (8 * w - 1):
                return bytes([t << 2, scale]) + unscaled.to_bytes(w, "little", signed=True)
        raise ValueError(f"decimal out of range: {v}")
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) < 64:
            return bytes([(len(b) << 2) | 0b01]) + b
        return bytes([_P_STRING << 2]) + len(b).to_bytes(4, "little") + b
    if isinstance(v, (bytes, bytearray)):
        return bytes([_P_BINARY << 2]) + len(v).to_bytes(4, "little") + bytes(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            us = round((v - _EPOCH_UTC).total_seconds() * 1e6)
            return bytes([_P_TIMESTAMP << 2]) + int(us).to_bytes(8, "little", signed=True)
        us = round((v - _EPOCH_TS).total_seconds() * 1e6)
        return bytes([_P_TIMESTAMP_NTZ << 2]) + int(us).to_bytes(8, "little", signed=True)
    if isinstance(v, datetime.date):
        days = (v - _EPOCH).days
        return bytes([_P_DATE << 2]) + days.to_bytes(4, "little", signed=True)
    if isinstance(v, dict):
        items = [(key_to_id[k], encode_value(x, key_to_id)) for k, x in v.items()]
        # spec: object fields sorted by field NAME for canonical form
        id_to_key = {i: k for k, i in key_to_id.items()}
        items.sort(key=lambda t: id_to_key[t[0]])
        n = len(items)
        payload = b"".join(b for _i, b in items)
        offs = [0]
        for _i, b in items:
            offs.append(offs[-1] + len(b))
        fid_size = _size_for(max((i for i, _b in items), default=0))
        foff_size = _size_for(offs[-1])
        is_large = 1 if n > 255 else 0
        header = 0b10 | ((foff_size - 1) << 2) | ((fid_size - 1) << 4) | (is_large << 6)
        out = bytearray([header])
        out += n.to_bytes(4 if is_large else 1, "little")
        for i, _b in items:
            out += i.to_bytes(fid_size, "little")
        for o in offs:
            out += o.to_bytes(foff_size, "little")
        out += payload
        return bytes(out)
    if isinstance(v, (list, tuple)):
        blobs = [encode_value(x, key_to_id) for x in v]
        offs = [0]
        for b in blobs:
            offs.append(offs[-1] + len(b))
        off_size = _size_for(offs[-1])
        n = len(blobs)
        is_large = 1 if n > 255 else 0
        header = 0b11 | ((off_size - 1) << 2) | (is_large << 4)
        out = bytearray([header])
        out += n.to_bytes(4 if is_large else 1, "little")
        for o in offs:
            out += o.to_bytes(off_size, "little")
        out += b"".join(blobs)
        return bytes(out)
    raise ValueError(f"cannot encode {type(v).__name__} as variant")


def _size_for(maxval: int) -> int:
    if maxval < 256:
        return 1
    if maxval < 65536:
        return 2
    if maxval < 2**24:
        return 3
    return 4


# -- shredded read (VariantShredding.md reader algorithm) -------------------


def reassemble_shredded(
    metadata: bytes, value: Optional[bytes], typed_value: Any
) -> bytes:
    """Merge one row of a shredded variant parquet group back into a
    single canonical ``value`` binary.

    ``typed_value`` is the row's typed subtree as plain Python (e.g.
    from an Arrow struct -> ``.to_pylist()``): an object shreds to
    ``{field: {"value": bytes|None, "typed_value": ...}}``, an array
    to a list of such groups, a scalar to the native value. Per spec:
    a field's ``typed_value`` wins when present, else its residual
    ``value`` binary, else the field is absent; residual top-level
    ``value`` fields merge alongside. The result reuses the row's
    existing metadata dictionary (writers must register every key in
    it, shredded or not)."""
    keys = decode_metadata(metadata)
    key_to_id = {k: i for i, k in enumerate(keys)}
    merged = _merge_shredded(value, typed_value, keys)
    return encode_value(merged, key_to_id)


def _merge_shredded(value: Optional[bytes], typed_value: Any, keys: list[str]) -> Any:
    if typed_value is None:
        if value is None:
            return None
        return decode_value(bytes(value), keys)
    if isinstance(typed_value, dict) and typed_value and all(
        isinstance(g, (dict, type(None))) and (g is None or set(g) <= {"value", "typed_value"})
        for g in typed_value.values()
    ):
        # object shredding: each field is a (value, typed_value) group
        out = {}
        if value is not None:
            resid = decode_value(bytes(value), keys)
            if isinstance(resid, dict):
                out.update(resid)
        for fname, group in typed_value.items():
            if group is None:
                continue
            tv = group.get("typed_value")
            fv = group.get("value")
            if tv is not None:
                out[fname] = _merge_shredded(None, tv, keys) if isinstance(tv, (dict, list)) else tv
            elif fv is not None:
                out[fname] = decode_value(bytes(fv), keys)
        return out
    if isinstance(typed_value, list):
        items = []
        for group in typed_value:
            if isinstance(group, dict) and set(group) <= {"value", "typed_value"}:
                tv, fv = group.get("typed_value"), group.get("value")
                if tv is not None:
                    items.append(_merge_shredded(None, tv, keys) if isinstance(tv, (dict, list)) else tv)
                elif fv is not None:
                    items.append(decode_value(bytes(fv), keys))
                else:
                    items.append(None)
            else:
                items.append(group)
        return items
    # scalar shredding: the typed value IS the value
    return typed_value
