"""Minimal protobuf (proto3) wire-format codec, descriptor-driven.

The container has no ``grpcio``/``protobuf`` packages, so the gRPC-Web
surface (``conduit_spark.grpc_web``) hand-rolls the public protobuf
encoding (developers.google.com/protocol-buffers/docs/encoding):
varint tags ``(field_number << 3) | wire_type``, VARINT scalars,
length-delimited strings/bytes/sub-messages, maps as repeated
``{1: key, 2: value}`` entry messages. Only the subset the reference's
``api.proto`` needs is implemented: no groups, no packed repeated
scalars (the API messages have none), 32/64-bit fixed fields are
skipped on decode (none are emitted).

Descriptors are plain dicts: ``{field_number: (name, kind[, sub])}``
where ``kind`` is one of ``string bytes uint64 int64 bool enum
message map`` with a trailing ``*`` marking a repeated field
(``"string*"``, ``"message*"``). ``sub`` is the nested descriptor for
``message`` kinds, and the ``(key_kind, value_kind)`` pair for maps.

proto3 semantics honored: zero values are not serialized; unknown
fields are skipped, not errors (forward compatibility); absent fields
decode to None/[]/{} via :func:`decode`'s defaults argument.
"""

from __future__ import annotations

__all__ = ["encode", "decode", "encode_varint", "decode_varint"]

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

_SCALAR_WT = {
    "string": _WT_LEN,
    "bytes": _WT_LEN,
    "message": _WT_LEN,
    "map": _WT_LEN,
    "uint64": _WT_VARINT,
    "int64": _WT_VARINT,
    "int32": _WT_VARINT,  # same varint encoding (negatives sign-extend)
    "bool": _WT_VARINT,
    "enum": _WT_VARINT,
}


def encode_varint(n: int) -> bytes:
    if n < 0:  # int64 negatives: two's-complement 64-bit, 10-byte varint
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _tag(num: int, wt: int) -> bytes:
    return encode_varint((num << 3) | wt)


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def _enc_one(kind: str, sub, v) -> bytes:
    if kind == "string":
        b = str(v).encode("utf-8")
        return encode_varint(len(b)) + b
    if kind == "bytes":
        b = bytes(v)
        return encode_varint(len(b)) + b
    if kind == "message":
        b = encode(sub, v)
        return encode_varint(len(b)) + b
    if kind in ("uint64", "int64", "int32", "enum"):
        return encode_varint(int(v))
    if kind == "bool":
        return encode_varint(1 if v else 0)
    raise ValueError(f"unknown kind {kind!r}")


def encode(desc: dict, obj: dict | None) -> bytes:
    """Serialize ``obj`` per ``desc``; proto3 default values (0, "",
    b"", False, [], {}, None) are omitted."""
    out = bytearray()
    for num, spec in sorted(desc.items()):
        name, kind = spec[0], spec[1]
        sub = spec[2] if len(spec) > 2 else None
        repeated = kind.endswith("*")
        kind = kind.rstrip("*")
        v = (obj or {}).get(name)
        if v is None:
            continue
        if kind == "map":
            kk, vk = sub
            # message-valued maps: vk is ("message", value_descriptor)
            vkind, vsub = vk if isinstance(vk, tuple) else (vk, None)
            for mk in sorted(v):  # sorted → canonical bytes
                entry = (
                    _tag(1, _SCALAR_WT[kk]) + _enc_one(kk, None, mk)
                    + _tag(2, _SCALAR_WT[vkind])
                    + _enc_one(vkind, vsub, v[mk])
                )
                out += _tag(num, _WT_LEN) + encode_varint(len(entry)) + entry
            continue
        vals = v if repeated else [v]
        for item in vals:
            if not repeated:  # proto3: scalar zero values not serialized
                if kind in ("uint64", "int64", "int32", "enum") and int(item) == 0:
                    continue
                if kind == "bool" and not item:
                    continue
                if kind == "string" and item == "":
                    continue
                if kind == "bytes" and not item:
                    continue
            out += _tag(num, _SCALAR_WT[kind]) + _enc_one(kind, sub, item)
    return bytes(out)


def _skip(buf: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = decode_varint(buf, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_I32:
        return pos + 4
    if wt == _WT_LEN:
        n, pos = decode_varint(buf, pos)
        return pos + n
    raise ValueError(f"unsupported wire type {wt}")


def decode(desc: dict, buf: bytes) -> dict:
    """Parse ``buf`` per ``desc`` → dict. Repeated fields default to
    ``[]``, maps to ``{}``, scalars to proto3 zero values, nested
    messages to ``None`` when absent."""
    out: dict = {}
    for spec in desc.values():
        name, kind = spec[0], spec[1]
        if kind.endswith("*"):
            out[name] = []
        elif kind == "map":
            out[name] = {}
        elif kind == "message":
            out[name] = None
        elif kind in ("uint64", "int64", "int32", "enum"):
            out[name] = 0
        elif kind == "bool":
            out[name] = False
        elif kind == "bytes":
            out[name] = b""
        else:
            out[name] = ""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = decode_varint(buf, pos)
        num, wt = tag >> 3, tag & 0x7
        spec = desc.get(num)
        if spec is None:
            pos = _skip(buf, pos, wt)
            continue
        name, kind = spec[0], spec[1]
        sub = spec[2] if len(spec) > 2 else None
        repeated = kind.endswith("*")
        kind = kind.rstrip("*")
        if kind in ("uint64", "int64", "int32", "enum", "bool"):
            raw, pos = decode_varint(buf, pos)
            val = (
                bool(raw) if kind == "bool"
                else _signed64(raw) if kind in ("int64", "int32")
                else raw
            )
        elif kind in ("string", "bytes", "message", "map"):
            ln, pos = decode_varint(buf, pos)
            chunk = buf[pos : pos + ln]
            pos += ln
            if kind == "string":
                val = chunk.decode("utf-8")
            elif kind == "bytes":
                val = bytes(chunk)
            elif kind == "message":
                val = decode(sub, chunk)
            else:  # map entry
                kk, vk = sub
                vspec = (
                    ("value",) + vk if isinstance(vk, tuple) else ("value", vk)
                )
                entry = decode({1: ("key", kk), 2: vspec}, chunk)
                out[name][entry["key"]] = entry["value"]
                continue
        else:
            raise ValueError(f"unknown kind {kind!r}")
        if repeated:
            out[name].append(val)
        else:
            out[name] = val
    return out
