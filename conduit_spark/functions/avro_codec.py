"""Minimal pure-Python Avro binary codec.

The container has no spark-avro jar and no fastavro, but the reference
ships a working Avro wire format (impl/avro/encode.go:135-206,
impl/avro/decode.go:114-166, Confluent framing in its schema registry),
so ``avro.encode``/``avro.decode`` must actually encode — not stay
import-gated. This implements the Avro 1.11 binary spec subset that the
registry's inferred schemas (schema_registry.struct_to_avro_schema) and
typical CDC payloads use:

  null, boolean, int, long (zigzag varint), float, double (IEEE LE),
  bytes, string (varint length + data), record, array, map (blocked),
  unions, enum (symbol index), fixed (raw bytes), and the
  timestamp-micros/millis and decimal (two's-complement big-endian
  unscaled, bytes or fixed carrier) logical types.

Runs inside mapInPandas/Arrow batches — per-record Python, but only on
the explicitly-requested avro codec path (the same boundary the
reference draws: its Avro codec is also per-record Go). The JVM
spark-avro functions remain the preferred fast path when the jar is on
the classpath (codec_ops._avro_funcs).
"""

from __future__ import annotations

import datetime
import io
import json
import struct


class AvroTypeError(TypeError):
    pass


def parse_schema(schema_json: str | dict) -> dict | list | str:
    return (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )


# ---- primitives ----------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def varint_bytes(n: int) -> bytes:
    """Zigzag varint of ``n`` as bytes (exposed for SQL-oracle parity
    checks that rebuild small varints with chr()/concat)."""
    buf = io.BytesIO()
    write_long(buf, n)
    return buf.getvalue()


# ---- schema-directed encode ---------------------------------------------


def _ts_micros(v) -> int:
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        delta = v - datetime.datetime(1970, 1, 1)
        return (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
    return int(v)


def encode_value(buf: io.BytesIO, schema, v) -> None:
    if isinstance(schema, list):  # union: long index + value
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                write_long(buf, i)
                encode_value(buf, branch, v)
                return
        raise AvroTypeError(f"value {v!r} matches no union branch {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis") and t == "long":
            n = _ts_micros(v)
            write_long(buf, n if logical == "timestamp-micros" else n // 1000)
            return
        if logical == "decimal" and t in ("bytes", "fixed"):
            # two's-complement big-endian unscaled value (Avro spec)
            import decimal as _decimal

            scale = int(schema.get("scale", 0))
            unscaled = int(
                (_decimal.Decimal(str(v)) * (10**scale)).to_integral_value(
                    rounding=_decimal.ROUND_HALF_UP
                )
            )
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            if t == "fixed":
                size = int(schema["size"])
                pad = b"\xff" if unscaled < 0 else b"\x00"
                raw = pad * (size - len(raw)) + raw
                buf.write(raw)
            else:
                write_long(buf, len(raw))
                buf.write(raw)
            return
        if t == "enum":
            symbols = schema["symbols"]
            try:
                write_long(buf, symbols.index(v))
            except ValueError:
                raise AvroTypeError(
                    f"{v!r} not in enum {schema.get('name')} {symbols}"
                ) from None
            return
        if t == "fixed":
            raw = bytes(v)
            if len(raw) != int(schema["size"]):
                raise AvroTypeError(
                    f"fixed {schema.get('name')} needs {schema['size']} "
                    f"bytes, got {len(raw)}"
                )
            buf.write(raw)
            return
        if t == "record":
            for f in schema["fields"]:
                encode_value(buf, f["type"], None if v is None else v.get(f["name"]))
            return
        if t == "array":
            items = list(v or ())
            if items:
                write_long(buf, len(items))
                for item in items:
                    encode_value(buf, schema["items"], item)
            write_long(buf, 0)
            return
        if t == "map":
            entries = dict(v or {})
            if entries:
                write_long(buf, len(entries))
                for k, mv in entries.items():
                    encode_value(buf, "string", k)
                    encode_value(buf, schema["values"], mv)
            write_long(buf, 0)
            return
        schema = t  # {"type": "string"} wrapper
    if schema == "null":
        if v is not None:
            raise AvroTypeError(f"non-null {v!r} for null schema")
        return
    if schema == "boolean":
        buf.write(b"\x01" if v else b"\x00")
        return
    if schema in ("int", "long"):
        write_long(buf, int(v))
        return
    if schema == "float":
        buf.write(struct.pack("<f", float(v)))
        return
    if schema == "double":
        buf.write(struct.pack("<d", float(v)))
        return
    if schema == "bytes":
        raw = bytes(v)
        write_long(buf, len(raw))
        buf.write(raw)
        return
    if schema == "string":
        raw = str(v).encode("utf-8")
        write_long(buf, len(raw))
        buf.write(raw)
        return
    raise AvroTypeError(f"unsupported Avro schema {schema!r}")


def _matches(branch, v) -> bool:
    t = branch["type"] if isinstance(branch, dict) else branch
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool) or (
            isinstance(branch, dict) and branch.get("logicalType", "").startswith("timestamp")
        )
    if t in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t == "bytes":
        if isinstance(branch, dict) and branch.get("logicalType") == "decimal":
            import decimal as _decimal

            return isinstance(v, (int, float, _decimal.Decimal))
        return isinstance(v, (bytes, bytearray))
    if t == "record":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, (list, tuple))
    if t == "map":
        return isinstance(v, dict)
    if t == "enum":
        return isinstance(v, str) and v in branch.get("symbols", ())
    if t == "fixed":
        if isinstance(branch, dict) and branch.get("logicalType") == "decimal":
            import decimal as _decimal

            return isinstance(v, (int, float, _decimal.Decimal))
        return (
            isinstance(v, (bytes, bytearray))
            and len(v) == int(branch.get("size", -1))
        )
    return False


def decode_value(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        idx = read_long(buf)
        return decode_value(buf, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis") and t == "long":
            n = read_long(buf)
            us = n if logical == "timestamp-micros" else n * 1000
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
        if logical == "decimal" and t in ("bytes", "fixed"):
            import decimal as _decimal

            size = (
                int(schema["size"]) if t == "fixed" else read_long(buf)
            )
            unscaled = int.from_bytes(buf.read(size), "big", signed=True)
            return _decimal.Decimal(unscaled).scaleb(
                -int(schema.get("scale", 0))
            )
        if t == "enum":
            return schema["symbols"][read_long(buf)]
        if t == "fixed":
            return buf.read(int(schema["size"]))
        if t == "record":
            return {
                f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    read_long(buf)
                for _ in range(n):
                    out.append(decode_value(buf, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    read_long(buf)
                for _ in range(n):
                    k = decode_value(buf, "string")
                    out[k] = decode_value(buf, schema["values"])
        schema = t
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return buf.read(read_long(buf))
    if schema == "string":
        return buf.read(read_long(buf)).decode("utf-8")
    raise AvroTypeError(f"unsupported Avro schema {schema!r}")


# ---- record-level API ----------------------------------------------------


def encode_record(obj: dict, schema_json: str | dict) -> bytes:
    buf = io.BytesIO()
    encode_value(buf, parse_schema(schema_json), obj)
    return buf.getvalue()


def decode_record(raw: bytes, schema_json: str | dict) -> dict:
    return decode_value(io.BytesIO(bytes(raw)), parse_schema(schema_json))


# ---- JSON bridging -------------------------------------------------------


def coerce_json(schema, v):
    """JSON-decoded value → codec-ready value, schema-directed:
    ISO-8601 strings → datetime for timestamp logical types, base64
    strings → bytes. JSON is the envelope's lingua franca
    (payload_after_json), so the encode path accepts it directly."""
    import base64

    if v is None:
        return None
    if isinstance(schema, list):
        for branch in schema:
            if branch != "null":
                return coerce_json(branch, v)
        return v
    if isinstance(schema, dict):
        t = schema["type"]
        if schema.get("logicalType", "").startswith("timestamp") and isinstance(v, str):
            return datetime.datetime.fromisoformat(v.replace("Z", "+00:00"))
        if t == "record":
            names = {f["name"]: f["type"] for f in schema["fields"]}
            return {k: coerce_json(names[k], x) for k, x in v.items() if k in names} | {
                k: None for k in names if k not in v
            }
        if t == "array":
            return [coerce_json(schema["items"], x) for x in v]
        if t == "map":
            return {k: coerce_json(schema["values"], x) for k, x in v.items()}
        schema = t
    if schema == "bytes" and isinstance(v, str):
        return base64.b64decode(v)
    return v


def jsonify(v):
    """Decoded value → JSON-safe (datetime → ISO, bytes → base64 —
    Spark's from_json parses both back into timestamp/binary)."""
    import base64

    if isinstance(v, dict):
        return {k: jsonify(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [jsonify(x) for x in v]
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    import decimal as _decimal

    if isinstance(v, _decimal.Decimal):
        # plain string keeps exactness; Spark's from_json casts it
        # back into the DecimalType the schema declares
        return str(v)
    return v


# ---- Confluent wire format (python side) ---------------------------------

MAGIC = b"\x00"


def frame(payload: bytes, schema_id: int) -> bytes:
    return MAGIC + schema_id.to_bytes(4, "big") + payload


def unframe(raw: bytes) -> tuple[int, bytes]:
    raw = bytes(raw)
    if not raw or raw[0:1] != MAGIC:
        raise ValueError("not Confluent wire format (missing 0x00 magic)")
    return int.from_bytes(raw[1:5], "big"), raw[5:]
