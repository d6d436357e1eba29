"""Minimal pure-Python protobuf runtime — just enough ``google.protobuf``
to execute protoc-generated ``*_pb2.py`` modules in an image that ships
no ``protobuf`` package.

Why: Spark 4's ``transformWithStateInPandas`` (the stateful-processing
v2 API) talks to the JVM state server through protobuf messages whose
Python side is the generated ``pyspark/sql/streaming/proto/
StateMessage_pb2.py``. That module needs four runtime pieces at import
time — ``descriptor_pool.Default().AddSerializedFile``,
``internal.builder.Build*``, ``runtime_version``, ``symbol_database`` —
and message classes with ``SerializeToString``/``ParseFromString`` at
call time. This module implements that surface from the public protobuf
wire-format and ``descriptor.proto`` specs
(protobuf.dev/programming-guides/encoding) and registers itself in
``sys.modules`` via :func:`install` ONLY when the real package is
absent, so environments with genuine protobuf are untouched.

Scope (deliberately small, fail-loud outside it):

- proto3 files only; no extensions, groups, or services.
- Scalar types: (u)int32/64, sint32/64, bool, enum, string, bytes,
  double, float, fixed/sfixed 32/64.
- Messages, nested messages/enums, repeated fields (packed decode for
  numerics, unpacked encode — both valid on the wire), map fields
  (wire-compatible repeated entry messages).
- Presence: a field serializes iff it was explicitly set OR is a
  message touched through attribute access (protobuf's sub-message
  vivification-on-write is approximated by attach-on-read, which is
  safe for request-builder call sites that only read a sub-message to
  mutate it). ``oneof`` declarations are not enforced — callers that
  set one member per group (all known call sites) are wire-identical.

The engine's other hand-rolled codec (``protowire.py``) stays the
gRPC-Web surface's descriptor-dict codec; this one is class-based
because generated pb2 code and its pyspark callers expect message
OBJECTS (attribute access, lazy sub-messages), not dicts.

Reference parity note: the reference engine links the official
protobuf/gRPC stacks (go.mod); this shim exists because the image
cannot ``pip install`` — not as a from-scratch ambition.
"""

from __future__ import annotations

import struct
import sys
import threading
import types

__all__ = ["install", "parse_file_descriptor", "MiniMessage"]

# FieldDescriptorProto.Type numbers (descriptor.proto, public spec).
T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32 = 1, 2, 3, 4, 5
T_FIXED64, T_FIXED32, T_BOOL, T_STRING, T_GROUP = 6, 7, 8, 9, 10
T_MESSAGE, T_BYTES, T_UINT32, T_ENUM = 11, 12, 13, 14
T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64 = 15, 16, 17, 18

LABEL_REPEATED = 3

_VARINT_TYPES = frozenset(
    (T_INT64, T_UINT64, T_INT32, T_UINT32, T_BOOL, T_ENUM, T_SINT32, T_SINT64)
)
_I64_TYPES = frozenset((T_DOUBLE, T_FIXED64, T_SFIXED64))
_I32_TYPES = frozenset((T_FLOAT, T_FIXED32, T_SFIXED32))
_LEN_TYPES = frozenset((T_STRING, T_BYTES, T_MESSAGE))

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


# --- wire primitives ---------------------------------------------------


def _enc_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's-complement 64-bit for negative int32/int64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf, pos: int) -> tuple[int, int]:
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
            raise DecodeError("varint longer than 10 bytes")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _signed(n: int, bits: int = 64) -> int:
    return n - (1 << bits) if n >= 1 << (bits - 1) else n


class DecodeError(Exception):
    """Wire-format violation (google.protobuf.message.DecodeError)."""


# --- FileDescriptorProto parsing (descriptor.proto subset) -------------
#
# The serialized blob inside every generated pb2 file IS a
# FileDescriptorProto. We bootstrap by walking it with the raw wire
# reader (no generated code for descriptor.proto needed).


class FieldSpec:
    __slots__ = (
        "name",
        "number",
        "type",
        "repeated",
        "type_name",
        "message_cls",
        "enum_default",
        "json_name",
    )

    def __init__(self, name, number, ftype, repeated, type_name, json_name):
        self.name = name
        self.number = number
        self.type = ftype
        self.repeated = repeated
        self.type_name = type_name  # ".pkg.Msg" for message/enum fields
        self.message_cls = None  # resolved after all classes exist
        self.enum_default = 0
        self.json_name = json_name

    def default(self):
        if self.repeated:
            return []
        if self.type in (T_STRING,):
            return ""
        if self.type == T_BYTES:
            return b""
        if self.type == T_BOOL:
            return False
        if self.type in (T_DOUBLE, T_FLOAT):
            return 0.0
        if self.type == T_MESSAGE:
            return None
        return 0


def _walk_fields(buf):
    """Yield (field_number, wire_type, value) over one message's bytes;
    value is the raw varint / 4-or-8-byte chunk / LEN slice."""
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _dec_varint(buf, pos)
        num, wt = tag >> 3, tag & 0x7
        if wt == _WT_VARINT:
            v, pos = _dec_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = _dec_varint(buf, pos)
            v = bytes(buf[pos : pos + ln])
            pos += ln
        elif wt == _WT_I64:
            v = bytes(buf[pos : pos + 8])
            pos += 8
        elif wt == _WT_I32:
            v = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise DecodeError(f"unsupported wire type {wt}")
        yield num, wt, v


def _parse_field_descriptor(buf) -> FieldSpec:
    name = type_name = json_name = ""
    number = ftype = 0
    label = 1
    for num, _wt, v in _walk_fields(buf):
        if num == 1:
            name = v.decode("utf-8")
        elif num == 3:
            number = v
        elif num == 4:
            label = v
        elif num == 5:
            ftype = v
        elif num == 6:
            type_name = v.decode("utf-8")
        elif num == 10:
            json_name = v.decode("utf-8")
        # 9 oneof_index / 17 proto3_optional: presence groups are not
        # enforced (module docstring) — skipped on purpose.
    if ftype == T_GROUP:
        raise DecodeError("proto2 groups are not supported")
    return FieldSpec(
        name, number, ftype, label == LABEL_REPEATED, type_name, json_name
    )


def _parse_enum_descriptor(buf):
    name = ""
    values = []  # (name, number)
    for num, _wt, v in _walk_fields(buf):
        if num == 1:
            name = v.decode("utf-8")
        elif num == 2:
            vname, vnum = "", 0
            for n2, _w2, v2 in _walk_fields(v):
                if n2 == 1:
                    vname = v2.decode("utf-8")
                elif n2 == 2:
                    vnum = _signed(v2)
            values.append((vname, vnum))
    return {"name": name, "values": values}


def _parse_message_descriptor(buf):
    name = ""
    fields, nested, enums = [], [], []
    for num, _wt, v in _walk_fields(buf):
        if num == 1:
            name = v.decode("utf-8")
        elif num == 2:
            fields.append(_parse_field_descriptor(v))
        elif num == 3:
            nested.append(_parse_message_descriptor(v))
        elif num == 4:
            enums.append(_parse_enum_descriptor(v))
        elif num == 7:
            raise DecodeError("proto2 extensions are not supported")
    return {"name": name, "fields": fields, "nested": nested, "enums": enums}


def parse_file_descriptor(serialized: bytes) -> dict:
    """Parse a serialized FileDescriptorProto → plain dict tree."""
    out = {
        "name": "",
        "package": "",
        "syntax": "proto2",
        "messages": [],
        "enums": [],
    }
    for num, _wt, v in _walk_fields(serialized):
        if num == 1:
            out["name"] = v.decode("utf-8")
        elif num == 2:
            out["package"] = v.decode("utf-8")
        elif num == 4:
            out["messages"].append(_parse_message_descriptor(v))
        elif num == 5:
            out["enums"].append(_parse_enum_descriptor(v))
        elif num == 12:
            out["syntax"] = v.decode("utf-8")
    return out


# --- dynamic message classes -------------------------------------------


class MiniMessage:
    """Base for generated-descriptor message classes.

    Set values live in the instance ``__dict__`` under field names;
    unset fields answer through ``__getattr__`` with proto3 defaults.
    Sub-messages and repeated fields ATTACH on first access so
    ``req.sub.field = x`` / ``req.items.append(y)`` mutate the parent.
    """

    _fields_by_name: dict = {}
    _fields_by_number: dict = {}
    DESCRIPTOR = None

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute protocol --

    def __getattr__(self, name):
        spec = type(self)._fields_by_name.get(name)
        if spec is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if spec.repeated:
            v = []
            self.__dict__[name] = v  # attach: future appends serialize
            return v
        if spec.type == T_MESSAGE:
            v = spec.message_cls()
            self.__dict__[name] = v
            return v
        return spec.default()

    def __setattr__(self, name, value):
        spec = type(self)._fields_by_name.get(name)
        if spec is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if spec.repeated:
            value = [self._coerce_one(spec, v) for v in value]
        else:
            value = self._coerce_one(spec, value)
        self.__dict__[name] = value

    @staticmethod
    def _coerce_one(spec, value):
        if spec.type == T_MESSAGE:
            if isinstance(value, dict):
                return spec.message_cls(**value)
            if not isinstance(value, spec.message_cls):
                raise TypeError(
                    f"field {spec.name} expects {spec.message_cls.__name__},"
                    f" got {type(value).__name__}"
                )
            return value
        if spec.type == T_STRING and not isinstance(value, str):
            raise TypeError(f"field {spec.name} expects str")
        if spec.type == T_BYTES and not isinstance(value, (bytes, bytearray)):
            raise TypeError(f"field {spec.name} expects bytes")
        return value

    # -- protobuf public API --

    def HasField(self, name: str) -> bool:
        return name in self.__dict__

    def ClearField(self, name: str) -> None:
        self.__dict__.pop(name, None)

    def CopyFrom(self, other: "MiniMessage") -> None:
        if type(other) is not type(self):
            raise TypeError("CopyFrom across message types")
        self.__dict__.clear()
        self.MergeFromString(other.SerializeToString())

    def WhichOneof(self, _group: str):
        # oneof groups are not tracked; answer with the LAST set
        # message-typed field, which matches every known call pattern
        # (at most one group member set per instance).
        for name in reversed(list(self.__dict__)):
            spec = type(self)._fields_by_name.get(name)
            if spec is not None and spec.type == T_MESSAGE:
                return name
        return None

    def SerializeToString(self) -> bytes:
        out = bytearray()
        values = self.__dict__
        for number in sorted(type(self)._fields_by_number):
            spec = type(self)._fields_by_number[number]
            v = values.get(spec.name)
            if v is None:
                continue
            if spec.repeated:
                for item in v:
                    out += self._enc_field(spec, item)
                continue
            # proto3 scalar zero values stay off the wire; explicitly
            # attached messages (even empty) are serialized — that is
            # what carries oneof selections like Exists()/Clear().
            if spec.type != T_MESSAGE and v == spec.default():
                continue
            out += self._enc_field(spec, v)
        return bytes(out)

    @classmethod
    def _enc_field(cls, spec, v) -> bytes:
        t = spec.type
        tag_len = _enc_varint((spec.number << 3) | _WT_LEN)
        if t == T_STRING:
            b = v.encode("utf-8")
            return tag_len + _enc_varint(len(b)) + b
        if t == T_BYTES:
            b = bytes(v)
            return tag_len + _enc_varint(len(b)) + b
        if t == T_MESSAGE:
            b = v.SerializeToString()
            return tag_len + _enc_varint(len(b)) + b
        tag_var = _enc_varint((spec.number << 3) | _WT_VARINT)
        if t == T_BOOL:
            return tag_var + _enc_varint(1 if v else 0)
        if t in (T_INT32, T_INT64, T_UINT32, T_UINT64, T_ENUM):
            return tag_var + _enc_varint(int(v))
        if t in (T_SINT32, T_SINT64):
            return tag_var + _enc_varint(_zigzag(int(v)))
        if t == T_DOUBLE:
            return (
                _enc_varint((spec.number << 3) | _WT_I64)
                + struct.pack("<d", v)
            )
        if t == T_FLOAT:
            return (
                _enc_varint((spec.number << 3) | _WT_I32)
                + struct.pack("<f", v)
            )
        if t in (T_FIXED64, T_SFIXED64):
            return (
                _enc_varint((spec.number << 3) | _WT_I64)
                + struct.pack("<q" if t == T_SFIXED64 else "<Q", int(v))
            )
        if t in (T_FIXED32, T_SFIXED32):
            return (
                _enc_varint((spec.number << 3) | _WT_I32)
                + struct.pack("<i" if t == T_SFIXED32 else "<I", int(v))
            )
        raise DecodeError(f"unsupported field type {t}")

    def ParseFromString(self, data: bytes) -> int:
        self.__dict__.clear()
        return self.MergeFromString(data)

    def MergeFromString(self, data: bytes) -> int:
        fields = type(self)._fields_by_number
        for num, wt, raw in _walk_fields(data):
            spec = fields.get(num)
            if spec is None:
                continue  # unknown field: forward compatibility
            t = spec.type
            if wt == _WT_VARINT:
                val = self._dec_varint_value(t, raw)
            elif wt == _WT_LEN:
                if t in _VARINT_TYPES or t in _I64_TYPES or t in _I32_TYPES:
                    # packed repeated numerics
                    if not spec.repeated:
                        raise DecodeError(
                            f"packed data for non-repeated field {spec.name}"
                        )
                    lst = self.__dict__.setdefault(spec.name, [])
                    lst.extend(self._dec_packed(t, raw))
                    continue
                if t == T_STRING:
                    val = raw.decode("utf-8")
                elif t == T_BYTES:
                    val = raw
                elif t == T_MESSAGE:
                    val = spec.message_cls()
                    val.MergeFromString(raw)
                else:
                    raise DecodeError(f"LEN data for field type {t}")
            elif wt == _WT_I64:
                val = self._dec_fixed(t, raw, 64)
            elif wt == _WT_I32:
                val = self._dec_fixed(t, raw, 32)
            else:  # pragma: no cover - _walk_fields already rejects
                raise DecodeError(f"wire type {wt}")
            if spec.repeated:
                self.__dict__.setdefault(spec.name, []).append(val)
            else:
                self.__dict__[spec.name] = val
        return len(data)

    @staticmethod
    def _dec_varint_value(t, raw):
        if t == T_BOOL:
            return bool(raw)
        if t in (T_INT32, T_INT64):
            return _signed(raw)
        if t in (T_SINT32, T_SINT64):
            return _unzigzag(raw)
        if t in (T_UINT32, T_UINT64, T_ENUM):
            return raw
        raise DecodeError(f"varint data for field type {t}")

    @staticmethod
    def _dec_fixed(t, raw, bits):
        if t == T_DOUBLE:
            return struct.unpack("<d", raw)[0]
        if t == T_FLOAT:
            return struct.unpack("<f", raw)[0]
        if t == T_FIXED64:
            return struct.unpack("<Q", raw)[0]
        if t == T_SFIXED64:
            return struct.unpack("<q", raw)[0]
        if t == T_FIXED32:
            return struct.unpack("<I", raw)[0]
        if t == T_SFIXED32:
            return struct.unpack("<i", raw)[0]
        raise DecodeError(f"{bits}-bit data for field type {t}")

    @classmethod
    def _dec_packed(cls, t, raw):
        out = []
        pos, n = 0, len(raw)
        if t in _VARINT_TYPES:
            while pos < n:
                v, pos = _dec_varint(raw, pos)
                out.append(cls._dec_varint_value(t, v))
            return out
        width = 8 if t in _I64_TYPES else 4
        while pos < n:
            out.append(cls._dec_fixed(t, raw[pos : pos + width], width * 8))
            pos += width
        return out

    # -- conveniences --

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and self.SerializeToString() == other.SerializeToString()
        )

    def __hash__(self):  # pragma: no cover - not used in hot paths
        return hash((type(self).__name__, self.SerializeToString()))

    def __repr__(self):
        parts = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"{type(self).__name__}({parts})"

    def ByteSize(self) -> int:
        return len(self.SerializeToString())


class _EnumTypeWrapper:
    """Attribute + lookup access over an enum's values
    (``HandleState.CREATED``, ``HandleState.Name(1)``)."""

    def __init__(self, name, values):
        self._name = name
        self._by_name = dict(values)
        self._by_number = {n: v for v, n in values}
        for vname, vnum in values:
            setattr(self, vname, vnum)

    def Name(self, number):
        return self._by_number[number]

    def Value(self, name):
        return self._by_name[name]

    def values(self):
        return sorted(self._by_number)

    def keys(self):
        return [self._by_number[n] for n in sorted(self._by_number)]


class _DescriptorStub:
    """Settable-attribute stand-in for the Descriptor objects generated
    modules poke (``_serialized_start`` etc.)."""

    def __init__(self, full_name, kind):
        self.full_name = full_name
        self.name = full_name.rsplit(".", 1)[-1]
        self.kind = kind

    def __setattr__(self, k, v):  # accept anything the gencode assigns
        object.__setattr__(self, k, v)


class FileDescriptor:
    """Result of ``AddSerializedFile``: the parsed tree plus built
    message classes / enum values, consumed by the builder shims."""

    def __init__(self, tree: dict, serialized_pb: bytes):
        self.tree = tree
        self.name = tree["name"]
        self.package = tree["package"]
        self.serialized_pb = serialized_pb
        self.message_classes: dict[str, type] = {}  # by chained name
        self.enum_wrappers: dict[str, _EnumTypeWrapper] = {}
        self.enum_values: dict[str, int] = {}  # top-level value names
        self.descriptors: dict[str, _DescriptorStub] = {}
        self._build()

    def __setattr__(self, k, v):
        object.__setattr__(self, k, v)

    def _build(self):
        if self.tree["syntax"] not in ("proto3",):
            raise DecodeError(
                f"only proto3 files are supported, got "
                f"{self.tree['syntax']!r} ({self.name})"
            )
        by_full_name: dict[str, type] = {}
        enum_by_full_name: dict[str, _EnumTypeWrapper] = {}

        def build_enum(edesc, scope_full, scope_chain):
            full = f"{scope_full}.{edesc['name']}"
            w = _EnumTypeWrapper(edesc["name"], edesc["values"])
            enum_by_full_name[full] = w
            chain = "_".join(scope_chain + [edesc["name"]])
            self.enum_wrappers[chain] = w
            self.descriptors[chain] = _DescriptorStub(full, "enum")

        def build_message(mdesc, scope_full, scope_chain):
            full = f"{scope_full}.{mdesc['name']}"
            chain = scope_chain + [mdesc["name"]]
            cls = type(
                mdesc["name"],
                (MiniMessage,),
                {
                    "_fields_by_name": {
                        f.name: f for f in mdesc["fields"]
                    },
                    "_fields_by_number": {
                        f.number: f for f in mdesc["fields"]
                    },
                    "DESCRIPTOR": _DescriptorStub(full, "message"),
                    "__module__": "miniproto.generated",
                },
            )
            by_full_name[full] = cls
            self.message_classes["_".join(chain)] = cls
            self.descriptors["_".join(chain)] = cls.DESCRIPTOR
            for e in mdesc["enums"]:
                build_enum(e, full, chain)
            for nested in mdesc["nested"]:
                ncls = build_message(nested, full, chain)
                setattr(cls, nested["name"], ncls)
            return cls

        pkg = self.package
        for e in self.tree["enums"]:
            build_enum(e, pkg, [])
            for vname, vnum in e["values"]:
                self.enum_values[vname] = vnum
        for m in self.tree["messages"]:
            build_message(m, pkg, [])

        # second pass: resolve message/enum field type references
        for cls in by_full_name.values():
            for spec in cls._fields_by_name.values():
                if spec.type == T_MESSAGE:
                    tn = spec.type_name.lstrip(".")
                    target = by_full_name.get(tn)
                    if target is None:
                        raise DecodeError(
                            f"unresolved message type {spec.type_name!r} "
                            f"(cross-file imports are not supported)"
                        )
                    spec.message_cls = target
                elif spec.type == T_ENUM:
                    tn = spec.type_name.lstrip(".")
                    if tn not in enum_by_full_name:
                        raise DecodeError(
                            f"unresolved enum type {spec.type_name!r}"
                        )


# --- google.protobuf shim modules --------------------------------------

_POOL_LOCK = threading.Lock()


class _DescriptorPool:
    _default = None

    def __init__(self):
        self._files: dict[str, FileDescriptor] = {}

    @classmethod
    def Default(cls):
        with _POOL_LOCK:
            if cls._default is None:
                cls._default = cls()
            return cls._default

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:
        tree = parse_file_descriptor(serialized)
        with _POOL_LOCK:
            fd = self._files.get(tree["name"])
            if fd is None:
                fd = FileDescriptor(tree, serialized)
                self._files[tree["name"]] = fd
            return fd


class _SymbolDatabase:
    _default = None

    @classmethod
    def Default(cls):
        if cls._default is None:
            cls._default = cls()
        return cls._default

    def RegisterMessage(self, message):  # gencode compatibility
        return message

    def RegisterFileDescriptor(self, fd):
        return fd


def _build_message_and_enum_descriptors(file_desc: FileDescriptor, _globals):
    for chain, stub in file_desc.descriptors.items():
        _globals[f"_{chain.upper()}"] = stub


def _build_top_descriptors_and_messages(
    file_desc: FileDescriptor, module_name: str, _globals
):
    for chain, cls in file_desc.message_classes.items():
        if "_" not in chain:  # top-level message
            cls.__module__ = module_name
            _globals[chain] = cls
    for chain, wrapper in file_desc.enum_wrappers.items():
        if "_" not in chain:
            _globals[chain] = wrapper
    # proto3 hoists top-level enum VALUES to module scope
    for vname, vnum in file_desc.enum_values.items():
        _globals[vname] = vnum


def _module(name: str, attrs: dict, is_pkg: bool = False):
    mod = types.ModuleType(name)
    if is_pkg:
        mod.__path__ = []  # marks a package so submodule imports resolve
    for k, v in attrs.items():
        setattr(mod, k, v)
    mod.__miniproto__ = True
    return mod


def install() -> bool:
    """Register the shim as ``google.protobuf`` in ``sys.modules``.

    Returns True if the shim was installed, False when a real protobuf
    runtime is importable (in which case NOTHING is touched). Safe to
    call repeatedly and from concurrent importers.
    """
    try:
        import google.protobuf.descriptor  # noqa: F401

        return False  # genuine runtime (or an earlier install) wins
    except ImportError:
        pass

    with _POOL_LOCK:
        # The failed probe can leave BARE NAMESPACE packages named
        # google / google.protobuf in sys.modules (any `google/` dir
        # on sys.path creates one — Spark's SPARK_HOME python path
        # does). Those have no __file__ and no runtime; take them
        # over. A module with __file__ is a real-but-broken install —
        # leave it alone and let its ImportError surface.
        existing = sys.modules.get("google.protobuf")
        if existing is not None:
            if getattr(existing, "__miniproto__", False):
                return False  # lost an install race to another thread
            if getattr(existing, "__file__", None):
                return False  # real package present (however broken)

        class _Domain:
            PUBLIC = 1
            GOOGLE_INTERNAL = 2

        def _validate(*_a, **_k):
            return None

        descriptor_mod = _module(
            "google.protobuf.descriptor",
            {
                "_USE_C_DESCRIPTORS": False,
                "Descriptor": _DescriptorStub,
                "FieldDescriptor": FieldSpec,
                "FileDescriptor": FileDescriptor,
            },
        )
        descriptor_pool_mod = _module(
            "google.protobuf.descriptor_pool",
            {"Default": _DescriptorPool.Default, "DescriptorPool": _DescriptorPool},
        )
        runtime_version_mod = _module(
            "google.protobuf.runtime_version",
            {
                "Domain": _Domain,
                "ValidateProtobufRuntimeVersion": _validate,
            },
        )
        symbol_database_mod = _module(
            "google.protobuf.symbol_database",
            {"Default": _SymbolDatabase.Default, "SymbolDatabase": _SymbolDatabase},
        )
        message_mod = _module(
            "google.protobuf.message",
            {"Message": MiniMessage, "DecodeError": DecodeError},
        )
        builder_mod = _module(
            "google.protobuf.internal.builder",
            {
                "BuildMessageAndEnumDescriptors": _build_message_and_enum_descriptors,
                "BuildTopDescriptorsAndMessages": _build_top_descriptors_and_messages,
            },
        )
        internal_mod = _module(
            "google.protobuf.internal", {"builder": builder_mod}, is_pkg=True
        )
        protobuf_mod = _module(
            "google.protobuf",
            {
                "__version__": "0.0-miniproto",
                "descriptor": descriptor_mod,
                "descriptor_pool": descriptor_pool_mod,
                "runtime_version": runtime_version_mod,
                "symbol_database": symbol_database_mod,
                "message": message_mod,
                "internal": internal_mod,
            },
            is_pkg=True,
        )
        google_mod = sys.modules.get("google")
        if google_mod is None:
            google_mod = _module("google", {}, is_pkg=True)
            sys.modules["google"] = google_mod
        # attach onto whatever `google` is (our stub or a namespace
        # package) — attribute binding works for both
        google_mod.protobuf = protobuf_mod

        sys.modules["google.protobuf"] = protobuf_mod
        sys.modules["google.protobuf.descriptor"] = descriptor_mod
        sys.modules["google.protobuf.descriptor_pool"] = descriptor_pool_mod
        sys.modules["google.protobuf.runtime_version"] = runtime_version_mod
        sys.modules["google.protobuf.symbol_database"] = symbol_database_mod
        sys.modules["google.protobuf.message"] = message_mod
        sys.modules["google.protobuf.internal"] = internal_mod
        sys.modules["google.protobuf.internal.builder"] = builder_mod
        return True
