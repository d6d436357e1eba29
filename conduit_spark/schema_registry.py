"""Schema registry — Confluent-compatible subject/version store.

Reference: an embedded (default) or external Confluent-compatible Avro
schema registry (pkg/conduit/config.go:45-46,251-262; implementation
pkg/schemaregistry/ backed by conduit-schema-registry). ``avro.encode``
supports ``preRegistered`` (fetch subject+version) and ``autoRegister``
(infer from data and register) strategies (impl/avro/config.go:22-57).

This is the embedded analog: subjects → monotonically versioned
schemas with content dedup (re-registering an identical schema returns
the existing version, Confluent semantics), optional JSON-file
persistence for restarts, and Avro-schema inference from a Spark
StructType. The Spark data path consumes it by resolving a subject to
the JSON Avro schema passed to from_avro/to_avro (operators
codec_ops.avro_encode/avro_decode; requires the spark-avro package on
the cluster classpath).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from threading import Lock

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
    TimestampType,
)


class SchemaNotFound(KeyError):
    pass


@dataclass(frozen=True)
class RegisteredSchema:
    subject: str
    version: int
    schema_id: int
    schema_json: str


def struct_to_avro_schema(st: StructType, name: str = "record") -> str:
    """Infer a JSON Avro schema from a Spark StructType (the
    autoRegister strategy's inference step, avro/config.go:39-47)."""

    def conv(dt: DataType, field_name: str) -> object:
        if isinstance(dt, StringType):
            return "string"
        if isinstance(dt, LongType):
            return "long"
        if isinstance(dt, IntegerType):
            return "int"
        if isinstance(dt, DoubleType):
            return "double"
        if isinstance(dt, FloatType):
            return "float"
        if isinstance(dt, BooleanType):
            return "boolean"
        if isinstance(dt, BinaryType):
            return "bytes"
        if isinstance(dt, TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if isinstance(dt, ArrayType):
            return {"type": "array", "items": conv(dt.elementType, field_name)}
        if isinstance(dt, MapType):
            return {"type": "map", "values": conv(dt.valueType, field_name)}
        if isinstance(dt, StructType):
            return {
                "type": "record",
                "name": f"{field_name}_rec",
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
                    for f in dt.fields
                ],
            }
        raise TypeError(f"cannot map Spark type {dt} to Avro")

    schema = {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
            for f in st.fields
        ],
    }
    return json.dumps(schema)


def avro_schema_to_struct(schema_json: str | dict) -> StructType:
    """Inverse of ``struct_to_avro_schema``: a Spark StructType from a
    JSON Avro record schema, so ``avro.decode`` can bind a typed
    payload column (impl/avro/decode.go:114-166 extracts the schema to
    re-structure the record the same way)."""
    import json as _json

    from pyspark.sql.types import StructField

    sch = _json.loads(schema_json) if isinstance(schema_json, str) else schema_json

    def conv(s) -> DataType:
        if isinstance(s, list):  # union: first non-null branch, nullable
            branches = [b for b in s if b != "null"]
            if not branches:
                return StringType()
            return conv(branches[0])
        if isinstance(s, dict):
            t = s["type"]
            if s.get("logicalType") in ("timestamp-micros", "timestamp-millis"):
                return TimestampType()
            if s.get("logicalType") == "decimal":
                return DecimalType(
                    int(s.get("precision", 38)), int(s.get("scale", 0))
                )
            if t == "record":
                return StructType(
                    [StructField(f["name"], conv(f["type"]), True) for f in s["fields"]]
                )
            if t == "array":
                return ArrayType(conv(s["items"]))
            if t == "map":
                return MapType(StringType(), conv(s["values"]))
            s = t
        return {
            "string": StringType(),
            "long": LongType(),
            "int": IntegerType(),
            "double": DoubleType(),
            "float": FloatType(),
            "boolean": BooleanType(),
            "bytes": BinaryType(),
            "null": StringType(),
        }[s]

    st = conv(sch)
    if not isinstance(st, StructType):
        raise TypeError("top-level Avro schema must be a record")
    return st


def frame_wire_format(df_col, schema_id: int):
    """Confluent wire format: 0x00 magic + big-endian int32 schema id +
    payload (what avro.decode strips to find the registry schema,
    impl/avro/decode.go:114-166). Pure column expression."""
    import pyspark.sql.functions as F

    header = bytes([0]) + schema_id.to_bytes(4, "big")
    return F.concat(F.lit(header), df_col.cast("binary"))


def unframe_wire_format(df_col):
    """(schema_id column, payload column) from wire-format bytes."""
    import pyspark.sql.functions as F

    payload = F.expr(f"substring({df_col}, 6, 2147483647)") if isinstance(df_col, str) else None
    if payload is None:
        raise TypeError("pass the column NAME for unframe_wire_format")
    sid = F.conv(F.hex(F.expr(f"substring({df_col}, 2, 4)")), 16, 10).cast("int")
    return sid, payload


class SchemaRegistry:
    """Embedded subject/version registry with optional file persistence."""

    def __init__(self, path: str | None = None):
        self._path = path
        self._lock = Lock()
        self._subjects: dict[str, list[RegisteredSchema]] = {}
        self._next_id = 1
        if path and os.path.exists(path):
            self._load()

    # ---- persistence ----------------------------------------------------

    def _load(self) -> None:
        with open(self._path, encoding="utf-8") as f:
            raw = json.load(f)
        self._next_id = raw["next_id"]
        self._subjects = {
            s: [RegisteredSchema(**e) for e in entries]
            for s, entries in raw["subjects"].items()
        }

    def _save(self) -> None:
        if not self._path:
            return
        tmp = self._path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "next_id": self._next_id,
                    "subjects": {
                        s: [e.__dict__ for e in entries]
                        for s, entries in self._subjects.items()
                    },
                },
                f,
            )
        os.replace(tmp, self._path)  # atomic vs concurrent readers

    # ---- registry API (Confluent-shaped) --------------------------------

    def register(self, subject: str, schema_json: str) -> RegisteredSchema:
        """Register a schema under a subject; identical content returns
        the existing registration (Confluent dedup semantics)."""
        canonical = json.dumps(json.loads(schema_json), sort_keys=True)
        with self._lock:
            entries = self._subjects.setdefault(subject, [])
            for e in entries:
                if json.dumps(json.loads(e.schema_json), sort_keys=True) == canonical:
                    return e
            reg = RegisteredSchema(
                subject=subject,
                version=len(entries) + 1,
                schema_id=self._next_id,
                schema_json=schema_json,
            )
            self._next_id += 1
            entries.append(reg)
            self._save()
            return reg

    def latest(self, subject: str) -> RegisteredSchema:
        entries = self._subjects.get(subject)
        if not entries:
            raise SchemaNotFound(subject)
        return entries[-1]

    def get(self, subject: str, version: int) -> RegisteredSchema:
        entries = self._subjects.get(subject)
        if not entries or not (1 <= version <= len(entries)):
            raise SchemaNotFound(f"{subject} v{version}")
        return entries[version - 1]

    def by_id(self, schema_id: int) -> RegisteredSchema:
        for entries in self._subjects.values():
            for e in entries:
                if e.schema_id == schema_id:
                    return e
        raise SchemaNotFound(f"id {schema_id}")

    def subjects(self) -> list[str]:
        return sorted(self._subjects)

    # ---- avro strategy resolution (avro/config.go:22-57) ----------------

    def resolve_encode_schema(
        self,
        *,
        strategy: str,
        subject: str | None = None,
        version: int | None = None,
        payload_schema: StructType | None = None,
    ) -> RegisteredSchema:
        if strategy == "preRegistered":
            if subject is None or version is None:
                raise ValueError("preRegistered needs subject and version")
            return self.get(subject, version)
        if strategy == "autoRegister":
            if subject is None or payload_schema is None:
                raise ValueError("autoRegister needs subject and a payload schema")
            return self.register(subject, struct_to_avro_schema(payload_schema, subject))
        raise ValueError(f"unknown schema strategy {strategy!r}")


class RestSchemaRegistry:
    """Client for an EXTERNAL Confluent-compatible schema registry
    (pkg/conduit/config.go:45-46,251-262 — the ``external`` registry
    type with a connection string). Speaks the Confluent REST wire
    protocol over stdlib urllib and implements the same interface as
    the embedded :class:`SchemaRegistry`, so ``avro.encode/decode``
    accept either without caring which.

    Endpoints used: ``POST /subjects/{s}/versions``,
    ``GET /subjects/{s}/versions/{v|latest}``,
    ``GET /schemas/ids/{id}``, ``GET /subjects``.
    """

    def __init__(self, base_url: str, *, timeout: float = 10.0):
        self._base = base_url.rstrip("/")
        self._timeout = timeout

    # ---- transport ------------------------------------------------------

    def _request(self, method: str, path: str, body: dict | None = None):
        import urllib.error
        import urllib.request

        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self._base + path, data=data, method=method
        )
        req.add_header("Accept", "application/vnd.schemaregistry.v1+json")
        if data is not None:
            req.add_header(
                "Content-Type", "application/vnd.schemaregistry.v1+json"
            )
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise SchemaNotFound(path) from e
            raise

    # ---- SchemaRegistry interface ---------------------------------------

    def register(self, subject: str, schema_json: str) -> RegisteredSchema:
        out = self._request(
            "POST", f"/subjects/{subject}/versions", {"schema": schema_json}
        )
        # Confluent returns only the global id on POST; fetch the
        # version via a lookup of the same content
        look = self._request(
            "POST", f"/subjects/{subject}", {"schema": schema_json}
        )
        return RegisteredSchema(
            subject=subject,
            version=int(look["version"]),
            schema_id=int(out["id"]),
            schema_json=schema_json,
        )

    def _version(self, subject: str, version: int | str) -> RegisteredSchema:
        out = self._request("GET", f"/subjects/{subject}/versions/{version}")
        return RegisteredSchema(
            subject=out["subject"],
            version=int(out["version"]),
            schema_id=int(out["id"]),
            schema_json=out["schema"],
        )

    def latest(self, subject: str) -> RegisteredSchema:
        return self._version(subject, "latest")

    def get(self, subject: str, version: int) -> RegisteredSchema:
        return self._version(subject, version)

    def by_id(self, schema_id: int) -> RegisteredSchema:
        out = self._request("GET", f"/schemas/ids/{schema_id}")
        return RegisteredSchema(
            subject=out.get("subject", ""),
            version=int(out.get("version", 0)),
            schema_id=schema_id,
            schema_json=out["schema"],
        )

    def subjects(self) -> list[str]:
        return sorted(self._request("GET", "/subjects"))

    resolve_encode_schema = SchemaRegistry.resolve_encode_schema


def start_registry_server(registry: SchemaRegistry, host: str = "127.0.0.1", port: int = 0):
    """Serve an embedded :class:`SchemaRegistry` over the Confluent
    REST wire protocol (the conduit-schema-registry service analog) —
    also the offline test double for :class:`RestSchemaRegistry`.
    Returns the HTTPServer; ``server_address[1]`` is the port."""
    import re as _re
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def log_message(self, *a) -> None:
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header(
                "Content-Type", "application/vnd.schemaregistry.v1+json"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self) -> None:  # noqa: N802
            try:
                if self.path == "/subjects":
                    self._send(200, registry.subjects())
                    return
                m = _re.match(r"^/subjects/([^/]+)/versions/(latest|\d+)$", self.path)
                if m:
                    subject, v = m.groups()
                    e = (
                        registry.latest(subject)
                        if v == "latest"
                        else registry.get(subject, int(v))
                    )
                    self._send(
                        200,
                        {
                            "subject": e.subject,
                            "version": e.version,
                            "id": e.schema_id,
                            "schema": e.schema_json,
                        },
                    )
                    return
                m = _re.match(r"^/schemas/ids/(\d+)$", self.path)
                if m:
                    e = registry.by_id(int(m.group(1)))
                    self._send(
                        200,
                        {
                            "schema": e.schema_json,
                            "subject": e.subject,
                            "version": e.version,
                        },
                    )
                    return
                self._send(404, {"error_code": 40401, "message": "not found"})
            except SchemaNotFound:
                self._send(404, {"error_code": 40401, "message": "not found"})

        def do_POST(self) -> None:  # noqa: N802
            try:
                m = _re.match(r"^/subjects/([^/]+)/versions$", self.path)
                if m:
                    e = registry.register(m.group(1), self._body()["schema"])
                    self._send(200, {"id": e.schema_id})
                    return
                m = _re.match(r"^/subjects/([^/]+)$", self.path)
                if m:  # content lookup
                    subject = m.group(1)
                    want = json.dumps(
                        json.loads(self._body()["schema"]), sort_keys=True
                    )
                    for v in range(1, len(registry._subjects.get(subject, [])) + 1):
                        e = registry.get(subject, v)
                        if json.dumps(json.loads(e.schema_json), sort_keys=True) == want:
                            self._send(
                                200,
                                {
                                    "subject": subject,
                                    "version": e.version,
                                    "id": e.schema_id,
                                    "schema": e.schema_json,
                                },
                            )
                            return
                    self._send(404, {"error_code": 40403, "message": "schema not found"})
                    return
                self._send(404, {"error_code": 40401, "message": "not found"})
            except SchemaNotFound:
                self._send(404, {"error_code": 40401, "message": "not found"})

    srv = ThreadingHTTPServer((host, port), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
