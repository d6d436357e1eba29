"""gRPC-Web transcoding for the reference's ``api.v1.PipelineService``.

The reference serves ``PipelineService`` over native gRPC + the
grpc-gateway HTTP mapping (``proto/api/v1/api.proto:318-601``). This
engine's ADR (20260813-http-gateway-not-raw-grpc.md) keeps the JSON
gateway as the primary surface — native gRPC needs HTTP/2 framing the
stdlib can't serve — but the public **gRPC-Web** protocol
(github.com/grpc/grpc-web PROTOCOL-WEB.md) is plain HTTP/1.1:

    POST /api.v1.PipelineService/{Method}
    Content-Type: application/grpc-web+proto   (or grpc-web-text)
    body = DATA frame(s): 1-byte flags (0x00) + 4-byte BE length + msg
    response = DATA frame + trailers frame (flags 0x80) carrying
               ``grpc-status: N\r\ngrpc-message: ...``

so a client generated from the reference's own ``api.proto`` with
``protoc-gen-grpc-web`` (or grpc-web-text from a browser) can call
this gateway unmodified. Messages are encoded with the
descriptor-driven codec in ``functions.protowire`` — field numbers
below are copied VERBATIM from ``api.proto`` and commented with their
source lines so parity is auditable.

Scope: EVERY RPC of every api.proto service — PipelineService (all 13
unary: CRUD, start/stop, DLQ, export/import, plan/apply),
ConnectorService (7 incl. plugin specs), ProcessorService (6 incl.
plugin specs), InformationService, plus the three server-streaming
inspect RPCs (one DATA frame per buffered ``opencdc.v1.Record``
sample, then OK trailers; the bounded analog of the reference's live
streams, same drop-oldest buffer as the JSON ``/inspect`` routes) and
the deprecated PluginService combined listing.
"""

from __future__ import annotations

import base64
import re
import struct

from conduit_spark.functions import protowire as pw

# -- descriptors (field numbers verbatim from proto/api/v1/api.proto) ------

# google.protobuf.Timestamp (well-known type)
TIMESTAMP = {1: ("seconds", "int64"), 2: ("nanos", "int64")}

# api.proto:58-78 Pipeline.State
PIPELINE_STATE = {
    1: ("status", "enum"),
    2: ("error", "string"),
    3: ("stopped_reason", "enum"),
}
# api.proto:79-82 Pipeline.Config
PIPELINE_CONFIG = {1: ("name", "string"), 2: ("description", "string")}
# api.proto:41-111 Pipeline (fields 1,2,3,5,6,7,8 — 4 is reserved-gap)
PIPELINE = {
    1: ("id", "string"),
    2: ("state", "message", PIPELINE_STATE),
    3: ("config", "message", PIPELINE_CONFIG),
    5: ("connector_ids", "string*"),
    6: ("processor_ids", "string*"),
    7: ("created_at", "message", TIMESTAMP),
    8: ("updated_at", "message", TIMESTAMP),
}

# api.proto:84-99 Pipeline.DLQ
PIPELINE_DLQ = {
    1: ("plugin", "string"),
    2: ("settings", "map", ("string", "string")),
    3: ("window_size", "uint64"),
    4: ("window_nack_threshold", "uint64"),
}

# api.proto:686-721 PipelineDocument (the whole-pipeline plan/apply unit)
PDOC_PROCESSOR = {
    1: ("id", "string"),
    2: ("plugin", "string"),
    3: ("settings", "map", ("string", "string")),
    4: ("workers", "int32"),
    5: ("condition", "string"),
}
PDOC_CONNECTOR = {
    1: ("id", "string"),
    2: ("type", "string"),
    3: ("plugin", "string"),
    4: ("name", "string"),
    5: ("settings", "map", ("string", "string")),
    6: ("processors", "message*", PDOC_PROCESSOR),
}
PDOC_DLQ = {
    1: ("plugin", "string"),
    2: ("settings", "map", ("string", "string")),
    3: ("window_size", "uint64"),
    4: ("window_nack_threshold", "uint64"),
}
PIPELINE_DOCUMENT = {
    1: ("id", "string"),
    2: ("status", "string"),
    3: ("name", "string"),
    4: ("description", "string"),
    5: ("connectors", "message*", PDOC_CONNECTOR),
    6: ("processors", "message*", PDOC_PROCESSOR),
    7: ("dlq", "message", PDOC_DLQ),
}
# api.proto:728-750 Diff
DIFF_CHANGE = {
    1: ("resource", "string"),
    2: ("id", "string"),
    3: ("action", "string"),
    4: ("effect", "string"),
    5: ("config_paths", "string*"),
    6: ("code", "string"),
}
DIFF = {
    1: ("pipeline_id", "string"),
    2: ("changes", "message*", DIFF_CHANGE),
    3: ("hash", "string"),
}

# api.proto:604-648
LIST_PIPELINES_REQ = {1: ("name", "string")}
LIST_PIPELINES_RES = {1: ("pipelines", "message*", PIPELINE)}
CREATE_PIPELINE_REQ = {1: ("config", "message", PIPELINE_CONFIG)}
CREATE_PIPELINE_RES = {1: ("pipeline", "message", PIPELINE)}
GET_PIPELINE_REQ = {1: ("id", "string")}
GET_PIPELINE_RES = {1: ("pipeline", "message", PIPELINE)}
UPDATE_PIPELINE_REQ = {
    1: ("id", "string"),
    2: ("config", "message", PIPELINE_CONFIG),
}
UPDATE_PIPELINE_RES = {1: ("pipeline", "message", PIPELINE)}
DELETE_PIPELINE_REQ = {1: ("id", "string")}
DELETE_PIPELINE_RES: dict = {}
START_PIPELINE_REQ = {1: ("id", "string")}
START_PIPELINE_RES: dict = {}
STOP_PIPELINE_REQ = {1: ("id", "string"), 2: ("force", "bool")}
STOP_PIPELINE_RES: dict = {}
# api.proto:650-675
GET_DLQ_REQ = {1: ("id", "string")}
GET_DLQ_RECORDS_REQ = {1: ("id", "string"), 2: ("count", "uint64")}
GET_DLQ_RES = {1: ("dlq", "message", PIPELINE_DLQ)}
UPDATE_DLQ_REQ = {1: ("id", "string"), 2: ("dlq", "message", PIPELINE_DLQ)}
# records response reuses the inspect routes' opencdc.v1.Record shape
# (GET_DLQ_RECORDS_RES defined after OPENCDC_RECORD below)
UPDATE_DLQ_RES = {1: ("dlq", "message", PIPELINE_DLQ)}
EXPORT_PIPELINE_REQ = {1: ("id", "string")}
EXPORT_PIPELINE_RES = {1: ("pipeline", "message", PIPELINE)}
IMPORT_PIPELINE_REQ = {1: ("pipeline", "message", PIPELINE)}
IMPORT_PIPELINE_RES = {1: ("pipeline", "message", PIPELINE)}
# api.proto:752-765
PLAN_PIPELINE_REQ = {1: ("config", "message", PIPELINE_DOCUMENT)}
PLAN_PIPELINE_RES = {1: ("diff", "message", DIFF)}
APPLY_PIPELINE_REQ = {
    1: ("config", "message", PIPELINE_DOCUMENT),
    2: ("hash", "string"),
}
APPLY_PIPELINE_RES = {1: ("diff", "message", DIFF)}

# api.proto:131-134 Connector.Config
CONNECTOR_CONFIG = {
    1: ("name", "string"),
    2: ("settings", "map", ("string", "string")),
}
# api.proto:113-155 Connector (state oneof 2/3 not emitted: batch engine
# exposes positions through checkpoints, not the control plane)
CONNECTOR = {
    1: ("id", "string"),
    4: ("config", "message", CONNECTOR_CONFIG),
    5: ("type", "enum"),
    6: ("plugin", "string"),
    7: ("pipeline_id", "string"),
    8: ("processor_ids", "string*"),
}
# api.proto:157-195 Processor (+ Parent/Config)
PROCESSOR_PARENT = {1: ("type", "enum"), 2: ("id", "string")}
PROCESSOR_CONFIG = {
    1: ("settings", "map", ("string", "string")),
    2: ("workers", "int32"),
}
PROCESSOR = {
    1: ("id", "string"),
    3: ("config", "message", PROCESSOR_CONFIG),
    5: ("plugin", "string"),
    6: ("parent", "message", PROCESSOR_PARENT),
    9: ("condition", "string"),
}

# api.proto:929-991
CREATE_CONNECTOR_REQ = {
    1: ("type", "enum"),
    2: ("plugin", "string"),
    3: ("pipeline_id", "string"),
    4: ("config", "message", CONNECTOR_CONFIG),
}
CREATE_CONNECTOR_RES = {1: ("connector", "message", CONNECTOR)}
VALIDATE_CONNECTOR_REQ = {
    1: ("type", "enum"),
    2: ("plugin", "string"),
    4: ("config", "message", CONNECTOR_CONFIG),
}
VALIDATE_CONNECTOR_RES: dict = {}
LIST_CONNECTORS_REQ = {1: ("pipeline_id", "string")}
LIST_CONNECTORS_RES = {1: ("connectors", "message*", CONNECTOR)}
GET_CONNECTOR_REQ = {1: ("id", "string")}
GET_CONNECTOR_RES = {1: ("connector", "message", CONNECTOR)}
UPDATE_CONNECTOR_REQ = {
    1: ("id", "string"),
    2: ("config", "message", CONNECTOR_CONFIG),
    3: ("plugin", "string"),
}
UPDATE_CONNECTOR_RES = {1: ("connector", "message", CONNECTOR)}
DELETE_CONNECTOR_REQ = {1: ("id", "string")}
DELETE_CONNECTOR_RES: dict = {}

# api.proto:1140-1191
LIST_PROCESSORS_REQ = {1: ("parent_ids", "string*")}
LIST_PROCESSORS_RES = {1: ("processors", "message*", PROCESSOR)}
CREATE_PROCESSOR_REQ = {
    1: ("type", "string"),  # deprecated alias of plugin
    3: ("parent", "message", PROCESSOR_PARENT),
    4: ("config", "message", PROCESSOR_CONFIG),
    5: ("condition", "string"),
    6: ("plugin", "string"),
}
CREATE_PROCESSOR_RES = {1: ("processor", "message", PROCESSOR)}
GET_PROCESSOR_REQ = {1: ("id", "string")}
GET_PROCESSOR_RES = {1: ("processor", "message", PROCESSOR)}
UPDATE_PROCESSOR_REQ = {
    1: ("id", "string"),
    2: ("config", "message", PROCESSOR_CONFIG),
    3: ("plugin", "string"),
}
UPDATE_PROCESSOR_RES = {1: ("processor", "message", PROCESSOR)}
DELETE_PROCESSOR_REQ = {1: ("id", "string")}
DELETE_PROCESSOR_RES: dict = {}

# opencdc.v1 (conduit-commons opencdc/v1/opencdc.proto — the PUBLIC
# record schema every Conduit plugin speaks). Data's oneof arm 2
# (google.protobuf.Struct structured_data) is not emitted: inspection
# renders structured payloads as their canonical JSON bytes in
# raw_data, which the oneof permits and every consumer can parse.
OPENCDC_DATA = {1: ("raw_data", "bytes")}
OPENCDC_CHANGE = {
    1: ("before", "message", OPENCDC_DATA),
    2: ("after", "message", OPENCDC_DATA),
}
OPENCDC_RECORD = {
    1: ("position", "bytes"),
    2: ("operation", "enum"),
    3: ("metadata", "map", ("string", "string")),
    4: ("key", "message", OPENCDC_DATA),
    5: ("payload", "message", OPENCDC_CHANGE),
}
# opencdc.v1.Operation
_OPERATION_ENUM = {"create": 1, "update": 2, "delete": 3, "snapshot": 4}

# api.proto:965-970, 1147-1159 (server-streaming inspect)
GET_DLQ_RECORDS_RES = {1: ("records", "message*", OPENCDC_RECORD)}
INSPECT_CONNECTOR_REQ = {1: ("id", "string")}
INSPECT_CONNECTOR_RES = {1: ("record", "message", OPENCDC_RECORD)}
INSPECT_PROCESSOR_IN_REQ = {1: ("id", "string")}
INSPECT_PROCESSOR_IN_RES = {1: ("record", "message", OPENCDC_RECORD)}
INSPECT_PROCESSOR_OUT_REQ = {1: ("id", "string")}
INSPECT_PROCESSOR_OUT_RES = {1: ("record", "message", OPENCDC_RECORD)}


# config.v1.Parameter (conduit-commons) — field numbers identical to
# the VENDORED deprecated PluginSpecifications.Parameter
# (api.proto:246-291), which the commons type superseded 1:1.
PARAM_VALIDATION = {1: ("type", "enum"), 2: ("value", "string")}
PARAMETER = {
    1: ("description", "string"),
    2: ("default", "string"),
    3: ("type", "enum"),
    4: ("validations", "message*", PARAM_VALIDATION),
}
_PARAM_TYPE_STRING = 1  # Parameter.Type.TYPE_STRING
_VALIDATION_REQUIRED = 1  # Validation.Type.TYPE_REQUIRED

# api.proto:197-221 / 223-241
CONNECTOR_PLUGIN_SPECS = {
    1: ("name", "string"),
    2: ("summary", "string"),
    3: ("description", "string"),
    4: ("version", "string"),
    5: ("author", "string"),
    6: ("destination_params", "map", ("string", ("message", PARAMETER))),
    7: ("source_params", "map", ("string", ("message", PARAMETER))),
}
PROCESSOR_PLUGIN_SPECS = {
    1: ("name", "string"),
    2: ("summary", "string"),
    3: ("description", "string"),
    4: ("version", "string"),
    5: ("author", "string"),
    6: ("parameters", "map", ("string", ("message", PARAMETER))),
}
# api.proto:993-1000, 1193-1200
LIST_CONNECTOR_PLUGINS_REQ = {1: ("name", "string")}
LIST_CONNECTOR_PLUGINS_RES = {
    1: ("plugins", "message*", CONNECTOR_PLUGIN_SPECS)
}
LIST_PROCESSOR_PLUGINS_REQ = {1: ("name", "string")}
LIST_PROCESSOR_PLUGINS_RES = {
    1: ("plugins", "message*", PROCESSOR_PLUGIN_SPECS)
}

# api.proto:1202-1220 InformationService
INFO = {1: ("version", "string"), 2: ("os", "string"), 3: ("arch", "string")}
GET_INFO_REQ: dict = {}
GET_INFO_RES = {1: ("info", "message", INFO)}


# Pipeline.Status (api.proto:43-56) / State.StoppedReason (api.proto:65-77)
_STATUS_ENUM = {
    "running": 1,
    "stopped": 2,
    "provisioned": 2,  # created-but-never-started presents as STOPPED
    "degraded": 3,
    "failed": 3,
    "recovering": 4,
}
_STOPPED_REASON_ENUM = {"user": 1, "system": 2}

# gRPC status codes (google.golang.org/grpc/codes — public constants)
OK, INVALID_ARGUMENT, NOT_FOUND, ALREADY_EXISTS, INTERNAL = 0, 3, 5, 6, 13


class GrpcError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code


# -- model mapping ---------------------------------------------------------


def _pb_pipeline(doc: dict) -> dict:
    """ControlPlane detail/summary dict → api.v1.Pipeline field dict."""
    status = doc.get("status") or ""
    state = {
        "status": _STATUS_ENUM.get(status, 0),
        "error": doc.get("error") or "",
        "stopped_reason": _STOPPED_REASON_ENUM.get(
            doc.get("stopped_reason") or "", 0
        ),
    }
    connectors = doc.get("connectors")
    if connectors is None:  # summary row: sources + destinations
        connector_ids = [
            c["id"]
            for c in (doc.get("sources") or []) + (doc.get("destinations") or [])
        ]
    else:
        connector_ids = [c["id"] for c in connectors]
    processors = doc.get("processors") or []
    processor_ids = [
        p["id"] if isinstance(p, dict) else str(p) for p in processors
    ]
    return {
        "id": doc["id"],
        "state": state,
        "config": {
            "name": doc.get("name") or "",
            "description": doc.get("description") or "",
        },
        "connector_ids": connector_ids,
        "processor_ids": processor_ids,
    }


# -- handlers --------------------------------------------------------------


def _h_list(plane, req: dict) -> dict:
    rx = re.compile(req["name"]) if req.get("name") else None
    out = []
    for row in plane.list():
        # the list row lacks config name/description — hydrate
        doc = plane.get(row["id"]) or row
        if rx and not rx.search(doc.get("name") or ""):
            continue
        out.append(_pb_pipeline(doc))
    return {"pipelines": out}


def _h_get(plane, req: dict) -> dict:
    doc = plane.get(req["id"])
    if doc is None:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found")
    return {"pipeline": _pb_pipeline(doc)}


def _h_create(plane, req: dict) -> dict:
    cfg = req.get("config") or {}
    name = cfg.get("name") or ""
    if not name:
        raise GrpcError(INVALID_ARGUMENT, "config.name is required")
    doc = plane.create(
        {
            "id": name,  # reference derives the id; name doubles as id here
            "name": name,
            "description": cfg.get("description") or "",
            "status": "stopped",
            "connectors": [],
        }
    )
    return {"pipeline": _pb_pipeline(doc)}


def _h_update(plane, req: dict) -> dict:
    pid = req["id"]
    try:
        existing = dict(plane.export_pipeline(pid))
    except LookupError:
        raise GrpcError(NOT_FOUND, f"pipeline {pid!r} not found") from None
    cfg = req.get("config") or {}
    existing["name"] = cfg.get("name") or ""
    existing["description"] = cfg.get("description") or ""
    doc = plane.update(pid, existing)
    if doc is None:
        raise GrpcError(NOT_FOUND, f"pipeline {pid!r} not found")
    return {"pipeline": _pb_pipeline(doc)}


def _h_delete(plane, req: dict) -> dict:
    if not plane.delete(req["id"]):
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found")
    return {}


def _h_start(plane, req: dict) -> dict:
    if plane.get(req["id"]) is None:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found")
    plane.start(req["id"])
    return {}


def _h_stop(plane, req: dict) -> dict:
    if plane.get(req["id"]) is None:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found")
    plane.stop(req["id"], force=bool(req.get("force")))
    return {}


# Connector.Type (api.proto:115-121) / Processor.Parent.Type (:160-168)
_CONNECTOR_TYPE = {"source": 1, "destination": 2}
_CONNECTOR_TYPE_REV = {1: "source", 2: "destination"}
_PARENT_TYPE = {"connector": 1, "pipeline": 2}
_PARENT_TYPE_REV = {1: "connector", 2: "pipeline"}


def _pb_connector(doc: dict) -> dict:
    return {
        "id": doc["id"],
        "config": {
            "name": doc["id"].split(":", 1)[-1],
            "settings": {k: str(v) for k, v in (doc.get("settings") or {}).items()},
        },
        "type": _CONNECTOR_TYPE.get(doc.get("type") or "", 0),
        "plugin": doc.get("plugin") or "",
        "pipeline_id": doc.get("pipeline_id") or "",
        "processor_ids": [p["id"] for p in doc.get("processors") or []],
    }


def _pb_processor(doc: dict) -> dict:
    parent = doc.get("parent") or {}
    return {
        "id": doc["id"],
        "config": {
            "settings": {k: str(v) for k, v in (doc.get("settings") or {}).items()},
            "workers": int(doc.get("workers") or 0),
        },
        "plugin": doc.get("plugin") or "",
        "parent": {
            "type": _PARENT_TYPE.get(parent.get("type") or "", 0),
            "id": parent.get("id") or "",
        },
        "condition": doc.get("condition") or "",
    }


def _pb_opencdc(rec: dict) -> dict:
    """RAW inspector record (envelope dict with real bytes) →
    ``opencdc.v1.Record`` field dict."""

    def b(v) -> bytes:
        if v is None:
            return b""
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return str(v).encode("utf-8")

    def data(raw, json_s):
        if raw is not None:
            return {"raw_data": b(raw)}
        if json_s is not None:
            return {"raw_data": str(json_s).encode("utf-8")}
        return None

    payload = {
        "before": data(None, rec.get("payload_before_json")),
        "after": data(
            rec.get("payload_after_raw"), rec.get("payload_after_json")
        ),
    }
    return {
        "position": b(rec.get("position")),
        "operation": _OPERATION_ENUM.get(rec.get("operation") or "", 0),
        "metadata": {
            str(k): str(v) for k, v in (rec.get("metadata") or {}).items()
        },
        "key": data(rec.get("key_raw"), rec.get("key_json")),
        "payload": payload,
    }


def _inspect_handler(kind: str, direction: str):
    def h(plane, req: dict) -> list[dict]:
        try:
            doc = plane.inspect(
                req["id"], kind, count=64, direction=direction, raw=True
            )
        except LookupError:
            raise GrpcError(
                NOT_FOUND, f"{kind} {req['id']!r} not found"
            ) from None
        return [{"record": _pb_opencdc(r)} for r in doc["records"]]

    return h


def _h_list_connectors(plane, req: dict) -> dict:
    rows = plane.list_connectors(req.get("pipeline_id") or None)
    return {"connectors": [_pb_connector(r) for r in rows]}


def _h_get_connector(plane, req: dict) -> dict:
    try:
        return {"connector": _pb_connector(plane.get_connector(req["id"]))}
    except LookupError:
        raise GrpcError(NOT_FOUND, f"connector {req['id']!r} not found") from None


def _h_create_connector(plane, req: dict) -> dict:
    cfg = req.get("config") or {}
    doc = plane.create_connector(
        {
            "pipeline_id": req.get("pipeline_id"),
            "type": _CONNECTOR_TYPE_REV.get(req.get("type") or 0, ""),
            "plugin": req.get("plugin") or "",
            "id": cfg.get("name") or "",
            "settings": cfg.get("settings") or {},
        }
    )
    return {"connector": _pb_connector(doc)}


def _h_validate_connector(plane, req: dict) -> dict:
    from conduit_spark.pipeline.registry import validate_connector

    cfg = req.get("config") or {}
    errors = validate_connector(
        _CONNECTOR_TYPE_REV.get(req.get("type") or 0, ""),
        req.get("plugin") or "",
        cfg.get("settings") or {},
    )
    if errors:
        raise GrpcError(INVALID_ARGUMENT, "; ".join(errors))
    return {}


def _h_update_connector(plane, req: dict) -> dict:
    cfg = req.get("config") or {}
    doc: dict = {}
    if req.get("plugin"):
        doc["plugin"] = req["plugin"]
    if cfg.get("settings"):
        doc["settings"] = cfg["settings"]
    try:
        out = plane.update_connector(req["id"], doc)
    except LookupError:
        raise GrpcError(NOT_FOUND, f"connector {req['id']!r} not found") from None
    return {"connector": _pb_connector(out)}


def _h_delete_connector(plane, req: dict) -> dict:
    try:
        plane.delete_connector(req["id"])
    except LookupError:
        raise GrpcError(NOT_FOUND, f"connector {req['id']!r} not found") from None
    return {}


def _h_list_processors(plane, req: dict) -> dict:
    rows = plane.list_processors()
    wanted = set(req.get("parent_ids") or [])
    if wanted:
        rows = [r for r in rows if (r.get("parent") or {}).get("id") in wanted]
    return {"processors": [_pb_processor(r) for r in rows]}


def _h_get_processor(plane, req: dict) -> dict:
    try:
        return {"processor": _pb_processor(plane.get_processor(req["id"]))}
    except LookupError:
        raise GrpcError(NOT_FOUND, f"processor {req['id']!r} not found") from None


def _h_create_processor(plane, req: dict) -> dict:
    parent = req.get("parent") or {}
    cfg = req.get("config") or {}
    doc = plane.create_processor(
        {
            "plugin": req.get("plugin") or req.get("type") or "",
            "parent": {
                "type": _PARENT_TYPE_REV.get(parent.get("type") or 0, "pipeline"),
                "id": parent.get("id") or "",
            },
            "settings": cfg.get("settings") or {},
            "workers": int(cfg.get("workers") or 1),
            "condition": req.get("condition") or None,
        }
    )
    return {"processor": _pb_processor(doc)}


def _h_update_processor(plane, req: dict) -> dict:
    cfg = req.get("config") or {}
    doc: dict = {}
    if cfg.get("settings"):
        doc["settings"] = cfg["settings"]
    if cfg.get("workers"):
        doc["workers"] = cfg["workers"]
    try:
        out = plane.update_processor(req["id"], doc)
    except LookupError:
        raise GrpcError(NOT_FOUND, f"processor {req['id']!r} not found") from None
    return {"processor": _pb_processor(out)}


def _h_delete_processor(plane, req: dict) -> dict:
    try:
        plane.delete_processor(req["id"])
    except LookupError:
        raise GrpcError(NOT_FOUND, f"processor {req['id']!r} not found") from None
    return {}


def _pb_dlq(doc: dict) -> dict:
    return {
        "plugin": doc.get("plugin") or "",
        "settings": {k: str(v) for k, v in (doc.get("settings") or {}).items()},
        "window_size": int(doc.get("window_size") or 0),
        "window_nack_threshold": int(doc.get("window_nack_threshold") or 0),
    }


def _h_get_dlq(plane, req: dict) -> dict:
    try:
        return {"dlq": _pb_dlq(plane.get_dlq(req["id"]))}
    except LookupError:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found") from None


def _h_dlq_records(plane, req: dict) -> dict:
    try:
        out = plane.get_dlq_records(
            req["id"], count=int(req.get("count") or 10)
        )
    except LookupError:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found") from None
    except ValueError as e:  # log-backed DLQ: no record store
        raise GrpcError(INVALID_ARGUMENT, str(e)) from None
    return {"records": [_pb_opencdc(r) for r in out["records"]]}


def _h_update_dlq(plane, req: dict) -> dict:
    try:
        out = plane.update_dlq(req["id"], req.get("dlq") or {})
    except LookupError:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found") from None
    return {"dlq": _pb_dlq(out)}


def _h_export(plane, req: dict) -> dict:
    doc = plane.get(req["id"])
    if doc is None:
        raise GrpcError(NOT_FOUND, f"pipeline {req['id']!r} not found")
    return {"pipeline": _pb_pipeline(doc)}


def _h_import(plane, req: dict) -> dict:
    p = req.get("pipeline") or {}
    cfg = p.get("config") or {}
    pid = p.get("id") or cfg.get("name") or ""
    if not pid:
        raise GrpcError(INVALID_ARGUMENT, "pipeline.id or config.name required")
    doc = plane.create(
        {
            "id": pid,
            "name": cfg.get("name") or pid,
            "description": cfg.get("description") or "",
            "status": "stopped",
            "connectors": [],
        }
    )
    return {"pipeline": _pb_pipeline(doc)}


def _pdoc_to_dict(doc: dict) -> dict:
    """PipelineDocument message → the v2 YAML dict plane.plan/apply
    parse (dash-keyed DLQ, settings maps verbatim)."""

    def proc(p: dict) -> dict:
        out = {"id": p["id"], "plugin": p["plugin"]}
        if p.get("settings"):
            out["settings"] = dict(p["settings"])
        if p.get("workers"):
            out["workers"] = int(p["workers"])
        if p.get("condition"):
            out["condition"] = p["condition"]
        return out

    out: dict = {"id": doc.get("id") or ""}
    if doc.get("status"):
        out["status"] = doc["status"]
    if doc.get("name"):
        out["name"] = doc["name"]
    if doc.get("description"):
        out["description"] = doc["description"]
    if doc.get("connectors"):
        out["connectors"] = [
            {
                "id": c["id"],
                "type": c.get("type") or "",
                "plugin": c.get("plugin") or "",
                **({"settings": dict(c["settings"])} if c.get("settings") else {}),
                **(
                    {"processors": [proc(p) for p in c["processors"]]}
                    if c.get("processors")
                    else {}
                ),
            }
            for c in doc["connectors"]
        ]
    if doc.get("processors"):
        out["processors"] = [proc(p) for p in doc["processors"]]
    dlq = doc.get("dlq")
    if dlq is not None:
        out["dead-letter-queue"] = {
            "plugin": dlq.get("plugin") or "builtin:log",
            "settings": dict(dlq.get("settings") or {}),
            "window-size": int(dlq.get("window_size") or 1),
            "window-nack-threshold": int(dlq.get("window_nack_threshold") or 0),
        }
    return out


def _pb_diff(diff: dict) -> dict:
    return {
        "pipeline_id": diff.get("pipeline_id") or "",
        "changes": [
            {
                "resource": c.get("resource") or "",
                "id": c.get("id") or "",
                "action": c.get("action") or "",
                "effect": c.get("effect") or "",
                "config_paths": list(c.get("config_paths") or []),
                "code": c.get("code") or "",
            }
            for c in diff.get("changes") or []
        ],
        "hash": diff.get("hash") or "",
    }


def _h_plan(plane, req: dict) -> dict:
    cfg = req.get("config")
    if not cfg or not cfg.get("id"):
        raise GrpcError(INVALID_ARGUMENT, "config.id is required")
    return {"diff": _pb_diff(plane.plan(_pdoc_to_dict(cfg)))}


def _h_apply(plane, req: dict) -> dict:
    from conduit_spark.errors import ConduitError

    cfg = req.get("config")
    if not cfg or not cfg.get("id"):
        raise GrpcError(INVALID_ARGUMENT, "config.id is required")
    try:
        diff = plane.apply(_pdoc_to_dict(cfg), req.get("hash") or "")
    except ConduitError as e:
        # stale plan / restart-required refusals are preconditions
        raise GrpcError(9, f"{e.code}: {e}") from None  # FAILED_PRECONDITION
    return {"diff": _pb_diff(diff)}


def _required_param() -> dict:
    return {
        "description": "",
        "default": "",
        "type": _PARAM_TYPE_STRING,
        "validations": [{"type": _VALIDATION_REQUIRED, "value": ""}],
    }


def _h_list_connector_plugins(plane, req: dict) -> dict:
    from conduit_spark import __version__
    from conduit_spark.pipeline.registry import (
        _CONNECTOR_REQUIRED,
        CONNECTOR_PLUGINS,
    )

    rx = re.compile(req["name"]) if req.get("name") else None
    out = []
    for name, info in sorted(CONNECTOR_PLUGINS.items()):
        if rx and not rx.search(name):
            continue
        spec = {
            "name": name,
            "summary": info.get("description", ""),
            "description": info.get("description", ""),
            "version": f"v{__version__}",
            "author": "conduit-spark",
            "source_params": {},
            "destination_params": {},
        }
        for d, field in (
            ("source", "source_params"),
            ("destination", "destination_params"),
        ):
            if info.get(d, False):
                spec[field] = {
                    k: _required_param()
                    for k in _CONNECTOR_REQUIRED.get((name, d), ())
                }
        out.append(spec)
    return {"plugins": out}


def _h_list_processor_plugins(plane, req: dict) -> dict:
    from conduit_spark import __version__
    from conduit_spark.pipeline.registry import PROCESSOR_PLUGINS

    rx = re.compile(req["name"]) if req.get("name") else None
    return {
        "plugins": [
            {
                "name": name,
                "summary": summary,
                "description": summary,
                "version": f"v{__version__}",
                "author": "conduit-spark",
                "parameters": {},
            }
            for name, summary in sorted(PROCESSOR_PLUGINS.items())
            if rx is None or rx.search(name)
        ]
    }


def _h_get_info(plane, req: dict) -> dict:
    import platform

    from conduit_spark import __version__

    return {
        "info": {
            "version": f"v{__version__}",
            "os": platform.system().lower(),
            "arch": platform.machine(),
        }
    }


# method → (request descriptor, response descriptor, handler)
SERVICES = {
    "api.v1.PipelineService": {
        "ListPipelines": (LIST_PIPELINES_REQ, LIST_PIPELINES_RES, _h_list),
        "CreatePipeline": (CREATE_PIPELINE_REQ, CREATE_PIPELINE_RES, _h_create),
        "GetPipeline": (GET_PIPELINE_REQ, GET_PIPELINE_RES, _h_get),
        "UpdatePipeline": (UPDATE_PIPELINE_REQ, UPDATE_PIPELINE_RES, _h_update),
        "DeletePipeline": (DELETE_PIPELINE_REQ, DELETE_PIPELINE_RES, _h_delete),
        "StartPipeline": (START_PIPELINE_REQ, START_PIPELINE_RES, _h_start),
        "StopPipeline": (STOP_PIPELINE_REQ, STOP_PIPELINE_RES, _h_stop),
        "GetDLQ": (GET_DLQ_REQ, GET_DLQ_RES, _h_get_dlq),
        "GetDLQRecords": (
            GET_DLQ_RECORDS_REQ, GET_DLQ_RECORDS_RES, _h_dlq_records,
        ),
        "UpdateDLQ": (UPDATE_DLQ_REQ, UPDATE_DLQ_RES, _h_update_dlq),
        "ExportPipeline": (
            EXPORT_PIPELINE_REQ, EXPORT_PIPELINE_RES, _h_export,
        ),
        "ImportPipeline": (
            IMPORT_PIPELINE_REQ, IMPORT_PIPELINE_RES, _h_import,
        ),
        "PlanPipeline": (PLAN_PIPELINE_REQ, PLAN_PIPELINE_RES, _h_plan),
        "ApplyPipeline": (APPLY_PIPELINE_REQ, APPLY_PIPELINE_RES, _h_apply),
    },
    "api.v1.ConnectorService": {
        "ListConnectors": (
            LIST_CONNECTORS_REQ, LIST_CONNECTORS_RES, _h_list_connectors,
        ),
        "GetConnector": (GET_CONNECTOR_REQ, GET_CONNECTOR_RES, _h_get_connector),
        "CreateConnector": (
            CREATE_CONNECTOR_REQ, CREATE_CONNECTOR_RES, _h_create_connector,
        ),
        "ValidateConnector": (
            VALIDATE_CONNECTOR_REQ, VALIDATE_CONNECTOR_RES, _h_validate_connector,
        ),
        "UpdateConnector": (
            UPDATE_CONNECTOR_REQ, UPDATE_CONNECTOR_RES, _h_update_connector,
        ),
        "DeleteConnector": (
            DELETE_CONNECTOR_REQ, DELETE_CONNECTOR_RES, _h_delete_connector,
        ),
        "InspectConnector": (
            INSPECT_CONNECTOR_REQ, INSPECT_CONNECTOR_RES,
            _inspect_handler("connector", "out"), "stream",
        ),
        "ListConnectorPlugins": (
            LIST_CONNECTOR_PLUGINS_REQ, LIST_CONNECTOR_PLUGINS_RES,
            _h_list_connector_plugins,
        ),
    },
    "api.v1.ProcessorService": {
        "ListProcessors": (
            LIST_PROCESSORS_REQ, LIST_PROCESSORS_RES, _h_list_processors,
        ),
        "GetProcessor": (GET_PROCESSOR_REQ, GET_PROCESSOR_RES, _h_get_processor),
        "CreateProcessor": (
            CREATE_PROCESSOR_REQ, CREATE_PROCESSOR_RES, _h_create_processor,
        ),
        "UpdateProcessor": (
            UPDATE_PROCESSOR_REQ, UPDATE_PROCESSOR_RES, _h_update_processor,
        ),
        "DeleteProcessor": (
            DELETE_PROCESSOR_REQ, DELETE_PROCESSOR_RES, _h_delete_processor,
        ),
        "InspectProcessorIn": (
            INSPECT_PROCESSOR_IN_REQ, INSPECT_PROCESSOR_IN_RES,
            _inspect_handler("processor", "in"), "stream",
        ),
        "InspectProcessorOut": (
            INSPECT_PROCESSOR_OUT_REQ, INSPECT_PROCESSOR_OUT_RES,
            _inspect_handler("processor", "out"), "stream",
        ),
        "ListProcessorPlugins": (
            LIST_PROCESSOR_PLUGINS_REQ, LIST_PROCESSOR_PLUGINS_RES,
            _h_list_processor_plugins,
        ),
    },
    "api.v1.InformationService": {
        "GetInfo": (GET_INFO_REQ, GET_INFO_RES, _h_get_info),
    },
    # Deprecated combined listing (api.proto:1224-1243); the
    # PluginSpecifications message shares ConnectorPluginSpecifications'
    # field numbers, so the descriptor is reused.
    "api.v1.PluginService": {
        "ListPlugins": (
            LIST_CONNECTOR_PLUGINS_REQ,
            LIST_CONNECTOR_PLUGINS_RES,
            lambda plane, req: {
                "plugins": (
                    _h_list_connector_plugins(plane, req)["plugins"]
                    + [
                        {**p, "source_params": {}, "destination_params": {}}
                        for p in _h_list_processor_plugins(plane, req)["plugins"]
                    ]
                )
            },
        ),
    },
}


# -- grpc-web framing ------------------------------------------------------


def frame(flags: int, payload: bytes) -> bytes:
    return struct.pack(">BI", flags, len(payload)) + payload


def unframe(body: bytes) -> list[tuple[int, bytes]]:
    out = []
    pos = 0
    while pos + 5 <= len(body):
        flags, ln = struct.unpack_from(">BI", body, pos)
        pos += 5
        out.append((flags, body[pos : pos + ln]))
        pos += ln
    return out


def _trailers(code: int, message: str = "") -> bytes:
    text = f"grpc-status: {code}\r\n"
    if message:
        # grpc-message is percent-encoded per the gRPC HTTP/2 spec
        # (ASCII printable kept verbatim except '%'); unencoded CR/LF
        # from an exception string would corrupt the trailer block
        from urllib.parse import quote

        safe = " !\"#$&'()*+,-./:;<=>?@[]^_`{|}~"
        text += "grpc-message: " + quote(message, safe=safe) + "\r\n"
    return frame(0x80, text.encode("utf-8"))


def handle_grpc_web(
    plane, path: str, body: bytes, content_type: str
) -> tuple[int, bytes, str] | None:
    """Dispatch one gRPC-Web call. Returns ``(http_status, body,
    content_type)`` or ``None`` when ``path`` names no known service
    (caller falls through to the JSON routes). Errors are expressed
    the gRPC way: HTTP 200 with a non-zero ``grpc-status`` trailer."""
    parts = path.lstrip("/").split("/")
    if len(parts) != 2 or parts[0] not in SERVICES:
        return None
    service, method = parts
    is_text = "grpc-web-text" in content_type
    resp_ct = (
        "application/grpc-web-text+proto" if is_text
        else "application/grpc-web+proto"
    )
    spec = SERVICES[service].get(method)
    if spec is None:
        return 200, _unimplemented(method, is_text), resp_ct
    req_desc, res_desc, handler = spec[:3]
    streaming = len(spec) > 3 and spec[3] == "stream"
    try:
        raw = base64.b64decode(body) if is_text else body
        frames = unframe(raw)
        msg = next((p for f, p in frames if not f & 0x80), b"")
        req = pw.decode(req_desc, msg)
        res = handler(plane, req)
        if streaming:
            # server stream: one DATA frame per message, then trailers.
            # Our inspector is buffered-sample (drop-oldest), so the
            # stream is the current sample then a clean end — the
            # bounded analog of the reference's live stream.
            out = (
                b"".join(frame(0x00, pw.encode(res_desc, m)) for m in res)
                + _trailers(OK)
            )
        else:
            out = frame(0x00, pw.encode(res_desc, res)) + _trailers(OK)
    except GrpcError as e:
        out = _trailers(e.code, str(e))
    except Exception as e:  # noqa: BLE001 — every failure maps to a gRPC code
        from conduit_spark.http_api import Conflict  # deferred: no cycle

        if isinstance(e, Conflict):
            out = _trailers(ALREADY_EXISTS, str(e))
        elif isinstance(e, (ValueError, KeyError, re.error)):
            # re.error: a malformed user-supplied name regex is a
            # client fault, not an internal one
            out = _trailers(INVALID_ARGUMENT, f"{type(e).__name__}: {e}")
        elif isinstance(e, LookupError):
            out = _trailers(NOT_FOUND, str(e))
        else:
            out = _trailers(INTERNAL, f"{type(e).__name__}: {e}")
    if is_text:
        out = base64.b64encode(out)
    return 200, out, resp_ct


def _unimplemented(method: str, is_text: bool) -> bytes:
    out = _trailers(12, f"method {method!r} not implemented")  # UNIMPLEMENTED
    return base64.b64encode(out) if is_text else out
