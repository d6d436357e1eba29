"""gRPC-Web surface tests: wire framing + protobuf bytes over HTTP.

Requests are built with the engine's own protowire codec AND pinned
against hand-computed golden protobuf bytes, so a mismatch between our
codec and the public encoding can't self-cancel. Field numbers mirror
reference ``proto/api/v1/api.proto`` (Pipeline:41, requests:604-648).
"""

from __future__ import annotations

import base64
import struct
import threading
import urllib.request

import pytest

from conduit_spark import grpc_web as gw
from conduit_spark.functions import protowire as pw
from conduit_spark.http_api import ControlPlane, start_server
from conduit_spark.pipeline.config import parse_yaml

YAML = """
version: "2.2"
pipelines:
  - id: demo
    status: running
    name: demo
    description: demo pipeline
    connectors:
      - id: src
        type: source
        plugin: builtin:generator
        settings: {recordCount: 5, format.options: {id: int}}
      - id: dst
        type: destination
        plugin: builtin:log
        settings: {}
    processors:
      - id: keep
        plugin: filter
        condition: '{{ true }}'
"""


@pytest.fixture()
def server():
    started = threading.Event()

    def runner(cfg, stop):
        started.set()
        stop.wait(timeout=30)
        return "stopped"

    plane = ControlPlane(parse_yaml(YAML), runner=runner)
    srv = start_server(plane)
    yield plane, srv.server_address[1], started
    srv.shutdown()


def _call(port, method, msg_bytes, ctype="application/grpc-web+proto"):
    body = gw.frame(0x00, msg_bytes)
    if "text" in ctype:
        body = base64.b64encode(body)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api.v1.PipelineService/{method}",
        data=body,
        method="POST",
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        raw = resp.read()
        if "text" in ctype:
            raw = base64.b64decode(raw)
        return resp.status, resp.headers.get("Content-Type"), gw.unframe(raw)


def _status_of(frames):
    trailer = next(p for f, p in frames if f & 0x80).decode()
    for line in trailer.splitlines():
        if line.startswith("grpc-status:"):
            return int(line.split(":")[1].strip())
    raise AssertionError(f"no grpc-status in {trailer!r}")


def _msg_of(frames, desc):
    data = next((p for f, p in frames if not f & 0x80), None)
    assert data is not None, "no DATA frame"
    return pw.decode(desc, data)


# -- framing golden bytes --------------------------------------------------


def test_frame_layout_is_grpc_web_spec():
    f = gw.frame(0x00, b"abc")
    assert f == b"\x00" + struct.pack(">I", 3) + b"abc"
    t = gw.frame(0x80, b"grpc-status: 0\r\n")
    assert t[0] == 0x80
    assert gw.unframe(f + t) == [(0, b"abc"), (0x80, b"grpc-status: 0\r\n")]


def test_golden_get_request_bytes():
    """GetPipelineRequest{id:"demo"} per the protobuf spec is exactly
    tag 0x0A (field 1, LEN) + len 4 + "demo"."""
    assert pw.encode(gw.GET_PIPELINE_REQ, {"id": "demo"}) == b"\x0a\x04demo"


# -- RPCs ------------------------------------------------------------------


def test_get_pipeline_roundtrip(server):
    _, port, _ = server
    status, ctype, frames = _call(
        port, "GetPipeline", b"\x0a\x04demo"  # golden bytes, not our codec
    )
    assert status == 200 and ctype == "application/grpc-web+proto"
    assert _status_of(frames) == gw.OK
    res = _msg_of(frames, gw.GET_PIPELINE_RES)
    p = res["pipeline"]
    assert p["id"] == "demo"
    assert p["config"]["name"] == "demo"
    assert p["config"]["description"] == "demo pipeline"
    assert p["connector_ids"] == ["src", "dst"]
    # created-not-started presents as STATUS_STOPPED (=2)
    assert p["state"]["status"] == 2


def test_get_pipeline_not_found_is_grpc_status_5(server):
    _, port, _ = server
    msg = pw.encode(gw.GET_PIPELINE_REQ, {"id": "nope"})
    status, _, frames = _call(port, "GetPipeline", msg)
    assert status == 200  # gRPC errors ride trailers, not HTTP status
    assert _status_of(frames) == gw.NOT_FOUND
    assert all(f & 0x80 for f, _ in frames)  # trailers-only


def test_list_pipelines_with_name_regex(server):
    _, port, _ = server
    _, _, frames = _call(
        port, "ListPipelines", pw.encode(gw.LIST_PIPELINES_REQ, {})
    )
    res = _msg_of(frames, gw.LIST_PIPELINES_RES)
    assert [p["id"] for p in res["pipelines"]] == ["demo"]
    _, _, frames = _call(
        port,
        "ListPipelines",
        pw.encode(gw.LIST_PIPELINES_REQ, {"name": "^nomatch$"}),
    )
    res = _msg_of(frames, gw.LIST_PIPELINES_RES)
    assert res["pipelines"] == []


def test_create_update_delete_lifecycle(server):
    plane, port, _ = server
    msg = pw.encode(
        gw.CREATE_PIPELINE_REQ,
        {"config": {"name": "fresh", "description": "made via grpc-web"}},
    )
    _, _, frames = _call(port, "CreatePipeline", msg)
    assert _status_of(frames) == gw.OK
    p = _msg_of(frames, gw.CREATE_PIPELINE_RES)["pipeline"]
    assert p["id"] == "fresh"
    assert p["config"]["description"] == "made via grpc-web"
    # duplicate create → ALREADY_EXISTS (6)
    _, _, frames = _call(port, "CreatePipeline", msg)
    assert _status_of(frames) == gw.ALREADY_EXISTS
    # update description
    upd = pw.encode(
        gw.UPDATE_PIPELINE_REQ,
        {"id": "fresh", "config": {"name": "fresh", "description": "v2"}},
    )
    _, _, frames = _call(port, "UpdatePipeline", upd)
    assert _status_of(frames) == gw.OK
    assert (
        _msg_of(frames, gw.UPDATE_PIPELINE_RES)["pipeline"]["config"][
            "description"
        ]
        == "v2"
    )
    assert plane.get("fresh")["description"] == "v2"
    # delete, then delete again → NOT_FOUND
    dele = pw.encode(gw.DELETE_PIPELINE_REQ, {"id": "fresh"})
    _, _, frames = _call(port, "DeletePipeline", dele)
    assert _status_of(frames) == gw.OK
    _, _, frames = _call(port, "DeletePipeline", dele)
    assert _status_of(frames) == gw.NOT_FOUND


def test_start_stop_drive_the_runner(server):
    plane, port, started = server
    _, _, frames = _call(
        port, "StartPipeline", pw.encode(gw.START_PIPELINE_REQ, {"id": "demo"})
    )
    assert _status_of(frames) == gw.OK
    assert started.wait(timeout=10)
    assert plane.status("demo") == "running"
    _, _, frames = _call(
        port,
        "StopPipeline",
        pw.encode(gw.STOP_PIPELINE_REQ, {"id": "demo", "force": False}),
    )
    assert _status_of(frames) == gw.OK
    assert plane.wait("demo", timeout=10) in ("stopped", "provisioned")


def test_grpc_web_text_base64_mode(server):
    _, port, _ = server
    status, ctype, frames = _call(
        port,
        "GetPipeline",
        pw.encode(gw.GET_PIPELINE_REQ, {"id": "demo"}),
        ctype="application/grpc-web-text+proto",
    )
    assert status == 200
    assert ctype == "application/grpc-web-text+proto"
    assert _status_of(frames) == gw.OK
    assert _msg_of(frames, gw.GET_PIPELINE_RES)["pipeline"]["id"] == "demo"


def test_unknown_method_is_unimplemented(server):
    _, port, _ = server
    _, _, frames = _call(port, "FlyPipeline", b"")
    assert _status_of(frames) == 12  # UNIMPLEMENTED


def test_json_routes_unaffected(server):
    _, port, _ = server
    import json

    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/v1/pipelines", timeout=10
    ) as resp:
        rows = json.loads(resp.read())
    assert [r["id"] for r in rows] == ["demo"]


# -- ConnectorService / ProcessorService -----------------------------------


def test_connector_service_crud(server):
    plane, port, _ = server

    def call(method, desc, obj):
        body = gw.frame(0x00, pw.encode(desc, obj))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api.v1.ConnectorService/{method}",
            data=body,
            method="POST",
            headers={"Content-Type": "application/grpc-web+proto"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return gw.unframe(resp.read())

    frames = call("ListConnectors", gw.LIST_CONNECTORS_REQ, {})
    res = _msg_of(frames, gw.LIST_CONNECTORS_RES)
    assert [c["id"] for c in res["connectors"]] == ["demo:src", "demo:dst"]
    assert res["connectors"][0]["type"] == 1  # TYPE_SOURCE
    assert res["connectors"][1]["type"] == 2  # TYPE_DESTINATION
    assert res["connectors"][0]["pipeline_id"] == "demo"

    frames = call("GetConnector", gw.GET_CONNECTOR_REQ, {"id": "demo:src"})
    c = _msg_of(frames, gw.GET_CONNECTOR_RES)["connector"]
    assert c["plugin"] == "builtin:generator"
    assert c["config"]["settings"]["recordCount"] == "5"

    # create on the stopped pipeline
    frames = call(
        "CreateConnector",
        gw.CREATE_CONNECTOR_REQ,
        {
            "type": 2,
            "plugin": "builtin:log",
            "pipeline_id": "demo",
            "config": {"name": "extra", "settings": {}},
        },
    )
    assert _status_of(frames) == gw.OK
    assert _msg_of(frames, gw.CREATE_CONNECTOR_RES)["connector"]["id"] == (
        "demo:extra"
    )

    # validate: bad config → INVALID_ARGUMENT with message
    frames = call(
        "ValidateConnector",
        gw.VALIDATE_CONNECTOR_REQ,
        {"type": 1, "plugin": "builtin:file", "config": {"settings": {}}},
    )
    assert _status_of(frames) == gw.INVALID_ARGUMENT
    frames = call(
        "ValidateConnector",
        gw.VALIDATE_CONNECTOR_REQ,
        {
            "type": 1,
            "plugin": "builtin:file",
            "config": {"settings": {"path": "/tmp/x"}},
        },
    )
    assert _status_of(frames) == gw.OK

    # update settings, delete, then 404
    frames = call(
        "UpdateConnector",
        gw.UPDATE_CONNECTOR_REQ,
        {"id": "demo:extra", "config": {"settings": {"n": "5"}}},
    )
    assert _msg_of(frames, gw.UPDATE_CONNECTOR_RES)["connector"]["config"][
        "settings"
    ]["n"] == "5"
    frames = call("DeleteConnector", gw.DELETE_CONNECTOR_REQ, {"id": "demo:extra"})
    assert _status_of(frames) == gw.OK
    frames = call("GetConnector", gw.GET_CONNECTOR_REQ, {"id": "demo:extra"})
    assert _status_of(frames) == gw.NOT_FOUND


def test_processor_service_crud(server):
    plane, port, _ = server

    def call(method, desc, obj):
        body = gw.frame(0x00, pw.encode(desc, obj))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api.v1.ProcessorService/{method}",
            data=body,
            method="POST",
            headers={"Content-Type": "application/grpc-web+proto"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return gw.unframe(resp.read())

    frames = call(
        "CreateProcessor",
        gw.CREATE_PROCESSOR_REQ,
        {
            "plugin": "field.set",
            "parent": {"type": 2, "id": "demo"},  # TYPE_PIPELINE
            "config": {"settings": {"field": ".Payload.After.x", "value": "1"}},
        },
    )
    assert _status_of(frames) == gw.OK
    p = _msg_of(frames, gw.CREATE_PROCESSOR_RES)["processor"]
    assert p["plugin"] == "field.set"
    assert p["parent"] == {"type": 2, "id": "demo"}

    frames = call("ListProcessors", gw.LIST_PROCESSORS_REQ, {"parent_ids": ["demo"]})
    res = _msg_of(frames, gw.LIST_PROCESSORS_RES)
    assert any(x["plugin"] == "field.set" for x in res["processors"])

    pid = p["id"]
    frames = call(
        "UpdateProcessor",
        gw.UPDATE_PROCESSOR_REQ,
        {"id": pid, "config": {"settings": {"field": ".f", "value": "2"}, "workers": 3}},
    )
    out = _msg_of(frames, gw.UPDATE_PROCESSOR_RES)["processor"]
    assert out["config"]["workers"] == 3
    assert out["config"]["settings"]["value"] == "2"

    frames = call("DeleteProcessor", gw.DELETE_PROCESSOR_REQ, {"id": pid})
    assert _status_of(frames) == gw.OK
    frames = call("GetProcessor", gw.GET_PROCESSOR_REQ, {"id": pid})
    assert _status_of(frames) == gw.NOT_FOUND


# -- server-streaming inspect ----------------------------------------------


def _stream_call(port, service, method, desc, obj):
    body = gw.frame(0x00, pw.encode(desc, obj))
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api.v1.{service}/{method}",
        data=body,
        method="POST",
        headers={"Content-Type": "application/grpc-web+proto"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return gw.unframe(resp.read())


def test_inspect_connector_streams_opencdc_records(server):
    plane, port, _ = server
    # first call attaches; empty stream, OK trailers
    frames = _stream_call(
        port, "ConnectorService", "InspectConnector",
        gw.INSPECT_CONNECTOR_REQ, {"id": "demo:src"},
    )
    assert _status_of(frames) == gw.OK
    assert [f for f, _ in frames if not f & 0x80] == []

    # a runner fills the tapped buffers with envelope dicts (what the
    # real Pipeline runtime taps; raw bytes, not jsonable)
    def runner(cfg, stop, inspectors=None):
        for key, insp in (inspectors or {}).items():
            for i in range(5):
                insp.buffer.append(
                    {
                        "position": f"pos-{key}-{i}".encode(),
                        "operation": "create",
                        "metadata": {"conduit.source.connector.id": "src"},
                        "key_raw": f"k{i}".encode(),
                        "key_json": None,
                        "payload_before_json": None,
                        "payload_after_json": f'{{"n": {i}}}',
                        "payload_after_raw": None,
                        "is_structured": True,
                    }
                )
        return "done"

    plane._runner = runner
    plane.start("demo")
    assert plane.wait("demo", timeout=10)

    frames = _stream_call(
        port, "ConnectorService", "InspectConnector",
        gw.INSPECT_CONNECTOR_REQ, {"id": "demo:src"},
    )
    assert _status_of(frames) == gw.OK
    msgs = [
        pw.decode(gw.INSPECT_CONNECTOR_RES, p)
        for f, p in frames
        if not f & 0x80
    ]
    assert len(msgs) == 5
    rec = msgs[0]["record"]
    assert rec["position"] == b"pos-src-0"
    assert rec["operation"] == 1  # OPERATION_CREATE
    assert rec["metadata"]["conduit.source.connector.id"] == "src"
    assert rec["key"]["raw_data"] == b"k0"
    assert rec["payload"]["after"]["raw_data"] == b'{"n": 0}'

    # unknown connector → NOT_FOUND trailers-only
    frames = _stream_call(
        port, "ConnectorService", "InspectConnector",
        gw.INSPECT_CONNECTOR_REQ, {"id": "ghost"},
    )
    assert _status_of(frames) == gw.NOT_FOUND


def test_inspect_processor_in_and_out_streams(server):
    plane, port, _ = server
    for method in ("InspectProcessorIn", "InspectProcessorOut"):
        frames = _stream_call(
            port, "ProcessorService", method,
            gw.INSPECT_PROCESSOR_IN_REQ, {"id": "keep"},
        )
        assert _status_of(frames) == gw.OK

    def runner(cfg, stop, inspectors=None):
        for key, insp in (inspectors or {}).items():
            insp.buffer.append(
                {
                    "position": f"p-{key}".encode(),
                    "operation": "snapshot",
                    "metadata": {},
                    "key_raw": None,
                    "key_json": None,
                    "payload_before_json": None,
                    "payload_after_json": None,
                    "payload_after_raw": key.encode(),
                    "is_structured": False,
                }
            )
        return "done"

    plane._runner = runner
    plane.start("demo")
    assert plane.wait("demo", timeout=10)

    frames = _stream_call(
        port, "ProcessorService", "InspectProcessorIn",
        gw.INSPECT_PROCESSOR_IN_REQ, {"id": "keep"},
    )
    msgs = [
        pw.decode(gw.INSPECT_PROCESSOR_IN_RES, p)
        for f, p in frames
        if not f & 0x80
    ]
    assert len(msgs) == 1
    # the runtime taps "<id>#in" BEFORE the processor runs
    assert msgs[0]["record"]["position"] == b"p-keep#in"
    assert msgs[0]["record"]["operation"] == 4  # OPERATION_SNAPSHOT

    frames = _stream_call(
        port, "ProcessorService", "InspectProcessorOut",
        gw.INSPECT_PROCESSOR_OUT_REQ, {"id": "keep"},
    )
    msgs = [
        pw.decode(gw.INSPECT_PROCESSOR_OUT_RES, p)
        for f, p in frames
        if not f & 0x80
    ]
    assert msgs[0]["record"]["position"] == b"p-keep"


# -- plugin specs + info ---------------------------------------------------


def test_list_connector_plugins_specs(server):
    _, port, _ = server
    frames = _stream_call(
        port, "ConnectorService", "ListConnectorPlugins",
        gw.LIST_CONNECTOR_PLUGINS_REQ, {"name": "s3"},
    )
    assert _status_of(frames) == gw.OK
    res = _msg_of(frames, gw.LIST_CONNECTOR_PLUGINS_RES)
    [p] = res["plugins"]
    assert p["name"] == "builtin:s3"
    assert p["version"].startswith("v")
    # required settings surface as REQUIRED-validated string params
    assert "path" in p["source_params"]
    param = p["source_params"]["path"]
    assert param["type"] == gw._PARAM_TYPE_STRING
    assert param["validations"] == [
        {"type": gw._VALIDATION_REQUIRED, "value": ""}
    ]


def test_list_processor_plugins_specs(server):
    _, port, _ = server
    frames = _stream_call(
        port, "ProcessorService", "ListProcessorPlugins",
        gw.LIST_PROCESSOR_PLUGINS_REQ, {},
    )
    res = _msg_of(frames, gw.LIST_PROCESSOR_PLUGINS_RES)
    names = [p["name"] for p in res["plugins"]]
    assert "filter" in names and "field.set" in names
    assert all(p["summary"] for p in res["plugins"])


def test_information_service_get_info(server):
    _, port, _ = server
    frames = _stream_call(
        port, "InformationService", "GetInfo", gw.GET_INFO_REQ, {}
    )
    info = _msg_of(frames, gw.GET_INFO_RES)["info"]
    assert info["version"].startswith("v")
    assert info["os"] and info["arch"]


# -- DLQ / export / import / plan / apply ----------------------------------


def test_dlq_get_and_update(server):
    _, port, _ = server
    frames = _stream_call(
        port, "PipelineService", "GetDLQ", gw.GET_DLQ_REQ, {"id": "demo"}
    )
    dlq = _msg_of(frames, gw.GET_DLQ_RES)["dlq"]
    assert dlq["plugin"] == "builtin:log"  # default
    upd = pw.encode(
        gw.UPDATE_DLQ_REQ,
        {
            "id": "demo",
            "dlq": {
                "plugin": "builtin:file",
                "settings": {"path": "/tmp/dlq", "format": "json"},
                "window_size": 10,
                "window_nack_threshold": 2,
            },
        },
    )
    _, _, frames = _call(port, "UpdateDLQ", upd)
    out = _msg_of(frames, gw.UPDATE_DLQ_RES)["dlq"]
    assert out["plugin"] == "builtin:file"
    assert out["window_size"] == 10 and out["window_nack_threshold"] == 2
    # invalid window (threshold >= size) → precondition-class error
    bad = pw.encode(
        gw.UPDATE_DLQ_REQ,
        {"id": "demo", "dlq": {"plugin": "builtin:log", "window_size": 2,
                               "window_nack_threshold": 5}},
    )
    _, _, frames = _call(port, "UpdateDLQ", bad)
    assert _status_of(frames) != gw.OK


def test_export_import_roundtrip(server):
    _, port, _ = server
    frames = _stream_call(
        port, "PipelineService", "ExportPipeline",
        gw.EXPORT_PIPELINE_REQ, {"id": "demo"},
    )
    p = _msg_of(frames, gw.EXPORT_PIPELINE_RES)["pipeline"]
    assert p["id"] == "demo" and p["connector_ids"] == ["src", "dst"]
    imp = pw.encode(
        gw.IMPORT_PIPELINE_REQ,
        {"pipeline": {"id": "copied", "config": {"name": "copied",
                                                 "description": "via import"}}},
    )
    _, _, frames = _call(port, "ImportPipeline", imp)
    assert _status_of(frames) == gw.OK
    out = _msg_of(frames, gw.IMPORT_PIPELINE_RES)["pipeline"]
    assert out["id"] == "copied"
    # re-import → ALREADY_EXISTS
    _, _, frames = _call(port, "ImportPipeline", imp)
    assert _status_of(frames) == gw.ALREADY_EXISTS


def test_plan_apply_hash_gating(server):
    plane, port, _ = server
    doc = {
        "id": "planned",
        "status": "stopped",
        "name": "planned",
        "connectors": [
            {
                "id": "g",
                "type": "source",
                "plugin": "builtin:generator",
                "settings": {"recordCount": "3", "format.options": "{id: int}"},
            },
            {"id": "out", "type": "destination", "plugin": "builtin:log"},
        ],
    }
    _, _, frames = _call(
        port, "PlanPipeline", pw.encode(gw.PLAN_PIPELINE_REQ, {"config": doc})
    )
    assert _status_of(frames) == gw.OK
    diff = _msg_of(frames, gw.PLAN_PIPELINE_RES)["diff"]
    assert diff["pipeline_id"] == "planned" and diff["hash"]
    actions = {(c["resource"], c["action"]) for c in diff["changes"]}
    assert ("pipeline", "create") in actions
    assert ("connector", "create") in actions

    # apply with a stale hash → FAILED_PRECONDITION (9)
    _, _, frames = _call(
        port,
        "ApplyPipeline",
        pw.encode(gw.APPLY_PIPELINE_REQ, {"config": doc, "hash": "deadbeef"}),
    )
    assert _status_of(frames) == 9

    # apply with the real hash creates the pipeline
    _, _, frames = _call(
        port,
        "ApplyPipeline",
        pw.encode(
            gw.APPLY_PIPELINE_REQ, {"config": doc, "hash": diff["hash"]}
        ),
    )
    assert _status_of(frames) == gw.OK
    assert plane.get("planned") is not None


def test_deprecated_plugin_service_combined_listing(server):
    _, port, _ = server
    frames = _stream_call(
        port, "PluginService", "ListPlugins",
        gw.LIST_CONNECTOR_PLUGINS_REQ, {},
    )
    res = _msg_of(frames, gw.LIST_CONNECTOR_PLUGINS_RES)
    names = [p["name"] for p in res["plugins"]]
    assert "builtin:s3" in names and "filter" in names  # both kinds


def test_grpc_message_is_percent_encoded():
    """CR/LF or '%' in an error message must not corrupt the trailer
    block (gRPC spec: grpc-message is percent-encoded)."""
    t = gw._trailers(13, "line1\r\nline2 100%")
    body = t[5:].decode()
    lines = body.split("\r\n")
    assert lines[0] == "grpc-status: 13"
    assert lines[1].startswith("grpc-message: ")
    assert "%0D%0A" in lines[1] and "%25" in lines[1]


def test_dlq_records_over_grpc_web(server, tmp_path):
    """GetDLQRecords: the queryable DLQ record view on the gRPC-Web
    surface (same plane method as REST — no divergent logic). Records
    come back as opencdc.v1.Record messages; a log-backed DLQ maps the
    no-record-store error to INVALID_ARGUMENT."""
    import json as _json

    _, port, _ = server
    # default (log-backed): error status in trailers
    frames = _stream_call(
        port, "PipelineService", "GetDLQRecords",
        gw.GET_DLQ_RECORDS_REQ, {"id": "demo", "count": 5},
    )
    trailer = next(f for k, f in frames if k == 0x80).decode()
    assert "grpc-status: 3" in trailer  # INVALID_ARGUMENT

    dlq_dir = tmp_path / "dlq"
    dlq_dir.mkdir()
    (dlq_dir / "part-0.json").write_text(
        _json.dumps(
            {
                "position": "p-7",
                "operation": "create",
                "metadata": {"conduit.dlq.error": "boom"},
                "payload_after_json": '{"id": 7}',
            }
        )
        + "\n"
    )
    upd = pw.encode(
        gw.UPDATE_DLQ_REQ,
        {
            "id": "demo",
            "dlq": {
                "plugin": "builtin:file",
                "settings": {"path": str(dlq_dir), "format": "json"},
                "window_size": 10,
                "window_nack_threshold": 2,
            },
        },
    )
    _call(port, "UpdateDLQ", upd)
    frames = _stream_call(
        port, "PipelineService", "GetDLQRecords",
        gw.GET_DLQ_RECORDS_REQ, {"id": "demo", "count": 5},
    )
    out = _msg_of(frames, gw.GET_DLQ_RECORDS_RES)
    recs = out["records"]
    assert len(recs) == 1
    assert recs[0]["position"] == b"p-7"
    assert recs[0]["metadata"]["conduit.dlq.error"] == "boom"
