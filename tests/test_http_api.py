"""HTTP control-plane tests (PipelineService REST analog).

Spin the stdlib server on an ephemeral port, drive the full CRUD +
lifecycle round-trip with urllib, and pin payload parity with the CLI
surfaces (`list --json` / `describe`) — both are built from
pipeline/views.py, and these tests keep that true.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from conduit_spark import cli
from conduit_spark.http_api import ControlPlane, start_server
from conduit_spark.pipeline.config import parse_yaml

PIPELINE_YAML = """
version: "2.2"
pipelines:
  - id: demo
    status: running
    description: test pipeline
    connectors:
      - id: src
        type: source
        plugin: builtin:generator
        settings: {recordCount: 10, format.options: {id: int}}
      - id: dst
        type: destination
        plugin: builtin:file
        settings: {path: /tmp/api-out, format: json, password: hunter2}
    processors:
      - id: keep
        plugin: filter
        condition: '{{ eq .Payload.After.id 1 }}'
"""

NEW_PIPELINE = {
    "id": "created",
    "status": "running",
    "connectors": [
        {
            "id": "g",
            "type": "source",
            "plugin": "builtin:generator",
            "settings": {"recordCount": 5, "format.options": {"id": "int"}},
        },
        {
            "id": "out",
            "type": "destination",
            "plugin": "builtin:log",
            "settings": {},
        },
    ],
    "processors": [],
}


def _configs():
    return parse_yaml(PIPELINE_YAML)


def _req(port, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture()
def plane_and_port():
    """A server whose runner blocks until stopped — lifecycle is
    observable without a SparkSession."""
    started = threading.Event()

    def runner(cfg, stop):
        started.set()
        stop.wait(timeout=30)
        return "stopped"

    plane = ControlPlane(_configs(), runner=runner)
    srv = start_server(plane)
    port = srv.server_address[1]
    yield plane, port, started
    srv.shutdown()


def test_list_parity_with_cli(plane_and_port, tmp_path, capsys):
    _, port, _ = plane_and_port
    status, rows = _req(port, "GET", "/v1/pipelines")
    assert status == 200

    f = tmp_path / "p.yaml"
    f.write_text(PIPELINE_YAML)
    assert cli.main(["list", "--pipelines", str(f), "--json"]) == 0
    cli_rows = json.loads(capsys.readouterr().out)
    # identical payloads except runtime status (API tracks lifecycle)
    for r in rows:
        r["status"] = "running"
    assert rows == cli_rows


def test_describe_parity_and_redaction(plane_and_port, tmp_path, capsys):
    _, port, _ = plane_and_port
    status, doc = _req(port, "GET", "/v1/pipelines/demo")
    assert status == 200

    f = tmp_path / "p.yaml"
    f.write_text(PIPELINE_YAML)
    assert cli.main(["describe", "--pipelines", str(f), "--id", "demo"]) == 0
    cli_doc = json.loads(capsys.readouterr().out)[0]
    doc["status"] = "running"
    assert doc == cli_doc
    # secrets must be masked on the wire
    dst = next(c for c in doc["connectors"] if c["id"] == "dst")
    assert dst["settings"]["password"] == "***"
    assert "hunter2" not in json.dumps(doc)


def test_crud_round_trip(plane_and_port):
    _, port, _ = plane_and_port
    # create
    status, doc = _req(port, "POST", "/v1/pipelines", NEW_PIPELINE)
    assert status == 201 and doc["id"] == "created"
    # duplicate create → 409
    status, err = _req(port, "POST", "/v1/pipelines", NEW_PIPELINE)
    assert status == 409 and "already exists" in err["error"]
    # read it back
    status, doc = _req(port, "GET", "/v1/pipelines/created")
    assert status == 200 and doc["status"] == "provisioned"
    # update
    upd = dict(NEW_PIPELINE, description="updated!")
    status, doc = _req(port, "PUT", "/v1/pipelines/created", upd)
    assert status == 200 and doc["description"] == "updated!"
    # delete
    status, doc = _req(port, "DELETE", "/v1/pipelines/created")
    assert status == 200
    status, err = _req(port, "GET", "/v1/pipelines/created")
    assert status == 404
    # malformed create → 400
    status, err = _req(port, "POST", "/v1/pipelines", {"nope": 1})
    assert status == 400


def test_start_stop_lifecycle(plane_and_port):
    plane, port, started = plane_and_port
    status, doc = _req(port, "POST", "/v1/pipelines/demo/start")
    assert status == 200 and doc["status"] == "running"
    assert started.wait(timeout=10)
    # double-start → 409
    status, err = _req(port, "POST", "/v1/pipelines/demo/start")
    assert status == 409
    # delete while running → 409
    status, err = _req(port, "DELETE", "/v1/pipelines/demo")
    assert status == 409
    # stop joins the runner and reports its final status
    status, doc = _req(port, "POST", "/v1/pipelines/demo/stop")
    assert status == 200 and doc["status"] == "stopped"
    assert plane.status("demo") == "stopped"
    # restart works after stop
    status, doc = _req(port, "POST", "/v1/pipelines/demo/start")
    assert status == 200 and doc["status"] == "running"
    _req(port, "POST", "/v1/pipelines/demo/stop")


def test_user_stop_racing_drain_error_is_not_a_failure():
    """The reference's archv2 drain-reconfigure O3 race
    (20260731-archv2-drain-reconfigure.md): an operator-initiated
    graceful stop whose DRAIN surfaces a transient error must
    classify as 'stopped' (reason user, error visible), never as a
    spontaneous 'failed' — a supervisor watching status would restart
    a pipeline the operator just told to stop. A genuinely
    spontaneous crash still classifies as failed/system."""
    import threading

    from conduit_spark.http_api import ControlPlane

    draining = threading.Event()

    def runner(cfg, stop):
        draining.set()
        stop.wait(timeout=30)
        raise RuntimeError("transient drain error")  # surfaces mid-drain

    plane = ControlPlane(_configs(), runner=runner)
    assert plane.start("demo") == "running"
    assert draining.wait(timeout=10)
    assert plane.stop("demo") == "stopped"  # user stop, drain raised
    assert plane.status("demo") == "stopped"
    doc = plane.get("demo")
    assert doc["stopped_reason"] == "user"
    assert "transient drain error" in doc.get("error", "")

    # control: the same error WITHOUT a user stop is a real failure
    def crash_runner(cfg, stop):
        raise RuntimeError("spontaneous crash")

    plane2 = ControlPlane(_configs(), runner=crash_runner)
    plane2.start("demo")
    assert plane2.wait("demo", timeout=10) == "failed"
    assert plane2.get("demo")["stopped_reason"] == "system"


def test_unknown_routes_and_ids(plane_and_port):
    _, port, _ = plane_and_port
    assert _req(port, "GET", "/v1/nope")[0] == 404
    assert _req(port, "GET", "/v1/pipelines/ghost")[0] == 404
    assert _req(port, "POST", "/v1/pipelines/ghost/start")[0] == 404
    assert _req(port, "POST", "/v1/pipelines/ghost/stop")[0] == 404


def test_default_runner_executes_real_pipeline(spark, tmp_path):
    """start → the default batch runner runs the generator→file
    pipeline for real; status lands on done and the file exists."""
    out_dir = tmp_path / "out"
    doc = {
        "id": "real",
        "status": "running",
        "connectors": [
            {
                "id": "g",
                "type": "source",
                "plugin": "builtin:generator",
                "settings": {
                    "recordCount": 7,
                    "format.options": {"id": "int"},
                },
            },
            {
                "id": "f",
                "type": "destination",
                "plugin": "builtin:file",
                "settings": {
                    "path": str(out_dir),
                    "format": "json",
                },
            },
        ],
        "processors": [],
    }
    plane = ControlPlane()
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        assert _req(port, "POST", "/v1/pipelines", doc)[0] == 201
        assert _req(port, "POST", "/v1/pipelines/real/start")[0] == 200
        final = plane.wait("real", timeout=120)
        assert final == "done"
        files = list(out_dir.rglob("*.json"))
        assert files, "destination wrote no json files"
        n = sum(
            1
            for f in files
            for line in f.read_text().splitlines()
            if line.strip()
        )
        assert n == 7
    finally:
        srv.shutdown()


def test_plugin_listing_endpoints():
    import urllib.request

    from conduit_spark.http_api import ControlPlane, start_server

    srv = start_server(ControlPlane())
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/processors/plugins", timeout=5
        ) as resp:
            procs = json.loads(resp.read().decode())
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/connectors/plugins", timeout=5
        ) as resp:
            conns = json.loads(resp.read().decode())
    finally:
        srv.shutdown()
    names = {p["name"] for p in procs}
    assert {"filter", "field.set", "avro.encode", "webhook.http"} <= names
    by_name = {c["name"]: c for c in conns}
    assert by_name["builtin:generator"]["source"] is True
    assert by_name["builtin:generator"]["destination"] is False
    assert by_name["builtin:log"]["destination"] is True
    # parameter metadata: required settings per direction
    assert by_name["builtin:file"]["required_settings"] == {
        "source": ["path"], "destination": ["path"],
    }
    assert by_name["builtin:kafka"]["required_settings"]["source"] == [
        "servers", "topic",
    ]
    assert by_name["builtin:log"]["required_settings"] == {"destination": []}


def test_plugin_inventory_matches_dispatch():
    """Every advertised processor plugin must reach real dispatch logic
    (never the unknown-plugin error), and the connector inventory's
    source/destination flags must match build_source/write_destination."""
    from conduit_spark.pipeline.registry import (
        CONNECTOR_PLUGINS,
        PROCESSOR_PLUGINS,
        build_processor,
    )

    for name in PROCESSOR_PLUGINS:
        try:
            build_processor(name, {})
        except ValueError as e:
            assert "unknown processor plugin" not in str(e), name
        except (KeyError, FileNotFoundError):
            pass  # missing required settings — dispatch was reached

    # source-side dispatch literals, without needing a SparkSession:
    # probing with empty settings must fail on settings, not on the name
    import inspect

    from conduit_spark.pipeline import registry as reg

    src_body = inspect.getsource(reg.build_source)
    dst_body = inspect.getsource(reg.write_destination)
    for name, meta in CONNECTOR_PLUGINS.items():
        if meta["source"]:
            assert f'"{name}"' in src_body, f"{name} not in build_source"
        if meta["destination"]:
            assert f'"{name}"' in dst_body, f"{name} not in write_destination"


def test_inspect_routes_attach_and_buffer(plane_and_port):
    """Inspector attach semantics without a SparkSession: first GET
    attaches (empty buffer), a runner that receives the taps fills
    them, later GETs drain the drop-oldest buffer — the HTTP analog of
    the reference's InspectConnector/InspectProcessor streams
    (api.proto:775,1011-1018)."""
    plane, port, _ = plane_and_port

    # unknown node → 404; bad kind namespace too
    assert _req(port, "GET", "/v1/connectors/ghost/inspect")[0] == 404
    assert _req(port, "GET", "/v1/processors/ghost/inspect")[0] == 404

    # first call attaches, returns no records yet
    status, doc = _req(port, "GET", "/v1/connectors/src/inspect")
    assert status == 200
    assert doc == {
        "pipeline": "demo",
        "id": "src",
        "type": "connector",
        "direction": "out",
        "attached": True,
        "records": [],
    }
    # idempotent re-attach
    status, doc = _req(port, "GET", "/v1/connectors/demo:src/inspect")
    assert status == 200 and doc["attached"] is False

    # processor namespace resolves processor ids only
    assert _req(port, "GET", "/v1/processors/keep/inspect")[0] == 200
    assert _req(port, "GET", "/v1/connectors/keep/inspect")[0] == 404

    # a runner that taps records (the Pipeline runtime does this for
    # real in test_inspect_end_to_end)
    seen = {}

    def runner(cfg, stop, inspectors=None):
        seen.update(inspectors or {})
        for i in range(30):
            for insp in inspectors.values():
                insp.buffer.append({"id": i})
        return "done"

    plane._runner = runner
    plane.start("demo")
    plane.wait("demo", timeout=10)
    assert set(seen) == {"src", "keep"}

    status, doc = _req(port, "GET", "/v1/connectors/src/inspect?count=5")
    assert status == 200 and doc["attached"] is False
    assert [r["id"] for r in doc["records"]] == [25, 26, 27, 28, 29]


def test_inspect_end_to_end_real_pipeline(spark, tmp_path):
    """Attach inspectors to source, processor, and destination of a
    real generator→filter→file run; each tap samples the records that
    flowed through that node, with binary envelope fields rendered as
    base64 text."""
    out_dir = tmp_path / "insp-out"
    doc = {
        "id": "inspected",
        "status": "running",
        "connectors": [
            {
                "id": "g",
                "type": "source",
                "plugin": "builtin:generator",
                "settings": {
                    "recordCount": 20,
                    "format.options": {"id": "int"},
                },
            },
            {
                "id": "f",
                "type": "destination",
                "plugin": "builtin:file",
                "settings": {"path": str(out_dir), "format": "json"},
            },
        ],
        "processors": [
            {
                "id": "keep-small",
                "plugin": "filter",
                "condition": "{{ lt .Payload.After.id 60 }}",
            }
        ],
    }
    plane = ControlPlane()
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        assert _req(port, "POST", "/v1/pipelines", doc)[0] == 201
        # attach BEFORE the run; records appear after it
        for path in (
            "/v1/connectors/g/inspect",
            "/v1/processors/keep-small/inspect",
            "/v1/connectors/f/inspect",
        ):
            status, d = _req(port, "GET", path)
            assert status == 200 and d["attached"] is True

        assert _req(port, "POST", "/v1/pipelines/inspected/start")[0] == 200
        assert plane.wait("inspected", timeout=120) == "done"

        _, src = _req(port, "GET", "/v1/connectors/g/inspect?count=10")
        _, proc = _req(port, "GET", "/v1/processors/keep-small/inspect?count=10")
        _, dst = _req(port, "GET", "/v1/connectors/f/inspect?count=10")
        assert src["records"] and proc["records"] and dst["records"]
        # source saw the raw envelope; binary position is base64 text
        assert all(isinstance(r["position"], str) for r in src["records"])
        # the filter processor DROPS matching records (reference filter
        # semantics): ids < 60 must not reach the destination tap
        import json as _json

        dst_ids = [
            _json.loads(r["payload_after_json"])["id"] for r in dst["records"]
        ]
        assert dst_ids and all(i >= 60 for i in dst_ids)
    finally:
        srv.shutdown()


def test_cli_inspect_verb(spark, tmp_path, capsys):
    """`conduit_spark inspect --id ... --node ...` prints JSON-line
    samples from the node — CLI counterpart of the /inspect routes."""
    import json as _json

    from conduit_spark import cli

    f = tmp_path / "p.yaml"
    f.write_text(
        """
version: "2.2"
pipelines:
  - id: clidemo
    connectors:
      - id: g
        type: source
        plugin: builtin:generator
        settings: {recordCount: 8, format.options: {id: int}}
      - id: out
        type: destination
        plugin: builtin:file
        settings: {path: "%s", format: json, mode: overwrite}
    processors: []
"""
        % (tmp_path / "cli-out")
    )
    rc = cli.main(
        ["inspect", "--pipelines", str(f), "--id", "clidemo", "--node", "g", "--count", "5"]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    recs = [_json.loads(l) for l in out]
    assert len(recs) == 5
    assert all("payload_after_json" in r for r in recs)
    # unknown node → error exit
    rc = cli.main(
        ["inspect", "--pipelines", str(f), "--id", "clidemo", "--node", "nope"]
    )
    assert rc == 1


# -- round-4: DLQ / export-import / plan-apply / entity views ---------


def test_dlq_get_put_round_trip(plane_and_port):
    _, port, _ = plane_and_port
    # default DLQ when the config declares none
    status, dlq = _req(port, "GET", "/v1/pipelines/demo/dead-letter-queue")
    assert status == 200
    assert dlq == {
        "plugin": "builtin:log",
        "settings": {},
        "window_size": 1,
        "window_nack_threshold": 0,
    }
    new = {
        "plugin": "builtin:file",
        "settings": {"path": "/tmp/dlq-out", "format": "json"},
        "window_size": 5,
        "window_nack_threshold": 2,
    }
    status, dlq = _req(port, "PUT", "/v1/pipelines/demo/dead-letter-queue", new)
    assert status == 200 and dlq == new
    status, dlq = _req(port, "GET", "/v1/pipelines/demo/dead-letter-queue")
    assert dlq == new
    # invariant from the reference: a window that can never ack is refused
    bad = dict(new, window_nack_threshold=5)
    status, err = _req(port, "PUT", "/v1/pipelines/demo/dead-letter-queue", bad)
    assert status == 400 and "window_nack_threshold" in err["error"]
    status, _ = _req(port, "GET", "/v1/pipelines/nope/dead-letter-queue")
    assert status == 404


def test_export_import_round_trip(plane_and_port):
    _, port, _ = plane_and_port
    status, doc = _req(port, "POST", "/v1/pipelines/demo/export")
    assert status == 200
    # export is unredacted — it must re-import runnable
    dst = next(c for c in doc["connectors"] if c["id"] == "dst")
    assert dst["settings"]["password"] == "hunter2"
    doc["id"] = "demo-copy"
    status, created = _req(port, "POST", "/v1/pipelines/import", doc)
    assert status == 201 and created["id"] == "demo-copy"
    # the copy exports byte-identically (modulo id)
    status, doc2 = _req(port, "POST", "/v1/pipelines/demo-copy/export")
    assert status == 200
    assert {k: v for k, v in doc2.items() if k != "id"} == {
        k: v for k, v in doc.items() if k != "id"
    }


def test_plan_apply_workflow(plane_and_port):
    plane, port, _ = plane_and_port
    status, doc = _req(port, "POST", "/v1/pipelines/demo/export")
    assert status == 200
    # no-op plan: empty change set, apply is idempotent
    status, diff = _req(port, "POST", "/v1/pipelines/plan", {"config": doc})
    assert status == 200 and diff["changes"] == []
    status, applied = _req(
        port, "POST", "/v1/pipelines/apply",
        {"config": doc, "hash": diff["hash"]},
    )
    assert status == 200 and applied["changes"] == []

    # metadata-only change is in_place; settings change is restart-class
    desired = json.loads(json.dumps(doc))
    desired["description"] = "updated description"
    src = next(c for c in desired["connectors"] if c["id"] == "src")
    src["settings"]["recordCount"] = 99
    status, diff = _req(port, "POST", "/v1/pipelines/plan", {"config": desired})
    assert status == 200
    by_resource = {c["resource"]: c for c in diff["changes"]}
    assert by_resource["pipeline"]["effect"] == "in_place"
    assert by_resource["pipeline"]["config_paths"] == ["description"]
    assert by_resource["connector"]["effect"] == "restart"
    assert by_resource["connector"]["id"] == "demo:src"
    assert "settings.recordCount" in by_resource["connector"]["config_paths"]

    # stale hash (config edited after planning) → 409, nothing applied
    desired2 = json.loads(json.dumps(desired))
    desired2["connectors"][0]["settings"]["recordCount"] = 100
    status, err = _req(
        port, "POST", "/v1/pipelines/apply",
        {"config": desired2, "hash": diff["hash"]},
    )
    assert status == 409 and "plan_stale" in err["error"]
    status, check = _req(port, "POST", "/v1/pipelines/demo/export")
    assert check == doc  # untouched

    # correct hash applies
    status, applied = _req(
        port, "POST", "/v1/pipelines/apply",
        {"config": desired, "hash": diff["hash"]},
    )
    assert status == 200 and applied["changes"] == diff["changes"]
    status, after = _req(port, "POST", "/v1/pipelines/demo/export")
    assert after["description"] == "updated description"
    src_after = next(c for c in after["connectors"] if c["id"] == "src")
    assert src_after["settings"]["recordCount"] == 99


def test_apply_restart_gating(plane_and_port):
    """Restart-class changes on a RUNNING pipeline are refused without
    the live_restart_apply operator flag."""
    _, port, _ = plane_and_port
    status, doc = _req(port, "POST", "/v1/pipelines/demo/export")
    _req(port, "POST", "/v1/pipelines/demo/start")
    desired = json.loads(json.dumps(doc))
    next(c for c in desired["connectors"] if c["id"] == "src")["settings"][
        "recordCount"
    ] = 77
    status, diff = _req(port, "POST", "/v1/pipelines/plan", {"config": desired})
    assert status == 200  # plan is read-only, safe while running
    status, err = _req(
        port, "POST", "/v1/pipelines/apply",
        {"config": desired, "hash": diff["hash"]},
    )
    assert status == 409 and "restart" in err["error"]
    _req(port, "POST", "/v1/pipelines/demo/stop")


def test_apply_live_restart():
    """With live_restart_apply the plane stops, reconfigures, restarts."""
    runs = []

    def runner(cfg, stop):
        runs.append(cfg.description)
        stop.wait(timeout=30)
        return "stopped"

    plane = ControlPlane(_configs(), runner=runner, live_restart_apply=True)
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        _, doc = _req(port, "POST", "/v1/pipelines/demo/export")
        _req(port, "POST", "/v1/pipelines/demo/start")
        desired = json.loads(json.dumps(doc))
        desired["description"] = "v2"
        next(c for c in desired["connectors"] if c["id"] == "src")["settings"][
            "recordCount"
        ] = 55
        _, diff = _req(port, "POST", "/v1/pipelines/plan", {"config": desired})
        status, _ = _req(
            port, "POST", "/v1/pipelines/apply",
            {"config": desired, "hash": diff["hash"]},
        )
        assert status == 200
        assert plane.status("demo") == "running"  # restarted on new config
        assert runs == ["test pipeline", "v2"]
        _req(port, "POST", "/v1/pipelines/demo/stop")
    finally:
        srv.shutdown()


def test_connector_processor_entity_routes(plane_and_port):
    _, port, _ = plane_and_port
    status, conns = _req(port, "GET", "/v1/connectors")
    assert status == 200
    assert {c["id"] for c in conns} == {"demo:src", "demo:dst"}
    assert all(c["pipeline_id"] == "demo" for c in conns)
    status, conns = _req(port, "GET", "/v1/connectors?pipeline_id=nope")
    assert status == 200 and conns == []
    status, one = _req(port, "GET", "/v1/connectors/demo:src")
    assert status == 200 and one["plugin"] == "builtin:generator"
    # secrets redacted on the entity view (unlike export)
    status, dst = _req(port, "GET", "/v1/connectors/dst")  # bare id, unambiguous
    assert status == 200 and dst["settings"]["password"] == "***"

    status, procs = _req(port, "GET", "/v1/processors")
    assert status == 200
    assert [p["id"] for p in procs] == ["keep"]
    assert procs[0]["parent"] == {"type": "pipeline", "id": "demo"}
    status, one = _req(port, "GET", "/v1/processors/demo:keep")
    assert status == 200 and one["plugin"] == "filter"
    status, _ = _req(port, "GET", "/v1/processors/nope")
    assert status == 404


def test_validate_connector_route(plane_and_port):
    _, port, _ = plane_and_port
    ok = {
        "type": "source",
        "plugin": "builtin:file",
        "settings": {"path": "/tmp/x", "format": "json"},
    }
    status, body = _req(port, "POST", "/v1/connectors/validate", ok)
    assert status == 200 and body == {"valid": True, "errors": []}
    # all errors reported at once
    bad = {"type": "source", "plugin": "builtin:kafka", "settings": {}}
    status, body = _req(port, "POST", "/v1/connectors/validate", bad)
    assert status == 400 and len(body["errors"]) == 2
    status, body = _req(
        port, "POST", "/v1/connectors/validate",
        {"type": "source", "plugin": "builtin:log", "settings": {}},
    )
    assert status == 400 and "cannot act as a source" in body["errors"][0]
    status, body = _req(
        port, "POST", "/v1/connectors/validate",
        {"type": "source", "plugin": "no:such", "settings": {}},
    )
    assert status == 400 and "unknown connector plugin" in body["errors"][0]


def test_info_and_deprecated_plugins_routes(plane_and_port):
    _, port, _ = plane_and_port
    status, info = _req(port, "GET", "/info")
    assert status == 200
    assert set(info) == {"version", "os", "arch"} and info["os"] == "linux"
    status, plugins = _req(port, "GET", "/v1/plugins?name=unwrap")
    assert status == 200
    assert {p["name"] for p in plugins} == {
        "unwrap.opencdc", "unwrap.debezium", "unwrap.kafkaconnect",
    }


def test_connector_processor_write_crud(plane_and_port):
    """POST/PUT/DELETE for connectors and processors as entities —
    the ConnectorService/ProcessorService write RPCs: edits land in
    the owning pipeline's config, refuse while running, and validate
    before mutating."""
    _, port, _ = plane_and_port
    # create a connector on the demo pipeline
    status, conn = _req(
        port, "POST", "/v1/connectors",
        {
            "pipeline_id": "demo",
            "id": "extra",
            "type": "destination",
            "plugin": "builtin:file",
            "settings": {"path": "/tmp/extra", "format": "json"},
        },
    )
    assert status == 201 and conn["id"] == "demo:extra"
    status, doc = _req(port, "GET", "/v1/pipelines/demo")
    assert "extra" in [c["id"] for c in doc["connectors"]]
    # invalid create: validation errors refused before mutation
    status, err = _req(
        port, "POST", "/v1/connectors",
        {"pipeline_id": "demo", "id": "bad", "type": "source",
         "plugin": "builtin:kafka", "settings": {}},
    )
    assert status == 400 and "missing required setting" in err["error"]
    # duplicate id → 409
    status, _ = _req(
        port, "POST", "/v1/connectors",
        {"pipeline_id": "demo", "id": "extra", "type": "destination",
         "plugin": "builtin:log", "settings": {}},
    )
    assert status == 409
    # update settings (validated)
    status, conn = _req(
        port, "PUT", "/v1/connectors/demo:extra",
        {"settings": {"path": "/tmp/extra2", "format": "parquet"}},
    )
    assert status == 200 and conn["settings"]["path"] == "/tmp/extra2"
    status, err = _req(
        port, "PUT", "/v1/connectors/demo:extra", {"plugin": "no:such"}
    )
    assert status == 400

    # processor CRUD: pipeline parent and connector parent
    status, proc = _req(
        port, "POST", "/v1/processors",
        {
            "parent": {"type": "pipeline", "id": "demo"},
            "id": "mask",
            "plugin": "field.exclude",
            "settings": {"fields": ".Payload.After.secret"},
        },
    )
    assert status == 201 and proc["parent"] == {"type": "pipeline", "id": "demo"}
    status, proc = _req(
        port, "POST", "/v1/processors",
        {
            "parent": {"type": "connector", "id": "demo:extra"},
            "id": "stamp",
            "plugin": "field.set",
            "settings": {"field": ".Metadata.x", "value": "1"},
        },
    )
    assert status == 201 and proc["parent"]["id"] == "demo:extra"
    status, err = _req(
        port, "POST", "/v1/processors",
        {"parent": {"type": "pipeline", "id": "demo"}, "plugin": "nope"},
    )
    assert status == 400 and "unknown processor plugin" in err["error"]
    # update + read back
    status, proc = _req(
        port, "PUT", "/v1/processors/demo:mask", {"workers": 4}
    )
    assert status == 200 and proc["workers"] == 4
    # refuse edits while running
    _req(port, "POST", "/v1/pipelines/demo/start")
    status, err = _req(port, "DELETE", "/v1/connectors/demo:extra")
    assert status == 409 and "running" in err["error"]
    _req(port, "POST", "/v1/pipelines/demo/stop")
    # delete both
    status, _ = _req(port, "DELETE", "/v1/processors/demo:mask")
    assert status == 200
    status, _ = _req(port, "DELETE", "/v1/connectors/demo:extra")
    assert status == 200
    status, doc = _req(port, "GET", "/v1/pipelines/demo")
    assert "extra" not in [c["id"] for c in doc["connectors"]]
    assert "mask" not in [p["id"] for p in doc["processors"]]


def test_inspect_in_out_directions(spark, tmp_path):
    """inspect-in samples records ENTERING a processor, inspect-out the
    records leaving it — a filter shows the difference (the two
    streams of InspectProcessorIn/Out)."""
    doc = {
        "id": "io",
        "status": "running",
        "connectors": [
            {
                "id": "g",
                "type": "source",
                "plugin": "builtin:generator",
                "settings": {
                    "recordCount": 10,
                    "format.options": {"id": "int"},
                },
            },
            {
                "id": "sink",
                "type": "destination",
                "plugin": "builtin:file",
                "settings": {"path": str(tmp_path / "out"), "format": "json"},
            },
        ],
        "processors": [
            {
                "id": "keep-small",
                "plugin": "filter",
                # filter DROPS matching records: keep id < 3
                "condition": "{{ gt .Payload.After.id 2 }}",
            }
        ],
    }
    plane = ControlPlane()
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        assert _req(port, "POST", "/v1/pipelines", doc)[0] == 201
        # attach both directions BEFORE the run
        status, r_in = _req(
            port, "GET", "/v1/processors/keep-small/inspect-in?count=20"
        )
        assert status == 200 and r_in["direction"] == "in"
        status, r_out = _req(
            port, "GET", "/v1/processors/keep-small/inspect-out?count=20"
        )
        assert status == 200 and r_out["direction"] == "out"
        _req(port, "POST", "/v1/pipelines/io/start")
        assert plane.wait("io", timeout=120) == "done"
        _, r_in = _req(
            port, "GET", "/v1/processors/keep-small/inspect-in?count=20"
        )
        _, r_out = _req(
            port, "GET", "/v1/processors/keep-small/inspect-out?count=20"
        )
        assert len(r_in["records"]) == 10

        def ids(resp):
            return {
                json.loads(r["payload_after_json"])["id"]
                for r in resp["records"]
            }

        # the filter DROPS matching (id > 2): out == the in-records
        # that did not match — value-exactly, whatever the generator drew
        kept = {i for i in ids(r_in) if i <= 2}
        assert ids(r_out) == kept and len(r_out["records"]) == len(kept)
        assert len(r_out["records"]) < len(r_in["records"])
        # plain /inspect is the out stream
        _, r_plain = _req(
            port, "GET", "/v1/processors/keep-small/inspect?count=20"
        )
        assert ids(r_plain) == kept
        # direction=in is a processor concept
        status, err = _req(
            port, "GET", "/v1/connectors/g/inspect-in"
        )
        assert status == 404  # no such connector route
    finally:
        srv.shutdown()


def test_force_stop_skips_drain():
    """stop?force=true marks the pipeline stopped immediately instead
    of joining the runner's drain; the abandoned runner's eventual
    return cannot overwrite the status."""
    import threading
    import time

    drain_started = threading.Event()
    release = threading.Event()

    def slow_runner(cfg, stop):
        drain_started.set()
        release.wait(timeout=30)  # simulates a long drain
        return "stopped"

    plane = ControlPlane(_configs(), runner=slow_runner)
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        _req(port, "POST", "/v1/pipelines/demo/start")
        assert drain_started.wait(timeout=10)
        t0 = time.monotonic()
        status, doc = _req(port, "POST", "/v1/pipelines/demo/stop?force=true")
        assert status == 200 and doc["status"] == "stopped"
        assert time.monotonic() - t0 < 5  # did not wait for the drain
        release.set()
        time.sleep(0.2)  # runner returns; status must stay stopped
        assert plane.status("demo") == "stopped"
    finally:
        srv.shutdown()


def test_stopped_reason_user_vs_system():
    """stopped_reason distinguishes a user stop from a runner failure
    (the reference's USER/SYSTEM stop attribution) and clears on
    restart."""
    import threading

    behaviors = {"mode": "block"}

    def runner(cfg, stop):
        if behaviors["mode"] == "crash":
            raise RuntimeError("boom")
        stop.wait(timeout=30)
        return "stopped"

    plane = ControlPlane(_configs(), runner=runner)
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        _req(port, "POST", "/v1/pipelines/demo/start")
        _req(port, "POST", "/v1/pipelines/demo/stop")
        _, doc = _req(port, "GET", "/v1/pipelines/demo")
        assert doc["stopped_reason"] == "user"
        _, rows = _req(port, "GET", "/v1/pipelines")
        assert rows[0]["stopped_reason"] == "user"

        behaviors["mode"] = "crash"
        _req(port, "POST", "/v1/pipelines/demo/start")
        assert plane.wait("demo", timeout=30) == "failed"
        _, doc = _req(port, "GET", "/v1/pipelines/demo")
        assert doc["stopped_reason"] == "system"

        # restart clears the attribution while running
        behaviors["mode"] = "block"
        _req(port, "POST", "/v1/pipelines/demo/start")
        _, doc = _req(port, "GET", "/v1/pipelines/demo")
        assert "stopped_reason" not in doc
        _req(port, "POST", "/v1/pipelines/demo/stop")
    finally:
        srv.shutdown()


# --- health/readiness probes (docs/health_check.md) -------------------


def test_healthz_liveness_and_service_probe(plane_and_port):
    _, port, _ = plane_and_port
    status, body = _req(port, "GET", "/healthz")
    assert (status, body) == (200, {"status": "SERVING"})
    status, body = _req(port, "GET", "/healthz?service=PipelineService")
    assert (status, body) == (200, {"status": "SERVING"})
    status, body = _req(port, "GET", "/healthz?service=NopeService")
    assert status == 404
    assert body["status"] == "NOT_FOUND"


def test_readyz_reports_degraded_without_503(plane_and_port):
    plane, port, _ = plane_and_port
    status, body = _req(port, "GET", "/readyz")
    assert status == 200
    assert body["status"] == "ready"
    assert body["pipelines"]["total"] >= 1
    assert body["pipelines"]["degraded"] == 0
    # a degraded pipeline is REPORTED but the engine stays ready
    pid = plane.list()[0]["id"]
    with plane._lock:
        plane._status[pid] = "degraded"
    status, body = _req(port, "GET", "/readyz")
    assert status == 200
    assert body["pipelines"]["degraded"] == 1
    assert body["pipelines"]["degradedPipelines"][0]["id"] == pid


def test_readyz_starting_is_503(plane_and_port):
    plane, port, _ = plane_and_port
    plane.ready = False
    try:
        status, body = _req(port, "GET", "/readyz")
        assert (status, body) == (503, {"status": "starting"})
    finally:
        plane.ready = True


def test_degraded_error_cause_is_the_nodes_real_error():
    """20260706-degraded-pipeline-error-cause.md: the pipeline's
    reported error is the raising node's actual message, it survives
    to /v1/pipelines[{id}], and a restart clears it."""
    def runner(cfg, stop):
        raise RuntimeError("source connector pg: connection refused")

    plane = ControlPlane(_configs(), runner=runner)
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        _req(port, "POST", "/v1/pipelines/demo/start")
        assert plane.wait("demo", timeout=30) == "failed"
        _, doc = _req(port, "GET", "/v1/pipelines/demo")
        assert doc["stopped_reason"] == "system"
        assert "connection refused" in doc["error"]
        _, rows = _req(port, "GET", "/v1/pipelines")
        assert "connection refused" in rows[0]["error"]

        # restart clears the stale cause while running
        blocker = threading.Event()
        plane._runner = lambda cfg, stop: (stop.wait(5), "stopped")[1]
        _req(port, "POST", "/v1/pipelines/demo/start")
        _, doc = _req(port, "GET", "/v1/pipelines/demo")
        assert "error" not in doc
        _req(port, "POST", "/v1/pipelines/demo/stop")
    finally:
        srv.shutdown()


def test_errors_carry_stable_codes(plane_and_port):
    """20260705-conduit-error-and-structured-output.md (additive):
    every gateway error carries a stable `code`; typed sites add
    config_path/suggestion. Prose `error` stays for old clients."""
    _, port, _ = plane_and_port
    status, body = _req(port, "GET", "/v1/pipelines/nope")
    assert (status, body.get("code")) == (404, "common.not_found")
    status, body = _req(port, "GET", "/no/such/route")
    assert (status, body.get("code")) == (404, "common.not_found")
    status, body = _req(
        port, "POST", "/v1/pipelines", {"id": "x", "connectors": "nope"}
    )
    assert status == 400 and body["code"] == "common.invalid_argument"
    # typed: DLQ window invariant carries path + suggestion
    pid = "demo"
    status, body = _req(
        port,
        "PUT",
        f"/v1/pipelines/{pid}/dead-letter-queue",
        {"window_size": 2, "window_nack_threshold": 5},
    )
    assert status == 400
    assert body["code"] == "pipeline.dlq_window"
    assert body["config_path"] == "dead-letter-queue.window-nack-threshold"
    assert "window-nack-threshold" in body["suggestion"]
    # typed: stale plan apply is a 409 with provisioning.plan_stale
    status, body = _req(
        port,
        "POST",
        "/v1/pipelines/apply",
        {"config": {"id": pid, "connectors": []}, "hash": "bogus"},
    )
    assert status in (400, 409)
    if status == 409:
        assert body["code"] == "provisioning.plan_stale"


def test_dlq_records_view_and_prune(plane_and_port, tmp_path):
    """The queryable-DLQ gap the reference deferred as Tier-1
    (20260715-dlq-record-visibility.md): with a file-backed DLQ the
    record CONTENT is queryable (bounded newest-first tail over the
    crash-safe store), a log-backed DLQ returns the honest 409, and
    dlq_prune bounds the store oldest-first without ever deleting the
    newest batch."""
    import os
    import time

    from conduit_spark.sinks import dlq_prune

    _, port, _ = plane_and_port
    # log-backed DLQ has no record store → explicit error, not []
    status, err = _req(
        port, "GET", "/v1/pipelines/demo/dead-letter-queue/records"
    )
    assert status == 409 and "file-backed" in err["error"]

    dlq_dir = tmp_path / "dlq"
    (dlq_dir / "batch_id=0").mkdir(parents=True)
    (dlq_dir / "batch_id=1").mkdir()
    rec = {
        "position": "p-0",
        "operation": "create",
        "metadata": {"conduit.dlq.error": "boom-0", "conduit.dlq.scope": "pipeline"},
        "payload_after_json": '{"id": 0}',
    }
    with open(dlq_dir / "batch_id=0" / "part-0.json", "w") as f:
        for i in range(3):
            r = dict(rec, position=f"p-{i}")
            r["metadata"] = dict(rec["metadata"], **{"conduit.dlq.error": f"boom-{i}"})
            f.write(json.dumps(r) + "\n")
    time.sleep(0.05)  # newest-first ordering is mtime-based
    with open(dlq_dir / "batch_id=1" / "part-0.json", "w") as f:
        f.write(json.dumps(dict(rec, position="p-new")) + "\n")

    new = {
        "plugin": "builtin:file",
        "settings": {"path": str(dlq_dir), "format": "json"},
        "window_size": 5,
        "window_nack_threshold": 2,
    }
    status, _ = _req(port, "PUT", "/v1/pipelines/demo/dead-letter-queue", new)
    assert status == 200
    status, doc = _req(
        port, "GET", "/v1/pipelines/demo/dead-letter-queue/records?count=2"
    )
    assert status == 200 and doc["count"] == 2
    # newest first: the batch_id=1 record leads, then batch 0's tail
    assert doc["records"][0]["position"] == "p-new"
    assert doc["records"][1]["position"] == "p-2"
    assert doc["records"][1]["metadata"]["conduit.dlq.error"] == "boom-2"

    # prune to a cap that only fits the newest batch
    newest_size = os.path.getsize(dlq_dir / "batch_id=1" / "part-0.json")
    out = dlq_prune(str(dlq_dir), max_bytes=newest_size)
    assert out["deleted_units"] == 1 and out["kept_bytes"] == newest_size
    assert not (dlq_dir / "batch_id=0").exists()
    # the newest unit survives even a zero cap
    out = dlq_prune(str(dlq_dir), max_bytes=0)
    assert out["deleted_units"] == 0
    assert (dlq_dir / "batch_id=1").exists()


def test_cli_dlq_verb(plane_and_port, tmp_path, capsys):
    """`python -m conduit_spark dlq <id>` — CLI front-end of the
    records route; exit 2 on the no-record-store (log-backed) case."""
    from conduit_spark import cli

    _, port, _ = plane_and_port
    server = f"http://127.0.0.1:{port}"
    assert cli.main(["dlq", "demo", "--server", server]) == 2  # log-backed
    capsys.readouterr()

    dlq_dir = tmp_path / "dlq"
    dlq_dir.mkdir()
    (dlq_dir / "part-0.json").write_text(
        json.dumps({"position": "p-0", "operation": "create",
                    "metadata": {"conduit.dlq.error": "x"}}) + "\n"
    )
    _req(port, "PUT", "/v1/pipelines/demo/dead-letter-queue", {
        "plugin": "builtin:file",
        "settings": {"path": str(dlq_dir), "format": "json"},
        "window_size": 5, "window_nack_threshold": 2,
    })
    assert cli.main(["dlq", "demo", "--server", server, "--count", "5"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["count"] == 1 and doc["records"][0]["position"] == "p-0"


def test_dlq_records_parquet_format(plane_and_port, tmp_path):
    """The parquet branch of the record view (a parquet-format DLQ
    destination is the other file-backed shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _, port, _ = plane_and_port
    dlq_dir = tmp_path / "dlqp"
    dlq_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "position": [b"p-0", b"p-1"],
                "operation": ["create", "create"],
                "payload_after_json": ['{"id":0}', '{"id":1}'],
            }
        ),
        dlq_dir / "part-0.parquet",
    )
    _req(port, "PUT", "/v1/pipelines/demo/dead-letter-queue", {
        "plugin": "builtin:file",
        "settings": {"path": str(dlq_dir), "format": "parquet"},
        "window_size": 5, "window_nack_threshold": 2,
    })
    status, doc = _req(
        port, "GET", "/v1/pipelines/demo/dead-letter-queue/records?count=1"
    )
    assert status == 200 and doc["count"] == 1
    # newest-first within a file = reversed row order; bytes decoded
    assert doc["records"][0]["position"] == "p-1"


def test_dlq_prune_flat_files_and_missing_dir(tmp_path):
    """dlq_prune's non-batch-dir shapes: flat part files prune
    oldest-first under the cap, and a missing path is a zero no-op."""
    import os
    import time

    from conduit_spark.sinks import dlq_prune

    d = tmp_path / "flat"
    d.mkdir()
    for i in range(3):
        (d / f"part-{i}.json").write_text("x" * 100)
        time.sleep(0.03)
    out = dlq_prune(str(d), max_bytes=200)
    assert out["deleted_units"] == 1 and out["kept_bytes"] == 200
    assert not (d / "part-0.json").exists()  # oldest went first
    assert (d / "part-2.json").exists()
    assert dlq_prune(str(tmp_path / "nope"), max_bytes=10) == {
        "kept_bytes": 0, "deleted_bytes": 0, "deleted_units": 0,
    }
    # hidden/_ files are never counted or deleted
    (d / "_SUCCESS").write_text("")
    out = dlq_prune(str(d), max_bytes=10**6)
    assert out["deleted_units"] == 0 and (d / "_SUCCESS").exists()
