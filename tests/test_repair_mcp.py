"""repair (fix plan + hash-gated apply) and the MCP stdio server
(tool catalog 1:1 with the CLI verbs, write tools behind the
process-level allow_mutations flag)."""

from __future__ import annotations

import json

import pytest
import yaml

from conduit_spark.pipeline import repair
from conduit_spark.pipeline.config import load_pipelines

DIRTY = """
version: "1.2"
pipelines:
  - id: fixme
    connectors:
      - type: source
        plugin: builtin:generator
        settings: {recordCount: 2, format.options: {id: int}}
      - id: out
        type: destination
        plugin: builtin:log
    processors:
      - type: filter
        condition: 'x'
    dead-letter-queue:
      plugin: builtin:log
      window-size: 3
      window-nack-threshold: 5
"""


def _write(tmp_path, text=DIRTY):
    f = tmp_path / "p.yaml"
    f.write_text(text)
    return str(f)


def test_repair_collect_classifies(tmp_path):
    plan = repair.collect(_write(tmp_path))
    by_code = {}
    for f in plan["fixes"]:
        by_code.setdefault(f["code"], []).append(f)
    assert set(by_code) == {
        "repair.version_migrate",
        "repair.missing_id",
        "repair.processor_type_rename",
        "repair.dlq_window_never_acks",
    }
    # missing ids: the unnamed connector AND the type:-spelled processor
    assert len(by_code["repair.missing_id"]) == 2
    assert by_code["repair.dlq_window_never_acks"][0]["class"] == "data_path"
    assert all(
        f["class"] == "safe"
        for code, fs in by_code.items()
        if code != "repair.dlq_window_never_acks"
        for f in fs
    )
    assert len(plan["hash"]) == 64
    # deterministic
    assert repair.collect(_write(tmp_path))["hash"] == plan["hash"]


def test_repair_apply_hash_gated(tmp_path):
    path = _write(tmp_path)
    plan = repair.collect(path)
    with pytest.raises(PermissionError, match="plan_stale"):
        repair.apply(path, plan_hash="deadbeef")
    result = repair.apply(path, plan_hash=plan["hash"])
    # safe fixes applied; the data-path DLQ clamp skipped, not fatal
    assert {f["code"] for f in result["applied"]} == {
        "repair.version_migrate",
        "repair.missing_id",
        "repair.processor_type_rename",
    }
    assert [s["skip_reason"] for s in result["skipped"]] == [
        "repair.data_path_fix_refused"
    ]
    doc = yaml.safe_load(open(path))
    assert doc["version"] == "2.2"
    assert doc["pipelines"][0]["processors"][0]["plugin"] == "filter"
    assert doc["pipelines"][0]["connectors"][0]["id"] == "generator"
    # untouched data-path setting
    assert doc["pipelines"][0]["dead-letter-queue"]["window-nack-threshold"] == 5
    # repaired file parses clean
    cfgs = load_pipelines(path)
    assert cfgs[0].processors[0].plugin == "filter"


def test_repair_escalate_and_clean_file(tmp_path):
    path = _write(tmp_path)
    plan = repair.collect(path)
    dlq_path = next(
        f["config_path"]
        for f in plan["fixes"]
        if f["code"] == "repair.dlq_window_never_acks"
    )
    # explicitly selected + escalated -> applied
    result = repair.apply(
        path, plan_hash=plan["hash"], fix_paths=[dlq_path], escalate=True
    )
    assert result["applied"][0]["code"] == "repair.dlq_window_never_acks"
    assert yaml.safe_load(open(path))["pipelines"][0]["dead-letter-queue"][
        "window-nack-threshold"
    ] == 2
    # fix the rest, then a clean file refuses apply
    repair.apply(path, yes=True)
    with pytest.raises(ValueError, match="no_fixes_available"):
        repair.apply(path, yes=True)
    assert repair.collect(path)["fixes"] == []


def test_cli_repair_round_trip(tmp_path, capsys):
    from conduit_spark import cli

    path = _write(tmp_path)
    assert cli.main(["repair", path]) == 0
    plan = json.loads(capsys.readouterr().out)
    # stale hash refused at the CLI too
    assert cli.main(["repair", path, "--apply", "--plan-hash", "nope"]) == 2
    capsys.readouterr()
    assert (
        cli.main(["repair", path, "--apply", "--plan-hash", plan["hash"]]) == 0
    )
    result = json.loads(capsys.readouterr().out)
    assert len(result["applied"]) == 4 and len(result["skipped"]) == 1


# -- MCP ---------------------------------------------------------------


def _rpc(srv, method, params=None, rid=1):
    return srv.handle(
        {"jsonrpc": "2.0", "id": rid, "method": method, "params": params or {}}
    )


def test_mcp_handshake_and_catalog():
    from conduit_spark.mcp import MCPServer

    srv = MCPServer()
    init = _rpc(srv, "initialize")
    assert init["result"]["serverInfo"]["name"] == "conduit-spark"
    assert srv.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None
    tools = {t["name"] for t in _rpc(srv, "tools/list")["result"]["tools"]}
    assert tools == {
        "validate", "lint", "dry_run", "doctor", "deploy", "inspect",
        "generate", "dlq_records", "repair",
    }
    # write tools appear ONLY with the process-level flag
    mut = MCPServer(allow_mutations=True)
    mut_tools = {t["name"] for t in _rpc(mut, "tools/list")["result"]["tools"]}
    assert mut_tools - tools == {
        "apply", "start", "stop", "scaffold_pipeline", "repair_apply",
    }
    err = _rpc(srv, "no/such")
    assert err["error"]["code"] == -32601


def test_mcp_offline_tools(tmp_path):
    from conduit_spark.mcp import MCPServer

    srv = MCPServer()
    path = _write(tmp_path)
    linty = tmp_path / "linty.yaml"
    linty.write_text(DIRTY.replace("- type: source", "- id: src\n        type: source"))
    out = _rpc(
        srv, "tools/call", {"name": "lint", "arguments": {"path": str(linty)}}
    )
    assert out["result"]["isError"] is False
    payload = json.loads(out["result"]["content"][0]["text"])
    assert payload["exit_code"] == 0 and "deprecated" in payload["output"]
    out = _rpc(srv, "tools/call", {"name": "repair", "arguments": {"path": path}})
    plan = json.loads(out["result"]["content"][0]["text"])
    assert len(plan["fixes"]) == 5
    # unknown tool is a protocol error; failing tool is an isError RESULT
    assert _rpc(srv, "tools/call", {"name": "nope"})["error"]["code"] == -32602
    out = _rpc(
        srv, "tools/call",
        {"name": "repair", "arguments": {"path": str(tmp_path / "missing.yaml")}},
    )
    assert out["result"]["isError"] is True


def test_mcp_repair_apply_never_escalates(tmp_path):
    from conduit_spark.mcp import MCPServer

    srv = MCPServer(allow_mutations=True)
    path = _write(tmp_path)
    plan = repair.collect(path)
    out = _rpc(
        srv, "tools/call",
        {
            "name": "repair_apply",
            "arguments": {"path": path, "hash": plan["hash"]},
        },
    )
    result = json.loads(out["result"]["content"][0]["text"])
    assert out["result"]["isError"] is False
    assert [s["skip_reason"] for s in result["skipped"]] == [
        "repair.data_path_fix_refused"
    ]


def test_mcp_lifecycle_tools_against_control_plane(tmp_path):
    """start/stop/inspect/deploy+apply drive the HTTP gateway."""
    from conduit_spark.http_api import ControlPlane, start_server
    from conduit_spark.mcp import MCPServer
    from conduit_spark.pipeline.config import parse_yaml

    base = """
version: "2.2"
pipelines:
  - id: m1
    connectors:
      - id: src
        type: source
        plugin: builtin:generator
        settings: {recordCount: 2, format.options: {id: int}}
      - id: out
        type: destination
        plugin: builtin:log
"""

    def runner(cfg, stop):
        stop.wait(timeout=10)
        return "stopped"

    plane = ControlPlane(parse_yaml(base), runner=runner, live_restart_apply=False)
    http_srv = start_server(plane)
    port = http_srv.server_address[1]
    try:
        srv = MCPServer(
            allow_mutations=True, api_address=f"http://127.0.0.1:{port}"
        )
        out = _rpc(
            srv, "tools/call",
            {"name": "start", "arguments": {"pipeline_id": "m1"}},
        )
        assert json.loads(out["result"]["content"][0]["text"])["status"] == "running"
        out = _rpc(
            srv, "tools/call",
            {"name": "stop", "arguments": {"pipeline_id": "m1"}},
        )
        assert json.loads(out["result"]["content"][0]["text"])["status"] == "stopped"

        # deploy (plan) then apply through the MCP pair
        f = tmp_path / "m1.yaml"
        f.write_text(base.replace("recordCount: 2", "recordCount: 7"))
        from conduit_spark.pipeline.config import pipeline_to_dict

        cfg = parse_yaml(f.read_text())[0]
        diff = plane.plan(pipeline_to_dict(cfg))
        out = _rpc(
            srv, "tools/call",
            {
                "name": "apply",
                "arguments": {"path": str(f), "hash": diff["hash"]},
            },
        )
        assert out["result"]["isError"] is False
        assert plane.export_pipeline("m1")["connectors"][0]["settings"][
            "recordCount"
        ] == 7
        # stale hash comes back as a tool error result, not a crash
        out = _rpc(
            srv, "tools/call",
            {"name": "apply", "arguments": {"path": str(f), "hash": "stale"}},
        )
        assert out["result"]["isError"] is True
        assert "plan_stale" in out["result"]["content"][0]["text"]
    finally:
        http_srv.shutdown()


def test_mcp_stdio_round_trip():
    import io

    from conduit_spark.mcp import MCPServer

    stdin = io.StringIO(
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"})
        + "\n"
        + json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"})
        + "\nnot-json\n"
        + json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        + "\n"
    )
    stdout = io.StringIO()
    MCPServer().serve_stdio(stdin, stdout)
    lines = [json.loads(x) for x in stdout.getvalue().splitlines()]
    assert lines[0]["id"] == 1 and "serverInfo" in lines[0]["result"]
    assert lines[1]["error"]["code"] == -32700  # the bad line
    assert lines[2]["id"] == 2 and lines[2]["result"]["tools"]


def test_mcp_http_transport(tmp_path):
    """POST /mcp serves the tool catalog over HTTP (the reference's
    mcp --http mode): JSON-RPC per request, 202 for notifications,
    404 when the operator did not enable the transport."""
    import urllib.request

    from conduit_spark.http_api import ControlPlane, start_server
    from conduit_spark.mcp import MCPServer

    def post(port, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mcp",
            data=json.dumps(body).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None

    srv = start_server(ControlPlane(), mcp=MCPServer())
    port = srv.server_address[1]
    try:
        status, resp = post(
            port, {"jsonrpc": "2.0", "id": 1, "method": "initialize"}
        )
        assert status == 200
        assert resp["result"]["serverInfo"]["name"] == "conduit-spark"
        status, resp = post(
            port, {"jsonrpc": "2.0", "method": "notifications/initialized"}
        )
        assert status == 202 and resp is None
        status, resp = post(
            port, {"jsonrpc": "2.0", "id": 2, "method": "tools/list"}
        )
        tools = {t["name"] for t in resp["result"]["tools"]}
        assert "lint" in tools and "apply" not in tools  # read-only server
        # lint through HTTP end-to-end
        f = tmp_path / "p.yaml"
        f.write_text(DIRTY.replace("- type: source", "- id: s\n        type: source"))
        status, resp = post(
            port,
            {
                "jsonrpc": "2.0", "id": 3, "method": "tools/call",
                "params": {"name": "lint", "arguments": {"path": str(f)}},
            },
        )
        assert resp["result"]["isError"] is False
    finally:
        srv.shutdown()

    # transport off by default
    srv = start_server(ControlPlane())
    port = srv.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mcp",
            data=b"{}",
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        import urllib.error

        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_mcp_generate_tool():
    """The generate tool on MCP: a satisfiable request returns gated
    YAML + the deploy-next-step hint; an unsatisfiable one returns a
    structured rejection (not an error — the agent needs the reasons)."""
    from conduit_spark.mcp import MCPServer

    srv = MCPServer()
    out = _rpc(
        srv, "tools/call",
        {"name": "generate",
         "arguments": {"request": "from kafka topic 'orders' to s3"}},
    )
    assert out["result"]["isError"] is False
    payload = json.loads(out["result"]["content"][0]["text"])
    assert "builtin:kafka" in payload["yaml"] and "orders" in payload["yaml"]
    assert "deploy" in payload["next"]

    out = _rpc(
        srv, "tools/call",
        {"name": "generate",
         "arguments": {"request": "from dynamodb to snowflake"}},
    )
    payload = json.loads(out["result"]["content"][0]["text"])
    assert payload["rejected"] is True
    assert any("dynamodb" in r for r in payload["reasons"])
