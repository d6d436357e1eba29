"""MCP (Model Context Protocol) server — the `conduit mcp` analog
(reference cmd/conduit/root/mcp + cmd/conduit/internal/mcp): the
engine's operations registered as agent-callable tools, 1:1 with the
CLI verbs, over JSON-RPC 2.0 on stdio.

Tool catalog (matching the reference's server.go:142-156):

- read-only, always registered: ``validate``, ``lint``, ``dry_run``,
  ``doctor``, ``deploy`` (plan only), ``inspect``, ``repair`` (plan
  only)
- write tools, registered ONLY when the server process is started
  with ``allow_mutations=True`` (an operator/process flag, never a
  tool argument — the reference's exact Tier-1 rule): ``apply``,
  ``start``, ``stop``, ``scaffold_pipeline``, ``repair_apply``.
  ``repair_apply`` never escalates data-path fixes: those come back
  as per-fix skips in a successful result, not errors (reference
  AC-15).

``inspect``/``start``/``stop``/``deploy``/``apply`` need a running
control plane: the server takes ``api_address`` and calls the HTTP
gateway — the same split as the reference, whose MCP dials the gRPC
API. Everything else is offline.

Transport is deliberately minimal: newline-delimited JSON-RPC on
stdio (``serve_stdio``), the subset of MCP that tool-calling clients
require — ``initialize``, ``notifications/initialized``,
``tools/list``, ``tools/call``. No SDK dependency; the protocol layer
is ~100 lines and fully unit-tested via ``handle()``.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
from typing import Any

PROTOCOL_VERSION = "2025-06-18"


def _schema(**props: dict) -> dict:
    required = [k for k, v in props.items() if v.pop("_required", False)]
    return {
        "type": "object",
        "properties": props,
        **({"required": required} if required else {}),
    }


_PATH = {"type": "string", "description": "pipeline YAML file or directory"}
_FILE = {"type": "string", "description": "one pipeline YAML file"}


class MCPServer:
    def __init__(
        self,
        *,
        allow_mutations: bool = False,
        api_address: str = "http://127.0.0.1:8080",
    ) -> None:
        self.allow_mutations = allow_mutations
        self.api_address = api_address.rstrip("/")
        self._tools: dict[str, tuple[dict, Any]] = {}
        self._register()

    # -- tool catalog -------------------------------------------------

    def _register(self) -> None:
        t = self._tools
        t["validate"] = (
            {
                "description": "Parse-check pipeline configs; lists "
                "per-file errors. Offline.",
                "inputSchema": _schema(path=dict(_PATH, _required=True)),
            },
            self._t_validate,
        )
        t["lint"] = (
            {
                "description": "validate plus advisory warnings (unknown "
                "fields, deprecated spellings). Offline.",
                "inputSchema": _schema(path=dict(_PATH, _required=True)),
            },
            self._t_lint,
        )
        t["dry_run"] = (
            {
                "description": "The fully-enriched pipeline graph `run` "
                "would load, plus builtin plugin resolution. Offline, no "
                "side effects.",
                "inputSchema": _schema(path=dict(_PATH, _required=True)),
            },
            self._t_dry_run,
        )
        t["doctor"] = (
            {
                "description": "Environment health checks (imports, java).",
                "inputSchema": _schema(),
            },
            self._t_doctor,
        )
        t["deploy"] = (
            {
                "description": "Plan local configs against the running "
                "server: the per-pipeline change diff + hash. Read-only — "
                "use the apply tool to execute a reviewed plan.",
                "inputSchema": _schema(path=dict(_PATH, _required=True)),
            },
            self._t_deploy,
        )
        t["inspect"] = (
            {
                "description": "Sampled in-flight records at a connector "
                "or processor of the running server.",
                "inputSchema": _schema(
                    node_id=dict(
                        {"type": "string"},
                        description="connector/processor id, "
                        "optionally pipeline-scoped ('pipeline:node')",
                        _required=True,
                    ),
                    kind={
                        "type": "string",
                        "enum": ["connector", "processor"],
                        "description": "node kind (default connector)",
                    },
                    count={"type": "integer", "description": "max records"},
                ),
            },
            self._t_inspect,
        )
        t["generate"] = (
            {
                "description": "Natural language -> validated pipeline "
                "YAML, gated by the real validators + a semantic-intent "
                "check (never fabricates plugin names). Read-only: "
                "deploying the output goes through deploy/apply.",
                "inputSchema": _schema(
                    request=dict({"type": "string"}, _required=True),
                    pipeline_id={"type": "string"},
                ),
            },
            self._t_generate,
        )
        t["dlq_records"] = (
            {
                "description": "Dead-lettered record content from the "
                "running server, newest first (file-backed DLQs only). "
                "Read-only.",
                "inputSchema": _schema(
                    pipeline_id=dict({"type": "string"}, _required=True),
                    count={"type": "integer", "description": "max records"},
                ),
            },
            self._t_dlq_records,
        )
        t["repair"] = (
            {
                "description": "Machine-appliable fix plan for one "
                "pipeline file, with the hash repair_apply requires. "
                "Read-only.",
                "inputSchema": _schema(path=dict(_FILE, _required=True)),
            },
            self._t_repair,
        )
        if not self.allow_mutations:
            return
        t["apply"] = (
            {
                "description": "Execute a reviewed deploy plan (hash-gated; "
                "a stale hash is refused, never partially applied).",
                "inputSchema": _schema(
                    path=dict(_FILE, _required=True),
                    hash=dict(
                        {"type": "string"},
                        description="the hash from a prior deploy plan",
                        _required=True,
                    ),
                ),
            },
            self._t_apply,
        )
        t["start"] = (
            {
                "description": "Start a provisioned pipeline on the server.",
                "inputSchema": _schema(
                    pipeline_id=dict({"type": "string"}, _required=True)
                ),
            },
            self._t_start,
        )
        t["stop"] = (
            {
                "description": "Stop a running pipeline on the server.",
                "inputSchema": _schema(
                    pipeline_id=dict({"type": "string"}, _required=True)
                ),
            },
            self._t_stop,
        )
        t["scaffold_pipeline"] = (
            {
                "description": "Write a runnable example pipeline YAML "
                "to the given path.",
                "inputSchema": _schema(path=dict(_FILE, _required=True)),
            },
            self._t_scaffold,
        )
        t["repair_apply"] = (
            {
                "description": "Apply the safe fixes from a reviewed "
                "repair plan (hash-gated). Data-path-adjacent fixes are "
                "reported as skips, never applied — escalation is "
                "human/CLI-only.",
                "inputSchema": _schema(
                    path=dict(_FILE, _required=True),
                    hash=dict(
                        {"type": "string"},
                        description="the hash from a prior repair read",
                        _required=True,
                    ),
                ),
            },
            self._t_repair_apply,
        )

    # -- tool implementations (wrapping the CLI verbs' engines) -------

    @staticmethod
    def _run_cli(argv: list[str]) -> dict:
        from conduit_spark import cli

        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = cli.main(argv)
        return {"exit_code": rc, "output": out.getvalue()}

    def _t_validate(self, args: dict) -> dict:
        return self._run_cli(["validate", "--pipelines", args["path"]])

    def _t_lint(self, args: dict) -> dict:
        return self._run_cli(["lint", args["path"]])

    def _t_dry_run(self, args: dict) -> dict:
        return self._run_cli(["dry-run", args["path"]])

    def _t_doctor(self, args: dict) -> dict:
        return self._run_cli(["doctor"])

    def _t_deploy(self, args: dict) -> dict:
        return self._run_cli(
            ["deploy", "--pipelines", args["path"], "--server", self.api_address]
        )

    def _t_repair(self, args: dict) -> dict:
        from conduit_spark.pipeline import repair

        return repair.collect(args["path"])

    def _http(self, method: str, path: str, body: dict | None = None) -> dict:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.api_address + path,
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            raise RuntimeError(
                json.loads(e.read().decode()).get("error", str(e))
            ) from e

    def _t_inspect(self, args: dict) -> dict:
        kind = args.get("kind", "connector")
        count = int(args.get("count", 10))
        return self._http(
            "GET", f"/v1/{kind}s/{args['node_id']}/inspect?count={count}"
        )

    def _t_generate(self, args: dict) -> dict:
        from conduit_spark.generate import GenerateError, generate_pipeline

        try:
            out = generate_pipeline(
                args["request"],
                pipeline_id=args.get("pipeline_id", "generated"),
            )
        except GenerateError as e:
            return {"rejected": True, "reasons": e.reasons}
        return {
            "yaml": out["yaml"],
            "warnings": out["warnings"],
            "next": "review, then deploy via the deploy+apply tools",
        }

    def _t_dlq_records(self, args: dict) -> dict:
        count = int(args.get("count", 10))
        return self._http(
            "GET",
            f"/v1/pipelines/{args['pipeline_id']}"
            f"/dead-letter-queue/records?count={count}",
        )

    def _t_apply(self, args: dict) -> dict:
        from conduit_spark.pipeline.config import load_pipelines, pipeline_to_dict

        results = []
        for cfg in load_pipelines(args["path"]):
            results.append(
                self._http(
                    "POST",
                    "/v1/pipelines/apply",
                    {"config": pipeline_to_dict(cfg), "hash": args["hash"]},
                )
            )
        return {"applied": results}

    def _t_start(self, args: dict) -> dict:
        return self._http(
            "POST", f"/v1/pipelines/{args['pipeline_id']}/start", {}
        )

    def _t_stop(self, args: dict) -> dict:
        return self._http(
            "POST", f"/v1/pipelines/{args['pipeline_id']}/stop", {}
        )

    def _t_scaffold(self, args: dict) -> dict:
        return self._run_cli(["init", "--path", args["path"]])

    def _t_repair_apply(self, args: dict) -> dict:
        from conduit_spark.pipeline import repair

        # never escalates: data-path fixes surface as per-fix skips in
        # a SUCCESSFUL result (reference AC-15)
        return repair.apply(args["path"], plan_hash=args["hash"])

    # -- JSON-RPC / MCP protocol --------------------------------------

    def handle(self, msg: dict) -> dict | None:
        """One JSON-RPC request → response dict (None for
        notifications)."""
        rid = msg.get("id")
        method = msg.get("method", "")
        if method.startswith("notifications/"):
            return None
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": {
                        "name": "conduit-spark",
                        "version": __import__("conduit_spark").__version__,
                    },
                }
            elif method == "tools/list":
                result = {
                    "tools": [
                        {"name": name, **meta}
                        for name, (meta, _) in sorted(self._tools.items())
                    ]
                }
            elif method == "tools/call":
                params = msg.get("params") or {}
                name = params.get("name")
                if name not in self._tools:
                    raise KeyError(f"unknown tool {name!r}")
                _, fn = self._tools[name]
                try:
                    payload = fn(params.get("arguments") or {})
                    result = {
                        "content": [
                            {"type": "text", "text": json.dumps(payload)}
                        ],
                        "isError": False,
                    }
                except Exception as e:  # noqa: BLE001 — tool errors are
                    # results, not protocol errors (MCP spec)
                    result = {
                        "content": [
                            {"type": "text", "text": f"{type(e).__name__}: {e}"}
                        ],
                        "isError": True,
                    }
            else:
                return {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "error": {
                        "code": -32601,
                        "message": f"method not found: {method}",
                    },
                }
        except Exception as e:  # noqa: BLE001 — malformed params etc.
            return {
                "jsonrpc": "2.0",
                "id": rid,
                "error": {"code": -32602, "message": str(e)},
            }
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def serve_stdio(
        self, stdin=None, stdout=None
    ) -> None:  # pragma: no cover - thin loop over handle()
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                resp = {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32700, "message": "parse error"},
                }
            else:
                resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
