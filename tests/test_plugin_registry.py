"""Connector-plugin registry: index resolution, fail-closed install
verification, manifest pinning, and the ``standalone:<name>[@ver]``
pipeline plugin form resolving through the installed manifest."""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pytest

from conduit_spark import plugin_registry as reg

ECHO_V1 = """#!/usr/bin/env python3
import sys, json, base64
conf = json.loads(sys.stdin.readline())
n = int(conf["settings"].get("recordCount", 3))
for i in range(n):
    print(json.dumps({
        "position": base64.b64encode(f"v1:{i}".encode()).decode(),
        "operation": "create",
        "metadata": {"version": "1.0.0"},
        "key_json": json.dumps({"id": i}),
        "payload_after_json": json.dumps({"id": i, "v": "one"}),
        "is_structured": True,
    })); sys.stdout.flush()
"""

ECHO_V2 = ECHO_V1.replace('"one"', '"two"').replace("v1:", "v2:").replace(
    '"1.0.0"', '"2.0.0"'
)


@pytest.fixture()
def registry(tmp_path):
    """A local index with two signed versions and one unsigned."""
    arts = tmp_path / "artifacts"
    arts.mkdir()
    (arts / "echo-1.0.0.py").write_text(ECHO_V1)
    (arts / "echo-2.0.0.py").write_text(ECHO_V2)
    (arts / "shady-0.1.0.py").write_text("#!/usr/bin/env python3\n")

    def sha(p):
        return hashlib.sha256(p.read_bytes()).hexdigest()

    index = {
        "connectors": {
            "echo": {
                "v1.0.0": {
                    "artifact": str(arts / "echo-1.0.0.py"),
                    "sha256": sha(arts / "echo-1.0.0.py"),
                },
                "2.0.0": {
                    "artifact": f"file://{arts / 'echo-2.0.0.py'}",
                    "sha256": sha(arts / "echo-2.0.0.py"),
                },
            },
            "shady": {
                "0.1.0": {"artifact": str(arts / "shady-0.1.0.py")},
            },
        }
    }
    index_path = tmp_path / "index.json"
    index_path.write_text(json.dumps(index))
    root = tmp_path / "plugins"
    return str(index_path), str(root)


def test_install_resolves_latest_and_pins_both(registry):
    index_path, root = registry
    # unpinned -> latest by semver (2.0.0, despite the v-prefixed 1.0.0)
    e2 = reg.install("echo", index_path=index_path, root=root)
    assert (e2["version"], e2["verified"]) == ("2.0.0", True)
    e1 = reg.install("echo@v1.0.0", index_path=index_path, root=root)
    assert e1["version"] == "1.0.0"
    # both versions pinned simultaneously (manifest keyed name@version)
    installed = reg.list_installed(root)
    assert [(e["name"], e["version"]) for e in installed] == [
        ("echo", "1.0.0"), ("echo", "2.0.0"),
    ]
    # resolution: unpinned -> latest; pinned -> exact
    assert reg.resolve_installed("echo", root=root) == e2["path"]
    assert reg.resolve_installed("echo@1.0.0", root=root) == e1["path"]


def test_fail_closed_verification(registry, tmp_path):
    index_path, root = registry
    # unsigned refused by default, installable only with the flag
    with pytest.raises(reg.RegistryError, match="unsigned_artifact"):
        reg.install("shady", index_path=index_path, root=root)
    e = reg.install(
        "shady", index_path=index_path, root=root, allow_unsigned=True
    )
    assert e["verified"] is False

    # digest mismatch: refuse, and nothing becomes resolvable
    doc = json.loads(open(index_path).read())
    doc["connectors"]["echo"]["v1.0.0"]["sha256"] = "0" * 64
    tampered = tmp_path / "tampered.json"
    tampered.write_text(json.dumps(doc))
    with pytest.raises(reg.RegistryError, match="verification_failed"):
        reg.install("echo@1.0.0", index_path=str(tampered), root=root)
    with pytest.raises(reg.RegistryError, match="not_installed"):
        reg.resolve_installed("echo@1.0.0", root=root)
    # no staged leftovers
    assert not [f for f in os.listdir(root) if f.endswith(".staged")]


def test_unknown_refs_and_uninstall(registry):
    index_path, root = registry
    with pytest.raises(reg.RegistryError, match="unknown_connector"):
        reg.install("nope", index_path=index_path, root=root)
    with pytest.raises(reg.RegistryError, match="unknown_version"):
        reg.install("echo@9.9.9", index_path=index_path, root=root)
    reg.install("echo", index_path=index_path, root=root)
    reg.install("echo@1.0.0", index_path=index_path, root=root)
    assert reg.uninstall("echo@2.0.0", root=root) == ["echo@2.0.0"]
    assert reg.resolve_installed("echo", root=root).endswith("echo-1.0.0.py")
    assert reg.uninstall("echo", root=root) == ["echo@1.0.0"]
    assert reg.list_installed(root) == []


def test_standalone_plugin_form_runs_pipeline(registry, spark, tmp_path):
    """standalone:<name>@<version> resolves through the manifest and
    runs as a real pipeline source; the validate surface agrees."""
    from conduit_spark.pipeline.config import parse_yaml
    from conduit_spark.pipeline.registry import validate_connector
    from conduit_spark.pipeline.runtime import Pipeline

    index_path, root = registry
    reg.install("echo@1.0.0", index_path=index_path, root=root)
    reg.install("echo@2.0.0", index_path=index_path, root=root)

    out = tmp_path / "out"
    cfg = parse_yaml(
        f"""
version: "2.2"
pipelines:
  - id: reg-e2e
    connectors:
      - id: src
        type: source
        plugin: standalone:echo@1.0.0
        settings: {{recordCount: 4, pluginRoot: "{root}"}}
      - id: dst
        type: destination
        plugin: builtin:file
        settings: {{path: "{out}", format: json}}
"""
    )[0]
    Pipeline(spark, cfg).run_batch()
    rows = [
        json.loads(line)
        for f in os.listdir(out)
        if not f.startswith((".", "_"))
        for line in open(out / f)
        if line.strip()
    ]
    payloads = [json.loads(r["payload_after_json"]) for r in rows]
    assert sorted(p["id"] for p in payloads) == [0, 1, 2, 3]
    assert all(p["v"] == "one" for p in payloads)  # pinned 1.0.0, not latest

    assert validate_connector(
        "source", "standalone:echo@1.0.0", {"pluginRoot": root}
    ) == []
    errs = validate_connector(
        "source", "standalone:ghost", {"pluginRoot": root}
    )
    assert errs and "not_installed" in errs[0]


def test_cli_connectors_verbs(registry, capsys):
    from conduit_spark import cli

    index_path, root = registry
    assert cli.main(["connectors", "list", "--index", index_path]) == 0
    out = capsys.readouterr().out
    assert "echo@1.0.0 [signed]" in out and "shady@0.1.0 [UNSIGNED]" in out
    assert (
        cli.main(
            ["connectors", "install", "echo", "--index", index_path, "--root", root]
        )
        == 0
    )
    entry = json.loads(capsys.readouterr().out)
    assert entry["version"] == "2.0.0"
    assert (
        cli.main(
            ["connectors", "install", "shady", "--index", index_path, "--root", root]
        )
        == 2
    )
    assert "unsigned_artifact" in capsys.readouterr().err
    assert cli.main(["connectors", "installed", "--root", root]) == 0
    assert json.loads(capsys.readouterr().out)[0]["name"] == "echo"
    assert cli.main(["connectors", "uninstall", "echo", "--root", root]) == 0


def test_audit_detects_tamper_and_drift(registry, tmp_path, capsys):
    from conduit_spark import cli

    index_path, root = registry
    reg.install("echo@1.0.0", index_path=index_path, root=root)
    reg.install("shady", index_path=index_path, root=root, allow_unsigned=True)
    findings = {f["ref"]: f for f in reg.audit(root, index_path=index_path)}
    assert findings["echo@1.0.0"]["ok"] is True
    assert findings["shady@0.1.0"]["ok"] is False  # unsigned install flagged
    assert "unsigned_artifact" in findings["shady@0.1.0"]["problems"][0]

    # tamper with the installed artifact on disk
    path = reg.resolve_installed("echo@1.0.0", root=root)
    with open(path, "a") as f:
        f.write("# backdoor\n")
    findings = {f["ref"]: f for f in reg.audit(root)}
    assert findings["echo@1.0.0"]["ok"] is False
    assert "digest drifted" in findings["echo@1.0.0"]["problems"][0]
    # CLI exit mirrors the audit
    assert cli.main(["connectors", "audit", "--root", root]) == 1
    capsys.readouterr()


def test_scaffold_new_connector_runs(registry, tmp_path, capsys):
    """connectors new writes a runnable source skeleton that speaks
    the JSON-lines protocol."""
    import subprocess

    from conduit_spark import cli

    _, root = registry
    path = str(tmp_path / "my-src.py")
    assert cli.main(["connectors", "new", "my-src", path, "--root", root]) == 0
    capsys.readouterr()
    proc = subprocess.run(
        [sys.executable, path],
        input=json.dumps(
            {"settings": {"recordCount": 2}, "connector_id": "c1"}
        )
        + "\n",
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert proc.returncode == 0
    recs = [json.loads(x) for x in proc.stdout.splitlines()]
    assert len(recs) == 2
    assert json.loads(recs[1]["payload_after_json"]) == {"id": 1}
    assert recs[0]["metadata"]["plugin"] == "my-src"


# --- processor artifacts ride the same trust core ---------------------

UPPER_PROC = """#!/usr/bin/env python3
import sys, json
readline = sys.stdin.readline
while True:
    line = readline()
    if not line:
        break
    rec = json.loads(line)
    p = json.loads(rec.get("payload_after_json") or "{}")
    p["shout"] = str(p.get("v", "")).upper()
    rec["payload_after_json"] = json.dumps(p)
    print(json.dumps(rec), flush=True)
"""


@pytest.fixture()
def proc_registry(tmp_path):
    """An index carrying BOTH collections — the additive processors
    extension (20260727-registry-processor-artifacts.md)."""
    arts = tmp_path / "arts"
    arts.mkdir()
    (arts / "upper-1.0.0.py").write_text(UPPER_PROC)
    sha = hashlib.sha256((arts / "upper-1.0.0.py").read_bytes()).hexdigest()
    index = {
        "connectors": {},
        "processors": {
            "upper": {
                "1.0.0": {"artifact": str(arts / "upper-1.0.0.py"), "sha256": sha}
            }
        },
    }
    ipath = tmp_path / "index.json"
    ipath.write_text(json.dumps(index))
    return str(ipath), str(tmp_path / "plugins")


def test_processor_artifact_install_and_kinds(proc_registry):
    ipath, root = proc_registry
    entry = reg.install("upper", index_path=ipath, root=root, kind="processor")
    assert entry["kind"] == "processor"
    assert entry["verified"] is True
    assert "processors" in entry["path"]
    # kind-scoped resolution: the name is NOT resolvable as a connector
    with pytest.raises(reg.RegistryError, match="not_installed"):
        reg.resolve_installed("upper", root=root, kind="connector")
    assert os.path.exists(reg.resolve_installed("upper", root=root, kind="processor"))
    assert [e["name"] for e in reg.list_installed(root, kind="processor")] == ["upper"]
    # audit covers both kinds through the same trust core
    findings = reg.audit(root, index_path=ipath)
    assert findings and all(f["ok"] for f in findings)
    assert reg.uninstall("upper", root=root, kind="processor") == [
        "processor:upper@1.0.0"
    ]


def test_installed_processor_runs_in_pipeline_chain(proc_registry, spark):
    """YAML plugin `standalone:upper` in a processor chain resolves to
    the installed artifact and transforms records end-to-end."""
    from conduit_spark.pipeline import registry as preg

    ipath, root = proc_registry
    reg.install("upper", index_path=ipath, root=root, kind="processor")
    fn = preg.build_processor(
        "standalone:upper", {"pluginRoot": root}, condition=None
    )
    df = spark.createDataFrame(
        [("p0", json.dumps({"v": "hi"}))],
        "position string, payload_after_json string",
    )
    out = fn(df).collect()
    assert json.loads(out[0].payload_after_json)["shout"] == "HI"


def test_index_with_only_processors_is_valid(proc_registry, tmp_path):
    ipath, _ = proc_registry
    doc = json.loads(open(ipath).read())
    del doc["connectors"]
    p2 = tmp_path / "only-procs.json"
    p2.write_text(json.dumps(doc))
    assert "processors" in reg.load_index(str(p2))
    with pytest.raises(reg.RegistryError, match="bad_index"):
        empty = tmp_path / "empty.json"
        empty.write_text("{}")
        reg.load_index(str(empty))


# -- bounded artifact fetch (pkg/registry/boundedfetch parity) --------------
#
# A malicious or compromised index can point at an endless stream and
# disk-fill the host before digest verification runs; the fetcher must
# fail closed at a byte cap and remove the partial staging file.


def _serve(handler_cls):
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_bounded_fetch_refuses_oversized_local_file(tmp_path):
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * 2048)
    dest = tmp_path / "dest.bin"
    with pytest.raises(reg.RegistryError, match="registry.artifact_too_large"):
        reg._fetch(str(big), str(dest), max_bytes=1024)
    assert not dest.exists()


def test_bounded_fetch_fails_fast_on_declared_content_length(tmp_path):
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(10**9))
            self.end_headers()
            # body never sent: the client must refuse on the header alone

        def log_message(self, *a):
            pass

    srv = _serve(H)
    try:
        dest = tmp_path / "d.bin"
        with pytest.raises(reg.RegistryError, match="registry.artifact_too_large"):
            reg._fetch(
                f"http://127.0.0.1:{srv.server_port}/a", str(dest),
                max_bytes=64 * 1024,
            )
        assert not dest.exists()
    finally:
        srv.shutdown()
        srv.server_close()


def test_bounded_fetch_kills_unbounded_stream_and_removes_partial(tmp_path):
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.0"  # no Content-Length: read-until-close

        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            try:
                for _ in range(256):  # 256 KiB against a 64 KiB cap
                    self.wfile.write(b"y" * 1024)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client hung up at the cap — expected

        def log_message(self, *a):
            pass

    srv = _serve(H)
    try:
        dest = tmp_path / "d.bin"
        with pytest.raises(reg.RegistryError, match="registry.artifact_too_large"):
            reg._fetch(
                f"http://127.0.0.1:{srv.server_port}/a", str(dest),
                max_bytes=64 * 1024,
            )
        assert not dest.exists()  # partial removed, not left cap-sized
    finally:
        srv.shutdown()
        srv.server_close()


def test_install_refuses_oversized_artifact_staging_clean(
    registry, monkeypatch, tmp_path
):
    """End-to-end: the cap holds through install() and the staging dir
    stays free of *.staged residue."""
    index_path, root = registry
    monkeypatch.setattr(reg, "MAX_ARTIFACT_BYTES", 16)  # every artifact over
    with pytest.raises(reg.RegistryError, match="registry.artifact_too_large"):
        reg.install(
            "echo@v1.0.0", index_path=index_path, root=root
        )
    leftovers = [f for f in os.listdir(root) if f.endswith(".staged")]
    assert leftovers == []
    assert "echo@v1.0.0" not in reg._load_manifest(root)
