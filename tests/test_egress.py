"""Host-mediated egress capability (the WASM egress-boundary analog,
reference 20260726-wasm-host-egress-capability.md): two-stage
allowlist unit tests + the full child-asks-host-answers protocol
through custom_subprocess against a real local HTTP server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from conduit_spark.functions.egress import (
    EgressDenied,
    EgressPolicy,
    policy_from_settings,
)


class _Srv(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, code, body: bytes, extra=None):
        self.send_response(code)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/redirect":
            return self._reply(302, b"", {"Location": "http://evil.example/"})
        if self.path == "/big":
            return self._reply(200, b"x" * 4096)
        return self._reply(
            200,
            json.dumps({"path": self.path, "host": self.headers.get("Host")}).encode(),
        )

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n)
        return self._reply(200, json.dumps({"echo": body.decode()}).encode())


@pytest.fixture(scope="module")
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Srv)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield "127.0.0.1", srv.server_address[1]
    srv.shutdown()


def _local_policy(host, port, **kw):
    # loopback is forbidden by stage 2 unless the exact ip:port is
    # exempted — the reference's local-Ollama case
    return EgressPolicy(
        [f"http://{host}:{port}"], allow_ip_ports=[f"{host}:{port}"], **kw
    )


def test_stage1_allowlist_and_scheme():
    p = EgressPolicy(["https://api.example.com"])
    assert p.check_url("https://api.example.com/v1/embed")[1] == "api.example.com"
    with pytest.raises(EgressDenied, match="allowlist"):
        p.check_url("https://other.example.com/")
    with pytest.raises(EgressDenied, match="allowlist"):
        p.check_url("http://api.example.com/")  # scheme is part of the origin
    with pytest.raises(EgressDenied, match="allowlist"):
        p.check_url("https://api.example.com:8443/")  # port too
    with pytest.raises(EgressDenied, match="scheme"):
        p.check_url("ftp://api.example.com/")
    with pytest.raises(ValueError, match="no path"):
        EgressPolicy(["https://api.example.com/v1"])


def test_stage2_refuses_private_ranges_unless_exempted(http_server):
    host, port = http_server
    blocked = EgressPolicy([f"http://{host}:{port}"])  # no ip:port exemption
    with pytest.raises(EgressDenied, match="resolved-ip"):
        blocked.request("GET", f"http://{host}:{port}/ok")
    allowed = _local_policy(host, port)
    out = allowed.request("GET", f"http://{host}:{port}/ok")
    assert out["status"] == 200
    assert json.loads(out["body"])["path"] == "/ok"


def test_host_header_pinned_and_reserved_headers_stripped(http_server):
    host, port = http_server
    p = _local_policy(host, port)
    out = p.request(
        "GET",
        f"http://{host}:{port}/h",
        headers={"Host": "spoofed.example", "X-Ok": "1"},
    )
    assert json.loads(out["body"])["host"] == f"{host}:{port}"


def test_redirects_returned_not_followed(http_server):
    host, port = http_server
    out = _local_policy(host, port).request("GET", f"http://{host}:{port}/redirect")
    assert out["status"] == 302
    assert out["headers"].get("Location") == "http://evil.example/"


def test_response_size_cap(http_server):
    host, port = http_server
    p = _local_policy(host, port, max_response_bytes=1024)
    with pytest.raises(EgressDenied, match="size"):
        p.request("GET", f"http://{host}:{port}/big")


def test_post_body_roundtrip(http_server):
    host, port = http_server
    out = _local_policy(host, port).request(
        "POST", f"http://{host}:{port}/echo", body="hello"
    )
    assert json.loads(out["body"]) == {"echo": "hello"}


# --- the child protocol through custom_subprocess ---------------------

CHILD = r"""
import json, sys

# Protocol notes a real plugin must follow: (1) readline(), not
# `for line in sys.stdin` — iteration read-ahead would swallow
# interleaved lines; (2) the engine pipelines records, so lines
# arriving while an http_response is pending may be RECORDS — match on
# cmd == "http_response" and queue everything else.
readline = sys.stdin.readline
pending = []

def rpc(req):
    print(json.dumps(req), flush=True)
    while True:
        obj = json.loads(readline())
        if isinstance(obj, dict) and obj.get("cmd") == "http_response":
            return obj
        pending.append(obj)

def next_record():
    if pending:
        return pending.pop(0)
    line = readline()
    return json.loads(line) if line else StopIteration

while True:
    rec = next_record()
    if rec is StopIteration:
        break
    if rec is None:
        continue
    url = json.loads(rec["payload_after_json"])["url"]
    resp = rpc({"cmd": "http_request", "id": 1, "method": "GET", "url": url})
    rec["payload_after_json"] = json.dumps(
        {"status": resp.get("status"), "denied": resp.get("denied", False)}
    )
    print(json.dumps(rec), flush=True)
"""


def test_child_egress_through_host_channel(spark, tmp_path, http_server):
    import sys

    from conduit_spark.operators import custom_subprocess

    host, port = http_server
    plugin = tmp_path / "egress_child.py"
    plugin.write_text(CHILD)
    rows = [
        (f"p{i}", json.dumps({"url": f"http://{host}:{port}/r{i}"})) for i in range(6)
    ] + [("deny", json.dumps({"url": "http://unlisted.example/x"}))]
    df = spark.createDataFrame(
        rows, "position string, payload_after_json string"
    )
    out = custom_subprocess(
        df.repartition(1),
        [sys.executable, "-u", str(plugin)],
        egress={
            "allow": [f"http://{host}:{port}"],
            "allowIpPorts": [f"{host}:{port}"],
        },
    ).collect()
    got = {r.position: json.loads(r.payload_after_json) for r in out}
    for i in range(6):
        assert got[f"p{i}"] == {"status": 200, "denied": False}
    # the unlisted origin is refused by the HOST, reported to the child
    assert got["deny"] == {"status": None, "denied": True}


def test_no_egress_block_means_deny_by_default(spark, tmp_path, http_server):
    import sys

    from conduit_spark.operators import custom_subprocess

    host, port = http_server
    plugin = tmp_path / "egress_child2.py"
    plugin.write_text(CHILD)
    df = spark.createDataFrame(
        [("p0", json.dumps({"url": f"http://{host}:{port}/x"}))],
        "position string, payload_after_json string",
    )
    out = custom_subprocess(
        df, [sys.executable, "-u", str(plugin)]
    ).collect()
    assert json.loads(out[0].payload_after_json)["denied"] is True


def test_policy_from_settings_validates():
    assert policy_from_settings(None) is None
    p = policy_from_settings(
        {"allow": ["https://api.example.com"], "timeoutSeconds": 3}
    )
    assert p.timeout_s == 3.0
    with pytest.raises(ValueError):
        policy_from_settings({"allow": ["not a url"]})


def test_stage2_refuses_cgnat_shared_space():
    """100.64.0.0/10 (CGNAT shared address space) is not private by
    ipaddress's classification but is NOT globally routable — cloud
    VPC services live there; the resolved-IP check must refuse it."""
    from conduit_spark.functions.egress import _ip_is_forbidden
    import ipaddress

    assert _ip_is_forbidden(ipaddress.ip_address("100.64.12.5"))
    assert _ip_is_forbidden(ipaddress.ip_address("::ffff:100.64.12.5"))
    assert _ip_is_forbidden(ipaddress.ip_address("64:ff9b::6440:c05"))
    assert not _ip_is_forbidden(ipaddress.ip_address("93.184.216.34"))
    assert not _ip_is_forbidden(ipaddress.ip_address("2606:2800:220:1::1"))


def test_webhook_policy_transport_e2e(spark, http_server):
    """webhook.http with an `egress:` settings block routes through the
    same two-stage boundary: allowlisted endpoint enriched, unlisted
    origin denied (DLQ-routed as an errored record)."""
    from conduit_spark.pipeline.registry import build_processor

    host, port = http_server
    fn = build_processor(
        "webhook.http",
        {
            "url": f"http://{host}:{port}/hook",
            "method": "GET",
            "response.body": ".Payload.After.hook",
            "egress": {
                "allow": [f"http://{host}:{port}"],
                "allowIpPorts": [f"{host}:{port}"],
            },
        },
        condition=None,
    )
    df = spark.createDataFrame(
        [("p0", json.dumps({"id": 1}))],
        "position string, payload_after_json string",
    )
    out = fn(df).collect()
    assert len(out) == 1
    body = json.loads(out[0].payload_after_json)
    assert json.loads(body["hook"])["path"] == "/hook"


def test_webhook_policy_transport_denies_unlisted(spark, http_server):
    from conduit_spark.operators.base import ERROR_COL
    from conduit_spark.pipeline.registry import build_processor

    host, port = http_server
    fn = build_processor(
        "webhook.http",
        {
            "url": "http://unlisted.example/x",
            "egress": {"allow": [f"http://{host}:{port}"]},
        },
        condition=None,
    )
    df = spark.createDataFrame(
        [("p0", json.dumps({"id": 1}))],
        "position string, payload_after_json string",
    )
    rows = fn(df).collect()
    errs = [r for r in rows if getattr(r, ERROR_COL, None)]
    assert errs, "denied egress must surface as an errored record"
    assert "allowlist" in getattr(errs[0], ERROR_COL)
