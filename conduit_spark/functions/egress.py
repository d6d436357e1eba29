"""Host-mediated, allowlisted HTTP egress for standalone plugins.

The reference's WASM processors run under wazero + WASI P1 with NO
socket API; outbound HTTP happens only through a host function with a
two-stage allowlist (reference
docs/design-documents/20260726-wasm-host-egress-capability.md). This
module is that security boundary for this engine's subprocess plugins:
the child never dials — it asks the host over its JSON-lines channel,
and the host performs the request iff the policy allows it.

The two independent stages, exactly as the reference fixes them:

1. **Coarse pre-filter** — scheme + hostname (+ optional port) must
   match an ``allow`` entry.
2. **Resolved-IP check on every dial** — the hostname is resolved
   HERE, the socket connects to that literal IP (TOCTOU/DNS-rebinding
   defense), and private / loopback / link-local / reserved /
   embedded-v4 (v4-mapped and NAT64 ``64:ff9b::/96``) ranges are
   refused unless that exact ``(ip, port)`` pair is explicitly
   allowlisted (the local-Ollama case).

Also host-enforced: no proxy (we dial the IP directly; environment
proxies never apply), redirects are NOT followed (3xx returns as the
response), per-call timeout, response-size cap, and the ``Host``
header is pinned to the allowlisted hostname — the child cannot
override it.
"""

from __future__ import annotations

import ipaddress
import socket
from urllib.parse import urlsplit

DEFAULT_TIMEOUT_S = 10.0
DEFAULT_MAX_RESPONSE_BYTES = 1 << 20  # 1 MiB
_HOST_RESERVED_HEADERS = {"host", "accept-encoding"}

_NAT64 = ipaddress.ip_network("64:ff9b::/96")


class EgressDenied(PermissionError):
    """The policy refused the call; the message says which stage."""


def _ip_is_forbidden(ip: ipaddress.IPv4Address | ipaddress.IPv6Address) -> bool:
    """Anything not globally routable is refused — ``is_global`` covers
    private/loopback/link-local/reserved AND the shared CGNAT space
    100.64.0.0/10 (``is_private`` misses it, and cloud-internal LBs /
    VPC services commonly live there); v4-mapped and NAT64 embeddings
    are unwrapped/refused so a v6 answer cannot smuggle a v4 target."""
    if isinstance(ip, ipaddress.IPv6Address):
        if ip.ipv4_mapped is not None:
            return _ip_is_forbidden(ip.ipv4_mapped)
        if ip in _NAT64:
            return True
    return not ip.is_global or ip.is_multicast


class EgressPolicy:
    """``allow`` entries are ``scheme://host[:port]`` — no paths, no
    wildcards (an explicit, reviewable list). ``allow_ip_ports`` are
    ``"ip:port"`` strings that exempt specific private endpoints."""

    def __init__(
        self,
        allow: list[str],
        *,
        allow_ip_ports: list[str] | None = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        max_response_bytes: int = DEFAULT_MAX_RESPONSE_BYTES,
    ) -> None:
        self._allow: set[tuple[str, str, int]] = set()
        for entry in allow:
            s = urlsplit(entry)
            if s.scheme not in ("http", "https") or not s.hostname or s.path.strip("/"):
                raise ValueError(
                    f"allow entry {entry!r} must be scheme://host[:port] "
                    "with no path"
                )
            port = s.port or (443 if s.scheme == "https" else 80)
            self._allow.add((s.scheme, s.hostname.lower(), port))
        self._allow_ip_ports: set[tuple[str, int]] = set()
        for ip_port in allow_ip_ports or []:
            host, _, port = ip_port.rpartition(":")
            self._allow_ip_ports.add(
                (str(ipaddress.ip_address(host.strip("[]"))), int(port))
            )
        self.timeout_s = float(timeout_s)
        self.max_response_bytes = int(max_response_bytes)

    # -- stage 1: coarse pre-filter -----------------------------------

    def check_url(self, url: str) -> tuple[str, str, int, str]:
        s = urlsplit(url)
        if s.scheme not in ("http", "https") or not s.hostname:
            raise EgressDenied(f"egress denied (scheme): {url!r}")
        host = s.hostname.lower()
        port = s.port or (443 if s.scheme == "https" else 80)
        if (s.scheme, host, port) not in self._allow:
            raise EgressDenied(
                f"egress denied (allowlist): {s.scheme}://{host}:{port} "
                "is not an allowed origin"
            )
        path = s.path or "/"
        if s.query:
            path += "?" + s.query
        return s.scheme, host, port, path

    # -- stage 2: resolved-IP check on every dial ---------------------

    def resolve_and_check(self, host: str, port: int) -> str:
        try:
            infos = socket.getaddrinfo(host, port, proto=socket.IPPROTO_TCP)
        except OSError as e:
            raise EgressDenied(f"egress denied (resolve): {host}: {e}") from e
        for _fam, _t, _p, _c, addr in infos:
            ip = ipaddress.ip_address(addr[0])
            if _ip_is_forbidden(ip) and (str(ip), port) not in self._allow_ip_ports:
                raise EgressDenied(
                    f"egress denied (resolved-ip): {host} resolves to "
                    f"{ip}, a non-public address; allowlist the exact "
                    f"ip:port to permit it"
                )
        return infos[0][4][0]

    # -- the host-executed call ---------------------------------------

    def request(
        self,
        method: str,
        url: str,
        *,
        headers: dict[str, str] | None = None,
        body: bytes | str | None = None,
    ) -> dict:
        """Execute one bounded HTTP call. Returns ``{"status", "headers",
        "body"}`` (body utf-8-decoded with replacement — the channel is
        JSON lines). Redirects are returned, never followed."""
        import http.client

        scheme, host, port, path = self.check_url(url)
        ip = self.resolve_and_check(host, port)
        # Dial the CHECKED ip literally (a second resolve could rebind),
        # then hand the connected socket to http.client — connect() is
        # skipped when .sock is already set. For TLS, SNI and the
        # certificate check target the allowlisted HOSTNAME.
        raw = socket.create_connection((ip, port), timeout=self.timeout_s)
        if scheme == "https":
            import ssl

            ctx = ssl.create_default_context()
            raw = ctx.wrap_socket(raw, server_hostname=host)
        conn = http.client.HTTPConnection(host, port, timeout=self.timeout_s)
        conn.sock = raw
        clean_headers = {
            k: v
            for k, v in (headers or {}).items()
            if k.lower() not in _HOST_RESERVED_HEADERS
        }
        default_port = 443 if scheme == "https" else 80
        # pinned; child cannot spoof (non-default ports appear per RFC 9112)
        clean_headers["Host"] = host if port == default_port else f"{host}:{port}"
        if isinstance(body, str):
            body = body.encode("utf-8")
        # timeout_s bounds the WHOLE call, not each socket op — a
        # trickling server (1 byte per timeout window) must not hold
        # the task open; the remaining budget shrinks across reads.
        import time as _time

        deadline = _time.monotonic() + self.timeout_s

        def _budget() -> float:
            left = deadline - _time.monotonic()
            if left <= 0:
                raise EgressDenied(
                    f"egress denied (deadline): call exceeded "
                    f"{self.timeout_s}s total"
                )
            return left

        try:
            conn.request(method.upper(), path, body=body, headers=clean_headers)
            raw.settimeout(min(self.timeout_s, _budget()))
            resp = conn.getresponse()
            chunks: list[bytes] = []
            got_n = 0
            while got_n <= self.max_response_bytes:
                if resp.isclosed():  # EOF consumed; socket already gone
                    break
                raw.settimeout(min(self.timeout_s, _budget()))
                chunk = resp.read(65536)
                if not chunk:
                    break
                chunks.append(chunk)
                got_n += len(chunk)
            payload = b"".join(chunks)
            if len(payload) > self.max_response_bytes:
                raise EgressDenied(
                    f"egress denied (size): response exceeds "
                    f"{self.max_response_bytes} bytes"
                )
            return {
                "status": resp.status,
                "headers": dict(resp.getheaders()),
                "body": payload.decode("utf-8", "replace"),
            }
        finally:
            conn.close()


def policy_from_settings(doc: dict | None) -> EgressPolicy | None:
    """``egress:`` settings block → policy (None when absent: egress
    requests are refused outright — deny-by-default)."""
    if not doc:
        return None
    return EgressPolicy(
        list(doc.get("allow") or []),
        allow_ip_ports=list(doc.get("allowIpPorts") or []),
        timeout_s=float(doc.get("timeoutSeconds", DEFAULT_TIMEOUT_S)),
        max_response_bytes=int(
            doc.get("maxResponseBytes", DEFAULT_MAX_RESPONSE_BYTES)
        ),
    )
