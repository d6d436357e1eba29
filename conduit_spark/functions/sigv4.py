"""AWS Signature Version 4 request signing, pure stdlib.

The jar-free ``builtin:s3`` wire transport (``functions/minis3.py``,
``sources/s3_wire.py``) previously worked only against endpoints that
skip authentication (MiniS3Server, MinIO with auth off). Real S3 — and
MinIO/Ceph/R2 in their default configs — require SigV4 on every
request, so this module implements the published signing process
(AWS General Reference, "Signature Version 4 signing process"):

1. canonical request  = method \\n canonical-URI \\n canonical-query
   \\n canonical-headers \\n signed-header-names \\n payload-sha256
2. string to sign     = AWS4-HMAC-SHA256 \\n amz-date \\n scope
   \\n sha256(canonical request)
3. signing key        = HMAC chain over date/region/service/aws4_request
4. signature          = HMAC(signing key, string to sign)

Conformance is pinned by the AWS-published worked example (the
``AKIDEXAMPLE`` GET-iam vector) in ``tests/test_minis3.py`` — an
implementation that canonicalizes anything differently cannot produce
that signature. The mirror half, :func:`verify`, lets
:class:`~conduit_spark.functions.minis3.MiniS3Server` enforce SigV4 so
the e2e tests exercise reject paths (bad secret, tampered payload,
missing auth), not just the happy path.

Scope notes (documented, not silent): header signing only (no
presigned URLs, no chunked ``STREAMING-AWS4-`` payloads); payloads are
signed with their real SHA-256 (no ``UNSIGNED-PAYLOAD``) since the
wire transport always has the bytes in hand; session tokens ride the
``x-amz-security-token`` header when provided. :func:`verify` enforces
the AWS 15-minute freshness window and requires host/x-amz-date in
SignedHeaders (ADVICE r7); a nonce-store replay cache is out of scope
for the test-harness server.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse
from datetime import datetime, timezone

ALGORITHM = "AWS4-HMAC-SHA256"


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def amz_date(now: datetime | None = None) -> str:
    """UTC timestamp in SigV4's ``YYYYMMDDTHHMMSSZ`` form."""
    now = now or datetime.now(timezone.utc)
    return now.strftime("%Y%m%dT%H%M%SZ")


def _canonical_uri(path: str, service: str) -> str:
    """Canonical URI per the AWS rules, which differ by service:

    - **s3**: the canonical URI is the once-encoded path EXACTLY as it
      appears on the wire — no re-encoding. Re-quoting each segment
      double-encodes any key containing a space/'+'/'='/non-ASCII
      (``a b`` → ``a%2520b``) and real S3/MinIO/R2 then reject with
      SignatureDoesNotMatch (ADVICE r7, medium). The caller's URL
      builder is responsible for encoding the raw key exactly once.
    - **everything else** (iam, sts, ...): encode each segment AGAIN
      (the spec's "URI-encode twice" rule) — pinned by the
      AKIDEXAMPLE GET-iam vector.
    """
    if not path:
        return "/"
    if service == "s3":
        return path if path.startswith("/") else "/" + path
    segs = path.split("/")
    return "/".join(urllib.parse.quote(seg, safe="-_.~") for seg in segs)


def _canonical_query(query: str) -> str:
    """Sorted, fully URI-encoded key=value pairs."""
    pairs = []
    for part in query.split("&") if query else []:
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append(
            (
                urllib.parse.quote(urllib.parse.unquote_plus(k), safe="-_.~"),
                urllib.parse.quote(urllib.parse.unquote_plus(v), safe="-_.~"),
            )
        )
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def canonical_request(
    method: str, path: str, query: str, headers: dict[str, str],
    payload_sha256: str, service: str = "s3",
) -> tuple[str, str]:
    """Returns (canonical request text, signed-header-name list).
    ``service`` selects the canonical-URI rule (s3 = wire path
    verbatim; others = re-encode, see :func:`_canonical_uri`)."""
    norm = {
        k.lower().strip(): " ".join(str(v).split())
        for k, v in headers.items()
    }
    signed = ";".join(sorted(norm))
    canon_headers = "".join(f"{k}:{norm[k]}\n" for k in sorted(norm))
    text = "\n".join(
        (
            method.upper(),
            _canonical_uri(path, service),
            _canonical_query(query),
            canon_headers,
            signed,
            payload_sha256,
        )
    )
    return text, signed


def signing_key(secret_key: str, date: str, region: str, service: str) -> bytes:
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def string_to_sign(
    date_time: str, scope: str, canonical_req: str
) -> str:
    return "\n".join(
        (ALGORITHM, date_time, scope, _sha256_hex(canonical_req.encode()))
    )


def sign(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes,
    *,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    service: str = "s3",
    date_time: str | None = None,
    session_token: str | None = None,
) -> dict[str, str]:
    """Sign one HTTP request: returns the headers to send (the input
    headers plus ``host``/``x-amz-date``/``x-amz-content-sha256``/
    ``authorization``, and ``x-amz-security-token`` when given)."""
    parsed = urllib.parse.urlsplit(url)
    dt = date_time or amz_date()
    date = dt[:8]
    payload_hash = _sha256_hex(payload or b"")
    out = dict(headers)
    out["host"] = parsed.netloc
    out["x-amz-date"] = dt
    out["x-amz-content-sha256"] = payload_hash
    if session_token:
        out["x-amz-security-token"] = session_token
    canon, signed = canonical_request(
        method, parsed.path, parsed.query, out, payload_hash, service
    )
    scope = f"{date}/{region}/{service}/aws4_request"
    sig = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign(dt, scope, canon).encode(),
        hashlib.sha256,
    ).hexdigest()
    out["authorization"] = (
        f"{ALGORITHM} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    return out


def _parse_authorization(value: str) -> dict | None:
    """Parse an AWS4-HMAC-SHA256 Authorization header into
    {access_key, date, region, service, signed_headers, signature}."""
    if not value.startswith(ALGORITHM + " "):
        return None
    fields = {}
    for part in value[len(ALGORITHM) + 1 :].split(","):
        k, _, v = part.strip().partition("=")
        fields[k] = v
    try:
        cred = fields["Credential"].split("/")
        return {
            "access_key": cred[0],
            "date": cred[1],
            "region": cred[2],
            "service": cred[3],
            "signed_headers": fields["SignedHeaders"].split(";"),
            "signature": fields["Signature"],
        }
    except (KeyError, IndexError):
        return None


MAX_SKEW_SECONDS = 900  # AWS's 15-minute request-freshness rule


def verify(
    method: str,
    path_qs: str,
    headers: dict[str, str],
    payload: bytes,
    *,
    credentials: dict[str, str],
    max_skew_seconds: int | None = MAX_SKEW_SECONDS,
    now: datetime | None = None,
) -> tuple[bool, str]:
    """Server-side SigV4 check against known ``{access_key: secret}``
    pairs: recompute the signature over the SIGNED headers the client
    declared and the payload that actually arrived. Returns
    (ok, reason). Fail-closed: unknown key, malformed header, digest
    mismatch and signature mismatch all refuse.

    Replay hardening (ADVICE r7): ``host`` and ``x-amz-date`` MUST be
    in SignedHeaders (otherwise the date check verifies an unsigned
    value), and ``x-amz-date`` must be within ``max_skew_seconds`` of
    server time (AWS's 15-minute rule; pass ``None`` to disable for
    fixed-vector tests). A full replay cache (nonce store) is out of
    scope for a test-harness server and documented as such."""
    norm = {k.lower(): v for k, v in headers.items()}
    auth = _parse_authorization(norm.get("authorization", ""))
    if auth is None:
        return False, "missing or malformed Authorization header"
    secret = credentials.get(auth["access_key"])
    if secret is None:
        return False, f"unknown access key {auth['access_key']!r}"
    for required in ("host", "x-amz-date"):
        if required not in auth["signed_headers"]:
            return False, f"{required} must be a signed header"
    dt = norm.get("x-amz-date", "")
    if not dt.startswith(auth["date"]):
        return False, "x-amz-date does not match credential scope date"
    if max_skew_seconds is not None:
        try:
            req_time = datetime.strptime(dt, "%Y%m%dT%H%M%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            return False, "malformed x-amz-date"
        ref = now or datetime.now(timezone.utc)
        if abs((ref - req_time).total_seconds()) > max_skew_seconds:
            return False, "request expired (x-amz-date outside skew window)"
    declared = norm.get("x-amz-content-sha256", "")
    if declared != _sha256_hex(payload or b""):
        return False, "payload sha256 does not match x-amz-content-sha256"
    try:
        sign_headers = {h: norm[h] for h in auth["signed_headers"]}
    except KeyError as e:
        return False, f"signed header {e} absent from request"
    parsed = urllib.parse.urlsplit(path_qs)
    canon, _ = canonical_request(
        method, parsed.path, parsed.query, sign_headers, declared,
        auth["service"],
    )
    scope = (
        f"{auth['date']}/{auth['region']}/{auth['service']}/aws4_request"
    )
    expect = hmac.new(
        signing_key(secret, auth["date"], auth["region"], auth["service"]),
        string_to_sign(dt, scope, canon).encode(),
        hashlib.sha256,
    ).hexdigest()
    if not hmac.compare_digest(expect, auth["signature"]):
        return False, "signature mismatch"
    return True, "ok"
