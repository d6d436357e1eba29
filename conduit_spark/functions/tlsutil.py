"""TLS plumbing for the jar-free wire transports.

Round 7 gave the S3/kafka/postgres wire paths authentication (SigV4,
SASL SCRAM); this module adds the encryption half so the transports
match the reference connectors' TLS settings (conduit-connector-kafka
``tls.enabled`` + SASL_SSL, conduit-connector-s3 HTTPS endpoints,
postgres ``sslmode``). Pure stdlib ``ssl`` for the sockets; the
``cryptography`` package (already a trust-core dependency) mints the
self-signed development certificates the in-process endpoints serve.

Trust model: the client PINS the server certificate (the generated
cert doubles as its own CA — ``cafile`` trust, hostname check on), so
the e2e tests exercise real verification, not
``CERT_NONE``-disabled TLS. A client with the wrong CA or a plaintext
client against a TLS port must fail — both reject paths are tested.
"""

from __future__ import annotations

import contextlib
import datetime
import ipaddress
import os
import ssl
import tempfile


def generate_self_signed(
    common_name: str = "127.0.0.1",
    *,
    dns_names: tuple[str, ...] = ("localhost",),
    ip_addresses: tuple[str, ...] = ("127.0.0.1",),
    valid_days: int = 7,
) -> tuple[str, str]:
    """(cert_pem, key_pem): ECDSA P-256 self-signed certificate with
    SubjectAltName entries for loopback testing."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, common_name)]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    san = x509.SubjectAlternativeName(
        [x509.DNSName(d) for d in dns_names]
        + [x509.IPAddress(ipaddress.ip_address(i)) for i in ip_addresses]
    )
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=valid_days))
        .add_extension(san, critical=False)
        .add_extension(
            x509.BasicConstraints(ca=True, path_length=None), critical=True
        )
        .sign(key, hashes.SHA256())
    )
    cert_pem = cert.public_bytes(serialization.Encoding.PEM).decode()
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    return cert_pem, key_pem


@contextlib.contextmanager
def _pem_file(pem: str, suffix: str):
    """PEM material on disk ONLY for the duration of the ssl load call
    (``load_cert_chain``/``load_verify_locations`` read the file
    eagerly). The pre-r8 version used delete=False and never unlinked,
    leaking unencrypted private-key files in the temp dir beyond
    process lifetime (ADVICE r7); the stdlib ssl module has no
    from-memory chain loader before 3.12's ``SSLContext.load_cert_
    chain`` keyfile duality, so write → load → unlink is the portable
    shape."""
    f = tempfile.NamedTemporaryFile(
        "w", suffix=suffix, delete=False, encoding="utf-8"
    )
    try:
        f.write(pem)
        f.close()
        yield f.name
    finally:
        with contextlib.suppress(OSError):
            os.unlink(f.name)


def server_context(
    cert_pem: str, key_pem: str, *, client_ca_pem: str | None = None
) -> ssl.SSLContext:
    """Server context; ``client_ca_pem`` switches on mTLS — the
    handshake then REQUIRES a client certificate chaining to that CA
    (the reference kafka connector's ``clientCert``/``clientKey``
    posture, round 9). A client presenting no certificate or one from
    a different CA fails the handshake."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    with _pem_file(cert_pem, ".crt") as crt, _pem_file(key_pem, ".key") as key:
        ctx.load_cert_chain(crt, key)
    if client_ca_pem is not None:
        ctx.load_verify_locations(cadata=client_ca_pem)
        ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx


def client_context(
    ca_pem: str | None,
    *,
    client_cert_pem: str | None = None,
    client_key_pem: str | None = None,
    insecure_skip_verify: bool = False,
) -> ssl.SSLContext:
    """Verifying client context: the server's self-signed cert IS the
    CA (pinning). ``None`` falls back to the system trust store (real
    endpoints with real certificates). ``client_cert_pem`` +
    ``client_key_pem`` present a client certificate (mTLS).
    ``insecure_skip_verify`` disables chain and hostname verification
    (the reference kafka connector's ``insecureSkipVerify``; encrypted
    but unauthenticated — dev/self-signed endpoints only)."""
    if insecure_skip_verify:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    elif ca_pem is None:
        ctx = ssl.create_default_context()
    else:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        # cadata accepts in-memory PEM directly — no file needed at all
        ctx.load_verify_locations(cadata=ca_pem)
        ctx.verify_mode = ssl.CERT_REQUIRED
        ctx.check_hostname = True
    if client_cert_pem is not None:
        if client_key_pem is None:
            raise ValueError("client certificate requires a client key")
        with _pem_file(client_cert_pem, ".crt") as crt, _pem_file(
            client_key_pem, ".key"
        ) as key:
            ctx.load_cert_chain(crt, key)
    return ctx
