"""TLS across the three jar-free wire transports: the in-process
endpoints serve real TLS (self-signed ECDSA cert minted by the trust
core's cryptography dependency), clients PIN the certificate as their
CA with hostname checking ON — so these tests exercise genuine
verification, not CERT_NONE-disabled TLS. Reject paths: a wrong-CA
client and a plaintext client against a TLS port must both fail.
Combined with round-7's SigV4/SASL/SCRAM work this covers the
reference connectors' transport-security settings (kafka SASL_SSL,
https S3 endpoints, postgres sslmode=require)."""

from __future__ import annotations

import ssl

import pytest

from conduit_spark.functions.tlsutil import generate_self_signed


@pytest.fixture(scope="module")
def cert():
    return generate_self_signed()


@pytest.fixture(scope="module")
def other_cert():
    return generate_self_signed(common_name="impostor")


def test_s3_https_pinned_roundtrip_and_rejects(cert, other_cert):
    from conduit_spark.functions.minis3 import MiniS3Client, MiniS3Server

    cert_pem, key_pem = cert
    with MiniS3Server(tls=(cert_pem, key_pem)) as srv:
        assert srv.endpoint.startswith("https://")
        c = MiniS3Client(srv.endpoint, ca_pem=cert_pem)
        c.create_bucket("tls")
        c.put_object("tls", "k", b"encrypted bytes")
        assert c.get_object("tls", "k") == b"encrypted bytes"
        assert [o["key"] for o in c.list_objects("tls")] == ["k"]

        # wrong CA: certificate verification must fail
        bad = MiniS3Client(srv.endpoint, ca_pem=other_cert[0])
        with pytest.raises(Exception) as e:
            bad.get_object("tls", "k")
        assert "certificate" in str(e.value).lower() or isinstance(
            e.value, ssl.SSLError
        )

        # plaintext client against the TLS port
        plain = MiniS3Client(srv.endpoint.replace("https://", "http://"))
        with pytest.raises(Exception):
            plain.get_object("tls", "k")


def test_s3_sigv4_over_tls(cert):
    """Auth AND encryption together — the real-endpoint shape."""
    from conduit_spark.functions.minis3 import MiniS3Client, MiniS3Server

    cert_pem, key_pem = cert
    with MiniS3Server(
        tls=(cert_pem, key_pem), credentials={"AK": "SK"}
    ) as srv:
        c = MiniS3Client(
            srv.endpoint, ca_pem=cert_pem, access_key="AK", secret_key="SK"
        )
        c.create_bucket("sec")
        c.put_object("sec", "k", b"v")
        assert c.get_object("sec", "k") == b"v"
        anon = MiniS3Client(srv.endpoint, ca_pem=cert_pem)
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            anon.get_object("sec", "k")
        assert e.value.code == 403


def test_kafka_tls_sasl_ssl_roundtrip_and_rejects(cert, other_cert):
    from conduit_spark.functions.minikafka import (
        MiniKafkaBroker,
        MiniKafkaClient,
    )

    cert_pem, key_pem = cert
    with MiniKafkaBroker(
        tls=(cert_pem, key_pem), users={"svc": "pw"}
    ) as b:
        b.create_topic("tls-t", partitions=1)
        # SASL_SSL: SCRAM over TLS
        c = MiniKafkaClient(
            b.bootstrap, tls_ca=cert_pem,
            sasl={"mechanism": "SCRAM-SHA-256",
                  "username": "svc", "password": "pw"},
        )
        with c:
            base = c.produce(
                "tls-t", 0, [{"key": b"k", "value": b"v", "timestamp": 1}]
            )
            recs, _ = c.fetch("tls-t", 0, base)
            assert recs[0]["value"] == b"v"
        # wrong CA
        with pytest.raises(ssl.SSLError):
            MiniKafkaClient(b.bootstrap, tls_ca=other_cert[0])
        # plaintext client against the TLS port: the broker can't parse
        # the handshake as a Kafka frame; connection errors out
        with pytest.raises(Exception):
            MiniKafkaClient(b.bootstrap).api_versions()


def test_postgres_starttls_scram_stream_and_rejects(cert, other_cert):
    from conduit_spark.functions.minipg import MiniPGServer, ReplicationClient

    cert_pem, key_pem = cert
    with MiniPGServer(
        tls=(cert_pem, key_pem), users={"conduit": "pw"}
    ) as srv:
        lsn = srv.feed('{"action":"I"}')
        with ReplicationClient(
            srv.dsn, password="pw", sslmode="require", ssl_ca=cert_pem
        ) as c:
            frames = c.start_replication(0)
            got, payload = next(frames)
            assert got == lsn and b"action" in payload
            c.confirm(lsn)
        # wrong CA
        with pytest.raises(ssl.SSLError):
            ReplicationClient(
                srv.dsn, password="pw", sslmode="require",
                ssl_ca=other_cert[0],
            )


def test_postgres_without_tls_still_answers_N():
    """No server cert: the SSLRequest probe gets 'N' and a plaintext
    session proceeds (libpq sslmode=prefer downgrade)."""
    from conduit_spark.functions.minipg import MiniPGServer, ReplicationClient

    with MiniPGServer() as srv:
        srv.feed("{}")
        with pytest.raises(ConnectionError, match="refused TLS"):
            ReplicationClient(srv.dsn, sslmode="require")
        with ReplicationClient(srv.dsn) as c:  # plaintext still fine
            assert c.identify_system()


def test_kafka_wire_transport_tls_settings_end_to_end(spark, cert):
    """transport=wire + tls.caCert + SASL settings through the
    registry: sink and source tasks each wrap + verify their own TLS
    connections."""
    import json

    from conduit_spark.functions.minikafka import MiniKafkaBroker
    from conduit_spark.pipeline import registry

    cert_pem, key_pem = cert
    with MiniKafkaBroker(tls=(cert_pem, key_pem), users={"svc": "pw"}) as b:
        b.create_topic("tls-pipe", partitions=2)
        settings = {
            "servers": b.bootstrap, "topic": "tls-pipe",
            "transport": "wire", "tls.enabled": "true",
            "tls.caCert": cert_pem, "saslMechanism": "SCRAM-SHA-256",
            "saslUsername": "svc", "saslPassword": "pw",
        }
        src = spark.createDataFrame(
            [(f"u{i}", json.dumps({"n": i})) for i in range(8)],
            "key_json string, payload_after_json string",
        ).selectExpr(
            "key_json",
            "cast(null as binary) as key_raw",
            "payload_after_json",
            "cast(null as binary) as payload_after_raw",
        )
        registry.write_destination(src, "builtin:kafka", settings)
        env = registry.build_source(
            spark, "builtin:kafka", settings, "k", streaming=False
        )
        got = env.collect()
        assert len(got) == 8
        ns = sorted(
            __import__("json").loads(bytes(r.payload_after_raw).decode())["n"]
            for r in got
        )
        assert ns == list(range(8))
