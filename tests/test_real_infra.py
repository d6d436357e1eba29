"""Opt-in real-infrastructure tier (VERDICT r9 items 3+6): the SAME
wire clients the ``transport: wire`` connector paths construct, run
against real Kafka / MinIO / Postgres from ``test/compose.yaml``.

Skipped entirely unless ``CONDUIT_REAL_INFRA=1`` AND the endpoint is
reachable — this sandbox has no Docker, so these never run here; on a
Docker host they are the interop closure the in-process mini-servers
can't provide (both wire ends self-authored there). See
test/README.md for the recipe.
"""

from __future__ import annotations

import hashlib
import os
import socket
import subprocess
import time
import uuid

import pytest

ENABLED = os.environ.get("CONDUIT_REAL_INFRA") == "1"

KAFKA = os.environ.get("REAL_KAFKA_BOOTSTRAP", "localhost:9092")
S3 = os.environ.get("REAL_S3_ENDPOINT", "http://localhost:9000")
S3_KEY = os.environ.get("REAL_S3_ACCESS_KEY", "conduit")
S3_SECRET = os.environ.get("REAL_S3_SECRET_KEY", "conduit-secret")
PG = os.environ.get("REAL_PG_DSN", "localhost:5432")
PG_USER = os.environ.get("REAL_PG_USER", "meroxauser")
PG_PASSWORD = os.environ.get("REAL_PG_PASSWORD", "meroxapass")
PG_DB = os.environ.get("REAL_PG_DB", "meroxadb")


def _reachable(hostport: str) -> bool:
    host, _, port = hostport.rpartition(":")
    host = host or "localhost"
    try:
        with socket.create_connection((host, int(port)), timeout=2):
            return True
    except OSError:
        return False


def _gate(hostport: str) -> None:
    if not ENABLED:
        pytest.skip("set CONDUIT_REAL_INFRA=1 (see test/README.md)")
    if not _reachable(hostport):
        pytest.skip(f"{hostport} unreachable — is test/compose.yaml up?")


def test_real_kafka_negotiates_flexible_and_roundtrips():
    """Against a REAL modern broker the wire client's ApiVersions
    negotiation must land on the flexible revisions (Produce v9,
    Fetch v12 — the broker supports far more, the client caps at its
    own max) and a produce→fetch round-trip returns byte-identical
    records. Closes the KIP-482 interop question on real metal."""
    _gate(KAFKA)
    from conduit_spark.functions.minikafka import MiniKafkaClient

    topic = f"conduit-real-{uuid.uuid4().hex[:8]}"
    recs = [
        {"key": f"k{i}".encode(), "value": f"payload-{i}".encode(),
         "timestamp": 1000 + i}
        for i in range(50)
    ]
    with MiniKafkaClient(KAFKA) as c:
        c.negotiate_versions()
        assert c._produce_version == 9, "real broker must accept Produce v9"
        assert c._fetch_version == 12, "real broker must accept Fetch v12"
        # auto-create via metadata, then wait for the partition
        for _ in range(40):
            md = c.metadata([topic])
            if md["topics"].get(topic, {}).get("partitions"):
                break
            time.sleep(0.25)
        base = c.produce(topic, 0, recs)
        assert base == 0
        got, hwm = c.fetch(topic, 0, 0)
    assert hwm == len(recs)
    assert [(r["key"], r["value"]) for r in got] == [
        (r["key"], r["value"]) for r in recs
    ]


def test_real_kafka_compressed_batches():
    """gzip/snappy-framed RecordBatches decode identically off a real
    broker's log (the broker stores batches verbatim, so this checks
    OUR encoder against a non-self-authored retention path)."""
    _gate(KAFKA)
    from conduit_spark.functions.minikafka import MiniKafkaClient

    topic = f"conduit-realz-{uuid.uuid4().hex[:8]}"
    recs = [{"key": None, "value": (f"v{i}" * 50).encode(), "timestamp": i}
            for i in range(100)]
    with MiniKafkaClient(KAFKA) as c:
        c.negotiate_versions()
        for _ in range(40):
            if c.metadata([topic])["topics"].get(topic, {}).get("partitions"):
                break
            time.sleep(0.25)
        c.produce(topic, 0, recs, compression="gzip")
        got, _ = c.fetch(topic, 0, 0)
    assert [r["value"] for r in got] == [r["value"] for r in recs]


def test_real_minio_sigv4_put_list_get():
    """The engine's SigV4 signer against MinIO: PUT objects whose keys
    contain a space and '+' (the canonical-URI class the r7 encoding
    bug corrupted), paginate ListObjectsV2, GET the bytes back, and
    check MinIO's ETag equals md5 as S3 defines for single-part."""
    _gate(S3.split("//", 1)[-1])
    from conduit_spark.functions.minis3 import MiniS3Client

    bucket = f"conduit-real-{uuid.uuid4().hex[:8]}"
    client = MiniS3Client(S3, access_key=S3_KEY, secret_key=S3_SECRET)
    client.create_bucket(bucket)
    bodies = {}
    for i in range(25):
        key = f"pre fix/{i:04d}+v 1"
        body = f"object-{i}".encode() * 10
        client.put_object(bucket, key, body)
        bodies[key] = body
    listed = client.list_objects(bucket, "pre fix/", page_size=10)
    assert sorted(o["key"] for o in listed) == sorted(bodies)
    for o in listed:
        got = client.get_object(bucket, o["key"])
        assert got == bodies[o["key"]]
        assert o["etag"].strip('"') == hashlib.md5(got).hexdigest()


def _pg_exec(sql: str) -> None:
    """Seed via psql inside the compose container (the test host has
    no SQL driver by design — the engine's own transport is the
    REPLICATION protocol, not the extended-query protocol)."""
    res = subprocess.run(
        ["docker", "compose", "-f", "test/compose.yaml", "exec", "-T",
         "postgres", "psql", "-U", PG_USER, "-d", PG_DB, "-c", sql],
        capture_output=True, text=True, timeout=60,
    )
    if res.returncode != 0:
        pytest.skip(f"docker compose exec psql failed: {res.stderr[:200]}")


def test_real_postgres_walsender_live_tail():
    """The engine's protocol-v3 walsender client against real
    postgres: SCRAM/password startup, CREATE_REPLICATION_SLOT
    (wal2json, TEMPORARY so teardown is automatic), live INSERTs
    streamed as XLogData, Standby Status Update confirms. The same
    client `cdc.dsn` live tailing uses (sources/postgres_wal.py)."""
    _gate(PG)
    from conduit_spark.functions.minipg import ReplicationClient

    table = f"conduit_real_{uuid.uuid4().hex[:8]}"
    _pg_exec(f"CREATE TABLE {table} (id bigint primary key, v float8)")
    c = ReplicationClient(
        PG, slot=f"slot_{table}", user=PG_USER, password=PG_PASSWORD,
        dbname=PG_DB,
    )
    try:
        ident = c.identify_system()
        assert "xlogpos" in ident
        row = c.create_slot("wal2json", temporary=True)
        assert row["output_plugin"] == "wal2json"
        _pg_exec(f"INSERT INTO {table} SELECT g, g*1.5 FROM "
                 "generate_series(1, 20) g")
        frames = c.start_replication()
        seen = 0
        deadline = time.monotonic() + 30
        for lsn, payload in frames:
            if time.monotonic() > deadline:
                break
            if lsn is None:
                continue
            seen += payload.count(b'"I"') or payload.count(b'"insert"')
            c.confirm(lsn)
            if seen >= 20:
                break
        assert seen >= 20, f"only {seen} inserts streamed"
    finally:
        c.close()
        _pg_exec(f"DROP TABLE IF EXISTS {table}")
