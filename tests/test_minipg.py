"""Protocol-level verification of Postgres logical-replication tailing.

The sandbox has no postgres; ``functions.minipg.MiniPGServer`` stands
in at the WIRE level (protocol-v3 walsender: replication startup,
IDENTIFY_SYSTEM, START_REPLICATION, CopyBoth XLogData/keepalive,
Standby Status Updates with confirmed_flush slot semantics) — the
same strategy as minikafka/minis3. End-to-end: the engine's own
replication client tails the stream into rotating capture files, the
wal2json parser turns them into envelopes, cdc_apply materializes.
"""

from __future__ import annotations

import json
import time

import pytest

from conduit_spark.functions.minipg import (
    MiniPGServer,
    ReplicationClient,
    lsn_text,
)


_SEQ = [0]  # monotonically increasing LSN for fixture changes


def _next_data(gen):
    for lsn, payload in gen:
        if lsn is not None:
            return lsn, payload
    raise AssertionError("stream ended without data")


def _change(n: int, op: str = "I", **cols) -> str:
    _SEQ[0] += 1
    doc = {
        "action": op,
        "schema": "public",
        "table": "users",
        "lsn": lsn_text(_SEQ[0]),
        "columns": [
            {"name": "id", "type": "integer", "value": cols.get("id", n)},
            {"name": "name", "type": "text", "value": cols.get("name", f"u{n}")},
        ],
    }
    if op in ("U", "D"):
        doc["identity"] = [
            {"name": "id", "type": "integer", "value": cols.get("id", n)}
        ]
    return json.dumps(doc)


# -- wire protocol ---------------------------------------------------------


def test_identify_system_and_stream():
    with MiniPGServer(keepalive_s=0.05) as srv:
        srv.feed(_change(1))
        with ReplicationClient(srv.dsn) as c:
            ident = c.identify_system()
            assert ident["timeline"] == "1"
            assert "/" in ident["xlogpos"]
            lsn, payload = _next_data(c.start_replication(0))
            assert json.loads(payload)["table"] == "users"


def test_slot_confirm_and_resume_semantics():
    """Confirmed positions are the replication-slot contract: a client
    restarting at LSN 0 resumes from confirmed_flush, so confirmed
    changes are never re-delivered and unconfirmed ones are."""
    with MiniPGServer(keepalive_s=0.05) as srv:
        for i in range(3):
            srv.feed(_change(i, id=i))
        with ReplicationClient(srv.dsn) as c:
            seen = []
            for lsn, payload in c.start_replication(0):
                if lsn is None:
                    continue
                seen.append(json.loads(payload)["columns"][0]["value"])
                c.confirm(lsn + len(payload))
                if len(seen) == 2:  # confirm only the first two
                    break
        assert seen == [0, 1]
        deadline = time.time() + 5
        while srv.confirmed_flush_lsn == 0 and time.time() < deadline:
            time.sleep(0.05)
        # resume: the unconfirmed third change is re-delivered first
        with ReplicationClient(srv.dsn) as c2:
            lsn, payload = _next_data(c2.start_replication(0))
            assert json.loads(payload)["columns"][0]["value"] == 2


def test_plain_session_is_refused():
    import socket
    import struct

    with MiniPGServer() as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        body = struct.pack(">I", 196608) + b"user\x00u\x00database\x00d\x00\x00"
        s.sendall(struct.pack(">I", len(body) + 4) + body)
        tag = s.recv(1)
        assert tag == b"E"  # walsender only
        s.close()


# -- engine integration: native tail → capture files → Spark → apply -------


def test_native_tail_to_cdc_apply(spark, tmp_path):
    from conduit_spark.operators.cdc import cdc_apply
    from conduit_spark.sources.postgres_wal import LiveWalTail, wal2json_source

    with MiniPGServer(keepalive_s=0.05) as srv:
        for i in range(5):
            srv.feed(_change(i, id=i))
        srv.feed(_change(1, op="U", id=1, name="updated"))
        srv.feed(_change(3, op="D", id=3))
        tail = LiveWalTail(
            str(tmp_path / "cap"), max_lines=3, max_secs=0.2
        ).start_native(srv.dsn)
        deadline = time.time() + 10
        while tail._n_files < 2 and time.time() < deadline:
            time.sleep(0.1)
        n_files = tail.stop()
        assert n_files >= 2  # rotation happened

        env = wal2json_source(
            spark, str(tmp_path / "cap"), source_id="pg", key_cols=["id"]
        )
        rows = env.collect()
        assert len(rows) == 7
        ops = [r.operation for r in rows]
        assert ops.count("create") == 5
        assert ops.count("update") == 1 and ops.count("delete") == 1

        # materialize; the slot confirmed everything that reached files
        import pyspark.sql.functions as F

        from conduit_spark.sources.postgres_wal import lsn_to_long

        final = cdc_apply(
            env,
            F.get_json_object(
                F.coalesce(F.col("key_json"), F.col("payload_after_json")),
                "$.id",
            ).cast("bigint"),
            F.struct(
                lsn_to_long(F.col("metadata").getItem("postgres.lsn")),
                F.col("position").cast("string"),
            ),
        )
        got = {
            int(json.loads(r.payload_after_json)["id"]): json.loads(
                r.payload_after_json
            )["name"]
            for r in final.collect()
        }
        assert got == {0: "u0", 1: "updated", 2: "u2", 4: "u4"}
        deadline = time.time() + 5
        while srv.confirmed_flush_lsn < srv.current_lsn and time.time() < deadline:
            time.sleep(0.05)
        assert srv.confirmed_flush_lsn == srv.current_lsn


def test_native_tail_resume_no_duplicates(spark, tmp_path):
    """Stop the tail, feed more, restart from LSN 0: the slot's
    confirmed position means already-captured changes are not
    re-delivered into the second capture directory."""
    from conduit_spark.sources.postgres_wal import LiveWalTail, wal2json_source

    with MiniPGServer(keepalive_s=0.05) as srv:
        for i in range(4):
            srv.feed(_change(i, id=i))
        t1 = LiveWalTail(str(tmp_path / "c1"), max_lines=2, max_secs=0.1)
        t1.start_native(srv.dsn)
        deadline = time.time() + 10
        while srv.confirmed_flush_lsn < srv.current_lsn and time.time() < deadline:
            time.sleep(0.1)
        t1.stop()

        for i in range(4, 6):
            srv.feed(_change(i, id=i))
        t2 = LiveWalTail(str(tmp_path / "c2"), max_lines=1, max_secs=0.1)
        t2.start_native(srv.dsn)
        deadline = time.time() + 10
        while srv.confirmed_flush_lsn < srv.current_lsn and time.time() < deadline:
            time.sleep(0.1)
        t2.stop()

        first = wal2json_source(spark, str(tmp_path / "c1"), source_id="pg")
        second = wal2json_source(spark, str(tmp_path / "c2"), source_id="pg")
        ids1 = sorted(
            json.loads(r.payload_after_json)["id"] for r in first.collect()
        )
        ids2 = sorted(
            json.loads(r.payload_after_json)["id"] for r in second.collect()
        )
        assert ids1 == [0, 1, 2, 3]
        assert ids2 == [4, 5]  # nothing re-delivered


def test_registry_cdc_dsn_live_tail(spark, tmp_path):
    """builtin:postgres with cdc.dsn starts the native replication tail
    into cdc.path and the streaming/batch wal2json source reads it."""
    from conduit_spark.pipeline import registry

    with MiniPGServer(keepalive_s=0.05) as srv:
        for i in range(3):
            srv.feed(_change(i, id=i))
        cap = str(tmp_path / "cap")
        settings = {
            "cdc.format": "wal2json",
            "cdc.dsn": srv.dsn,
            "cdc.path": cap,
            "keyColumns": "id",
        }
        # first build starts the tail (batch file index snapshots the
        # dir at load, so wait for the flush then rebuild to read)
        registry.build_source(
            spark, "builtin:postgres", settings, "pgsrc", streaming=False
        )
        deadline = time.time() + 10
        while srv.confirmed_flush_lsn < srv.current_lsn and time.time() < deadline:
            time.sleep(0.1)
        env = registry.build_source(
            spark, "builtin:postgres", settings, "pgsrc", streaming=False
        )
        rows = env.collect()
        assert len(rows) == 3
        assert {r.operation for r in rows} == {"create"}
        key = (srv.dsn, "conduit_spark", cap)
        tail = registry._ACTIVE_WAL_TAILS.pop(key)
        tail.stop()


def test_ssl_probe_negotiated_down():
    """libpq sends an SSLRequest probe before the startup packet; the
    server answers 'N' and proceeds in cleartext (what pg_recvlogical
    does against sslmode=prefer servers without TLS)."""
    import socket
    import struct

    with MiniPGServer() as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(struct.pack(">II", 8, 80877103))  # SSLRequest
        assert s.recv(1) == b"N"
        body = (
            struct.pack(">I", 196608)
            + b"user\x00u\x00database\x00d\x00replication\x00database\x00\x00"
        )
        s.sendall(struct.pack(">I", len(body) + 4) + body)
        assert s.recv(1) == b"R"  # AuthenticationOk follows
        s.close()


# -- SCRAM-SHA-256 authentication (protocol-v3 SASL flow) ----------------


def test_walsender_scram_authenticated_stream():
    """Server requires SCRAM: the client authenticates via the
    protocol-v3 AuthenticationSASL(10)/Continue(11)/Final(12) flow
    (empty SASL username, startup user authoritative — libpq
    semantics), streams XLogData, and the server signature verifies
    client-side."""
    with MiniPGServer(users={"conduit": "replica-pw"}) as srv:
        lsn1 = srv.feed('{"action":"I","lsn":"x"}')
        with ReplicationClient(srv.dsn, password="replica-pw") as c:
            info = c.identify_system()
            assert "xlogpos" in {k.lower() for k in info}
            frames = c.start_replication(0)
            got_lsn, payload = next(frames)
            assert got_lsn == lsn1
            assert b'"action":"I"' in payload
            c.confirm(lsn1)


def test_walsender_scram_rejects():
    with MiniPGServer(users={"conduit": "replica-pw"}) as srv:
        srv.feed("{}")
        # wrong password
        with pytest.raises((ConnectionError, ValueError)):
            ReplicationClient(srv.dsn, password="nope")
        # unknown startup user
        with pytest.raises((ConnectionError, ValueError)):
            ReplicationClient(srv.dsn, user="ghost", password="replica-pw")
        # no password at all
        with pytest.raises(ConnectionError, match="SCRAM|password"):
            ReplicationClient(srv.dsn)


def test_walsender_open_server_unchanged():
    with MiniPGServer() as srv:
        srv.feed("{}")
        with ReplicationClient(srv.dsn) as c:
            assert c.identify_system()


def test_create_and_drop_replication_slot():
    """CREATE_REPLICATION_SLOT / DROP_REPLICATION_SLOT over the
    replication protocol (the pg_recvlogical --create-slot exchange):
    result row carries (slot_name, consistent_point, plugin), a
    duplicate create errors (42710, like a real walsender), drop makes
    the name reusable."""
    with MiniPGServer(keepalive_s=0.05) as srv:
        c = ReplicationClient(srv.dsn, slot="slot_a")
        row = c.create_slot("wal2json")
        assert row["slot_name"] == "slot_a"
        assert row["output_plugin"] == "wal2json"
        assert "/" in row["consistent_point"]
        assert row["snapshot_name"] is None
        with pytest.raises(ConnectionError, match="already exists"):
            c.create_slot("wal2json")
        c.drop_slot()
        assert c.create_slot("pgoutput")["output_plugin"] == "pgoutput"
        c.close()


def test_create_slot_trailing_options_parse_plugin():
    """pg_recvlogical's grammar allows options after the plugin
    (``... LOGICAL pgoutput (SNAPSHOT 'export')``); the server must
    record the token after LOGICAL as the plugin, not the last token
    (ADVICE r10: parts[-1] would have answered "'export')")."""
    from conduit_spark.functions.minipg import _cstr, _msg

    with MiniPGServer(keepalive_s=0.05) as srv:
        c = ReplicationClient(srv.dsn, slot="slot_opt")
        q = ("CREATE_REPLICATION_SLOT slot_opt TEMPORARY LOGICAL "
             "pgoutput (SNAPSHOT 'export')")
        c._sock.sendall(_msg(b"Q", _cstr(q)))
        row = c._simple_result()
        assert row["output_plugin"] == "pgoutput"
        assert row["slot_name"] == "slot_opt"
        c.close()


def test_create_slot_named_logical():
    """A slot literally named "logical" must not shadow the LOGICAL
    keyword: the plugin search starts at token index 2 (review r11 —
    the first trailing-options fix regressed this input vs the old
    parts[-1] parse)."""
    from conduit_spark.functions.minipg import _cstr, _msg

    with MiniPGServer(keepalive_s=0.05) as srv:
        c = ReplicationClient(srv.dsn, slot="logical")
        c._sock.sendall(_msg(
            b"Q", _cstr("CREATE_REPLICATION_SLOT logical LOGICAL pgoutput")))
        row = c._simple_result()
        assert row["slot_name"] == "logical"
        assert row["output_plugin"] == "pgoutput"
        c.close()
