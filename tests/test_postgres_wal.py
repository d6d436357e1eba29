"""Postgres logical-replication CDC source tests (wal2json + pgoutput).

The reference's builtin:postgres source tails a replication slot
(pkg/plugin/connector/builtin/registry.go:42-49); here the two public
wire formats are replayed from capture files and must materialize —
via cdc_apply — to exactly the table state the equivalent SQL history
produces.
"""

from __future__ import annotations

import json
import struct

import pyspark.sql.functions as F
import pytest

from conduit_spark.operators.cdc import cdc_apply
from conduit_spark.sources.postgres_wal import (
    lsn_to_long,
    parse_pgoutput,
    pgoutput_source,
    wal2json_source,
)

# --- wal2json fixtures ----------------------------------------------------
# History on table public.accounts (pk id):
#   insert 1 'alice' 10.5 | insert 2 'bob' 20.0 | update 1 balance 99.9
#   insert 3 'carol' 7.25 | delete 2
# Final state: {1: ('alice', 99.9), 3: ('carol', 7.25)}

W2J_V2_LINES = [
    '{"action":"B"}',
    '{"action":"I","schema":"public","table":"accounts","lsn":"0/1000001","columns":[{"name":"id","type":"integer","value":1},{"name":"name","type":"text","value":"alice"},{"name":"balance","type":"numeric","value":10.5}]}',
    '{"action":"I","schema":"public","table":"accounts","lsn":"0/1000002","columns":[{"name":"id","type":"integer","value":2},{"name":"name","type":"text","value":"bob"},{"name":"balance","type":"numeric","value":20.0}]}',
    '{"action":"C"}',
    '{"action":"B"}',
    '{"action":"U","schema":"public","table":"accounts","lsn":"0/1000003","columns":[{"name":"id","type":"integer","value":1},{"name":"name","type":"text","value":"alice"},{"name":"balance","type":"numeric","value":99.9}],"identity":[{"name":"id","type":"integer","value":1}]}',
    '{"action":"I","schema":"public","table":"accounts","lsn":"0/1000004","columns":[{"name":"id","type":"integer","value":3},{"name":"name","type":"text","value":"carol"},{"name":"balance","type":"numeric","value":7.25}]}',
    '{"action":"D","schema":"public","table":"accounts","lsn":"0/1000005","identity":[{"name":"id","type":"integer","value":2}]}',
    '{"action":"C"}',
]

W2J_V1_DOCS = [
    json.dumps(
        {
            "xid": 700,
            "nextlsn": "0/1000002",
            "change": [
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "accounts",
                    "columnnames": ["id", "name", "balance"],
                    "columntypes": ["integer", "text", "numeric"],
                    "columnvalues": [1, "alice", 10.5],
                },
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "accounts",
                    "columnnames": ["id", "name", "balance"],
                    "columntypes": ["integer", "text", "numeric"],
                    "columnvalues": [2, "bob", 20.0],
                },
            ],
        }
    ),
    json.dumps(
        {
            "xid": 701,
            "nextlsn": "0/1000005",
            "change": [
                {
                    "kind": "update",
                    "schema": "public",
                    "table": "accounts",
                    "columnnames": ["id", "name", "balance"],
                    "columntypes": ["integer", "text", "numeric"],
                    "columnvalues": [1, "alice", 99.9],
                    "oldkeys": {
                        "keynames": ["id"],
                        "keytypes": ["integer"],
                        "keyvalues": [1],
                    },
                },
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "accounts",
                    "columnnames": ["id", "name", "balance"],
                    "columntypes": ["integer", "text", "numeric"],
                    "columnvalues": [3, "carol", 7.25],
                },
                {
                    "kind": "delete",
                    "schema": "public",
                    "table": "accounts",
                    "oldkeys": {
                        "keynames": ["id"],
                        "keytypes": ["integer"],
                        "keyvalues": [2],
                    },
                },
            ],
        }
    ),
]

FINAL_STATE = {1: ("alice", 99.9), 3: ("carol", 7.25)}


def _materialize(envelopes):
    """unwrap the payload and apply the changelog — the same route a
    destination takes (cdc_apply keyed on the pk, ordered by LSN+pos)."""
    final = cdc_apply(
        envelopes,
        F.get_json_object(
            F.coalesce(F.col("key_json"), F.col("payload_after_json")),
            "$.id",
        ).cast("bigint"),
        F.struct(
            lsn_to_long(F.col("metadata").getItem("postgres.lsn")),
            F.col("position").cast("string"),
        ),
    )
    rows = final.select(
        F.get_json_object("payload_after_json", "$.id").cast("bigint").alias("id"),
        F.get_json_object("payload_after_json", "$.name").alias("name"),
        F.get_json_object("payload_after_json", "$.balance")
        .cast("double")
        .alias("balance"),
    ).collect()
    return {r["id"]: (r["name"], r["balance"]) for r in rows}


def test_wal2json_v2_end_to_end(spark, tmp_path):
    log = tmp_path / "wal.jsonl"
    log.write_text("\n".join(W2J_V2_LINES) + "\n")
    env = wal2json_source(spark, str(log), key_cols=["id"])
    rows = env.collect()
    # B/C framing rows are dropped; 5 data actions remain
    assert len(rows) == 5
    by_op = {}
    for r in rows:
        by_op.setdefault(r["operation"], []).append(r)
    assert len(by_op["create"]) == 3
    assert len(by_op["update"]) == 1
    assert len(by_op["delete"]) == 1 and "snapshot" not in by_op
    # delete carries the identity as key and no after-payload
    d = by_op["delete"][0]
    assert json.loads(d["key_json"]) == {"id": 2}
    assert d["payload_after_json"] is None
    # update keeps before-image from the identity block
    u = by_op["update"][0]
    assert json.loads(u["payload_before_json"]) == {"id": 1}
    assert json.loads(u["payload_after_json"])["balance"] == 99.9
    assert u["metadata"]["opencdc.collection"] == "public.accounts"
    # typed JSON values survive the variant round-trip (number stays number)
    c0 = json.loads(by_op["create"][0]["payload_after_json"])
    assert isinstance(c0["id"], int) and isinstance(c0["balance"], float)

    assert _materialize(env) == FINAL_STATE


def test_wal2json_v1_end_to_end(spark, tmp_path):
    log = tmp_path / "wal_v1.jsonl"
    log.write_text("\n".join(W2J_V1_DOCS) + "\n")
    env = wal2json_source(spark, str(log), format_version=1, key_cols=["id"])
    rows = env.collect()
    assert len(rows) == 5
    # intra-transaction order is preserved in the position tiebreaker
    positions = sorted(bytes(r["position"]).decode() for r in rows)
    assert len(set(positions)) == 5
    assert _materialize(env) == FINAL_STATE


def test_wal2json_streaming_tail(spark, tmp_path):
    """The same feed consumed as a stream (readStream.text tail) —
    micro-batch CDC without a broker."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "w0.jsonl").write_text("\n".join(W2J_V2_LINES) + "\n")
    env = wal2json_source(spark, str(feed), streaming=True, key_cols=["id"])
    assert env.isStreaming
    out = []
    q = (
        env.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(out) == 5


# --- pgoutput -------------------------------------------------------------


def _msg(payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + payload


def _tuple(vals) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        else:
            b = str(v).encode()
            out += b"t" + struct.pack(">I", len(b)) + b
    return out


def _relation(oid, ns, name, cols, key_flags) -> bytes:
    body = b"R" + struct.pack(">I", oid) + ns.encode() + b"\x00"
    body += name.encode() + b"\x00" + b"d" + struct.pack(">H", len(cols))
    for cname, is_key in zip(cols, key_flags):
        body += struct.pack(">B", 1 if is_key else 0)
        body += cname.encode() + b"\x00" + struct.pack(">II", 23, 0xFFFFFFFF)
    return body


def _pgoutput_capture() -> bytes:
    """The same accounts history as the wal2json fixtures, in framed
    binary pgoutput messages."""
    rel = 16384
    cols = ["id", "name", "balance"]
    stream = b""
    # tx 1: two inserts
    stream += _msg(b"B" + struct.pack(">QQI", 0x1000002, 0, 700))
    stream += _msg(_relation(rel, "public", "accounts", cols, [True, False, False]))
    stream += _msg(b"I" + struct.pack(">I", rel) + b"N" + _tuple([1, "alice", 10.5]))
    stream += _msg(b"I" + struct.pack(">I", rel) + b"N" + _tuple([2, "bob", 20.0]))
    stream += _msg(b"C" + b"\x00" + struct.pack(">QQQ", 0x1000002, 0x1000002, 0))
    # tx 2: update (with K old key), insert, delete
    stream += _msg(b"B" + struct.pack(">QQI", 0x1000005, 0, 701))
    stream += _msg(
        b"U"
        + struct.pack(">I", rel)
        + b"K"
        + _tuple([1, None, None])
        + b"N"
        + _tuple([1, "alice", 99.9])
    )
    stream += _msg(b"I" + struct.pack(">I", rel) + b"N" + _tuple([3, "carol", 7.25]))
    stream += _msg(b"D" + struct.pack(">I", rel) + b"K" + _tuple([2, None, None]))
    stream += _msg(b"C" + b"\x00" + struct.pack(">QQQ", 0x1000005, 0x1000005, 0))
    return stream


def test_parse_pgoutput_pure():
    changes = parse_pgoutput(_pgoutput_capture())
    assert [c["op"] for c in changes] == [
        "create",
        "create",
        "update",
        "create",
        "delete",
    ]
    assert changes[0]["cols"] == ["id", "name", "balance"]
    assert changes[0]["keys"] == ["id"]
    assert changes[2]["before"] == ["1", None, None]
    assert changes[2]["after"] == ["1", "alice", "99.9"]
    assert changes[4]["before"] == ["2", None, None]
    # tx lsn ordering is monotonic across transactions
    assert changes[0]["lsn"] < changes[2]["lsn"]


def test_pgoutput_source_end_to_end(spark, tmp_path):
    cap = tmp_path / "capture" / "seg0.pgo"
    cap.parent.mkdir()
    cap.write_bytes(_pgoutput_capture())
    env = pgoutput_source(spark, str(tmp_path / "capture"))
    rows = env.collect()
    assert len(rows) == 5
    d = next(r for r in rows if r["operation"] == "delete")
    assert json.loads(d["key_json"]) == {"id": "2"}  # pgoutput is text-mode
    final = cdc_apply(
        env,
        F.get_json_object(
            F.coalesce(F.col("key_json"), F.col("payload_after_json")), "$.id"
        ).cast("bigint"),
        F.struct(
            F.col("metadata").getItem("postgres.lsn").cast("bigint"),
            F.col("metadata").getItem("postgres.seq").cast("bigint"),
        ),
    )
    state = {
        int(json.loads(r["payload_after_json"])["id"]): (
            json.loads(r["payload_after_json"])["name"],
            float(json.loads(r["payload_after_json"])["balance"]),
        )
        for r in final.collect()
    }
    assert state == FINAL_STATE


def test_registry_routes_cdc_formats(spark, tmp_path):
    from conduit_spark.pipeline.registry import build_source

    log = tmp_path / "wal.jsonl"
    log.write_text("\n".join(W2J_V2_LINES) + "\n")
    env = build_source(
        spark,
        "builtin:postgres",
        {"cdc.format": "wal2json", "cdc.path": str(log), "keyColumns": "id"},
        "pg-cdc",
    )
    assert env.count() == 5
    meta = env.limit(1).collect()[0]["metadata"]
    assert meta["conduit.source.connector.id"] == "pg-cdc"

    cap = tmp_path / "cap" / "seg0.pgo"
    cap.parent.mkdir()
    cap.write_bytes(_pgoutput_capture())
    env2 = build_source(
        spark,
        "builtin:postgres",
        {"cdc.format": "pgoutput", "cdc.path": str(cap.parent)},
        "pg-cdc2",
    )
    assert env2.count() == 5

    with pytest.raises(ValueError, match="wal2json or pgoutput"):
        build_source(
            spark, "builtin:postgres", {"cdc.format": "nope", "cdc.path": "x"}, "s"
        )


def test_snapshot_handoff_consistent_cutover(spark, tmp_path):
    """Snapshot at LSN X + WAL tail with changes > X only: the
    materialized result equals a full from-empty replay, for EVERY
    cutover point in the changelog — the reference postgres source's
    snapshot→CDC handoff invariant (slot LSN == snapshot's consistent
    point)."""
    from conduit_spark.sources.postgres_wal import snapshot_handoff_source

    log = tmp_path / "wal.jsonl"
    log.write_text("\n".join(W2J_V2_LINES) + "\n")

    # replay-from-empty oracle: table state after each change
    changes = [  # (lsn, apply_fn over dict state)
        ("0/1000001", lambda s: s.__setitem__(1, ("alice", 10.5))),
        ("0/1000002", lambda s: s.__setitem__(2, ("bob", 20.0))),
        ("0/1000003", lambda s: s.__setitem__(1, ("alice", 99.9))),
        ("0/1000004", lambda s: s.__setitem__(3, ("carol", 7.25))),
        ("0/1000005", lambda s: s.pop(2)),
    ]
    state: dict = {}
    for idx, (snap_lsn, apply_fn) in enumerate(changes):
        apply_fn(state)  # state as of snap_lsn (change applied)
        snapshot_df = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in sorted(state.items())],
            "id long, name string, balance double",
        )
        env = snapshot_handoff_source(
            spark,
            snapshot_df,
            str(log),
            snapshot_lsn=snap_lsn,
            key_cols=["id"],
            collection="public.accounts",
        )
        # strictly-after filter: only the remaining changes ride the tail
        tail_ops = env.filter(F.col("operation") != "snapshot").count()
        assert tail_ops == len(changes) - idx - 1
        assert _materialize(env) == FINAL_STATE, f"cutover at {snap_lsn}"

    # degenerate cutovers: before everything (= pure replay) and
    # after everything (= pure snapshot)
    empty = spark.createDataFrame([], "id long, name string, balance double")
    env = snapshot_handoff_source(
        spark, empty, str(log), snapshot_lsn="0/1000000", key_cols=["id"]
    )
    assert _materialize(env) == FINAL_STATE
    full = spark.createDataFrame(
        [(1, "alice", 99.9), (3, "carol", 7.25)],
        "id long, name string, balance double",
    )
    env = snapshot_handoff_source(
        spark, full, str(log), snapshot_lsn="0/2000000", key_cols=["id"]
    )
    assert env.filter(F.col("operation") != "snapshot").count() == 0
    assert _materialize(env) == FINAL_STATE


def test_wal2json_schema_evolution_mid_stream(spark, tmp_path):
    """A column added (or dropped) mid-stream must flow through: each
    change's payload JSON carries exactly the columns wal2json saw for
    that row — no fixed schema to violate, the downstream decides how
    to widen (the payload is schemaless JSON text by design)."""
    lines = [
        '{"action":"I","schema":"public","table":"t","lsn":"0/1","columns":[{"name":"id","type":"integer","value":1},{"name":"name","type":"text","value":"a"}]}',
        # ALTER TABLE ADD COLUMN tier: later rows carry the new column
        '{"action":"I","schema":"public","table":"t","lsn":"0/2","columns":[{"name":"id","type":"integer","value":2},{"name":"name","type":"text","value":"b"},{"name":"tier","type":"text","value":"gold"}]}',
        # and an update back-fills it on an old row
        '{"action":"U","schema":"public","table":"t","lsn":"0/3","columns":[{"name":"id","type":"integer","value":1},{"name":"name","type":"text","value":"a"},{"name":"tier","type":"text","value":"silver"}],"identity":[{"name":"id","type":"integer","value":1}]}',
    ]
    log = tmp_path / "wal.jsonl"
    log.write_text("\n".join(lines) + "\n")
    env = wal2json_source(spark, str(log), key_cols=["id"])
    payloads = {
        json.loads(r["key_json"])["id"]: json.loads(r["payload_after_json"])
        for r in env.filter(F.col("operation") == "create").collect()
    }
    assert "tier" not in payloads[1] and payloads[2]["tier"] == "gold"
    final = _materialize(env)
    assert set(final) == {1, 2}
    # the update's widened payload won for id=1
    upd = {
        json.loads(r["key_json"])["id"]: json.loads(r["payload_after_json"])
        for r in env.filter(F.col("operation") == "update").collect()
    }
    assert upd[1]["tier"] == "silver"


def test_live_wal_tail_end_to_end(spark, tmp_path):
    """LiveWalTail: a (fake) pg_recvlogical subprocess streams wal2json
    lines; the pump rotates them into immutable capture files; the
    streaming source materializes the change stream to the oracle
    state. Covers the rotation invariant Spark's file source needs —
    appended-to files would never re-deliver."""
    import os
    import stat
    import sys as _sys
    import time

    from conduit_spark.sources.postgres_wal import LiveWalTail

    # fake client: emits the standard changelog slowly, like a slot tail
    fake = tmp_path / "fake_pg_recvlogical.py"
    lines_py = repr(W2J_V2_LINES)
    fake.write_text(
        f"""#!{_sys.executable}
import sys, time
for line in {lines_py}:
    print(line); sys.stdout.flush()
    time.sleep(0.05)
time.sleep(60)  # a real tail never exits on its own
"""
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    capture = tmp_path / "capture"
    tail = LiveWalTail(
        str(capture), command=[str(fake)], max_lines=3, max_secs=0.2
    ).start()
    try:
        # wait until the pump has written every data line
        deadline = time.time() + 30
        while time.time() < deadline:
            total = sum(
                1
                for f in os.listdir(capture)
                if not f.startswith(".")
                for _ in open(capture / f)
            )
            if total >= len(W2J_V2_LINES):
                break
            time.sleep(0.1)
        env = tail.stream(spark, key_cols=["id"])
        assert env.isStreaming
        out = str(tmp_path / "sink")
        q = (
            env.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        n_files = tail.stop()
    assert n_files >= 2  # rotation actually happened
    # no half-written staging files left behind
    assert not [f for f in os.listdir(capture) if f.startswith(".wal-")]
    batch = spark.read.parquet(out)
    assert _materialize(batch) == FINAL_STATE


def test_parse_pgoutput_schema_evolution_mid_stream():
    """DBZ-2 invariant 6 on the BINARY path (the wal2json sibling is
    test_wal2json_schema_evolution_mid_stream): a Relation message
    re-sent mid-stream after ALTER TABLE ADD COLUMN must rebind the
    oid — later rows carry the new column, earlier decodes keep the
    old shape, and nothing is silently mangled or truncated."""
    rel = 16400
    stream = b""
    stream += _msg(b"B" + struct.pack(">QQI", 0x10, 0, 800))
    stream += _msg(_relation(rel, "public", "t", ["id", "name"], [True, False]))
    stream += _msg(b"I" + struct.pack(">I", rel) + b"N" + _tuple([1, "a"]))
    # ALTER TABLE ADD COLUMN tier: the server re-sends Relation
    stream += _msg(b"B" + struct.pack(">QQI", 0x20, 0, 801))
    stream += _msg(
        _relation(rel, "public", "t", ["id", "name", "tier"],
                  [True, False, False])
    )
    stream += _msg(
        b"I" + struct.pack(">I", rel) + b"N" + _tuple([2, "b", "gold"])
    )
    # and an update back-fills the new column on an old row
    stream += _msg(
        b"U" + struct.pack(">I", rel)
        + b"K" + _tuple([1, None, None])
        + b"N" + _tuple([1, "a", "silver"])
    )
    changes = parse_pgoutput(stream)
    assert [c["op"] for c in changes] == ["create", "create", "update"]
    assert changes[0]["cols"] == ["id", "name"]
    assert changes[0]["after"] == ["1", "a"]
    assert changes[1]["cols"] == ["id", "name", "tier"]
    assert changes[1]["after"] == ["2", "b", "gold"]
    assert changes[2]["after"] == ["1", "a", "silver"]
    assert changes[2]["keys"] == ["id"]


def test_incremental_resnapshot_heals_lost_capture(spark, tmp_path):
    """The Debezium incremental-snapshot capability, Spark-first
    (emit_resnapshot_capture): a capture file is LOST (retention /
    recycled WAL), so materialization shows a gap; injecting an
    ad-hoc consistent snapshot stamped at its read LSN into the SAME
    capture stream heals the state without stopping the tail or
    replaying history — cdc_apply's (key, LSN) last-write-wins
    reconciles snapshot vs in-flight changes with no watermark
    protocol. Later changes keep winning over the snapshot."""
    from conduit_spark.sources.postgres_wal import (
        emit_resnapshot_capture,
        wal2json_source,
    )

    cap = tmp_path / "cap"
    cap.mkdir()
    # two capture files, as a rotating tail would write them; dave
    # (id 4) exists ONLY in the first file — no later change carries
    # his row, so losing that file is a REAL gap, not one the
    # full-row update envelopes would paper over
    dave = (
        '{"action":"I","schema":"public","table":"accounts",'
        '"lsn":"0/1000000","columns":[{"name":"id","type":"integer",'
        '"value":4},{"name":"name","type":"text","value":"dave"},'
        '{"name":"balance","type":"numeric","value":5.0}]}'
    )
    (cap / "wal-000001.jsonl").write_text(
        dave + "\n" + "\n".join(W2J_V2_LINES[:4]) + "\n"
    )
    (cap / "wal-000002.jsonl").write_text("\n".join(W2J_V2_LINES[4:]) + "\n")
    true_state = {**FINAL_STATE, 4: ("dave", 5.0)}

    # the true state after the full changelog
    assert _materialize(wal2json_source(spark, str(cap), key_cols=["id"])) == (
        true_state
    )

    # retention loss: the first file (inserts of ids 1 and 2) vanishes
    (cap / "wal-000001.jsonl").unlink()
    broken = _materialize(wal2json_source(spark, str(cap), key_cols=["id"]))
    assert 4 not in broken  # dave is GONE — the structural gap

    # ad-hoc re-snapshot: the table as of 0/1000005 (the true state),
    # stamped at that LSN, injected into the live capture dir
    snap = spark.createDataFrame(
        [(1, "alice", 99.9), (3, "carol", 7.25), (4, "dave", 5.0)],
        "id long, name string, balance double",
    )
    n_files = emit_resnapshot_capture(
        snap, str(cap), snapshot_lsn="0/1000005",
        schema_name="public", table="accounts",
    )
    assert n_files >= 1
    healed = _materialize(wal2json_source(spark, str(cap), key_cols=["id"]))
    assert healed == true_state

    # changes AFTER the snapshot point keep winning over it
    (cap / "wal-000003.jsonl").write_text(
        '{"action":"U","schema":"public","table":"accounts",'
        '"lsn":"0/1000006","columns":[{"name":"id","type":"integer",'
        '"value":3},{"name":"name","type":"text","value":"carol"},'
        '{"name":"balance","type":"numeric","value":1.0}],'
        '"identity":[{"name":"id","type":"integer","value":3}]}\n'
    )
    after = _materialize(wal2json_source(spark, str(cap), key_cols=["id"]))
    assert after == {**true_state, 3: ("carol", 1.0)}


def test_cli_resnapshot_verb(spark, tmp_path, capsys):
    """`python -m conduit_spark resnapshot` — the operator UX wrapper
    over emit_resnapshot_capture (--json-shaped output, stable exit
    code), per the reference CDC roadmap's acceptance criterion."""
    from conduit_spark import cli
    from conduit_spark.sources.postgres_wal import wal2json_source

    cap = tmp_path / "cap"
    cap.mkdir()
    snap_path = str(tmp_path / "snap.parquet")
    spark.createDataFrame(
        [(1, "alice", 99.9), (3, "carol", 7.25)],
        "id long, name string, balance double",
    ).write.parquet(snap_path)

    rc = cli.main([
        "resnapshot", snap_path, "--capture-dir", str(cap),
        "--lsn", "0/1000005", "--schema", "public", "--table", "accounts",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2 and out["files"] >= 1

    assert _materialize(
        wal2json_source(spark, str(cap), key_cols=["id"])
    ) == FINAL_STATE
