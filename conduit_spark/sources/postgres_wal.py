"""Postgres logical-replication CDC source: wal2json + pgoutput.

The reference's ``builtin:postgres`` source tails a logical replication
slot (pkg/plugin/connector/builtin/registry.go:42-49; the connector
supports both the wal2json and pgoutput output plugins). A Spark driver
cannot hold a replication-protocol socket per partition, so this module
consumes the two public *formats* from a file/subprocess feed — the
capture side (pg_recvlogical, a Debezium dump, or a replication proxy)
appends to a path; Spark parses at scale:

- **wal2json** (v2 line-per-action and v1 transaction-document JSON):
  parsed entirely JVM-side — ``spark.read.text`` →
  ``from_json`` with a VARIANT-typed ``value`` field, so column values
  of any JSON type re-serialize losslessly into the envelope payload
  without a Python round-trip. Streaming works via ``readStream.text``
  on the feed directory (micro-batch tailing).

- **pgoutput** (PostgreSQL's binary logical replication protocol):
  length-framed message captures parsed by a pure-Python decoder
  inside ``mapInPandas`` — sequential per file (Relation messages
  precede the data messages that reference them), parallel across
  files, which matches how captures shard in practice (one file per
  slot/segment).

Both produce standard OpenCDC envelopes (conduit_spark.envelope) and
compose with ``operators.cdc.cdc_apply`` for materialization, exactly
like the unwrap.debezium route.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from conduit_spark.envelope import META_COLLECTION, META_SOURCE_ID

# wal2json v2: one JSON document per line, actions B/C/I/U/D/T/M
_WAL2JSON_V2_SCHEMA = (
    "struct<action:string,`schema`:string,`table`:string,lsn:string,"
    "columns:array<struct<name:string,type:string,value:variant>>,"
    "identity:array<struct<name:string,type:string,value:variant>>,"
    "pk:array<struct<name:string,type:string>>>"
)

# wal2json v1: one JSON document per *transaction*, changes nested
_WAL2JSON_V1_SCHEMA = (
    "struct<xid:bigint,nextlsn:string,timestamp:string,"
    "change:array<struct<kind:string,`schema`:string,`table`:string,"
    "columnnames:array<string>,columntypes:array<string>,"
    "columnvalues:array<variant>,"
    "oldkeys:struct<keynames:array<string>,keytypes:array<string>,"
    "keyvalues:array<variant>>>>>"
)

_OP_BY_ACTION = {"I": "create", "U": "update", "D": "delete"}
_OP_BY_KIND = {"insert": "create", "update": "update", "delete": "delete"}


def lsn_to_long(lsn: str | Column) -> Column:
    """Postgres LSN text (``hi/lo`` in hex) → orderable bigint
    ``(hi << 32) | lo`` — the standard pg_lsn comparison, usable as
    the ``order`` argument of ``cdc_apply``."""
    c = F.col(lsn) if isinstance(lsn, str) else lsn
    hi = F.conv(F.split_part(c, F.lit("/"), F.lit(1)), 16, 10).cast("bigint")
    lo = F.conv(F.split_part(c, F.lit("/"), F.lit(2)), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32) + lo


def _json_object(cols: Column) -> Column:
    """array<struct<name,value:variant>> → JSON object text. to_json on
    VARIANT re-emits the original JSON value (string/number/bool/null/
    nested), so the payload is byte-faithful to what wal2json saw.
    Column names are JSON-escaped with two regexp passes (backslash,
    quote) — ONE pass over the name per element, instead of the earlier
    double to_json(struct(...)) serialization (HOF lambdas re-evaluate
    every captured expression per element)."""

    def quoted(name: Column) -> Column:
        escaped = F.regexp_replace(
            F.regexp_replace(name, r"\\", r"\\\\"), '"', r'\\"'
        )
        return F.concat(F.lit('"'), escaped, F.lit('":'))

    return F.concat(
        F.lit("{"),
        F.concat_ws(
            ",",
            F.transform(
                cols,
                lambda c: F.concat(quoted(c["name"]), F.to_json(c["value"])),
            ),
        ),
        F.lit("}"),
    )


def _envelope_from_parts(
    *,
    op: Column,
    collection: Column,
    lsn: Column,
    after_cols: Column,
    before_cols: Column,
    key_cols_expr: Column,
    source_id: str,
    position: Column | None = None,
) -> list[Column]:
    meta = F.create_map(
        F.lit(META_COLLECTION), collection,
        F.lit(META_SOURCE_ID), F.lit(source_id),
        F.lit("postgres.lsn"), F.coalesce(lsn, F.lit("")),
    )
    after = F.when(op != "delete", _json_object(after_cols))
    before = F.when(
        op.isin("update", "delete") & before_cols.isNotNull(),
        _json_object(before_cols),
    )
    key = F.when(key_cols_expr.isNotNull(), _json_object(key_cols_expr))
    if position is None:
        position = lsn
    return [
        F.coalesce(position, F.lit("")).cast("binary").alias("position"),
        op.alias("operation"),
        meta.alias("metadata"),
        F.lit(None).cast("binary").alias("key_raw"),
        key.alias("key_json"),
        before.alias("payload_before_json"),
        after.alias("payload_after_json"),
        F.lit(None).cast("binary").alias("payload_after_raw"),
        F.lit(True).alias("is_structured"),
    ]


def wal2json_source(
    spark: SparkSession,
    path: str,
    *,
    source_id: str = "postgres",
    streaming: bool = False,
    format_version: int = 2,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Parse a wal2json capture (the output of ``pg_recvlogical
    --plugin=wal2json``) into OpenCDC envelopes.

    ``key_cols`` names the replica-identity columns; the key is taken
    from the row payload for inserts/updates and from the identity
    (old-keys) block for deletes. Without it, the key falls back to
    the identity block alone (null for inserts — snapshot-free feeds
    should pass key_cols)."""
    reader = spark.readStream if streaming else spark.read
    lines = reader.text(path).filter(F.length(F.trim("value")) > 0)
    if format_version == 2:
        j = lines.select(
            F.from_json("value", _WAL2JSON_V2_SCHEMA).alias("j")
        ).select("j.*")
        rows = j.filter(F.col("action").isin(*_OP_BY_ACTION))
        op = _map_expr(F.col("action"), _OP_BY_ACTION)
        after = F.col("columns")
        before = F.col("identity")
    elif format_version == 1:
        j = lines.select(
            F.from_json("value", _WAL2JSON_V1_SCHEMA).alias("j")
        ).select(
            F.col("j.nextlsn").alias("__lsn"),
            F.posexplode(F.col("j.change")).alias("__seq", "ch"),
        )
        rows = j.select(
            "__lsn",
            "__seq",
            F.col("ch.kind").alias("kind"),
            F.col("ch.schema").alias("schema"),
            F.col("ch.table").alias("table"),
            F.arrays_zip(
                F.col("ch.columnnames").alias("name"),
                F.col("ch.columnvalues").alias("value"),
            ).alias("columns"),
            F.when(
                F.col("ch.oldkeys").isNotNull(),
                F.arrays_zip(
                    F.col("ch.oldkeys.keynames").alias("name"),
                    F.col("ch.oldkeys.keyvalues").alias("value"),
                ),
            ).alias("identity"),
        ).filter(F.col("kind").isin(*_OP_BY_KIND))
        op = _map_expr(F.col("kind"), _OP_BY_KIND)
        after = F.col("columns")
        before = F.col("identity")
    else:
        raise ValueError(f"wal2json format_version must be 1 or 2, got {format_version}")

    lsn = F.col("lsn") if format_version == 2 else F.col("__lsn")
    if key_cols:
        key_src = F.when(op != "delete", after).otherwise(before)
        key_expr = F.filter(key_src, lambda c: c["name"].isin(*key_cols))
    else:
        key_expr = before
    # v1's lsn is per-transaction — the intra-tx sequence keeps
    # positions unique and cdc_apply ordering total
    position = (
        lsn
        if format_version == 2
        else F.concat_ws(":", lsn, F.col("__seq").cast("string"))
    )
    return rows.select(
        *_envelope_from_parts(
            op=op,
            collection=F.concat_ws(".", F.col("schema"), F.col("table")),
            lsn=lsn,
            after_cols=after,
            before_cols=before,
            key_cols_expr=key_expr,
            source_id=source_id,
            position=position,
        )
    )


def _map_expr(col: Column, mapping: dict[str, str]) -> Column:
    expr = F.lit(None).cast("string")
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# pgoutput — PostgreSQL binary logical replication protocol
# ---------------------------------------------------------------------------


def parse_pgoutput(data: bytes) -> list[dict]:
    """Decode a length-framed pgoutput capture (4-byte big-endian
    length + message, repeated — the natural dump format for XLogData
    payloads) into change dicts.

    Messages handled per the public protocol docs (PostgreSQL
    "Logical Streaming Replication Protocol", protocol version 1):
    Begin 'B', Commit 'C', Relation 'R', Insert 'I', Update 'U',
    Delete 'D'; Origin/Type/Truncate are skipped. TupleData kinds:
    't' text value, 'n' null, 'u' unchanged TOAST (rendered as null
    with a marker in the column list)."""
    import struct

    rels: dict[int, dict] = {}
    out: list[dict] = []
    tx_lsn = 0
    pos = 0
    n = len(data)

    def cstr(buf: bytes, at: int) -> tuple[str, int]:
        end = buf.index(b"\x00", at)
        return buf[at:end].decode("utf-8"), end + 1

    def tuple_data(buf: bytes, at: int) -> tuple[list, int]:
        (ncols,) = struct.unpack_from(">H", buf, at)
        at += 2
        vals: list = []
        for _ in range(ncols):
            kind = buf[at : at + 1]
            at += 1
            if kind == b"n":
                vals.append(None)
            elif kind == b"u":
                vals.append(None)  # unchanged TOAST — value not sent
            elif kind == b"t":
                (ln,) = struct.unpack_from(">I", buf, at)
                at += 4
                vals.append(buf[at : at + ln].decode("utf-8"))
                at += ln
            else:
                raise ValueError(f"unknown TupleData kind {kind!r}")
        return vals, at

    seq = 0
    while pos + 4 <= n:
        (mlen,) = struct.unpack_from(">I", data, pos)
        pos += 4
        msg = data[pos : pos + mlen]
        pos += mlen
        if not msg:
            continue
        tag = msg[0:1]
        at = 1
        if tag == b"B":
            (tx_lsn,) = struct.unpack_from(">Q", msg, at)
        elif tag == b"R":
            (oid,) = struct.unpack_from(">I", msg, at)
            at += 4
            ns, at = cstr(msg, at)
            name, at = cstr(msg, at)
            at += 1  # replica identity setting
            (ncols,) = struct.unpack_from(">H", msg, at)
            at += 2
            cols = []
            keys = []
            for _ in range(ncols):
                flags = msg[at]
                at += 1
                cname, at = cstr(msg, at)
                at += 8  # type oid + atttypmod
                cols.append(cname)
                if flags & 1:
                    keys.append(cname)
            rels[oid] = {"schema": ns, "table": name, "cols": cols, "keys": keys}
        elif tag in (b"I", b"U", b"D"):
            (oid,) = struct.unpack_from(">I", msg, at)
            at += 4
            rel = rels.get(oid)
            if rel is None:
                raise ValueError(f"data message for unknown relation {oid}")
            before = None
            after = None
            if tag == b"I":
                marker = msg[at : at + 1]
                if marker != b"N":
                    raise ValueError(f"Insert tuple marker {marker!r}, expected b'N'")
                after, _ = tuple_data(msg, at + 1)
                op = "create"
            elif tag == b"U":
                marker = msg[at : at + 1]
                if marker in (b"K", b"O"):
                    before, at2 = tuple_data(msg, at + 1)
                    at = at2
                    marker = msg[at : at + 1]
                if marker != b"N":
                    raise ValueError(f"Update new-tuple marker {marker!r}, expected b'N'")
                after, _ = tuple_data(msg, at + 1)
                op = "update"
            else:
                marker = msg[at : at + 1]
                if marker not in (b"K", b"O"):
                    raise ValueError(
                        f"Delete tuple marker {marker!r}, expected b'K' or b'O'"
                    )
                before, _ = tuple_data(msg, at + 1)
                op = "delete"
            seq += 1
            out.append(
                {
                    "op": op,
                    "schema": rel["schema"],
                    "table": rel["table"],
                    "cols": rel["cols"],
                    "keys": rel["keys"],
                    "before": before,
                    "after": after,
                    "lsn": tx_lsn,
                    "seq": seq,
                }
            )
        # 'C', 'O', 'Y', 'T' and anything else: no record to emit
    return out


def pgoutput_source(
    spark: SparkSession,
    path: str,
    *,
    source_id: str = "postgres",
) -> DataFrame:
    """Length-framed pgoutput capture files → OpenCDC envelopes.

    One decoder pass per file inside ``mapInPandas`` (Arrow-batched;
    the protocol is stateful within a stream, so per-file sequential is
    the correct unit) — files parallelize across the cluster. Values
    arrive in pgoutput text representation, so payload JSON renders
    every column as string-or-null, keyed by the Relation message's
    column names."""
    import json as _json

    from conduit_spark.envelope import ENVELOPE_SCHEMA

    files = spark.read.format("binaryFile").load(path)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for ch in parse_pgoutput(bytes(content)):
                    obj = (
                        dict(zip(ch["cols"], ch["after"]))
                        if ch["after"] is not None
                        else None
                    )
                    old = (
                        dict(zip(ch["cols"], ch["before"]))
                        if ch["before"] is not None
                        else None
                    )
                    key_source = obj if obj is not None else (old or {})
                    key = {
                        k: key_source.get(k)
                        for k in ch["keys"]
                        if k in key_source
                    } or None
                    rows.append(
                        {
                            "position": f"{ch['lsn']}:{ch['seq']}".encode(),
                            "operation": ch["op"],
                            "metadata": {
                                META_COLLECTION: f"{ch['schema']}.{ch['table']}",
                                META_SOURCE_ID: source_id,
                                "postgres.lsn": str(ch["lsn"]),
                                "postgres.seq": str(ch["seq"]),
                            },
                            "key_raw": None,
                            "key_json": _json.dumps(key) if key else None,
                            "payload_before_json": _json.dumps(old) if old else None,
                            "payload_after_json": _json.dumps(obj) if obj else None,
                            "payload_after_raw": None,
                            "is_structured": True,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in ENVELOPE_SCHEMA.fields],
            )

    return files.mapInPandas(decode, schema=ENVELOPE_SCHEMA)


def snapshot_handoff_source(
    spark: SparkSession,
    snapshot_df: DataFrame,
    wal_path: str,
    *,
    snapshot_lsn: str,
    key_cols: list[str],
    collection: str = "public.table",
    source_id: str = "postgres",
    streaming_tail: bool = False,
    format_version: int = 2,
) -> DataFrame:
    """Initial snapshot + WAL tail with a consistent LSN cutover — the
    reference postgres source's snapshot→CDC handoff (its source takes
    the snapshot in the same transaction that creates the replication
    slot, so the slot's LSN is exactly the snapshot's consistent
    point; conduit-connector-postgres source docs).

    ``snapshot_df`` is the table as of ``snapshot_lsn`` (any relation:
    JDBC read, parquet restore, ...); the WAL feed contributes ONLY
    changes with ``lsn > snapshot_lsn`` — the strict inequality is the
    whole invariant: a change at or before the snapshot point is
    already IN the snapshot, and replaying it would double-apply
    deletes-then-reinserts and resurrect dead rows.

    Output envelopes order totally under ``cdc_apply`` with
    ``lsn_to_long(metadata['postgres.lsn'])``: snapshot rows carry the
    snapshot LSN itself, so any later change to the same key wins.
    Scale shape: snapshot scan and WAL parse are independent parallel
    scans; the union is narrow; the one shuffle is cdc_apply's keyed
    max — at 100 TB the snapshot side is the big relation and
    partitions by whatever the table scan provides.
    """
    from conduit_spark import envelope as env

    snap = env.from_table(
        snapshot_df,
        key_cols=key_cols,
        source_id=source_id,
        operation="snapshot",
    )
    snap = snap.withColumn(
        "metadata",
        F.map_concat(
            "metadata",
            F.create_map(
                F.lit("postgres.lsn"), F.lit(snapshot_lsn),
                F.lit(META_COLLECTION), F.lit(collection),
            ),
        ),
    )
    tail = wal2json_source(
        spark,
        wal_path,
        source_id=source_id,
        streaming=streaming_tail,
        format_version=format_version,
        key_cols=key_cols,
    ).filter(
        lsn_to_long(F.col("metadata").getItem("postgres.lsn"))
        > lsn_to_long(F.lit(snapshot_lsn))
    )
    return snap.unionByName(tail)


def emit_resnapshot_capture(
    snapshot_df: DataFrame,
    capture_dir: str,
    *,
    snapshot_lsn: str,
    schema_name: str = "public",
    table: str = "table",
) -> int:
    """Ad-hoc incremental re-snapshot (the Debezium incremental-
    snapshot capability, reference CDC roadmap
    ``20260722-debezium-compete-roadmap.md`` "Incremental-snapshot
    operator UX"): inject a consistent snapshot of the table INTO the
    live capture stream, so the running pipeline heals gaps (lost
    capture files, a slot recreated after retention loss) without
    stopping the tail or replaying history.

    Debezium needs the DBLog watermark protocol (low/high watermark,
    chunk-vs-open-transaction dedup) because its consumers see an
    ORDERED stream. This engine's materialization is declarative —
    ``cdc_apply`` is last-write-wins by (key, LSN) — so a snapshot
    taken at consistent point X and stamped with LSN X reconciles by
    construction: changes after X (higher LSN) win over snapshot rows,
    snapshot rows win over anything at-or-before X (whose effects the
    consistent read already includes, so equal-LSN ties carry
    identical values), and keys deleted before X are simply absent
    from the snapshot while their delete envelopes still win as the
    key's last op. No watermarks, no chunk signals, no pause.

    Mechanics: rows serialize DISTRIBUTED to wal2json-v2 INSERT lines
    (the same dialect the tail captures, so the production parser
    ingests them unchanged) into a temp directory; the part files then
    move atomically into ``capture_dir`` under unique names — the
    staged-rename convention LiveWalTail uses, so a streaming reader
    never sees a half-written file. Returns the number of files
    injected."""
    import os
    import shutil
    import tempfile
    import uuid

    cols = snapshot_df.columns
    colarr = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"),
                F.lit("text").alias("type"),
                F.col(c).cast("string").alias("value"),
            )
            for c in cols
        ]
    )
    line = F.to_json(
        F.struct(
            F.lit("I").alias("action"),
            F.lit(schema_name).alias("schema"),
            F.lit(table).alias("table"),
            F.lit(snapshot_lsn).alias("lsn"),
            colarr.alias("columns"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="conduit_resnap_")
    try:
        snapshot_df.select(line.alias("value")).write.mode(
            "overwrite"
        ).text(tmp)
        os.makedirs(capture_dir, exist_ok=True)
        n = 0
        for name in sorted(os.listdir(tmp)):
            if not name.startswith("part-"):
                continue
            src = os.path.join(tmp, name)
            if os.path.getsize(src) == 0:
                continue
            final = os.path.join(
                capture_dir, f"snap-{uuid.uuid4().hex[:12]}-{n:05d}.jsonl"
            )
            staged = os.path.join(capture_dir, "." + os.path.basename(final))
            shutil.move(src, staged)
            os.rename(staged, final)  # atomic: never half-visible
            n += 1
        return n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


class LiveWalTail:
    """Live logical-replication tail: spawn ``pg_recvlogical`` against
    a replication slot and pump its stdout into ROTATING capture files
    a Structured Streaming text source can consume.

    This is the missing piece between the offline wal2json parser and
    a real database: Spark's file streaming source treats files as
    immutable once seen, so appending to one capture file would never
    deliver new data — the pump writes complete batches to numbered
    files (``wal-000001.jsonl``, staged as dotfiles then renamed, so a
    half-written file is never picked up) on a line-count or age
    threshold.

    The subprocess is the reference's own transport choice for testing
    (pg_recvlogical is the canonical wal2json client); everything
    downstream — parsing, envelopes, cdc_apply, snapshot handoff — is
    the same code the offline replay uses. ``command`` is injectable
    so the wrapper itself is testable without a postgres (a fake
    emitter script in tests), and so pgoutput or wrapped/dockerized
    clients slot in.
    """

    def __init__(
        self,
        capture_dir: str,
        *,
        dbname: str | None = None,
        slot: str = "conduit_spark",
        command: list[str] | None = None,
        max_lines: int = 500,
        max_secs: float = 1.0,
        format_version: int = 2,
    ) -> None:
        import os

        self.capture_dir = capture_dir
        self.max_lines = max_lines
        self.max_secs = max_secs
        self.format_version = format_version
        if command is None and dbname is not None:
            command = [
                "pg_recvlogical", "-d", dbname, "--slot", slot, "--start",
                "-o", f"format-version={format_version}", "-f", "-",
            ]
        self.command = command  # None is fine when using start_native()
        self._proc = None
        self._thread = None
        self._stop = None
        os.makedirs(capture_dir, exist_ok=True)
        # Resume numbering AFTER any existing capture files: a restart
        # into the same capture_dir must never overwrite wal-000001
        # (Spark's file source treats files as immutable-once-seen, so
        # an overwrite would both destroy old records AND hide the
        # re-delivered ones).
        existing = [
            int(f[4:10])
            for f in os.listdir(capture_dir)
            if f.startswith("wal-") and f.endswith(".jsonl")
            and f[4:10].isdigit()
        ]
        self._n_files = max(existing, default=0)

    def start(self) -> "LiveWalTail":
        import os
        import subprocess
        import threading
        import time

        if self.command is None:
            raise ValueError(
                "need dbname or an explicit command for the subprocess "
                "tail; use start_native(dsn) for the wire-protocol client"
            )
        self._stop = threading.Event()
        self._proc = subprocess.Popen(
            self.command,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
        )

        def flush(buf: list[str]) -> None:
            if not buf:
                return
            self._n_files += 1
            final = os.path.join(
                self.capture_dir, f"wal-{self._n_files:06d}.jsonl"
            )
            staged = os.path.join(
                self.capture_dir, f".wal-{self._n_files:06d}.jsonl.tmp"
            )
            with open(staged, "w", encoding="utf-8") as f:
                f.write("\n".join(buf) + "\n")
            os.replace(staged, final)
            buf.clear()

        def pump() -> None:
            buf: list[str] = []
            last = time.monotonic()
            stdout = self._proc.stdout
            while not self._stop.is_set():
                line = stdout.readline()
                if not line:  # subprocess exited
                    break
                line = line.rstrip("\n")
                if line:
                    buf.append(line)
                now = time.monotonic()
                if len(buf) >= self.max_lines or (
                    buf and now - last >= self.max_secs
                ):
                    flush(buf)
                    last = now
            flush(buf)

        self._thread = threading.Thread(
            target=pump, daemon=True, name="wal-tail-pump"
        )
        self._thread.start()
        return self

    def start_native(self, dsn: str, *, slot: str = "conduit_spark",
                     start_lsn: int = 0, user: str = "conduit",
                     password: str | None = None,
                     sslmode: str = "disable",
                     ssl_ca: str | None = None,
                     sslcert: str | None = None,
                     sslkey: str | None = None) -> "LiveWalTail":
        """Tail a replication endpoint over the ENGINE'S OWN wire
        client (``functions.minipg.ReplicationClient`` — protocol-v3
        walsender mode: startup with ``replication=database``,
        START_REPLICATION, XLogData frames) instead of the
        pg_recvlogical subprocess. The Standby Status Update confirming
        the slot position is sent only AFTER a capture file is durably
        renamed into place — crash-restart re-delivers at most the
        unflushed tail (pg_recvlogical's --fsync-interval semantics),
        and the confirmed slot never re-delivers what Spark can already
        read."""
        import os
        import threading
        import time

        from conduit_spark.functions.minipg import ReplicationClient

        self._stop = threading.Event()

        def flush(buf: list[str]) -> None:
            if not buf:
                return
            self._n_files += 1
            final = os.path.join(
                self.capture_dir, f"wal-{self._n_files:06d}.jsonl"
            )
            staged = os.path.join(
                self.capture_dir, f".wal-{self._n_files:06d}.jsonl.tmp"
            )
            with open(staged, "w", encoding="utf-8") as f:
                f.write("\n".join(buf) + "\n")
            os.replace(staged, final)
            buf.clear()

        def pump() -> None:
            client = ReplicationClient(
                dsn, slot=slot, user=user, password=password,
                sslmode=sslmode, ssl_ca=ssl_ca,
                sslcert=sslcert, sslkey=sslkey,
            )
            self._client = client
            buf: list[str] = []
            flushed_lsn = 0
            last = time.monotonic()
            try:
                for lsn, payload in client.start_replication(start_lsn):
                    if self._stop.is_set():
                        break
                    now = time.monotonic()
                    if lsn is None:  # keepalive heartbeat
                        if buf and now - last >= self.max_secs:
                            flush(buf)
                            client.confirm(flushed_lsn)
                            last = now
                        continue
                    line = payload.decode("utf-8").rstrip("\n")
                    if line:
                        buf.append(line)
                    flushed_lsn = lsn + len(payload)
                    if len(buf) >= self.max_lines or (
                        buf and now - last >= self.max_secs
                    ):
                        flush(buf)
                        client.confirm(flushed_lsn)  # durable → confirm
                        last = now
            finally:
                flush(buf)
                try:
                    client.confirm(flushed_lsn)
                finally:
                    client.close()

        self._thread = threading.Thread(
            target=pump, daemon=True, name="wal-native-pump"
        )
        self._thread.start()
        return self

    def stream(
        self,
        spark: SparkSession,
        *,
        source_id: str = "postgres",
        key_cols: list[str] | None = None,
    ) -> DataFrame:
        """The streaming envelope DataFrame tailing the capture dir."""
        return wal2json_source(
            spark,
            self.capture_dir,
            source_id=source_id,
            streaming=True,
            format_version=self.format_version,
            key_cols=key_cols,
        )

    def stop(self, timeout: float = 10.0) -> int:
        """Terminate the client and drain the pump; returns the number
        of capture files written."""
        if self._stop is not None:
            self._stop.set()
        client = getattr(self, "_client", None)
        if client is not None:
            if self._thread is not None:
                # let the pump notice _stop at the next frame/keepalive
                self._thread.join(timeout=timeout)
            if self._thread is None or self._thread.is_alive():
                client.close()  # unblock a stuck read; pump flushes in finally
        if self._proc is not None and self._proc.poll() is None:
            self._proc.terminate()
            try:
                self._proc.wait(timeout=timeout)
            except Exception:  # noqa: BLE001 — escalate to kill
                self._proc.kill()
        if self._thread is not None:
            self._thread.join(timeout=timeout)
        return self._n_files
