"""In-process PostgreSQL logical-replication endpoint (wire protocol).

The sandbox has no postgres, so the ``builtin:postgres`` source's
replication-slot tailing was verifiable only through the
pg_recvlogical subprocess seam (``postgres_wal.LiveWalTail``). This is
the postgres analog of ``minikafka``/``minis3``: a threaded stdlib
server speaking the documented frontend/backend protocol v3 subset
that a logical-replication client exercises
(postgresql.org/docs/current/protocol-replication.html), plus a
pure-Python client. Protocol notes:

- **Startup**: length-prefixed packet, protocol 196608 (3.0), with the
  ``replication=database`` parameter that switches the backend into
  walsender mode. Server answers AuthenticationOk (``R``/0),
  ParameterStatus, BackendKeyData, ReadyForQuery (``Z``/``I``) — no
  auth (credential plumbing is config-level; this server proves the
  replication protocol).
- **IDENTIFY_SYSTEM** (simple query ``Q``): RowDescription +
  DataRow(systemid, timeline, xlogpos, dbname) + CommandComplete.
- **START_REPLICATION SLOT s LOGICAL lsn (opts)**: CopyBothResponse
  (``W``), then CopyData (``d``) frames — XLogData ``w`` with
  start/end LSN + server clock + one wal2json payload, and keepalive
  ``k`` frames. The client answers with Standby Status Update ``r``
  frames (written/flushed/applied LSNs); the server records the
  FLUSHED LSN as the slot's ``confirmed_flush_lsn`` — a reconnecting
  client that starts at LSN 0 resumes from the confirmed position,
  the slot semantics that make replication restartable exactly-once
  per payload.

Changes are fed with :meth:`MiniPGServer.feed` (one wal2json line per
call, monotonically increasing LSNs).
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
import time

__all__ = ["MiniPGServer", "ReplicationClient", "lsn_text"]

_PG_EPOCH = 946684800  # 2000-01-01 in unix seconds (pg timestamps)


def lsn_text(lsn: int) -> str:
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


def parse_lsn(text: str) -> int:
    hi, _, lo = text.partition("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def _msg(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack(">I", len(body) + 4) + body


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _pg_clock() -> int:
    return int((time.time() - _PG_EPOCH) * 1_000_000)


class MiniPGServer:
    """Walsender-mode endpoint over a change log of wal2json lines."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, *,
                 slot: str = "conduit_spark", keepalive_s: float = 0.2,
                 users: dict[str, str] | None = None,
                 tls: tuple[str, str] | None = None,
                 client_ca: str | None = None):
        self.host = host
        # (cert_pem, key_pem): answer the SSLRequest probe with 'S' and
        # upgrade the connection (postgres STARTTLS, protocol v3) —
        # sslmode=require semantics; without it the probe gets 'N'.
        # client_ca additionally REQUIRES a client certificate in the
        # upgrade handshake (libpq sslcert/sslkey — clientcert=verify-ca
        # in pg_hba terms), round 9
        self._tls = tls
        self._client_ca = client_ca
        # {startup-user: password}; when set, the session must pass
        # SCRAM-SHA-256 (protocol-v3 AuthenticationSASL flow, RFC 5802
        # via functions/scram.py) before AuthenticationOk — postgres
        # semantics: the STARTUP user is authoritative, the SASL
        # client-first carries an empty n= like libpq sends
        self._users = users
        self.slot = slot
        self.keepalive_s = keepalive_s
        self._changes: list[tuple[int, bytes]] = []  # (lsn, payload)
        self._next_lsn = 0x1_0000_0000  # start at 1/0 like a real cluster
        self.confirmed_flush_lsn = 0
        self._lock = threading.Condition()
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    server._session(self.request)
                except (ConnectionError, OSError):
                    pass  # client went away; the slot state persists

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Server((host, port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    # -- producer side ------------------------------------------------------

    def feed(self, payload: str | bytes) -> int:
        """Append one wal2json line to the change log → its LSN."""
        data = payload.encode() if isinstance(payload, str) else bytes(payload)
        with self._lock:
            lsn = self._next_lsn
            self._next_lsn += max(len(data), 1)
            self._changes.append((lsn, data))
            self._lock.notify_all()
            return lsn

    @property
    def current_lsn(self) -> int:
        with self._lock:
            return self._next_lsn

    # -- protocol session ---------------------------------------------------

    def _session(self, sock: socket.socket) -> None:
        params, sock = self._read_startup(sock)
        if params.get("replication") not in ("database", "true", "on", "1"):
            # plain sessions aren't served — this is a walsender
            sock.sendall(_msg(b"E", _cstr("SFATAL") + _cstr(
                "Mreplication=database required") + b"\x00"))
            return
        if self._users is not None and not self._scram_auth(sock, params):
            return
        sock.sendall(
            _msg(b"R", struct.pack(">I", 0))  # AuthenticationOk
            + _msg(b"S", _cstr("server_version") + _cstr("16.0-mini"))
            + _msg(b"K", struct.pack(">II", 1, 7))  # BackendKeyData
            + _msg(b"Z", b"I")
        )
        while True:
            tag, body = self._read_msg(sock)
            if tag in (b"X", b""):  # Terminate / EOF
                return
            if tag != b"Q":
                sock.sendall(_msg(b"E", _cstr("SERROR") + _cstr(
                    f"Munsupported message {tag!r}") + b"\x00") + _msg(b"Z", b"I"))
                continue
            q = body.rstrip(b"\x00").decode().strip()
            up = q.upper()
            if up == "IDENTIFY_SYSTEM":
                self._identify_system(sock)
            elif up.startswith("CREATE_REPLICATION_SLOT"):
                self._create_slot(sock, q)
            elif up.startswith("DROP_REPLICATION_SLOT"):
                self._drop_slot(sock, q)
            elif up.startswith("START_REPLICATION"):
                self._stream(sock, q)
                return  # copy mode ends the session (like walsender)
            else:
                sock.sendall(_msg(b"E", _cstr("SERROR") + _cstr(
                    f"Munsupported command {q!r}") + b"\x00") + _msg(b"Z", b"I"))

    def _scram_auth(self, sock: socket.socket, params: dict) -> bool:
        """Protocol-v3 SASL exchange: AuthenticationSASL(10) offering
        SCRAM-SHA-256 → SASLInitialResponse → AuthenticationSASL-
        Continue(11) → SASLResponse → AuthenticationSASLFinal(12).
        Failure sends ErrorResponse 28P01 (invalid_password)."""
        from conduit_spark.functions.scram import ScramServer

        def fail(msg: str) -> bool:
            sock.sendall(_msg(b"E", _cstr("SFATAL") + _cstr("C28P01")
                              + _cstr("M" + msg) + b"\x00"))
            return False

        user = params.get("user", "")
        password = self._users.get(user)
        sock.sendall(_msg(
            b"R", struct.pack(">I", 10) + _cstr("SCRAM-SHA-256") + b"\x00"
        ))
        tag, body = self._read_msg(sock)
        if tag != b"p":
            return fail("expected SASLInitialResponse")
        end = body.index(b"\x00")
        mech = body[:end].decode()
        if mech != "SCRAM-SHA-256":
            return fail(f"unsupported SASL mechanism {mech!r}")
        (n,) = struct.unpack_from(">i", body, end + 1)
        first = body[end + 5 : end + 5 + max(n, 0)].decode()
        # postgres ignores the SASL-layer username; the startup user is
        # authoritative (libpq sends n=)
        srv = ScramServer({"": password} if password is not None else {})
        try:
            server_first = srv.first(first)
        except (ValueError, KeyError) as e:
            return fail(f"malformed client-first: {e}")
        sock.sendall(_msg(
            b"R", struct.pack(">I", 11) + server_first.encode()
        ))
        tag, body = self._read_msg(sock)
        if tag != b"p":
            return fail("expected SASLResponse")
        final = srv.final(body.decode())
        if final.startswith("e="):
            return fail("password authentication failed")
        sock.sendall(_msg(b"R", struct.pack(">I", 12) + final.encode()))
        return True

    def _identify_system(self, sock: socket.socket) -> None:
        cols = ["systemid", "timeline", "xlogpos", "dbname"]
        desc = struct.pack(">h", len(cols))
        for c in cols:
            desc += _cstr(c) + struct.pack(">IhIhih", 0, 0, 25, -1, -1, 0)
        vals = ["7000000000000000001", "1", lsn_text(self.current_lsn), "mini"]
        row = struct.pack(">h", len(vals))
        for v in vals:
            b = v.encode()
            row += struct.pack(">i", len(b)) + b
        sock.sendall(
            _msg(b"T", desc) + _msg(b"D", row)
            + _msg(b"C", _cstr("IDENTIFY_SYSTEM")) + _msg(b"Z", b"I")
        )

    def _create_slot(self, sock: socket.socket, query: str) -> None:
        """``CREATE_REPLICATION_SLOT <name> [TEMPORARY] LOGICAL
        <plugin>`` — the walsender command the live-tail client issues
        against a fresh database (real walsenders accept exactly this
        grammar; pg_recvlogical --create-slot sends it)."""
        parts = query.split()
        name = parts[1] if len(parts) > 1 else "conduit_spark"
        # the plugin is the token immediately after LOGICAL — parts[-1]
        # would mis-read trailing options like "(EXPORT_SNAPSHOT)" or
        # "RESERVE_WAL" that pg_recvlogical's grammar allows. Search
        # from index 2: index 1 is the slot NAME, which may itself be
        # the word "logical"
        upper = [p.upper() for p in parts]
        try:
            kw = upper.index("LOGICAL", 2)
            plugin = (parts[kw + 1].lower() if kw + 1 < len(parts)
                      else parts[-1].lower())
        except ValueError:
            plugin = parts[-1].lower()
        with self._lock:
            self._slots = getattr(self, "_slots", set())
            if name in self._slots:
                sock.sendall(_msg(b"E", _cstr("SERROR") + _cstr("C42710")
                                  + _cstr(f"Mreplication slot \"{name}\" "
                                          "already exists") + b"\x00")
                             + _msg(b"Z", b"I"))
                return
            self._slots.add(name)
            point = lsn_text(self.current_lsn)
        cols = ["slot_name", "consistent_point", "snapshot_name",
                "output_plugin"]
        desc = struct.pack(">h", len(cols))
        for c in cols:
            desc += _cstr(c) + struct.pack(">IhIhih", 0, 0, 25, -1, -1, 0)
        row = struct.pack(">h", 4)
        for v in (name, point, None, plugin):
            if v is None:
                row += struct.pack(">i", -1)
            else:
                b = v.encode()
                row += struct.pack(">i", len(b)) + b
        sock.sendall(
            _msg(b"T", desc) + _msg(b"D", row)
            + _msg(b"C", _cstr("CREATE_REPLICATION_SLOT")) + _msg(b"Z", b"I")
        )

    def _drop_slot(self, sock: socket.socket, query: str) -> None:
        parts = query.split()
        name = parts[1] if len(parts) > 1 else ""
        with self._lock:
            self._slots = getattr(self, "_slots", set())
            self._slots.discard(name)
        sock.sendall(
            _msg(b"C", _cstr("DROP_REPLICATION_SLOT")) + _msg(b"Z", b"I")
        )

    def _stream(self, sock: socket.socket, query: str) -> None:
        # START_REPLICATION SLOT <name> LOGICAL <lsn> [(...)]
        parts = query.replace("(", " ").split()
        req_lsn = 0
        for p in parts:
            if "/" in p:
                try:
                    req_lsn = parse_lsn(p)
                    break
                except ValueError:
                    continue
        with self._lock:
            # slot semantics: LSN 0/0 (or anything below the confirmed
            # flush) resumes from confirmed_flush_lsn
            start = max(req_lsn, self.confirmed_flush_lsn)
        sock.sendall(_msg(b"W", struct.pack(">bh", 0, 0)))  # CopyBothResponse
        sock.settimeout(self.keepalive_s)
        sent_idx = 0
        while True:
            with self._lock:
                pending = [
                    (lsn, data) for lsn, data in self._changes[sent_idx:]
                ]
                sent_idx = len(self._changes)
            for lsn, data in pending:
                if lsn < start:
                    continue
                end = lsn + len(data)
                xlog = (
                    b"w" + struct.pack(">QQQ", lsn, end, _pg_clock()) + data
                )
                sock.sendall(_msg(b"d", xlog))
            # keepalive (reply requested) + drain client status updates
            ka = b"k" + struct.pack(">QQb", self.current_lsn, _pg_clock(), 1)
            try:
                sock.sendall(_msg(b"d", ka))
            except OSError:
                return
            # drain EVERY pending client message (multiple status
            # updates can queue between keepalive ticks; Terminate
            # arrives after them when the client closes — a buffered
            # socket still yields them post-close)
            try:
                while True:
                    tag, body = self._read_msg_tag_timeout(sock)
                    if tag in (b"X", b""):
                        return
                    if tag == b"d" and body[:1] == b"r":
                        _w, flushed, _a, _clock, _reply = struct.unpack(
                            ">QQQQb", body[1:34]
                        )
                        with self._lock:
                            self.confirmed_flush_lsn = max(
                                self.confirmed_flush_lsn, flushed
                            )
                    elif tag == b"c":  # CopyDone → acknowledge and end
                        sock.sendall(_msg(b"c", b""))
                        return
            except socket.timeout:
                continue
            except (ConnectionError, OSError):
                return

    # -- wire helpers -------------------------------------------------------

    @staticmethod
    def _read_exact(sock: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return buf

    def _read_startup(self, sock: socket.socket) -> tuple[dict, socket.socket]:
        (ln,) = struct.unpack(">I", self._read_exact(sock, 4))
        body = self._read_exact(sock, ln - 4)
        (proto,) = struct.unpack(">I", body[:4])
        if proto == 80877103 and self._tls is not None:  # SSLRequest
            # postgres STARTTLS: 'S' then the handshake on the same
            # connection; the startup packet arrives over TLS
            from conduit_spark.functions.tlsutil import server_context

            sock.sendall(b"S")
            sock = server_context(
                *self._tls, client_ca_pem=self._client_ca
            ).wrap_socket(sock, server_side=True)
            return self._read_startup(sock)
        if proto in (80877103, 80877104):  # SSLRequest / GSSENCRequest
            # real libpq clients probe before the startup packet;
            # answer 'N' (not supported) and read the actual startup
            sock.sendall(b"N")
            return self._read_startup(sock)
        if proto == 80877102:  # CancelRequest — nothing to cancel
            raise ConnectionError("cancel request")
        if proto != 196608:
            raise ConnectionError(f"unsupported protocol {proto}")
        fields = body[4:].split(b"\x00")
        params = {}
        for k, v in zip(fields[::2], fields[1::2]):
            if k:
                params[k.decode()] = v.decode()
        return params, sock

    def _read_msg(self, sock: socket.socket) -> tuple[bytes, bytes]:
        tag = self._read_exact(sock, 1)
        (ln,) = struct.unpack(">I", self._read_exact(sock, 4))
        return tag, self._read_exact(sock, ln - 4)

    def _read_msg_tag_timeout(self, sock: socket.socket) -> tuple[bytes, bytes]:
        """Like :meth:`_read_msg`, but only the 1-byte TAG read may
        time out: once a tag arrives, the remainder reads blocking. A
        timeout applied to every recv would otherwise fire mid-frame
        when a message straddles TCP segments, discarding the consumed
        prefix and desyncing the protocol (the next read would treat a
        mid-frame byte as a tag)."""
        tag = self._read_exact(sock, 1)  # may raise socket.timeout cleanly
        prev = sock.gettimeout()
        sock.settimeout(None)
        try:
            (ln,) = struct.unpack(">I", self._read_exact(sock, 4))
            return tag, self._read_exact(sock, ln - 4)
        finally:
            sock.settimeout(prev)

    # -- lifecycle ----------------------------------------------------------

    @property
    def dsn(self) -> str:
        return f"{self.host}:{self.port}"

    def start(self) -> "MiniPGServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self) -> "MiniPGServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()


class ReplicationClient:
    """Pure-Python logical-replication client: startup in
    ``replication=database`` mode, IDENTIFY_SYSTEM, START_REPLICATION,
    then a generator of ``(lsn, payload_bytes)`` from XLogData frames.
    :meth:`confirm` sends a Standby Status Update with the flushed LSN
    (what pg_recvlogical does on its --fsync-interval)."""

    def __init__(self, dsn: str, *, slot: str = "conduit_spark",
                 user: str = "conduit", dbname: str = "mini",
                 password: str | None = None,
                 sslmode: str = "disable", ssl_ca: str | None = None,
                 sslcert: str | None = None, sslkey: str | None = None):
        host, _, port = dsn.rpartition(":")
        self._sock = socket.create_connection((host, int(port)), timeout=30)
        self.slot = slot
        if sslmode not in ("disable", "require"):
            raise ValueError("sslmode must be disable|require")
        if sslmode == "require":
            # SSLRequest probe then TLS upgrade (postgres STARTTLS)
            self._sock.sendall(struct.pack(">II", 8, 80877103))
            answer = self._sock.recv(1)
            if answer != b"S":
                raise ConnectionError(
                    f"server refused TLS (answered {answer!r})"
                )
            from conduit_spark.functions.tlsutil import client_context

            self._sock = client_context(
                ssl_ca, client_cert_pem=sslcert, client_key_pem=sslkey
            ).wrap_socket(self._sock, server_hostname=host)
        body = struct.pack(">I", 196608)
        for k, v in (
            ("user", user), ("database", dbname), ("replication", "database"),
        ):
            body += _cstr(k) + _cstr(v)
        body += b"\x00"
        self._sock.sendall(struct.pack(">I", len(body) + 4) + body)
        # consume until ReadyForQuery, answering SASL challenges
        scram = None
        while True:
            tag, msg = self._read_msg()
            if tag == b"E":
                raise ConnectionError(f"server error: {msg!r}")
            if tag == b"R":
                (code,) = struct.unpack_from(">I", msg, 0)
                if code == 0:
                    continue  # AuthenticationOk
                if code == 3:  # AuthenticationCleartextPassword
                    if password is None:
                        raise ConnectionError(
                            "server requires a password but none given"
                        )
                    self._sock.sendall(_msg(b"p", _cstr(password)))
                    continue
                if code == 5:  # AuthenticationMD5Password
                    if password is None:
                        raise ConnectionError(
                            "server requires a password but none given"
                        )
                    import hashlib as _hl

                    salt = msg[4:8]
                    inner = _hl.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    outer = _hl.md5(inner.encode() + salt).hexdigest()
                    self._sock.sendall(_msg(b"p", _cstr("md5" + outer)))
                    continue
                if code == 10:  # AuthenticationSASL
                    mechs = msg[4:].split(b"\x00")
                    if b"SCRAM-SHA-256" not in mechs:
                        raise ConnectionError(
                            f"server offers no SCRAM-SHA-256: {mechs!r}"
                        )
                    if password is None:
                        raise ConnectionError(
                            "server requires SCRAM but no password given"
                        )
                    from conduit_spark.functions.scram import ScramClient

                    # libpq sends an empty SASL username; the startup
                    # user is authoritative server-side
                    scram = ScramClient("", password)
                    first = scram.first().encode()
                    self._sock.sendall(_msg(
                        b"p",
                        _cstr("SCRAM-SHA-256")
                        + struct.pack(">i", len(first)) + first,
                    ))
                elif code == 11:  # AuthenticationSASLContinue
                    final = scram.final(msg[4:].decode()).encode()
                    self._sock.sendall(_msg(b"p", final))
                elif code == 12:  # AuthenticationSASLFinal
                    scram.verify_server(msg[4:].decode())
                else:
                    raise ConnectionError(
                        f"unsupported authentication request {code}"
                    )
                continue
            if tag == b"Z":
                break

    def identify_system(self) -> dict:
        self._sock.sendall(_msg(b"Q", _cstr("IDENTIFY_SYSTEM")))
        out: dict = {}
        cols: list[str] = []
        while True:
            tag, body = self._read_msg()
            if tag == b"T":
                (n,) = struct.unpack_from(">h", body, 0)
                at = 2
                for _ in range(n):
                    end = body.index(b"\x00", at)
                    cols.append(body[at:end].decode())
                    at = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack_from(">h", body, 0)
                at = 2
                for i in range(n):
                    (ln,) = struct.unpack_from(">i", body, at)
                    at += 4
                    val = body[at : at + ln].decode() if ln >= 0 else None
                    at += max(ln, 0)
                    out[cols[i]] = val
            elif tag == b"Z":
                return out

    def _simple_result(self) -> dict:
        """Consume one RowDescription/DataRow/CommandComplete/Z cycle
        into a {col: value} dict (the walsender command-result shape)."""
        out: dict = {}
        cols: list[str] = []
        while True:
            tag, body = self._read_msg()
            if tag == b"E":
                # drain to ReadyForQuery so the NEXT command's reply
                # stream starts clean (an error still ends with Z)
                while tag != b"Z":
                    tag, _ = self._read_msg()
                raise ConnectionError(f"server error: {body!r}")
            if tag == b"T":
                (n,) = struct.unpack_from(">h", body, 0)
                at = 2
                for _ in range(n):
                    end = body.index(b"\x00", at)
                    cols.append(body[at:end].decode())
                    at = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack_from(">h", body, 0)
                at = 2
                for i in range(n):
                    (ln,) = struct.unpack_from(">i", body, at)
                    at += 4
                    val = body[at : at + ln].decode() if ln >= 0 else None
                    at += max(ln, 0)
                    out[cols[i]] = val
            elif tag == b"Z":
                return out

    def create_slot(
        self, plugin: str = "wal2json", *, temporary: bool = False
    ) -> dict:
        """``CREATE_REPLICATION_SLOT`` over the replication protocol
        (what ``pg_recvlogical --create-slot`` sends); returns the
        result row (slot_name, consistent_point, snapshot_name,
        output_plugin). Against a real postgres, pass the installed
        output plugin — ``wal2json`` for the text path this client's
        START_REPLICATION options request."""
        tempkw = "TEMPORARY " if temporary else ""
        q = f"CREATE_REPLICATION_SLOT {self.slot} {tempkw}LOGICAL {plugin}"
        self._sock.sendall(_msg(b"Q", _cstr(q)))
        return self._simple_result()

    def drop_slot(self) -> None:
        self._sock.sendall(
            _msg(b"Q", _cstr(f"DROP_REPLICATION_SLOT {self.slot}"))
        )
        self._simple_result()

    def start_replication(self, start_lsn: int = 0):
        """→ generator of ``(lsn, payload)``; call :meth:`confirm`
        between items to advance the slot."""
        q = (
            f"START_REPLICATION SLOT {self.slot} LOGICAL "
            f"{lsn_text(start_lsn)} (\"format-version\" '2')"
        )
        self._sock.sendall(_msg(b"Q", _cstr(q)))
        tag, _ = self._read_msg()
        if tag != b"W":
            raise ConnectionError(f"expected CopyBothResponse, got {tag!r}")

        def frames():
            while True:
                tag, body = self._read_msg()
                if tag != b"d":
                    return
                if body[:1] == b"w":
                    lsn, _end, _clock = struct.unpack_from(">QQQ", body, 1)
                    yield lsn, body[25:]
                elif body[:1] == b"k":
                    _end, _clock, reply = struct.unpack_from(">QQb", body, 1)
                    if reply:
                        self.confirm(self._flushed)
                    # heartbeat: lets a consumer loop check stop flags
                    # and run age-based flushes without new data
                    yield None, b""
        return frames()

    _flushed = 0

    def confirm(self, flushed_lsn: int) -> None:
        """Standby Status Update: report written/flushed/applied."""
        self._flushed = max(self._flushed, flushed_lsn)
        body = b"r" + struct.pack(
            ">QQQQb",
            self._flushed, self._flushed, self._flushed, _pg_clock(), 0,
        )
        self._sock.sendall(_msg(b"d", body))

    def close(self) -> None:
        # Terminate, half-close, then DRAIN: closing with unread
        # keepalives in the receive buffer would RST the connection
        # and destroy in-flight status updates the server hasn't read
        # yet — the final confirm would be lost and the slot would
        # re-deliver on resume.
        try:
            self._sock.sendall(_msg(b"X", b""))
            self._sock.shutdown(socket.SHUT_WR)
            self._sock.settimeout(2.0)
            while self._sock.recv(1 << 16):
                pass
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "ReplicationClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _read_msg(self) -> tuple[bytes, bytes]:
        tag = MiniPGServer._read_exact(self._sock, 1)
        (ln,) = struct.unpack(">I", MiniPGServer._read_exact(self._sock, 4))
        return tag, MiniPGServer._read_exact(self._sock, ln - 4)
