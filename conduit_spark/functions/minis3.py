"""In-process S3-compatible object store speaking the REST wire API.

The sandbox has no MinIO/AWS endpoint, so ``builtin:s3``'s wire-level
behavior was previously verifiable only at the configuration layer
(``apply_s3_conf``). This module is the S3 analog of
``functions.minikafka``: a threaded stdlib HTTP server implementing
the subset of the S3 REST API (AWS docs "API Reference", public wire
format) that the reference's S3 connector exercises
(conduit-connector-s3: ListObjectsV2 snapshot iteration + polling
CDC on the source side; PutObject / multipart upload on the
destination side), plus a urllib client. Protocol notes:

- **ListObjectsV2** ``GET /{bucket}?list-type=2`` with ``prefix``,
  ``max-keys``, ``continuation-token`` and ``start-after``; responds
  with the documented XML (``Contents/Key,LastModified,ETag,Size``,
  ``KeyCount``, ``IsTruncated``, ``NextContinuationToken``), keys in
  lexicographic order — the property the reference source's paginated
  snapshot iterator relies on.
- **GetObject** honors ``Range: bytes=a-b`` with a 206 +
  ``Content-Range`` reply (how a chunked reader fetches large objects
  without holding them whole).
- **PutObject** returns the md5-hex ``ETag`` (single-part uploads:
  documented S3 behavior); **multipart** (``?uploads`` initiate,
  ``?partNumber&uploadId`` part puts, ``?uploadId`` POST complete)
  concatenates parts in part-number order and ETags the result as
  ``md5(concat(part_md5s))-N``, matching AWS's published scheme.
- Auth + TLS (round 7): with ``credentials={access_key: secret}``
  every request must carry a valid AWS SigV4 signature
  (``functions/sigv4.py``; 403 reject paths tested); with
  ``tls=(cert_pem, key_pem)`` the endpoint serves HTTPS and clients
  pin the cert as their CA (``functions/tlsutil.py``). Without either
  it stays the open dev endpoint.

Deliberately NOT implemented (out of the connector's contract):
versioning, ACLs, presigned URLs, SSE, object tagging.
"""

from __future__ import annotations

import hashlib
import http.server
import http.client
import io
import socketserver
import threading
import urllib.error
import urllib.parse
import urllib.request
from email.utils import format_datetime
from datetime import datetime, timezone
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

__all__ = ["MiniS3Server", "MiniS3Client"]

_NS = "http://s3.amazonaws.com/doc/2006-03-01/"


def _iso(ts: float) -> str:
    return (
        datetime.fromtimestamp(ts, tz=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.000Z")
    )


class _Obj:
    __slots__ = ("data", "etag", "mtime", "content_type")

    def __init__(self, data: bytes, content_type: str, mtime: float):
        self.data = data
        self.etag = hashlib.md5(data).hexdigest()  # noqa: S324 — S3 ETag IS md5
        self.mtime = mtime
        self.content_type = content_type


class MiniS3Server:
    """Threaded in-memory S3 endpoint (path-style addressing only,
    like MinIO's default — ``http://host:port/bucket/key``)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        credentials: dict[str, str] | None = None,
        tls: tuple[str, str] | None = None,
    ):
        self.host = host
        # (cert_pem, key_pem): serve HTTPS; the cert doubles as the CA
        # clients pin (functions/tlsutil.py)
        self._tls = tls
        # {access_key: secret_key}; when set, EVERY request must carry
        # a valid SigV4 signature (functions/sigv4.py) or gets 403 —
        # the reject paths the e2e auth tests drive
        self._credentials = credentials
        # bucket -> {key -> _Obj}; plain dicts guarded by one lock —
        # request handlers touch state only under it
        self._buckets: dict[str, dict[str, _Obj]] = {}
        self._uploads: dict[str, tuple[str, str, dict[int, bytes]]] = {}
        self._lock = threading.Lock()
        self._clock = 0.0  # monotonically bumped fake mtime (stable listings)
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            # r15 (measured, OPTIMIZATION_r15.md wire section): without
            # TCP_NODELAY the unbuffered status/header writes interact
            # with delayed ACK on persistent connections — ~40 ms stall
            # PER REQUEST (300 keep-alive GETs: 13.2s → 0.09s with
            # these two lines). Buffered writes also coalesce the
            # response into one segment for fresh-connection clients.
            disable_nagle_algorithm = True
            wbufsize = 64 * 1024

            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: bytes = b"", headers=None):
                self.send_response(code)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if self.command != "HEAD":
                    self.wfile.write(body)

            def _err(self, code: int, s3code: str, msg: str):
                body = (
                    f'<?xml version="1.0" encoding="UTF-8"?><Error>'
                    f"<Code>{s3code}</Code><Message>{escape(msg)}</Message>"
                    f"</Error>"
                ).encode()
                self._reply(code, body, {"Content-Type": "application/xml"})

            def _split(self):
                u = urllib.parse.urlsplit(self.path)
                q = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
                parts = u.path.lstrip("/").split("/", 1)
                bucket = urllib.parse.unquote(parts[0]) if parts[0] else ""
                key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
                return bucket, key, q

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n) if n else b""

            def _auth_ok(self, data: bytes = b"") -> bool:
                if store._credentials is None:
                    return True
                from conduit_spark.functions import sigv4

                ok, reason = sigv4.verify(
                    self.command, self.path, dict(self.headers), data,
                    credentials=store._credentials,
                )
                if not ok:
                    self._err(403, "SignatureDoesNotMatch", reason)
                return ok

            def do_PUT(self):  # noqa: N802
                bucket, key, q = self._split()
                data = self._body()
                if not self._auth_ok(data):
                    return
                with store._lock:
                    if not key:
                        store._buckets.setdefault(bucket, {})
                        self._reply(200)
                        return
                    b = store._buckets.get(bucket)
                    if b is None:
                        self._err(404, "NoSuchBucket", bucket)
                        return
                    if "partNumber" in q and "uploadId" in q:
                        up = store._uploads.get(q["uploadId"])
                        if up is None or up[0] != bucket or up[1] != key:
                            self._err(404, "NoSuchUpload", q["uploadId"])
                            return
                        up[2][int(q["partNumber"])] = data
                        self._reply(
                            200, b"",
                            {"ETag": f'"{hashlib.md5(data).hexdigest()}"'},  # noqa: S324
                        )
                        return
                    obj = _Obj(
                        data,
                        self.headers.get("Content-Type", "binary/octet-stream"),
                        store._tick(),
                    )
                    b[key] = obj
                self._reply(200, b"", {"ETag": f'"{obj.etag}"'})

            def do_POST(self):  # noqa: N802
                bucket, key, q = self._split()
                body = self._body()
                if not self._auth_ok(body):
                    return
                with store._lock:
                    b = store._buckets.get(bucket)
                    if b is None:
                        self._err(404, "NoSuchBucket", bucket)
                        return
                    if "uploads" in q:
                        uid = hashlib.md5(  # noqa: S324 — opaque id
                            f"{bucket}/{key}/{len(store._uploads)}".encode()
                        ).hexdigest()
                        store._uploads[uid] = (bucket, key, {})
                        xml = (
                            f'<?xml version="1.0" encoding="UTF-8"?>'
                            f'<InitiateMultipartUploadResult xmlns="{_NS}">'
                            f"<Bucket>{escape(bucket)}</Bucket>"
                            f"<Key>{escape(key)}</Key>"
                            f"<UploadId>{uid}</UploadId>"
                            f"</InitiateMultipartUploadResult>"
                        ).encode()
                        self._reply(200, xml, {"Content-Type": "application/xml"})
                        return
                    if "uploadId" in q:
                        up = store._uploads.get(q["uploadId"])
                        if up is None or up[0] != bucket or up[1] != key:
                            # validate BEFORE removing: a complete
                            # against the wrong bucket/key must leave
                            # the in-flight upload intact (S3 behavior)
                            self._err(404, "NoSuchUpload", q.get("uploadId", ""))
                            return
                        del store._uploads[q["uploadId"]]
                        parts = [up[2][n] for n in sorted(up[2])]
                        data = b"".join(parts)
                        digests = b"".join(
                            hashlib.md5(p).digest() for p in parts  # noqa: S324
                        )
                        etag = (
                            f"{hashlib.md5(digests).hexdigest()}-{len(parts)}"  # noqa: S324
                        )
                        obj = _Obj(data, "binary/octet-stream", store._tick())
                        obj.etag = etag
                        b[key] = obj
                        xml = (
                            f'<?xml version="1.0" encoding="UTF-8"?>'
                            f'<CompleteMultipartUploadResult xmlns="{_NS}">'
                            f"<Key>{escape(key)}</Key>"
                            f'<ETag>"{etag}"</ETag>'
                            f"</CompleteMultipartUploadResult>"
                        ).encode()
                        self._reply(200, xml, {"Content-Type": "application/xml"})
                        return
                self._err(400, "InvalidRequest", "unsupported POST")

            def do_GET(self):  # noqa: N802
                if not self._auth_ok():
                    return
                bucket, key, q = self._split()
                with store._lock:
                    b = store._buckets.get(bucket)
                    if b is None:
                        self._err(404, "NoSuchBucket", bucket)
                        return
                    if not key:
                        self._reply(
                            200, store._list_v2(bucket, q),
                            {"Content-Type": "application/xml"},
                        )
                        return
                    obj = b.get(key)
                    if obj is None:
                        self._err(404, "NoSuchKey", key)
                        return
                    data, code, extra = store._range(obj, self.headers.get("Range"))
                self._reply(
                    code, data,
                    {
                        "Content-Type": obj.content_type,
                        "ETag": f'"{obj.etag}"',
                        "Last-Modified": format_datetime(
                            datetime.fromtimestamp(obj.mtime, tz=timezone.utc),
                            usegmt=True,
                        ),
                        "Accept-Ranges": "bytes",
                        **extra,
                    },
                )

            def do_HEAD(self):  # noqa: N802
                self.do_GET()

            def do_DELETE(self):  # noqa: N802
                if not self._auth_ok():
                    return
                bucket, key, _q = self._split()
                with store._lock:
                    b = store._buckets.get(bucket)
                    if b is None:
                        self._err(404, "NoSuchBucket", bucket)
                        return
                    if key:
                        b.pop(key, None)  # S3 DELETE is idempotent-204
                    else:
                        store._buckets.pop(bucket, None)
                self._reply(204)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Server((host, port), Handler)
        if tls is not None:
            from conduit_spark.functions.tlsutil import server_context

            self._srv.socket = server_context(*tls).wrap_socket(
                self._srv.socket, server_side=True
            )
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    # -- store internals ----------------------------------------------------

    def _tick(self) -> float:
        self._clock += 1.0
        return 1700000000.0 + self._clock  # deterministic, strictly increasing

    def _range(self, obj: _Obj, rng: str | None):
        if not rng or not rng.startswith("bytes="):
            return obj.data, 200, {}
        spec = rng[len("bytes="):]
        start_s, _, end_s = spec.partition("-")
        size = len(obj.data)
        if start_s:
            start = int(start_s)
            end = min(int(end_s), size - 1) if end_s else size - 1
        else:  # suffix range: bytes=-N
            start = max(0, size - int(end_s))
            end = size - 1
        chunk = obj.data[start : end + 1]
        return chunk, 206, {"Content-Range": f"bytes {start}-{end}/{size}"}

    def _list_v2(self, bucket: str, q: dict[str, str]) -> bytes:
        b = self._buckets[bucket]
        prefix = q.get("prefix", "")
        max_keys = int(q.get("max-keys", "1000"))
        # continuation token = the last key of the previous page (an
        # opaque token to clients; start-after for the first page)
        after = q.get("continuation-token") or q.get("start-after") or ""
        keys = sorted(k for k in b if k.startswith(prefix) and k > after)
        page, rest = keys[:max_keys], keys[max_keys:]
        contents = "".join(
            f"<Contents><Key>{escape(k)}</Key>"
            f"<LastModified>{_iso(b[k].mtime)}</LastModified>"
            f'<ETag>&quot;{b[k].etag}&quot;</ETag>'
            f"<Size>{len(b[k].data)}</Size>"
            f"<StorageClass>STANDARD</StorageClass></Contents>"
            for k in page
        )
        trunc = "true" if rest else "false"
        nct = (
            f"<NextContinuationToken>{escape(page[-1])}"
            f"</NextContinuationToken>"
            if rest
            else ""
        )
        return (
            f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<ListBucketResult xmlns="{_NS}">'
            f"<Name>{escape(bucket)}</Name><Prefix>{escape(prefix)}</Prefix>"
            f"<KeyCount>{len(page)}</KeyCount><MaxKeys>{max_keys}</MaxKeys>"
            f"<IsTruncated>{trunc}</IsTruncated>{nct}{contents}"
            f"</ListBucketResult>"
        ).encode()

    # -- lifecycle ----------------------------------------------------------

    @property
    def endpoint(self) -> str:
        scheme = "https" if self._tls is not None else "http"
        return f"{scheme}://{self.host}:{self.port}"

    def start(self) -> "MiniS3Server":
        self._thread.start()
        return self

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self) -> "MiniS3Server":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()


class MiniS3Client:
    """Minimal path-style S3 REST client over urllib (stdlib only) —
    works against :class:`MiniS3Server`, MinIO, or any path-style S3
    endpoint. With ``access_key``/``secret_key`` every request is
    SigV4-signed (``functions/sigv4.py``, conformance pinned by the
    AWS-published worked example), so the jar-free wire transport
    speaks to REAL authenticated endpoints, not just test servers;
    without credentials it stays the unauthenticated dev-mode client."""

    def __init__(
        self,
        endpoint: str,
        *,
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
        session_token: str | None = None,
        ca_pem: str | None = None,
    ):
        self.endpoint = endpoint.rstrip("/")
        self._ssl_ctx = None
        if self.endpoint.startswith("https://"):
            from conduit_spark.functions.tlsutil import client_context

            self._ssl_ctx = client_context(ca_pem)
        self._creds = (
            (access_key, secret_key) if access_key and secret_key else None
        )
        self._region = region
        self._session_token = session_token
        # r15: ONE persistent HTTP/1.1 connection per client instance
        # (what every production S3 SDK's pooled transport does) — the
        # wire snapshot reader issues ~10 GETs per executor task, and
        # per-request urlopen paid a fresh TCP (+TLS for the secure
        # endpoint) handshake for each. Not thread-safe; one client per
        # task/thread, which is how every call site already works.
        self._conn: http.client.HTTPConnection | None = None

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            except Exception:  # noqa: BLE001 — best-effort hygiene
                pass
            self._conn = None

    def _connect(self) -> http.client.HTTPConnection:
        netloc = urllib.parse.urlsplit(self.endpoint).netloc
        if self._ssl_ctx is not None:
            return http.client.HTTPSConnection(
                netloc, context=self._ssl_ctx, timeout=30
            )
        return http.client.HTTPConnection(netloc, timeout=30)

    def _url(self, bucket: str, key: str = "", query: dict | None = None) -> str:
        path = f"/{urllib.parse.quote(bucket)}"
        if key:
            path += f"/{urllib.parse.quote(key)}"
        if query:
            path += "?" + urllib.parse.urlencode(query)
        return self.endpoint + path

    def _req(
        self,
        method: str,
        url: str,
        data: bytes | None = None,
        headers: dict | None = None,
    ):
        headers = dict(headers or {})
        if self._creds is not None:
            from conduit_spark.functions import sigv4

            headers = sigv4.sign(
                method, url, headers, data or b"",
                access_key=self._creds[0], secret_key=self._creds[1],
                region=self._region, service="s3",
                session_token=self._session_token,
            )
        u = urllib.parse.urlsplit(url)
        path = u.path + (f"?{u.query}" if u.query else "")
        resp = None
        for attempt in (0, 1):
            if self._conn is None:
                self._conn = self._connect()
            try:
                self._conn.request(method, path, body=data, headers=headers)
                resp = self._conn.getresponse()
                break
            except (http.client.HTTPException, ConnectionError, OSError):
                # stale keep-alive socket (server closed between
                # requests) — reconnect ONCE; a second failure is real
                self.close()
                if attempt:
                    raise
        if resp.status >= 400:
            body = resp.read()  # drain so the connection stays reusable
            raise urllib.error.HTTPError(
                url, resp.status, resp.reason, resp.headers, io.BytesIO(body)
            )
        return resp

    def create_bucket(self, bucket: str) -> None:
        self._req("PUT", self._url(bucket)).read()

    def put_object(
        self, bucket: str, key: str, data: bytes,
        content_type: str = "binary/octet-stream",
    ) -> str:
        r = self._req(
            "PUT", self._url(bucket, key), data,
            {"Content-Type": content_type},
        )
        r.read()
        return r.headers.get("ETag", "").strip('"')

    def get_object(
        self, bucket: str, key: str, byte_range: tuple[int, int] | None = None
    ) -> bytes:
        headers = {}
        if byte_range is not None:
            headers["Range"] = f"bytes={byte_range[0]}-{byte_range[1]}"
        return self._req("GET", self._url(bucket, key), headers=headers).read()

    def head_object(self, bucket: str, key: str) -> dict:
        r = self._req("HEAD", self._url(bucket, key))
        r.read()
        return {
            "etag": r.headers.get("ETag", "").strip('"'),
            "size": int(r.headers.get("Content-Length", 0)),
            "content_type": r.headers.get("Content-Type"),
            "last_modified": r.headers.get("Last-Modified"),
        }

    def delete_object(self, bucket: str, key: str) -> None:
        self._req("DELETE", self._url(bucket, key)).read()

    def list_objects(
        self, bucket: str, prefix: str = "", *, page_size: int = 1000,
        start_after: str = "",
    ) -> list[dict]:
        """Full paginated ListObjectsV2 walk (every page requested with
        ``list-type=2``; continuation tokens chained until
        ``IsTruncated`` is false)."""
        out: list[dict] = []
        token = None
        while True:
            q = {"list-type": "2", "prefix": prefix, "max-keys": str(page_size)}
            if token:
                q["continuation-token"] = token
            elif start_after:
                q["start-after"] = start_after
            body = self._req("GET", self._url(bucket, query=q)).read()
            root = ET.fromstring(body)  # noqa: S314 — our own test server

            def f(el, tag):
                return el.find(f"{{{_NS}}}{tag}")

            for c in root.findall(f"{{{_NS}}}Contents"):
                out.append(
                    {
                        "key": f(c, "Key").text or "",
                        "size": int(f(c, "Size").text),
                        "etag": (f(c, "ETag").text or "").strip('"'),
                        "last_modified": f(c, "LastModified").text,
                    }
                )
            if (f(root, "IsTruncated").text or "false") != "true":
                return out
            token = f(root, "NextContinuationToken").text

    # -- multipart ----------------------------------------------------------

    def multipart_upload(
        self, bucket: str, key: str, chunks: list[bytes]
    ) -> str:
        body = self._req(
            "POST", self._url(bucket, key, {"uploads": ""})
        ).read()
        uid = ET.fromstring(body).find(f"{{{_NS}}}UploadId").text  # noqa: S314
        for i, chunk in enumerate(chunks, start=1):
            self._req(
                "PUT",
                self._url(bucket, key, {"partNumber": str(i), "uploadId": uid}),
                chunk,
            ).read()
        done = self._req(
            "POST", self._url(bucket, key, {"uploadId": uid}), b"<Complete/>"
        ).read()
        return (
            ET.fromstring(done).find(f"{{{_NS}}}ETag").text or ""  # noqa: S314
        ).strip('"')
