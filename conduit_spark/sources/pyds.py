"""Structured-Streaming sources for the wire transports (Python
DataSource API, Spark 4).

The jar-free ``transport: wire`` paths were batch/snapshot-only; these
DataSource implementations make them REAL streaming sources — offsets
tracked by the engine's checkpoint mechanism, micro-batches planned
per partition, reads executed on executors:

- ``conduit-kafka-wire`` — per-topic-partition offset ranges, exactly
  the JVM kafka source's offset model (``{"0": nextOffset, ...}``):
  ``latestOffset`` asks the broker's ListOffsets, ``partitions`` plans
  one InputPartition per topic-partition with a bounded range,
  ``read`` Fetches that range over the partition's own connection.
- ``conduit-s3-wire`` — LastModified watermark offsets
  (``{"since": ts}``): each micro-batch is one CDC polling cycle
  (ListObjects diff), changed objects fan out size-balanced across
  input partitions, bytes move executor-side with Range chunking.
  Boundary semantics: a batch covers ``since < LastModified <= until``.
  Against real S3 (1-second LastModified granularity) an object
  written in the same second as ``until`` but after the listing can be
  skipped permanently — the reference's polling source shares this
  window; run with a prefix layout that appends, or accept
  second-granularity lag (MiniS3's monotonic mtimes make the tests
  exact).

Both recover from a checkpoint by construction: offsets are plain
JSON dicts the streaming engine persists/replays. Kafka replay is
exactly deterministic (``read`` is a pure function of the offset
range — the log is immutable). S3 replay is AT-LEAST-ONCE with
read-latest semantics: ``partitions`` re-lists the bucket on recovery,
so an object overwritten or deleted between the original attempt and
the replay delivers its newest state (or drops out) rather than the
version the failed batch saw — the same property as the reference's
polling source, which also holds no snapshot of the bucket. Sinks
needing exact replay should key on (key, etag) idempotently. Register
once per session with :func:`register` (idempotent).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp long"
)
S3_WIRE_SCHEMA = (
    "key string, value binary, size long, etag string, last_modified string"
)


@dataclasses.dataclass
class _KafkaRange(InputPartition):
    topic: str
    partition: int
    start: int
    end: int


class KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._servers = str(options.get("servers", ""))
        topic = str(options.get("topics", options.get("topic", "")))
        self._topics = [t.strip() for t in topic.split(",") if t.strip()]
        if not self._servers or not self._topics:
            raise ValueError("conduit-kafka-wire needs servers and topic(s)")
        self._server = self._servers.split(",")[0].strip()
        # startingOffsets: earliest (default) | latest — same contract
        # as the JVM kafka source; only affects the FIRST batch (the
        # checkpoint owns offsets afterwards)
        start = str(options.get("startingoffsets",
                                options.get("startingOffsets", "earliest")))
        if start.lower() not in ("earliest", "latest"):
            raise ValueError(
                f"startingOffsets must be earliest|latest, got {start!r}"
            )
        self._start_latest = start.lower() == "latest"
        # groupId: consumer-group mode (the reference's kafka source is
        # a consumer-group source). The FIRST batch starts from the
        # group's committed offsets (falling back to startingOffsets
        # where none exist) and every completed batch commits back via
        # OffsetCommit under a real JoinGroup/SyncGroup membership —
        # so a second run sharing the group id resumes after the last
        # commit even with a fresh checkpoint.
        self._group_id = str(
            options.get("groupid", options.get("groupId", ""))
        ) or None
        # SASL (reference saslMechanism/saslUsername/saslPassword)
        su = options.get("saslusername", options.get("saslUsername"))
        sp = options.get("saslpassword", options.get("saslPassword"))
        self._sasl = (
            {
                "mechanism": str(
                    options.get("saslmechanism",
                                options.get("saslMechanism",
                                            "SCRAM-SHA-256"))
                ),
                "username": str(su),
                "password": str(sp),
            }
            if su and sp is not None
            else None
        )
        tls_on = str(
            options.get("tls.enabled", options.get("tls.enabled".lower(), ""))
        ).lower() in ("1", "true", "yes")
        tls_ca = options.get("tls.cacert", options.get("tls.caCert"))
        self._tls = (
            {"tls": True, "tls_ca": str(tls_ca) if tls_ca else None}
            if (tls_on or tls_ca)
            else {}
        )
        import uuid

        self._member_id = f"conduit-spark-{uuid.uuid4().hex[:12]}"

    def _client(self):
        from conduit_spark.functions.minikafka import MiniKafkaClient

        c = MiniKafkaClient(self._server, sasl=self._sasl, **self._tls)
        # ride the highest mutual Produce/Fetch revisions (KIP-482
        # flexible against this repo's broker), like franz-go does on
        # every fresh connection
        c.negotiate_versions()
        return c

    def _offsets(self, earliest: bool) -> dict:
        # offsets keyed "topic:partition" — the multi-topic analog of
        # the JVM source's per-topic-partition offset map
        from conduit_spark.functions.minikafka import EARLIEST, LATEST

        out: dict = {}
        with self._client() as c:
            md = c.metadata(self._topics)
            for t in self._topics:
                parts = [
                    p["partition"]
                    for p in md["topics"].get(t, {"partitions": []})[
                        "partitions"
                    ]
                ]
                for p in parts:
                    out[f"{t}:{p}"] = c.list_offsets(
                        t, p, EARLIEST if earliest else LATEST
                    )
        return out

    def initialOffset(self) -> dict:  # noqa: N802 — DataSource API
        fallback = self._offsets(earliest=not self._start_latest)
        if self._group_id is None:
            return fallback
        parts = []
        for key in fallback:
            topic, _, p = key.rpartition(":")
            parts.append((topic or self._topics[0], int(p)))
        with self._client() as c:
            committed = c.offset_fetch(self._group_id, parts)
        return {
            f"{t}:{p}": (
                committed[(t, p)]
                if committed.get((t, p), -1) >= 0
                else fallback[f"{t}:{p}"]
            )
            for t, p in parts
        }

    def latestOffset(self) -> dict:  # noqa: N802
        return self._offsets(earliest=False)

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        out = []
        for key, hi in end.items():
            topic, _, p = key.rpartition(":")
            if not topic:  # pre-multi-topic checkpoint: bare partition
                topic = self._topics[0]
            lo = int(start.get(key, 0))
            if int(hi) > lo:
                out.append(_KafkaRange(topic, int(p), lo, int(hi)))
        # the engine requires ≥1 partition per batch; an empty batch
        # plans one degenerate range that reads nothing
        return out or [_KafkaRange(self._topics[0], 0, 0, 0)]

    def read(self, part: _KafkaRange) -> Iterator[tuple]:
        if part.end <= part.start:
            return
        with self._client() as c:
            off = part.start
            while off < part.end:
                recs, _hwm = c.fetch(part.topic, part.partition, off)
                if not recs:
                    break
                for r in recs:
                    if r["offset"] >= part.end:
                        return
                    yield (
                        r["key"],
                        r["value"],
                        part.topic,
                        part.partition,
                        r["offset"],
                        r["timestamp"],
                    )
                off = recs[-1]["offset"] + 1

    def commit(self, end: dict) -> None:
        # checkpoint owns in-run progress; with a groupId the batch's
        # end offsets ALSO commit to the group under a real membership
        # (join → sync → commit with the generation, so a stale
        # generation after a rebalance refuses, exactly like a real
        # consumer). Without one, broker log retention is the policy.
        # NOTE Spark invokes commit(N) lazily when batch N+1 starts,
        # so a run's FINAL batch is committed by
        # :func:`commit_group_from_checkpoint` after termination (the
        # pipeline runtime calls it; see run_streaming).
        if self._group_id is None or not end:
            return
        offsets = {}
        for key, off in end.items():
            topic, _, p = key.rpartition(":")
            offsets[(topic or self._topics[0], int(p))] = int(off)
        with self._client() as c:
            g = c.join_group(self._group_id, member_id=self._member_id)
            c.sync_group(
                self._group_id, g["generation"], g["member_id"],
                assignments={g["member_id"]: b""} if g["leader"] == g["member_id"] else None,
            )
            c.offset_commit(
                self._group_id, offsets,
                generation=g["generation"], member_id=g["member_id"],
            )


class KafkaWireDataSource(DataSource):
    """``spark.readStream.format("conduit-kafka-wire")`` — see module
    docstring."""

    @classmethod
    def name(cls) -> str:
        return "conduit-kafka-wire"

    def schema(self) -> str:
        return KAFKA_WIRE_SCHEMA

    def streamReader(self, schema: StructType):  # noqa: N802
        return KafkaWireStreamReader(self.options)


@dataclasses.dataclass
class _S3Slice(InputPartition):
    objs: list  # [(key, size, etag, last_modified), ...]


class S3WireStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._endpoint = str(options.get("endpoint", options.get("aws.url", "")))
        self._bucket = str(options.get("bucket", options.get("aws.bucket", "")))
        if not self._endpoint or not self._bucket:
            raise ValueError("conduit-s3-wire needs endpoint and bucket")
        self._prefix = str(options.get("prefix", ""))
        # SigV4 credentials (reference aws.* setting names) — the
        # streaming reader signs like the batch wire client does
        ak = options.get("access_key", options.get("aws.accesskeyid"))
        sk = options.get("secret_key", options.get("aws.secretaccesskey"))
        self._creds = (
            {"access_key": str(ak), "secret_key": str(sk)} if ak and sk else None
        )
        if self._creds and options.get("region", options.get("aws.region")):
            self._creds["region"] = str(
                options.get("region", options.get("aws.region"))
            )
        self._chunk = int(options.get("chunk_bytes", 8 * 1024 * 1024))
        self._n_parts = int(options.get("fetch_parallelism", 8))
        # startingPosition: earliest (default, snapshot-then-tail) |
        # latest (skip the existing backlog; only objects written
        # after attach flow) — the kafka startingOffsets analog
        start = str(options.get("startingposition",
                                options.get("startingPosition", "earliest")))
        if start.lower() not in ("earliest", "latest"):
            raise ValueError(
                f"startingPosition must be earliest|latest, got {start!r}"
            )
        self._start_latest = start.lower() == "latest"

    _list_cache: tuple[str, list] | None = None

    def _list(self) -> list[dict]:
        from conduit_spark.functions.minis3 import MiniS3Client

        return MiniS3Client(
            self._endpoint, **(self._creds or {})
        ).list_objects(self._bucket, self._prefix)

    def _list_cached(self, until: str) -> list[dict]:
        """One listing per micro-batch: latestOffset() caches its
        listing keyed by the offset it returned; partitions() for that
        same offset reuses it instead of re-listing the bucket (halves
        per-trigger control-plane requests; also keeps planning
        consistent with the offsets just computed)."""
        if self._list_cache is not None and self._list_cache[0] == until:
            return self._list_cache[1]
        objs = self._list()
        self._list_cache = (until, objs)
        return objs

    def initialOffset(self) -> dict:  # noqa: N802
        if self._start_latest:
            return self.latestOffset()
        return {"since": ""}

    def latestOffset(self) -> dict:  # noqa: N802
        objs = self._list()
        lm = [o["last_modified"] for o in objs if o["last_modified"]]
        until = max(lm, default="")
        self._list_cache = (until, objs)
        return {"since": until}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from conduit_spark.sources.s3_wire import greedy_pack

        since, until = start.get("since", ""), end.get("since", "")
        changed = [
            o
            for o in self._list_cached(until)
            if o["last_modified"]
            and (not since or o["last_modified"] > since)
            and o["last_modified"] <= until
        ]
        if not changed:
            return [_S3Slice([])]
        return [
            _S3Slice(
                [(o["key"], o["size"], o["etag"], o["last_modified"]) for o in g]
            )
            for g in greedy_pack(changed, self._n_parts)
        ]

    def read(self, part: _S3Slice) -> Iterator[tuple]:
        if not part.objs:
            return
        from conduit_spark.functions.minis3 import MiniS3Client
        from conduit_spark.sources.s3_wire import range_get

        c = MiniS3Client(self._endpoint, **(self._creds or {}))
        for key, size, etag, lm in part.objs:
            data = range_get(c, self._bucket, key, int(size), self._chunk)
            yield (key, data, len(data), etag, lm)

    def commit(self, end: dict) -> None:
        pass


class S3WireDataSource(DataSource):
    """``spark.readStream.format("conduit-s3-wire")`` — see module
    docstring."""

    @classmethod
    def name(cls) -> str:
        return "conduit-s3-wire"

    def schema(self) -> str:
        return S3_WIRE_SCHEMA

    def streamReader(self, schema: StructType):  # noqa: N802
        return S3WireStreamReader(self.options)


def register(spark) -> None:
    """Register both wire data sources on a session. Registration is a
    name→class map update on the session, so re-registering is cheap
    and safe — no identity cache (an ``id(spark)`` key would go stale
    when a GC'd session's address is reused by a new one, silently
    skipping registration)."""
    spark.dataSource.register(KafkaWireDataSource)
    spark.dataSource.register(S3WireDataSource)


def commit_group_from_checkpoint(
    servers: str, group_id: str, checkpoint_dir: str,
    sasl: dict | None = None,
) -> dict | None:
    """Commit the LAST COMPLETED batch's end offsets from a Structured
    Streaming checkpoint to a consumer group.

    Spark calls ``DataSourceStreamReader.commit(N)`` only when batch
    N+1 starts, so a run's final batch never reaches the group through
    the reader. The checkpoint itself is the source of truth for what
    completed: ``offsets/N`` holds the planned end offsets and
    ``commits/N`` exists iff batch N finished (sink included). Reading
    those and committing is therefore exactly
    committed-means-delivered — never the log end, which would
    over-commit records produced after the final plan. Called by the
    pipeline runtime after query termination; safe to call any time.

    Returns the committed ``{"topic:partition": offset}`` map, or
    ``None`` when no batch has completed."""
    import json
    import os

    commits_dir = os.path.join(checkpoint_dir, "commits")
    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    try:
        done = sorted(
            int(f) for f in os.listdir(commits_dir) if f.isdigit()
        )
    except OSError:
        done = []
    if not done:
        return None
    try:
        lines = open(
            os.path.join(offsets_dir, str(done[-1])), encoding="utf-8"
        ).read().splitlines()
    except OSError:
        return None
    # offsets file: "v1", then a metadata JSON line, then one offset
    # JSON line per source — pick the kafka-wire-shaped one
    end = None
    for line in lines[1:]:
        try:
            doc = json.loads(line)
        except ValueError:
            continue
        if isinstance(doc, dict) and doc and all(
            isinstance(k, str) and ":" in k and str(v).lstrip("-").isdigit()
            for k, v in doc.items()
        ):
            end = doc
            break
    if end is None:
        return None
    from conduit_spark.functions.minikafka import MiniKafkaClient

    offsets = {}
    for key, off in end.items():
        topic, _, p = key.rpartition(":")
        offsets[(topic, int(p))] = int(off)
    server = str(servers).split(",")[0].strip()
    with MiniKafkaClient(server, sasl=sasl) as c:
        g = c.join_group(group_id)
        c.sync_group(
            group_id, g["generation"], g["member_id"],
            assignments={g["member_id"]: b""},
        )
        c.offset_commit(
            group_id, offsets,
            generation=g["generation"], member_id=g["member_id"],
        )
    return end
