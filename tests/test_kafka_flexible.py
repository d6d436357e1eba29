"""KIP-482 flexible/compact protocol revisions on the jar-free kafka
wire path: Produce v3-v9 and Fetch v4-v12 (VERDICT r9 item 5 — the one
remaining protocol-surface delta vs the reference's franz-go client,
which negotiates flexible encodings at startup; reference
pkg/plugin/connector/builtin/registry.go pulls conduit-connector-kafka).

The broker advertises contiguous ranges (Produce 3-9, Fetch 4-12) and
every advertised revision is exercised here in a full produce→fetch
round-trip matrix, so there is no version a client could legally pick
that the broker can't serve. v9/v12 use request header v2 / response
header v1 (TAG_BUFFER after client_id / correlation_id), compact
strings/bytes/arrays, and tagged-field skip.
"""

from __future__ import annotations

import pytest

from conduit_spark.functions.minikafka import (
    API_FETCH,
    API_PRODUCE,
    MiniKafkaBroker,
    MiniKafkaClient,
    _Reader,
    _w_compact_bytes,
    _w_compact_str,
    _w_uvarint,
)

RECORDS = [
    {"key": b"k1", "value": b"v-one", "timestamp": 111},
    {"key": None, "value": b"v-two", "timestamp": 222},
    {"key": b"k3", "value": None, "timestamp": 333},
]


def _roundtrip(produce_v: int, fetch_v: int) -> None:
    with MiniKafkaBroker() as b:
        b.create_topic("flex", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            base = c.produce("flex", 0, RECORDS, version=produce_v)
            assert base == 0
            recs, hwm = c.fetch("flex", 0, 0, version=fetch_v)
        assert hwm == 3
        got = [(r["key"], r["value"], r["timestamp"]) for r in recs]
        want = [(r["key"], r["value"], r["timestamp"]) for r in RECORDS]
        assert got == want


@pytest.mark.parametrize("produce_v", [3, 5, 8, 9])
@pytest.mark.parametrize("fetch_v", [4, 5, 7, 9, 11, 12])
def test_produce_fetch_version_matrix(produce_v, fetch_v):
    """Every schema-evolution step in both APIs round-trips against
    every other: the record bytes are version-independent, only the
    framing changes."""
    _roundtrip(produce_v, fetch_v)


def test_flexible_pair_end_to_end():
    """The headline modern pair: Produce v9 + Fetch v12, compact
    everything, 200 records with compression."""
    with MiniKafkaBroker() as b:
        b.create_topic("flex9", partitions=1)
        recs = [
            {"key": f"k{i}".encode(), "value": (f"v{i}" * 9).encode(),
             "timestamp": i}
            for i in range(200)
        ]
        with MiniKafkaClient(b.bootstrap) as c:
            c.produce("flex9", 0, recs, version=9, compression="gzip")
            out, hwm = c.fetch("flex9", 0, 0, version=12)
        assert hwm == 200
        assert [(r["key"], r["value"]) for r in out] == [
            (r["key"], r["value"]) for r in recs
        ]


def test_acks_zero_flexible_sends_no_response():
    """acks=0 at v9: fire-and-forget still means NO response frame —
    a subsequent flexible fetch on the same connection sees the data
    and correlates correctly (nothing stuck in the socket)."""
    with MiniKafkaBroker() as b:
        b.create_topic("flex0", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            assert c.produce("flex0", 0, RECORDS, acks=0, version=9) == -1
            recs, hwm = c.fetch("flex0", 0, 0, version=12)
        assert hwm == 3 and len(recs) == 3


def test_negotiate_versions_picks_flexible_pair():
    """ApiVersions v0 → the client pins (Produce 9, Fetch 12) against
    this broker, and the default produce()/fetch() calls ride them."""
    with MiniKafkaBroker() as b:
        b.create_topic("nego", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            table = c.negotiate_versions()
            assert table[API_PRODUCE] == (3, 9)
            assert table[API_FETCH] == (4, 12)
            assert c._produce_version == 9 and c._fetch_version == 12
            c.produce("nego", 0, RECORDS)  # rides v9
            recs, _ = c.fetch("nego", 0, 0)  # rides v12
        assert len(recs) == 3


def test_negotiate_versions_floor_against_old_broker():
    """A broker whose table caps below the flexible revisions keeps the
    client at its non-flexible floor (never below v3/v4, never above
    the broker's max)."""
    c = MiniKafkaClient.__new__(MiniKafkaClient)
    c._produce_version, c._fetch_version = 3, 4
    c.api_versions = lambda: {API_PRODUCE: (0, 7), API_FETCH: (0, 6)}
    MiniKafkaClient.negotiate_versions(c)
    assert c._produce_version == 7 and c._fetch_version == 6
    c.api_versions = lambda: {API_PRODUCE: (0, 2), API_FETCH: (0, 3)}
    MiniKafkaClient.negotiate_versions(c)
    assert c._produce_version == 3 and c._fetch_version == 4
    c.api_versions = lambda: {API_PRODUCE: (0, 99), API_FETCH: (0, 99)}
    MiniKafkaClient.negotiate_versions(c)
    assert c._produce_version == 9 and c._fetch_version == 12


def test_tagged_fields_are_skipped():
    """KIP-482 forward compatibility: a request header v2 carrying
    UNKNOWN tagged fields must be served, not choke the parser (the
    whole point of tagged fields). Hand-frame a Produce v9 with a
    non-empty header TAG_BUFFER and dispatch it."""
    import struct

    from conduit_spark.functions.kafka_wire import encode_record_batch

    with MiniKafkaBroker() as b:
        b.create_topic("tagged", partitions=1)
        record_set = encode_record_batch(
            [{"key": b"k", "value": b"v", "timestamp": 7}]
        )
        header_tags = _w_uvarint(1) + _w_uvarint(17) + _w_uvarint(3) + b"abc"
        req = (
            struct.pack(">hhi", 0, 9, 42)  # Produce v9, corr 42
            + b"\x00\x05tagme"  # legacy nullable client_id
            + header_tags
            + _w_compact_str(None)  # transactional_id
            + struct.pack(">hi", -1, 30000)
            + _w_uvarint(2) + _w_compact_str("tagged")
            + _w_uvarint(2) + struct.pack(">i", 0)
            + _w_compact_bytes(record_set)
            + _w_uvarint(1) + _w_uvarint(9) + _w_uvarint(1) + b"z"  # partition tags
            + b"\x00"  # topic tags
            + b"\x00"  # body tags
        )
        resp = b._dispatch(req)
        r = _Reader(resp)
        assert r.i32() == 42  # correlation id
        assert r.tags() == {}  # response header v1
        assert r.uvarint() - 1 == 1  # one topic in the response
        # and the record actually landed
        with MiniKafkaClient(b.bootstrap) as c:
            recs, _ = c.fetch("tagged", 0, 0, version=12)
        assert recs[0]["value"] == b"v"


def test_uvarint_roundtrip():
    for n in (0, 1, 127, 128, 300, 16383, 16384, 2**21, 2**28, 2**35 - 1):
        r = _Reader(_w_uvarint(n))
        assert r.uvarint() == n
    for s in (None, "", "a", "x" * 200, "úñí"):
        r = _Reader(_w_compact_str(s))
        assert r.compact_string() == s
    for v in (None, b"", b"\x00\xff" * 99):
        r = _Reader(_w_compact_bytes(v))
        assert r.compact_bytes() == v


def test_production_paths_negotiate_flexible(spark):
    """The wire sink and source negotiate at startup like franz-go:
    against this broker every produced/fetched byte travels the v9/v12
    flexible revisions, asserted via the broker's request log."""
    import json

    from conduit_spark.pipeline import registry
    from conduit_spark.pipeline.registry import kafka_wire_source_df

    with MiniKafkaBroker() as b:
        b.create_topic("flexpipe", partitions=2)
        settings = {
            "servers": b.bootstrap, "topic": "flexpipe",
            "transport": "wire",
        }
        src = spark.createDataFrame(
            [(f"u{i}", json.dumps({"n": i})) for i in range(20)],
            "key_json string, payload_after_json string",
        ).selectExpr(
            "key_json",
            "cast(null as binary) as key_raw",
            "payload_after_json",
            "cast(null as binary) as payload_after_raw",
        )
        registry.write_destination(src, "builtin:kafka", settings)
        df = kafka_wire_source_df(spark, b.bootstrap, "flexpipe")
        assert df.count() == 20
        produce_vs = {v for k, v, _, _ in b.request_log if k == API_PRODUCE}
        fetch_vs = {v for k, v, _, _ in b.request_log if k == API_FETCH}
        assert produce_vs == {9}, produce_vs
        assert fetch_vs == {12}, fetch_vs


# --- property tests (hypothesis) --------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=0, max_value=2**42))
def test_uvarint_property(n):
    r = _Reader(_w_uvarint(n) + b"\xaa")  # trailing byte must be untouched
    assert r.uvarint() == n
    assert r.buf[r.at :] == b"\xaa"


@settings(max_examples=200, deadline=None)
@given(s=st.one_of(st.none(), st.text(max_size=80)))
def test_compact_string_property(s):
    r = _Reader(_w_compact_str(s))
    assert r.compact_string() == s


@settings(max_examples=100, deadline=None)
@given(
    tags=st.dictionaries(
        st.integers(min_value=0, max_value=2**20),
        st.binary(max_size=32),
        max_size=6,
    )
)
def test_tag_buffer_round_trip(tags):
    buf = _w_uvarint(len(tags))
    for tag in sorted(tags):
        buf += _w_uvarint(tag) + _w_uvarint(len(tags[tag])) + tags[tag]
    r = _Reader(buf + b"\x99")
    assert r.tags() == tags
    assert r.buf[r.at :] == b"\x99"


@settings(max_examples=25, deadline=None)
@given(
    records=st.lists(
        st.fixed_dictionaries(
            {
                "key": st.one_of(st.none(), st.binary(max_size=24)),
                "value": st.one_of(st.none(), st.binary(max_size=48)),
                "timestamp": st.integers(min_value=0, max_value=2**40),
            }
        ),
        min_size=1,
        max_size=8,
    ),
    produce_v=st.sampled_from([3, 4, 5, 6, 7, 8, 9]),
    fetch_v=st.sampled_from([4, 5, 6, 7, 8, 9, 10, 11, 12]),
)
def test_any_version_pair_round_trips(records, produce_v, fetch_v):
    """EVERY advertised (produce, fetch) revision pair round-trips any
    record shape through the broker's log — the fuzz closure over the
    version matrix (the parametrized matrix test pins a sample; this
    pins the space)."""
    with MiniKafkaBroker() as b:
        b.create_topic("prop", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            c.produce("prop", 0, records, version=produce_v)
            got, hwm = c.fetch("prop", 0, 0, version=fetch_v)
    assert hwm == len(records)
    assert [
        (r["key"], r["value"], r["timestamp"]) for r in got
    ] == [
        (
            bytes(r["key"]) if r["key"] is not None else None,
            bytes(r["value"]) if r["value"] is not None else None,
            r["timestamp"],
        )
        for r in records
    ]


def test_flexible_error_paths():
    """Error codes travel the flexible framings correctly: produce to
    an out-of-range partition raises with UNKNOWN_TOPIC_OR_PARTITION
    semantics at v9, fetch past the high watermark returns empty (not
    an exception) at v12, and the connection stays usable after both."""
    with MiniKafkaBroker() as b:
        b.create_topic("errs", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            with pytest.raises(RuntimeError, match="produce error 3"):
                c.produce("errs", 7, RECORDS, version=9)  # no partition 7
            c.produce("errs", 0, RECORDS, version=9)
            # beyond-hwm fetch: OFFSET_OUT_OF_RANGE -> empty, hwm still
            # reported through the flexible framing
            recs, hwm = c.fetch("errs", 0, 99, version=12)
            assert recs == [] and hwm == 3
            recs, hwm = c.fetch("errs", 0, 0, version=12)  # still usable
            assert len(recs) == 3


def test_negotiate_versions_rejects_disjoint_ranges():
    """ADVICE r10: a future broker whose MINIMUM Produce/Fetch revision
    exceeds what this client speaks must fail AT NEGOTIATION with a
    clear error, not silently pick an unsupported version and die
    mid-request."""
    c = MiniKafkaClient.__new__(MiniKafkaClient)
    c._produce_version, c._fetch_version = 3, 4
    c.api_versions = lambda: {API_PRODUCE: (12, 15), API_FETCH: (4, 12)}
    with pytest.raises(RuntimeError, match="no mutually supported Produce"):
        MiniKafkaClient.negotiate_versions(c)
    c.api_versions = lambda: {API_PRODUCE: (3, 9), API_FETCH: (14, 17)}
    with pytest.raises(RuntimeError, match="no mutually supported Fetch"):
        MiniKafkaClient.negotiate_versions(c)


def test_metadata_version_matrix():
    """Control-plane flexibility (VERDICT r10 item 6): Metadata v1-v9
    must answer every revision with the same topology — v2 adds
    cluster_id, v3 throttle, v4 allow_auto_topic_creation, v5
    offline_replicas, v7 leader_epoch, v8 authorized operations, v9
    the KIP-482 compact framing. One broker, nine requests, identical
    parsed content."""
    with MiniKafkaBroker(default_partitions=3) as b:
        b.create_topic("ctrl", partitions=4)
        with MiniKafkaClient(b.bootstrap) as c:
            for v in range(1, 10):
                md = c.metadata(["ctrl"], version=v)
                assert md["controller"] == 0, f"v{v}"
                assert md["brokers"][0]["port"] == b.port, f"v{v}"
                t = md["topics"]["ctrl"]
                assert t["error"] == 0 and len(t["partitions"]) == 4, f"v{v}"
                assert all(p["leader"] == 0 and p["isr"] == [0]
                           for p in t["partitions"]), f"v{v}"


def test_list_offsets_version_matrix():
    """ListOffsets v1-v6 must agree on earliest/latest at every
    revision (v2 adds isolation_level+throttle, v4 leader epochs, v6
    compact framing)."""
    from conduit_spark.functions.minikafka import EARLIEST, LATEST

    with MiniKafkaBroker(default_partitions=1) as b:
        b.create_topic("offs", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            c.produce("offs", 0, RECORDS)
            for v in range(1, 7):
                assert c.list_offsets("offs", 0, EARLIEST, version=v) == 0, f"v{v}"
                assert c.list_offsets("offs", 0, LATEST, version=v) == 3, f"v{v}"


def test_negotiate_pins_control_plane_and_rides_it():
    """negotiate_versions() now pins Metadata/ListOffsets alongside
    Produce/Fetch; the default calls ride the negotiated flexible
    revisions end-to-end against this broker."""
    from conduit_spark.functions.minikafka import (
        API_LIST_OFFSETS,
        API_METADATA,
        LATEST,
    )

    with MiniKafkaBroker(default_partitions=2) as b:
        b.create_topic("nego2", partitions=2)
        with MiniKafkaClient(b.bootstrap) as c:
            table = c.negotiate_versions()
            assert table[API_METADATA] == (1, 9)
            assert table[API_LIST_OFFSETS] == (1, 6)
            assert c._metadata_version == 9 and c._listoffsets_version == 6
            md = c.metadata(["nego2"])  # rides v9
            assert len(md["topics"]["nego2"]["partitions"]) == 2
            c.produce("nego2", 1, RECORDS)
            assert c.list_offsets("nego2", 1, LATEST) == 3  # rides v6
            # the broker's request log shows the negotiated revisions
            assert (API_METADATA, 9) in {(k, v) for k, v, _, _ in b.request_log}
            assert (API_LIST_OFFSETS, 6) in {
                (k, v) for k, v, _, _ in b.request_log
            }


def test_negotiate_rejects_disjoint_control_plane_ranges():
    """Same lo-bound guard as the data plane: a broker whose minimum
    Metadata/ListOffsets revision exceeds this client fails at
    negotiation with a clear error."""
    from conduit_spark.functions.minikafka import API_LIST_OFFSETS, API_METADATA

    base = {API_PRODUCE: (3, 9), API_FETCH: (4, 12)}
    c = MiniKafkaClient.__new__(MiniKafkaClient)
    c._produce_version, c._fetch_version = 3, 4
    c._metadata_version, c._listoffsets_version = 1, 1
    c.api_versions = lambda: {
        **base, API_METADATA: (12, 13), API_LIST_OFFSETS: (1, 6)}
    with pytest.raises(RuntimeError, match="no mutually supported Metadata"):
        MiniKafkaClient.negotiate_versions(c)
    c.api_versions = lambda: {
        **base, API_METADATA: (1, 9), API_LIST_OFFSETS: (8, 9)}
    with pytest.raises(RuntimeError, match="no mutually supported ListOffsets"):
        MiniKafkaClient.negotiate_versions(c)


def test_list_offsets_flexible_multi_topic():
    """A MULTI-topic flexible ListOffsets v6 request exercises the
    per-topic TAG_BUFFER positions the single-topic client path never
    hits (caught in round-11 self-review: the broker consumed the
    topic tags as the body tags, which misparses any request with
    more than one topic)."""
    import struct

    from conduit_spark.functions.minikafka import (
        _TAGS,
        API_LIST_OFFSETS,
        LATEST,
        _w_uvarint,
    )

    with MiniKafkaBroker(default_partitions=1) as b:
        b.create_topic("lo_a", partitions=1)
        b.create_topic("lo_b", partitions=1)
        with MiniKafkaClient(b.bootstrap) as c:
            c.produce("lo_a", 0, RECORDS)
            c.produce("lo_b", 0, RECORDS[:2])
            part = (
                struct.pack(">i", 0)      # partition_index
                + struct.pack(">i", -1)   # current_leader_epoch
                + struct.pack(">q", LATEST)
                + _TAGS
            )
            body = (
                struct.pack(">i", -1)     # replica_id
                + struct.pack(">b", 0)    # isolation_level
                + _w_uvarint(3)           # 2 topics (compact array)
                + _w_compact_str("lo_a") + _w_uvarint(2) + part + _TAGS
                + _w_compact_str("lo_b") + _w_uvarint(2) + part + _TAGS
                + _TAGS                   # request-body TAG_BUFFER
            )
            r = c._call(API_LIST_OFFSETS, 6, body, flexible=True)
            r.i32()  # throttle
            got = {}
            for _ in range(r.uvarint() - 1):
                name = r.compact_string()
                for _ in range(r.uvarint() - 1):
                    r.i32()  # partition
                    assert r.i16() == 0  # error
                    r.i64()  # timestamp
                    got[name] = r.i64()  # offset
                    r.i32()  # leader_epoch
                    r.tags()
                r.tags()
            assert got == {"lo_a": 3, "lo_b": 2}


_FUZZ_BROKER: list = []  # lazily-started shared broker for the fuzzes below


def _fuzz_broker() -> MiniKafkaBroker:
    if not _FUZZ_BROKER:
        _FUZZ_BROKER.append(MiniKafkaBroker(default_partitions=2).start())
    return _FUZZ_BROKER[0]


@pytest.fixture(scope="module", autouse=True)
def _stop_fuzz_broker():
    """ADVICE r11: the module-cached fuzz broker must not leak its
    listener socket/thread for the rest of the pytest session — stop
    it when this module's tests finish (other broker tests use
    context managers)."""
    yield
    while _FUZZ_BROKER:
        _FUZZ_BROKER.pop().close()


@settings(max_examples=25, deadline=None)
@given(
    names=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    version=st.integers(min_value=1, max_value=9),
)
def test_metadata_roundtrip_property(names, version):
    """Fuzz the Metadata request/response pair across every served
    revision with arbitrary topic-name sets: the parsed topology must
    name exactly the requested topics with the broker's partition
    count, regardless of name length/content or framing (flexible at
    v9). One shared broker (module-cached) so 25 examples do not pay
    25 broker startups; topics auto-create on first request."""
    with MiniKafkaClient(_fuzz_broker().bootstrap) as c:
        md = c.metadata([f"t{n}" for n in names], version=version)
        assert set(md["topics"]) == {f"t{n}" for n in names}
        for t in md["topics"].values():
            assert t["error"] == 0 and len(t["partitions"]) == 2


@settings(max_examples=25, deadline=None)
@given(version=st.integers(min_value=1, max_value=6),
       n_records=st.integers(min_value=1, max_value=5))
def test_list_offsets_roundtrip_property(version, n_records):
    """Fuzz ListOffsets across every served revision against live log
    state: earliest is always 0 and latest tracks the produced count
    (one shared broker; repeated examples may reuse a topic, so latest
    is monotone in the produced total)."""
    from conduit_spark.functions.minikafka import EARLIEST, LATEST

    b = _fuzz_broker()
    topic = f"fz{version}_{n_records}"
    b.create_topic(topic, partitions=1)
    with MiniKafkaClient(b.bootstrap) as c:
        c.produce(topic, 0, RECORDS[:1] * n_records)
        assert c.list_offsets(topic, 0, EARLIEST, version=version) == 0
        assert c.list_offsets(topic, 0, LATEST, version=version) >= n_records


# -- group-coordination plane (round-12): OffsetCommit v2-v8,
# OffsetFetch v1-v8, FindCoordinator v0-v4, JoinGroup v0-v6,
# Heartbeat v0-v4, LeaveGroup v0-v5, SyncGroup v0-v5 -----------------


def test_group_coordination_negotiates_flexible_tops():
    """negotiate_versions pins all seven group APIs to the broker's
    advertised tops — the flexible revisions (OffsetFetch at the
    KIP-709 multi-group v8, FindCoordinator at the KIP-699 batched
    v4)."""
    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            c.negotiate_versions()
            assert c._offsetcommit_version == 8
            assert c._offsetfetch_version == 8
            assert c._findcoordinator_version == 4
            assert c._joingroup_version == 6
            assert c._heartbeat_version == 4
            assert c._leavegroup_version == 5
            assert c._syncgroup_version == 5
            # full lifecycle at the negotiated (flexible) revisions —
            # the v6 join exercises the KIP-394 two-round member id
            j = c.join_group("gflex")
            assert j["generation"] >= 1 and j["member_id"]
            assert j["leader"] == j["member_id"]
            blob = c.sync_group(
                "gflex", j["generation"], j["member_id"],
                {j["member_id"]: b"assigned-parts"},
            )
            assert blob == b"assigned-parts"
            c.heartbeat("gflex", j["generation"], j["member_id"])
            c.offset_commit(
                "gflex", {("t", 0): 42},
                generation=j["generation"], member_id=j["member_id"],
            )
            assert c.offset_fetch("gflex", [("t", 0)]) == {("t", 0): 42}
            c.leave_group("gflex", j["member_id"])


def test_find_coordinator_version_matrix():
    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            for v in range(0, 5):
                node, host, port = c.find_coordinator("g", version=v)
                assert (node, port) == (b.node_id, b.port)


def test_join_group_version_matrix():
    """Every JoinGroup revision joins and leads its own group; v4+
    rides the KIP-394 reject-then-rejoin path transparently."""
    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            for v in range(0, 7):
                res = c.join_group(f"gj{v}", version=v)
                assert res["generation"] >= 1
                assert res["member_id"] in res["members"]
                assert res["leader"] == res["member_id"]
                assert res["protocol"] == "range"


def test_join_group_kip394_reject_is_on_the_wire():
    """At v4+ the broker's FIRST answer to an empty member_id must be
    MEMBER_ID_REQUIRED (79) carrying the assigned id — pinned at the
    frame level so the client-side retry can't mask a silent join."""
    import struct

    from conduit_spark.functions.minikafka import (
        API_JOIN_GROUP,
        ERR_MEMBER_ID_REQUIRED,
        _w_bytes,
        _w_str,
    )

    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            body = (
                _w_str("g394") + struct.pack(">i", 30000)
                + struct.pack(">i", 30000)  # rebalance_timeout (v1+)
                + _w_str("")  # member_id: empty -> reject
                + _w_str("consumer")
                + struct.pack(">i", 1) + _w_str("range") + _w_bytes(b"")
            )
            r = c._call(API_JOIN_GROUP, 4, body)
            r.i32()  # throttle
            assert r.i16() == ERR_MEMBER_ID_REQUIRED
            assert r.i32() == -1  # generation
            r.string()  # protocol_name
            r.string()  # leader
            assigned = r.string()
            assert assigned  # the id the client must re-join with
            assert r.i32() == 0  # members: empty
            # second round with the assigned id succeeds
            res = c.join_group("g394", member_id=assigned, version=4)
            assert res["member_id"] == assigned


def test_sync_heartbeat_leave_version_matrix():
    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            for v in range(0, 6):
                c._syncgroup_version = v
                gid = f"gs{v}"
                j = c.join_group(gid)
                blob = c.sync_group(
                    gid, j["generation"], j["member_id"],
                    {j["member_id"]: b"a" + bytes([v])},
                )
                assert blob == b"a" + bytes([v])
            for v in range(0, 5):
                c._heartbeat_version = v
                gid = f"gh{v}"
                j = c.join_group(gid)
                c.heartbeat(gid, j["generation"], j["member_id"])
                with pytest.raises(RuntimeError, match="heartbeat error"):
                    c.heartbeat(gid, j["generation"] + 5, j["member_id"])
            for v in range(0, 6):
                c._leavegroup_version = v
                gid = f"gl{v}"
                j = c.join_group(gid)
                c.leave_group(gid, j["member_id"])
                with pytest.raises(RuntimeError, match="leave_group"):
                    c.leave_group(gid, j["member_id"])  # already gone


def test_offset_commit_fetch_version_matrix():
    """Every OffsetCommit revision's commit is readable by every
    OffsetFetch revision — the stored offset is framing-independent."""
    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            for cv in range(2, 9):
                c._offsetcommit_version = cv
                c.offset_commit(f"goc{cv}", {("t", 0): 100 + cv})
                for fv in range(1, 9):
                    c._offsetfetch_version = fv
                    got = c.offset_fetch(f"goc{cv}", [("t", 0)])
                    assert got == {("t", 0): 100 + cv}, (cv, fv)


def test_offset_fetch_null_topics_returns_all_commits():
    """OffsetFetch v2+ with a NULL topics array returns every
    committed partition of the group (pinned at the frame level for
    both the non-flexible v2 and flexible v6 encodings)."""
    import struct

    from conduit_spark.functions.minikafka import API_OFFSET_FETCH, _w_str

    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            c.offset_commit("gall", {("ta", 0): 7, ("tb", 1): 9})
            # v2, topics = null (-1)
            r = c._call(
                API_OFFSET_FETCH, 2, _w_str("gall") + struct.pack(">i", -1)
            )
            got = {}
            for _ in range(r.i32()):
                t = r.string()
                for _ in range(r.i32()):
                    p = r.i32()
                    off = r.i64()
                    r.string()
                    assert r.i16() == 0
                    got[(t, p)] = off
            assert r.i16() == 0  # top-level error
            assert got == {("ta", 0): 7, ("tb", 1): 9}
            # v6 flexible, topics = null (compact 0)
            body = _w_compact_str("gall") + _w_uvarint(0) + b"\x00"
            r = c._call(API_OFFSET_FETCH, 6, body, flexible=True)
            r.i32()  # throttle
            got = {}
            for _ in range(r.uvarint() - 1):
                t = r.compact_string()
                for _ in range(r.uvarint() - 1):
                    p = r.i32()
                    off = r.i64()
                    r.i32()  # committed_leader_epoch
                    r.compact_string()
                    assert r.i16() == 0
                    r.tags()
                    got[(t, p)] = off
                r.tags()
            assert r.i16() == 0
            assert got == {("ta", 0): 7, ("tb", 1): 9}


@settings(max_examples=25, deadline=None)
@given(
    cv=st.integers(min_value=2, max_value=8),
    fv=st.integers(min_value=1, max_value=8),
    offs=st.dictionaries(
        st.tuples(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1, max_size=12,
            ),
            st.integers(min_value=0, max_value=3),
        ),
        st.integers(min_value=0, max_value=2**40),
        min_size=1, max_size=6,
    ),
)
def test_offset_commit_fetch_roundtrip_property(cv, fv, offs):
    """Fuzz commit/fetch across every served revision pair with
    arbitrary (topic, partition) -> offset maps: what is committed at
    ANY commit revision is read back exactly at ANY fetch revision
    (one shared broker; unique group per example input)."""
    b = _fuzz_broker()
    gid = f"gfz{cv}_{fv}_{abs(hash(tuple(sorted(offs)))) % 10**8}"
    with MiniKafkaClient(b.bootstrap) as c:
        c._offsetcommit_version = cv
        c._offsetfetch_version = fv
        offsets = {(f"t{t}", p): o for (t, p), o in offs.items()}
        c.offset_commit(gid, offsets)
        assert c.offset_fetch(gid, list(offsets)) == offsets


@settings(max_examples=20, deadline=None)
@given(
    jv=st.integers(min_value=0, max_value=6),
    sv=st.integers(min_value=0, max_value=5),
    hv=st.integers(min_value=0, max_value=4),
    lv=st.integers(min_value=0, max_value=5),
    blob=st.binary(max_size=64),
)
def test_group_lifecycle_roundtrip_property(jv, sv, hv, lv, blob):
    """Fuzz the full join→sync→heartbeat→leave lifecycle across every
    served revision combination: the assignment blob round-trips
    byte-exactly regardless of framing (one shared broker; unique
    group per version combo so regenerated examples re-join cleanly)."""
    b = _fuzz_broker()
    gid = f"glc{jv}_{sv}_{hv}_{lv}"
    with MiniKafkaClient(b.bootstrap) as c:
        c._syncgroup_version = sv
        c._heartbeat_version = hv
        c._leavegroup_version = lv
        j = c.join_group(gid, version=jv)
        got = c.sync_group(
            gid, j["generation"], j["member_id"], {j["member_id"]: blob}
        )
        assert got == blob
        c.heartbeat(gid, j["generation"], j["member_id"])
        c.leave_group(gid, j["member_id"])


def test_two_member_rebalance_at_negotiated_flexible_revisions():
    """The full two-member rebalance the reference connector's
    franz-go client drives, entirely at the NEGOTIATED (flexible)
    revisions: leader joins (v6, via the KIP-394 two-round id
    handshake), follower joins and bumps the generation, leader
    re-joins and distributes assignments through SyncGroup v5,
    the follower receives its own, heartbeats fence across the
    rebalance, and LeaveGroup v5's batched form removes members."""
    with MiniKafkaBroker(default_partitions=2) as b:
        with MiniKafkaClient(b.bootstrap) as lead, \
                MiniKafkaClient(b.bootstrap) as follow:
            lead.negotiate_versions()
            follow.negotiate_versions()
            g1 = lead.join_group("reb")
            assert g1["leader"] == g1["member_id"]
            g2 = follow.join_group("reb")
            assert g2["generation"] > g1["generation"]
            assert len(g2["members"]) == 2
            # the old generation is fenced at the flexible revisions
            with pytest.raises(RuntimeError, match="heartbeat error 22"):
                lead.heartbeat("reb", g1["generation"], g1["member_id"])
            # leader re-joins at the new generation and assigns
            g1b = lead.join_group("reb", member_id=g1["member_id"])
            assignments = {
                g1b["member_id"]: b"parts:0",
                g2["member_id"]: b"parts:1",
            }
            assert set(g1b["members"]) == set(assignments)
            assert lead.sync_group(
                "reb", g1b["generation"], g1b["member_id"], assignments
            ) == b"parts:0"
            assert follow.sync_group(
                "reb", g1b["generation"], g2["member_id"]
            ) == b"parts:1"
            lead.heartbeat("reb", g1b["generation"], g1b["member_id"])
            follow.heartbeat("reb", g1b["generation"], g2["member_id"])
            # per-member commits at v8 land; fetch at v7 reads them
            lead.offset_commit(
                "reb", {("t", 0): 10},
                generation=g1b["generation"], member_id=g1b["member_id"],
            )
            follow.offset_commit(
                "reb", {("t", 1): 20},
                generation=g1b["generation"], member_id=g2["member_id"],
            )
            assert lead.offset_fetch("reb", [("t", 0), ("t", 1)]) == {
                ("t", 0): 10, ("t", 1): 20,
            }
            follow.leave_group("reb", g2["member_id"])
            lead.leave_group("reb", g1b["member_id"])


def test_offset_fetch_v8_multi_group_batched():
    """OffsetFetch v8 (KIP-709): ONE request reads several groups'
    commits, with per-group error codes and null-topics = everything —
    pinned at the frame level (the client's simple-consumer path only
    sends single-group batches)."""
    import struct

    from conduit_spark.functions.minikafka import API_OFFSET_FETCH

    with MiniKafkaBroker(default_partitions=1) as b:
        with MiniKafkaClient(b.bootstrap) as c:
            c.offset_commit("ga", {("t", 0): 5})
            c.offset_commit("gb", {("t", 0): 7, ("u", 2): 9})
            body = _w_uvarint(3)  # two groups
            # ga: explicit (t, 0)
            body += _w_compact_str("ga") + _w_uvarint(2)
            body += _w_compact_str("t") + _w_uvarint(2)
            body += struct.pack(">i", 0) + b"\x00" + b"\x00"
            # gb: null topics -> every commit
            body += _w_compact_str("gb") + _w_uvarint(0) + b"\x00"
            body += struct.pack(">b", 0) + b"\x00"  # require_stable, tags
            r = c._call(API_OFFSET_FETCH, 8, body, flexible=True)
            r.i32()  # throttle
            got = {}
            for _ in range(r.uvarint() - 1):
                gid = r.compact_string()
                for _ in range(r.uvarint() - 1):
                    t = r.compact_string()
                    for _ in range(r.uvarint() - 1):
                        p = r.i32()
                        off = r.i64()
                        r.i32()  # committed_leader_epoch
                        r.compact_string()
                        assert r.i16() == 0
                        r.tags()
                        got[(gid, t, p)] = off
                    r.tags()
                assert r.i16() == 0  # per-group error
                r.tags()
            assert got == {
                ("ga", "t", 0): 5,
                ("gb", "t", 0): 7,
                ("gb", "u", 2): 9,
            }
            # the negotiated client path rides v8 transparently
            c.negotiate_versions()
            assert c._offsetfetch_version == 8
            assert c.offset_fetch("gb", [("t", 0), ("u", 2)]) == {
                ("t", 0): 7, ("u", 2): 9,
            }
