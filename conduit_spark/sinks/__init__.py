"""Destination connectors.

Reference destinations (pkg/plugin/connector/builtin/registry.go:42-49):
file (append lines), log (print each record), kafka, postgres, s3.
Spark mapping: file/s3 = DataFrame writers on paths (s3a:// works
unchanged), log = console/show, kafka = format("kafka"), postgres =
JDBC. Multi-collection routing uses the ``opencdc.collection``
metadata key as a partition column
(docs/design-documents/20240402-multiple-collections.md:19-51).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from conduit_spark.envelope import META_COLLECTION


def _serializable(df: DataFrame) -> DataFrame:
    """Envelope → JSON-friendly projection (binary → base64/strings)."""
    cols = []
    for name, dtype in df.dtypes:
        if dtype == "binary":
            cols.append(F.col(name).cast("string").alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def record_line(
    df: DataFrame, fmt: str = "opencdc/json", options: str | None = None
):
    """The rendered-record Column behind :func:`format_records` —
    callers that need extra columns alongside the line (e.g. a
    partitionBy key) select this next to them."""
    return _record_line(df, fmt, options)


def format_records(
    df: DataFrame, fmt: str = "opencdc/json", options: str | None = None
) -> DataFrame:
    """Reference ``sdk.record.format`` middleware: envelope → ONE
    string column ``value`` per record, rendered JVM-side.

    - ``opencdc/json`` (the reference default): the nested OpenCDC
      record shape ``{"position": <b64>, "operation": ..., "metadata":
      {...}, "key": ..., "payload": {"before": ..., "after": ...}}``.
      Structured key/payload embed VERBATIM as JSON objects (they are
      JSON text columns already — no reparse, no schema needed); raw
      bytes travel base64-quoted, like the reference's log example.
    - ``template``: ``options`` is a Go template executed per record
      (``expr/template.py`` compiles it to a Column — whole-stage
      codegen, not a row-at-a-time UDF), the reference's template
      output format.

    Scale: both are pure column algebra on the write path — zero extra
    shuffles, distributed rendering."""
    return df.select(_record_line(df, fmt, options).alias("value"))


def _record_line(df: DataFrame, fmt: str, options: str | None):
    if fmt == "opencdc/json":
        # base64 of binary -> JSON string literal; structured JSON text
        # embeds verbatim
        key = F.coalesce(
            F.col("key_json"),
            F.concat(F.lit('"'), F.base64(F.col("key_raw")), F.lit('"')),
            F.lit("null"),
        )
        after = F.coalesce(
            F.col("payload_after_json"),
            F.concat(
                F.lit('"'), F.base64(F.col("payload_after_raw")), F.lit('"')
            ),
            F.lit("null"),
        )
        before = F.coalesce(F.col("payload_before_json"), F.lit("null"))
        line = F.concat(
            F.lit('{"position":'),
            F.coalesce(
                F.concat(F.lit('"'), F.base64(F.col("position")), F.lit('"')),
                F.lit("null"),
            ),
            F.lit(',"operation":"'), F.col("operation"), F.lit('"'),
            F.lit(',"metadata":'),
            F.coalesce(F.to_json(F.col("metadata")), F.lit("null")),
            F.lit(',"key":'), key,
            F.lit(',"payload":{"before":'), before,
            F.lit(',"after":'), after,
            F.lit("}}"),
        )
        return line
    if fmt == "template":
        from conduit_spark.expr.template import compile_template

        if not options:
            raise ValueError(
                "sdk.record.format=template requires the template in "
                "sdk.record.format.options"
            )
        return compile_template(options, df)
    raise ValueError(
        f"unsupported sdk.record.format {fmt!r}; "
        "supported: opencdc/json, template"
    )


def file_sink(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "json",
    mode: str = "append",
    partition_by_collection: bool = False,
    record_format: str | None = None,
    record_format_options: str | None = None,
) -> None:
    """Write envelopes to files (json/parquet/orc/text).

    ``partition_by_collection=True`` routes records to per-collection
    directories (the destination-table-template analog) — at scale
    this is a partitioned write, one task per collection shard, no
    driver routing. ``record_format`` (the reference's
    ``sdk.record.format``) switches the output to one rendered line
    per record via :func:`format_records`; the file format becomes
    ``text``."""
    out = df
    if record_format is not None:
        line = record_line(out, record_format, record_format_options)
        if partition_by_collection:
            both = out.select(
                line.alias("value"),
                F.coalesce(
                    F.col("metadata").getItem(META_COLLECTION),
                    F.lit("default"),
                ).alias("collection"),
            )
            both.write.mode(mode).partitionBy("collection").format(
                "text"
            ).save(path)
            return
        out.select(line.alias("value")).write.mode(mode).format("text").save(
            path
        )
        return
    writer_df = out
    if partition_by_collection:
        writer_df = out.withColumn(
            "collection",
            F.coalesce(F.col("metadata").getItem(META_COLLECTION), F.lit("default")),
        )
    if fmt == "json":
        writer_df = _serializable(writer_df)
    w = writer_df.write.mode(mode)
    if partition_by_collection:
        w = w.partitionBy("collection")
    w.format(fmt).save(path)


_LOG_LEVELS = {  # the reference's inclusion(trace,debug,info,warn,error)
    "trace": 5, "debug": 10, "info": 20, "warn": 30, "error": 40,
}


def log_sink(
    df: DataFrame, n: int = 20, *,
    level: str = "info", message: str | None = None,
) -> None:
    """builtin:log — log records (dev/debug destination).

    Reference parity (conduit-connector-log destination parameters):
    each record is one JSON console line in the reference's exact
    shape ``{"level": ..., ["message": ...,] "record": {...}}``
    (conduit-connector-log's documented example), with ``level``
    inclusion-validated (trace/debug/info/warn/error) and the optional
    ``message`` added to every line. Output is capped at ``n`` records
    (driver-side logging is inherently single-point; the cap keeps a
    misconfigured corpus-sized pipeline from flooding the driver — the
    reference has no cap because its engine IS single-node)."""
    import json as _json

    level = str(level).lower()
    if level not in _LOG_LEVELS:
        raise ValueError(
            f"log level must be one of {sorted(_LOG_LEVELS)}, got {level!r}"
        )
    rows = _serializable(df).limit(n + 1).collect()
    for row in rows[:n]:
        rec = {
            k: (v.hex() if isinstance(v, (bytes, bytearray)) else v)
            for k, v in row.asDict(recursive=True).items()
        }
        out: dict = {"level": level}
        if message:
            out["message"] = message
        out["record"] = rec
        print(_json.dumps(out, default=str))
    if len(rows) > n:
        print(f"... (log sink capped at {n} records)")


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    options: dict[str, str] | None = None,
) -> None:
    """builtin:postgres destination (batch/foreachBatch insert path).

    Upsert parity requires a MERGE-capable target or ON CONFLICT via
    option("truncate", ...) patterns; plain insert here, upsert left to
    a foreachBatch with staging-table MERGE (documented delta vs the
    reference's per-record upsert)."""
    w = df.write.mode(mode)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.jdbc(url, table)


def _jdbc_exec(spark, url: str, statements: list[str], driver: str | None) -> None:
    """Run DDL/DML statements through the JVM's DriverManager (one
    driver-side connection; the bulk data moved executor-side via the
    staging write)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.executeUpdate(sql)
        st.close()
    finally:
        conn.close()


def jdbc_upsert_sink(
    df: DataFrame,
    url: str,
    table: str,
    key_columns: list[str],
    *,
    staging_table: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Upsert a relational batch into ``table`` keyed by
    ``key_columns`` — the reference postgres destination's write
    semantics (per-key insert-or-update), done set-based: stage the
    batch via a distributed JDBC write, then one MERGE statement.

    At scale the heavy lifting (moving rows) is the executor-parallel
    staging write; the MERGE is a single server-side set operation —
    no per-record driver round-trips.
    """
    spark = df.sparkSession
    staging = staging_table or f"{table}_STAGING"
    w = df.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.jdbc(url, staging)
    # Spark's JDBC writer creates the staging table with QUOTED
    # (case-preserved) column identifiers — quote them here too
    q = '"{}"'.format
    cols = df.columns
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_columns)
    set_cols = [c for c in cols if c not in key_columns]
    ins_cols = ", ".join(q(c) for c in cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
    merge = f"MERGE INTO {table} t USING {staging} s ON {on}"
    if set_cols:
        upd = ", ".join(f"{q(c)} = s.{q(c)}" for c in set_cols)
        merge += f" WHEN MATCHED THEN UPDATE SET {upd}"
    merge += f" WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    _jdbc_exec(spark, url, [merge], (options or {}).get("driver"))


def jdbc_cdc_sink(
    env_df: DataFrame,
    url: str,
    table: str,
    key_columns: list[str],
    payload_schema: str,
    *,
    options: dict[str, str] | None = None,
) -> None:
    """Apply an envelope changelog to a JDBC table: create/update/
    snapshot payloads upsert, deletes remove by key — the reference
    postgres destination's CDC semantics (handleInsert/handleUpdate/
    handleDelete), set-based via staging + MERGE/DELETE."""
    spark = env_df.sparkSession
    rel = env_df.withColumn(
        "__p", F.from_json(F.col("payload_after_json"), payload_schema)
    )
    upserts = rel.filter(F.col("operation") != "delete").select("__p.*")
    jdbc_upsert_sink(
        upserts, url, table, key_columns,
        staging_table=f"{table}_STAGING", options=options,
    )
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in upserts.schema.fields
        if f.name in key_columns
    )
    # a Debezium delete carries the key in `before` when the envelope
    # has no explicit key (file-sourced changelogs)
    deletes = (
        env_df.filter(F.col("operation") == "delete")
        .withColumn(
            "__k",
            F.from_json(
                F.coalesce(F.col("key_json"), F.col("payload_before_json")),
                key_schema,
            ),
        )
        .select("__k.*")
        .distinct()
    )
    if deletes.isEmpty():
        return
    staging = f"{table}_DELSTAGING"
    w = deletes.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.jdbc(url, staging)
    q = '"{}"'.format
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_columns)
    _jdbc_exec(
        spark,
        url,
        [f"DELETE FROM {table} t WHERE EXISTS (SELECT 1 FROM {staging} s WHERE {on})"],
        (options or {}).get("driver"),
    )


def kafka_records(df: DataFrame) -> DataFrame:
    """Envelope → the (key, value) binary projection Kafka writes:
    structured records send their JSON, raw records their bytes."""
    return df.select(
        F.coalesce(F.col("key_json"), F.col("key_raw").cast("string")).cast("binary").alias("key"),
        F.coalesce(
            F.col("payload_after_json"), F.col("payload_after_raw").cast("string")
        ).cast("binary").alias("value"),
    )


def kafka_writer_options(
    bootstrap_servers: str, topic: str, extra_options: dict | None = None
) -> dict[str, str]:
    """Writer options; ``extra_options`` passes arbitrary ``kafka.*``
    producer configs (SASL/TLS) straight through."""
    opts = {"kafka.bootstrap.servers": str(bootstrap_servers), "topic": str(topic)}
    for k, v in (extra_options or {}).items():
        opts[str(k)] = str(v)
    return opts


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    *,
    extra_options: dict | None = None,
) -> None:
    """builtin:kafka destination — envelope → key/value Kafka records."""
    (
        kafka_records(df)
        .write.format("kafka")
        .options(**kafka_writer_options(bootstrap_servers, topic, extra_options))
        .save()
    )


ACKS_BY_NAME = {"none": 0, "one": 1, "all": -1}


def kafka_wire_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    *,
    batch_size: int = 500,
    batch_bytes: int | None = None,
    compression: str | None = None,
    acks: str | int = "all",
    delivery_timeout_ms: int = 30000,
    client_id: str = "conduit-spark",
    sasl: dict | None = None,
    tls: dict | None = None,
) -> None:
    """Jar-free ``builtin:kafka`` destination over the engine's own
    wire client (``functions/minikafka.py``): envelope → key/value →
    ``foreachPartition`` producer. Each Spark task opens ONE broker
    connection and sends RecordBatch v2 produces of ≤``batch_size``
    records per partition — the same per-task connection/batching
    shape a real producer fleet has, so the plan scales with executor
    count. Round 9 maps the rest of the reference destination's
    parameters: ``acks`` none/one/all -> 0/1/-1 on the Produce request
    (none = fire-and-forget, the broker sends no response),
    ``batchBytes`` caps the encoded request size per partition batch
    (Kafka's max.message.bytes guard), ``deliveryTimeout`` becomes the
    produce timeout, ``clientID`` travels in every request header. Partition routing is Kafka's default-partitioner murmur2
    on the record key (value-hash for null keys, documented in
    ``partition_for_key``). The JVM ``format("kafka")`` path in
    :func:`kafka_sink` remains the hot path where the spark-sql-kafka
    jar is present; select this one with ``transport: wire``.

    Implementation note: the per-partition producer runs as
    ``mapInPandas`` + a noop Dataset write rather than
    ``foreachPartition`` — an RDD action would never fire the
    runtime's delivery ``Observation`` (CollectMetrics only flows
    through Dataset actions), deadlocking ``Pipeline._deliver``."""
    # validate config before touching the DataFrame (reference-style
    # inclusion(none,one,all) error instead of a bare KeyError)
    if isinstance(acks, str):
        if acks not in ACKS_BY_NAME:
            raise ValueError(
                f"acks must be one of none/one/all, got {acks!r}"
            )
        acks_int = ACKS_BY_NAME[acks]
    else:
        acks_int = int(acks)
    records = kafka_records(df)

    def _send(batches):
        import time

        import pandas as pd

        from conduit_spark.functions.minikafka import (
            MiniKafkaClient,
            partition_for_key,
        )

        client = None
        n_sent = 0
        try:
            buf: dict[int, list[dict]] = {}
            sizes: dict[int, int] = {}
            n_parts = 1
            for pdf in batches:
                for row in pdf.itertuples():
                    if client is None:
                        client = MiniKafkaClient(
                            server, client_id=client_id,
                            sasl=sasl, **(tls or {}),
                        )
                        # highest mutual Produce revision (v9 flexible
                        # against this repo's broker; v3 floor elsewhere)
                        client.negotiate_versions()
                        md = client.metadata([topic])
                        parts = md["topics"].get(topic, {}).get("partitions", [])
                        # A v1 metadata request for a named topic
                        # auto-creates it (auto.create.topics.enable);
                        # real Kafka creates asynchronously and may
                        # report 0 partitions on the first response, so
                        # poll briefly. Never fall back to n_parts=1:
                        # routing everything to partition 0 on the
                        # first run would diverge from every rerun once
                        # the topic exists with default_partitions.
                        for _ in range(20):
                            if parts:
                                break
                            time.sleep(0.25)
                            md = client.metadata([topic])
                            parts = md["topics"].get(topic, {}).get("partitions", [])
                        if not parts:
                            raise RuntimeError(
                                f"kafka_wire_sink: topic {topic!r} has no "
                                "partitions and the broker did not "
                                "auto-create it; create the topic first"
                            )
                        n_parts = len(parts)
                    k = bytes(row.key) if row.key is not None else None
                    v = bytes(row.value) if row.value is not None else None
                    p = partition_for_key(k, v, n_parts)
                    # ~70B of RecordBatch framing per record on top of
                    # key+value — a cheap upper bound that keeps every
                    # request under batchBytes without encoding twice.
                    # batchBytes caps the MAXIMUM request size (the
                    # reference mirrors max.message.bytes — an oversized
                    # request is rejected by a real broker), so flush
                    # BEFORE appending a record that would push past the
                    # cap; a single record larger than the cap travels
                    # alone, since the buffer is empty when it lands and
                    # the next record triggers this same pre-flush.
                    rec_size = len(k or b"") + len(v or b"") + 70
                    if (
                        batch_bytes is not None
                        and buf.get(p)
                        and sizes.get(p, 0) + rec_size > batch_bytes
                    ):
                        client.produce(
                            topic, p, buf.pop(p), compression=compression,
                            acks=acks_int, timeout_ms=delivery_timeout_ms,
                        )
                        sizes.pop(p, None)
                    buf.setdefault(p, []).append(
                        {"key": k, "value": v, "timestamp": int(time.time() * 1000)}
                    )
                    sizes[p] = sizes.get(p, 0) + rec_size
                    n_sent += 1
                    if len(buf[p]) >= batch_size:
                        client.produce(
                            topic, p, buf.pop(p), compression=compression,
                            acks=acks_int, timeout_ms=delivery_timeout_ms,
                        )
                        sizes.pop(p, None)
            for p, recs in buf.items():
                client.produce(
                    topic, p, recs, compression=compression,
                    acks=acks_int, timeout_ms=delivery_timeout_ms,
                )
        finally:
            if client is not None:
                client.close()
        yield pd.DataFrame({"n_sent": [n_sent]})

    server = str(bootstrap_servers).split(",")[0].strip()
    (
        records.mapInPandas(_send, "n_sent long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def training_shard_sink(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    key_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Write a corpus as N deterministic training shards
    (``path/shard=K/``), assignment = md5-hash-mod so the same row
    lands in the same shard on any cluster layout or rerun.

    The frame is repartitioned ON the shard column first, so each
    shard is written by exactly one task — N output files, not
    tasks×N small files. Pick ``n_shards`` so a shard ≈ one training
    worker's slice (thousands at 100 TB); the audit query
    ``analytics.curation.cur_shards`` reports the balance this write
    would produce.
    """
    from conduit_spark.analytics.curation import shard_of

    (
        df.withColumn("shard", shard_of(F.col(key_col), n_shards))
        .repartition(n_shards, F.col("shard"))
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def compact_partitions(
    spark,
    path: str,
    *,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
    schema=None,
) -> dict:
    """Compact a small-file-fragmented dataset in place: rewrite each
    (optionally partitioned) dataset with file counts sized from the
    actual on-disk bytes, not the writing job's task count.

    Streaming sinks and per-batch idempotent writers (this engine's
    ``batch_id=N`` layout included) accumulate files proportional to
    *batches × tasks*; at 100 TB scan cost becomes metadata-bound long
    before it is IO-bound. Compaction = read → ``repartition(ceil(
    bytes / target))`` (hash on the partition column so dynamic
    partition overwrite rewrites each partition with its own right-
    sized file set) → overwrite. Returns {files_before, files_after,
    bytes} for the caller's audit log.

    The rewrite stages into ``<path>.__compact_tmp`` and swaps only
    after success — an in-place overwrite that reads its own input
    would truncate the dataset on failure. The stat/swap step here is
    local-filesystem (os/shutil); on HDFS/S3 the same two-phase
    pattern runs through the FileSystem API (rename is atomic on HDFS;
    on S3 you flip a manifest/prefix pointer instead).
    """
    import math
    import os
    import shutil

    def walk_stats(p):
        n, b = 0, 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                n += 1
                b += os.path.getsize(os.path.join(root, f))
        return n, b

    files_before, total_bytes = walk_stats(path)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    # Pin one schema across the rewrite + both validation reads so the
    # partition column's type cannot drift mid-operation. Callers that
    # know the writer's true schema pass it explicitly (inference can
    # narrow a bigint partition column whose values all fit int).
    src_schema = schema or spark.read.format(fmt).load(path).schema
    df = spark.read.format(fmt).schema(src_schema).load(path)
    rows_before = df.count()
    if partition_col:
        df = df.repartition(n_files, F.col(partition_col))
    else:
        df = df.repartition(n_files)
    tmp = path.rstrip("/") + ".__compact_tmp"
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.format(fmt).save(tmp)
    # Validate the rewrite BEFORE touching the original: a corrupt or
    # short output must never destroy the only copy.
    rows_after = spark.read.format(fmt).schema(src_schema).load(tmp).count()
    if rows_after != rows_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction aborted: rewrite has {rows_after} rows, "
            f"source has {rows_before}; original left untouched at {path}"
        )
    rollback = path.rstrip("/") + ".__compact_old"
    shutil.move(path, rollback)
    shutil.move(tmp, path)
    # Post-swap sanity read before discarding the rollback copy — a
    # crash between the two moves leaves `rollback` as the recovery
    # point, and an unreadable swapped dataset keeps it too.
    try:
        spark.read.format(fmt).schema(src_schema).load(path).limit(1).collect()
    except Exception:
        shutil.move(path, tmp)
        shutil.move(rollback, path)
        raise
    shutil.rmtree(rollback)
    files_after, _ = walk_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows_before,
        "bytes": total_bytes,
    }


def dlq_prune(path: str, *, max_bytes: int) -> dict:
    """Bound a file-backed DLQ store: delete the OLDEST batch
    directories / files until the store fits ``max_bytes`` — the
    "bounded" third of the reference's deferred DLQ-record-store
    requirements (20260715-dlq-record-visibility.md: bounded,
    crash-safe, queryable; crash-safety comes from the idempotent
    batch_id dirs, queryability from ControlPlane.get_dlq_records).

    Retention is whole-batch (a batch dir either fully survives or
    fully goes) and oldest-first by mtime, so the view's newest-first
    tail is never torn mid-batch. Never deletes the newest unit, even
    when it alone exceeds the cap — an oversized cap misconfiguration
    must not destroy the only evidence. Returns
    {kept_bytes, deleted_bytes, deleted_units}."""
    import contextlib
    import os
    import shutil

    units: list[tuple[float, str, int]] = []  # (mtime, path, bytes)
    if not os.path.isdir(path):
        return {"kept_bytes": 0, "deleted_bytes": 0, "deleted_units": 0}
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if name.startswith((".", "_")):
            continue
        if os.path.isdir(full):
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(full)
                for f in fs
            )
        else:
            size = os.path.getsize(full)
        units.append((os.path.getmtime(full), full, size))
    units.sort(reverse=True)  # newest first
    kept = 0
    deleted_bytes = 0
    deleted = 0
    for idx, (_, full, size) in enumerate(units):
        if idx == 0 or kept + size <= max_bytes:
            kept += size
            continue
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            with contextlib.suppress(OSError):
                os.unlink(full)
        deleted_bytes += size
        deleted += 1
    return {
        "kept_bytes": kept,
        "deleted_bytes": deleted_bytes,
        "deleted_units": deleted,
    }
