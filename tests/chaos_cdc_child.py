"""DBZ-2 chaos child: the postgres snapshot→CDC handoff as two
resumable streaming phases with marker-gated crash points.

The reference's CDC correctness suite
(docs/design-documents/20260726-dbz2-cdc-correctness-suite.md:10-14)
requires at-least-once delivery under SIGKILL at three distinct crash
points — mid-snapshot, mid-handoff, mid-position-write. This child
drives the engine's real handoff legs:

- phase 1 is the snapshot leg of ``snapshot_handoff_source``
  (sources/postgres_wal.py:459-474): ``envelope.from_table`` snapshot
  envelopes stamped with the snapshot LSN, chunked one parquet file
  per micro-batch so a kill can land between durable chunks;
- phase 2 is the WAL-tail leg (postgres_wal.py:475-485):
  ``wal2json_source(streaming=True)`` over LiveWalTail capture files
  with the strict ``lsn > snapshot_lsn`` cutover filter.

Crash points are MARKER-GATED, not time-based: at the designated
point the child touches ``reached`` and blocks while ``hold`` exists,
so the parent SIGKILLs at a verified-reached state. On restart the
gate is skipped (``reached`` already exists) and both phases resume
from their checkpoints. Every sink write lands in a per-batch dir via
mode("overwrite") — the idempotent rewrite that makes a replayed
batch (the mid-position-write window: sink written, commit log not)
converge instead of duplicating. ``writes.log`` records every
foreachBatch delivery so the parent can PROVE the replay happened.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    (snap_dir, wal_dir, out, ckpt, crash_point, hold_path, reached_path,
     snap_lsn) = sys.argv[1:9]

    import pyspark.sql.functions as F

    from conduit_spark import envelope as env
    from conduit_spark import get_spark
    from conduit_spark.sources.postgres_wal import lsn_to_long, wal2json_source

    spark = get_spark("chaos-cdc-child", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def gate() -> None:
        """First arrival: flag the crash point and wait for the kill.
        After a restart (reached exists) the gate is a no-op."""
        if os.path.exists(reached_path):
            return
        with open(reached_path, "w") as f:
            f.write("1")
        while os.path.exists(hold_path):
            time.sleep(0.1)

    def deliver(batch_df, dest: str) -> None:
        (
            batch_df.select(
                "operation",
                F.col("metadata").getItem("postgres.lsn").alias("lsn"),
                "key_json",
                "payload_after_json",
            )
            .write.mode("overwrite")
            .json(dest)
        )
        with open(os.path.join(out, "writes.log"), "a") as f:
            f.write(dest + "\n")

    # ---- phase 1: chunked snapshot at snap_lsn -----------------------
    snap_stream = (
        spark.readStream.schema("id long, name string, balance double")
        .option("maxFilesPerTrigger", "1")
        .parquet(snap_dir)
    )
    snap_env = env.from_table(
        snap_stream, key_cols=["id"], source_id="pg", operation="snapshot"
    ).withColumn(
        "metadata",
        F.map_concat(
            "metadata", F.create_map(F.lit("postgres.lsn"), F.lit(snap_lsn))
        ),
    )

    def snap_batch(bdf, bid: int) -> None:
        if crash_point == "mid-snapshot" and bid >= 1:
            gate()  # before the write: chunk 0 durable, chunk 1 pending
        deliver(bdf, f"{out}/snap={bid}")

    q = (
        snap_env.writeStream.foreachBatch(snap_batch)
        .option("checkpointLocation", f"{ckpt}/snap")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    with open(f"{out}/_snapshot_done", "w") as f:
        f.write("1")

    # ---- handoff: snapshot complete, tail not yet started ------------
    if crash_point == "mid-handoff":
        gate()

    # ---- phase 2: WAL tail with the strict-LSN cutover ----------------
    tail = wal2json_source(
        spark, wal_dir, source_id="pg", streaming=True, key_cols=["id"]
    ).filter(
        lsn_to_long(F.col("metadata").getItem("postgres.lsn"))
        > lsn_to_long(F.lit(snap_lsn))
    )

    def wal_batch(bdf, bid: int) -> None:
        deliver(bdf, f"{out}/wal={bid}")
        if crash_point == "mid-position-write" and bid == 0:
            gate()  # sink write durable, commit-log write pending

    q2 = (
        tail.writeStream.foreachBatch(wal_batch)
        .option("checkpointLocation", f"{ckpt}/wal")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()


if __name__ == "__main__":
    main()
