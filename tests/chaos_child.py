"""Chaos-test child process: stream a text dir to per-batch json dirs,
one file per micro-batch, sleeping after each batch so the parent can
SIGKILL mid-stream (tests/chaos/sigkill_test.go analog)."""

from __future__ import annotations

import sys
import time


def main() -> None:
    src, out, ckpt, sleep_s = sys.argv[1:5]
    from conduit_spark import get_spark
    from conduit_spark.sources.file_source import file_source

    spark = get_spark("chaos-child", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = file_source(
        spark,
        src,
        fmt="text",
        streaming=True,
        reader_options={"maxFilesPerTrigger": "1"},
    )

    def pb(batch_df, bid: int) -> None:
        (
            batch_df.select(batch_df.payload_after_raw.cast("string").alias("line"))
            .write.mode("overwrite")
            .json(f"{out}/batch_id={bid}")
        )
        time.sleep(float(sleep_s))

    q = (
        df.writeStream.foreachBatch(pb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
