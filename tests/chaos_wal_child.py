"""Ack-ordering chaos child: run the engine's live WAL tail against a
parent-held MiniPG walsender until SIGKILLed. The parent kills this
process at an arbitrary point mid-capture; the property under test is
LiveWalTail's confirm-follows-durable-rename ordering (the fix
approach the reference's sev-0 ack-persist-ordering doc recommends),
so the kill window can only ever produce redelivery, never a gap."""

from __future__ import annotations

import sys
import time


def main() -> None:
    dsn, cap_dir = sys.argv[1:3]
    from conduit_spark.sources.postgres_wal import LiveWalTail

    LiveWalTail(cap_dir, max_lines=8, max_secs=0.2).start_native(dsn)
    while True:  # the parent SIGKILLs us
        time.sleep(0.2)


if __name__ == "__main__":
    main()
