"""The reference's sev-0 ack-persist-ordering bug class, replicated.

`docs/design-documents/20260723-source-ack-persist-ordering-fix.md`
(reference repo) traces a confirmed sev-0: `Source.Ack` told the
plugin "you may commit" BEFORE the position reached durable storage.
For retention-based upstreams (Kafka) the crash window degrades to a
benign duplicate; for a PRUNING upstream (Postgres logical
replication: acking advances `confirmed_flush_lsn` and WAL behind it
is recycled) the identical window produces a STRUCTURAL GAP — the
client resumes from its stale durable position, and the slot can no
longer serve what it already confirmed away. The reference proved
both halves with a synthetic prune toggle (DBZ-1, `gh pr diff 2677`).

This engine's `LiveWalTail` implements the recommended fix shape
(A: ack-follows-durable-flush): the Standby Status Update confirming
a position is sent only AFTER the capture file containing it is
durably renamed into place (`sources/postgres_wal.py::start_native`).
MiniPGServer needs no prune toggle to model the recycling: its slot
semantics (`start = max(requested, confirmed_flush_lsn)` —
`functions/minipg.py::_stream`) already make everything below the
confirmed position unservable, exactly like recycled WAL.

Two tests, the experiment and its control:

- the REAL ordering under SIGKILL mid-capture → duplicates possible,
  gaps impossible;
- a deliberately BROKEN client (confirm before durable write) killed
  in the window → the gap is OBSERVED, proving the instrument can
  detect the failure the real ordering prevents (not a vacuous pass).
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pytest

from conduit_spark.functions.minipg import (
    MiniPGServer,
    ReplicationClient,
    lsn_text,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _change(i: int) -> str:
    return json.dumps(
        {
            "action": "I",
            "schema": "public",
            "table": "t",
            "lsn": lsn_text(i + 1),
            "columns": [{"name": "id", "type": "integer", "value": i}],
        }
    )


def _captured_ids(*cap_dirs: str) -> list[int]:
    ids = []
    for d in cap_dirs:
        for f in sorted(glob.glob(os.path.join(d, "*.jsonl"))):
            with open(f) as fh:
                for ln in fh:
                    if ln.strip():
                        ids.append(json.loads(ln)["columns"][0]["value"])
    return ids


def _drain_with_tail(srv, cap_dir: str) -> None:
    """Run the real tail until the slot confirms everything fed."""
    from conduit_spark.sources.postgres_wal import LiveWalTail

    tail = LiveWalTail(cap_dir, max_lines=8, max_secs=0.1).start_native(
        srv.dsn
    )
    deadline = time.monotonic() + 30
    while (
        srv.confirmed_flush_lsn < srv.current_lsn
        and time.monotonic() < deadline
    ):
        time.sleep(0.05)
    tail.stop()
    assert srv.confirmed_flush_lsn == srv.current_lsn


def test_ack_follows_durable_flush_no_gap_under_sigkill(tmp_path):
    """SIGKILL the real tail mid-capture: whatever was confirmed is
    already durably on disk, so the resume sees duplicates at most —
    every change fed to the slot appears in the captured union."""
    cap1 = str(tmp_path / "c1")
    cap2 = str(tmp_path / "c2")
    n_seed, n_window, n_second = 40, 5, 10
    n_first = n_seed + n_window
    fed_ends: list[int] = []  # wire LSN *end* of each fed change

    with MiniPGServer(keepalive_s=0.05) as srv:

        def feed(i: int) -> None:
            line = _change(i)
            fed_ends.append(srv.feed(line) + len(line.encode()))

        for i in range(n_seed):
            feed(i)
        child = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "chaos_wal_child.py"),
             srv.dsn, cap1],
            env=dict(os.environ, PYTHONPATH=REPO),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        try:
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                if (
                    len(glob.glob(os.path.join(cap1, "*.jsonl"))) >= 2
                    and srv.confirmed_flush_lsn > 0
                ):
                    break
                if child.poll() is not None:
                    pytest.fail("tail child exited early")
                time.sleep(0.05)
            else:
                pytest.fail("tail never made durable progress")
            # deterministic kill window: freeze the tail, feed changes
            # it can never process, then kill — guaranteed mid-stream
            child.send_signal(signal.SIGSTOP)
            for i in range(n_seed, n_first):
                feed(i)
            child.send_signal(signal.SIGKILL)
            child.wait(30)
        finally:
            if child.poll() is None:
                child.kill()
        confirmed_at_kill = srv.confirmed_flush_lsn
        assert confirmed_at_kill < srv.current_lsn  # killed mid-stream

        # everything CONFIRMED must already be durable — the ordering
        # invariant itself, checked directly at the kill point
        durable = _captured_ids(cap1)
        confirmed_ids = [
            i for i in range(n_first) if fed_ends[i] <= confirmed_at_kill
        ]
        assert confirmed_ids, "kill landed before any confirmation"
        missing_confirmed = set(confirmed_ids) - set(durable)
        assert not missing_confirmed, (
            f"confirmed-but-not-durable: {sorted(missing_confirmed)}"
        )

        for i in range(n_first, n_first + n_second):
            feed(i)
        _drain_with_tail(srv, cap2)

    got = _captured_ids(cap1, cap2)
    expect = set(range(n_first + n_second))
    assert set(got) == expect, f"GAP: {sorted(expect - set(got))}"
    # at-least-once: duplicates allowed; dedup gives exactly-once
    assert len(set(got)) == len(expect)


def test_confirm_before_flush_loses_pruned_wal(tmp_path):
    """The NEGATIVE CONTROL: a client that confirms before durably
    writing, killed in the window, creates a structural gap — the slot
    (like recycled WAL) can never serve those changes again. This is
    the failure mode the real ordering exists to prevent; if this test
    ever starts passing gap-free, the instrument is broken."""
    cap2 = str(tmp_path / "after")
    n = 5
    durable: list[int] = []
    with MiniPGServer(keepalive_s=0.05) as srv:
        for i in range(n):
            srv.feed(_change(i))
        with ReplicationClient(srv.dsn) as c:
            seen = 0
            for lsn, payload in c.start_replication(0):
                if lsn is None:
                    continue
                seen += 1
                doc = json.loads(payload)
                if seen <= 2:
                    durable.append(doc["columns"][0]["value"])  # "flushed"
                # BROKEN: confirm every change, durable or not
                c.confirm(lsn + len(payload))
                if seen == n:
                    break
        deadline = time.monotonic() + 10
        while (
            srv.confirmed_flush_lsn < srv.current_lsn
            and time.monotonic() < deadline
        ):
            time.sleep(0.05)
        # the "crash": changes 2..4 were confirmed but never persisted.
        # resume with the REAL tail — the slot starts at confirmed_flush
        from conduit_spark.sources.postgres_wal import LiveWalTail

        tail = LiveWalTail(cap2, max_lines=2, max_secs=0.1).start_native(
            srv.dsn
        )
        srv.feed(_change(n))  # one post-crash change proves liveness
        deadline = time.monotonic() + 30
        while (
            srv.confirmed_flush_lsn < srv.current_lsn
            and time.monotonic() < deadline
        ):
            time.sleep(0.05)
        tail.stop()

    got = set(durable) | set(_captured_ids(cap2))
    gap = set(range(n)) - got
    assert gap == {2, 3, 4}, f"expected the confirmed-unflushed gap, got {gap}"
    assert n in got  # post-crash change delivered
