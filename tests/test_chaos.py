"""Kill-and-resume chaos test (tests/chaos/doc.go:15-31 analog):
SIGKILL a streaming pipeline mid-run, restart from the checkpoint,
assert every record is delivered exactly once."""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_lines(out_dir: str) -> list[str]:
    lines = []
    for f in glob.glob(os.path.join(out_dir, "**", "*.json"), recursive=True):
        with open(f) as fh:
            lines.extend(json.loads(ln)["line"] for ln in fh if ln.strip())
    return lines


def test_sigkill_mid_stream_no_loss_no_dup(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    expected = []
    for i in range(3):
        (src / f"f{i}.txt").write_text(f"rec-{i}a\nrec-{i}b\n")
        expected += [f"rec-{i}a", f"rec-{i}b"]
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    child = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "chaos_child.py"),
         str(src), out, ckpt, "20"],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        # wait for the first micro-batch to commit, then kill -9
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            if glob.glob(os.path.join(out, "batch_id=*", "*.json")):
                break
            if child.poll() is not None:
                pytest.fail("child exited before first batch")
            time.sleep(0.5)
        else:
            pytest.fail("first batch never committed")
        time.sleep(1.0)  # land inside the post-commit sleep window
        child.send_signal(signal.SIGKILL)
        child.wait(30)
    finally:
        if child.poll() is None:
            child.kill()

    delivered_before = sorted(collect_lines(out))
    assert 0 < len(delivered_before) < len(expected)  # killed mid-stream

    # restart from the checkpoint, no sleep — must finish the rest
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "chaos_child.py"),
         str(src), out, ckpt, "0"],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        timeout=300,
    ).returncode
    assert rc == 0
    final = sorted(collect_lines(out))
    assert final == sorted(expected)  # exactly once: no loss, no dups
