"""Standalone (subprocess) connector e2e tests.

The reference's standalone connector plugins are separate processes
dispensed over gRPC (pkg/plugin/connector/standalone/dispenser.go:25);
here the same isolation runs over the JSON-lines protocol. These tests
drive a full YAML pipeline — subprocess source → processor chain →
subprocess destination — plus the kill-mid-batch recovery story.
"""

from __future__ import annotations

import json
import sys
import time

import pytest

from conduit_spark.pipeline.config import parse_yaml
from conduit_spark.pipeline.runtime import Pipeline
from conduit_spark.sources.standalone import standalone_sink, standalone_source

SRC_PLUGIN = r"""
import sys, json, base64, os
conf = json.loads(sys.stdin.readline())
n = int(conf["settings"].get("recordCount", 5))
die_after = conf["settings"].get("dieAfter")
marker = conf["settings"].get("dieMarker")
for i in range(n):
    if die_after is not None and i >= int(die_after) and (
        marker is None or os.path.exists(marker)
    ):
        sys.exit(1)
    rec = {
        "position": base64.b64encode(f"src:{i}".encode()).decode(),
        "operation": "create",
        "metadata": {"plugin": "standalone-src", "conduit.source.connector.id": conf["connector_id"]},
        "key_json": json.dumps({"id": i}),
        "payload_after_json": json.dumps({"id": i, "name": f"rec-{i}"}),
        "is_structured": True,
    }
    print(json.dumps(rec)); sys.stdout.flush()
"""

DST_PLUGIN = r"""
import sys, json, os
conf = json.loads(sys.stdin.readline())
path = conf["settings"]["path"]
die_after = conf["settings"].get("dieAfter")
marker = conf["settings"].get("dieMarker")
os.makedirs(path, exist_ok=True)
out = open(os.path.join(path, f"out-{os.getpid()}.jsonl"), "w")
seen = 0
for line in sys.stdin:
    rec = json.loads(line)
    if die_after is not None and seen >= int(die_after) and (
        marker is None or os.path.exists(marker)
    ):
        sys.exit(1)  # hard death mid-batch, some records unacked
    out.write(rec["payload_after_json"] + "\n"); out.flush()
    print(json.dumps({"ok": True})); sys.stdout.flush()
    seen += 1
"""


@pytest.fixture()
def plugins(tmp_path):
    src = tmp_path / "src_plugin.py"
    src.write_text(SRC_PLUGIN)
    dst = tmp_path / "dst_plugin.py"
    dst.write_text(DST_PLUGIN)
    return str(src), str(dst)


def _delivered_ids(out_dir) -> set[int]:
    ids = set()
    for f in out_dir.rglob("out-*.jsonl"):
        for line in f.read_text().splitlines():
            if line.strip():
                ids.add(json.loads(line)["id"])
    return ids


def test_source_reads_envelopes(spark, plugins):
    src, _ = plugins
    df = standalone_source(
        spark,
        [sys.executable, "-u", src],
        settings={"recordCount": 7},
        source_id="s1",
    )
    rows = df.collect()
    assert len(rows) == 7
    assert {bytes(r.position).decode() for r in rows} == {
        f"src:{i}" for i in range(7)
    }
    assert all(r.operation == "create" and r.is_structured for r in rows)
    assert rows[0].metadata["conduit.source.connector.id"] == "s1"


def test_yaml_pipeline_subprocess_source_to_subprocess_destination(
    spark, plugins, tmp_path
):
    """The headline e2e: YAML-declared subprocess source → filter
    processor → subprocess destination, all across process
    boundaries."""
    src, dst = plugins
    out_dir = tmp_path / "out"
    cfg = parse_yaml(
        f"""
version: "2.2"
pipelines:
  - id: standalone-e2e
    connectors:
      - id: s
        type: source
        plugin: custom.standalone
        settings:
          command: "{sys.executable} -u {src}"
          recordCount: 20
      - id: d
        type: destination
        plugin: custom.standalone
        settings:
          command: "{sys.executable} -u {dst}"
          path: {out_dir}
    processors:
      - id: drop-low  # filter DROPS matching records (reference semantics)
        plugin: filter
        condition: '{{{{ lt .Payload.After.id 5 }}}}'
"""
    )[0]
    res = Pipeline(spark, cfg).run_batch()
    assert res.delivered["d"] == 15
    assert _delivered_ids(out_dir) == set(range(5, 20))


def test_source_child_death_fails_the_read(spark, plugins):
    src, _ = plugins
    with pytest.raises(RuntimeError, match="exited 1"):
        standalone_source(
            spark,
            [sys.executable, "-u", src],
            settings={"recordCount": 10, "dieAfter": 3},
        )


def test_destination_kill_mid_batch_then_recovery(spark, plugins, tmp_path):
    """Child dies mid-batch → the batch fails loudly (no silent partial
    ack); clearing the fault and rerunning delivers every record —
    the runtime's rerun/restart recovery contract."""
    src, dst = plugins
    out_dir = tmp_path / "out"
    marker = tmp_path / "fault-injected"
    marker.write_text("x")
    env_df = standalone_source(
        spark,
        [sys.executable, "-u", src],
        settings={"recordCount": 12},
    ).repartition(2)
    with pytest.raises(Exception, match="standalone destination"):
        standalone_sink(
            env_df,
            [sys.executable, "-u", dst],
            settings={
                "path": str(out_dir),
                "dieAfter": 2,
                "dieMarker": str(marker),
            },
        )
    # operator repaired (marker removed) → rerun delivers all 12
    marker.unlink()
    standalone_sink(
        env_df,
        [sys.executable, "-u", dst],
        settings={
            "path": str(out_dir),
            "dieAfter": 2,
            "dieMarker": str(marker),
        },
    )
    assert _delivered_ids(out_dir) == set(range(12))


def test_destination_nack_raises(spark, plugins, tmp_path):
    src, _ = plugins
    nacker = tmp_path / "nack_plugin.py"
    nacker.write_text(
        "import sys, json\n"
        "conf = json.loads(sys.stdin.readline())\n"
        "for line in sys.stdin:\n"
        "    rec = json.loads(line)\n"
        "    ok = json.loads(rec['payload_after_json'])['id'] % 2 == 0\n"
        "    print(json.dumps({'ok': ok, 'error': None if ok else 'odd id'}))\n"
        "    sys.stdout.flush()\n"
    )
    env_df = standalone_source(
        spark, [sys.executable, "-u", src], settings={"recordCount": 4}
    ).coalesce(1)
    with pytest.raises(Exception, match="nack"):
        standalone_sink(env_df, [sys.executable, "-u", str(nacker)])


# --- resource sandbox (rlimit caps — the WASM capability-cap analog) --


def test_sandbox_memory_cap_kills_hungry_source(spark, tmp_path):
    """A plugin that tries to allocate past max_memory_bytes dies
    (MemoryError or startup failure under the cap) and the source
    surfaces it as a failed read, not silence."""
    hog = tmp_path / "hog.py"
    hog.write_text(
        "import sys\n"
        "sys.stdin.readline()\n"
        "b = bytearray(1024 * 1024 * 1024)\n"  # 1 GiB vs 512 MiB cap
        "print('{}')\n"
    )
    with pytest.raises(RuntimeError, match="exited"):
        standalone_source(
            spark,
            [sys.executable, "-u", str(hog)],
            sandbox={"max_memory_bytes": 512 * 1024 * 1024},
        )


def test_sandbox_cpu_cap_kills_spinner(spark, tmp_path):
    spinner = tmp_path / "spin.py"
    spinner.write_text(
        "import sys\nsys.stdin.readline()\nwhile True: pass\n"
    )
    with pytest.raises(RuntimeError, match="exited"):
        standalone_source(
            spark,
            [sys.executable, "-u", str(spinner)],
            sandbox={"max_cpu_seconds": 1},
        )


def test_sandbox_wall_timeout_kills_hung_source(spark, tmp_path):
    """rlimits don't catch a plugin that blocks forever without
    burning CPU; wall_timeout_seconds does."""
    sleeper = tmp_path / "sleep.py"
    sleeper.write_text(
        "import sys, time\nsys.stdin.readline()\ntime.sleep(600)\n"
    )
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="exited"):
        standalone_source(
            spark,
            [sys.executable, "-u", str(sleeper)],
            sandbox={"wall_timeout_seconds": 2},
        )
    assert time.monotonic() - t0 < 60


def test_sandbox_unknown_key_is_config_error(spark, plugins):
    src, _ = plugins
    with pytest.raises(ValueError, match="unknown sandbox keys"):
        standalone_source(
            spark,
            [sys.executable, "-u", src],
            sandbox={"max_memory": 1},  # typo'd key must not no-op
        )


def test_sandbox_passes_through_settings_block(spark, plugins):
    """sandbox declared inside settings: (the YAML route) is consumed
    by the engine, NOT forwarded to the child, and a well-behaved
    plugin runs to completion under generous caps."""
    src, _ = plugins
    df = standalone_source(
        spark,
        [sys.executable, "-u", src],
        settings={
            "recordCount": 3,
            "sandbox": {"max_cpu_seconds": 60, "wall_timeout_seconds": 120},
        },
    )
    assert len(df.collect()) == 3


def test_sandbox_applies_to_custom_subprocess_processor(spark, tmp_path):
    """The processor route (custom.standalone → custom_subprocess)
    enforces the same caps: a spinning child dies under the CPU cap
    and the task fails instead of hanging the executor."""
    from conduit_spark.operators import custom_subprocess

    spinner = tmp_path / "spin_proc.py"
    spinner.write_text("while True: pass\n")
    df = spark.range(5).selectExpr("CAST(id AS STRING) AS payload_after_json")
    out = custom_subprocess(
        df,
        [sys.executable, "-u", str(spinner)],
        sandbox={"max_cpu_seconds": 1},
    )
    with pytest.raises(Exception, match="closed stdout|SparkException|Py4J"):
        out.collect()


def test_feeder_failure_surfaces_instead_of_hanging(spark, tmp_path):
    """A child that stops reading stdin without exiting or answering
    (closes fd 0, then sleeps) breaks the feeder thread with EPIPE; the
    reader loop must surface that error within its poll tick rather
    than block forever on stdout answers that can never come."""
    import time

    from conduit_spark.operators import custom_subprocess

    deaf = tmp_path / "deaf_proc.py"
    deaf.write_text("import os, time\nos.close(0)\ntime.sleep(120)\n")
    # payload must overflow the 64 KiB pipe buffer so the feeder is
    # still writing when the child's stdin closes → EPIPE in the
    # feeder thread, surfaced by the reader's poll tick
    df = (
        spark.range(2000)
        .selectExpr("repeat('x', 1024) AS payload_after_json")
        .coalesce(1)
    )
    out = custom_subprocess(df, [sys.executable, "-u", str(deaf)])
    t0 = time.monotonic()
    with pytest.raises(Exception, match="feeding|closed stdout|SparkException|Py4J"):
        out.collect()
    assert time.monotonic() - t0 < 60, "reader blocked instead of surfacing feeder error"
