"""Dev hot-reload: live processor swap at the micro-batch boundary
(no restart) vs restart-class changes, and the parse-error-keeps-
running guarantee."""

from __future__ import annotations

import json
import os
import time

from conduit_spark.pipeline.config import parse_yaml
from conduit_spark.pipeline.deploy import plan_diff
from conduit_spark.pipeline.dev import DevSession, classify_live
from conduit_spark.pipeline.runtime import Pipeline


def _yaml(src_dir, out, value="v1", extra=""):
    return f"""
version: "2.2"
pipelines:
  - id: dev1
    connectors:
      - id: f
        type: source
        plugin: builtin:file
        settings: {{path: "{src_dir}", format: text}}
      - id: d
        type: destination
        plugin: builtin:file
        settings: {{path: "{out}", format: json, mode: append}}
    processors:
      - id: stamp
        plugin: field.set
        settings: {{field: .Metadata.stamp, value: "{value}"}}
{extra}"""


def test_classify_live_line():
    base = parse_yaml(_yaml("/in", "/out"))[0]

    def diff_to(text):
        return plan_diff(base, parse_yaml(text)[0])

    # processor settings update: live
    assert classify_live(diff_to(_yaml("/in", "/out", value="v2")))
    # metadata-only: live
    live = parse_yaml(_yaml("/in", "/out"))[0]
    live.name = "renamed"
    assert classify_live(plan_diff(base, live))
    # connector settings change: restart
    assert not classify_live(diff_to(_yaml("/other", "/out")))
    # processor ADD (topological): restart
    extra = (
        "      - id: second\n"
        "        plugin: field.set\n"
        "        settings: {field: .Metadata.x, value: y}\n"
    )
    assert not classify_live(diff_to(_yaml("/in", "/out", extra=extra)))
    # plugin swap on the same processor id: restart
    swapped = parse_yaml(_yaml("/in", "/out"))[0]
    swapped.processors[0].plugin = "field.exclude"
    swapped.processors[0].settings = {"fields": ".Metadata.stamp"}
    assert not classify_live(plan_diff(base, swapped))


def _read_rows(out):
    rows = []
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.startswith((".", "_")):
                continue
            with open(os.path.join(root, f)) as fh:
                rows.extend(json.loads(x) for x in fh if x.strip())
    return rows


def test_live_swap_at_batch_boundary(spark, tmp_path):
    """Edit the processor config between micro-batches: the next batch
    uses the new chain, on the SAME pipeline + checkpoint (no rebuild,
    no restart, no replay)."""
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cfg_file = tmp_path / "p.yaml"
    cfg_file.write_text(_yaml(src_dir, out, value="v1"))

    restarts = []
    session = DevSession(str(cfg_file), live_pipelines={}, restart=lambda c, d: restarts.append(c.id))
    (cfg,) = session.prime()
    p = Pipeline(spark, cfg)
    session.live_pipelines[cfg.id] = p

    (src_dir / "a.txt").write_text("one\n")
    p.run_streaming(ckpt, trigger_once=True, live_processors=True)

    # edit: processor value v1 -> v2 (live-swappable)
    time.sleep(0.01)  # ensure mtime moves even on coarse filesystems
    cfg_file.write_text(_yaml(src_dir, out, value="v2"))
    os.utime(cfg_file)
    (r,) = session.poll()
    assert r.action == "live_swap" and restarts == []

    (src_dir / "b.txt").write_text("two\n")
    p.run_streaming(ckpt, trigger_once=True, live_processors=True)

    rows = _read_rows(out)
    stamps = sorted(r_["metadata"].get("stamp") for r_ in rows)
    assert len(rows) == 2  # checkpoint continuity: no replay of batch 1
    assert stamps == ["v1", "v2"]

    # restart-class edit routes through the restart callback
    time.sleep(0.01)
    cfg_file.write_text(_yaml(tmp_path / "elsewhere", out, value="v2"))
    os.utime(cfg_file)
    (r,) = session.poll()
    assert r.action == "restart" and restarts == ["dev1"]


def test_parse_error_keeps_last_good_config(tmp_path):
    cfg_file = tmp_path / "p.yaml"
    cfg_file.write_text(_yaml("/in", "/out"))
    session = DevSession(str(cfg_file), live_pipelines={}, restart=lambda c, d: None)
    session.prime()
    time.sleep(0.01)
    cfg_file.write_text("pipelines: [{]")
    os.utime(cfg_file)
    (r,) = session.poll()
    assert r.action == "parse_error" and "keeping last good config" in r.detail
    # fixing the file recovers the loop
    time.sleep(0.01)
    cfg_file.write_text(_yaml("/in", "/out", value="v3"))
    os.utime(cfg_file)
    (r,) = session.poll()
    assert r.action in ("live_swap", "restart")
    # unchanged file: quiet
    assert session.poll()[0].action == "none"
