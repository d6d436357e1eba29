"""CLI control-plane tests: list / list --json / describe.

The reference's operability surface is `conduit pipelines ls|describe`
plus PipelineService.List/Get (proto/api/v1/api.proto:318+); the CLI
analogs here must stay machine-readable and must never leak secrets.
No SparkSession involved — pure config-plane.
"""

from __future__ import annotations

import json

import pytest

from conduit_spark import cli

PIPELINE_YAML = """
version: "2.2"
pipelines:
  - id: demo
    status: running
    description: test pipeline
    connectors:
      - id: src
        type: source
        plugin: builtin:generator
        settings: {recordCount: 10, format.options: {id: int}}
      - id: dst
        type: destination
        plugin: builtin:postgres
        settings: {url: jdbc:derby:memory:x, password: hunter2, table: t}
    processors:
      - id: keep
        plugin: filter
        condition: '{{ eq .Payload.After.id 1 }}'
    dead-letter-queue:
      plugin: builtin:log
      settings: {apiKey: sk-123}
"""


@pytest.fixture()
def pipeline_file(tmp_path):
    f = tmp_path / "p.yaml"
    f.write_text(PIPELINE_YAML)
    return str(f)


def test_list_plain(pipeline_file, capsys):
    assert cli.main(["list", "--pipelines", pipeline_file]) == 0
    out = capsys.readouterr().out
    assert "demo" in out and "builtin:generator" in out and "builtin:postgres" in out


def test_list_json(pipeline_file, capsys):
    assert cli.main(["list", "--pipelines", pipeline_file, "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert [r["id"] for r in rows] == ["demo"]
    assert rows[0]["sources"] == [{"id": "src", "plugin": "builtin:generator"}]
    assert rows[0]["processors"] == ["filter"]
    assert rows[0]["dlq"] == "builtin:log"


def test_describe_full_detail(pipeline_file, capsys):
    assert cli.main(["describe", "--pipelines", pipeline_file]) == 0
    rows = json.loads(capsys.readouterr().out)
    (p,) = rows
    assert p["id"] == "demo" and p["description"] == "test pipeline"
    conns = {c["id"]: c for c in p["connectors"]}
    assert conns["src"]["type"] == "source"
    assert conns["dst"]["settings"]["table"] == "t"
    assert p["processors"][0]["plugin"] == "filter"
    assert p["processors"][0]["condition"].startswith("{{")
    assert p["dlq"]["plugin"] == "builtin:log"


def test_describe_redacts_secrets(pipeline_file, capsys):
    cli.main(["describe", "--pipelines", pipeline_file])
    out = capsys.readouterr().out
    assert "hunter2" not in out and "sk-123" not in out
    rows = json.loads(out)
    conns = {c["id"]: c for c in rows[0]["connectors"]}
    assert conns["dst"]["settings"]["password"] == "***"
    assert rows[0]["dlq"]["settings"]["apiKey"] == "***"


def test_describe_by_id_and_missing(pipeline_file, capsys):
    assert cli.main(["describe", "--pipelines", pipeline_file, "--id", "demo"]) == 0
    capsys.readouterr()
    assert (
        cli.main(["describe", "--pipelines", pipeline_file, "--id", "nope"]) == 1
    )
    assert "not found" in capsys.readouterr().err


def test_validate_ok_and_invalid(pipeline_file, tmp_path, capsys):
    assert cli.main(["validate", "--pipelines", pipeline_file]) == 0
    assert "ok demo" in capsys.readouterr().out
    bad = tmp_path / "bad.yaml"
    bad.write_text("version: '2.2'\npipelines: [{nope: 1}]\n")
    assert cli.main(["validate", "--pipelines", str(bad)]) == 1
    assert "INVALID" in capsys.readouterr().err
    # directory mode: one good + one bad → nonzero but good one listed
    (tmp_path / "good.yaml").write_text(PIPELINE_YAML)
    assert cli.main(["validate", "--pipelines", str(tmp_path)]) == 1
    captured = capsys.readouterr()
    assert "ok demo" in captured.out and "bad.yaml" in captured.err


def test_init_scaffold_validates(tmp_path, capsys):
    out = str(tmp_path / "p.yaml")
    assert cli.main(["init", "--id", "scaffolded", "--path", out]) == 0
    capsys.readouterr()
    assert cli.main(["validate", "--pipelines", out]) == 0
    assert "ok scaffolded" in capsys.readouterr().out
    # refuses to clobber without --force
    assert cli.main(["init", "--id", "scaffolded", "--path", out]) == 1
    assert cli.main(["init", "--id", "scaffolded", "--path", out, "--force"]) == 0


def test_describe_directory(tmp_path, capsys):
    (tmp_path / "a.yaml").write_text(PIPELINE_YAML)
    (tmp_path / "bad.yaml").write_text("version: '2.2'\npipelines: [{nope: 1}]\n")
    assert cli.main(["describe", "--pipelines", str(tmp_path)]) == 0
    captured = capsys.readouterr()
    rows = json.loads(captured.out)
    assert [r["id"] for r in rows] == ["demo"]
    # the malformed file is reported, not fatal (provisioning isolation)
    assert "bad.yaml" in captured.err


def test_cli_plan_audits_query(capsys):
    import json

    from conduit_spark.cli import main

    rc = main(["plan", "q1_pricing_summary", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["smells"] == []
    assert out["pushed_filters"]  # shipdate filter reached the scan


def test_cli_plan_unknown_query(capsys):
    from conduit_spark.cli import main

    assert main(["plan", "nope", "--json"]) == 1
    assert "unknown query" in capsys.readouterr().err


def test_audit_plan_scalar_aggs_benign_and_waivers(spark):
    """A unioned pair of scalar aggregates (two SinglePartition
    exchanges, both feeding keys=[] partial aggs) must not smell; a
    declared waiver moves the smell out of the failure set."""
    import pyspark.sql.functions as F

    from conduit_spark.plans import audit_plan

    df = spark.range(100)
    scalars = df.agg(F.count(F.lit(1)).alias("v")).unionAll(
        df.agg(F.sum("id").alias("v"))
    )
    audit = audit_plan(scalars)
    assert audit["single_partition_exchanges"] == 0
    assert audit["smells"] == []

    from conduit_spark.analytics.chunking import c_pack_blocks
    from conduit_spark.plans import barriers_disabled

    # Build under barriers_disabled like the CLI audit entry points do
    # (cli.py plan/audit): since r15 every presentation sort ends in
    # ordered_result's checkpoint, so an audit on a barrier-mode build
    # sees only the post-checkpoint sort fragment (the r7 blind-audit
    # class this contract exists to prevent).
    with barriers_disabled():
        audit = audit_plan(
            c_pack_blocks(spark, "/root/testdata/sf0.001"),
            query="c_pack_blocks",
        )
        audit_anon = audit_plan(c_pack_blocks(spark, "/root/testdata/sf0.001"))
    assert audit["smells"] == []
    assert set(audit["waived"]) == {"global-window", "single-partition-exchange"}
    # without the query name the same plan DOES fail the audit
    assert "single-partition-exchange" in audit_anon["smells"]


def test_cli_version(capsys):
    import json as _json

    from conduit_spark import __version__, cli

    assert cli.main(["version"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["version"] == __version__ and out["os"] == "linux"


def test_cli_doctor(capsys):
    from conduit_spark import cli

    assert cli.main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "[ok ] pyspark" in out and "[ok ] java" in out


def test_cli_deploy_plan_and_apply(tmp_path, capsys):
    """deploy drives the HTTP plan/apply routes end-to-end: first call
    reports the change set, --apply executes it, re-plan is a no-op."""
    import threading

    from conduit_spark import cli
    from conduit_spark.http_api import ControlPlane, start_server
    from conduit_spark.pipeline.config import parse_yaml

    base = """
version: "2.2"
pipelines:
  - id: dep
    connectors:
      - id: src
        type: source
        plugin: builtin:generator
        settings: {recordCount: 5, format.options: {id: int}}
      - id: out
        type: destination
        plugin: builtin:log
"""
    desired = base.replace("recordCount: 5", "recordCount: 9")

    def runner(cfg, stop):
        stop.wait(timeout=5)
        return "stopped"

    plane = ControlPlane(parse_yaml(base), runner=runner)
    srv = start_server(plane)
    port = srv.server_address[1]
    try:
        f = tmp_path / "p.yaml"
        f.write_text(desired)
        server = f"http://127.0.0.1:{port}"
        # plan-only prints the change and does not apply
        assert cli.main(["deploy", "--pipelines", str(f), "--server", server]) == 0
        out = capsys.readouterr().out
        assert "update connector dep:src (restart) [settings.recordCount]" in out
        assert "plan only" in out
        assert plane.export_pipeline("dep")["connectors"][0]["settings"][
            "recordCount"
        ] == 5
        # --apply executes it
        assert (
            cli.main(
                ["deploy", "--pipelines", str(f), "--server", server, "--apply"]
            )
            == 0
        )
        assert "applied 1 change(s)" in capsys.readouterr().out
        assert plane.export_pipeline("dep")["connectors"][0]["settings"][
            "recordCount"
        ] == 9
        # now up to date
        assert cli.main(["deploy", "--pipelines", str(f), "--server", server]) == 0
        assert "up to date" in capsys.readouterr().out
    finally:
        srv.shutdown()


def test_cli_lint(tmp_path, capsys):
    from conduit_spark import cli

    good = tmp_path / "good.yaml"
    good.write_text(
        """
version: "2.2"
pipelines:
  - id: ok
    connectors:
      - id: s
        type: source
        plugin: builtin:generator
      - id: d
        type: destination
        plugin: builtin:log
"""
    )
    assert cli.main(["lint", str(good)]) == 0
    assert "ok" in capsys.readouterr().out

    warny = tmp_path / "warny.yaml"
    warny.write_text(
        """
version: "1.1"
pipelines:
  - id: legacy
    frobnicate: true
    connectors:
      - id: s
        type: source
        plugin: builtin:generator
        retries: 3
    processors:
      - id: p
        type: filter
"""
    )
    # advisory only -> exit 0; --strict escalates to 2
    assert cli.main(["lint", str(warny)]) == 0
    out = capsys.readouterr().out
    assert "deprecated" in out  # version 1.x migration warning
    assert "unknown field 'frobnicate'" in out
    assert "unknown field 'retries'" in out
    assert "deprecated v1 'type:'" in out
    assert cli.main(["lint", str(warny), "--strict"]) == 2
    capsys.readouterr()

    broken = tmp_path / "broken.yaml"
    broken.write_text("pipelines:\n  - connectors: {]\n")
    assert cli.main(["lint", str(broken)]) == 1
    assert "FAIL" in capsys.readouterr().out


def test_cli_dry_run(tmp_path, capsys):
    import json as _json

    from conduit_spark import cli

    f = tmp_path / "p.yaml"
    f.write_text(
        """
version: "2.2"
pipelines:
  - id: dr
    connectors:
      - id: s
        type: source
        plugin: builtin:generator
        settings: {recordCount: 3, format.options: {id: int}}
      - id: d
        type: destination
        plugin: builtin:log
    processors:
      - id: p1
        plugin: filter
        condition: 'x'
"""
    )
    assert cli.main(["dry-run", str(f)]) == 0
    doc = _json.loads(capsys.readouterr().out)
    # enriched graph: injected DLQ default + final node ids
    assert doc["dlq"]["plugin"] == "builtin:log"
    assert [c["id"] for c in doc["connectors"]] == ["s", "d"]
    assert doc["dry_run"] == {"problems": [], "advisories": []}

    bad = tmp_path / "bad.yaml"
    bad.write_text(
        """
version: "2.2"
pipelines:
  - id: dr2
    connectors:
      - id: s
        type: source
        plugin: builtin:nosuch
      - id: d
        type: destination
        plugin: ./my-connector.sh
    processors:
      - id: p1
        plugin: not.a.processor
"""
    )
    assert cli.main(["dry-run", str(bad)]) == 1
    out = capsys.readouterr()
    doc = _json.loads(out.out)
    assert any("builtin:nosuch" in p for p in doc["dry_run"]["problems"])
    assert any("not.a.processor" in p for p in doc["dry_run"]["problems"])
    assert any("my-connector.sh" in a for a in doc["dry_run"]["advisories"])
    # --no-resolve-plugins downgrades everything to offline-parse only
    assert cli.main(["dry-run", str(bad), "--no-resolve-plugins"]) == 0


def test_init_template_gallery(tmp_path, capsys):
    """Every gallery template scaffolds a file that parses clean and
    survives dry-run offline plugin resolution (standalone templates
    are advisory-only, never hard failures)."""
    import json as _json

    from conduit_spark import cli
    from conduit_spark.pipeline.templates import TEMPLATES

    assert cli.main(["init", "--list-templates"]) == 0
    listing = capsys.readouterr().out
    assert all(name in listing for name in TEMPLATES)

    for name in TEMPLATES:
        out = tmp_path / f"{name}.yaml"
        assert (
            cli.main(
                ["init", "--id", f"t-{name}", "--path", str(out),
                 "--template", name]
            )
            == 0
        )
        capsys.readouterr()
        assert cli.main(["validate", "--pipelines", str(out)]) == 0
        assert cli.main(["lint", str(out), "--strict"]) == 0
        capsys.readouterr()
        rc = cli.main(["dry-run", str(out)])
        doc = _json.loads(capsys.readouterr().out)
        if name == "standalone-source":
            # not installed yet: resolution is advisory for standalone
            assert doc["dry_run"]["problems"] == [] or rc == 1
        else:
            assert rc == 0 and doc["dry_run"]["problems"] == []

    assert cli.main(["init", "--template", "nope", "--path", str(tmp_path / "x")]) == 1


def test_graceful_shutdown_handler_unit():
    class FakeQuery:
        def __init__(self):
            self.stopped = False

        def stop(self):
            self.stopped = True

    from conduit_spark.cli import install_graceful_shutdown

    qs = [FakeQuery(), FakeQuery()]
    handler = install_graceful_shutdown(qs)
    assert not handler.done.is_set()
    handler(15, None)
    assert handler.done.wait(timeout=10)
    assert all(q.stopped for q in qs)


def test_sigterm_drains_streaming_run(tmp_path):
    """docker-stop semantics: SIGTERM to a continuous `run --streaming`
    stops the query at a batch boundary and exits 0 with committed
    checkpoints — not the default immediate kill."""
    import signal
    import subprocess
    import sys as _sys
    import time as _time

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("one\ntwo\n")
    f = tmp_path / "p.yaml"
    f.write_text(
        f"""
version: "2.2"
pipelines:
  - id: sig
    connectors:
      - id: s
        type: source
        plugin: builtin:file
        settings: {{path: "{src}", format: text}}
      - id: d
        type: destination
        plugin: builtin:file
        settings: {{path: "{tmp_path / 'out'}", format: json, mode: append}}
"""
    )
    proc = subprocess.Popen(
        [
            _sys.executable, "-m", "conduit_spark", "run",
            "--pipelines", str(f), "--streaming",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd="/root/repo",
    )
    # wait for the stream to come up, then deliver SIGTERM
    deadline = _time.time() + 120
    up = False
    while _time.time() < deadline:
        line = proc.stdout.readline()
        if "streaming started" in line:
            up = True
            break
    assert up, "stream never started"
    # wait for at least one committed micro-batch before signaling
    commits_dir = tmp_path / "ckpt" / "sig" / "commits"
    while _time.time() < deadline:
        if commits_dir.is_dir() and list(commits_dir.iterdir()):
            break
        _time.sleep(0.5)
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=60)
    err = proc.stderr.read()
    assert "draining 1 stream(s)" in err
    assert rc == 0
    # the drained checkpoint has committed batches
    commits = tmp_path / "ckpt" / "sig" / "commits"
    assert commits.is_dir() and len(list(commits.iterdir())) >= 1


def test_cli_docs_llms_txt(tmp_path, capsys):
    """llms.txt is generated from the live registries — every verb,
    plugin, route, and template appears; nothing can drift."""
    from conduit_spark import cli
    from conduit_spark.http_api import _ROUTES
    from conduit_spark.pipeline.registry import (
        CONNECTOR_PLUGINS,
        PROCESSOR_PLUGINS,
    )
    from conduit_spark.pipeline.templates import TEMPLATES

    out = tmp_path / "llms.txt"
    assert cli.main(["docs", "--out", str(out)]) == 0
    text = out.read_text()
    for k in PROCESSOR_PLUGINS:
        assert f"- {k}:" in text
    for k in CONNECTOR_PLUGINS:
        assert f"- {k} (" in text
    for name in TEMPLATES:
        assert f"- {name}:" in text
    for _m, rx, _op in _ROUTES:
        assert rx.pattern.strip("^$") in text
    for verb in ("run", "deploy", "repair", "mcp", "dev", "connectors"):
        assert f"- {verb}:" in text


def test_cli_config(capsys):
    import json as _json

    from conduit_spark import cli
    from conduit_spark.session import _DEFAULTS, _RUNTIME_REQUIRED

    assert cli.main(["config"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["session_defaults"] == dict(_DEFAULTS)
    assert out["runtime_required"] == dict(_RUNTIME_REQUIRED)
    assert "SPARK_GRAFT_CPUS" in out["env"]


def test_cli_profile_and_drift(spark, tmp_path, capsys):
    """profile writes a baseline; the same corpus diffs clean (exit 0)
    and a broken ingest exits 3 naming the drifted metrics."""
    import json as _json

    import pyspark.sql.functions as F

    from conduit_spark import cli

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    baseline = tmp_path / "baseline.json"
    assert (
        cli.main(
            ["profile", "/root/testdata/sf0.001/documents.parquet",
             "--out", str(baseline)]
        )
        == 0
    )
    capsys.readouterr()
    assert _json.loads(baseline.read_text())["n_docs"] == docs.count()
    # identity diff: clean
    assert (
        cli.main(
            ["profile", "/root/testdata/sf0.001/documents.parquet",
             "--baseline", str(baseline)]
        )
        == 0
    )
    capsys.readouterr()
    # broken ingest: truncated text
    broken_path = str(tmp_path / "broken")
    docs.select(
        "doc_id", F.substring("text", 1, 5).alias("text"), "lang", "source"
    ).write.parquet(broken_path)
    assert cli.main(["profile", broken_path, "--baseline", str(baseline)]) == 3
    out = capsys.readouterr()
    assert "DRIFT:" in out.err and "mean_len" in out.err


def test_cli_lifecycle_verbs(capsys):
    """start/stop/restart by id against a running server; transition
    guards surface as exit 2 with the server's error."""
    import threading

    from conduit_spark import cli
    from conduit_spark.http_api import ControlPlane, start_server
    from conduit_spark.pipeline.config import parse_yaml

    def runner(cfg, stop):
        stop.wait(timeout=10)
        return "stopped"

    plane = ControlPlane(parse_yaml(PIPELINE_YAML), runner=runner)
    srv = start_server(plane)
    server = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert cli.main(["start", "demo", "--server", server]) == 0
        assert "demo: running" in capsys.readouterr().out
        # double start → transition guard
        assert cli.main(["start", "demo", "--server", server]) == 2
        assert "already running" in capsys.readouterr().err
        assert cli.main(["restart", "demo", "--server", server]) == 0
        out = capsys.readouterr().out
        assert "demo: stopped" in out and "demo: running" in out
        assert plane.status("demo") == "running"
        assert cli.main(["stop", "demo", "--server", server]) == 0
        capsys.readouterr()
        assert cli.main(["start", "ghost", "--server", server]) == 2
    finally:
        srv.shutdown()


def test_validate_and_lint_json_output(tmp_path, capsys):
    """--json on validate/lint (structured-output convention): one
    machine-readable object, same exit codes as the prose rendering."""
    import json

    good = tmp_path / "good.yaml"
    good.write_text(
        "version: '2.2'\npipelines:\n  - id: ok1\n    connectors:\n"
        "      - {id: g, type: source, plugin: 'builtin:generator',\n"
        "         settings: {recordCount: 1, 'format.options': {id: int}}}\n"
        "      - {id: o, type: destination, plugin: 'builtin:log', settings: {}}\n"
    )
    bad = tmp_path / "bad.yaml"
    bad.write_text("pipelines: 'not a list'")

    assert cli.main(["validate", "--pipelines", str(tmp_path), "--json"]) == 1
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] == ["ok1"]
    assert list(out["errors"]) == [str(bad)]

    rc = cli.main(["lint", str(tmp_path), "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1  # the bad file is a failure
    assert out["failures"] == 1
    by_file = {r["file"]: r for r in out["files"]}
    assert by_file[str(good)]["status"] == "ok"
    assert by_file[str(bad)]["status"] == "fail"


def test_cli_open_prints_urls(capsys):
    from conduit_spark import cli

    assert cli.main(["open", "docs", "--print"]) == 0
    assert capsys.readouterr().out.strip().startswith("file://")
    assert cli.main(["open", "metrics", "--print", "--port", "9999"]) == 0
    assert capsys.readouterr().out.strip() == "http://localhost:9999/metrics"


def test_cli_quickstart_once_is_ephemeral(capsys, monkeypatch):
    """The demo runs one bounded batch, prints flowing records, and
    leaves nothing behind in the working directory or the temp root."""
    import glob

    from conduit_spark import cli

    before = set(glob.glob("/tmp/conduit-quickstart-*"))
    assert cli.main(["quickstart", "--once", "--count", "5"]) == 0
    out = capsys.readouterr().out
    assert "airline" in out  # records visibly flowed to the console
    assert "delivered={'destination': 5}" in out
    assert set(glob.glob("/tmp/conduit-quickstart-*")) == before  # cleaned up
