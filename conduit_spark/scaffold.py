"""Connector/processor project scaffolding — the reference's
``pkg/scaffold`` (scaffold.go:50 ``Generate``, preflight.go:48,
request.go:45, codes.go) re-expressed for the engine's standalone
plugin protocol (JSON-lines over stdin/stdout, any language —
sources/standalone.py, operators/custom.py).

``generate(req)`` runs the same step pipeline as the reference:

  validate → toolchain preflight → extract template → rewrite
  module/name → build → selftest → git init → atomic rename

with the same guarantees:

- **Atomicity / no-partial-directory** (scaffold.go:37-49): every
  write goes to a hidden temp directory created as a *sibling* of the
  destination (same filesystem, so the final ``os.rename`` is
  near-instant), removed on any hard failure. The destination either
  does not exist or is a complete, self-tested scaffold.
- **Stable error codes** (codes.go:28-73): every hard failure is a
  :class:`ScaffoldError` carrying one of the ``scaffold.*`` codes so
  ``--json`` consumers and exit-code routing never parse message text.
- **Per-step results** (request.go:88-108 ``StepResult``): the result
  carries ``steps[]`` with name / ok / durationMs / message.
- **Preflight as its own step** (preflight.go:48-55): interpreter at
  the minimum version, git on PATH (only when git init is requested),
  parent directory writable, and stdlib ``zipapp`` importable — the
  build-toolchain analog of the reference's "Go on PATH at the
  minimum version". All failures are summarized in ONE
  ``scaffold.toolchain_unavailable`` error with joined suggestions.
- **Verified-building output** (scaffold.go steps.Build): the staged
  tree must pass ``python build.py`` (→ ``dist/<name>.pyz``, a
  single-file executable artifact the plugin registry can sign,
  index, and install) *and* ``python selftest.py`` (a protocol
  self-test: source emits valid envelopes, destination acks,
  processor answers line-for-line) before the rename — a scaffold
  that doesn't speak the protocol is never delivered.
- **git init is best-effort** (scaffold_test.go's downgrade
  semantics): a git failure is recorded in its StepResult message,
  not a scaffold failure.

Language gate: ``python`` is the only target (the reference gates on
Go the same way — codes.go:44 ``CodeUnsupportedLanguage``; its design
doc calls Python "blocked on a connector SDK that does not exist
yet"; here the positions flip).
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
from dataclasses import dataclass, field

# --- stable error codes (codes.go) ------------------------------------

CODE_TOOLCHAIN = "scaffold.toolchain_unavailable"
CODE_INVALID_NAME = "scaffold.invalid_name"
CODE_INVALID_MODULE = "scaffold.invalid_module"
CODE_UNSUPPORTED_LANGUAGE = "scaffold.unsupported_language"
CODE_UNSUPPORTED_KIND = "scaffold.unsupported_kind"
CODE_DESTINATION_EXISTS = "scaffold.destination_exists"
CODE_BUILD_FAILED = "scaffold.build_failed"
CODE_SELFTEST_FAILED = "scaffold.selftest_failed"
CODE_WRITE_FAILED = "scaffold.write_failed"


class ScaffoldError(Exception):
    """A hard scaffold failure with a stable ``scaffold.*`` code and an
    optional remediation suggestion (conduiterr.ConduitError analog)."""

    def __init__(self, code: str, message: str, suggestion: str = ""):
        super().__init__(f"{code}: {message}")
        self.code = code
        self.message = message
        self.suggestion = suggestion


# --- request / result (request.go) ------------------------------------

MIN_PYTHON = (3, 10)

KINDS = ("connector", "processor")

# Step names — exported so CLI rendering / --json consumers switch on
# these instead of duplicating literals (request.go:83).
STEP_TOOLCHAIN = "toolchain"
STEP_EXTRACT = "extract_template"
STEP_REWRITE = "rewrite_module"
STEP_BUILD = "build"
STEP_SELFTEST = "selftest"
STEP_GIT = "git_init"

_NAME_RE = re.compile(r"^[a-z][a-z0-9_]*$")


@dataclass
class Request:
    """Input to :func:`generate` (request.go:45 ``Request``)."""

    kind: str = "connector"
    name: str = ""
    language: str = "python"
    # Distribution/module name; defaults to conduit-<kind>-<name> and,
    # when given, must end with that suffix (the reference's
    # setup.sh-contract shape check, codes.go:36).
    module: str = ""
    path: str = ""
    git: bool = True
    # Skip build+selftest (the reference's --skip-generate escape
    # hatch; the template still ships runnable code).
    skip_build: bool = False
    force: bool = False


@dataclass
class StepResult:
    name: str
    ok: bool
    duration_ms: int
    message: str = ""

    def as_dict(self) -> dict:
        d = {"name": self.name, "ok": self.ok, "durationMs": self.duration_ms}
        if self.message:
            d["message"] = self.message
        return d


@dataclass
class Result:
    kind: str
    language: str
    name: str
    module: str
    path: str
    artifact: str
    steps: list[StepResult] = field(default_factory=list)
    elapsed_ms: int = 0
    next_steps: list[str] = field(default_factory=list)

    def as_dict(self) -> dict:
        return {
            "kind": self.kind,
            "language": self.language,
            "name": self.name,
            "module": self.module,
            "path": self.path,
            "artifact": self.artifact,
            "steps": [s.as_dict() for s in self.steps],
            "elapsedMs": self.elapsed_ms,
            "nextSteps": self.next_steps,
        }


def validate(req: Request) -> Request:
    """Normalize + validate a request; raises with a stable code on
    every reject (request.go validate)."""
    if req.kind not in KINDS:
        raise ScaffoldError(
            CODE_UNSUPPORTED_KIND,
            f"kind must be one of {KINDS}, got {req.kind!r}",
        )
    if req.language != "python":
        raise ScaffoldError(
            CODE_UNSUPPORTED_LANGUAGE,
            f"language {req.language!r} is not supported; only 'python' "
            "produces a scaffold today",
            suggestion="any language can IMPLEMENT the JSON-lines plugin "
            "protocol; scaffold templates exist for python only",
        )
    if not _NAME_RE.match(req.name or ""):
        raise ScaffoldError(
            CODE_INVALID_NAME,
            f"name {req.name!r} must match {_NAME_RE.pattern} (it becomes "
            "the python package name)",
        )
    want_suffix = f"conduit-{req.kind}-{req.name}"
    if not req.module:
        req.module = want_suffix
    elif not req.module.endswith(want_suffix):
        raise ScaffoldError(
            CODE_INVALID_MODULE,
            f"module {req.module!r} must end with {want_suffix!r} "
            "(matching kind and name)",
        )
    if not req.path:
        req.path = os.path.join(os.getcwd(), want_suffix)
    req.path = os.path.abspath(req.path)
    return req


# --- preflight (preflight.go) -----------------------------------------


def preflight_checks(*, need_git: bool = True) -> list[dict]:
    """Run the toolchain preflight; one finding dict per check.

    The reference checks Go-at-min-version / git-on-PATH /
    GOPATH-bin-writable (preflight.go:48-55); the engine's analogs are
    the interpreter version, git (only when git init is requested),
    a writable tempdir (the staging-write probe), and stdlib
    ``zipapp`` (the artifact build tool)."""
    checks: list[dict] = []

    def add(name: str, ok: bool, message: str, suggestion: str = "") -> None:
        checks.append(
            {"name": name, "ok": ok, "message": message, "suggestion": suggestion}
        )

    v = sys.version_info
    add(
        "python_version",
        (v.major, v.minor) >= MIN_PYTHON,
        f"python {v.major}.{v.minor}.{v.micro} "
        f"(minimum {'.'.join(map(str, MIN_PYTHON))})",
        "install python >= %s" % ".".join(map(str, MIN_PYTHON)),
    )
    if need_git:
        git = shutil.which("git")
        add("git_on_path", git is not None, f"git: {git or 'not found'}",
            "install git or pass --no-git")
    try:
        fd, probe = tempfile.mkstemp(prefix=".conduit-preflight-")
        os.close(fd)
        os.unlink(probe)
        add("tmp_writable", True, "temp directory writable", "")
    except OSError as e:  # pragma: no cover - environment-specific
        add("tmp_writable", False, f"temp directory not writable: {e}",
            "fix TMPDIR permissions")
    try:
        import zipapp  # noqa: F401

        add("zipapp", True, "stdlib zipapp available", "")
    except ImportError as e:  # pragma: no cover - stdlib always present
        add("zipapp", False, f"zipapp unavailable: {e}", "reinstall python")
    return checks


def preflight(*, need_git: bool = True) -> list[dict]:
    """Raise ONE summarizing ``toolchain_unavailable`` error when any
    check failed — the whole preflight passes or fails as one
    environment bucket (preflight.go:68-76's deliberate choice)."""
    checks = preflight_checks(need_git=need_git)
    failed = [c for c in checks if not c["ok"]]
    if failed:
        raise ScaffoldError(
            CODE_TOOLCHAIN,
            "toolchain preflight failed: "
            + "; ".join(c["message"] for c in failed),
            suggestion="; ".join(
                c["suggestion"] for c in failed if c["suggestion"]
            ),
        )
    return checks


# --- templates (pkg/scaffold/template) --------------------------------
#
# Files are written with placeholder tokens and then rewritten in a
# separate step (template/rewrite.go's model: extract a pinned
# snapshot, THEN rewrite module path and name), so the rewrite logic
# is exercised on every generate, not just in tests.

_T_NAME = "__PLUGIN_NAME__"
_T_PKG = "__PLUGIN_PKG__"
_T_MODULE = "__PLUGIN_MODULE__"
_T_KIND = "__PLUGIN_KIND__"

_PYPROJECT = f"""\
[project]
name = "{_T_MODULE}"
version = "0.1.0"
description = "A conduit-spark {_T_KIND} plugin ({_T_NAME})"
requires-python = ">=3.10"

# The plugin speaks the engine's JSON-lines standalone protocol on
# stdin/stdout and needs NOTHING beyond the standard library; add
# runtime deps here and they ship inside the zipapp via build.py.
dependencies = []
"""

_PLUGIN_YAML = f"""\
# Plugin manifest (the connector.yaml analog). `build.py` embeds this
# next to the code inside the artifact.
name: {_T_NAME}
version: 0.1.0
kind: {_T_KIND}
entrypoint: {_T_PKG}.__main__:main
# jsonlines/v2 = configure-first: the engine writes ONE
# {{"cmd": "configure", ...}} line before the record stream (both
# kinds). Legacy v1 single-file processors are records-only; the
# engine sniffs this manifest inside the artifact to pick the
# dialect (pipeline/registry.py plugin_protocol).
protocol: jsonlines/v2
"""

_GITIGNORE = """\
dist/
__pycache__/
*.pyc
"""

_MAKEFILE = """\
.PHONY: build test selftest clean

build:
\tpython build.py

selftest:
\tpython selftest.py

test:
\tpython -m pytest tests/ -q || python -m unittest discover -s tests -q

clean:
\trm -rf dist __pycache__
"""

_README = f"""\
# {_T_MODULE}

A conduit-spark **{_T_KIND}** plugin scaffold. It speaks the engine's
standalone JSON-lines protocol (one JSON object per line over
stdin/stdout), so it can be written in any language — this scaffold
implements it in Python with zero runtime dependencies.

## Layout

- `{_T_PKG}/plugin.py` — **edit this**: the plugin logic.
- `{_T_PKG}/__main__.py` — protocol driver (configure line, record
  loop); normally needs no edits.
- `build.py` — packs the package into `dist/{_T_NAME}.pyz`, a
  single-file executable artifact.
- `selftest.py` — protocol self-test; run it after every change.

## Build, test, install

```sh
make build selftest test
# sign + publish to a local index, then install:
conduit_spark connectors sign --artifact dist/{_T_NAME}.pyz --name {_T_NAME} \\
    --version 0.1.0 --key publisher.key
conduit_spark connectors install {_T_NAME} --index index.json
```

Reference the installed plugin from pipeline YAML as
`plugin: standalone:{_T_NAME}` (connector) or processor plugin
`standalone:{_T_NAME}`.
"""

_INIT_PY = f'''\
"""{_T_MODULE}: a conduit-spark {_T_KIND} plugin."""

__version__ = "0.1.0"
'''

_CONNECTOR_PLUGIN = f'''\
"""Plugin logic for `{_T_NAME}` — edit this file.

A connector plugin is a Source and/or a Destination. Records are
OpenCDC-style envelope dicts; binary fields (`position`, `key_raw`,
`payload_after_raw`) travel base64-encoded.
"""

import base64
import json


class Source:
    """Emits records. Replace `read` with your system's snapshot /
    change feed. Yield one envelope dict per record."""

    def __init__(self, settings, connector_id):
        self.settings = settings
        self.connector_id = connector_id

    def read(self):
        n = int(self.settings.get("recordCount", 10))
        for i in range(n):
            yield {{
                "position": base64.b64encode(
                    f"{_T_NAME}:{{i}}".encode()
                ).decode(),
                "operation": "create",
                "metadata": {{
                    "plugin": "{_T_NAME}",
                    "conduit.source.connector.id": self.connector_id,
                }},
                "key_json": json.dumps({{"id": i}}),
                "payload_after_json": json.dumps(
                    {{"id": i, "plugin": "{_T_NAME}"}}
                ),
                "is_structured": True,
            }}


class Destination:
    """Receives records. Replace `write` with your system's writer;
    raise to NACK a record (the engine fails and redelivers the
    batch, so make writes idempotent)."""

    def __init__(self, settings, connector_id):
        self.settings = settings
        self.connector_id = connector_id
        self.out_path = settings.get("path")
        self._fh = open(self.out_path, "a") if self.out_path else None

    def write(self, record):
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\\n")
            self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
'''

_PROCESSOR_PLUGIN = f'''\
"""Plugin logic for `{_T_NAME}` — edit this file.

A processor plugin transforms one envelope dict per call. Return the
(possibly modified) dict, or None to FILTER the record out. The
`position` field is immutable — the engine restores the original.
"""

import json


class Processor:
    def __init__(self, settings, connector_id):
        self.settings = settings
        self.prefix = settings.get("prefix", "{_T_NAME}")

    def process(self, record):
        payload = record.get("payload_after_json")
        if payload:
            obj = json.loads(payload)
            obj["processed_by"] = self.prefix
            record["payload_after_json"] = json.dumps(obj)
        meta = dict(record.get("metadata") or {{}})
        meta["processor"] = self.prefix
        record["metadata"] = meta
        return record
'''

_CONNECTOR_MAIN = f'''\
"""Protocol driver — the engine side of the contract lives in
conduit_spark/sources/standalone.py. Normally needs no edits.

Wire protocol (one JSON object per line):

- first line in:  {{"cmd": "configure", "settings": ..., "connector_id": ...}}
- **source**: stdin is then CLOSED by the engine; emit one envelope
  per line and exit 0 when drained.
- **destination**: envelope lines keep arriving; answer EXACTLY one
  ack per record: {{"ok": true}} or {{"ok": false, "error": "..."}}.

Direction detection: an explicit `mode` setting wins; otherwise EOF
immediately after configure means source (the engine closes a
source's stdin right after configuring it).
"""

import json
import sys

from {_T_PKG}.plugin import Destination, Source


def main():
    conf = json.loads(sys.stdin.readline())
    settings = conf.get("settings") or {{}}
    connector_id = conf.get("connector_id", "")
    mode = settings.get("mode")
    first = None
    if mode is None:
        first = sys.stdin.readline()
        mode = "source" if first == "" else "destination"

    if mode == "source":
        src = Source(settings, connector_id)
        for rec in src.read():
            sys.stdout.write(json.dumps(rec) + "\\n")
            sys.stdout.flush()
        return 0

    dst = Destination(settings, connector_id)
    try:
        lines = [first] if first else []

        def feed():
            yield from lines
            yield from sys.stdin

        for line in feed():
            line = line.strip()
            if not line:
                continue
            try:
                dst.write(json.loads(line))
                sys.stdout.write(json.dumps({{"ok": True}}) + "\\n")
            except Exception as e:  # nack; the engine fails the batch
                sys.stdout.write(
                    json.dumps({{"ok": False, "error": str(e)}}) + "\\n"
                )
            sys.stdout.flush()
    finally:
        if hasattr(dst, "close"):
            dst.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
'''

_PROCESSOR_MAIN = f'''\
"""Protocol driver — the engine side of the contract lives in
conduit_spark/operators/custom.py (custom_subprocess). Normally needs
no edits.

Wire protocol: configure line first, then one envelope JSON object
per line; answer line i with the transformed envelope for record i,
or the literal `null` to filter it out.
"""

import json
import sys

from {_T_PKG}.plugin import Processor


def main():
    proc = None
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        obj = json.loads(line)
        # configure-first dialect (protocol jsonlines/v2): records
        # never carry a "cmd" key, so this sniff is unambiguous and
        # keeps the plugin runnable even under a records-only engine.
        if isinstance(obj, dict) and obj.get("cmd") == "configure":
            proc = Processor(
                obj.get("settings") or {{}}, obj.get("connector_id", "")
            )
            continue
        if proc is None:
            proc = Processor({{}}, "")
        out = proc.process(obj)
        sys.stdout.write(json.dumps(out) + "\\n")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
'''

_BUILD_PY = f'''\
"""Build the single-file executable artifact `dist/{_T_NAME}.pyz`.

stdlib-only: `zipapp` packs the package (plus the plugin.yaml
manifest) into a zip with a `#!/usr/bin/env python3` interpreter
line, so the artifact is directly executable — exactly what the
plugin registry signs, indexes, and installs, and what the engine
execs for `standalone:{_T_NAME}`.
"""

import pathlib
import shutil
import tempfile
import zipapp

HERE = pathlib.Path(__file__).resolve().parent


def main():
    dist = HERE / "dist"
    dist.mkdir(exist_ok=True)
    target = dist / "{_T_NAME}.pyz"
    with tempfile.TemporaryDirectory(dir=HERE) as staging:
        staging = pathlib.Path(staging)
        shutil.copytree(HERE / "{_T_PKG}", staging / "{_T_PKG}")
        shutil.copy(HERE / "plugin.yaml", staging / "plugin.yaml")
        zipapp.create_archive(
            staging,
            target,
            interpreter="/usr/bin/env python3",
            main="{_T_PKG}.__main__:main",
        )
    target.chmod(0o755)
    print(target)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
'''

_SELFTEST_CONNECTOR = f'''\
"""Protocol self-test: the scaffold must speak the engine's
JSON-lines contract before it is delivered (the `go build ./...`
verification analog, plus a behavioral check the compiler can't
give). stdlib-only; exits non-zero on any violation. Run against the
package by default, or a built artifact: `python selftest.py
dist/{_T_NAME}.pyz`.
"""

import json
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent


def run_plugin(argv, conf, records=None, close_stdin=True):
    proc = subprocess.Popen(
        argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, cwd=HERE
    )
    stdin_data = json.dumps(conf) + "\\n"
    if records is not None:
        stdin_data += "".join(json.dumps(r) + "\\n" for r in records)
    out, _ = proc.communicate(stdin_data, timeout=60)
    assert proc.returncode == 0, f"plugin exited {{proc.returncode}}"
    return [json.loads(l) for l in out.splitlines() if l.strip()]


def main():
    argv = (
        [sys.executable, sys.argv[1]]
        if len(sys.argv) > 1
        else [sys.executable, "-m", "{_T_PKG}"]
    )

    # source mode: stdin closes after configure -> envelopes out
    conf = {{"cmd": "configure", "settings": {{"recordCount": 3}},
            "connector_id": "selftest"}}
    recs = run_plugin(argv, conf)
    assert len(recs) == 3, f"expected 3 records, got {{len(recs)}}"
    for r in recs:
        assert "position" in r and r["position"], "missing position"
        assert r.get("operation") in (
            "create", "update", "delete", "snapshot",
        ), f"bad operation {{r.get('operation')}}"

    # destination mode: records in -> one ack per record
    conf = {{"cmd": "configure", "settings": {{"mode": "destination"}},
            "connector_id": "selftest"}}
    acks = run_plugin(argv, conf, records=recs)
    assert len(acks) == len(recs), f"{{len(acks)}} acks for {{len(recs)}} records"
    assert all(a.get("ok") is True for a in acks), f"nack: {{acks}}"

    print(f"selftest ok: source 3 envelopes, destination {{len(acks)}} acks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
'''

_SELFTEST_PROCESSOR = f'''\
"""Protocol self-test: the scaffold must speak the engine's
JSON-lines processor contract (line i out answers record i in;
`null` filters) before it is delivered. stdlib-only; exits non-zero
on any violation. Run against the package by default, or a built
artifact: `python selftest.py dist/{_T_NAME}.pyz`.
"""

import json
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent


def main():
    argv = (
        [sys.executable, sys.argv[1]]
        if len(sys.argv) > 1
        else [sys.executable, "-m", "{_T_PKG}"]
    )
    records = [
        {{"position": "cG9zMQ==", "operation": "create",
          "metadata": {{}}, "payload_after_json": json.dumps({{"id": i}})}}
        for i in range(3)
    ]
    stdin_data = (
        json.dumps({{"cmd": "configure", "settings": {{}},
                    "connector_id": "selftest"}})
        + "\\n"
        + "".join(json.dumps(r) + "\\n" for r in records)
    )
    proc = subprocess.Popen(
        argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, cwd=HERE
    )
    out, _ = proc.communicate(stdin_data, timeout=60)
    assert proc.returncode == 0, f"plugin exited {{proc.returncode}}"
    answers = [json.loads(l) for l in out.splitlines() if l.strip()]
    assert len(answers) == len(records), (
        f"{{len(answers)}} answers for {{len(records)}} records"
    )
    for a in answers:
        if a is None:
            continue  # filtered — legal
        assert json.loads(a["payload_after_json"]).get("processed_by"), (
            "processor did not mark the payload"
        )
    print(f"selftest ok: {{len(answers)}} answers for {{len(records)}} records")
    return 0


if __name__ == "__main__":
    sys.exit(main())
'''

_TEST_CONNECTOR = f'''\
"""Scaffolded protocol tests (stdlib unittest; pytest also collects
these). Extend with tests of YOUR plugin logic."""

import json
import pathlib
import subprocess
import sys
import unittest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _run(settings, records=None):
    stdin_data = json.dumps(
        {{"cmd": "configure", "settings": settings, "connector_id": "t"}}
    ) + "\\n"
    if records is not None:
        stdin_data += "".join(json.dumps(r) + "\\n" for r in records)
    proc = subprocess.run(
        [sys.executable, "-m", "{_T_PKG}"],
        input=stdin_data, capture_output=True, text=True, cwd=ROOT, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    return [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]


class TestProtocol(unittest.TestCase):
    def test_source_emits_configured_count(self):
        recs = _run({{"recordCount": 5}})
        self.assertEqual(len(recs), 5)
        self.assertTrue(all(r["position"] for r in recs))

    def test_source_payload_is_structured_json(self):
        recs = _run({{"recordCount": 1}})
        payload = json.loads(recs[0]["payload_after_json"])
        self.assertEqual(payload["id"], 0)

    def test_destination_acks_every_record(self):
        recs = _run({{"recordCount": 2}})
        acks = _run({{"mode": "destination"}}, records=recs)
        self.assertEqual([a["ok"] for a in acks], [True, True])


if __name__ == "__main__":
    unittest.main()
'''

_TEST_PROCESSOR = f'''\
"""Scaffolded protocol tests (stdlib unittest; pytest also collects
these). Extend with tests of YOUR plugin logic."""

import json
import pathlib
import subprocess
import sys
import unittest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _run(settings, records):
    stdin_data = json.dumps(
        {{"cmd": "configure", "settings": settings, "connector_id": "t"}}
    ) + "\\n" + "".join(json.dumps(r) + "\\n" for r in records)
    proc = subprocess.run(
        [sys.executable, "-m", "{_T_PKG}"],
        input=stdin_data, capture_output=True, text=True, cwd=ROOT, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    return [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]


class TestProtocol(unittest.TestCase):
    def test_answers_line_for_line(self):
        records = [
            {{"position": "cA==", "operation": "create", "metadata": {{}},
              "payload_after_json": json.dumps({{"id": i}})}}
            for i in range(4)
        ]
        answers = _run({{}}, records)
        self.assertEqual(len(answers), 4)

    def test_marks_payload(self):
        records = [{{"position": "cA==", "operation": "create",
                     "metadata": {{}},
                     "payload_after_json": json.dumps({{"id": 1}})}}]
        (a,) = _run({{"prefix": "custom"}}, records)
        self.assertEqual(
            json.loads(a["payload_after_json"])["processed_by"], "custom"
        )


if __name__ == "__main__":
    unittest.main()
'''


def _template_files(kind: str) -> dict[str, str]:
    """relative path → tokenized content for one scaffold kind."""
    common = {
        "pyproject.toml": _PYPROJECT,
        "plugin.yaml": _PLUGIN_YAML,
        ".gitignore": _GITIGNORE,
        "Makefile": _MAKEFILE,
        "README.md": _README,
        "build.py": _BUILD_PY,
        f"{_T_PKG}/__init__.py": _INIT_PY,
    }
    if kind == "connector":
        common.update(
            {
                f"{_T_PKG}/plugin.py": _CONNECTOR_PLUGIN,
                f"{_T_PKG}/__main__.py": _CONNECTOR_MAIN,
                "selftest.py": _SELFTEST_CONNECTOR,
                "tests/test_protocol.py": _TEST_CONNECTOR,
            }
        )
    else:
        common.update(
            {
                f"{_T_PKG}/plugin.py": _PROCESSOR_PLUGIN,
                f"{_T_PKG}/__main__.py": _PROCESSOR_MAIN,
                "selftest.py": _SELFTEST_PROCESSOR,
                "tests/test_protocol.py": _TEST_PROCESSOR,
            }
        )
    return common


def _extract(staging: str, kind: str) -> None:
    """Write the tokenized template snapshot (template.Extract)."""
    for rel, content in _template_files(kind).items():
        dest = os.path.join(staging, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "w", encoding="utf-8") as f:
            f.write(content)


def _rewrite(staging: str, req: Request) -> None:
    """Substitute placeholder tokens in paths and contents
    (template.Rewrite's model: a separate pass over the extracted
    tree, so generate exercises the real rewrite logic)."""
    pkg = f"{req.name}_plugin"
    subs = {
        _T_NAME: req.name,
        _T_PKG: pkg,
        _T_MODULE: req.module,
        _T_KIND: req.kind,
    }
    for dirpath, _dirnames, filenames in os.walk(staging, topdown=False):
        for fn in filenames:
            path = os.path.join(dirpath, fn)
            with open(path, encoding="utf-8") as f:
                content = f.read()
            for tok, val in subs.items():
                content = content.replace(tok, val)
            with open(path, "w", encoding="utf-8") as f:
                f.write(content)
        base = os.path.basename(dirpath)
        if _T_PKG in base:
            os.rename(
                dirpath,
                os.path.join(
                    os.path.dirname(dirpath), base.replace(_T_PKG, pkg)
                ),
            )


def _run_step(staging: str, argv: list[str], code: str, what: str) -> str:
    proc = subprocess.run(  # noqa: S603 — scaffold's own template code
        argv, cwd=staging, capture_output=True, text=True, timeout=300
    )
    if proc.returncode != 0:
        raise ScaffoldError(
            code,
            f"{what} failed (exit {proc.returncode}): "
            f"{(proc.stderr or proc.stdout).strip()[-2000:]}",
        )
    return proc.stdout.strip()


def generate(req: Request) -> Result:
    """Scaffold a plugin project at ``req.path`` (scaffold.go:50).

    Never leaves a partial directory: all writes go to a hidden
    sibling staging dir, renamed into place only after every step
    (including build + protocol selftest) has passed."""
    start = time.monotonic()
    req = validate(req)

    steps: list[StepResult] = []

    def run_hard(name: str, fn) -> None:
        s = time.monotonic()
        try:
            r = fn()
        except ScaffoldError as e:
            steps.append(
                StepResult(
                    name,
                    ok=False,
                    duration_ms=int((time.monotonic() - s) * 1000),
                    message=e.message,
                )
            )
            raise
        steps.append(
            StepResult(
                name,
                ok=True,
                duration_ms=int((time.monotonic() - s) * 1000),
                message=r if isinstance(r, str) else "",
            )
        )

    run_hard(STEP_TOOLCHAIN, lambda: preflight(need_git=req.git) and None)

    if os.path.exists(req.path) and not req.force:
        raise ScaffoldError(
            CODE_DESTINATION_EXISTS,
            f"{req.path} already exists",
            suggestion="pass --force to overwrite",
        )

    parent = os.path.dirname(req.path)
    try:
        os.makedirs(parent, exist_ok=True)
        staging = tempfile.mkdtemp(prefix=".conduit-scaffold-", dir=parent)
    except OSError as e:
        raise ScaffoldError(CODE_WRITE_FAILED, f"creating staging dir: {e}")

    succeeded = False
    try:
        run_hard(STEP_EXTRACT, lambda: _extract(staging, req.kind))
        run_hard(STEP_REWRITE, lambda: _rewrite(staging, req))

        if not req.skip_build:
            run_hard(
                STEP_BUILD,
                lambda: _run_step(
                    staging,
                    [sys.executable, "build.py"],
                    CODE_BUILD_FAILED,
                    "build",
                ),
            )
            # selftest both the package and the built artifact — the
            # artifact is what the registry installs and the engine
            # execs, so it must speak the protocol too.
            run_hard(
                STEP_SELFTEST,
                lambda: _run_step(
                    staging,
                    [sys.executable, "selftest.py"],
                    CODE_SELFTEST_FAILED,
                    "protocol selftest",
                )
                and _run_step(
                    staging,
                    [
                        sys.executable,
                        "selftest.py",
                        os.path.join("dist", f"{req.name}.pyz"),
                    ],
                    CODE_SELFTEST_FAILED,
                    "artifact protocol selftest",
                ),
            )

        if req.git:
            # best-effort (scaffold_test.go's downgrade): a git failure
            # is a StepResult message, never a scaffold failure.
            s = time.monotonic()
            msg = ""
            ok = True
            try:
                subprocess.run(
                    ["git", "init", "-q"],
                    cwd=staging,
                    capture_output=True,
                    timeout=60,
                    check=True,
                )
                subprocess.run(
                    ["git", "add", "-A"],
                    cwd=staging,
                    capture_output=True,
                    timeout=60,
                )
            except Exception as e:
                ok = True  # downgraded, not failed
                msg = f"git init skipped: {e}"
            steps.append(
                StepResult(
                    STEP_GIT,
                    ok=ok,
                    duration_ms=int((time.monotonic() - s) * 1000),
                    message=msg,
                )
            )

        # finalize: force-removal of a pre-existing destination happens
        # only here, after the staged tree passed build+selftest
        # (scaffold.go's finalize ordering).
        if os.path.exists(req.path):
            shutil.rmtree(req.path)
        try:
            os.rename(staging, req.path)
        except OSError as e:
            raise ScaffoldError(CODE_WRITE_FAILED, f"renaming into place: {e}")
        succeeded = True
    finally:
        if not succeeded:
            shutil.rmtree(staging, ignore_errors=True)

    artifact = (
        ""
        if req.skip_build
        else os.path.join(req.path, "dist", f"{req.name}.pyz")
    )
    install_kind = "" if req.kind == "connector" else " --kind processor"
    return Result(
        kind=req.kind,
        language=req.language,
        name=req.name,
        module=req.module,
        path=req.path,
        artifact=artifact,
        steps=steps,
        elapsed_ms=int((time.monotonic() - start) * 1000),
        next_steps=[
            f"cd {req.path}",
            f"edit {req.name}_plugin/plugin.py",
            "make build selftest test",
            f"conduit_spark connectors sign --artifact dist/{req.name}.pyz "
            f"--name {req.name} --version 0.1.0 --key <publisher.key>"
            + ("" if req.kind == "connector" else " --kind processor"),
            f"conduit_spark connectors install{install_kind} {req.name} "
            "--index <index.json>",
        ],
    )
