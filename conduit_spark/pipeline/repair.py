"""Machine-appliable config repair — the `conduit pipelines repair`
analog (reference cmd/conduit/internal/repair: Collect renders a fix
plan with a hash; Apply executes it only against a matching hash, and
classifies fixes so data-path-adjacent config is never auto-touched).

Scope mirrors the reference's tiers:

- **safe** fixes (applied by default with ``apply``): the deprecated
  v1 ``type:`` processor spelling → ``plugin:``; a 1.x file version →
  "2.2"; a missing connector/processor ``id`` → the plugin-derived id
  the parser would inject anyway (making the implicit explicit).
- **data_path** fixes (ack/position/checkpoint-adjacent; skipped
  unless explicitly selected AND escalated, which the MCP tool never
  does): a DLQ window whose nack threshold can never ack
  (``window-nack-threshold >= window-size``) → clamp to size-1.

The plan hash covers the file bytes AND the computed fixes, so a
hand-edit between read and apply is refused (``repair.plan_stale``),
never partially applied. Apply rewrites the file atomically
(tmp + os.replace). The rewrite is a yaml re-dump: comments and
formatting are not preserved (the reference patches yaml.Nodes in
place; that fidelity is out of scope here and documented).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any

import yaml

SAFE = "safe"
DATA_PATH = "data_path"


def _fix(code: str, message: str, config_path: str, klass: str, apply_fn) -> dict:
    return {
        "code": code,
        "message": message,
        "config_path": config_path,
        "class": klass,
        "_apply": apply_fn,
    }


def _collect_fixes(doc: dict) -> list[dict]:
    fixes: list[dict] = []
    version = str(doc.get("version", "2.2"))
    if version.startswith("1"):
        def fix_version(d: dict = doc) -> None:
            d["version"] = "2.2"

        fixes.append(
            _fix(
                "repair.version_migrate",
                f"config version {version} is deprecated; migrate to 2.2",
                "version",
                SAFE,
                fix_version,
            )
        )
    for pi, p in enumerate(doc.get("pipelines") or []):
        if not isinstance(p, dict):
            continue
        base = f"pipelines.{pi}"

        def walk_processors(procs: list, where: str) -> None:
            for qi, proc in enumerate(procs or []):
                if not isinstance(proc, dict):
                    continue
                path = f"{where}.{qi}"
                if "type" in proc and "plugin" not in proc:
                    def fix_type(d: dict = proc) -> None:
                        d["plugin"] = d.pop("type")

                    fixes.append(
                        _fix(
                            "repair.processor_type_rename",
                            "deprecated v1 'type:' — rename to 'plugin:'",
                            f"{path}.type",
                            SAFE,
                            fix_type,
                        )
                    )
                if "id" not in proc:
                    def fix_pid(d: dict = proc) -> None:
                        d["id"] = str(d.get("plugin", d.get("type", "processor")))

                    fixes.append(
                        _fix(
                            "repair.missing_id",
                            "processor has no id; inject the plugin-derived "
                            "id the parser would use",
                            f"{path}.id",
                            SAFE,
                            fix_pid,
                        )
                    )

        for ci, c in enumerate(p.get("connectors") or []):
            if not isinstance(c, dict):
                continue
            if "id" not in c:
                def fix_cid(d: dict = c) -> None:
                    d["id"] = str(d.get("plugin", "connector")).rsplit(":", 1)[-1]

                fixes.append(
                    _fix(
                        "repair.missing_id",
                        "connector has no id; inject a plugin-derived id",
                        f"{base}.connectors.{ci}.id",
                        SAFE,
                        fix_cid,
                    )
                )
            walk_processors(
                c.get("processors") or [], f"{base}.connectors.{ci}.processors"
            )
        walk_processors(p.get("processors") or [], f"{base}.processors")
        dlq = p.get("dead-letter-queue")
        if isinstance(dlq, dict):
            size = int(dlq.get("window-size", 1))
            thresh = int(dlq.get("window-nack-threshold", 0))
            if size > 0 and thresh >= size:
                def fix_dlq(d: dict = dlq, s: int = size) -> None:
                    d["window-nack-threshold"] = s - 1

                fixes.append(
                    _fix(
                        "repair.dlq_window_never_acks",
                        f"window-nack-threshold {thresh} >= window-size "
                        f"{size}: the window can never ack; clamp to "
                        f"{size - 1}",
                        f"{base}.dead-letter-queue.window-nack-threshold",
                        DATA_PATH,
                        fix_dlq,
                    )
                )
    return fixes


def _public(fixes: list[dict]) -> list[dict]:
    return [{k: v for k, v in f.items() if k != "_apply"} for f in fixes]


def _plan_hash(raw: bytes, fixes: list[dict]) -> str:
    return hashlib.sha256(
        raw + json.dumps(_public(fixes), sort_keys=True).encode()
    ).hexdigest()


def collect(path: str) -> dict:
    """Read mode: the fix plan for one pipeline file, with its hash."""
    with open(path, "rb") as f:
        raw = f.read()
    doc = yaml.safe_load(raw)
    if not isinstance(doc, dict):
        raise ValueError(f"{path}: not a pipeline config document")
    fixes = _collect_fixes(doc)
    return {
        "path": path,
        "fixes": _public(fixes),
        "hash": _plan_hash(raw, fixes),
    }


def apply(
    path: str,
    *,
    plan_hash: str | None = None,
    yes: bool = False,
    fix_paths: list[str] | None = None,
    escalate: bool = False,
) -> dict:
    """Apply the (selected subset of the) fresh plan to ``path``.

    Refusals mirror the reference's codes: ``repair.plan_stale`` when
    the presented hash does not match a fresh recompute (unless
    ``yes``), ``repair.no_fixes_available`` when apply is requested on
    a clean file, and data-path fixes are SKIPPED (reported, not
    fatal) unless explicitly selected with ``escalate`` — the MCP
    path never escalates."""
    with open(path, "rb") as f:
        raw = f.read()
    doc = yaml.safe_load(raw)
    if not isinstance(doc, dict):
        raise ValueError(f"{path}: not a pipeline config document")
    fixes = _collect_fixes(doc)
    fresh = _plan_hash(raw, fixes)
    if not yes:
        if plan_hash != fresh:
            raise PermissionError(
                "repair.plan_stale: file or plan changed since it was "
                "reviewed; re-read and present the fresh hash"
            )
    if not fixes:
        raise ValueError("repair.no_fixes_available: file is already clean")
    selected = fixes
    if fix_paths is not None:
        by_path: dict[str, list[dict]] = {}
        for f_ in fixes:
            by_path.setdefault(f_["config_path"], []).append(f_)
        selected = []
        for p in fix_paths:
            cands = by_path.get(p)
            if not cands:
                raise ValueError(
                    f"repair.fix_no_longer_applies: no fix at {p!r}"
                )
            if len(cands) > 1:
                raise ValueError(f"repair.ambiguous_fix: {p!r}")
            selected.extend(cands)
    applied: list[dict] = []
    skipped: list[dict] = []
    for f_ in selected:
        if f_["class"] == DATA_PATH and not (fix_paths and escalate):
            skipped.append(
                dict(
                    _public([f_])[0],
                    skip_reason="repair.data_path_fix_refused",
                )
            )
            continue
        f_["_apply"]()
        applied.append(_public([f_])[0])
    if applied:
        out = yaml.safe_dump(doc, sort_keys=False)
        d = os.path.dirname(os.path.abspath(path))
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".repair")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(out)
            os.replace(tmp, path)
        except BaseException:
            os.unlink(tmp)
            raise
    return {"path": path, "applied": applied, "skipped": skipped}
