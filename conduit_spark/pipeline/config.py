"""Declarative pipeline configuration — YAML v2.2 model.

Mirrors the reference's provisioning shape
(pkg/provisioning/config/yaml/v2/model.go:73-112): pipelines →
connectors (type source/destination, plugin, settings, per-connector
processors) → processors (plugin, condition, settings, workers) →
dead-letter-queue (plugin, settings, window-size,
window-nack-threshold).

``workers`` is accepted and ignored: Spark's partition parallelism
already provides ordered parallel execution (SURVEY.md §4 —
stream/parallel.go's coordinator is subsumed).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class ProcessorConfig:
    id: str
    plugin: str
    settings: dict[str, Any] = field(default_factory=dict)
    condition: str | None = None
    workers: int = 1


@dataclass
class ConnectorConfig:
    id: str
    type: str  # "source" | "destination"
    plugin: str
    settings: dict[str, Any] = field(default_factory=dict)
    processors: list[ProcessorConfig] = field(default_factory=list)


@dataclass
class DLQConfig:
    plugin: str = "builtin:log"
    settings: dict[str, Any] = field(default_factory=dict)
    window_size: int = 1
    window_nack_threshold: int = 0


@dataclass
class PipelineConfig:
    id: str
    status: str = "running"
    name: str = ""
    description: str = ""
    connectors: list[ConnectorConfig] = field(default_factory=list)
    processors: list[ProcessorConfig] = field(default_factory=list)
    dlq: DLQConfig | None = None

    @property
    def sources(self) -> list[ConnectorConfig]:
        return [c for c in self.connectors if c.type == "source"]

    @property
    def destinations(self) -> list[ConnectorConfig]:
        return [c for c in self.connectors if c.type == "destination"]


def _parse_processor(raw: dict) -> ProcessorConfig:
    if "plugin" not in raw and "type" in raw:
        # v1 model named the field `type`
        # (pkg/provisioning/config/yaml/v1/model.go); migrated with a
        # changelog warning in parse_yaml
        raw = dict(raw, plugin=raw["type"])
    return ProcessorConfig(
        id=str(raw.get("id", raw["plugin"])),
        plugin=raw["plugin"],
        settings=dict(raw.get("settings") or {}),
        condition=raw.get("condition"),
        workers=int(raw.get("workers", 1)),
    )


def _parse_connector(raw: dict) -> ConnectorConfig:
    ctype = raw["type"]
    if ctype not in ("source", "destination"):
        raise ValueError(f"connector type must be source/destination, got {ctype!r}")
    return ConnectorConfig(
        id=str(raw["id"]),
        type=ctype,
        plugin=raw["plugin"],
        settings=dict(raw.get("settings") or {}),
        processors=[_parse_processor(p) for p in raw.get("processors") or []],
    )


def parse_pipeline_dict(raw: dict) -> PipelineConfig:
    dlq_raw = raw.get("dead-letter-queue")
    dlq = None
    if dlq_raw:
        dlq = DLQConfig(
            plugin=dlq_raw.get("plugin", "builtin:log"),
            settings=dict(dlq_raw.get("settings") or {}),
            window_size=int(dlq_raw.get("window-size", 1)),
            window_nack_threshold=int(dlq_raw.get("window-nack-threshold", 0)),
        )
    connectors = [_parse_connector(c) for c in raw.get("connectors") or []]
    seen: set[str] = set()
    for c in connectors:
        if c.id in seen:
            raise ValueError(
                f"pipeline {raw['id']!r}: duplicate connector id {c.id!r}"
            )
        seen.add(c.id)
    return PipelineConfig(
        id=str(raw["id"]),
        status=raw.get("status", "running"),
        name=raw.get("name", ""),
        description=raw.get("description", ""),
        connectors=connectors,
        processors=[_parse_processor(p) for p in raw.get("processors") or []],
        dlq=dlq,
    )


# Known config keys per level — the lint surface (reference
# `pipelines lint`, cmd/conduit/root/pipelines/lint.go: validate plus
# advisory warnings for deprecated/renamed/unknown fields).
_KNOWN_KEYS = {
    "pipeline": {
        "id", "status", "name", "description",
        "connectors", "processors", "dead-letter-queue",
    },
    "connector": {"id", "type", "plugin", "settings", "processors"},
    "processor": {"id", "plugin", "type", "settings", "condition", "workers"},
    "dead-letter-queue": {
        "plugin", "settings", "window-size", "window-nack-threshold",
    },
}


def lint_pipeline_dict(raw: dict) -> list[str]:
    """Advisory warnings for one pipeline dict: unknown fields at any
    level, and the deprecated v1 ``type:`` processor spelling. Parse
    FAILURES are not reported here — run ``parse_pipeline_dict`` for
    those; lint is the advisory layer on top."""
    warnings: list[str] = []
    pid = raw.get("id", "?")

    def unknown(level: str, doc: dict, where: str) -> None:
        for k in sorted(set(doc) - _KNOWN_KEYS[level]):
            warnings.append(f"{where}: unknown field {k!r}")

    def lint_processor(p: dict, where: str) -> None:
        if not isinstance(p, dict):
            return
        unknown("processor", p, where)
        if "type" in p and "plugin" not in p:
            warnings.append(
                f"{where}: deprecated v1 'type:' — rename to 'plugin:'"
            )

    if isinstance(raw, dict):
        unknown("pipeline", raw, f"pipeline {pid}")
        for c in raw.get("connectors") or []:
            if not isinstance(c, dict):
                continue
            where = f"pipeline {pid} connector {c.get('id', '?')}"
            unknown("connector", c, where)
            for p in c.get("processors") or []:
                lint_processor(p, f"{where} processor {p.get('id', '?')}")
        for p in raw.get("processors") or []:
            if isinstance(p, dict):
                lint_processor(p, f"pipeline {pid} processor {p.get('id', '?')}")
        dlq = raw.get("dead-letter-queue")
        if isinstance(dlq, dict):
            unknown("dead-letter-queue", dlq, f"pipeline {pid} dead-letter-queue")
    return warnings


def _processor_to_dict(p: ProcessorConfig) -> dict:
    out: dict[str, Any] = {"id": p.id, "plugin": p.plugin}
    if p.settings:
        out["settings"] = dict(p.settings)
    if p.condition is not None:
        out["condition"] = p.condition
    if p.workers != 1:
        out["workers"] = p.workers
    return out


def pipeline_to_dict(cfg: PipelineConfig) -> dict:
    """Serialize a config back to its v2 pipeline dict — the exact
    inverse of ``parse_pipeline_dict`` (round-trip pinned by test), so
    the API's export/import and plan/apply verbs (reference
    ExportPipeline/ImportPipeline/PlanPipeline, api.proto:535-573)
    operate on the same document shape the YAML provisioner reads.
    Settings are NOT redacted: an export must re-import runnable.
    """
    out: dict[str, Any] = {"id": cfg.id, "status": cfg.status}
    if cfg.name:
        out["name"] = cfg.name
    if cfg.description:
        out["description"] = cfg.description
    if cfg.connectors:
        out["connectors"] = [
            {
                "id": c.id,
                "type": c.type,
                "plugin": c.plugin,
                **({"settings": dict(c.settings)} if c.settings else {}),
                **(
                    {"processors": [_processor_to_dict(p) for p in c.processors]}
                    if c.processors
                    else {}
                ),
            }
            for c in cfg.connectors
        ]
    if cfg.processors:
        out["processors"] = [_processor_to_dict(p) for p in cfg.processors]
    if cfg.dlq is not None:
        out["dead-letter-queue"] = {
            "plugin": cfg.dlq.plugin,
            **({"settings": dict(cfg.dlq.settings)} if cfg.dlq.settings else {}),
            "window-size": cfg.dlq.window_size,
            "window-nack-threshold": cfg.dlq.window_nack_threshold,
        }
    return out


def parse_yaml(text: str) -> list[PipelineConfig]:
    """Parse a pipeline file (version 2.x; 1.x migrates with a
    deprecation warning, mirroring the reference's v1→v2 changelog
    handling in pkg/provisioning/config/yaml/parser.go)."""
    doc = yaml.safe_load(text)
    if not isinstance(doc, dict) or "pipelines" not in doc:
        raise ValueError("pipeline file must have a top-level 'pipelines' list")
    version = str(doc.get("version", "2.2"))
    if version.startswith("1"):
        import warnings

        warnings.warn(
            f"pipeline config version {version} is deprecated; "
            "auto-migrating to 2.x (processor `type:` → `plugin:`)",
            DeprecationWarning,
            stacklevel=2,
        )
    elif not version.startswith("2"):
        raise ValueError(f"unsupported pipeline config version {version!r}")
    pipelines = [parse_pipeline_dict(p) for p in doc["pipelines"]]
    ids = [p.id for p in pipelines]
    dupes = {i for i in ids if ids.count(i) > 1}
    if dupes:
        raise ValueError(f"duplicate pipeline ids: {sorted(dupes)}")
    return pipelines


def load_pipelines(path: str) -> list[PipelineConfig]:
    with open(path, encoding="utf-8") as f:
        return parse_yaml(f.read())


@dataclass
class ProvisionResult:
    """Outcome of provisioning a directory of pipeline files
    (pkg/provisioning/service.go:74 — bad files are reported and
    skipped; good pipelines still provision)."""

    pipelines: list[PipelineConfig] = field(default_factory=list)
    errors: dict[str, str] = field(default_factory=dict)  # file → error


def load_pipeline_dir(path: str, *, strict: bool = False) -> ProvisionResult:
    """Provision every ``*.yml``/``*.yaml`` under ``path`` (sorted, so
    provisioning order is deterministic). A malformed file records an
    error and is skipped unless ``strict``; a pipeline id appearing in
    two files is an error against the second file."""
    import glob as _glob

    res = ProvisionResult()
    seen_ids: dict[str, str] = {}
    files = sorted(
        _glob.glob(os.path.join(path, "*.yml"))
        + _glob.glob(os.path.join(path, "*.yaml"))
    )
    for f in files:
        try:
            # validate the WHOLE file (parse + cross-file dup ids)
            # before registering anything, so a file provisions
            # atomically — a bad second pipeline must not leave the
            # first half-provisioned (service.go:74 skips the file).
            file_pipelines = load_pipelines(f)
            for p in file_pipelines:
                if p.id in seen_ids:
                    raise ValueError(
                        f"pipeline id {p.id!r} already provisioned from "
                        f"{seen_ids[p.id]}"
                    )
            for p in file_pipelines:
                seen_ids[p.id] = f
            res.pipelines.extend(file_pipelines)
        except Exception as e:  # noqa: BLE001 — collected per file
            if strict:
                raise
            res.errors[f] = f"{type(e).__name__}: {e}"
    return res
