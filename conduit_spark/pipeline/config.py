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
    return PipelineConfig(
        id=str(raw["id"]),
        status=raw.get("status", "running"),
        name=raw.get("name", ""),
        description=raw.get("description", ""),
        connectors=[_parse_connector(c) for c in raw.get("connectors") or []],
        processors=[_parse_processor(p) for p in raw.get("processors") or []],
        dlq=dlq,
    )


def parse_yaml(text: str) -> list[PipelineConfig]:
    """Parse a pipeline file (version 2.x)."""
    doc = yaml.safe_load(text)
    if not isinstance(doc, dict) or "pipelines" not in doc:
        raise ValueError("pipeline file must have a top-level 'pipelines' list")
    version = str(doc.get("version", "2.2"))
    if not version.startswith("2"):
        raise ValueError(f"unsupported pipeline config version {version!r}")
    return [parse_pipeline_dict(p) for p in doc["pipelines"]]


def load_pipelines(path: str) -> list[PipelineConfig]:
    with open(path, encoding="utf-8") as f:
        return parse_yaml(f.read())
