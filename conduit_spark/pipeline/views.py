"""Shared JSON views of pipeline configs.

One builder per API shape, used by BOTH the CLI (``list --json``,
``describe``) and the HTTP control plane (``/v1/pipelines``), so the
two surfaces cannot drift — the parity the reference gets from
grpc-gateway generating its HTTP layer from the same protobuf
(proto/api/v1/api.proto:318+).
"""

from __future__ import annotations

from conduit_spark.pipeline.config import PipelineConfig

_SECRET_HINTS = ("password", "secret", "token", "apikey", "api_key", "credential")


def redact(settings: dict) -> dict:
    """Mask secret-looking settings values (the reference redacts
    credentials in API/describe output)."""
    return {
        k: "***" if any(h in k.lower() for h in _SECRET_HINTS) else v
        for k, v in settings.items()
    }


def processor_json(p) -> dict:
    return {
        "id": p.id,
        "plugin": p.plugin,
        "settings": redact(p.settings),
        "condition": p.condition,
        "workers": p.workers,
    }


def connector_json(pipeline_id: str, conn) -> dict:
    """Connector as an addressable entity (ConnectorService.Get/List,
    api.proto:766-792): the id is pipeline-scoped like the reference's."""
    return {
        "id": f"{pipeline_id}:{conn.id}",
        "pipeline_id": pipeline_id,
        "type": conn.type,
        "plugin": conn.plugin,
        "settings": redact(conn.settings),
        "processors": [processor_json(p) for p in conn.processors],
    }


def pipeline_summary(c: PipelineConfig, status: str | None = None) -> dict:
    """The ``list`` row (PipelineService.ListPipelines analog)."""
    return {
        "id": c.id,
        "status": status if status is not None else c.status,
        "sources": [{"id": s.id, "plugin": s.plugin} for s in c.sources],
        "destinations": [
            {"id": d.id, "plugin": d.plugin} for d in c.destinations
        ],
        "processors": [p.plugin for p in c.processors],
        "dlq": c.dlq.plugin if c.dlq else None,
    }


def pipeline_detail(c: PipelineConfig, status: str | None = None) -> dict:
    """The ``describe`` document (PipelineService.GetPipeline analog)."""
    return {
        "id": c.id,
        "status": status if status is not None else c.status,
        "name": c.name,
        "description": c.description,
        "connectors": [
            {
                "id": conn.id,
                "type": conn.type,
                "plugin": conn.plugin,
                "settings": redact(conn.settings),
                "processors": [processor_json(p) for p in conn.processors],
            }
            for conn in c.connectors
        ],
        "processors": [processor_json(p) for p in c.processors],
        "dlq": (
            {
                "plugin": c.dlq.plugin,
                "settings": redact(c.dlq.settings),
                "window_size": c.dlq.window_size,
                "window_nack_threshold": c.dlq.window_nack_threshold,
            }
            if c.dlq
            else None
        ),
    }
