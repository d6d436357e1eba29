"""Pipeline template gallery — the `conduit pipelines init --template`
/ templates-gallery analog (reference
cmd/conduit/root/pipelines/template_gallery.go,
docs/design-documents/20260723-templates-gallery.md): named, runnable
starting points covering the common pipeline shapes, each of which
parses clean under ``validate``/``lint``/``dry-run`` (pinned by test).

All templates take a single ``{id}`` substitution.
"""

from __future__ import annotations

TEMPLATES: dict[str, dict] = {
    "generator-to-file": {
        "description": "synthetic records to JSON files (the default)",
        "yaml": """version: "2.2"
pipelines:
  - id: {id}
    status: running
    description: "synthetic records to JSON files"
    connectors:
      - id: source1
        type: source
        plugin: builtin:generator
        settings:
          recordCount: 100
          format.options: {{id: int, name: string}}
      - id: destination1
        type: destination
        plugin: builtin:file
        settings: {{path: /tmp/{id}-out, format: json, mode: append}}
    processors: []
""",
    },
    "file-to-file": {
        "description": "parquet in, filtered + reshaped parquet out",
        "yaml": """version: "2.2"
pipelines:
  - id: {id}
    status: running
    description: "parquet in, filtered + reshaped parquet out"
    connectors:
      - id: in
        type: source
        plugin: builtin:file
        settings: {{path: /tmp/{id}-in, format: parquet}}
      - id: out
        type: destination
        plugin: builtin:file
        settings: {{path: /tmp/{id}-out, format: parquet, mode: append}}
    processors:
      - id: keep-creates
        plugin: filter
        condition: '{{{{ eq .Operation "create" }}}}'
      - id: stamp
        plugin: field.set
        settings: {{field: .Metadata.pipeline, value: "{id}"}}
""",
    },
    "cdc-apply": {
        "description": "replay a wal2json changelog into a materialized table",
        "yaml": """version: "2.2"
pipelines:
  - id: {id}
    status: running
    description: "replay a wal2json changelog into a materialized table"
    connectors:
      - id: wal
        type: source
        plugin: builtin:postgres
        settings:
          cdc.path: /tmp/{id}-wal      # wal2json lines (file feed)
          cdc.format: wal2json
          table: public.accounts
      - id: table
        type: destination
        plugin: builtin:file
        settings: {{path: /tmp/{id}-table, format: parquet, mode: overwrite}}
    processors: []
""",
    },
    "kafka-mirror": {
        "description": "mirror a Kafka topic into another topic",
        "yaml": """version: "2.2"
pipelines:
  - id: {id}
    status: running
    description: "mirror a Kafka topic into another topic"
    connectors:
      - id: in
        type: source
        plugin: builtin:kafka
        settings: {{servers: "localhost:9092", topic: source-topic}}
      - id: out
        type: destination
        plugin: builtin:kafka
        settings: {{servers: "localhost:9092", topic: mirror-topic}}
    processors: []
""",
    },
    "webhook-enrich": {
        "description": "enrich each record via an HTTP endpoint, DLQ on failure",
        "yaml": """version: "2.2"
pipelines:
  - id: {id}
    status: running
    description: "enrich each record via an HTTP endpoint, DLQ on failure"
    connectors:
      - id: source1
        type: source
        plugin: builtin:generator
        settings:
          recordCount: 50
          format.options: {{id: int}}
      - id: destination1
        type: destination
        plugin: builtin:file
        settings: {{path: /tmp/{id}-out, format: json, mode: append}}
    processors:
      - id: enrich
        plugin: webhook.http
        settings: {{request.url: "http://localhost:8000/enrich"}}
    dead-letter-queue:
      plugin: builtin:file
      settings: {{path: /tmp/{id}-dlq, format: json}}
      window-size: 20
      window-nack-threshold: 5
""",
    },
    "standalone-source": {
        "description": "an installed standalone connector to JSON files",
        "yaml": """version: "2.2"
pipelines:
  - id: {id}
    status: running
    description: "an installed standalone connector to JSON files"
    connectors:
      - id: src
        type: source
        # install one first: python -m conduit_spark connectors install <name> --index <index.json>
        plugin: standalone:my-connector
        settings: {{recordCount: 10}}
      - id: out
        type: destination
        plugin: builtin:file
        settings: {{path: /tmp/{id}-out, format: json, mode: append}}
    processors: []
""",
    },
}


def render(template: str, pipeline_id: str) -> str:
    if template not in TEMPLATES:
        raise KeyError(
            f"unknown template {template!r}; available: {sorted(TEMPLATES)}"
        )
    return TEMPLATES[template]["yaml"].format(id=pipeline_id)
