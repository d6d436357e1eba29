"""Plan/apply deployment diffs — the reference's PlanPipeline /
ApplyPipeline workflow (proto/api/v1/api.proto:554-573, Diff message
at api.proto:728-747): compute the change set needed to reconcile a
pipeline's stored config with a desired config, hash it, and let the
caller apply only the exact plan it reviewed (a stale hash is refused,
never partially applied).

Diff shape mirrors the proto: ``{"pipeline_id", "changes": [{resource,
id, action, effect, config_paths, code}], "hash"}`` where resource is
pipeline|connector|processor|dlq, action is create|update|delete, and
effect is ``in_place`` (safe on a running pipeline — metadata only) or
``restart`` (anything the execution graph reads).

The hash covers the desired document AND the computed change set, so
it goes stale both when the caller edits the config after planning and
when the server's stored state moves underneath the plan — either way
apply recomputes, mismatches, and refuses.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from conduit_spark.pipeline.config import (
    PipelineConfig,
    _processor_to_dict,
    pipeline_to_dict,
)

# Pipeline-level fields a running pipeline can absorb without a restart.
_IN_PLACE_FIELDS = ("name", "description")


def _changed_paths(old: Any, new: Any, prefix: str) -> list[str]:
    """Dotted paths where two JSON-ish documents differ (leaf-level for
    dicts; whole-value for lists and scalars)."""
    if isinstance(old, dict) and isinstance(new, dict):
        out: list[str] = []
        for k in sorted(old.keys() | new.keys()):
            p = f"{prefix}.{k}" if prefix else str(k)
            if k not in old or k not in new:
                out.append(p)
            else:
                out.extend(_changed_paths(old[k], new[k], p))
        return out
    return [] if old == new else [prefix]


def _change(
    resource: str, rid: str, action: str, effect: str, paths: list[str]
) -> dict:
    return {
        "resource": resource,
        "id": rid,
        "action": action,
        "effect": effect,
        "config_paths": paths,
        "code": f"provisioning.{resource}.{action}",
    }


def _diff_nodes(
    resource: str,
    old_nodes: dict[str, dict],
    new_nodes: dict[str, dict],
    scope: str,
) -> list[dict]:
    changes = []
    for rid in sorted(old_nodes.keys() | new_nodes.keys()):
        qid = f"{scope}:{rid}"
        if rid not in new_nodes:
            changes.append(_change(resource, qid, "delete", "restart", []))
        elif rid not in old_nodes:
            changes.append(_change(resource, qid, "create", "restart", []))
        else:
            paths = _changed_paths(old_nodes[rid], new_nodes[rid], "")
            if paths:
                changes.append(_change(resource, qid, "update", "restart", paths))
    return changes


def plan_diff(current: PipelineConfig | None, desired: PipelineConfig) -> dict:
    """Change set turning ``current`` (None = not provisioned) into
    ``desired``. Deterministic: same inputs, same dict, same hash."""
    desired_doc = pipeline_to_dict(desired)
    changes: list[dict] = []
    if current is None:
        changes.append(
            _change("pipeline", desired.id, "create", "restart", [])
        )
        for c in desired.connectors:
            changes.append(
                _change("connector", f"{desired.id}:{c.id}", "create", "restart", [])
            )
        for p in desired.processors:
            changes.append(
                _change("processor", f"{desired.id}:{p.id}", "create", "restart", [])
            )
        if desired.dlq is not None:
            changes.append(_change("dlq", desired.id, "create", "restart", []))
    else:
        current_doc = pipeline_to_dict(current)
        meta_paths = [
            f for f in _IN_PLACE_FIELDS
            if current_doc.get(f) != desired_doc.get(f)
        ]
        if meta_paths:
            changes.append(
                _change("pipeline", desired.id, "update", "in_place", meta_paths)
            )
        if current_doc.get("status") != desired_doc.get("status"):
            changes.append(
                _change("pipeline", desired.id, "update", "restart", ["status"])
            )
        changes.extend(
            _diff_nodes(
                "connector",
                {d["id"]: d for d in current_doc.get("connectors", [])},
                {d["id"]: d for d in desired_doc.get("connectors", [])},
                desired.id,
            )
        )
        changes.extend(
            _diff_nodes(
                "processor",
                {p.id: _processor_to_dict(p) for p in current.processors},
                {p.id: _processor_to_dict(p) for p in desired.processors},
                desired.id,
            )
        )
        old_dlq = current_doc.get("dead-letter-queue")
        new_dlq = desired_doc.get("dead-letter-queue")
        if old_dlq != new_dlq:
            action = (
                "create" if old_dlq is None
                else "delete" if new_dlq is None
                else "update"
            )
            changes.append(
                _change(
                    "dlq",
                    desired.id,
                    action,
                    "restart",
                    _changed_paths(old_dlq or {}, new_dlq or {}, ""),
                )
            )
    diff = {"pipeline_id": desired.id, "changes": changes}
    diff["hash"] = hashlib.sha256(
        json.dumps({"config": desired_doc, "diff": changes}, sort_keys=True).encode()
    ).hexdigest()
    return diff
