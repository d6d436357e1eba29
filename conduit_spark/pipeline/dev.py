"""Dev hot-reload loop — the `conduit run --dev` / `pipelines dev`
analog (reference 20260712-pipeline-dev-hot-reload.md): watch a
pipeline file; an edit lands in the running engine at the next safe
boundary.

The invariant-safety line is the reference's exactly:

- **live-swappable** (no restart): pipeline-level processor CONFIG
  updates (settings/condition/workers — not plugin), and pipeline
  name/description. These carry no source position, no ack state, no
  external connection; the runtime applies the pipeline chain per
  micro-batch (``run_streaming(live_processors=True)``), so swapping
  the config between batches cannot skip a position or drop a record.
- **restart-class** (drain → reconfigure → restart): connector
  settings, per-connector processors, the DLQ, and every topological
  change (add/remove node, plugin change). Routed through the same
  hash-gated ``ControlPlane.apply`` the deploy verb uses.

A file edit that no longer parses is reported and IGNORED — the
running pipeline keeps its last good config (the dev loop must never
take the pipeline down on a typo).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from conduit_spark.pipeline.config import (
    PipelineConfig,
    load_pipelines,
    pipeline_to_dict,
)
from conduit_spark.pipeline.deploy import plan_diff


def classify_live(diff: dict) -> bool:
    """True iff every change in the diff is live-swappable: an
    in-place pipeline metadata change, or a pipeline-level processor
    UPDATE that does not change the plugin. Everything else —
    connector or DLQ changes, processor add/remove, plugin swaps — is
    restart-class."""
    for c in diff["changes"]:
        if c["resource"] == "pipeline" and c["effect"] == "in_place":
            continue
        if (
            c["resource"] == "processor"
            and c["action"] == "update"
            and "plugin" not in c["config_paths"]
        ):
            continue
        return False
    return True


@dataclass
class PollResult:
    changed: bool = False
    action: str = "none"  # none | live_swap | restart | parse_error | clean
    detail: str = ""
    diff: dict | None = None


@dataclass
class DevSession:
    """One watched file driving one running pipeline. The caller owns
    the runtime objects: ``live_pipelines`` maps pipeline id → the
    running ``Pipeline`` whose ``config`` a live swap mutates;
    ``restart`` is called for restart-class diffs (the CLI wires it to
    ControlPlane.apply; tests can stub it)."""

    path: str
    live_pipelines: dict
    restart: object  # Callable[[PipelineConfig, dict], None]
    _mtime: float = field(default=0.0, init=False)
    _configs: dict = field(default_factory=dict, init=False)

    def prime(self) -> list[PipelineConfig]:
        """Initial load; remembers the baseline for future diffs."""
        configs = load_pipelines(self.path)
        self._configs = {c.id: c for c in configs}
        self._mtime = os.path.getmtime(self.path)
        return configs

    def poll(self) -> list[PollResult]:
        """One watch tick: no-op unless the file's mtime moved."""
        try:
            mtime = os.path.getmtime(self.path)
        except OSError as e:
            return [PollResult(True, "parse_error", f"unreadable: {e}")]
        if mtime == self._mtime:
            return [PollResult(False)]
        self._mtime = mtime
        try:
            desired = load_pipelines(self.path)
        except Exception as e:  # noqa: BLE001 — typo mid-edit: keep running
            return [
                PollResult(True, "parse_error", f"{e}; keeping last good config")
            ]
        results = []
        for cfg in desired:
            current = self._configs.get(cfg.id)
            diff = plan_diff(current, cfg)
            if not diff["changes"]:
                results.append(PollResult(True, "clean", cfg.id, diff))
                continue
            if current is not None and classify_live(diff):
                live = self.live_pipelines.get(cfg.id)
                if live is not None:
                    # next micro-batch reads the new chain; no restart
                    live.config.processors = cfg.processors
                    live.config.name = cfg.name
                    live.config.description = cfg.description
                self._configs[cfg.id] = cfg
                results.append(
                    PollResult(
                        True,
                        "live_swap",
                        f"{cfg.id}: {len(diff['changes'])} in-place change(s)",
                        diff,
                    )
                )
            else:
                self.restart(cfg, diff)
                self._configs[cfg.id] = cfg
                results.append(
                    PollResult(
                        True,
                        "restart",
                        f"{cfg.id}: restart-class change(s): "
                        + ", ".join(
                            f"{c['action']} {c['resource']} {c['id']}"
                            for c in diff["changes"]
                        ),
                        diff,
                    )
                )
        return results

    # convenience used by the CLI
    def desired_doc(self, cfg: PipelineConfig) -> dict:
        return pipeline_to_dict(cfg)
