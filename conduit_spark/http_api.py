"""HTTP control plane — the minimal analog of the reference's
grpc-gateway REST surface (proto/api/v1/api.proto:318-569
PipelineService; pkg/http/api/ serves it over HTTP).

Routes (mirroring the reference's gateway paths):

    GET    /v1/pipelines             list (same JSON as `list --json`)
    POST   /v1/pipelines             create from a v2 pipeline object
    GET    /v1/pipelines/{id}        full detail (same as `describe`)
    PUT    /v1/pipelines/{id}        replace config (not while running)
    DELETE /v1/pipelines/{id}        remove (not while running)
    POST   /v1/pipelines/{id}/start  run async (batch by default)
    POST   /v1/pipelines/{id}/stop   request stop
    GET    /v1/connectors/{id}/inspect?count=N   sampled in-flight records
    GET    /v1/processors/{id}/inspect?count=N   (api.proto:775,1011-1018)
    GET/PUT /v1/pipelines/{id}/dead-letter-queue DLQ settings (api.proto:519-533)
    POST   /v1/pipelines/{id}/export  full unredacted v2 config doc
    POST   /v1/pipelines/import       create from an exported doc
    POST   /v1/pipelines/plan         diff desired vs stored config + hash
    POST   /v1/pipelines/apply        execute a reviewed plan (hash-gated)
    GET    /v1/connectors[?pipeline_id=]  connectors as entities
    GET    /v1/connectors/{id}        one connector (pipeline-scoped id)
    POST   /v1/connectors/validate    config validation, no instantiation
    GET    /v1/processors[?pipeline_id=], /v1/processors/{id}
    GET    /info                      version/os/arch
    GET    /v1/plugins[?name=rx]      deprecated combined plugin list

stdlib ``http.server`` only — no new dependencies; the JSON bodies
come from the same ``pipeline/views.py`` builders the CLI uses, so
the two control surfaces cannot drift.

Runtime statuses follow the reference lifecycle names
(pkg/lifecycle/service.go): provisioned → running → done | failed |
stopped.
"""

from __future__ import annotations

import json
import re
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from conduit_spark.errors import ConduitError
from conduit_spark.pipeline.config import PipelineConfig, parse_pipeline_dict
from conduit_spark.pipeline.views import pipeline_detail, pipeline_summary

class Conflict(RuntimeError):
    """409: duplicate id, or an operation that needs a stopped pipeline."""


Runner = Callable[[PipelineConfig, threading.Event], str]
"""Executes one pipeline; returns the final status. The stop event is
set by POST /stop — a cooperative runner checks it between batches."""


def default_batch_runner(
    cfg: PipelineConfig, stop: threading.Event, inspectors: dict | None = None
) -> str:
    """Run the pipeline once in batch mode on the engine session."""
    from conduit_spark import get_spark
    from conduit_spark.pipeline.runtime import Pipeline

    spark = get_spark("conduit-spark-api")
    # PipelineFailure propagates: the plane records its message as the
    # pipeline's authoritative error cause (reference
    # 20260706-degraded-pipeline-error-cause.md — the data-path error
    # the user sees must be the node's REAL error; with one driver
    # thread there is no tomb race to lose it to)
    Pipeline(spark, cfg, inspectors=inspectors).run_batch()
    return "stopped" if stop.is_set() else "done"


class ControlPlane:
    """In-memory pipeline registry + lifecycle, one per server."""

    def __init__(
        self,
        configs: list[PipelineConfig] | None = None,
        *,
        runner: Runner | None = None,
        live_restart_apply: bool = False,
    ) -> None:
        self.live_restart_apply = live_restart_apply
        # readiness flag for /readyz: constructed planes are ready (the
        # in-memory store provisions inside __init__); embedders that
        # provision asynchronously set it False until done
        self.ready = True
        self._lock = threading.Lock()
        self._configs: dict[str, PipelineConfig] = {}
        self._status: dict[str, str] = {}
        self._threads: dict[str, threading.Thread] = {}
        self._stop_events: dict[str, threading.Event] = {}
        # why a pipeline left 'running': 'user' (stop RPC) vs 'system'
        # (runner failure) — the reference's stopped_reason (P3/#2629)
        self._stopped_reason: dict[str, str] = {}
        # the authoritative failure cause (the node's real error, not a
        # secondary artifact — 20260706-degraded-pipeline-error-cause.md)
        self._error: dict[str, str] = {}
        # (pipeline id, node id) -> StreamInspector; attached lazily on
        # the first /inspect call and sampled by every later run
        self._inspectors: dict[tuple[str, str], object] = {}
        self._runner = runner or default_batch_runner
        for c in configs or []:
            self._configs[c.id] = c
            self._status[c.id] = "provisioned"

    # -- queries ------------------------------------------------------

    def list(self) -> list[dict]:
        with self._lock:
            out = []
            for c in self._configs.values():
                row = pipeline_summary(c, self._status[c.id])
                if c.id in self._stopped_reason:
                    row["stopped_reason"] = self._stopped_reason[c.id]
                if c.id in self._error:
                    row["error"] = self._error[c.id]
                out.append(row)
            return out

    def get(self, pid: str) -> dict | None:
        with self._lock:
            c = self._configs.get(pid)
            if c is None:
                return None
            doc = pipeline_detail(c, self._status[pid])
            if pid in self._stopped_reason:
                doc["stopped_reason"] = self._stopped_reason[pid]
            if pid in self._error:
                doc["error"] = self._error[pid]
            return doc

    def status(self, pid: str) -> str | None:
        with self._lock:
            return self._status.get(pid)

    # -- CRUD ---------------------------------------------------------

    @staticmethod
    def _parse(doc: dict) -> PipelineConfig:
        try:
            return parse_pipeline_dict(doc)
        except Exception as e:  # normalize: any parse failure is a 400,
            # never a LookupError that would masquerade as a 404
            raise ValueError(f"invalid pipeline config: {e}") from e

    def create(self, doc: dict) -> dict:
        cfg = self._parse(doc)
        with self._lock:
            if cfg.id in self._configs:
                raise Conflict(f"pipeline {cfg.id!r} already exists")
            self._configs[cfg.id] = cfg
            self._status[cfg.id] = "provisioned"
            return pipeline_detail(cfg, "provisioned")

    def update(self, pid: str, doc: dict) -> dict | None:
        doc = dict(doc, id=pid)
        cfg = self._parse(doc)
        with self._lock:
            if pid not in self._configs:
                return None
            if self._status[pid] == "running":
                raise Conflict("pipeline is running; stop it first")
            self._configs[pid] = cfg
            self._status[pid] = "provisioned"
            return pipeline_detail(cfg, "provisioned")

    def delete(self, pid: str) -> bool:
        with self._lock:
            if pid not in self._configs:
                return False
            if self._status[pid] == "running":
                raise Conflict("pipeline is running; stop it first")
            del self._configs[pid]
            del self._status[pid]
            self._stop_events.pop(pid, None)
            self._threads.pop(pid, None)
            return True

    # -- lifecycle ----------------------------------------------------

    def start(self, pid: str) -> str:
        with self._lock:
            if pid not in self._configs:
                raise LookupError(pid)
            if self._status[pid] == "running":
                raise Conflict("already running")
            cfg = self._configs[pid]
            stop = threading.Event()
            self._stop_events[pid] = stop
            self._status[pid] = "running"
            self._stopped_reason.pop(pid, None)
            self._error.pop(pid, None)  # restart clears the old cause
            taps = {
                nid: insp
                for (p, nid), insp in self._inspectors.items()
                if p == pid
            }

            def work() -> None:
                import inspect as _inspect

                cause = None
                try:
                    takes_inspectors = (
                        "inspectors" in _inspect.signature(self._runner).parameters
                    )
                    if takes_inspectors:
                        final = self._runner(cfg, stop, inspectors=taps)
                    else:  # 2-arg custom runner (tests, embedders)
                        final = self._runner(cfg, stop)
                except Exception as exc:  # noqa: BLE001 — runner crash = failed
                    final = "failed"
                    # the raising node's error IS the reported cause
                    cause = f"{type(exc).__name__}: {exc}"
                with self._lock:
                    if self._status.get(pid) == "running":
                        if (
                            final == "failed"
                            and self._stopped_reason.get(pid) == "user"
                        ):
                            # the reference's archv2 drain-reconfigure
                            # O3 race (20260731-archv2-drain-reconfigure
                            # .md): an operator-initiated graceful stop
                            # racing a transient error surfacing from
                            # the drain itself is a STOP, not a
                            # spontaneous failure — a supervisor
                            # watching status would otherwise restart a
                            # pipeline the operator just told to stop.
                            # The drain error stays visible in `error`.
                            self._status[pid] = "stopped"
                            if cause is not None:
                                self._error[pid] = cause
                        else:
                            self._status[pid] = final
                            if final == "failed":
                                self._stopped_reason[pid] = "system"
                                if cause is not None:
                                    self._error[pid] = cause

            t = threading.Thread(target=work, daemon=True, name=f"pipeline-{pid}")
            self._threads[pid] = t
            t.start()
            return "running"

    def stop(self, pid: str, *, force: bool = False) -> str:
        """Graceful stop waits for the runner to drain (join); ``force``
        (StopPipelineRequest.force) marks the pipeline stopped
        immediately — the daemon runner thread is abandoned, exactly
        the in-flight-loss tradeoff the reference's stopForceful
        makes."""
        with self._lock:
            if pid not in self._configs:
                raise LookupError(pid)
            ev = self._stop_events.get(pid)
            if ev is not None:
                ev.set()
            running = self._status[pid] == "running"
            if running:
                self._stopped_reason[pid] = "user"
            if force and running:
                self._status[pid] = "stopped"
                return "stopped"
        if running:
            t = self._threads.get(pid)
            if t is not None:
                t.join(timeout=30)
        with self._lock:
            if self._status[pid] == "running":  # runner ignored the stop
                self._status[pid] = "stopped"
            return self._status[pid]

    def wait(self, pid: str, timeout: float = 60) -> str | None:
        """Test/ops helper: block until the pipeline leaves 'running'."""
        t = self._threads.get(pid)
        if t is not None:
            t.join(timeout=timeout)
        return self.status(pid)

    # -- DLQ / export / import (api.proto:519-551) --------------------

    def get_dlq(self, pid: str) -> dict:
        from conduit_spark.pipeline.config import DLQConfig

        with self._lock:
            if pid not in self._configs:
                raise LookupError(pid)
            dlq = self._configs[pid].dlq or DLQConfig()
            return {
                "plugin": dlq.plugin,
                "settings": dict(dlq.settings),
                "window_size": dlq.window_size,
                "window_nack_threshold": dlq.window_nack_threshold,
            }

    def get_dlq_records(self, pid: str, count: int = 10) -> dict:
        """Dead-lettered RECORD CONTENT, newest first — the queryable
        DLQ view the reference deferred as Tier-1 work
        (20260715-dlq-record-visibility.md: v0.18 ships a config-only
        view; a bounded, crash-safe, queryable record store needed its
        own design). This engine gets the store for free: a
        file-backed DLQ destination IS a crash-safe queryable log
        (json lines / parquet), so the view is a bounded tail read of
        it — no Spark session, no new storage system. Non-file DLQs
        (builtin:log) have no record store and return an explicit
        error, matching the reference's honest config-only answer."""
        import glob as _glob
        import json as _json
        import os as _os

        with self._lock:
            if pid not in self._configs:
                raise LookupError(pid)
            from conduit_spark.pipeline.config import DLQConfig

            dlq = self._configs[pid].dlq or DLQConfig()
        if dlq.plugin != "builtin:file":
            raise ValueError(
                "DLQ record view requires a file-backed DLQ "
                f"(plugin is {dlq.plugin!r}); configure "
                "dead-letter-queue.settings.path"
            )
        path = str(dlq.settings.get("path", ""))
        fmt = str(dlq.settings.get("format", "json"))
        count = max(1, min(int(count), 1000))  # bounded view
        records: list[dict] = []
        files = sorted(
            (
                f
                for f in _glob.glob(_os.path.join(path, "**"), recursive=True)
                if _os.path.isfile(f)
                and not _os.path.basename(f).startswith((".", "_"))
            ),
            key=_os.path.getmtime,
            reverse=True,
        )
        for f in files:
            if len(records) >= count:
                break
            try:
                if fmt == "json":
                    with open(f, encoding="utf-8") as fh:
                        lines = [ln for ln in fh if ln.strip()]
                    batch = [_json.loads(ln) for ln in reversed(lines)]
                elif fmt == "parquet":
                    import pyarrow.parquet as _pq

                    batch = list(reversed(_pq.read_table(f).to_pylist()))
                else:
                    raise ValueError(f"unsupported DLQ format {fmt!r}")
            except (OSError, ValueError) as e:
                if "unsupported DLQ format" in str(e):
                    raise
                continue  # torn/foreign file: skip, keep the view alive
            records.extend(batch[: count - len(records)])
        for r in records:  # binary fields aren't JSON-serializable
            for k, v in list(r.items()):
                if isinstance(v, (bytes, bytearray)):
                    r[k] = bytes(v).decode("utf-8", "replace")
        return {"records": records, "count": len(records)}

    def update_dlq(self, pid: str, doc: dict) -> dict:
        from conduit_spark.pipeline.config import DLQConfig

        dlq = DLQConfig(
            plugin=doc.get("plugin", "builtin:log"),
            settings=dict(doc.get("settings") or {}),
            window_size=int(doc.get("window_size", doc.get("window-size", 1))),
            window_nack_threshold=int(
                doc.get("window_nack_threshold", doc.get("window-nack-threshold", 0))
            ),
        )
        if dlq.window_nack_threshold >= dlq.window_size > 0:
            raise ConduitError(
                "pipeline.dlq_window",
                "window_nack_threshold must be < window_size (the reference "
                "rejects a window that can never ack)",
                config_path="dead-letter-queue.window-nack-threshold",
                suggestion="set window-nack-threshold below window-size, "
                "or window-size to 0 to disable the window",
            )
        with self._lock:
            if pid not in self._configs:
                raise LookupError(pid)
            if self._status[pid] == "running":
                raise Conflict("pipeline is running; stop it first")
            self._configs[pid].dlq = dlq
        return self.get_dlq(pid)

    def export_pipeline(self, pid: str) -> dict:
        """Full UNREDACTED v2 config document — an export must
        re-import runnable (reference ExportPipeline returns the real
        connector settings for exactly this reason)."""
        from conduit_spark.pipeline.config import pipeline_to_dict

        with self._lock:
            if pid not in self._configs:
                raise LookupError(pid)
            return pipeline_to_dict(self._configs[pid])

    # -- plan / apply (api.proto:554-573) -----------------------------

    def plan(self, doc: dict) -> dict:
        from conduit_spark.pipeline.deploy import plan_diff

        desired = self._parse(doc)
        with self._lock:
            current = self._configs.get(desired.id)
        return plan_diff(current, desired)

    def apply(self, doc: dict, plan_hash: str) -> dict:
        """Execute the reviewed plan. The hash must match a fresh
        recompute — a caller holding a plan for config-as-edited or for
        state-that-moved is refused (provisioning.plan_stale), never
        partially applied. Restart-class changes against a running
        pipeline are refused unless the plane was built with
        ``live_restart_apply=True`` (the operator flag in the
        reference's live-restart-apply design), in which case apply
        stops, reconfigures, and restarts."""
        from conduit_spark.pipeline.deploy import plan_diff

        desired = self._parse(doc)
        with self._lock:
            current = self._configs.get(desired.id)
        diff = plan_diff(current, desired)
        if plan_hash != diff["hash"]:
            raise ConduitError(
                "provisioning.plan_stale",
                "provisioning.plan_stale: config or server state changed "
                "since the plan was computed; re-plan and review",
                status=409,
                suggestion="POST /v1/pipelines/plan again and re-review the diff",
            )
        if not diff["changes"]:
            return diff
        needs_restart = any(c["effect"] == "restart" for c in diff["changes"])
        running = self.status(desired.id) == "running"
        if running and needs_restart and not self.live_restart_apply:
            raise ConduitError(
                "provisioning.restart_required",
                "plan includes restart-class changes and the pipeline is "
                "running; stop it first or start the server with "
                "live_restart_apply",
                status=409,
                suggestion="POST /v1/pipelines/{id}/stop, apply, then start — "
                "or run the server with live_restart_apply",
            )
        if running and needs_restart:
            self.stop(desired.id)
        with self._lock:
            self._configs[desired.id] = desired
            if self._status.get(desired.id) != "running":
                self._status[desired.id] = "provisioned"
        if running and needs_restart:
            self.start(desired.id)
        return diff

    # -- connector / processor entity views (api.proto:766-1134) ------

    def list_connectors(self, pipeline_id: str | None = None) -> list[dict]:
        from conduit_spark.pipeline.views import connector_json

        with self._lock:
            configs = [
                c
                for c in self._configs.values()
                if pipeline_id is None or c.id == pipeline_id
            ]
        out = []
        for c in configs:
            out.extend(connector_json(c.id, conn) for conn in c.connectors)
        return out

    def get_connector(self, node_id: str) -> dict:
        from conduit_spark.pipeline.views import connector_json

        pid, nid = self._resolve_node(node_id, "connector")
        with self._lock:
            c = self._configs[pid]
            conn = next(n for n in c.connectors if n.id == nid)
            return connector_json(pid, conn)

    def list_processors(self, pipeline_id: str | None = None) -> list[dict]:
        from conduit_spark.pipeline.views import processor_json

        with self._lock:
            configs = [
                c
                for c in self._configs.values()
                if pipeline_id is None or c.id == pipeline_id
            ]
        out = []
        for c in configs:
            for p in c.processors:
                out.append(
                    dict(processor_json(p), parent={"type": "pipeline", "id": c.id})
                )
            for conn in c.connectors:
                for p in conn.processors:
                    out.append(
                        dict(
                            processor_json(p),
                            parent={"type": "connector", "id": f"{c.id}:{conn.id}"},
                        )
                    )
        return out

    def get_processor(self, node_id: str) -> dict:
        from conduit_spark.pipeline.views import processor_json

        pid, nid = self._resolve_node(node_id, "processor")
        with self._lock:
            c = self._configs[pid]
            for p in c.processors:
                if p.id == nid:
                    return dict(
                        processor_json(p), parent={"type": "pipeline", "id": pid}
                    )
            for conn in c.connectors:
                for p in conn.processors:
                    if p.id == nid:
                        return dict(
                            processor_json(p),
                            parent={
                                "type": "connector",
                                "id": f"{pid}:{conn.id}",
                            },
                        )
        raise LookupError(node_id)

    # -- connector / processor write CRUD (api.proto:803-916,1046-1131)

    def _pipeline_for_edit(self, pid: str) -> PipelineConfig:
        if pid not in self._configs:
            raise LookupError(pid)
        if self._status[pid] == "running":
            raise Conflict("pipeline is running; stop it first")
        return self._configs[pid]

    def create_connector(self, doc: dict) -> dict:
        from conduit_spark.pipeline.config import ConnectorConfig, _parse_processor
        from conduit_spark.pipeline.registry import validate_connector
        from conduit_spark.pipeline.views import connector_json

        pid = doc.get("pipeline_id")
        if not pid:
            raise ValueError("pipeline_id is required")
        conn = ConnectorConfig(
            id=str(doc.get("id") or (doc.get("config") or {}).get("name") or ""),
            type=doc.get("type", ""),
            plugin=doc.get("plugin", ""),
            settings=dict(
                doc.get("settings") or (doc.get("config") or {}).get("settings") or {}
            ),
            processors=[
                _parse_processor(p) for p in doc.get("processors") or []
            ],
        )
        if not conn.id:
            raise ValueError("connector id (or config.name) is required")
        errors = validate_connector(conn.type, conn.plugin, conn.settings)
        if errors:
            raise ValueError("; ".join(errors))
        with self._lock:
            cfg = self._pipeline_for_edit(pid)
            if any(c.id == conn.id for c in cfg.connectors):
                raise Conflict(f"connector {conn.id!r} already exists in {pid!r}")
            cfg.connectors.append(conn)
            return connector_json(pid, conn)

    def update_connector(self, node_id: str, doc: dict) -> dict:
        from conduit_spark.pipeline.registry import validate_connector
        from conduit_spark.pipeline.views import connector_json

        pid, nid = self._resolve_node(node_id, "connector")
        with self._lock:
            cfg = self._pipeline_for_edit(pid)
            conn = next(c for c in cfg.connectors if c.id == nid)
            plugin = doc.get("plugin", conn.plugin)
            settings = dict(
                doc.get("settings")
                or (doc.get("config") or {}).get("settings")
                or conn.settings
            )
            errors = validate_connector(conn.type, plugin, settings)
            if errors:
                raise ValueError("; ".join(errors))
            conn.plugin = plugin
            conn.settings = settings
            return connector_json(pid, conn)

    def delete_connector(self, node_id: str) -> dict:
        pid, nid = self._resolve_node(node_id, "connector")
        with self._lock:
            cfg = self._pipeline_for_edit(pid)
            cfg.connectors = [c for c in cfg.connectors if c.id != nid]
        return {"deleted": f"{pid}:{nid}"}

    def create_processor(self, doc: dict) -> dict:
        from conduit_spark.pipeline.config import ProcessorConfig
        from conduit_spark.pipeline.registry import PROCESSOR_PLUGINS
        from conduit_spark.pipeline.views import processor_json

        parent = doc.get("parent") or {}
        ptype = parent.get("type", "pipeline")
        parent_id = parent.get("id")
        if not parent_id:
            raise ValueError("parent.id is required")
        plugin = doc.get("plugin") or doc.get("type", "")
        if (
            plugin not in PROCESSOR_PLUGINS
            and plugin != "custom.standalone"
            and not plugin.startswith("standalone:")  # registry-installed
        ):
            raise ValueError(
                f"unknown processor plugin {plugin!r}; "
                f"known: {sorted(PROCESSOR_PLUGINS)}"
            )
        proc = ProcessorConfig(
            id=str(doc.get("id") or plugin),
            plugin=plugin,
            settings=dict(
                doc.get("settings") or (doc.get("config") or {}).get("settings") or {}
            ),
            condition=doc.get("condition"),
            workers=int(
                doc.get("workers", (doc.get("config") or {}).get("workers", 1))
            ),
        )
        if ptype != "pipeline":  # connector parent: pipeline-scoped id
            # resolve OUTSIDE the lock (the resolver locks too)
            pid, nid = self._resolve_node(parent_id, "connector")
        with self._lock:
            if ptype == "pipeline":
                cfg = self._pipeline_for_edit(parent_id)
                target = cfg.processors
                parent_desc = {"type": "pipeline", "id": parent_id}
            else:
                cfg = self._pipeline_for_edit(pid)
                conn = next(c for c in cfg.connectors if c.id == nid)
                target = conn.processors
                parent_desc = {"type": "connector", "id": f"{pid}:{nid}"}
            if any(p.id == proc.id for p in target):
                raise Conflict(f"processor {proc.id!r} already exists")
            target.append(proc)
        return dict(processor_json(proc), parent=parent_desc)

    def update_processor(self, node_id: str, doc: dict) -> dict:
        pid, nid = self._resolve_node(node_id, "processor")
        with self._lock:
            cfg = self._pipeline_for_edit(pid)
            procs = list(cfg.processors) + [
                p for c in cfg.connectors for p in c.processors
            ]
            proc = next(p for p in procs if p.id == nid)
            if "settings" in doc:
                proc.settings = dict(doc["settings"])
            if "condition" in doc:
                proc.condition = doc["condition"]
            if "workers" in doc:
                proc.workers = int(doc["workers"])
        # read-back OUTSIDE the (non-reentrant) lock
        return self.get_processor(f"{pid}:{nid}")

    def delete_processor(self, node_id: str) -> dict:
        pid, nid = self._resolve_node(node_id, "processor")
        with self._lock:
            cfg = self._pipeline_for_edit(pid)
            cfg.processors = [p for p in cfg.processors if p.id != nid]
            for c in cfg.connectors:
                c.processors = [p for p in c.processors if p.id != nid]
        return {"deleted": f"{pid}:{nid}"}

    # -- inspection ---------------------------------------------------

    def _resolve_node(self, node_id: str, kind: str) -> tuple[str, str]:
        """Resolve a connector/processor id to (pipeline id, node id).
        Accepts the reference's fully-qualified ``pipeline:node`` form
        (connector ids are pipeline-scoped there, api.proto:767-782)
        or a bare node id when it is unambiguous."""
        with self._lock:
            configs = list(self._configs.values())

        def nodes(c: PipelineConfig):
            if kind == "connector":
                return [n.id for n in (*c.sources, *c.destinations)]
            out = [p.id for p in c.processors]
            for conn in (*c.sources, *c.destinations):
                out.extend(p.id for p in conn.processors)
            return out

        if ":" in node_id:
            pid, _, nid = node_id.partition(":")
            for c in configs:
                if c.id == pid and nid in nodes(c):
                    return pid, nid
            raise LookupError(node_id)
        hits = [(c.id, node_id) for c in configs if node_id in nodes(c)]
        if not hits:
            raise LookupError(node_id)
        if len(hits) > 1:
            raise Conflict(
                f"{kind} id {node_id!r} exists in pipelines "
                f"{sorted(p for p, _ in hits)}; use 'pipeline:{node_id}'"
            )
        return hits[0]

    def inspect(
        self,
        node_id: str,
        kind: str,
        count: int = 10,
        direction: str = "out",
        *,
        raw: bool = False,
    ) -> dict:
        """Attach (idempotently) an inspector to a connector/processor
        and return the records buffered so far — the HTTP analog of the
        reference's InspectConnector/InspectProcessor server streams
        (api.proto:775,1011-1018): buffered, drop-oldest-on-full, zero
        cost until a session attaches. Records accumulate across runs;
        poll after starting the pipeline."""
        from conduit_spark.streaming.inspector import StreamInspector, jsonable

        if count < 0:
            raise ValueError(f"count must be >= 0, got {count}")
        if direction not in ("in", "out"):
            raise ValueError(f"direction must be in/out, got {direction!r}")
        if direction == "in" and kind != "processor":
            raise ValueError("direction=in applies to processors only")
        pid, nid = self._resolve_node(node_id, kind)
        # the runtime taps "<id>#in" before a processor runs and the
        # bare id after it (InspectProcessorIn/Out, api.proto:1011-1024)
        tap_key = f"{nid}#in" if direction == "in" else nid
        with self._lock:
            insp = self._inspectors.get((pid, tap_key))
            attached = insp is None
            if insp is None:
                insp = StreamInspector(sample_per_batch=max(count, 10))
                self._inspectors[(pid, tap_key)] = insp
        records = insp.records()[-count:] if count > 0 else []
        return {
            "pipeline": pid,
            "id": nid,
            "type": kind,
            "direction": direction,
            "attached": attached,
            # raw=True: real bytes/values for binary protocols
            # (grpc_web renders opencdc protobuf); default JSON-clean
            "records": records if raw else [jsonable(r) for r in records],
        }


_ROUTES = [
    ("POST", re.compile(r"^/mcp$"), "mcp"),
    ("GET", re.compile(r"^/healthz$"), "healthz"),
    ("GET", re.compile(r"^/readyz$"), "readyz"),
    ("GET", re.compile(r"^/info$"), "info"),
    ("GET", re.compile(r"^/v1/metrics$"), "metrics"),
    ("GET", re.compile(r"^/metrics$"), "prometheus"),
    ("GET", re.compile(r"^/v1/plugins$"), "plugins_deprecated"),
    ("GET", re.compile(r"^/v1/processors/plugins$"), "processor_plugins"),
    ("GET", re.compile(r"^/v1/connectors/plugins$"), "connector_plugins"),
    ("GET", re.compile(r"^/v1/connectors$"), "list_connectors"),
    ("POST", re.compile(r"^/v1/connectors/validate$"), "validate_connector"),
    ("POST", re.compile(r"^/v1/connectors$"), "create_connector"),
    ("GET", re.compile(r"^/v1/connectors/([^/]+)/inspect$"), "inspect_connector"),
    ("GET", re.compile(r"^/v1/connectors/([^/]+)$"), "get_connector"),
    ("PUT", re.compile(r"^/v1/connectors/([^/]+)$"), "update_connector"),
    ("DELETE", re.compile(r"^/v1/connectors/([^/]+)$"), "delete_connector"),
    ("GET", re.compile(r"^/v1/processors$"), "list_processors"),
    ("POST", re.compile(r"^/v1/processors$"), "create_processor"),
    ("GET", re.compile(r"^/v1/processors/([^/]+)/inspect$"), "inspect_processor"),
    ("GET", re.compile(r"^/v1/processors/([^/]+)/inspect-in$"), "inspect_processor_in"),
    ("GET", re.compile(r"^/v1/processors/([^/]+)/inspect-out$"), "inspect_processor"),
    ("GET", re.compile(r"^/v1/processors/([^/]+)$"), "get_processor"),
    ("PUT", re.compile(r"^/v1/processors/([^/]+)$"), "update_processor"),
    ("DELETE", re.compile(r"^/v1/processors/([^/]+)$"), "delete_processor"),
    ("GET", re.compile(r"^/v1/pipelines$"), "list"),
    ("POST", re.compile(r"^/v1/pipelines$"), "create"),
    ("POST", re.compile(r"^/v1/pipelines/import$"), "import_pipeline"),
    ("POST", re.compile(r"^/v1/pipelines/plan$"), "plan"),
    ("POST", re.compile(r"^/v1/pipelines/apply$"), "apply"),
    ("GET", re.compile(r"^/v1/pipelines/([^/]+)/dead-letter-queue/records$"), "dlq_records"),
    ("GET", re.compile(r"^/v1/pipelines/([^/]+)/dead-letter-queue$"), "get_dlq"),
    ("PUT", re.compile(r"^/v1/pipelines/([^/]+)/dead-letter-queue$"), "update_dlq"),
    ("POST", re.compile(r"^/v1/pipelines/([^/]+)/export$"), "export_pipeline"),
    ("GET", re.compile(r"^/v1/pipelines/([^/]+)$"), "get"),
    ("PUT", re.compile(r"^/v1/pipelines/([^/]+)$"), "update"),
    ("DELETE", re.compile(r"^/v1/pipelines/([^/]+)$"), "delete"),
    ("POST", re.compile(r"^/v1/pipelines/([^/]+)/start$"), "start"),
    ("POST", re.compile(r"^/v1/pipelines/([^/]+)/stop$"), "stop"),
]


class _Handler(BaseHTTPRequestHandler):
    server_version = "conduit-spark-api/1"

    @property
    def plane(self) -> ControlPlane:
        return self.server.plane  # type: ignore[attr-defined]

    def log_message(self, *a) -> None:  # quiet; tests capture responses
        pass

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    def _dispatch(self, method: str) -> None:
        from urllib.parse import parse_qs, urlsplit

        split = urlsplit(self.path)
        self.query = {k: v[-1] for k, v in parse_qs(split.query).items()}
        if method == "POST" and split.path.startswith("/api.v1."):
            # gRPC-Web transcoding (grpc_web.py): POST /{svc}/{Method}
            # with grpc-web framing — lets clients generated from the
            # reference's api.proto call this gateway unmodified
            from conduit_spark import grpc_web

            ctype = self.headers.get("Content-Type", "")
            body = self.rfile.read(int(self.headers.get("Content-Length") or 0))
            res = grpc_web.handle_grpc_web(self.plane, split.path, body, ctype)
            if res is not None:
                status, payload, out_ct = res
                self.send_response(status)
                self.send_header("Content-Type", out_ct)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
        for m, rx, op in _ROUTES:
            if m != method:
                continue
            match = rx.match(split.path)
            if not match:
                continue
            try:
                self._handle(op, *match.groups())
            except ConduitError as e:
                # structured identity (errors.ConduitError): stable
                # code + optional config_path/suggestion, additive to
                # the prose `error` field
                self._send(e.status, e.to_dict())
            except Conflict as e:
                self._send(409, {"error": str(e), "code": "common.conflict"})
            except LookupError as e:
                self._send(
                    404,
                    {
                        "error": f"{e.args[0]!r} not found",
                        "code": "common.not_found",
                    },
                )
            except Exception as e:  # noqa: BLE001 — config parse errors etc.
                self._send(
                    400,
                    {
                        "error": f"{type(e).__name__}: {e}",
                        "code": "common.invalid_argument",
                    },
                )
            return
        self._send(
            404,
            {"error": f"no route {method} {self.path}", "code": "common.not_found"},
        )

    def _handle(self, op: str, *groups: str) -> None:
        plane = self.plane
        if op == "mcp":
            # MCP over HTTP (reference `conduit mcp --http`,
            # 20260712-mcp-http-transport.md): one JSON-RPC message per
            # POST; notifications get 202 with no body. Registered only
            # when the server was started with an MCPServer — the
            # mutation gate stays a process-level decision.
            mcp = getattr(self.server, "mcp", None)
            if mcp is None:
                self._send(404, {"error": "MCP transport not enabled"})
                return
            resp = mcp.handle(self._body())
            if resp is None:
                self.send_response(202)
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                self._send(200, resp)
        elif op == "healthz":
            # liveness (docs/health_check.md): process alive + state
            # store reachable. The in-memory store's liveness analog is
            # taking the registry lock; ?service= checks one service by
            # name exactly like the reference's per-service probe.
            svc = self.query.get("service")
            known = {
                "PipelineService",
                "ConnectorService",
                "ProcessorService",
                "PluginService",
            }
            if svc is not None and svc not in known:
                self._send(
                    404, {"status": "NOT_FOUND", "error": f"unknown service {svc}"}
                )
            else:
                with plane._lock:  # state-store round-trip
                    pass
                self._send(200, {"status": "SERVING"})
        elif op == "readyz":
            # readiness: degraded pipelines are reported, NOT a 503 —
            # the engine can still serve (docs/health_check.md)
            if not getattr(plane, "ready", True):
                self._send(503, {"status": "starting"})
            else:
                rows = plane.list()
                degraded = [
                    {
                        "id": r["id"],
                        "status": r["status"],
                        "error": r.get("error") or r.get("stopped_reason"),
                    }
                    for r in rows
                    # this plane's crash vocabulary is "failed"
                    # (lifecycle names); both map to the reference's
                    # degraded-but-still-serving bucket
                    if r["status"] in ("degraded", "failed")
                ]
                self._send(
                    200,
                    {
                        "status": "ready",
                        "pipelines": {
                            "total": len(rows),
                            "running": sum(
                                1 for r in rows if r["status"] == "running"
                            ),
                            "degraded": len(degraded),
                            "degradedPipelines": degraded,
                        },
                    },
                )
        elif op == "info":
            import platform

            from conduit_spark import __version__

            self._send(
                200,
                {
                    "version": __version__,
                    "os": platform.system().lower(),
                    "arch": platform.machine(),
                },
            )
        elif op == "plugins_deprecated":
            # reference PluginService.ListPlugins (api.proto:1223-1233,
            # deprecated there too): combined processor plugin list,
            # optional ?name= regex filter
            from conduit_spark.pipeline.registry import PROCESSOR_PLUGINS

            rx = re.compile(self.query["name"]) if "name" in self.query else None
            self._send(
                200,
                [
                    {"name": k, "description": v}
                    for k, v in sorted(PROCESSOR_PLUGINS.items())
                    if rx is None or rx.search(k)
                ],
            )
        elif op == "list_connectors":
            self._send(200, plane.list_connectors(self.query.get("pipeline_id")))
        elif op == "get_connector":
            self._send(200, plane.get_connector(groups[0]))
        elif op == "validate_connector":
            from conduit_spark.pipeline.registry import validate_connector

            body = self._body()
            errors = validate_connector(
                body.get("type", ""),
                body.get("plugin", ""),
                dict(body.get("settings") or {}),
            )
            if errors:
                self._send(400, {"valid": False, "errors": errors})
            else:
                self._send(200, {"valid": True, "errors": []})
        elif op == "list_processors":
            self._send(200, plane.list_processors(self.query.get("pipeline_id")))
        elif op == "get_processor":
            self._send(200, plane.get_processor(groups[0]))
        elif op == "create_connector":
            self._send(201, plane.create_connector(self._body()))
        elif op == "update_connector":
            self._send(200, plane.update_connector(groups[0], self._body()))
        elif op == "delete_connector":
            self._send(200, plane.delete_connector(groups[0]))
        elif op == "create_processor":
            self._send(201, plane.create_processor(self._body()))
        elif op == "update_processor":
            self._send(200, plane.update_processor(groups[0], self._body()))
        elif op == "delete_processor":
            self._send(200, plane.delete_processor(groups[0]))
        elif op == "get_dlq":
            self._send(200, plane.get_dlq(groups[0]))
        elif op == "dlq_records":
            try:
                self._send(
                    200,
                    plane.get_dlq_records(
                        groups[0], count=int(self.query.get("count", "10"))
                    ),
                )
            except ValueError as e:
                self._send(409, {"error": str(e)})
        elif op == "update_dlq":
            self._send(200, plane.update_dlq(groups[0], self._body()))
        elif op == "export_pipeline":
            self._send(200, plane.export_pipeline(groups[0]))
        elif op == "import_pipeline":
            self._send(201, plane.create(self._body()))
        elif op == "plan":
            body = self._body()
            self._send(200, plane.plan(body.get("config", body)))
        elif op == "apply":
            body = self._body()
            self._send(
                200,
                plane.apply(body.get("config", body), body.get("hash", "")),
            )
        elif op == "metrics":
            from conduit_spark.pipeline.metrics import GLOBAL_METRICS

            self._send(200, GLOBAL_METRICS.snapshot())
        elif op == "prometheus":
            from conduit_spark.pipeline.metrics import GLOBAL_METRICS, prometheus_text

            body = prometheus_text(GLOBAL_METRICS.snapshot()).encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif op == "processor_plugins":
            from conduit_spark.pipeline.registry import PROCESSOR_PLUGINS

            self._send(
                200,
                [
                    {"name": k, "description": v}
                    for k, v in sorted(PROCESSOR_PLUGINS.items())
                ],
            )
        elif op == "connector_plugins":
            from conduit_spark.pipeline.registry import (
                _CONNECTOR_REQUIRED,
                CONNECTOR_PLUGINS,
            )

            self._send(
                200,
                [
                    {
                        "name": k,
                        **v,
                        # parameter metadata, the ListConnectorPlugins
                        # params analog: required settings per direction
                        "required_settings": {
                            d: list(_CONNECTOR_REQUIRED.get((k, d), ()))
                            for d in ("source", "destination")
                            if v.get(d, False)
                        },
                    }
                    for k, v in sorted(CONNECTOR_PLUGINS.items())
                ],
            )
        elif op in ("inspect_connector", "inspect_processor", "inspect_processor_in"):
            kind = "connector" if op == "inspect_connector" else "processor"
            direction = "in" if op == "inspect_processor_in" else "out"
            count = int(self.query.get("count", "10"))
            self._send(
                200,
                plane.inspect(groups[0], kind, count=count, direction=direction),
            )
        elif op == "list":
            self._send(200, plane.list())
        elif op == "create":
            self._send(201, plane.create(self._body()))
        elif op == "get":
            doc = plane.get(groups[0])
            if doc is None:
                self._send(404, {"error": f"pipeline {groups[0]!r} not found", "code": "common.not_found"})
            else:
                self._send(200, doc)
        elif op == "update":
            doc = plane.update(groups[0], self._body())
            if doc is None:
                self._send(404, {"error": f"pipeline {groups[0]!r} not found", "code": "common.not_found"})
            else:
                self._send(200, doc)
        elif op == "delete":
            if plane.delete(groups[0]):
                self._send(200, {"deleted": groups[0]})
            else:
                self._send(404, {"error": f"pipeline {groups[0]!r} not found", "code": "common.not_found"})
        elif op == "start":
            self._send(200, {"id": groups[0], "status": plane.start(groups[0])})
        elif op == "stop":
            force = self.query.get("force", "").lower() in ("1", "true")
            body = self._body() if self.headers.get("Content-Length") else {}
            force = force or bool(body.get("force"))
            self._send(
                200,
                {"id": groups[0], "status": plane.stop(groups[0], force=force)},
            )

    def do_GET(self) -> None:  # noqa: N802 — BaseHTTPRequestHandler API
        self._dispatch("GET")

    def do_POST(self) -> None:  # noqa: N802
        self._dispatch("POST")

    def do_PUT(self) -> None:  # noqa: N802
        self._dispatch("PUT")

    def do_DELETE(self) -> None:  # noqa: N802
        self._dispatch("DELETE")


def start_server(
    plane: ControlPlane,
    host: str = "127.0.0.1",
    port: int = 0,
    *,
    mcp=None,
) -> ThreadingHTTPServer:
    """Serve the control plane in a daemon thread; returns the server
    (``server.server_address[1]`` is the bound port; call
    ``shutdown()`` to stop). Pass an ``mcp.MCPServer`` to also serve
    the agent tool catalog at POST /mcp (the reference's HTTP
    transport; the write-tool gate rides the MCPServer the OPERATOR
    constructed, never a request parameter)."""
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.plane = plane  # type: ignore[attr-defined]
    srv.mcp = mcp  # type: ignore[attr-defined]
    t = threading.Thread(target=srv.serve_forever, daemon=True, name="conduit-api")
    t.start()
    return srv
