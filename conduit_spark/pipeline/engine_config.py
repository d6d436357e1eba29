"""Engine-level configuration with the reference's precedence chain.

Every engine setting is configurable three ways, in order of
precedence **flag > environment variable > config file**
(reference docs/health_check.md "Configuration"):

- a CLI flag, e.g. ``--api.http.address=:8080`` (exposed as the
  verb's native flags here);
- an env var with the ``CONDUIT_`` prefix and the flag path
  upper-cased with ``.``/``-`` → ``_``, e.g.
  ``CONDUIT_API_HTTP_ADDRESS=:8080``;
- a key in a ``conduit.yaml`` config file (flat dotted keys or nested
  maps — both accepted, nested maps are flattened on dots).

``conduit run`` with no configuration starts with the defaults below
(the reference's zero-config promise).
"""

from __future__ import annotations

import os
from typing import Any

DEFAULTS: dict[str, str] = {
    "api.http.address": "127.0.0.1:8080",
    "pipelines.path": "./pipelines",
    "pipelines.checkpoint-dir": "/tmp/conduit-spark/ckpt",
    "plugins.path": os.path.expanduser("~/.conduit-spark/plugins"),
}

# The reference's full `conduit run` flag surface
# (cmd/conduit/root/run/run.go) — declared here so a CONDUIT_* env var
# for any of these keys is honored even when the key appears in
# neither DEFAULTS nor the config file. Env vars can only address
# DECLARED keys: the env-name → dotted-key reverse mapping is
# ambiguous (underscores stand for both dots and dashes), so novel
# keys must arrive via the config file or a flag, whose spelling is
# exact.
KNOWN_KEYS: frozenset[str] = frozenset(
    {
        "api.allow-live-restart-apply",
        "api.enabled",
        "api.grpc.address",
        "api.http.address",
        "api.http.cors.allowed-origins",
        "api.http.ui.enabled",
        "config.path",
        "connectors.max-receive-record-size",
        "connectors.path",
        "db.badger.path",
        "db.postgres.connection-string",
        "db.postgres.table",
        "db.sqlite.path",
        "db.sqlite.table",
        "db.type",
        "dev.enabled",
        "log.format",
        "log.level",
        "pipelines.checkpoint-dir",
        "pipelines.error-recovery.backoff-factor",
        "pipelines.error-recovery.max-delay",
        "pipelines.error-recovery.max-retries",
        "pipelines.error-recovery.max-retries-window",
        "pipelines.error-recovery.min-delay",
        "pipelines.exit-on-degraded",
        "pipelines.path",
        "plugins.path",
        "preview.pipeline-arch-v2",
        "preview.pipeline-arch-v2-disable-metrics",
        "processors.path",
        "schema-registry.confluent.connection-string",
        "schema-registry.type",
    }
)


def env_name(key: str) -> str:
    """Flag path → env var: ``api.http.address`` →
    ``CONDUIT_API_HTTP_ADDRESS`` (dots AND dashes become underscores)."""
    return "CONDUIT_" + key.upper().replace(".", "_").replace("-", "_")


def _flatten(doc: dict, prefix: str = "") -> dict[str, str]:
    out: dict[str, str] = {}
    for k, v in (doc or {}).items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = str(v)
    return out


def resolve_engine_config(
    flags: dict[str, Any] | None = None,
    *,
    config_path: str | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, str]:
    """The effective engine configuration: defaults overlaid by config
    file, then ``CONDUIT_*`` env vars, then explicit flags (``None``
    flag values mean "not passed" and do not override). Unknown keys
    in the file or flags are carried through verbatim — forward
    compatibility over strictness, matching the provisioning lint
    split (errors there, advisories here)."""
    env = os.environ if env is None else env
    out = dict(DEFAULTS)
    if config_path:
        import yaml

        with open(config_path, encoding="utf-8") as f:
            doc = yaml.safe_load(f) or {}
        if not isinstance(doc, dict):
            raise ValueError(f"{config_path}: engine config must be a mapping")
        out.update(_flatten(doc))
    # Env overlays every DECLARED key: defaults, the reference flag
    # surface (KNOWN_KEYS), file keys, and flag keys — not just keys
    # already present — so CONDUIT_LOG_LEVEL works with no config
    # file. Flags still win: they're applied after.
    for key in set(out) | KNOWN_KEYS | set(flags or {}):
        if (val := env.get(env_name(key))) is not None:
            out[key] = val
    for k, v in (flags or {}).items():
        if v is not None:
            out[k] = str(v)
    return out


def split_address(addr: str, *, default_host: str = "127.0.0.1") -> tuple[str, int]:
    """``host:port`` / ``:port`` → (host, port); bare ``host`` keeps
    the default API port."""
    if ":" in addr:
        host, _, port = addr.rpartition(":")
        return (host or default_host), int(port)
    return addr or default_host, 8080
