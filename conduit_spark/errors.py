"""Machine-actionable errors — stable code + failing config path +
suggested fix.

The reference's structured-error linchpin
(docs/design-documents/20260705-conduit-error-and-structured-output.md):
every user-facing error should carry a stable string ``code`` an agent
or UI can switch on, the ``config_path`` that failed (when the error
is about configuration), and a ``suggestion`` a human can apply. The
HTTP gateway renders these additively — the prose ``error`` field
stays, so prose-reading clients keep working while structured
consumers (MCP tools, ``--json`` CLI verbs) get identity.

Code taxonomy (dot-separated, most-general first), mirroring the
reference's sentinel families:

- ``common.not_found`` / ``common.conflict`` / ``common.invalid_argument``
  — the derived fallbacks the gateway attaches to untyped exceptions
- ``provisioning.plan_stale``, ``provisioning.<resource>.<action>`` —
  deploy plan/apply (pipeline/deploy.py already stamps these)
- ``config.validation`` — connector/processor config validation
- ``pipeline.dlq_window`` — DLQ window invariant violations
"""

from __future__ import annotations


class ConduitError(RuntimeError):
    """An error with stable identity. ``status`` is the HTTP code the
    gateway uses; embedders catching the exception read ``.code`` /
    ``.config_path`` / ``.suggestion`` natively (one model, two
    encodings)."""

    def __init__(
        self,
        code: str,
        message: str,
        *,
        status: int = 400,
        config_path: str | None = None,
        suggestion: str | None = None,
    ) -> None:
        super().__init__(message)
        self.code = code
        self.status = status
        self.config_path = config_path
        self.suggestion = suggestion

    def to_dict(self) -> dict:
        out = {"error": str(self), "code": self.code}
        if self.config_path is not None:
            out["config_path"] = self.config_path
        if self.suggestion is not None:
            out["suggestion"] = self.suggestion
        return out
