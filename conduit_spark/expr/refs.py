"""Reference-resolver paths → Spark Column accessors.

The reference addresses record fields with dotted paths like
``.Payload.After.foo.bar``, ``.Metadata.key``, ``.Operation``
(reference: pkg/plugin/processor/builtin/internal/references.go:17-25;
resolver semantics from the processor-sdk, e.g. impl/field/set.go:81-85).

Here a path resolves against the envelope DataFrame
(``conduit_spark.envelope.ENVELOPE_SCHEMA``):

- ``.Position`` / ``.Operation``  → envelope columns
- ``.Metadata.k``                 → ``metadata['k']``
- ``.Key`` (+subpath)             → structured key (``key_json``) when
  present, else raw bytes as string
- ``.Payload.Before`` / ``.Payload.After`` (+subpath) → the *typed*
  payload struct column (``payload_after``) when the pipeline has
  bound a schema (envelope.with_typed_payload), else JSON access via
  ``get_json_object`` on the JSON string column — both JVM-side.

All resolution is plan-time; no Python runs per record.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_ROOTS = ("position", "operation", "metadata", "key", "payload.before", "payload.after")


@dataclass(frozen=True)
class FieldRef:
    """Parsed reference path: a root plus a subpath inside it."""

    root: str  # one of _ROOTS
    path: tuple[str, ...] = ()

    @property
    def dotted(self) -> str:
        return ".".join(self.path)

    def __str__(self) -> str:  # back to Conduit-style notation
        parts = {
            "position": ".Position",
            "operation": ".Operation",
            "metadata": ".Metadata",
            "key": ".Key",
            "payload.before": ".Payload.Before",
            "payload.after": ".Payload.After",
        }[self.root]
        return parts + ("." + self.dotted if self.path else "")


def parse_ref(path: str) -> FieldRef:
    """Parse ``.Payload.After.foo.bar`` style reference notation."""
    p = path.strip()
    if not p.startswith("."):
        raise ValueError(f"field reference must start with '.': {path!r}")
    parts = p[1:].split(".")
    lowered = [x.lower() for x in parts]
    if lowered[:1] == ["position"]:
        _require_no_sub(parts, 1, path)
        return FieldRef("position")
    if lowered[:1] == ["operation"]:
        _require_no_sub(parts, 1, path)
        return FieldRef("operation")
    if lowered[:1] == ["metadata"]:
        return FieldRef("metadata", tuple(parts[1:]))
    if lowered[:1] == ["key"]:
        return FieldRef("key", tuple(parts[1:]))
    if lowered[:1] == ["payload"]:
        if len(parts) < 2 or lowered[1] not in ("before", "after"):
            raise ValueError(
                f"payload reference must be .Payload.Before/.Payload.After: {path!r}"
            )
        return FieldRef(f"payload.{lowered[1]}", tuple(parts[2:]))
    raise ValueError(f"unknown reference root in {path!r}")


def _require_no_sub(parts: list[str], n: int, path: str) -> None:
    if len(parts) > n:
        raise ValueError(f"{path!r}: this root has no sub-fields")


_PAYLOAD_COLS = {
    "payload.before": ("payload_before", "payload_before_json"),
    "payload.after": ("payload_after", "payload_after_json"),
}


def resolve(ref: FieldRef | str, df: DataFrame) -> Column:
    """Resolve a reference to a readable Column against ``df``."""
    if isinstance(ref, str):
        ref = parse_ref(ref)
    cols = set(df.columns)
    if ref.root == "position":
        return F.col("position").cast("string")
    if ref.root == "operation":
        return F.col("operation")
    if ref.root == "metadata":
        if not ref.path:
            return F.col("metadata")
        if len(ref.path) != 1:
            raise ValueError(f"metadata keys are flat strings: {ref}")
        # Go map[string]string access yields the zero value "" for
        # missing keys — conditions must see "" too, not NULL
        return F.coalesce(F.col("metadata").getItem(ref.path[0]), F.lit(""))
    if ref.root == "key":
        if "key_struct" in cols and not ref.path:
            return F.col("key_struct")
        if ref.path:
            return F.get_json_object(
                F.col("key_json"), "$." + ".".join(ref.path)
            )
        return F.coalesce(F.col("key_json"), F.col("key_raw").cast("string"))
    typed, json_col = _PAYLOAD_COLS[ref.root]
    if typed in cols:
        c = F.col(typed)
        for part in ref.path:
            c = c[part]  # __getitem__ handles struct fields and map keys
        return c
    if not ref.path:
        base = F.col(json_col)
        if ref.root == "payload.after" and "payload_after_raw" in cols:
            return F.coalesce(base, F.col("payload_after_raw").cast("string"))
        return base
    return F.get_json_object(F.col(json_col), "$." + ".".join(ref.path))
