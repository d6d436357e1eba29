"""``conduit generate "<natural language>"`` — AI-assisted pipeline
generation (reference design doc ``20260722-conduit-generate.md``, the
v0.19 Agent-native roadmap item with a committed acceptance bar).

Architecture mirrors the reference doc's shape exactly — nothing new
is invented for schema checking or deployment:

1. **Grounding**: the prompt catalog comes from the LIVE registries
   (``pipeline.registry.CONNECTOR_PLUGINS`` / ``PROCESSOR_PLUGINS`` +
   required settings), the same inventory ``llms.txt`` ships.
2. **Provider**: a pluggable transport callable
   (``{"prompt", "request"} -> {"pipeline": dict | "yaml": str}``) —
   the same injectable-transport pattern the enrich processors use for
   cohere/openai/ollama, so a real LLM slots in without code changes.
   The DEFAULT provider is :func:`rule_based_provider` — deterministic
   request parsing, because this environment has no network and the
   acceptance bar is about the GATES, not the model.
3. **Gates**, in order, every candidate, no exceptions:
   - structural: the candidate must parse through the real
     ``parse_yaml`` and every connector must pass the real
     ``validate_connector`` (unknown plugin → closest-match
     suggestion, NEVER a fabricated plugin name — the committed bar);
   - advisory: ``lint_pipeline_dict`` warnings ride along;
   - **semantic intent** (the harder bar the v0.19 DX review added:
     schema-valid ≠ correct): a deterministic checker asserts the
     candidate actually references the systems, roles, and quoted
     literals the request named.
4. **Deploy is not here**: the output feeds the EXISTING
   ``deploy``/``apply`` plan+hash machinery; this module never touches
   a running server.
"""

from __future__ import annotations

import difflib
import json
import re
from typing import Any, Callable

from conduit_spark.pipeline.config import lint_pipeline_dict, parse_yaml
from conduit_spark.pipeline.registry import (
    _CONNECTOR_REQUIRED,
    CONNECTOR_PLUGINS,
    PROCESSOR_PLUGINS,
    validate_connector,
)


class GenerateError(ValueError):
    """Candidate rejected by a gate; ``reasons`` lists every failure."""

    def __init__(self, reasons: list[str]):
        super().__init__("; ".join(reasons))
        self.reasons = reasons


def catalog() -> dict:
    """The grounding catalog, from the live registries."""
    return {
        "connectors": {
            name: {
                **info,
                "required_settings": {
                    d: list(_CONNECTOR_REQUIRED.get((name, d), ()))
                    for d in ("source", "destination")
                },
            }
            for name, info in sorted(CONNECTOR_PLUGINS.items())
        },
        "processors": dict(sorted(PROCESSOR_PLUGINS.items())),
    }


def grounding_prompt(request: str) -> str:
    """The provider prompt: request + the catalog, nothing else."""
    return (
        "Produce a pipeline config (version 2.2 dict with id, "
        "connectors, processors) for this request, using ONLY the "
        "plugins in the catalog.\n"
        f"REQUEST: {request}\n"
        f"CATALOG: {json.dumps(catalog(), sort_keys=True)}"
    )


# --- the deterministic offline provider --------------------------------

_SYSTEMS = {
    "kafka": "builtin:kafka",
    "postgres": "builtin:postgres",
    "s3": "builtin:s3",
    "file": "builtin:file",
    "files": "builtin:file",
    "generator": "builtin:generator",
    "synthetic": "builtin:generator",
    "log": "builtin:log",
}

_PROC_INTENTS = [
    # (request regex, plugin, settings builder)
    (r"\bfilter\b", "filter", lambda m: {}),
    (r"\b(mask|redact|remove|drop) (the )?field\b", "field.exclude",
     lambda m: {}),
    (r"\b(decode|parse) (the )?json\b", "json.decode", lambda m: {}),
    (r"\bjson[- ]encode\b", "json.encode", lambda m: {}),
    (r"\bbase64[- ]decode\b", "base64.decode", lambda m: {}),
    (r"\bbase64[- ]encode\b", "base64.encode", lambda m: {}),
    (r"\bembed(dings?)?\b", "cohere.embed", lambda m: {}),
    (r"\bunwrap (the )?debezium\b", "unwrap.debezium", lambda m: {}),
    (r"\bavro[- ]decode\b", "avro.decode", lambda m: {}),
]


def _quoted(request: str) -> list[str]:
    return re.findall(r"""['"]([^'"]+)['"]""", request)


def _directional_word(low: str, role: str) -> str | None:
    """The word the request names for a role: after ``from`` (source)
    or ``to/into`` (destination); for verb-led sources with no ``from``
    ("copy files at ...", "stream kafka topic ..."), the first KNOWN
    system word before the destination preposition."""
    preps = r"from" if role == "source" else r"to|into"
    m = re.search(rf"\b(?:{preps})\s+(?:a\s+|the\s+)?(\w+)", low)
    if m:
        return m.group(1)
    if role == "source":
        cut = re.search(r"\b(?:to|into)\b", low)
        head = low[: cut.start()] if cut else low
        for w in re.findall(r"\w+", head):
            if w in _SYSTEMS:
                return w
    return None


def _role_system(low: str, role: str) -> str | None:
    w = _directional_word(low, role)
    return _SYSTEMS.get(w) if w else None


def _default_settings(plugin: str, role: str, literals: list[str]) -> dict:
    lit = literals[0] if literals else None
    if plugin == "builtin:kafka":
        return {"servers": "localhost:9092", "topic": lit or "events"}
    if plugin == "builtin:file":
        return {"path": lit or "/data/in", "format": "json"}
    if plugin == "builtin:s3":
        return {"path": lit or "s3a://bucket/prefix"}
    if plugin == "builtin:postgres":
        return {"url": "jdbc:postgresql://localhost/db",
                "table": lit or "events"}
    if plugin == "builtin:generator":
        return {"recordCount": 1000, "format.options": {"id": "int"}}
    return {}


def rule_based_provider(req: dict) -> dict:
    """Deterministic request → candidate config. Intentionally modest:
    it exists so the gates have something real to gate offline, and as
    the grounded-fallback tier real providers degrade to."""
    request = req["request"]
    low = request.lower()
    literals = _quoted(request)
    src = _role_system(low, "source") or "builtin:generator"
    dst = _role_system(low, "destination") or "builtin:log"
    src_lits = [x for x in literals if _lit_role(request, x) != "destination"]
    dst_lits = [x for x in literals if _lit_role(request, x) == "destination"]
    connectors = [
        {
            "id": "src",
            "type": "source",
            "plugin": src,
            "settings": _default_settings(src, "source", src_lits),
        },
        {
            "id": "dst",
            "type": "destination",
            "plugin": dst,
            "settings": _default_settings(dst, "destination", dst_lits),
        },
    ]
    processors = []
    for k, (pat, plugin, mk) in enumerate(_PROC_INTENTS):
        m = re.search(pat, low)
        if m:
            processors.append(
                {"id": f"p{k}", "plugin": plugin, "settings": mk(m)}
            )
    return {
        "pipeline": {
            "id": req.get("pipeline_id", "generated"),
            "status": "provisioned",
            "description": f"generated: {request}"[:200],
            "connectors": connectors,
            "processors": processors,
        }
    }


def _lit_role(request: str, lit: str) -> str:
    """Which side of the directional split a quoted literal sits on."""
    m = re.search(r"\b(?:to|into)\b", request, re.IGNORECASE)
    if m and request.find(lit) > m.start():
        return "destination"
    return "source"


# --- the gates ----------------------------------------------------------


def _closest(name: str) -> str | None:
    pool = list(CONNECTOR_PLUGINS) + list(PROCESSOR_PLUGINS)
    # match against both full names and the bare suffix ("kafka" →
    # "builtin:kafka")
    suffixes = {p.split(":")[-1]: p for p in pool}
    if name in suffixes:
        return suffixes[name]
    hit = difflib.get_close_matches(name, pool + list(suffixes), n=1,
                                    cutoff=0.6)
    if not hit:
        return None
    return suffixes.get(hit[0], hit[0])


def structural_gate(pipeline: dict) -> list[str]:
    """Unknown plugins (with closest-match suggestions, never a
    fabricated name), direction/required-setting errors via the REAL
    validator, and a parse round-trip through the real parser."""
    errors: list[str] = []
    for c in pipeline.get("connectors", []):
        plugin = str(c.get("plugin", ""))
        if plugin not in CONNECTOR_PLUGINS and not plugin.startswith(
            "standalone:"
        ):
            hint = _closest(plugin)
            errors.append(
                f"connector {c.get('id')}: unknown plugin {plugin!r}"
                + (f"; did you mean {hint!r}?" if hint else "")
            )
            continue
        errors.extend(
            f"connector {c.get('id')}: {e}"
            for e in validate_connector(
                str(c.get("type", "")), plugin, c.get("settings") or {}
            )
        )
    for p in pipeline.get("processors", []) + [
        sp
        for c in pipeline.get("connectors", [])
        for sp in c.get("processors", []) or []
    ]:
        plugin = str(p.get("plugin", ""))
        if plugin not in PROCESSOR_PLUGINS:
            hint = _closest(plugin)
            errors.append(
                f"processor {p.get('id')}: unknown plugin {plugin!r}"
                + (f"; did you mean {hint!r}?" if hint else "")
            )
    if errors:
        return errors
    try:
        parse_yaml(to_yaml(pipeline))
    except Exception as e:  # noqa: BLE001 — the parser's message IS the error
        errors.append(f"parse: {e}")
    return errors


def intent_gate(request: str, pipeline: dict) -> list[str]:
    """Deterministic semantic-intent check: every system the request
    names must appear as a connector (in the right ROLE when the
    request is directional), every quoted literal must appear among
    the settings values, and named processor intents must be present.
    Schema-valid but wrong is a REJECTION, not a warning."""
    unmet: list[str] = []
    low = request.lower()
    conns = pipeline.get("connectors", [])

    def has(plugin: str, role: str | None) -> bool:
        return any(
            c.get("plugin") == plugin
            and (role is None or c.get("type") == role)
            for c in conns
        )

    for role in ("source", "destination"):
        word = _directional_word(low, role)
        want = _SYSTEMS.get(word) if word else None
        if want and not has(want, role):
            unmet.append(f"request names {want!r} as the {role}")
        elif word and want is None:
            # the committed bar: an unknown system is a rejection with
            # a closest-match suggestion, never a silently-substituted
            # connector
            hint = _closest(word)
            unmet.append(
                f"no known connector for {word!r} (the {role})"
                + (f"; closest: {hint!r}" if hint else "")
            )
    for word, plugin in _SYSTEMS.items():
        if re.search(rf"\b{word}\b", low) and not has(plugin, None):
            unmet.append(f"request mentions {word!r} ({plugin}) — absent")
    settings_blob = json.dumps(
        [c.get("settings") or {} for c in conns]
        + [p.get("settings") or {} for p in pipeline.get("processors", [])]
    )
    for lit in _quoted(request):
        if lit not in settings_blob:
            unmet.append(f"quoted literal {lit!r} not used in any setting")
    procs = {p.get("plugin") for p in pipeline.get("processors", [])}
    for pat, plugin, _ in _PROC_INTENTS:
        if re.search(pat, low) and plugin not in procs:
            unmet.append(f"request implies processor {plugin!r} — absent")
    return sorted(set(unmet))


def to_yaml(pipeline: dict) -> str:
    import yaml

    return yaml.safe_dump(
        {"version": "2.2", "pipelines": [pipeline]}, sort_keys=False
    )


def generate_pipeline(
    request: str,
    *,
    transport: Callable[[dict], dict] | None = None,
    pipeline_id: str = "generated",
) -> dict:
    """Generate, then gate. Returns ``{yaml, pipeline, warnings}``;
    raises :class:`GenerateError` listing every gate failure."""
    provider = transport or rule_based_provider
    out = provider(
        {
            "prompt": grounding_prompt(request),
            "request": request,
            "pipeline_id": pipeline_id,
        }
    )
    if "pipeline" in out:
        pipeline = out["pipeline"]
    elif "yaml" in out:
        import yaml

        doc = yaml.safe_load(out["yaml"])
        pipelines = (doc or {}).get("pipelines") or []
        if not pipelines:
            raise GenerateError(["provider returned no pipeline"])
        pipeline = pipelines[0]
    else:
        raise GenerateError(["provider returned neither pipeline nor yaml"])
    reasons = structural_gate(pipeline)
    if reasons:
        raise GenerateError(reasons)
    unmet = intent_gate(request, pipeline)
    if unmet:
        raise GenerateError([f"intent: {u}" for u in unmet])
    return {
        "yaml": to_yaml(pipeline),
        "pipeline": pipeline,
        "warnings": lint_pipeline_dict(pipeline),
    }
