"""Connector-plugin registry: resolve ``name[@version]`` against an
index, install the artifact with fail-closed verification, and pin
installs in a manifest — the engine analog of the reference's
connector registry (pkg/registry: install.go/manifest.go/semver.go,
FailClosedVerifier in verify.go; CLI `conduit connectors
install/uninstall/list`).

Index format (JSON, local file — the signed-index transport of the
reference is network territory; file indexes keep the trust model
testable offline):

    {"connectors": {
        "<name>": {
            "<version>": {"artifact": "<path or file:// url>",
                           "sha256": "<hex>",
                           "description": "..."}}}}

Trust model, mirroring the reference's tiers (the signature layer and
policy gate live in ``plugin_trust``):

- **signed** entries carry a detached ed25519 signature over
  ``(kind, name, version, sha256)`` plus a publisher identity;
  verification is fail-closed against a local trust-root file
  (``plugin_trust.verify_artifact`` — unknown publisher/key, identity
  mismatch, or bad signature refuse with stable ``trust.*`` codes).
  A signed entry with no trust root to check against REFUSES — it
  never silently downgrades to digest-only.
- **digest-pinned** entries (sha256, no signature) verify the digest
  fail-closed; a mismatch always refuses and leaves nothing behind.
- **unsigned** entries (neither) are a policy decision: the caller
  must present a ``plugin_trust.Decision`` from ``decide_unsigned``
  (the CLI path), or the legacy ``allow_unsigned=True`` boolean for
  embedding apps that gate upstream.
- the artifact is staged to a temp file, hashed, and only then moved
  into place — a partial download can never be resolved; installs
  take an exclusive flock (``plugin_trust.install_lock``) so two
  concurrent installs cannot interleave manifest writes.
- the manifest is keyed ``name@version`` so two pipelines can pin two
  versions of one connector simultaneously (the reference's
  load-bearing manifest fix, plan-v2 §3).
- the **offline bundle** path (``plugin_trust.prepare_bundle`` /
  ``install_from_bundle``) packages an already-verified install and
  re-verifies everything at install time with zero network access.

Installed plugins are addressable from pipeline YAML as
``standalone:<name>[@<version>]`` (latest installed when unpinned),
resolved by ``pipeline/registry.py`` into the subprocess command the
standalone connector runtime executes.
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
import re
import shutil
import tempfile
import urllib.request

DEFAULT_ROOT = os.path.expanduser("~/.conduit-spark/plugins")


class RegistryError(RuntimeError):
    """Raised with a stable dotted code prefix (registry.*)."""


def normalize_version(v: str) -> str:
    """The one version-comparison primitive: semver equality tolerates
    a leading 'v' (reference semver.go — never bare string compares)."""
    return v[1:] if v.startswith("v") else v


def _version_key(v: str) -> tuple:
    parts = re.split(r"[.\-+]", normalize_version(v))
    return tuple(
        (0, int(p)) if p.isdigit() else (1, p) for p in parts
    )


def parse_ref(ref: str) -> tuple[str, str | None]:
    """``name[@version]`` → (name, version|None)."""
    name, _, version = ref.partition("@")
    if not name:
        raise RegistryError(f"registry.bad_ref: empty name in {ref!r}")
    return name, (normalize_version(version) or None)


def load_index(path: str) -> dict:
    """Index may carry ``connectors`` and/or ``processors`` — the
    processor collection is ADDITIVE to the frozen connector schema
    (reference 20260727-registry-processor-artifacts.md: same trust
    core, same Publisher/Revocation shapes; older clients that only
    know connectors simply ignore it)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if not isinstance(doc, dict) or (
        "connectors" not in doc and "processors" not in doc
    ):
        raise RegistryError(
            f"registry.bad_index: {path} has neither a 'connectors' "
            "nor a 'processors' key"
        )
    return doc


def resolve_index(
    index: dict, name: str, version: str | None, *, kind: str = "connector"
) -> tuple[str, dict]:
    """Pick the entry for name@version (latest by semver if None) from
    the ``kind`` collection ('connector' | 'processor')."""
    coll = index.get(kind + "s") or {}
    versions = coll.get(name)
    if not versions:
        raise RegistryError(
            f"registry.unknown_{kind}: {name!r} not in index "
            f"(known: {sorted(coll)})"
        )
    norm = {normalize_version(v): e for v, e in versions.items()}
    if version is None:
        version = max(norm, key=_version_key)
    if version not in norm:
        raise RegistryError(
            f"registry.unknown_version: {name}@{version} not in index "
            f"(known: {sorted(norm, key=_version_key)})"
        )
    return version, norm[version]


def _manifest_path(root: str) -> str:
    return os.path.join(root, "manifest.json")


def _load_manifest(root: str) -> dict:
    try:
        with open(_manifest_path(root), encoding="utf-8") as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _write_manifest(root: str, manifest: dict) -> None:
    os.makedirs(root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".manifest")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))


# Hard ceiling on a fetched artifact. The reference carries a dedicated
# bounded fetcher (pkg/registry/boundedfetch/boundedfetch.go) because a
# malicious or compromised index can point at an endless stream and
# disk-fill the host before digest verification ever runs. Same
# semantics here: declared Content-Length over the cap fails fast, a
# stream that keeps going past the cap fails mid-flight, and the
# partial staging file is removed either way (fail-closed, no residue).
MAX_ARTIFACT_BYTES = 512 * 1024 * 1024


def _fetch(artifact: str, dest: str, *, max_bytes: int | None = None) -> None:
    if max_bytes is None:  # late-bound so embedders/tests can tune the cap
        max_bytes = MAX_ARTIFACT_BYTES

    def _over(n) -> "RegistryError":
        return RegistryError(
            f"registry.artifact_too_large: {artifact} is {n} bytes "
            f"(cap {max_bytes}); refusing to stage"
        )

    if artifact.startswith(("http://", "https://", "file://")):
        try:
            with urllib.request.urlopen(artifact, timeout=60) as resp:  # noqa: S310
                declared = resp.headers.get("Content-Length")
                if declared is not None and int(declared) > max_bytes:
                    raise _over(declared)
                got = 0
                with open(dest, "wb") as f:
                    while True:
                        chunk = resp.read(1024 * 1024)
                        if not chunk:
                            break
                        got += len(chunk)
                        if got > max_bytes:
                            raise _over(f">{got}")
                        f.write(chunk)
        except RegistryError:
            # never leave a partial (possibly cap-sized) file staged
            with contextlib.suppress(OSError):
                os.remove(dest)
            raise
    else:
        size = os.stat(artifact).st_size
        if size > max_bytes:
            raise _over(size)
        shutil.copyfile(artifact, dest)


def _manifest_key(kind: str, name: str, version: str) -> str:
    """Connector keys stay bare ``name@version`` (manifest
    back-compat); processors namespace as ``processor:name@version``."""
    base = f"{name}@{version}"
    return base if kind == "connector" else f"{kind}:{base}"


def install(
    ref: str,
    *,
    index_path: str,
    root: str = DEFAULT_ROOT,
    allow_unsigned=False,
    kind: str = "connector",
    trust_root_path: str | None = None,
) -> dict:
    """Resolve → stage → verify (signature and/or digest) → place →
    pin, under an exclusive install lock. Fail-closed at every step:
    nothing is resolvable until verification passed. ``kind`` selects
    the index collection; processor artifacts ride the SAME
    verification path (the reference's one-trust-core decision,
    ADR 20260727-processors-ride-connector-registry).
    ``allow_unsigned`` is a ``plugin_trust.Decision`` (the CLI path)
    or the legacy boolean for embedders that gate upstream; it applies
    ONLY to entries with neither signature nor sha256."""
    from conduit_spark import plugin_trust

    if kind not in ("connector", "processor"):
        raise RegistryError(f"registry.bad_kind: {kind!r}")
    name, version = parse_ref(ref)
    version, entry = resolve_index(
        load_index(index_path), name, version, kind=kind
    )
    want = entry.get("sha256")
    signature = entry.get("signature")
    provenance = entry.get("provenance")
    if signature is not None and trust_root_path is None:
        raise RegistryError(
            f"trust.no_trust_root: {name}@{version} is signed but no "
            "trust root was given to verify against; refusing (a signed "
            "entry never downgrades to digest-only)"
        )
    if provenance is not None and trust_root_path is None:
        raise RegistryError(
            f"trust.no_trust_root: {name}@{version} carries a provenance "
            "attestation but no trust root was given; refusing (an "
            "attestation never downgrades to unchecked)"
        )
    if want is None and signature is None:
        ok = (
            allow_unsigned.allowed()
            if isinstance(allow_unsigned, plugin_trust.Decision)
            else bool(allow_unsigned)
        )
        if not ok:
            raise RegistryError(
                f"registry.unsigned_artifact: {name}@{version} has "
                "neither signature nor sha256 in the index; present a "
                "decide_unsigned Decision to install anyway"
            )
    os.makedirs(root, exist_ok=True)
    with plugin_trust.install_lock(root):
        fd, staged = tempfile.mkstemp(dir=root, suffix=".staged")
        os.close(fd)
        sig_result = None
        try:
            _fetch(entry["artifact"], staged)
            got = hashlib.sha256(open(staged, "rb").read()).hexdigest()
            if want is not None and got != want:
                raise RegistryError(
                    f"registry.artifact_verification_failed: {name}@{version} "
                    f"digest {got[:12]}… != index {want[:12]}…; refusing"
                )
            prov_result = None
            if signature is not None or provenance is not None:
                troot = plugin_trust.load_trust_root(trust_root_path)
                if signature is not None:
                    sig_result = plugin_trust.verify_artifact(
                        staged,
                        name=name,
                        version=version,
                        kind=kind,
                        signature=signature,
                        trust_root=troot,
                    )
                # provenance rides AFTER the artifact signature: a
                # valid publisher signature never excuses a missing or
                # mismatched builder attestation (reference provenance.go
                # — the checks are independent and both must pass)
                if provenance is not None:
                    prov_result = plugin_trust.verify_provenance(
                        staged, provenance=provenance, trust_root=troot
                    )
                elif isinstance(troot.get("builder"), dict) and troot[
                    "builder"
                ].get("require_provenance"):
                    raise RegistryError(
                        f"trust.provenance_required: {name}@{version} has "
                        "no provenance attestation but the trust root's "
                        "builder policy requires one; refusing"
                    )
            dest_dir = os.path.join(
                root if kind == "connector" else os.path.join(root, "processors"),
                name,
                version,
            )
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(
                dest_dir, os.path.basename(entry["artifact"].rstrip("/"))
            )
            os.replace(staged, dest)
            os.chmod(dest, 0o755)
        except BaseException:
            if os.path.exists(staged):
                os.unlink(staged)
            raise
        manifest = _load_manifest(root)
        key = _manifest_key(kind, name, version)
        manifest[key] = {
            "name": name,
            "version": version,
            "kind": kind,
            "path": dest,
            "sha256": got,
            "verified": want is not None or sig_result is not None,
            "signed": sig_result is not None,
        }
        if sig_result is not None:
            manifest[key].update(
                publisher=sig_result["publisher"],
                key_id=sig_result["key_id"],
                identity=sig_result["identity"],
            )
        if prov_result is not None:
            manifest[key].update(
                provenance_verified=True,
                builder_id=prov_result["builder_id"],
            )
        _write_manifest(root, manifest)
    return manifest[key]


def uninstall(
    ref: str, *, root: str = DEFAULT_ROOT, kind: str = "connector"
) -> list[str]:
    """Remove name@version (or every version when unpinned)."""
    name, version = parse_ref(ref)
    manifest = _load_manifest(root)
    keys = [
        k
        for k, e in manifest.items()
        if e["name"] == name
        and e.get("kind", "connector") == kind
        and (version is None or e["version"] == version)
    ]
    if not keys:
        raise RegistryError(f"registry.not_installed: {ref}")
    for k in keys:
        entry = manifest.pop(k)
        shutil.rmtree(os.path.dirname(entry["path"]), ignore_errors=True)
    base = root if kind == "connector" else os.path.join(root, "processors")
    with_name = os.path.join(base, name)
    if os.path.isdir(with_name) and not os.listdir(with_name):
        os.rmdir(with_name)
    _write_manifest(root, manifest)
    return keys


def list_installed(
    root: str = DEFAULT_ROOT, *, kind: str | None = None
) -> list[dict]:
    entries = [
        e
        for e in _load_manifest(root).values()
        if kind is None or e.get("kind", "connector") == kind
    ]
    return sorted(
        entries, key=lambda e: (e["name"], _version_key(e["version"]))
    )


def audit(root: str = DEFAULT_ROOT, *, index_path: str | None = None) -> list[dict]:
    """Integrity audit of every installed plugin (reference
    corruption.go / connectoraudit.go): the on-disk artifact must
    still hash to the manifest's pinned digest, and — when an index is
    given — the index must still publish that exact version+digest.
    Returns one finding dict per install; ``ok`` is False for missing,
    tampered, or index-drifted artifacts."""
    index = load_index(index_path) if index_path else None
    findings = []
    for e in list_installed(root):
        f = {"ref": f"{e['name']}@{e['version']}", "ok": True, "problems": []}
        if not os.path.exists(e["path"]):
            f["problems"].append("registry.corrupt_install: artifact missing")
        else:
            got = hashlib.sha256(open(e["path"], "rb").read()).hexdigest()
            if got != e["sha256"]:
                f["problems"].append(
                    "registry.corrupt_install: on-disk digest drifted from "
                    "the manifest pin"
                )
        if not e.get("verified", False):
            f["problems"].append(
                "registry.unsigned_artifact: installed with allow_unsigned"
            )
        if index is not None:
            try:
                _, entry = resolve_index(
                    index,
                    e["name"],
                    e["version"],
                    kind=e.get("kind", "connector"),
                )
                if entry.get("sha256") not in (None, e["sha256"]):
                    f["problems"].append(
                        "registry.index_drift: index now publishes a "
                        "different digest for this version"
                    )
            except RegistryError:
                f["problems"].append(
                    "registry.index_drift: version no longer in the index"
                )
        f["ok"] = not f["problems"]
        findings.append(f)
    return findings


SCAFFOLD_TEMPLATE = '''#!/usr/bin/env python3
"""Standalone source connector: emits OpenCDC envelopes as JSON
lines (see conduit_spark/sources/standalone.py for the protocol)."""
import base64
import json
import sys

conf = json.loads(sys.stdin.readline())
settings = conf["settings"]
n = int(settings.get("recordCount", 10))
for i in range(n):
    record = {{
        "position": base64.b64encode(f"{name}:{{i}}".encode()).decode(),
        "operation": "create",
        "metadata": {{"plugin": "{name}",
                      "conduit.source.connector.id": conf["connector_id"]}},
        "key_json": json.dumps({{"id": i}}),
        "payload_after_json": json.dumps({{"id": i}}),
        "is_structured": True,
    }}
    print(json.dumps(record))
    sys.stdout.flush()
'''


def scaffold(name: str, path: str) -> str:
    """Write a runnable standalone source-connector skeleton — the
    `conduit connectors new` analog."""
    if os.path.exists(path):
        raise RegistryError(f"registry.exists: {path} already exists")
    with open(path, "w", encoding="utf-8") as f:
        f.write(SCAFFOLD_TEMPLATE.format(name=name))
    os.chmod(path, 0o755)
    return path


def resolve_installed(
    ref: str, *, root: str = DEFAULT_ROOT, kind: str = "connector"
) -> str:
    """``name[@version]`` → executable path (latest installed when
    unpinned). The resolution every ``standalone:`` pipeline plugin
    goes through — connectors and processors alike (one trust core)."""
    name, version = parse_ref(ref)
    candidates = [
        e
        for e in _load_manifest(root).values()
        if e["name"] == name
        and e.get("kind", "connector") == kind
        and (version is None or e["version"] == version)
    ]
    if not candidates:
        verb = "install" if kind == "connector" else "install --kind processor"
        raise RegistryError(
            f"registry.not_installed: {ref}; run "
            f"`conduit_spark connectors {verb} {ref}` first"
        )
    best = max(candidates, key=lambda e: _version_key(e["version"]))
    if not os.path.exists(best["path"]):
        raise RegistryError(
            f"registry.corrupt_install: {best['path']} missing; reinstall"
        )
    return best["path"]
