"""Plugin-registry trust core: real signature verification, identity
policies, the allow-unsigned policy gate, install locking, and the
offline bundle path.

Mirrors the reference's trust stack semantics (pkg/registry/trust/
sigstore.go, identitypattern.go, trustverifier.go; pkg/registry/
policy/gate.go; pkg/registry/bundle.go; pkg/registry/lock.go) on
stdlib + the ``cryptography`` package instead of sigstore — the
transparency-log layer needs Fulcio/Rekor infrastructure that has no
offline analog, so the unit of trust here is a pinned ed25519
publisher key in a local trust-root file. The INVARIANTS are the
reference's, exactly:

- **Trust anchors are fixed before verify time.** Verification only
  ever consults the trust-root file handed to it (the analog of the
  build-time-embedded sigstore root); nothing in this module fetches
  keys over the network. A malformed trust root raises loudly at load
  time — never a silent fall-back to "verification disabled".
- **Fail-closed.** A signed index entry whose signature does not
  verify, whose key is unknown, or whose identity does not match the
  publisher's pinned pattern refuses with a stable ``trust.*`` error
  code and installs nothing.
- **The unsigned path is a policy decision, not a boolean.** The only
  way to install an unsigned artifact is a :class:`Decision` produced
  by :func:`decide_unsigned` — the one function permitted to return
  "skip verification" (reference ``policy.Decide``). Operator policy
  is checked first and wins over every other field; MCP contexts are
  refused unconditionally; non-interactive contexts need the
  ``CONDUIT_SPARK_ALLOW_UNSIGNED_INSTALL=I_UNDERSTAND`` env var.
- **Bundles never skip verification because the network is down**
  (reference bundle.go): ``prepare_bundle`` refuses to package
  anything that would not pass a normal install, and
  ``install_from_bundle`` re-verifies digest + signature + identity
  against the LOCAL trust root with zero network access.

Signatures bind ``(name, version, kind, artifact-sha256)`` — not just
the bytes — so a verified artifact cannot be replayed as a different
plugin or version (the reference binds via in-toto subject digests +
the index's per-version entry).
"""

from __future__ import annotations

import base64
import contextlib
import hashlib
import io
import json
import os
import re
import tarfile
import tempfile
import time

from conduit_spark.plugin_registry import RegistryError

TRUST_MESSAGE_PREFIX = b"conduit-spark-plugin-v1\x00"
ALLOW_UNSIGNED_ENV = "CONDUIT_SPARK_ALLOW_UNSIGNED_INSTALL"
ALLOW_UNSIGNED_ENV_VALUE = "I_UNDERSTAND"
DEFAULT_BUNDLE_MAX_AGE_DAYS = 90
DEFAULT_LOCK_TIMEOUT = 30.0


class TrustError(RegistryError):
    """Raised with a stable dotted ``trust.*`` / ``registry.*`` code as
    the message prefix (reference pkg/registry/codes.go /
    trust/codes.go: stable codes are the API, messages are not).
    Subclasses ``RegistryError`` so every registry surface (CLI, HTTP,
    MCP) reports trust refusals through one error channel."""


def _require_crypto():
    try:
        from cryptography.hazmat.primitives.asymmetric import ed25519
        from cryptography.hazmat.primitives import serialization

        return ed25519, serialization
    except ImportError as e:  # pragma: no cover - baked into the image
        raise TrustError(
            "trust.crypto_unavailable: the 'cryptography' package is "
            "required for signature operations"
        ) from e


# --- identity patterns (reference trust/identitypattern.go) -----------

_DISALLOWED_INLINE_FLAGS = ("(?m)", "(?s)", "(?ms)", "(?sm)")
_META = set(".^$*+?{}[]|()\\")


def validate_identity_pattern(pattern: str) -> None:
    """Registration-checklist tightness rules for a publisher's
    ``identity_pattern``: fully anchored (^...$), no inline flags that
    weaken anchoring under multi-line semantics, and a literal prefix
    that names an actual namespace (contains ``/``, ≥ 8 chars) rather
    than an anchored-but-broad wildcard like ``^.*$``."""
    if len(pattern) < 2 or pattern[0] != "^" or pattern[-1] != "$":
        raise TrustError(
            "trust.identity_pattern_too_loose: pattern must be fully "
            f"anchored (^...$): {pattern!r}"
        )
    for flag in _DISALLOWED_INLINE_FLAGS:
        if flag in pattern:
            raise TrustError(
                "trust.identity_pattern_too_loose: inline regex flag "
                f"{flag} can weaken ^/$ anchoring: {pattern!r}"
            )
    body = pattern[1:-1]
    literal = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            literal.append(body[i + 1])
            i += 2
            continue
        if ch in _META:
            break
        literal.append(ch)
        i += 1
    prefix = "".join(literal)
    if len(prefix) < 8 or "/" not in prefix:
        raise TrustError(
            "trust.identity_pattern_too_loose: pattern needs a literal "
            "namespace prefix of at least 8 chars containing '/' "
            f"(got literal prefix {prefix!r} from {pattern!r})"
        )
    try:
        re.compile(pattern)
    except re.error as e:
        raise TrustError(
            f"trust.identity_pattern_too_loose: not a valid regex: {e}"
        ) from e


# --- trust root -------------------------------------------------------


def load_trust_root(path: str) -> dict:
    """Load + validate a trust-root file. Malformed roots raise — the
    reference panics at init rather than ever running with a silently
    broken root (sigstore.go init)."""
    try:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
    except (OSError, ValueError) as e:
        raise TrustError(f"trust.bad_trust_root: {path}: {e}") from e
    if not isinstance(doc, dict) or not isinstance(
        doc.get("publishers"), dict
    ):
        raise TrustError(
            f"trust.bad_trust_root: {path} missing 'publishers' map"
        )
    for pub, spec in doc["publishers"].items():
        if not isinstance(spec, dict) or not spec.get("keys"):
            raise TrustError(
                f"trust.bad_trust_root: publisher {pub!r} has no keys"
            )
        validate_identity_pattern(spec.get("identity_pattern", ""))
        for k in spec["keys"]:
            if k.get("algorithm", "ed25519") != "ed25519":
                raise TrustError(
                    "trust.bad_trust_root: unsupported algorithm "
                    f"{k.get('algorithm')!r} for publisher {pub!r}"
                )
            if not k.get("key_id") or not k.get("public_key_pem"):
                raise TrustError(
                    f"trust.bad_trust_root: publisher {pub!r} key "
                    "missing key_id/public_key_pem"
                )
    builder = doc.get("builder")
    if builder is not None:
        # optional builder policy (reference builderpolicy.go): one
        # global expected builder, its own identity pattern + keys
        if not isinstance(builder, dict) or not builder.get(
            "expected_builder_id"
        ):
            raise TrustError(
                f"trust.bad_trust_root: {path} 'builder' block missing "
                "expected_builder_id"
            )
        validate_identity_pattern(builder.get("identity_pattern", ""))
        if not builder.get("keys"):
            raise TrustError(
                f"trust.bad_trust_root: {path} 'builder' block has no keys"
            )
        for k in builder["keys"]:
            if not k.get("key_id") or not k.get("public_key_pem"):
                raise TrustError(
                    f"trust.bad_trust_root: builder key missing "
                    "key_id/public_key_pem"
                )
    return doc


def generate_keypair() -> tuple[str, str]:
    """(private_pem, public_pem) — publisher tooling + tests."""
    ed25519, serialization = _require_crypto()
    priv = ed25519.Ed25519PrivateKey.generate()
    priv_pem = priv.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    pub_pem = (
        priv.public_key()
        .public_bytes(
            serialization.Encoding.PEM,
            serialization.PublicFormat.SubjectPublicKeyInfo,
        )
        .decode()
    )
    return priv_pem, pub_pem


# --- sign / verify ----------------------------------------------------


def _message(name: str, version: str, kind: str, sha256_hex: str) -> bytes:
    return TRUST_MESSAGE_PREFIX + "\x00".join(
        (kind, name, version, sha256_hex)
    ).encode()


def sign_artifact(
    artifact_path: str,
    *,
    name: str,
    version: str,
    kind: str = "connector",
    private_key_pem: str,
    key_id: str,
    publisher: str,
    identity: str,
) -> dict:
    """Produce the detached-signature index entry for an artifact —
    the publisher-side half (`cosign sign` analog). Returns the dict
    that goes under the index entry's ``"signature"`` key."""
    ed25519, serialization = _require_crypto()
    priv = serialization.load_pem_private_key(
        private_key_pem.encode(), password=None
    )
    digest = hashlib.sha256(open(artifact_path, "rb").read()).hexdigest()
    sig = priv.sign(_message(name, version, kind, digest))
    return {
        "publisher": publisher,
        "key_id": key_id,
        "identity": identity,
        "algorithm": "ed25519",
        "signature_b64": base64.b64encode(sig).decode(),
    }


def verify_artifact(
    artifact_path: str,
    *,
    name: str,
    version: str,
    kind: str,
    signature: dict,
    trust_root: dict,
) -> dict:
    """Fail-closed verification of a signed artifact against a loaded
    trust root: publisher known → identity pattern tight + matched →
    key pinned → ed25519 signature over (kind, name, version, digest)
    valid. Returns {"signed": True, "publisher", "key_id", "identity",
    "sha256"} or raises ``TrustError`` with a stable code."""
    ed25519, serialization = _require_crypto()
    publisher = signature.get("publisher")
    spec = trust_root.get("publishers", {}).get(publisher)
    if spec is None:
        raise TrustError(
            f"trust.unknown_publisher: {publisher!r} is not in the "
            "trust root"
        )
    pattern = spec.get("identity_pattern", "")
    validate_identity_pattern(pattern)
    identity = signature.get("identity", "")
    if re.match(pattern, identity) is None:
        raise TrustError(
            f"trust.identity_mismatch: identity {identity!r} does not "
            f"match publisher {publisher!r} pattern {pattern!r}"
        )
    key = next(
        (
            k
            for k in spec.get("keys", [])
            if k.get("key_id") == signature.get("key_id")
        ),
        None,
    )
    if key is None:
        raise TrustError(
            f"trust.unknown_key: key_id {signature.get('key_id')!r} is "
            f"not pinned for publisher {publisher!r}"
        )
    if signature.get("algorithm", "ed25519") != "ed25519":
        raise TrustError(
            "trust.unsupported_algorithm: "
            f"{signature.get('algorithm')!r}"
        )
    pub = serialization.load_pem_public_key(key["public_key_pem"].encode())
    digest = hashlib.sha256(open(artifact_path, "rb").read()).hexdigest()
    try:
        raw = base64.b64decode(signature.get("signature_b64", ""), validate=True)
    except Exception as e:
        raise TrustError(
            f"trust.signature_invalid: undecodable signature for "
            f"{name}@{version}"
        ) from e
    try:
        pub.verify(raw, _message(name, version, kind, digest))
    except Exception as e:
        raise TrustError(
            f"trust.signature_invalid: signature for {name}@{version} "
            "does not verify against the pinned publisher key; refusing"
        ) from e
    return {
        "signed": True,
        "publisher": publisher,
        "key_id": key["key_id"],
        "identity": identity,
        "sha256": digest,
    }


# --- provenance attestations + builder policy -------------------------
# (reference trust/provenance.go CheckProvenanceBinding + builderpolicy.go)
#
# The artifact signature answers "who published these bytes"; the
# provenance attestation answers "which build system produced them".
# Under SLSA L3 the attestation is signed by the isolated BUILDER's
# identity, deliberately distinct from the publisher's
# (builderpolicy.go BuilderPinnedIdentity doc), and three semantic
# checks bind it to THIS artifact (provenance.go:62-88):
#   1. predicateType must be a recognized SLSA version — an
#      unrecognized type is a hard reject, never a skipped check;
#   2. some subject[].digest.sha256 must equal the digest of the
#      artifact's ACTUALLY RECEIVED bytes (never a value read back out
#      of the index); a subject offering only a non-sha256 digest
#      never counts as a match;
#   3. predicate.builder.id must equal the policy's expected builder
#      EXACTLY — the field path differs per predicate version
#      (v1: predicate.runDetails.builder.id; v0.2: predicate.builder.id).

SLSA_V1 = "https://slsa.dev/provenance/v1"
SLSA_V02 = "https://slsa.dev/provenance/v0.2"
SUPPORTED_SLSA_PREDICATE_TYPES = frozenset({SLSA_V1, SLSA_V02})

PROVENANCE_MESSAGE_PREFIX = b"conduit-spark-provenance-v1\x00"


def _statement_bytes(statement: dict) -> bytes:
    """Canonical bytes the builder key signs: domain-prefixed compact
    sorted-keys JSON of the in-toto statement (the DSSE-envelope
    analog — one stable serialization on both sides)."""
    return PROVENANCE_MESSAGE_PREFIX + json.dumps(
        statement, sort_keys=True, separators=(",", ":")
    ).encode()


def extract_builder_id(statement: dict) -> str | None:
    """builder.id at the predicate-version-dependent path; None when
    the shape doesn't match (missing predicate, non-string id,
    unrecognized predicateType) — callers treat None as reject."""
    pred = statement.get("predicate")
    if not isinstance(pred, dict):
        return None
    pt = statement.get("predicateType")
    if pt == SLSA_V1:
        run = pred.get("runDetails")
        builder = run.get("builder") if isinstance(run, dict) else None
    elif pt == SLSA_V02:
        builder = pred.get("builder")
    else:
        return None
    bid = builder.get("id") if isinstance(builder, dict) else None
    return bid if isinstance(bid, str) else None


def check_provenance_binding(
    statement: dict, artifact_sha256: str, expected_builder_id: str
) -> None:
    """The three SLSA-semantic checks, fail-closed with a code distinct
    from identity mismatches (the signing identity can be exactly right
    while the provenance's claims are wrong — provenance.go:57-60)."""
    if not isinstance(statement, dict):
        raise TrustError(
            "trust.provenance_invalid: no provenance statement to check"
        )
    pt = statement.get("predicateType")
    if pt not in SUPPORTED_SLSA_PREDICATE_TYPES:
        raise TrustError(
            f"trust.provenance_invalid: unrecognized provenance "
            f"predicateType {pt!r} — refusing rather than skipping the "
            "check"
        )
    want = artifact_sha256.lower()
    subjects = statement.get("subject")
    matched = isinstance(subjects, list) and any(
        isinstance(s, dict)
        and isinstance(s.get("digest"), dict)
        and s["digest"].get("sha256") == want
        for s in subjects
    )
    if not matched:
        raise TrustError(
            "trust.provenance_invalid: provenance attestation's subject "
            "digest does not match this artifact's actual sha256"
        )
    bid = extract_builder_id(statement)
    if bid is None or bid != expected_builder_id:
        raise TrustError(
            f"trust.provenance_invalid: provenance attestation's "
            f"builder.id ({bid!r}) does not match the expected builder "
            f"({expected_builder_id!r})"
        )


def sign_provenance(
    statement: dict, *, private_key_pem: str, key_id: str, identity: str
) -> dict:
    """Builder-side half: detached ed25519 signature over the canonical
    statement bytes. Returns the dict that rides under the index
    entry's ``provenance.signature`` key."""
    ed25519, serialization = _require_crypto()
    priv = serialization.load_pem_private_key(
        private_key_pem.encode(), password=None
    )
    sig = priv.sign(_statement_bytes(statement))
    return {
        "key_id": key_id,
        "identity": identity,
        "algorithm": "ed25519",
        "signature_b64": base64.b64encode(sig).decode(),
    }


def make_provenance_statement(
    artifact_path: str,
    *,
    name: str,
    builder_id: str,
    predicate_type: str = SLSA_V1,
) -> dict:
    """In-toto-statement-shaped provenance for an artifact — the
    publish-pipeline half (and the test fixture generator)."""
    digest = hashlib.sha256(open(artifact_path, "rb").read()).hexdigest()
    if predicate_type == SLSA_V1:
        predicate = {"runDetails": {"builder": {"id": builder_id}}}
    elif predicate_type == SLSA_V02:
        predicate = {"builder": {"id": builder_id}}
    else:
        raise TrustError(
            f"trust.provenance_invalid: cannot author predicateType "
            f"{predicate_type!r}"
        )
    return {
        "_type": "https://in-toto.io/Statement/v1",
        "predicateType": predicate_type,
        "subject": [{"name": name, "digest": {"sha256": digest}}],
        "predicate": predicate,
    }


def verify_provenance(
    artifact_path: str, *, provenance: dict, trust_root: dict
) -> dict:
    """Fail-closed provenance verification: builder policy present →
    attestation signed by a pinned BUILDER key under the builder's own
    identity pattern → statement binds to the received bytes and the
    expected builder id. Returns {"builder_id", "key_id", "identity"}.

    Mirrors the reference's two-layer design: the cert-identity check
    (BuilderPinnedIdentity) and the predicate builder-id binding
    (CheckProvenanceBinding) are belt-and-suspenders — both run, both
    must pass."""
    ed25519, serialization = _require_crypto()
    policy = trust_root.get("builder")
    if not isinstance(policy, dict):
        raise TrustError(
            "trust.no_builder_policy: index entry carries a provenance "
            "attestation but the trust root pins no builder; refusing "
            "(an attestation never downgrades to unchecked)"
        )
    statement = provenance.get("statement")
    signature = provenance.get("signature") or {}
    pattern = policy.get("identity_pattern", "")
    validate_identity_pattern(pattern)
    identity = signature.get("identity", "")
    if re.match(pattern, identity) is None:
        raise TrustError(
            f"trust.identity_mismatch: provenance signing identity "
            f"{identity!r} does not match the pinned builder pattern "
            f"{pattern!r}"
        )
    key = next(
        (
            k
            for k in policy.get("keys", [])
            if k.get("key_id") == signature.get("key_id")
        ),
        None,
    )
    if key is None:
        raise TrustError(
            f"trust.unknown_key: provenance key_id "
            f"{signature.get('key_id')!r} is not pinned for the builder"
        )
    if signature.get("algorithm", "ed25519") != "ed25519":
        raise TrustError(
            f"trust.unsupported_algorithm: {signature.get('algorithm')!r}"
        )
    if not isinstance(statement, dict):
        raise TrustError(
            "trust.provenance_invalid: provenance entry has no statement"
        )
    pub = serialization.load_pem_public_key(key["public_key_pem"].encode())
    try:
        raw = base64.b64decode(
            signature.get("signature_b64", ""), validate=True
        )
        pub.verify(raw, _statement_bytes(statement))
    except Exception as e:
        raise TrustError(
            "trust.signature_invalid: provenance attestation signature "
            "does not verify against the pinned builder key; refusing"
        ) from e
    digest = hashlib.sha256(open(artifact_path, "rb").read()).hexdigest()
    check_provenance_binding(
        statement, digest, policy.get("expected_builder_id", "")
    )
    return {
        "builder_id": extract_builder_id(statement),
        "key_id": key["key_id"],
        "identity": identity,
    }


# --- the allow-unsigned policy gate (reference policy/gate.go) --------


class Decision:
    """Opaque gate result: the ONLY way to obtain ``allowed() == True``
    is a call to :func:`decide_unsigned` / :func:`decide_stale_bundle`
    that returned one — nothing else can construct an allowing
    Decision (the reference enforces this with an unexported field;
    here the constructor is module-private by convention and the
    sentinel token by identity)."""

    __slots__ = ("_token",)

    def __init__(self, token: object = None) -> None:
        self._token = token

    def allowed(self) -> bool:
        return self._token is _ALLOW_TOKEN


_ALLOW_TOKEN = object()


def decide_unsigned(
    *,
    operator_policy: bool,
    tty: bool,
    ci_env: bool,
    is_mcp: bool = False,
    typed_confirmation: bool = False,
    env: dict | None = None,
) -> Decision:
    """The one function permitted to allow an unsigned install.
    Behavioral matrix, checked strictly in order (reference
    policy.Decide):

    1. ``operator_policy`` False → refuse (unsigned_disabled_by_policy)
       — an operator's explicit refusal can never be talked around.
    2. ``is_mcp`` → refuse (non_interactive) unconditionally — the MCP
       surface has no allow-unsigned parameter at all.
    3. non-interactive (no tty, or CI) → allow only with
       ``CONDUIT_SPARK_ALLOW_UNSIGNED_INSTALL=I_UNDERSTAND`` set.
    4. interactive → allow only with a typed confirmation the caller
       already collected and validated.

    Refusals raise (stable codes); the only return is an allowing
    Decision.
    """
    envd = os.environ if env is None else env
    if not operator_policy:
        raise TrustError(
            "trust.unsigned_disabled_by_policy: operator policy forbids "
            "unsigned installs (install.allowUnsigned=false)"
        )
    if is_mcp:
        raise TrustError(
            "trust.unsigned_non_interactive: unsigned installs are "
            "never allowed from the MCP surface"
        )
    if not tty or ci_env:
        if envd.get(ALLOW_UNSIGNED_ENV) == ALLOW_UNSIGNED_ENV_VALUE:
            return Decision(_ALLOW_TOKEN)
        raise TrustError(
            "trust.unsigned_non_interactive: non-interactive unsigned "
            f"install requires {ALLOW_UNSIGNED_ENV}="
            f"{ALLOW_UNSIGNED_ENV_VALUE}"
        )
    if typed_confirmation:
        return Decision(_ALLOW_TOKEN)
    raise TrustError(
        "trust.unsigned_non_interactive: interactive unsigned install "
        "declined (typed confirmation not given)"
    )


def decide_stale_bundle(
    *,
    operator_policy: bool,
    tty: bool,
    ci_env: bool,
    is_mcp: bool = False,
    typed_confirmation: bool = False,
    env: dict | None = None,
) -> Decision:
    """Stale-bundle override, gated exactly like --allow-unsigned
    (reference DecideStaleBundle — a distinct knob,
    ``install.allowStaleBundle``, same matrix)."""
    envd = os.environ if env is None else env
    if not operator_policy:
        raise TrustError(
            "trust.stale_bundle_disabled_by_policy: operator policy "
            "forbids installing stale bundles"
        )
    if is_mcp:
        raise TrustError(
            "trust.stale_bundle_non_interactive: never allowed from MCP"
        )
    if not tty or ci_env:
        if envd.get(ALLOW_UNSIGNED_ENV) == ALLOW_UNSIGNED_ENV_VALUE:
            return Decision(_ALLOW_TOKEN)
        raise TrustError(
            "trust.stale_bundle_non_interactive: non-interactive stale-"
            f"bundle install requires {ALLOW_UNSIGNED_ENV}="
            f"{ALLOW_UNSIGNED_ENV_VALUE}"
        )
    if typed_confirmation:
        return Decision(_ALLOW_TOKEN)
    raise TrustError(
        "trust.stale_bundle_non_interactive: declined"
    )


# --- install lock (reference lock.go) ---------------------------------


@contextlib.contextmanager
def install_lock(root: str, timeout: float = DEFAULT_LOCK_TIMEOUT):
    """Exclusive flock over ``<root>/.install.lock``, polling until
    acquired or ``timeout`` → ``registry.install_locked`` (never an
    indefinite hang). flock releases at the OS level on process exit —
    a SIGKILLed holder never wedges the next install."""
    import fcntl

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, ".install.lock")
    f = open(path, "a+")
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() >= deadline:
                    raise TrustError(
                        f"registry.install_locked: could not acquire "
                        f"{path} within {timeout}s"
                    ) from None
                time.sleep(0.05)
        yield
    finally:
        with contextlib.suppress(OSError):
            fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


# --- offline bundles (reference bundle.go) ----------------------------

BUNDLE_META_NAME = "bundle.json"
BUNDLE_ARTIFACT_NAME = "artifact"


def prepare_bundle(
    ref: str,
    out_path: str,
    *,
    index_path: str,
    trust_root_path: str,
    kind: str = "connector",
) -> dict:
    """Package ``name[@version]`` into a self-contained offline-install
    tarball — AFTER running the full install-equivalent verification.
    A bundle is a carrier for an already-verified install, never a way
    to defer verification: an entry that would not pass a normal
    signed install is refused here (no unsigned bundles at all)."""
    from conduit_spark import plugin_registry as reg

    name, version = reg.parse_ref(ref)
    version, entry = reg.resolve_index(
        reg.load_index(index_path), name, version, kind=kind
    )
    signature = entry.get("signature")
    if signature is None:
        raise TrustError(
            f"trust.unsigned_artifact: {name}@{version} has no "
            "signature; bundles carry verified installs only"
        )
    trust_root = load_trust_root(trust_root_path)
    with tempfile.TemporaryDirectory() as td:
        staged = os.path.join(td, "artifact")
        reg._fetch(entry["artifact"], staged)
        digest = hashlib.sha256(open(staged, "rb").read()).hexdigest()
        if entry.get("sha256") not in (None, digest):
            raise TrustError(
                f"registry.artifact_verification_failed: {name}@"
                f"{version} digest drifted from the index; refusing to "
                "bundle"
            )
        result = verify_artifact(
            staged,
            name=name,
            version=version,
            kind=kind,
            signature=signature,
            trust_root=trust_root,
        )
        meta = {
            "format": "conduit-spark-bundle-v1",
            "name": name,
            "version": version,
            "kind": kind,
            "sha256": digest,
            "signature": signature,
            "description": entry.get("description", ""),
            "artifact_basename": os.path.basename(
                entry["artifact"].rstrip("/")
            ),
            "created_at": time.time(),
        }
        with tarfile.open(out_path, "w:gz") as tar:
            tar.add(staged, arcname=BUNDLE_ARTIFACT_NAME)
            blob = json.dumps(meta, sort_keys=True).encode()
            info = tarfile.TarInfo(BUNDLE_META_NAME)
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))
    return {**result, "bundle": out_path, "created_at": meta["created_at"]}


def install_from_bundle(
    bundle_path: str,
    *,
    root: str,
    trust_root_path: str,
    max_age_days: float = DEFAULT_BUNDLE_MAX_AGE_DAYS,
    stale_decision: Decision | None = None,
    now: float | None = None,
) -> dict:
    """Install from an offline bundle with ZERO network access,
    re-verifying everything against the local trust root — it never
    skips verification just because the network is down. Bundles older
    than ``max_age_days`` refuse (trust.bundle_stale) unless the
    caller presents an allowing :func:`decide_stale_bundle` Decision
    (freshness is the offline stand-in for revocation checks)."""
    from conduit_spark import plugin_registry as reg

    trust_root = load_trust_root(trust_root_path)
    with tempfile.TemporaryDirectory() as td, tarfile.open(
        bundle_path, "r:gz"
    ) as tar:
        names = tar.getnames()
        if BUNDLE_META_NAME not in names or BUNDLE_ARTIFACT_NAME not in names:
            raise TrustError(
                f"trust.bad_bundle: {bundle_path} missing "
                f"{BUNDLE_META_NAME}/{BUNDLE_ARTIFACT_NAME}"
            )
        tar.extract(BUNDLE_ARTIFACT_NAME, td, filter="data")
        meta = json.loads(tar.extractfile(BUNDLE_META_NAME).read())
        staged = os.path.join(td, BUNDLE_ARTIFACT_NAME)
        age_days = (
            (time.time() if now is None else now) - meta.get("created_at", 0)
        ) / 86400.0
        if age_days > max_age_days and not (
            stale_decision is not None and stale_decision.allowed()
        ):
            raise TrustError(
                f"trust.bundle_stale: bundle is {age_days:.0f} days old "
                f"(max {max_age_days:.0f}); re-prepare it, or present a "
                "decide_stale_bundle decision"
            )
        digest = hashlib.sha256(open(staged, "rb").read()).hexdigest()
        if digest != meta.get("sha256"):
            raise TrustError(
                "registry.artifact_verification_failed: bundle artifact "
                "digest does not match bundle metadata; refusing"
            )
        result = verify_artifact(
            staged,
            name=meta["name"],
            version=meta["version"],
            kind=meta.get("kind", "connector"),
            signature=meta["signature"],
            trust_root=trust_root,
        )
        kind = meta.get("kind", "connector")
        with install_lock(root):
            dest_dir = os.path.join(
                root if kind == "connector" else os.path.join(
                    root, "processors"
                ),
                meta["name"],
                meta["version"],
            )
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(
                dest_dir, meta.get("artifact_basename", "artifact")
            )
            os.replace(staged, dest)
            os.chmod(dest, 0o755)
            manifest = reg._load_manifest(root)
            key = reg._manifest_key(kind, meta["name"], meta["version"])
            manifest[key] = {
                "name": meta["name"],
                "version": meta["version"],
                "kind": kind,
                "path": dest,
                "sha256": digest,
                "verified": True,
                "signed": True,
                "publisher": result["publisher"],
                "key_id": result["key_id"],
                "identity": result["identity"],
                "installed_from_bundle": True,
            }
            reg._write_manifest(root, manifest)
    return manifest[key]
