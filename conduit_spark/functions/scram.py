"""SCRAM-SHA-256 / SCRAM-SHA-512 (RFC 5802/7677) client and server,
pure stdlib.

The reference's kafka connector authenticates with SASL PLAIN or
SCRAM via franz-go (conduit-connector-kafka ``saslMechanism`` /
``saslUsername`` / ``saslPassword`` settings); the engine's jar-free
wire transport previously spoke no SASL at all. This module is the
mechanism core — the Kafka-protocol framing (SaslHandshake /
SaslAuthenticate) lives in ``minikafka.py``.

Conformance is pinned by the RFC 7677 §3 worked example (user/pencil,
the published nonces, salt and proofs) in ``tests/test_minikafka.py``
— both the client proof and the server signature must reproduce the
RFC's base64 values exactly.

Scope: SCRAM without channel binding (``n,,`` GS2 header — what
Kafka SASL uses over plaintext/TLS-terminated connections). SHA-512
(round 9) is the identical construction with the hash swapped — the
reference kafka connector's ``saslMechanism`` accepts
``inclusion(PLAIN, SCRAM-SHA-256, SCRAM-SHA-512)`` (llms-full.txt
kafka source parameters), so the wire transport matches all three.
The SHA-512 path has no published RFC worked example; it is pinned by
a cross-check test (client and server derive the same signature only
when BOTH swap every primitive — H, HMAC, and PBKDF2) plus a
known-answer vector computed from the primitives directly in the
test, independent of this module's composition. No SASLprep
normalization (ASCII credentials only), matching the reference
connector's practical usage.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import secrets


def _h(data: bytes, algo: str = "sha256") -> bytes:
    return hashlib.new(algo, data).digest()


def _hmac(key: bytes, msg: bytes, algo: str = "sha256") -> bytes:
    return hmac.new(key, msg, algo).digest()


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def salted_password(
    password: str, salt: bytes, iterations: int, algo: str = "sha256"
) -> bytes:
    return hashlib.pbkdf2_hmac(algo, password.encode(), salt, iterations)


def algo_for_mechanism(mechanism: str) -> str:
    """SASL mechanism name -> hashlib algorithm name."""
    m = mechanism.upper()
    if m == "SCRAM-SHA-256":
        return "sha256"
    if m == "SCRAM-SHA-512":
        return "sha512"
    raise ValueError(f"unsupported SCRAM mechanism {mechanism!r}")


def _parse(msg: str) -> dict[str, str]:
    out = {}
    for part in msg.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


class ScramClient:
    """Client half: ``first() -> str``, ``final(server_first) -> str``,
    ``verify_server(server_final)``."""

    def __init__(
        self,
        username: str,
        password: str,
        nonce: str | None = None,
        algo: str = "sha256",
    ):
        self._user = username.replace("=", "=3D").replace(",", "=2C")
        self._password = password
        self._algo = algo
        self._nonce = nonce or secrets.token_urlsafe(18)
        self._client_first_bare = f"n={self._user},r={self._nonce}"
        self._auth_message: bytes | None = None
        self._server_key: bytes | None = None

    def first(self) -> str:
        return "n,," + self._client_first_bare

    def final(self, server_first: str) -> str:
        f = _parse(server_first)
        combined_nonce, salt_b64, iters = f["r"], f["s"], int(f["i"])
        if not combined_nonce.startswith(self._nonce):
            raise ValueError("scram: server nonce does not extend ours")
        sp = salted_password(
            self._password, base64.b64decode(salt_b64), iters, self._algo
        )
        client_key = _hmac(sp, b"Client Key", self._algo)
        stored_key = _h(client_key, self._algo)
        without_proof = f"c=biws,r={combined_nonce}"
        self._auth_message = ",".join(
            (self._client_first_bare, server_first, without_proof)
        ).encode()
        proof = _xor(
            client_key, _hmac(stored_key, self._auth_message, self._algo)
        )
        self._server_key = _hmac(sp, b"Server Key", self._algo)
        return f"{without_proof},p={base64.b64encode(proof).decode()}"

    def verify_server(self, server_final: str) -> None:
        f = _parse(server_final)
        if "e" in f:
            raise ValueError(f"scram: server error {f['e']!r}")
        expect = _hmac(self._server_key, self._auth_message, self._algo)
        if not hmac.compare_digest(
            base64.b64decode(f["v"]), expect
        ):
            raise ValueError("scram: server signature mismatch")


class ScramServer:
    """Server half over a ``{username: password}`` store. Credentials
    are salted per-connection (a real broker stores StoredKey/ServerKey
    from registration; a test broker holding plaintext lets every test
    use arbitrary users — the WIRE exchange is identical)."""

    def __init__(
        self,
        users: dict[str, str],
        iterations: int = 4096,
        algo: str = "sha256",
    ):
        self._users = users
        self._iters = iterations
        self._algo = algo
        self._state: dict | None = None

    def first(self, client_first: str) -> str:
        if not client_first.startswith(("n,,", "y,,")):
            raise ValueError("scram: unsupported GS2 header")
        bare = client_first.split(",,", 1)[1]
        f = _parse(bare)
        user = f["n"].replace("=2C", ",").replace("=3D", "=")
        password = self._users.get(user)
        salt = os.urandom(16)
        combined = f["r"] + secrets.token_urlsafe(18)
        self._state = {
            "bare": bare,
            "user": user,
            "password": password,  # None → fail at final, not here
            "salt": salt,
            "combined": combined,
        }
        server_first = (
            f"r={combined},s={base64.b64encode(salt).decode()},i={self._iters}"
        )
        self._state["server_first"] = server_first
        return server_first

    def final(self, client_final: str) -> str:
        st = self._state
        if st is None:
            raise ValueError("scram: final before first")
        f = _parse(client_final)
        if f.get("r") != st["combined"]:
            return "e=other-error"
        if st["password"] is None:
            return "e=unknown-user"
        sp = salted_password(
            st["password"], st["salt"], self._iters, self._algo
        )
        client_key = _hmac(sp, b"Client Key", self._algo)
        stored_key = _h(client_key, self._algo)
        without_proof = client_final.rsplit(",p=", 1)[0]
        auth_message = ",".join(
            (st["bare"], st["server_first"], without_proof)
        ).encode()
        signature = _hmac(stored_key, auth_message, self._algo)
        try:
            proof = base64.b64decode(f["p"], validate=True)
        except Exception:  # noqa: BLE001
            return "e=invalid-proof"
        # recover ClientKey from the proof and check H(ClientKey)
        recovered = _xor(proof, signature)
        if not hmac.compare_digest(_h(recovered, self._algo), stored_key):
            return "e=invalid-proof"
        server_sig = _hmac(
            _hmac(sp, b"Server Key", self._algo), auth_message, self._algo
        )
        return f"v={base64.b64encode(server_sig).decode()}"
