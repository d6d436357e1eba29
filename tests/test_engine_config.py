"""Engine-config precedence (reference docs/health_check.md
"Configuration"): flag > CONDUIT_* env > conduit.yaml file > default,
with the documented env-name mapping and zero-config defaults."""

from __future__ import annotations

import json
import urllib.request

from conduit_spark.pipeline.engine_config import (
    DEFAULTS,
    env_name,
    resolve_engine_config,
    split_address,
)


def test_env_name_mapping():
    assert env_name("api.http.address") == "CONDUIT_API_HTTP_ADDRESS"
    assert env_name("pipelines.checkpoint-dir") == "CONDUIT_PIPELINES_CHECKPOINT_DIR"


def test_zero_config_defaults():
    out = resolve_engine_config(env={})
    assert out == DEFAULTS


def test_precedence_flag_over_env_over_file(tmp_path):
    cfg = tmp_path / "conduit.yaml"
    cfg.write_text("api:\n  http:\n    address: file:1111\npipelines:\n  path: /from/file\n")
    # file layer
    out = resolve_engine_config(env={}, config_path=str(cfg))
    assert out["api.http.address"] == "file:1111"
    assert out["pipelines.path"] == "/from/file"
    # env overrides file
    env = {"CONDUIT_API_HTTP_ADDRESS": "env:2222"}
    out = resolve_engine_config(env=env, config_path=str(cfg))
    assert out["api.http.address"] == "env:2222"
    # flag overrides both; None flags do not override
    out = resolve_engine_config(
        {"api.http.address": "flag:3333", "pipelines.path": None},
        env=env,
        config_path=str(cfg),
    )
    assert out["api.http.address"] == "flag:3333"
    assert out["pipelines.path"] == "/from/file"


def test_flat_keys_accepted(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text('{"plugins.path": "/opt/plugins"}')
    out = resolve_engine_config(env={}, config_path=str(cfg))
    assert out["plugins.path"] == "/opt/plugins"


def test_split_address():
    assert split_address("127.0.0.1:9000") == ("127.0.0.1", 9000)
    assert split_address(":9000") == ("127.0.0.1", 9000)
    assert split_address("0.0.0.0") == ("0.0.0.0", 8080)


def test_env_address_resolves_and_binds(monkeypatch):
    """With no --host/--port flags the api verb resolves its address
    from CONDUIT_API_HTTP_ADDRESS (the same chain cmd_api uses); a
    server started at that address actually serves."""
    monkeypatch.setenv("CONDUIT_API_HTTP_ADDRESS", "127.0.0.1:0")
    host, port = split_address(resolve_engine_config()["api.http.address"])
    assert (host, port) == ("127.0.0.1", 0)

    from conduit_spark.http_api import ControlPlane, start_server

    srv = start_server(ControlPlane([]), host=host, port=port)
    try:
        bound = srv.server_address[1]
        assert bound != 0  # ephemeral request got a real port
        with urllib.request.urlopen(
            f"http://127.0.0.1:{bound}/healthz", timeout=5
        ) as r:
            assert json.loads(r.read())["status"] == "SERVING"
    finally:
        srv.shutdown()


def test_env_overrides_declared_key_absent_from_defaults_and_file():
    """A CONDUIT_* env var for a DECLARED key (reference run.go flag
    surface) is honored even when the key appears in neither DEFAULTS
    nor the config file — previously only already-present keys were
    scanned, making the flag > env > file chain inconsistent for keys
    like log.level."""
    from conduit_spark.pipeline.engine_config import resolve_engine_config

    cfg = resolve_engine_config(env={"CONDUIT_LOG_LEVEL": "debug"})
    assert cfg["log.level"] == "debug"
    # flag still beats env for the same key
    cfg = resolve_engine_config(
        {"log.level": "warn"}, env={"CONDUIT_LOG_LEVEL": "debug"}
    )
    assert cfg["log.level"] == "warn"
    # env can also address a key introduced only by a flag dict entry
    cfg = resolve_engine_config(
        {"x.custom-key": None}, env={"CONDUIT_X_CUSTOM_KEY": "v"}
    )
    assert cfg["x.custom-key"] == "v"


def test_env_undeclared_key_is_ignored_documented():
    """Undeclared env keys stay ignored: the reverse mapping from env
    name to dotted key is ambiguous (underscore = dot or dash)."""
    from conduit_spark.pipeline.engine_config import resolve_engine_config

    cfg = resolve_engine_config(env={"CONDUIT_TOTALLY_NOVEL_THING": "v"})
    assert not any("novel" in k for k in cfg)
