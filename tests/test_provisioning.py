"""Provisioning corpus tests — table-driven over fixture dirs, the
shape of the reference's pkg/provisioning/test/pipelines1…4: multi-file
dirs, malformed configs that must not block valid ones, duplicate-id
detection, DLQ config variants, and v1→v2 migration warnings."""

from __future__ import annotations

import os

import pytest

from conduit_spark.pipeline.config import (
    load_pipeline_dir,
    parse_yaml,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "provisioning")


def test_single_file_dir():
    res = load_pipeline_dir(os.path.join(FIXTURES, "pipelines1"))
    assert not res.errors
    assert [p.id for p in res.pipelines] == ["basic"]
    p = res.pipelines[0]
    assert [c.id for c in p.sources] == ["gen"]
    assert [c.id for c in p.destinations] == ["sink"]


def test_multi_file_dir_deterministic_order_and_dlq():
    res = load_pipeline_dir(os.path.join(FIXTURES, "pipelines2-multifile"))
    assert not res.errors
    # files provision in sorted order: a.yml then b.yml
    assert [p.id for p in res.pipelines] == ["with-dlq", "second", "third"]
    dlq = res.pipelines[0].dlq
    assert dlq is not None
    assert (dlq.window_size, dlq.window_nack_threshold) == (5, 2)
    assert res.pipelines[0].processors[0].plugin == "field.set"


def test_malformed_files_skipped_valid_provisioned():
    d = os.path.join(FIXTURES, "pipelines3-malformed")
    res = load_pipeline_dir(d)
    assert [p.id for p in res.pipelines] == ["survivor"]
    assert set(res.errors) == {
        os.path.join(d, "bad.yml"),
        os.path.join(d, "notyaml.yml"),
    }
    assert "source/destination" in res.errors[os.path.join(d, "bad.yml")]
    with pytest.raises(Exception):
        load_pipeline_dir(d, strict=True)


def test_duplicate_pipeline_id_across_files():
    d = os.path.join(FIXTURES, "pipelines4-dupid")
    res = load_pipeline_dir(d)
    assert [p.id for p in res.pipelines] == ["dup"]  # first wins
    assert os.path.join(d, "b.yml") in res.errors
    assert "already provisioned" in res.errors[os.path.join(d, "b.yml")]


def test_duplicate_pipeline_id_same_file():
    text = """
version: "2.2"
pipelines:
  - id: x
    connectors: []
  - id: x
    connectors: []
"""
    with pytest.raises(ValueError, match="duplicate pipeline ids"):
        parse_yaml(text)


def test_multi_pipeline_file_provisions_atomically(tmp_path):
    """A file whose second pipeline is invalid (dup id vs an earlier
    file) must not half-provision: the whole file is skipped and
    recorded in errors (service.go:74 per-file skip semantics)."""
    (tmp_path / "a.yml").write_text(
        'version: "2.2"\npipelines:\n  - id: first\n    connectors: []\n'
    )
    (tmp_path / "b.yml").write_text(
        'version: "2.2"\npipelines:\n'
        "  - id: fresh\n    connectors: []\n"
        "  - id: first\n    connectors: []\n"  # dup vs a.yml
    )
    res = load_pipeline_dir(str(tmp_path))
    assert [p.id for p in res.pipelines] == ["first"]  # no 'fresh'
    assert str(tmp_path / "b.yml") in res.errors


def test_duplicate_connector_id_rejected():
    text = """
version: "2.2"
pipelines:
  - id: x
    connectors:
      - {id: c, type: source, plugin: builtin:generator}
      - {id: c, type: destination, plugin: builtin:log}
"""
    with pytest.raises(ValueError, match="duplicate connector id"):
        parse_yaml(text)


def test_v1_config_migrates_with_warning():
    text = """
version: "1.1"
pipelines:
  - id: legacy
    connectors:
      - id: gen
        type: source
        plugin: builtin:generator
        settings: {recordCount: 3}
    processors:
      - id: tag
        type: field.set
        settings: {field: .Metadata.env, value: prod}
"""
    with pytest.warns(DeprecationWarning, match="deprecated"):
        pipelines = parse_yaml(text)
    assert pipelines[0].processors[0].plugin == "field.set"


def test_unsupported_version_rejected():
    with pytest.raises(ValueError, match="unsupported"):
        parse_yaml('version: "3.0"\npipelines: []\n')


def test_missing_pipelines_key_rejected():
    with pytest.raises(ValueError, match="pipelines"):
        parse_yaml("just: nonsense\n")


def test_pipeline_to_dict_round_trip():
    """pipeline_to_dict is the exact inverse of parse_pipeline_dict:
    parse(serialize(cfg)) is a fixed point, and serializing again is
    byte-identical — the property export/import and plan/apply rely on."""
    from conduit_spark.pipeline.config import (
        parse_pipeline_dict,
        pipeline_to_dict,
    )

    doc = {
        "id": "rt",
        "status": "stopped",
        "name": "Round Trip",
        "description": "with every optional field set",
        "connectors": [
            {
                "id": "src",
                "type": "source",
                "plugin": "builtin:file",
                "settings": {"path": "/tmp/in", "format": "parquet"},
                "processors": [
                    {
                        "id": "cp",
                        "plugin": "field.set",
                        "settings": {"field": ".Payload.After.x", "value": "1"},
                        "condition": "{{ eq .Operation \"create\" }}",
                        "workers": 3,
                    }
                ],
            },
            {"id": "dst", "type": "destination", "plugin": "builtin:log"},
        ],
        "processors": [{"id": "p1", "plugin": "filter"}],
        "dead-letter-queue": {
            "plugin": "builtin:file",
            "settings": {"path": "/tmp/dlq"},
            "window-size": 4,
            "window-nack-threshold": 1,
        },
    }
    cfg = parse_pipeline_dict(doc)
    ser = pipeline_to_dict(cfg)
    cfg2 = parse_pipeline_dict(ser)
    assert pipeline_to_dict(cfg2) == ser
    assert cfg2 == cfg
    # minimal config serializes without noise keys
    minimal = pipeline_to_dict(parse_pipeline_dict({"id": "m"}))
    assert minimal == {"id": "m", "status": "running"}


def test_plan_diff_deterministic_and_classified():
    from conduit_spark.pipeline.config import parse_pipeline_dict
    from conduit_spark.pipeline.deploy import plan_diff

    base = parse_pipeline_dict(
        {
            "id": "d",
            "connectors": [
                {"id": "s", "type": "source", "plugin": "builtin:generator"},
            ],
            "processors": [{"id": "p", "plugin": "filter"}],
        }
    )
    # create-from-nothing lists every resource
    d = plan_diff(None, base)
    assert [(c["resource"], c["action"]) for c in d["changes"]] == [
        ("pipeline", "create"), ("connector", "create"), ("processor", "create"),
    ]
    assert d["hash"] == plan_diff(None, base)["hash"]  # deterministic

    desired = parse_pipeline_dict(
        {
            "id": "d",
            "name": "renamed",
            "connectors": [
                {"id": "s", "type": "source", "plugin": "builtin:generator",
                 "settings": {"recordCount": 1}},
                {"id": "out", "type": "destination", "plugin": "builtin:log"},
            ],
        }
    )
    d = plan_diff(base, desired)
    by_id = {(c["resource"], c["id"]): c for c in d["changes"]}
    assert by_id[("pipeline", "d")]["effect"] == "in_place"
    assert by_id[("connector", "d:s")]["action"] == "update"
    assert by_id[("connector", "d:s")]["config_paths"] == ["settings"]
    assert by_id[("connector", "d:out")]["action"] == "create"
    assert by_id[("processor", "d:p")]["action"] == "delete"
    assert all(
        c["code"] == f"provisioning.{c['resource']}.{c['action']}"
        for c in d["changes"]
    )
    # different desired state → different hash
    assert d["hash"] != plan_diff(None, base)["hash"]
