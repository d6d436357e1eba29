"""YAML-registry parity for processor declarations: the reference's
setting names must build working transforms (clone `count`,
field.rename list mapping, custom.python script / script.path with
per-record condition passthrough, custom.javascript redirect)."""

from __future__ import annotations

import json

import pytest

from conduit_spark import envelope as env
from conduit_spark.pipeline.registry import build_processor
from tests.test_operators import mk_records


@pytest.fixture()
def env_df(spark):
    return spark.createDataFrame(mk_records(), schema=env.ENVELOPE_SCHEMA)


def test_clone_accepts_reference_count_name(env_df):
    tf = build_processor("clone", {"count": 2})
    out = tf(env_df)
    assert out.count() == env_df.count() * 3  # original + 2 clones


def test_field_rename_list_mapping(env_df):
    tf = build_processor(
        "field.rename", {"mapping": [".Payload.After.name:full_name"]}
    )
    payload = json.loads(tf(env_df).collect()[0].payload_after_json)
    assert "full_name" in payload and "name" not in payload


SCRIPT = """
import json
def process(record):
    p = json.loads(record["payload_after_json"] or "{}")
    if p.get("id", 0) <= 100:
        return None  # filter
    p["doubled"] = p["id"] * 2
    record["payload_after_json"] = json.dumps(p)
    return record
"""


def test_custom_python_inline_script(env_df):
    tf = build_processor("custom.python", {"script": SCRIPT})
    rows = tf(env_df).collect()
    # fixture has ids 123 and 7: the null return filters exactly one
    assert len(rows) == 1
    p = json.loads(rows[0].payload_after_json)
    assert p["doubled"] == p["id"] * 2


def test_custom_python_script_path(env_df, tmp_path):
    f = tmp_path / "proc.py"
    f.write_text(SCRIPT)
    tf = build_processor("custom.python", {"script.path": str(f)})
    assert tf(env_df).count() > 0


def test_custom_python_condition_passthrough(env_df):
    """Records failing the condition must pass through untouched, not
    be filtered or transformed."""
    tf = build_processor(
        "custom.python",
        {"script": SCRIPT},
        condition='{{ eq .Operation "create" }}',
    )
    rows = {r.operation: r for r in tf(env_df).collect()}
    assert "doubled" in json.loads(rows["create"].payload_after_json)
    # the delete row (id=7) would be FILTERED by the fn; the condition
    # keeps it out of the fn entirely, so it passes through untouched
    assert "doubled" not in json.loads(rows["delete"].payload_after_json)


def test_custom_javascript_redirects():
    with pytest.raises(ValueError, match="custom.python"):
        build_processor("custom.javascript", {"script": "function process(r){}"})


def test_custom_python_requires_process():
    with pytest.raises(ValueError, match="process"):
        build_processor("custom.python", {"script": "x = 1"})


def test_csv_file_source(spark, tmp_path):
    from conduit_spark.sources.file_source import file_source

    f = tmp_path / "data.csv"
    f.write_text("id,name\n1,alice\n2,bob\n")
    rows = file_source(spark, str(f), fmt="csv").collect()
    assert len(rows) == 2
    payloads = sorted(json.loads(r.payload_after_json)["name"] for r in rows)
    assert payloads == ["alice", "bob"]
    assert all(r.is_structured for r in rows)


def test_generator_operations_format_collections(spark):
    from conduit_spark.pipeline.registry import build_source

    df = build_source(
        spark,
        "builtin:generator",
        {
            "recordCount": 6,
            "format.options": {"id": "int"},
            "operations": "create,update,delete",
            "collections": "users,orders",
        },
        "gen",
    )
    rows = df.collect()
    assert [r.operation for r in rows] == ["create", "update", "delete"] * 2
    assert [r.metadata["opencdc.collection"] for r in rows] == [
        "users", "orders"] * 3
    raw = build_source(
        spark,
        "builtin:generator",
        {"recordCount": 2, "format.options": {"id": "int"}, "format.type": "raw"},
        "gen",
    ).collect()
    for r in raw:
        assert r.payload_after_json is None and not r.is_structured
        assert json.loads(bytes(r.payload_after_raw))["id"] is not None
