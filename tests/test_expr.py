"""Condition/template corpus (FIXTURES.md §3 style)."""

from __future__ import annotations

import json

import pytest

import pyspark.sql.functions as F
from conduit_spark.expr import compile_condition, compile_template, parse_ref, resolve
from conduit_spark.expr.template import TemplateError

PAYLOAD = {
    "id": 123,
    "name": "Alice Smith",
    "age": 31,
    "score": 12.5,
    "trial": True,
    "address": {"city": "X", "zip": "10001"},
}


@pytest.fixture(scope="module")
def env_df(spark):
    rows = [
        {
            "position": b"src:1",
            "operation": "create",
            "metadata": {"opencdc.collection": "employees", "k": "val"},
            "key_raw": None,
            "key_json": json.dumps({"id": 1}),
            "payload_before_json": None,
            "payload_after_json": json.dumps(PAYLOAD),
            "payload_after_raw": None,
            "is_structured": True,
        },
        {
            "position": b"src:2",
            "operation": "delete",
            "metadata": {"k": "other"},
            "key_raw": b"key-2",
            "key_json": None,
            "payload_before_json": json.dumps(PAYLOAD),
            "payload_after_json": json.dumps(
                {"id": 7, "name": "Bob Jones", "age": 9, "score": 1.0,
                 "trial": False, "address": {"city": "Y", "zip": "2"}}
            ),
            "payload_after_raw": None,
            "is_structured": True,
        },
    ]
    from conduit_spark.envelope import ENVELOPE_SCHEMA

    return spark.createDataFrame(rows, schema=ENVELOPE_SCHEMA)


CASES = [
    ('{{ eq .Metadata.k "val" }}', [True, False]),
    ('{{ ne .Operation "delete" }}', [True, False]),
    ("{{ eq .Payload.After.id 123 }}", [True, False]),
    ("{{ .Payload.After.trial }}", [True, False]),
    ('{{ contains "Smith" .Payload.After.name }}', [True, False]),
    ('{{ and (eq .Operation "create") (gt .Payload.After.age 30) }}', [True, False]),
    ('{{ or (eq .Operation "delete") (eq .Metadata.k "val") }}', [True, True]),
    ('{{ not (eq .Operation "delete") }}', [True, False]),
    ("{{ lt .Payload.After.score 2.0 }}", [False, True]),
    ('{{ hasPrefix "Alice" .Payload.After.name }}', [True, False]),
    ('{{ hasSuffix "Jones" .Payload.After.name }}', [False, True]),
    ('{{ eq .Payload.After.address.city "X" }}', [True, False]),
]


@pytest.mark.parametrize("template,expected", CASES)
def test_conditions(env_df, template, expected):
    got = [
        r.v
        for r in env_df.select(
            compile_condition(template, env_df).alias("v")
        ).collect()
    ]
    assert got == expected, template


TEMPLATES = [
    ("{{ .Payload.After.name | upper }}", ["ALICE SMITH", "BOB JONES"]),
    ("hello {{ .Payload.After.name }}!", ["hello Alice Smith!", "hello Bob Jones!"]),
    ('{{ printf "%s-%s" .Operation .Metadata.k }}', ["create-val", "delete-other"]),
    ("{{ .Payload.After.id }}", ["123", "7"]),
    ("plain text", ["plain text", "plain text"]),
]


@pytest.mark.parametrize("template,expected", TEMPLATES)
def test_value_templates(env_df, template, expected):
    got = [
        r.v
        for r in env_df.select(
            compile_template(template, env_df).cast("string").alias("v")
        ).collect()
    ]
    assert got == expected, template


def test_refs_resolve_key_fallback(env_df):
    got = [r.v for r in env_df.select(resolve(".Key", env_df).alias("v")).collect()]
    assert got == ['{"id": 1}', "key-2"]


def test_unsupported_function_raises(env_df):
    with pytest.raises(TemplateError):
        compile_condition("{{ randAlphaNum 5 }}", env_df)


def test_parse_ref_roundtrip():
    r = parse_ref(".Payload.After.address.city")
    assert r.root == "payload.after" and r.path == ("address", "city")
    assert str(r) == ".Payload.After.address.city"


SPRIG_EXTRAS = [
    ('{{ replace "Smith" "Doe" .Payload.After.name }}', ["Alice Doe", "Bob Jones"]),
    ("{{ substr 0 5 .Payload.After.name }}", ["Alice", "Bob J"]),
    ("{{ len .Payload.After.name }}", ["11", "9"]),
    ('{{ trimPrefix "Alice " .Payload.After.name }}', ["Smith", "Bob Jones"]),
    ('{{ trimSuffix " Jones" .Payload.After.name }}', ["Alice Smith", "Bob"]),
    ('{{ b64enc "hi" }}', ["aGk=", "aGk="]),
    ('{{ b64dec "aGk=" }}', ["hi", "hi"]),
    ("{{ add .Payload.After.id 1 }}", ["124", "8"]),
    ("{{ sub .Payload.After.id 2 }}", ["121", "5"]),
    ("{{ mul .Payload.After.id 2 }}", ["246", "14"]),
    # sprig div is Go int64 division (truncation toward zero)
    ("{{ div .Payload.After.id 2 }}", ["61", "3"]),
    ("{{ divf .Payload.After.id 2 }}", ["61.5", "3.5"]),
    ("{{ mod .Payload.After.id 5 }}", ["3", "2"]),
    ('{{ ternary "big" "small" (gt .Payload.After.id 100) }}', ["big", "small"]),
    ("{{ coalesce .Payload.After.missing .Payload.After.id }}", ["123", "7"]),
    # sprig coalesce skips EMPTY values (0, "", false), not just null
    ('{{ coalesce 0 .Payload.After.id }}', ["123", "7"]),
    ('{{ coalesce "" "fallback" }}', ["fallback", "fallback"]),
]


@pytest.mark.parametrize("template,expected", SPRIG_EXTRAS)
def test_sprig_extras(env_df, template, expected):
    got = [
        r.v
        for r in env_df.select(
            __import__("conduit_spark.expr", fromlist=["compile_template"])
            .compile_template(template, env_df)
            .cast("string")
            .alias("v")
        ).collect()
    ]
    assert got == expected, template
