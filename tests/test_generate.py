"""`conduit generate` gates (reference 20260722-conduit-generate.md).

The committed acceptance bar (phase-1 execution plan:195, quoted in
the generate doc): ≥90% of a 25-request benchmark set produce a config
that passes validate; every output is validate-gated before display;
unknown connector → closest-match suggestion, never a fabricated
plugin name. Plus the harder v0.19 bar: schema-valid but semantically
wrong is a REJECTION (the intent gate).
"""

from __future__ import annotations

import pytest

from conduit_spark.generate import (
    GenerateError,
    generate_pipeline,
    intent_gate,
    structural_gate,
)
from conduit_spark.pipeline.config import parse_yaml

BENCHMARK = [
    "stream from kafka topic 'orders' to s3",
    "from kafka topic 'clicks' into postgres, filter out errors",
    "copy files at '/data/in' to s3",
    "from postgres table 'users' to files at '/out'",
    "generate 1000 synthetic records and log them",
    "from s3 into postgres",
    "stream from kafka to log, decode the json payload",
    "from files at '/var/events' to kafka topic 'replay'",
    "from postgres to kafka, filter trial rows",
    "from kafka topic 'raw' to files, base64-decode the payload",
    "from s3 to log",
    "read files at '/in' and write to postgres",
    "from generator to files at '/tmp/gen'",
    "stream kafka topic 'cdc' into s3, unwrap the debezium envelope",
    "from postgres to s3, embed the text field",
    "from kafka to postgres",
    "copy from s3 to files at '/mirror'",
    "from files to log, parse the json",
    "generate synthetic records into kafka topic 'seed'",
    "from kafka topic 'a' to kafka topic 'b'",
    "from postgres table 'accounts' to log, filter inactive rows",
    "from files at '/drop' into s3, json-encode the payload",
    "stream from kafka to files at '/archive'",
    "from s3 to kafka topic 'restore'",
    "from generator to postgres",
]


def test_benchmark_set_validates():
    """The committed bar: >=90% of 25 requests produce a config that
    passes the REAL parser + validators (with the deterministic
    offline provider, and honestly reported if one misses)."""
    ok = 0
    failures = []
    for req in BENCHMARK:
        try:
            out = generate_pipeline(req)
            parse_yaml(out["yaml"])  # the real parser, end to end
            ok += 1
        except GenerateError as e:
            failures.append((req, e.reasons))
    assert ok >= 0.9 * len(BENCHMARK), failures
    assert len(BENCHMARK) == 25


def test_unknown_plugin_never_fabricated_closest_match_suggested():
    cand = {
        "id": "x",
        "connectors": [
            {"id": "a", "type": "source", "plugin": "kafka", "settings": {}},
            {"id": "b", "type": "destination", "plugin": "builtin:log",
             "settings": {}},
        ],
        "processors": [{"id": "p", "plugin": "fliter", "settings": {}}],
    }
    errors = structural_gate(cand)
    assert any("did you mean 'builtin:kafka'" in e for e in errors)
    assert any("did you mean 'filter'" in e for e in errors)


def test_direction_and_required_settings_gated():
    cand = {
        "id": "x",
        "connectors": [
            # log cannot be a source; file source lacks required path
            {"id": "a", "type": "source", "plugin": "builtin:log",
             "settings": {}},
            {"id": "b", "type": "destination", "plugin": "builtin:file",
             "settings": {}},
        ],
        "processors": [],
    }
    errors = structural_gate(cand)
    assert any("cannot act as a source" in e for e in errors)
    assert any("path" in e for e in errors)


def test_intent_gate_rejects_schema_valid_but_wrong():
    """The harder bar: a candidate that validates but reads from the
    wrong system (request says kafka, candidate reads files) must be
    rejected with the unmet intents listed."""
    wrong = {
        "pipeline": {
            "id": "x",
            "connectors": [
                {"id": "a", "type": "source", "plugin": "builtin:file",
                 "settings": {"path": "/in"}},
                {"id": "b", "type": "destination", "plugin": "builtin:s3",
                 "settings": {"path": "s3a://x"}},
            ],
            "processors": [],
        }
    }
    with pytest.raises(GenerateError) as e:
        generate_pipeline(
            "from kafka topic 'orders' to s3", transport=lambda r: wrong
        )
    reasons = " ".join(e.value.reasons)
    assert "builtin:kafka" in reasons and "source" in reasons
    assert "'orders'" in reasons  # the quoted literal is unmet too


def test_intent_gate_checks_quoted_literals_and_processors():
    ok_pipeline = generate_pipeline(
        "from kafka topic 'orders' to s3, filter out trials"
    )["pipeline"]
    assert intent_gate(
        "from kafka topic 'orders' to s3, filter out trials", ok_pipeline
    ) == []
    # drop the filter → the processor intent is unmet
    no_filter = dict(ok_pipeline, processors=[])
    unmet = intent_gate(
        "from kafka topic 'orders' to s3, filter out trials", no_filter
    )
    assert any("filter" in u for u in unmet)


def test_provider_yaml_form_accepted():
    yaml_text = generate_pipeline("from s3 to log")["yaml"]
    out = generate_pipeline(
        "from s3 to log", transport=lambda r: {"yaml": yaml_text}
    )
    assert out["pipeline"]["connectors"][0]["plugin"] == "builtin:s3"


def test_cli_generate_verb(tmp_path, capsys):
    from conduit_spark import cli

    out_file = str(tmp_path / "p.yaml")
    rc = cli.main([
        "generate", "from kafka topic 'orders' to s3", "--out", out_file,
    ])
    assert rc == 0
    cfgs = parse_yaml(open(out_file).read())
    assert cfgs[0].connectors[0].plugin == "builtin:kafka"
    capsys.readouterr()
    # a request the offline provider cannot satisfy semantically is a
    # clean exit-3 rejection, reasons on stderr
    rc = cli.main(["generate", "from dynamodb to snowflake"])
    assert rc == 3
    err = capsys.readouterr().err
    assert "rejected" in err
