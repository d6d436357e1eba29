"""Randomized FULL-PIPELINE property test + run-ledger invariant.

Mirrors the reference's strongest test layer (SURVEY.md §5:
funnel/full_pipeline_property_test.go + funnel/run_ledger_test.go):
seeded random topologies — 1-3 generator sources with source-scoped
chains, a random pipeline-scoped chain mixing multi-record (clone),
filter, field.set and error processors, 1-2 file destinations with
optional destination-scoped filters, a DLQ — run through the REAL
YAML parser + Pipeline runtime, then checked against an independent
pure-Python record-level model of the same semantics.

The ledger invariant is conservation + exactly-once: for every
destination, the multiset of delivered payloads equals the model's
prediction record-for-record (not just counts); errored records land
in the DLQ exactly once; and no destination sees a duplicate
(position, clone.index) pair.
"""

from __future__ import annotations

import glob
import json
import os
import random

import pytest

from conduit_spark.pipeline import Pipeline, parse_yaml


def read_json_dir(path):
    rows = []
    for f in sorted(glob.glob(os.path.join(path, "**", "*.json"), recursive=True)):
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    return rows


# -- the independent model ---------------------------------------------
# generator synthesis contract (sources/generator.py, pinned by the
# g_generator oracle): id=(i*17+3)%1000, trial=(i%2==0)


def _gen(count: int, src: str) -> list[dict]:
    return [
        {"id": (i * 17 + 3) % 1000, "trial": i % 2 == 0, "src": src,
         "err": False, "stage": None}
        for i in range(count)
    ]


def _apply_chain(recs: list[dict], chain: list[tuple]) -> list[dict]:
    for step in chain:
        kind = step[0]
        if kind == "filter_trial":
            recs = [r for r in recs if not r["trial"]]
        elif kind == "filter_id_lt":
            recs = [r for r in recs if not (r["id"] < step[1])]
        elif kind == "clone":
            count, only_trial = step[1], step[2]
            out = []
            for r in recs:
                n = count + 1 if (not only_trial or r["trial"]) else 1
                out.extend(dict(r) for _ in range(n))
            recs = out
        elif kind == "error_id_lt":
            for r in recs:
                if r["id"] < step[1]:
                    r["err"] = True
        elif kind == "stage":
            for r in recs:
                r["stage"] = step[1]
        else:  # pragma: no cover
            raise AssertionError(kind)
    return recs


def _chain_yaml(chain: list[tuple], indent: str) -> str:
    lines = []
    for k, step in enumerate(chain):
        kind = step[0]
        if kind == "filter_trial":
            lines.append(
                f"{indent}- id: c{k}\n{indent}  plugin: filter\n"
                f"{indent}  condition: '{{{{ eq .Payload.After.trial true }}}}'"
            )
        elif kind == "filter_id_lt":
            lines.append(
                f"{indent}- id: c{k}\n{indent}  plugin: filter\n"
                f"{indent}  condition: '{{{{ lt .Payload.After.id {step[1]} }}}}'"
            )
        elif kind == "clone":
            cond = (
                f"\n{indent}  condition: '{{{{ eq .Payload.After.trial true }}}}'"
                if step[2]
                else ""
            )
            lines.append(
                f"{indent}- id: c{k}\n{indent}  plugin: clone\n"
                f"{indent}  settings: {{count: {step[1]}}}{cond}"
            )
        elif kind == "error_id_lt":
            lines.append(
                f"{indent}- id: c{k}\n{indent}  plugin: error\n"
                f"{indent}  settings: {{message: 'prop-err'}}\n"
                f"{indent}  condition: '{{{{ lt .Payload.After.id {step[1]} }}}}'"
            )
        elif kind == "stage":
            lines.append(
                f"{indent}- id: c{k}\n{indent}  plugin: field.set\n"
                f"{indent}  settings: {{field: .Metadata.stage, value: '{step[1]}'}}"
            )
    return "\n".join(lines)


def _random_pipeline(rng: random.Random, tmp_path):
    n_src = rng.randint(1, 3)
    sources = [(f"s{j}", rng.randint(10, 40)) for j in range(n_src)]

    pool = [
        ("filter_trial",),
        ("filter_id_lt", rng.choice([200, 500, 800])),
        ("clone", rng.randint(1, 2), rng.random() < 0.5),
        ("stage", f"st-{rng.randint(0, 9)}"),
    ]
    use_error = rng.random() < 0.5
    chain = rng.sample(pool, rng.randint(0, 3))
    if use_error:
        chain.insert(rng.randint(0, len(chain)), ("error_id_lt", rng.choice([100, 300])))

    # error + fan-out would nack the same pipeline-scope rows once but
    # complicate the model; the reference property test holds topology
    # fixed per case too — one destination whenever error is in play
    n_dst = 1 if use_error else rng.randint(1, 2)
    dst_filter_src = (
        sources[0][0] if (n_dst == 2 and n_src >= 2 and rng.random() < 0.7) else None
    )

    conn = []
    for sid, cnt in sources:
        conn.append(
            f"""      - id: {sid}
        type: source
        plugin: builtin:generator
        settings: {{recordCount: {cnt}, "format.options": {{id: int, trial: bool}}}}
        processors:
          - id: {sid}-tag
            plugin: field.set
            settings: {{field: .Metadata.src, value: {sid}}}"""
        )
    dests = []
    for d in range(n_dst):
        out = str(tmp_path / f"out{d}")
        block = f"""      - id: d{d}
        type: destination
        plugin: builtin:file
        settings: {{path: "{out}", format: json, mode: overwrite}}"""
        if d == 1 and dst_filter_src is not None:
            block += f"""
        processors:
          - id: only
            plugin: filter
            condition: '{{{{ ne .Metadata.src "{dst_filter_src}" }}}}'"""
        dests.append((f"d{d}", out, d == 1 and dst_filter_src is not None))
        conn.append(block)

    dlq_dir = str(tmp_path / "dlq")
    yaml_text = f"""
version: "2.2"
pipelines:
  - id: prop
    connectors:
{chr(10).join(conn)}
    processors:
{_chain_yaml(chain, "      ") or "      []"}
    dead-letter-queue:
      plugin: builtin:file
      settings: {{path: "{dlq_dir}", format: json, mode: overwrite}}
      window-size: 1000000
      window-nack-threshold: 1000000
"""
    if not chain:
        yaml_text = yaml_text.replace("    processors:\n      []\n", "")

    # model
    recs: list[dict] = []
    for sid, cnt in sources:
        recs.extend(_gen(cnt, sid))
    recs = _apply_chain(recs, chain)
    errored = [r for r in recs if r["err"]]
    clean = [r for r in recs if not r["err"]]
    expect = {}
    for did, _out, has_filter in dests:
        kept = (
            [r for r in clean if r["src"] == dst_filter_src] if has_filter else clean
        )
        expect[did] = kept
    return yaml_text, expect, errored, dests, dlq_dir, use_error


@pytest.mark.parametrize("seed", [11, 23, 37, 58, 91])
def test_full_pipeline_property_ledger(spark, tmp_path, seed):
    rng = random.Random(seed)
    yaml_text, expect, errored, dests, dlq_dir, use_error = _random_pipeline(
        rng, tmp_path
    )
    cfg = parse_yaml(yaml_text)[0]
    res = Pipeline(spark, cfg).run_batch()

    def payload_multiset(rows):
        out = []
        for r in rows:
            p = json.loads(r["payload_after_json"])
            out.append((int(p["id"]), bool(p["trial"]), r["metadata"].get("src")))
        return sorted(out)

    for did, out_dir, _hf in dests:
        rows = read_json_dir(out_dir)
        # count ledger: runtime-reported == on-disk == model
        assert res.delivered[did] == len(rows) == len(expect[did]), (
            seed, did, res.delivered, len(rows), len(expect[did])
        )
        # record-level ledger: the delivered payload multiset matches
        # the model record-for-record
        model = sorted(
            (r["id"], r["trial"], r["src"]) for r in expect[did]
        )
        assert payload_multiset(rows) == model, (seed, did)
        # exactly-once: no duplicate (position, clone.index) pair
        seen = set()
        for r in rows:
            key = (r["position"], r["metadata"].get("clone.index"))
            assert key not in seen, (seed, did, key)
            seen.add(key)

    # DLQ ledger: errored records land exactly once, tagged with the
    # pipeline id and the error message
    dlq_rows = read_json_dir(dlq_dir) if use_error else []
    assert res.dlq_routed == len(dlq_rows) == len(errored), (
        seed, res.dlq_routed, len(dlq_rows), len(errored)
    )
    for r in dlq_rows:
        assert r["metadata"]["conduit.dlq.pipeline"] == "prop"
        assert "prop-err" in r["metadata"]["conduit.dlq.error"]
