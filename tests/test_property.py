"""Property/randomized tests, mirroring the reference's property layer
(funnel/full_pipeline_property_test.go): seeded random records ×
random condition templates, Spark compilation vs an independent
Python evaluator of the Go-template subset; random field-op chains vs
dict-model semantics."""

from __future__ import annotations

import json
import random

import pyspark.sql.functions as F

from conduit_spark import envelope as env
from conduit_spark import operators as ops
from conduit_spark.expr import compile_condition

rng = random.Random(42)

NAMES = ["Alice Smith", "Bob Jones", "Cara Wu", "Dan Lee", ""]
CITIES = ["X", "Y", "Z"]
OPS4 = ["create", "update", "delete", "snapshot"]


def rand_record(i: int) -> dict:
    return {
        "position": f"src:{i}".encode(),
        "operation": rng.choice(OPS4),
        "metadata": {"k": rng.choice(["val", "other", ""])},
        "key_raw": None,
        "key_json": json.dumps({"id": i}),
        "payload_before_json": None,
        "payload_after_json": json.dumps(
            {
                "id": rng.randrange(0, 50),
                "name": rng.choice(NAMES),
                "age": rng.randrange(0, 80),
                "score": round(rng.uniform(0, 20), 2),
                "trial": rng.random() < 0.5,
                "address": {"city": rng.choice(CITIES)},
            }
        ),
        "payload_after_raw": None,
        "is_structured": True,
    }


RECORDS = [rand_record(i) for i in range(60)]


def payload(rec):
    return json.loads(rec["payload_after_json"])


# ---- random condition grammar + python evaluator -------------------------

LEAVES = [
    (
        lambda v: f'eq .Operation "{v}"',
        lambda rec, v: rec["operation"] == v,
        lambda: rng.choice(OPS4),
    ),
    (
        lambda v: f"eq .Payload.After.id {v}",
        lambda rec, v: payload(rec)["id"] == v,
        lambda: rng.randrange(0, 50),
    ),
    (
        lambda v: f"gt .Payload.After.age {v}",
        lambda rec, v: payload(rec)["age"] > v,
        lambda: rng.randrange(0, 80),
    ),
    (
        lambda v: f"lt .Payload.After.score {v}",
        lambda rec, v: payload(rec)["score"] < v,
        lambda: round(rng.uniform(0, 20), 1),
    ),
    (
        lambda v: f'contains "{v}" .Payload.After.name',
        lambda rec, v: v in payload(rec)["name"],
        lambda: rng.choice(["Smith", "a", "W", "zz"]),
    ),
    (
        lambda v: f'eq .Metadata.k "{v}"',
        lambda rec, v: rec["metadata"]["k"] == v,
        lambda: rng.choice(["val", "other", ""]),
    ),
    (
        lambda v: f'eq .Payload.After.address.city "{v}"',
        lambda rec, v: payload(rec)["address"]["city"] == v,
        lambda: rng.choice(CITIES),
    ),
    (
        lambda v: "eq .Payload.After.trial true",
        lambda rec, v: payload(rec)["trial"] is True,
        lambda: None,
    ),
]


def rand_condition(depth: int = 0):
    if depth >= 2 or rng.random() < 0.4:
        tmpl_fn, eval_fn, gen = rng.choice(LEAVES)
        v = gen()
        return tmpl_fn(v), (lambda rec, e=eval_fn, vv=v: e(rec, vv))
    kind = rng.choice(["and", "or", "not"])
    a_t, a_e = rand_condition(depth + 1)
    if kind == "not":
        return f"not ({a_t})", (lambda rec: not a_e(rec))
    b_t, b_e = rand_condition(depth + 1)
    if kind == "and":
        return f"and ({a_t}) ({b_t})", (lambda rec: a_e(rec) and b_e(rec))
    return f"or ({a_t}) ({b_t})", (lambda rec: a_e(rec) or b_e(rec))


def test_random_conditions_match_python_model(spark):
    df = spark.createDataFrame(RECORDS, schema=env.ENVELOPE_SCHEMA).cache()
    conditions = [rand_condition() for _ in range(25)]
    cols = []
    for i, (tmpl, _) in enumerate(conditions):
        cols.append(compile_condition("{{ " + tmpl + " }}", df).alias(f"c{i}"))
    rows = df.select(*cols).collect()
    for i, (tmpl, pyeval) in enumerate(conditions):
        got = [bool(r[f"c{i}"]) for r in rows]
        want = [pyeval(rec) for rec in RECORDS]
        assert got == want, f"condition mismatch: {tmpl}"


# ---- random field-op chains vs dict model --------------------------------


def test_random_field_op_chains_match_dict_model(spark):
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("age", LongType()),
            StructField("score", DoubleType()),
            StructField("trial", BooleanType()),
            StructField(
                "address", StructType([StructField("city", StringType())])
            ),
        ]
    )
    base = spark.createDataFrame(RECORDS, schema=env.ENVELOPE_SCHEMA)
    df = env.with_typed_payload(base, schema)
    model = [payload(r) for r in RECORDS]

    for step in range(8):
        choice = rng.choice(["set", "exclude", "rename", "convert"])
        if choice == "set":
            val = rng.choice(["xx", "yy"])
            df = ops.field_set(df, ".Payload.After.name", val)
            for m in model:
                m["name"] = val
        elif choice == "exclude":
            df = ops.field_exclude(df, [".Payload.After.score"])
            for m in model:
                m.pop("score", None)
        elif choice == "rename":
            # rename then back, so the schema stays stable for later steps
            df = ops.field_rename(df, {".Payload.After.age": "years"})
            df = ops.field_rename(df, {".Payload.After.years": "age"})
        else:
            df = ops.field_convert(df, ".Payload.After.id", "string")
            for m in model:
                m["id"] = str(m["id"])

    got = [json.loads(r.payload_after_json) for r in df.select("payload_after_json").collect()]
    for g, m in zip(got, model):
        for k, v in m.items():
            if isinstance(v, float):
                assert abs(g[k] - v) < 1e-9
            else:
                assert g[k] == v, (k, g, m)
        # exclude really removed the field (None or absent both count —
        # dropFields removes; JSON omits nulls)
        if "score" not in m:
            assert g.get("score") is None


def test_random_changelogs_materialize_to_dict_replay(spark):
    """Property: for ANY interleaving of create/update/delete/snapshot
    ops over any key set, cdc_apply's keyed max_by materialization
    equals a sequential dict replay — the invariant every CDC sink
    (jdbc_cdc_sink, snapshot handoff, debezium round trip) rests on."""
    import json

    import pyspark.sql.functions as F
    from hypothesis import given, settings, strategies as st

    from conduit_spark.operators.cdc import cdc_apply

    op_s = st.sampled_from(["create", "update", "delete", "snapshot"])

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 6), op_s, st.integers(-100, 100)),
            min_size=1,
            max_size=40,
        )
    )
    def check(changes):
        # replay oracle: ops applied in sequence order
        state: dict[int, int] = {}
        for key, op, val in changes:
            if op == "delete":
                state.pop(key, None)
            else:
                state[key] = val
        rows = [
            (i, key, op, json.dumps({"k": key, "v": val}))
            for i, (key, op, val) in enumerate(changes)
        ]
        df = spark.createDataFrame(
            rows, "seq long, k long, operation string, payload string"
        )
        final = cdc_apply(df, F.col("k"), F.col("seq")).collect()
        got = {
            r["k"]: json.loads(r["payload"])["v"]
            for r in final
        }
        assert got == state

    check()
