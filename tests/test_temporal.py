"""As-of and range join: semantics on hand-built frames + plan shape."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from conduit_spark.analytics import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # matches r@09:59
            (2, 10, _ts("2024-01-01 09:00:00")),  # before any right → null
            (3, 10, _ts("2024-01-01 09:30:00")),  # equal ts → inclusive match
            (4, 20, _ts("2024-01-01 12:00:00")),  # other key
            (5, 30, _ts("2024-01-01 12:00:00")),  # key absent on right → null
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:30:00"), "a"),
            (10, _ts("2024-01-01 09:59:00"), "b"),
            (10, _ts("2024-01-01 11:00:00"), "c"),  # after every left → unused
            (20, _ts("2024-01-01 00:00:00"), "d"),
        ],
        ["k", "ts", "tag"],
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: r["r_tag"]
        for r in temporal.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert out == {1: "b", 2: None, 3: "a", 4: "d", 5: None}


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: r["r_tag"]
        for r in temporal.asof_join(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            tolerance_us=3_600_000_000,  # 1h
        ).collect()
    }
    # id=4's only match is 12h stale → nulled; the rest are within 1h
    assert out == {1: "b", 2: None, 3: "a", 4: None, 5: None}


def test_asof_plan_is_single_keyed_window(spark, sf_dir):
    df = temporal.q_asof_attribution(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition" not in plan  # never a global window
    assert "CartesianProduct" not in plan
    # union+window formulation: no join node at all on the asof path
    assert "SortMergeJoin" not in plan


def test_range_join_broadcasts_bands(spark, sf_dir):
    df = temporal.q_range_value_bands(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # bands built+broadcast
    assert "Exchange hashpartitioning(value" not in plan  # no fact shuffle


def test_range_join_bands_partition_values(spark):
    bands = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0)], ["band_idx", "lo", "hi"]
    )
    fact = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 19.9), (4, 25.0)], ["id", "v"]
    )
    got = {
        r["id"]: r["band_idx"]
        for r in temporal.range_join(fact, bands, "v").collect()
    }
    assert got == {1: 0, 2: 1, 3: 1}  # 4 falls outside every band


def test_asof_ties_pick_max_struct(spark):
    left = spark.createDataFrame([(1, 7, _ts("2024-01-01 10:00:00"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 09:00:00"), 5), (7, _ts("2024-01-01 09:00:00"), 9)],
        ["k", "ts", "val"],
    )
    (row,) = temporal.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts"
    ).collect()
    assert row["r_val"] == 9
