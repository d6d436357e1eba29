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
    from conduit_spark.plans import barriers_disabled

    # r15: build under barriers_disabled so the eager ordered_result
    # checkpoint doesn't hide the asof window from the assertion
    with barriers_disabled():
        df = temporal.q_asof_attribution(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition" not in plan  # never a global window
    assert "CartesianProduct" not in plan
    # union+window formulation: no join node at all on the asof path
    assert "SortMergeJoin" not in plan


def test_range_join_broadcasts_bands(spark, sf_dir):
    from conduit_spark.plans import barriers_disabled

    with barriers_disabled():
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


# --- funnel semantics property ---------------------------------------


def _funnel_reference(events, window_us):
    """Independent per-user reference: scan (t, s) in sorted order with
    the pinned recurrence (strictly-increasing, first-step-anchored
    window) — the third implementation the Spark fold and the SQL
    join-chain oracle must both agree with."""
    t1 = t2 = t3 = None
    for t, s in sorted(events):
        if s == 1 and t1 is None:
            t1 = t
        elif s == 2 and t1 is not None and t2 is None and t1 < t <= t1 + window_us:
            t2 = t
        elif s == 3 and t2 is not None and t3 is None and t2 < t <= t1 + window_us:
            t3 = t
    return 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0


def test_funnel_fold_matches_reference_on_adversarial_streams(spark):
    """Randomized (seeded) event streams with heavy ties and
    out-of-window gaps: the Spark aggregate() fold must equal the
    plain-Python reference for every user."""
    import random

    rng = random.Random(20260814)
    win = temporal.FUNNEL_WINDOW_US
    rows = []
    expected = {}
    for uid in range(60):
        n = rng.randint(0, 12)
        evs = []
        for _ in range(n):
            # timestamps cluster tightly (ties!) or jump past the window
            t = rng.choice(
                [rng.randint(0, 5), rng.randint(0, 3) * win, win + rng.randint(-2, 2)]
            )
            s = rng.randint(1, 3)
            evs.append((t, s))
        expected[uid] = _funnel_reference(evs, win)
        rows += [(uid, t, s) for t, s in evs]
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id long, t long, s int")
    per_user = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "s"))).alias("evs")
    )
    depth_expr = temporal.funnel_depth_expr(win)
    got = {
        r.user_id: r.depth
        for r in per_user.select("user_id", F.expr(depth_expr).alias("depth")).collect()
    }
    active = {u: d for u, d in expected.items() if u in got}
    assert got == active
