"""Temporal join operators: as-of join and range join.

The reference has no temporal-join processor (its closest precedent
is position-ordered delivery, ``pkg/foundation/csync`` ordering); the
brief's custom-operator list names as-of and range joins explicitly —
the joins every event/feature pipeline needs (attribute a purchase to
the latest prior click; classify a measurement into a value band).

**As-of join, Spark-first.** The naive formulation — a theta-join on
``l.user = r.user AND r.ts <= l.ts`` + "keep latest" — explodes into
O(|L|·|R|) matched pairs per key before the reduction, and Catalyst
plans the non-equi conjunct as a SortMergeJoin with a per-row scan.
Instead we express it as a *union + ordered window*:

    union(tag right rows 0, left rows 1)
      → window PARTITION BY key ORDER BY (ts, tag, tiebreak)
        last(right_payload IGNORE NULLS) over rows unbounded-preceding
      → keep tagged-left rows

One shuffle on the key, one sort within partition — exactly the cost
of the SortMergeJoin Spark would run for an equi-join, with *running*
state instead of pair expansion. ``last`` over an
UnboundedPreceding frame is a running aggregate (no per-row rescan).
At 100 TB this is the shape you want: no candidate blowup, state per
row is one struct, and AQE handles key skew like any other sort.

**Range join, Spark-first.** Banding a fact column against a small
interval dimension is a broadcast non-equi join: Catalyst picks
BroadcastNestedLoopJoin, which is optimal when |bands| is tiny (each
fact row scans the in-memory band list). Never shuffle the fact side
for this. For *large* interval tables the standard trick is to
overlap-partition both sides by coarse buckets first; the dimension
here is config-sized, so broadcast is the 100 TB answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from conduit_spark.sources.tables import load_table
from conduit_spark.analytics import ordered_result

__all__ = ["asof_join", "range_join", "QUERIES", "ORACLES"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    tolerance_us: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key (backward as-of,
    inclusive — pandas ``merge_asof`` semantics). Unmatched left rows
    keep null right columns (left as-of join).

    Right rows must be unique per ``(on, right_ts)`` for a
    deterministic result — pre-aggregate ties upstream (the window
    tiebreak below makes equal-ts duplicates pick the max of the
    ordering struct, but relying on it is a smell).

    ``tolerance_us``: max allowed ``left_ts - right_ts`` gap in
    microseconds; matches farther back are nulled out.
    """
    r_payload_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.struct(
            F.unix_micros(F.col(right_ts)).alias("_rts_us"),
            *[F.col(c).alias(prefix + c) for c in r_payload_cols],
        ).alias("_match"),
        F.lit(0).alias("_tag"),
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_match"].dataType).alias("_match"),
        F.lit(1).alias("_tag"),
    )
    # left rows carry nulls for right-payload slots and vice versa
    u = r.unionByName(l, allowMissingColumns=True)
    # tag orders right rows before the left row at equal ts (inclusive
    # as-of); among equal-ts right rows `last` takes the max _match
    # struct position — deterministic given unique (key, ts) rights
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc(), F.col("_match").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_hit", F.last("_match", ignorenulls=True).over(w)).filter(
        F.col("_tag") == 1
    )
    if tolerance_us is not None:
        in_range = (
            F.unix_micros(F.col("_ts")) - F.col("_hit._rts_us")
        ) <= F.lit(tolerance_us)
        matched = matched.withColumn(
            "_hit", F.when(in_range, F.col("_hit"))
        )
    return matched.select(
        *[F.col(c) for c in l_cols],
        *[F.col(f"_hit.{prefix}{c}").alias(prefix + c) for c in r_payload_cols],
        F.col("_hit._rts_us").alias(prefix + "ts_us"),
    )


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Inner-join each fact row to the band with
    ``lo <= value < hi``. The band table is broadcast — Catalyst plans
    BroadcastNestedLoopJoin, the right physical strategy for a
    config-sized interval dimension (no fact-side shuffle)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, "inner")


# --- gate queries -----------------------------------------------------

# value bands for q_range_value_bands (events.value spans 0..~500)
VALUE_BANDS = [
    (0, "b0_micro", 0.0, 25.0),
    (1, "b1_small", 25.0, 100.0),
    (2, "b2_mid", 100.0, 250.0),
    (3, "b3_large", 250.0, 1000.0),
]


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→click attribution: each purchase event joined to the
    user's latest prior-or-equal click (classic as-of use case)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # unique (user_id, ts) on the right: equal-ts ties keep max id
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts")
    # unmatched lefts → -1, not NULL: the driver's pandas fetch turns a
    # nullable BIGINT into float64 on the DuckDB side (int vs float
    # hash mismatch), so the sentinel keeps both engines at int64
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("purchase_us"),
        F.coalesce(F.col("r_click_event_id"), F.lit(-1)).alias("click_event_id"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.col("r_ts_us"), F.lit(-1)
        ).alias("gap_us"),
    ).transform(ordered_result, "event_id")


def q_range_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band classification: events bucketed into value intervals via
    the broadcast range join, then a per-band rollup."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(VALUE_BANDS, ["band_idx", "band", "lo", "hi"])
    joined = range_join(events, bands, "value")
    return (
        joined.groupBy("band_idx", "band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("band_idx").cast("bigint").alias("band_idx"),
            "band",
            "n_events",
            "total_value",
        )
        .transform(ordered_result, "band_idx")
    )


TRENDING_K = 3


def q_trending_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window trending top-K: for every tumbling hour, the K event
    types with the most events (ties to the smaller name) — the batch
    form of the classic streaming dashboard query, and the scale-safe
    top-K shape: ONE keyed agg on (hour, type), then a window
    PARTITIONED by hour over the agg relation (24×|types| rows/day —
    never a window over raw events), rank filter, done. At 100 TB the
    window input is ~types-per-hour rows, not events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("hour").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        hourly.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TRENDING_K)
        .transform(ordered_result, "hour", "rank")
    )


FUNNEL_STEPS = [(1, "view"), (2, "click"), (3, "purchase")]
FUNNEL_WINDOW_US = 7 * 86_400 * 1_000_000  # 7 days in microseconds


def funnel_depth_expr(window_us: int | None = None) -> str:
    """The funnel state machine as one ``aggregate()`` fold over a
    sorted ``evs: array<struct<t bigint, s int>>`` column — shared by
    :func:`q_funnel_conversion` and the semantics property test so the
    two cannot drift. Step 1 anchors at the earliest step-1 event;
    step k+1 is the earliest qualifying event strictly after step k
    within ``window_us`` of the anchor."""
    w = FUNNEL_WINDOW_US if window_us is None else int(window_us)
    return f"""
        aggregate(evs,
          named_struct('t1', CAST(NULL AS BIGINT),
                       't2', CAST(NULL AS BIGINT),
                       't3', CAST(NULL AS BIGINT)),
          (acc, e) -> CASE
            WHEN e.s = 1 AND acc.t1 IS NULL
              THEN named_struct('t1', e.t, 't2', acc.t2, 't3', acc.t3)
            WHEN e.s = 2 AND acc.t1 IS NOT NULL AND acc.t2 IS NULL
                 AND e.t > acc.t1 AND e.t <= acc.t1 + {w}
              THEN named_struct('t1', acc.t1, 't2', e.t, 't3', acc.t3)
            WHEN e.s = 3 AND acc.t2 IS NOT NULL AND acc.t3 IS NULL
                 AND e.t > acc.t2 AND e.t <= acc.t1 + {w}
              THEN named_struct('t1', acc.t1, 't2', acc.t2, 't3', e.t)
            ELSE acc END,
          acc -> CASE WHEN acc.t3 IS NOT NULL THEN 3
                      WHEN acc.t2 IS NOT NULL THEN 2
                      WHEN acc.t1 IS NOT NULL THEN 1
                      ELSE 0 END)
    """


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel analysis (the ClickHouse ``windowFunnel`` /
    Amplitude conversion-funnel shape): for each user, the deepest
    prefix of view → click → purchase completed with strictly
    increasing timestamps inside ``FUNNEL_WINDOW_US`` of the FIRST
    step; then the per-step user counts and conversion from step 1.

    Semantics pinned exactly: step 1 anchors at the user's earliest
    ``view``; step k+1 is the earliest qualifying event strictly after
    step k and no later than ``t1 + window``; equal-timestamp events
    do not advance the funnel.

    Plan shape: ONE shuffle total — filter to the step types, keyed
    ``collect_list`` per user, ``array_sort``, and the funnel state
    machine runs as an ``aggregate`` fold inside whole-stage codegen
    (per-user state is 3 timestamps; per-user event lists are bounded
    by user activity, the same envelope ``q_user_sessions`` already
    carries). The final 3-row funnel is a scalar agg over |users|
    rows. No self-joins, no window over raw events — at 100 TB this
    is a single keyed exchange. The oracle reaches the same numbers
    by the independent join-chain construction (min-over-joins),
    which is provably the same earliest-qualifying-event recurrence.
    """
    ev = load_table(spark, sf_dir, "events")
    step_names = [name for _, name in FUNNEL_STEPS]
    s_expr = F.when(F.col("event_type") == step_names[0], 1)
    for idx, name in FUNNEL_STEPS[1:]:
        s_expr = s_expr.when(F.col("event_type") == name, idx)
    per_user = (
        ev.filter(F.col("event_type").isin(step_names))
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("t"),
            s_expr.alias("s"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("t", "s"))).alias("evs"))
    )
    depth = F.expr(funnel_depth_expr()).alias("depth")
    totals = per_user.select(depth).agg(
        *[
            F.sum((F.col("depth") >= idx).cast("bigint")).alias(f"n{idx}")
            for idx, _ in FUNNEL_STEPS
        ]
    )
    # `totals` is a single row, so conversion rates are plain column
    # arithmetic before the 3-row stack — no window needed anywhere.
    stack_args = ", ".join(
        f"CAST({idx} AS BIGINT), '{name}', CAST(n{idx} AS BIGINT), "
        f"round(CAST(n{idx} AS DOUBLE) / CAST(n1 AS DOUBLE), 6)"
        for idx, name in FUNNEL_STEPS
    )
    return totals.selectExpr(
        f"stack({len(FUNNEL_STEPS)}, {stack_args}) "
        "AS (step, step_name, n_users, pct_of_entry)"
    ).transform(ordered_result, "step")


QUERIES = {
    "q_asof_attribution": q_asof_attribution,
    "q_funnel_conversion": q_funnel_conversion,
    "q_range_value_bands": q_range_value_bands,
    "q_trending_hourly": q_trending_hourly,
}

_BANDS_VALUES = ", ".join(
    f"({i}, '{name}', {lo}, {hi})" for i, name, lo, hi in VALUE_BANDS
)

ORACLES = {
    # Independent construction of the funnel recurrence: step k+1 is
    # min(ts) over a join against step k — provably the same
    # earliest-qualifying-event the Spark fold picks in time order.
    "q_funnel_conversion": f"""
        WITH t1 AS (
            SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'click'
              AND epoch_us(e.ts) > t1.t1
              AND epoch_us(e.ts) <= t1.t1 + {FUNNEL_WINDOW_US}
            GROUP BY e.user_id),
        t3 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t3
            FROM events e
            JOIN t2 ON e.user_id = t2.user_id
            JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'purchase'
              AND epoch_us(e.ts) > t2.t2
              AND epoch_us(e.ts) <= t1.t1 + {FUNNEL_WINDOW_US}
            GROUP BY e.user_id),
        d AS (
            SELECT t1.user_id,
                   CASE WHEN t3.user_id IS NOT NULL THEN 3
                        WHEN t2.user_id IS NOT NULL THEN 2
                        ELSE 1 END AS depth
            FROM t1
            LEFT JOIN t2 ON t1.user_id = t2.user_id
            LEFT JOIN t3 ON t1.user_id = t3.user_id),
        steps(step, step_name) AS (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
        SELECT CAST(s.step AS BIGINT) AS step,
               s.step_name,
               CAST((SELECT count(*) FROM d WHERE d.depth >= s.step) AS BIGINT)
                   AS n_users,
               round(CAST((SELECT count(*) FROM d WHERE d.depth >= s.step) AS DOUBLE)
                     / CAST((SELECT count(*) FROM d) AS DOUBLE), 6) AS pct_of_entry
        FROM steps s
        ORDER BY step
    """,
    "q_trending_hourly": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2)
        SELECT hour, event_type, n_events, rank FROM (
            SELECT hour, event_type, n_events,
                   CAST(row_number() OVER (
                       PARTITION BY hour
                       ORDER BY n_events DESC, event_type ASC) AS BIGINT)
                       AS rank
            FROM hourly)
        WHERE rank <= {TRENDING_K}
        ORDER BY hour, rank
    """,
    # DuckDB has native ASOF JOIN (l.ts >= r.ts picks the greatest
    # right ts per left row) — an independent implementation of the
    # same semantics, which is exactly what an oracle should be.
    "q_asof_attribution": """
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
        c AS (
            SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS click_event_id
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id,
               CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
               CAST(coalesce(c.click_event_id, -1) AS BIGINT) AS click_event_id,
               CAST(coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS BIGINT) AS gap_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    "q_range_value_bands": f"""
        WITH bands(band_idx, band, lo, hi) AS (VALUES {_BANDS_VALUES})
        SELECT CAST(band_idx AS BIGINT) AS band_idx, band,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events JOIN bands
          ON value >= lo AND value < hi
        GROUP BY band_idx, band
        ORDER BY band_idx
    """,
}
