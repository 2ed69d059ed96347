"""Temporal join operators the reference engine family offers but vanilla
Spark SQL lacks as primitives: AS-OF join and bounded range (interval) join.

Both are expressed as compositions of existing DataFrame ops (the task
hierarchy's preferred path) rather than UDFs:

- **As-of join** — the union + ordered-window trick: tag both sides, union,
  and take ``last(right_cols, ignoreNulls=True)`` over a per-key window
  ordered by event time. ONE shuffle on the key, zero join nodes, linear in
  input size — this is the scalable form (a naive ``a.ts >= b.ts`` theta
  join would plan as BroadcastNestedLoopJoin and explode quadratically).
- **Range join** — bucketize time into window-width buckets and turn the
  interval predicate into an equi-join on (key, bucket) with the anchor
  side probing its bucket and the one before, then re-filter the exact
  bounds. Equi-join ⇒ hash/sort-merge strategy, shuffle bounded by data
  size; at 100 TB the bucket width is the knob that trades probe fan-out
  (always 2 here) against per-bucket row count.

Oracles: DuckDB's native ``ASOF LEFT JOIN`` for the former, a plain
inequality join for the latter (fine at oracle scale).

Reference parity: the reference (DataRecce/dbt-tpch) has no temporal joins
— this is extension surface mandated by the task (training-data pipelines:
"attach last-known state", "gather context around anchors").
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_tpch_spark.functions import dsum
from dbt_tpch_spark.models.oracle import dsum_sql, oracle
from dbt_tpch_spark.plans import model

#: range-join context window length (seconds). Bucket width equals the
#: window length so every interval spans at most two buckets.
CONTEXT_SECONDS = 300


@model("events_asof_last_click", layer="operators", materialization="view")
def events_asof_last_click(ctx):
    """AS-OF join: for every ``error`` event, the most recent ``click`` by
    the same user at-or-before the error's timestamp (``a.ts >= c.ts``),
    plus the gap in microseconds; errors with no prior click keep NULLs
    (left semantics).

    Determinism: the right side is pre-reduced to one row per
    ``(user_id, ts)`` keeping MAX(event_id), so ties are unambiguous in
    both engines. In the union ordering, clicks sort before anchors at
    equal ``ts`` (``is_anchor`` 0 < 1), matching ASOF's inclusive bound.
    """
    e = ctx.source("events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    anchors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_anchor"),
        "click_id",
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        anchors.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_anchor"),
            F.lit(None).cast("long").alias("click_id"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_anchor")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn(
            "asof_click_ts",
            F.last(
                F.when(F.col("is_anchor") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("is_anchor") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "asof_click_id",
            "asof_click_ts",
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_click_ts")))
            .cast("long")
            .alias("gap_us"),
        )
    )


oracle(
    "events_asof_last_click",
    ("events",),
    """WITH clicks AS (
    SELECT user_id, ts, MAX(event_id) AS click_id
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
),
anchors AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT
    a.event_id,
    a.user_id,
    a.ts,
    c.click_id AS asof_click_id,
    c.ts AS asof_click_ts,
    CAST(date_diff('microsecond', c.ts, a.ts) AS BIGINT) AS gap_us
FROM anchors a ASOF LEFT JOIN clicks c
    ON a.user_id = c.user_id AND a.ts >= c.ts""",
)


@model("events_range_context", layer="operators", materialization="view")
def events_range_context(ctx):
    """Bounded range join: for every ``error`` event, aggregate the same
    user's events in the 5 minutes strictly before it
    (``a.ts - 5min <= e.ts < a.ts`` — the "context before failure" gather).

    Scale path: events land in one 300-second bucket each; anchors probe
    their own bucket and the previous one (an interval of width == bucket
    width spans at most two), so the interval predicate becomes an
    equi-join on ``(user_id, bucket)`` + an exact re-filter. Each context
    event matches an anchor probe at most once (its single bucket), so no
    post-join dedup is needed. Anchors with empty context are preserved by
    joining the aggregate back to the anchor set (counts 0, sum NULL —
    matching SQL LEFT JOIN + GROUP BY semantics).
    """
    bucket_us = CONTEXT_SECONDS * 1_000_000
    e = ctx.source("events")
    ctx_events = e.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.col("event_type").alias("c_type"),
        F.col("value").alias("c_value"),
        # integer div, not float division: double rounding near bucket
        # boundaries would misassign events and silently drop matches
        F.expr(f"unix_micros(ts) div {bucket_us}").alias("bucket"),
    )
    anchors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    probes = anchors.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"unix_micros(ts) div {bucket_us}") - 1,
                F.expr(f"unix_micros(ts) div {bucket_us}"),
            )
        ),
    )
    matched = (
        probes.join(
            ctx_events,
            (probes.user_id == ctx_events.c_user)
            & (probes.bucket == ctx_events.bucket),
        )
        .filter(
            (F.expr("unix_micros(c_ts)") >= F.expr("unix_micros(ts)") - F.lit(bucket_us))
            & (F.expr("unix_micros(c_ts)") < F.expr("unix_micros(ts)"))
        )
        .groupBy("event_id")
        .agg(
            F.count("c_event_id").alias("n_context"),
            F.countDistinct("c_type").alias("n_context_types"),
            dsum(F.col("c_value")).alias("ctx_value"),
        )
    )
    return anchors.join(matched, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("n_context"), F.lit(0)).cast("long").alias("n_context"),
        F.coalesce(F.col("n_context_types"), F.lit(0))
        .cast("long")
        .alias("n_context_types"),
        "ctx_value",
    )


oracle(
    "events_range_context",
    ("events",),
    f"""WITH anchors AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT
    a.event_id,
    a.user_id,
    a.ts,
    CAST(COUNT(e.event_id) AS BIGINT) AS n_context,
    CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_context_types,
    {dsum_sql('e.value')} AS ctx_value
FROM anchors a
LEFT JOIN events e
    ON e.user_id = a.user_id
   AND e.ts >= a.ts - INTERVAL '{CONTEXT_SECONDS} seconds'
   AND e.ts < a.ts
GROUP BY 1, 2, 3""",
)


#: nearest-event tolerance (microseconds): 30 minutes either direction
NEAREST_TOLERANCE_US = 30 * 60 * 1_000_000


@model("events_asof_nearest", layer="operators", materialization="view")
def events_asof_nearest(ctx):
    """Nearest-event temporal join: for every ``purchase``, the same
    user's click closest in time in EITHER direction, within a ±30 min
    tolerance — the bidirectional as-of variant (sensor alignment,
    attribution-with-lookahead). Ties at equal distance prefer the earlier
    (before) click; equal-timestamp clicks count as gap 0.

    Join-free like events_asof_last_click: one union, ONE shuffle on
    user_id, and two ordered window passes over the SAME sort (ascending
    for last-before, descending for first-after — Spark reuses the sorted
    runs). A theta join would be a BroadcastNestedLoopJoin; this is linear.

    Determinism: clicks pre-reduced to one row per (user_id, ts) keeping
    MAX(event_id); at equal ts the click sorts before the anchor in both
    passes (is_anchor 0 < 1), so both directions see it."""
    e = ctx.source("events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    anchors = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_anchor"),
        "click_id",
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        anchors.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_anchor"),
            F.lit(None).cast("long").alias("click_id"),
            "event_id",
        )
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_anchor")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "is_anchor")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("is_anchor") == 0, F.col("ts"))
    enriched = (
        tagged.withColumn("prev_id", F.last("click_id", ignorenulls=True).over(w_fwd))
        .withColumn("prev_ts", F.last(click_ts, ignorenulls=True).over(w_fwd))
        .withColumn("next_id", F.last("click_id", ignorenulls=True).over(w_bwd))
        .withColumn("next_ts", F.last(click_ts, ignorenulls=True).over(w_bwd))
        .filter(F.col("is_anchor") == 1)
    )
    a_us = F.unix_micros(F.col("ts"))
    prev_gap = a_us - F.unix_micros(F.col("prev_ts"))
    next_gap = F.unix_micros(F.col("next_ts")) - a_us
    prev_ok = F.col("prev_ts").isNotNull() & (prev_gap <= NEAREST_TOLERANCE_US)
    next_ok = F.col("next_ts").isNotNull() & (next_gap <= NEAREST_TOLERANCE_US)
    use_prev = prev_ok & (~next_ok | (prev_gap <= next_gap))
    use_next = next_ok & ~use_prev
    return enriched.select(
        "event_id",
        "user_id",
        "ts",
        F.when(use_prev, F.col("prev_id"))
        .when(use_next, F.col("next_id"))
        .alias("nearest_click_id"),
        F.when(use_prev, F.col("prev_ts"))
        .when(use_next, F.col("next_ts"))
        .alias("nearest_click_ts"),
        F.when(use_prev, -prev_gap)
        .when(use_next, next_gap)
        .cast("long")
        .alias("signed_gap_us"),
        F.when(use_prev, F.lit("before"))
        .when(use_next, F.lit("after"))
        .alias("direction"),
    )


oracle(
    "events_asof_nearest",
    ("events",),
    f"""WITH clicks AS (
    SELECT user_id, ts, MAX(event_id) AS click_id
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
),
anchors AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
tagged AS (
    SELECT user_id, ts, 0 AS is_anchor, click_id,
           CAST(NULL AS BIGINT) AS event_id
    FROM clicks
    UNION ALL
    SELECT user_id, ts, 1 AS is_anchor, CAST(NULL AS BIGINT) AS click_id,
           event_id
    FROM anchors
),
enriched AS (
    SELECT *,
        LAST_VALUE(click_id IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, is_anchor
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS prev_id,
        LAST_VALUE(CASE WHEN is_anchor = 0 THEN ts END IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, is_anchor
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS prev_ts,
        LAST_VALUE(click_id IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts DESC, is_anchor
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS next_id,
        LAST_VALUE(CASE WHEN is_anchor = 0 THEN ts END IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts DESC, is_anchor
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS next_ts
    FROM tagged
),
scored AS (
    SELECT
        event_id, user_id, ts, prev_id, prev_ts, next_id, next_ts,
        date_diff('microsecond', prev_ts, ts) AS prev_gap,
        date_diff('microsecond', ts, next_ts) AS next_gap,
        (prev_ts IS NOT NULL
         AND date_diff('microsecond', prev_ts, ts) <= {NEAREST_TOLERANCE_US})
            AS prev_ok,
        (next_ts IS NOT NULL
         AND date_diff('microsecond', ts, next_ts) <= {NEAREST_TOLERANCE_US})
            AS next_ok
    FROM enriched WHERE is_anchor = 1
)
SELECT
    event_id,
    user_id,
    ts,
    CASE WHEN prev_ok AND (NOT next_ok OR prev_gap <= next_gap) THEN prev_id
         WHEN next_ok THEN next_id END AS nearest_click_id,
    CASE WHEN prev_ok AND (NOT next_ok OR prev_gap <= next_gap) THEN prev_ts
         WHEN next_ok THEN next_ts END AS nearest_click_ts,
    CAST(CASE WHEN prev_ok AND (NOT next_ok OR prev_gap <= next_gap)
              THEN -prev_gap
         WHEN next_ok THEN next_gap END AS BIGINT) AS signed_gap_us,
    CASE WHEN prev_ok AND (NOT next_ok OR prev_gap <= next_gap)
         THEN 'before'
         WHEN next_ok THEN 'after' END AS direction
FROM scored""",
)
