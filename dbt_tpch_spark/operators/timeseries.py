"""Time-series gap-fill over ``events``: the hypertable/gapfill primitive
(TimescaleDB ``time_bucket_gapfill`` + ``locf()`` + ``interpolate()``
semantics) re-expressed as DataFrame compositions.

Extension surface: the reference (DataRecce/dbt-tpch) has no time-series
densification; a metrics/training pipeline needs regular grids (model
features, rate computations) from irregular event streams.

Scale shape:

- events aggregate to (user, hour) buckets first — map-side partial agg
  absorbs the raw stream before any shuffle;
- the dense grid is *generated* per key with ``sequence()`` + ``explode``
  from that key's [min, max] bucket — no join against a calendar table,
  no cross join;
- LOCF/interpolation uses the union + ordered-window trick (same family
  as the as-of join in operators/temporal.py): tag observed and grid
  rows, one shuffle on the key, ``last(..., ignorenulls)`` backward and
  ``first(..., ignorenulls)`` forward over the same sort — Catalyst
  reuses one sort for both frames, and there are ZERO join nodes.

At 100 TB the grid is bounded by keys x buckets (not raw events), and the
single shuffle key (user_id) is the natural partitioning for any
downstream per-entity feature pipeline.

Determinism: bucket values are rnd(dsum(value), 4) so LOCF copies exact
quantized doubles; interpolation arithmetic is identical IEEE double ops
on both engines, quantized rnd 6 at the output.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_tpch_spark.functions import dsum, rnd
from dbt_tpch_spark.models.oracle import dsum_sql, oracle, rnd_sql
from dbt_tpch_spark.plans import model


@model("events_gapfill_hourly", layer="operators", materialization="view")
def events_gapfill_hourly(ctx):
    """Dense per-user hourly grid over each user's observed [first, last]
    bucket with last-observation-carried-forward and linear interpolation.

    Output: one row per (user_id, hour bucket); ``is_gap`` flags generated
    rows, ``locf_value`` carries the last observed bucket value forward,
    ``interp_value`` linearly interpolates between the surrounding observed
    buckets (trailing gaps fall back to LOCF; leading gaps cannot occur —
    the grid starts at the first observation).
    """
    e = ctx.source("events")
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        rnd(dsum(F.col("value")), 4).alias("bucket_value"),
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("b0", "b1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    tagged = obs.select(
        "user_id",
        "bucket",
        F.lit(1).alias("is_obs"),
        "n_events",
        "bucket_value",
    ).unionByName(
        grid.select(
            "user_id",
            "bucket",
            F.lit(0).alias("is_obs"),
            F.lit(None).cast("long").alias("n_events"),
            F.lit(None).cast("double").alias("bucket_value"),
        )
    )
    # observed row sorts before its grid twin at the same bucket, so the
    # backward frame on the grid row already contains the observation
    order = [F.col("bucket"), F.col("is_obs").desc()]
    back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("is_obs") == 1, F.col("bucket"))
    filled = (
        tagged.withColumn(
            "locf_value", F.last("bucket_value", ignorenulls=True).over(back)
        )
        .withColumn("locf_bucket", F.last(obs_bucket, ignorenulls=True).over(back))
        .withColumn(
            "next_value", F.first("bucket_value", ignorenulls=True).over(fwd)
        )
        .withColumn("next_bucket", F.first(obs_bucket, ignorenulls=True).over(fwd))
    )
    dh = F.expr("timestampdiff(HOUR, locf_bucket, bucket)").cast("double")
    span = F.expr("timestampdiff(HOUR, locf_bucket, next_bucket)").cast("double")
    interp = F.when(
        F.col("next_bucket").isNull() | (F.col("next_bucket") == F.col("locf_bucket")),
        F.col("locf_value"),
    ).otherwise(
        rnd(
            F.col("locf_value")
            + (F.col("next_value") - F.col("locf_value")) * dh / span,
            6,
        )
    )
    return (
        filled
        # keep observed rows plus *true* gap grid rows (drop the grid twin
        # of an observed bucket)
        .filter((F.col("is_obs") == 1) | (F.col("locf_bucket") != F.col("bucket")))
        .select(
            "user_id",
            "bucket",
            (F.col("is_obs") == 0).cast("int").alias("is_gap"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            "bucket_value",
            "locf_value",
            interp.alias("interp_value"),
        )
    )


oracle(
    "events_gapfill_hourly",
    ("events",),
    f"""WITH obs AS (
    SELECT
        user_id,
        date_trunc('hour', ts) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        {rnd_sql(dsum_sql("value"), 4)} AS bucket_value
    FROM events
    GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY 1
),
grid AS (
    SELECT user_id, unnest(generate_series(b0, b1, INTERVAL '1 hour')) AS bucket
    FROM bounds
),
tagged AS (
    SELECT user_id, bucket, 1 AS is_obs, n_events, bucket_value FROM obs
    UNION ALL
    SELECT user_id, bucket, 0, NULL, NULL FROM grid
),
filled AS (
    SELECT *,
        last_value(bucket_value IGNORE NULLS) OVER back AS locf_value,
        last_value(CASE WHEN is_obs = 1 THEN bucket END IGNORE NULLS)
            OVER back AS locf_bucket,
        first_value(bucket_value IGNORE NULLS) OVER fwd AS next_value,
        first_value(CASE WHEN is_obs = 1 THEN bucket END IGNORE NULLS)
            OVER fwd AS next_bucket
    FROM tagged
    WINDOW
        back AS (PARTITION BY user_id ORDER BY bucket, is_obs DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        fwd AS (PARTITION BY user_id ORDER BY bucket, is_obs DESC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT
    user_id,
    bucket,
    CAST(is_obs = 0 AS INTEGER) AS is_gap,
    CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
    bucket_value,
    locf_value,
    CASE
        WHEN next_bucket IS NULL OR next_bucket = locf_bucket THEN locf_value
        ELSE {rnd_sql(
            "locf_value + (next_value - locf_value)"
            " * CAST(date_diff('hour', locf_bucket, bucket) AS DOUBLE)"
            " / CAST(date_diff('hour', locf_bucket, next_bucket) AS DOUBLE)",
            6,
        )}
    END AS interp_value
FROM filled
WHERE is_obs = 1 OR locf_bucket != bucket""",
)


ZSCORE_LOOKBACK = 20
ZSCORE_MIN_PRIOR = 5
ZSCORE_THRESHOLD = 3.0

#: the shared rolling frame: strictly-prior events per user, bounded lookback
_Z_OVER = (
    "PARTITION BY user_id ORDER BY ts, event_id "
    f"ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING"
)


@model("events_value_zscore", layer="operators", materialization="view")
def events_value_zscore(ctx):
    """Rolling z-score anomaly detection: each event's ``value`` against
    the mean/stddev of its user's previous ZSCORE_LOOKBACK events (strictly
    prior — no self-leakage). ``z_score`` is NULL until ZSCORE_MIN_PRIOR
    history exists or when the window is constant; ``is_anomaly`` flags
    |z| > 3. The streaming-shaped outlier gate of a metrics pipeline.

    Scale shape: one shuffle on user_id, one sort, three aggregates over
    the same ROWS frame (Spark evaluates them in a single WindowExec).
    Variance uses the exact-decimal moment convention (functions.dvar_samp
    rationale) so both engines carry identical doubles."""
    from dbt_tpch_spark.functions import dsum_over

    e = ctx.source("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    n = F.count("value").over(w)
    sx = dsum_over(F.col("value"), w)
    sxx = dsum_over(F.col("value") * F.col("value"), w)
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - F.lit(1))
    z = F.when(
        (n >= ZSCORE_MIN_PRIOR) & (var > 0),
        (F.col("value") - mean) / F.sqrt(var),
    )
    out = (
        e.withColumn("n_prior", n.cast("long"))
        .withColumn("prior_mean", rnd(mean, 6))
        .withColumn("z_score", rnd(z, 6))
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        "n_prior",
        "prior_mean",
        "z_score",
        F.when(
            F.abs(F.col("z_score")) > ZSCORE_THRESHOLD, F.lit(1)
        ).otherwise(F.lit(0)).alias("is_anomaly"),
    )


def _wsum_sql(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) OVER ({_Z_OVER}) AS DOUBLE)"
    )


oracle(
    "events_value_zscore",
    ("events",),
    f"""WITH rolled AS (
    SELECT
        event_id, user_id, ts, event_type, value,
        CAST(COUNT(value) OVER ({_Z_OVER}) AS BIGINT) AS n_prior,
        {_wsum_sql('value')} AS sx,
        {_wsum_sql('value * value')} AS sxx
    FROM events
),
scored AS (
    SELECT
        event_id, user_id, ts, event_type, value, n_prior,
        {rnd_sql('sx / n_prior', 6)} AS prior_mean,
        CASE
            WHEN n_prior >= {ZSCORE_MIN_PRIOR}
                 AND (sxx - sx * sx / n_prior) / (n_prior - 1) > 0
            THEN {rnd_sql(
                '(value - sx / n_prior)'
                ' / sqrt((sxx - sx * sx / n_prior) / (n_prior - 1))',
                6,
            )}
        END AS z_score
    FROM rolled
)
SELECT *,
    CASE WHEN abs(z_score) > {ZSCORE_THRESHOLD} THEN 1 ELSE 0 END AS is_anomaly
FROM scored""",
)
