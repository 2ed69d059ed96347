"""Deterministic HyperLogLog over ``events``: a cardinality sketch whose
registers are pure functions of md5, so BOTH engines build bit-identical
sketches and the estimate itself passes the hash-parity gate — unlike
native ``approx_count_distinct`` (Spark HLL++) vs DuckDB ``approx_*``,
whose internal hashes differ and which can only ever get a rows-only
check.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (AofA 2007): m=256 registers; each value hashes to
(bucket = first 2 hex digits, rho = 1 + leading zero BITS of the next 12
hex digits); estimate = alpha_m * m^2 / sum(2^-M_j) with the small-range
linear-counting correction.

Hex digits convert without any hex->int builtin (DuckDB has no conv()):
digit value = strpos('0123456789abcdef', c) - 1, and the leading-zero-bit
count decomposes as 4 * (zero-digit prefix length, via regexp '^0*') +
a 4-case CASE on the first nonzero digit. All string ops both engines
share.

Why it matters at 100 TB: the register table IS the mergeable sketch —
groupBy(key, bucket).max(rho) does map-side combine into at most
groups x 256 rows, replacing the full shuffle a COUNT(DISTINCT) needs;
registers from different days/shards union and re-max losslessly.

Determinism: 2^-M_j terms are exact doubles; their sum is accumulated as
DECIMAL(38,18) (identical quantization + exact addition on both engines);
ln() in the linear-counting branch is rnd-quantized like every ln-score
in the repo (tests/test_determinism_properties.py::test_quantized_ln...).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import rnd
from dbt_tpch_spark.models.oracle import oracle, rnd_sql
from dbt_tpch_spark.plans import model

HLL_M = 256  # 2 hex digits of bucket
HLL_SALT = "hll|"
#: standard bias constant for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: 12 hex digits feed rho -> max register value 4*12 + 1
HLL_RHO_MAX = 49

_HEX = "0123456789abcdef"


def _spark_register_cols():
    """(bucket, rho) columns from column ``h`` (md5 hex)."""
    hv = lambda c: F.expr(f"instr('{_HEX}', {c}) - 1")  # noqa: E731
    bucket = (hv("substring(h, 1, 1)") * 16 + hv("substring(h, 2, 1)")).cast("long")
    tail = F.expr("substring(h, 3, 12)")
    zeros = F.length(F.regexp_extract(tail, r"^0*", 0))
    first_nz = F.expr("substring(substring(h, 3, 12), length(regexp_extract(substring(h, 3, 12), '^0*', 0)) + 1, 1)")
    lz_in_digit = (
        F.when(first_nz == "", F.lit(0))  # all-zero tail
        .when(first_nz == "1", F.lit(3))
        .when(first_nz.isin("2", "3"), F.lit(2))
        .when(first_nz.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )
    rho = F.least(zeros * 4 + lz_in_digit + 1, F.lit(HLL_RHO_MAX)).cast("long")
    return bucket.alias("bucket"), rho.alias("rho")


def _register_sql() -> str:
    """SQL fragment computing (bucket, rho) from column h — shared shape."""
    hv = lambda c: f"(strpos('{_HEX}', {c}) - 1)"  # noqa: E731
    return f"""
        CAST({hv('substring(h, 1, 1)')} * 16 + {hv('substring(h, 2, 1)')} AS BIGINT)
            AS bucket,
        CAST(LEAST(
            4 * length(regexp_extract(substring(h, 3, 12), '^0*')) +
            CASE substring(substring(h, 3, 12),
                           length(regexp_extract(substring(h, 3, 12), '^0*')) + 1, 1)
                WHEN '' THEN 0
                WHEN '1' THEN 3
                WHEN '2' THEN 2 WHEN '3' THEN 2
                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                ELSE 0
            END + 1,
            {HLL_RHO_MAX}) AS BIGINT) AS rho"""


@model("events_hll_users", layer="operators", materialization="view")
def events_hll_users(ctx):
    """Per-event-type HLL estimate of distinct users (m=256), side by side
    with the exact count and the realized relative error — the
    approximate-distinct primitive whose sketch both engines agree on
    bit-for-bit."""
    e = ctx.source("events")
    hashed = e.select(
        "event_type",
        F.md5(
            F.concat(F.lit(HLL_SALT), F.col("user_id").cast("string"))
        ).alias("h"),
        "user_id",
    )
    regs = hashed.select("event_type", "user_id", *_spark_register_cols())
    per_bucket = regs.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("m_j")
    )
    # exact-decimal accumulation of the 2^-M_j series (order-free);
    # absent buckets contribute 2^0 = 1 each, added as (m - n_present)
    z_present = (
        F.sum(F.pow(F.lit(2.0), -F.col("m_j").cast("double")).cast("decimal(38,18)"))
        .cast("double")
    )
    sketch = per_bucket.groupBy("event_type").agg(
        z_present.alias("z_present"),
        F.count(F.lit(1)).cast("long").alias("n_present"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    m = float(HLL_M)
    z = F.col("z_present") + (F.lit(m) - F.col("n_present"))
    e_raw = F.lit(HLL_ALPHA * m * m) / z
    v = F.lit(m) - F.col("n_present")  # zero registers
    small = (e_raw <= 2.5 * m) & (v > 0)
    estimate = F.when(
        small, rnd(F.lit(m) * F.log(F.lit(m) / v), 4)
    ).otherwise(rnd(e_raw, 4))
    return (
        sketch.join(exact, "event_type")
        .withColumn("hll_estimate", estimate)
        .withColumn(
            "rel_error",
            rnd(
                F.abs(F.col("hll_estimate") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ),
        )
        .select("event_type", "n_present", "hll_estimate", "exact_users", "rel_error")
    )


oracle(
    "events_hll_users",
    ("events",),
    f"""WITH hashed AS (
    SELECT event_type, user_id,
           md5('{HLL_SALT}' || CAST(user_id AS VARCHAR)) AS h
    FROM events
),
regs AS (
    SELECT event_type, user_id, {_register_sql()}
    FROM hashed
),
per_bucket AS (
    SELECT event_type, bucket, max(rho) AS m_j
    FROM regs GROUP BY 1, 2
),
sketch AS (
    SELECT
        event_type,
        CAST(SUM(CAST(pow(2.0, -CAST(m_j AS DOUBLE)) AS DECIMAL(38,18)))
             AS DOUBLE) AS z_present,
        CAST(COUNT(*) AS BIGINT) AS n_present
    FROM per_bucket GROUP BY 1
),
exact AS (
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
    FROM events GROUP BY 1
),
scored AS (
    SELECT
        s.event_type, s.n_present, x.exact_users,
        CASE
            WHEN {HLL_ALPHA * HLL_M * HLL_M} / (s.z_present + ({HLL_M} - s.n_present))
                     <= {2.5 * HLL_M}
                 AND ({HLL_M} - s.n_present) > 0
            THEN {rnd_sql(
                f"{HLL_M} * ln({HLL_M} / ({HLL_M} - s.n_present))", 4
            )}
            ELSE {rnd_sql(
                f"{HLL_ALPHA * HLL_M * HLL_M}"
                f" / (s.z_present + ({HLL_M} - s.n_present))", 4
            )}
        END AS hll_estimate
    FROM sketch s JOIN exact x USING (event_type)
)
SELECT
    event_type, n_present, hll_estimate, exact_users,
    {rnd_sql('abs(hll_estimate - exact_users) / exact_users', 6)} AS rel_error
FROM scored""",
)
