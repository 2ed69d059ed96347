"""Rank / distribution statistics over SF-linear frames, built on the
bucketed exact-window machinery so no single-task global sort appears in
any plan:

* ``events_ks_test`` — exact two-sample Kolmogorov-Smirnov statistic
  between the value distributions of two event types. The CDF difference
  is accumulated as an INTEGER (``n_a(v)*N_b - n_b(v)*N_a``), so the
  running sum is bit-exact on both engines and the statistic is a ratio
  of exact integers — no floating-point accumulation at all.
* ``events_mannwhitney`` — exact Mann-Whitney U (rank-sum) statistic with
  the normal approximation and the standard tie correction. Same trick:
  ``2U`` is an exact integer built from per-value counts and an integer
  running sum, never from per-row ranks.
* ``events_benford`` — first-significant-digit census of transaction
  values against Benford's law with per-digit Pearson chi-square terms.
  The digit comes from the integer *cents* representation (the repo's
  money convention) rendered as a string — integer-to-string is identical
  on every engine, unlike float formatting or log10 edge cases.
* ``customer_gini`` — exact Gini coefficient of customer revenue
  concentration via the rank formulation ``G = 2*Σ(i*x_i)/(n*Σx) -
  (n+1)/n`` over ascending revenue; the global rank comes from
  :func:`~dbt_tpch_spark.functions.bucketed_windows` (range-bucketed
  parallel ranks + offset lift), not a single-partition window.
* ``user_interarrival_burstiness`` — per-user inter-event gap statistics
  (Goh-Barabási burstiness ``B = (σ-μ)/(σ+μ)``) rolled up into bounded
  activity bands. The only window is PARTITIONED by user — the classic
  sessionization shape that scales linearly.
* ``order_trimmed_mean`` — two-sided 1%-trimmed mean of order value
  (robust location next to the raw mean); exact global ranks from the
  bucketed machinery, integer-exact trim boundaries (``n·pct div 100``).

Scale notes (100 TB): every operator reduces to (a) hash aggregations at
value/entity grain, (b) one bucketed exact cumsum (32-way parallel,
offsets via a <=32-row broadcast), and (c) bounded final frames (1, 9, or
|bands| rows). KS/MWU integer accumulators stay exact up to 2^53 — at
10^12 events per arm the scaled statistic can exceed that, so at extreme
scale the same plan runs with DECIMAL(38,0) accumulators (the cast is the
only change; the repo's decimal-sum machinery already does this).

Determinism: libm calls (exp, sqrt) happen once on final scalars and are
rnd-quantized (tests/test_determinism_properties.py covers the shared
quantized-libm convention); everything upstream is integer or exact
decimal.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_tpch_spark.functions import bucketed_windows, dsum, rnd
from dbt_tpch_spark.models.oracle import (
    dsum_sql,
    money_sql,
    oracle,
    rnd_sql,
    wsum_sql,
)
from dbt_tpch_spark.plans import model

#: the two event-type "arms" compared by the rank tests (the repo's Welch
#: test compares purchase vs click means; these test the distributions)
RANK_ARM_A = "purchase"
RANK_ARM_B = "view"


def _arm_value_counts(ctx):
    """Per-distinct-value counts for each arm: (value, n_a, n_b).

    ONE corpus pass; the frame is value-grain (SF-linear in the worst
    case, which is why downstream cumsums use bucketed_windows)."""
    e = ctx.source("events").filter(
        F.col("event_type").isin(RANK_ARM_A, RANK_ARM_B)
    )
    return e.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == RANK_ARM_A, 1).otherwise(0)
        ).cast("long").alias("n_a"),
        F.sum(
            F.when(F.col("event_type") == RANK_ARM_B, 1).otherwise(0)
        ).cast("long").alias("n_b"),
    )


_ARM_COUNTS_SQL = f"""
    SELECT value,
        CAST(SUM(CASE WHEN event_type = '{RANK_ARM_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN event_type = '{RANK_ARM_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM events
    WHERE event_type IN ('{RANK_ARM_A}', '{RANK_ARM_B}')
    GROUP BY value"""


@model("events_ks_test", layer="operators", materialization="view")
def events_ks_test(ctx):
    """Exact two-sample KS statistic D = max_v |F_a(v) - F_b(v)| between
    the ``purchase`` and ``view`` value distributions, with the asymptotic
    p-value 2*exp(-2*D^2*n_a*n_b/(n_a+n_b)) — the distribution-drift gate
    that catches shape changes a mean test (events_ab_welch) misses.

    Exactness: per distinct value, ``delta = n_a(v)*N_b - n_b(v)*N_a`` is
    an integer whose ascending-value running sum equals
    ``N_a*N_b*(F_a(v) - F_b(v))`` — the max |cumsum| is an exact integer
    and D a ratio of integers. The cumsum runs on the bucketed machinery
    (32 parallel ranges + offset lift), so no single-task sort exists in
    the plan."""
    pv = _arm_value_counts(ctx)
    tot = pv.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    d = pv.crossJoin(F.broadcast(tot)).withColumn(
        "delta",
        (F.col("n_a") * F.col("tb") - F.col("n_b") * F.col("ta")).cast("long"),
    )
    b = bucketed_windows(
        d, "value", [], ascending=True, running_sum=("delta", "cum_delta")
    )
    res = b.agg(
        F.max(F.abs(F.col("cum_delta"))).alias("d_scaled"),
        F.max("ta").alias("n_a"),
        F.max("tb").alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ks = F.col("d_scaled") / (na * nb)
    pval = F.lit(2.0) * F.exp(F.lit(-2.0) * ks * ks * na * nb / (na + nb))
    return res.select(
        F.lit(RANK_ARM_A).alias("arm_a"),
        F.lit(RANK_ARM_B).alias("arm_b"),
        "n_a",
        "n_b",
        F.col("d_scaled").cast("long").alias("d_scaled"),
        rnd(ks, 9).alias("ks_stat"),
        rnd(F.least(pval, F.lit(1.0)), 9).alias("ks_pvalue"),
    )


oracle(
    "events_ks_test",
    ("events",),
    f"""WITH pv AS ({_ARM_COUNTS_SQL}),
tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb FROM pv),
d AS (
    SELECT pv.value, pv.n_a, pv.n_b, tot.ta, tot.tb,
           pv.n_a * tot.tb - pv.n_b * tot.ta AS delta
    FROM pv CROSS JOIN tot
),
c AS (
    SELECT ta, tb,
           CAST(SUM(delta) OVER (ORDER BY value) AS DOUBLE) AS cum_delta
    FROM d
),
m AS (
    SELECT MAX(ABS(cum_delta)) AS d_scaled,
           MAX(ta) AS n_a, MAX(tb) AS n_b
    FROM c
)
SELECT
    '{RANK_ARM_A}' AS arm_a,
    '{RANK_ARM_B}' AS arm_b,
    n_a, n_b,
    CAST(d_scaled AS BIGINT) AS d_scaled,
    {rnd_sql('d_scaled / (CAST(n_a AS DOUBLE) * n_b)', 9)} AS ks_stat,
    {rnd_sql(
        'LEAST(2.0 * EXP(-2.0 * (d_scaled / (CAST(n_a AS DOUBLE) * n_b))'
        ' * (d_scaled / (CAST(n_a AS DOUBLE) * n_b))'
        ' * n_a * n_b / (CAST(n_a AS DOUBLE) + n_b)), 1.0)', 9)} AS ks_pvalue
FROM m""",
)


@model("events_mannwhitney", layer="operators", materialization="view")
def events_mannwhitney(ctx):
    """Exact Mann-Whitney U between the two arms' value distributions with
    the tie-corrected normal approximation — the nonparametric "is one arm
    stochastically larger" test that, unlike Welch, ignores outlier
    magnitudes entirely.

    Exactness: with per-value counts, ``2*U_a = Σ_v n_a(v) * (2*cumB(<v)
    + n_b(v))`` is an exact integer (cumB from the bucketed integer
    cumsum). The tie term ``Σ(t³-t)`` is likewise integer. Only the final
    z-score touches doubles."""
    pv = _arm_value_counts(ctx)
    b = bucketed_windows(
        pv, "value", [], ascending=True, running_sum=("n_b", "cum_b")
    )
    # cum_b is inclusive; below-v count = cum_b - n_b
    two_u = (
        F.col("n_a")
        * (F.lit(2) * (F.col("cum_b") - F.col("n_b")) + F.col("n_b"))
    ).cast("long")
    t = F.col("n_a") + F.col("n_b")
    res = b.agg(
        F.sum(two_u).cast("long").alias("two_u"),
        F.sum(t * t * t - t).cast("long").alias("tie_term"),
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("n_b").cast("long").alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("two_u").cast("double") / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma2 = (na * nb / F.lit(12.0)) * (
        (n + F.lit(1.0))
        - F.col("tie_term").cast("double") / (n * (n - F.lit(1.0)))
    )
    z = (u_a - mu) / F.sqrt(sigma2)
    return res.select(
        F.lit(RANK_ARM_A).alias("arm_a"),
        F.lit(RANK_ARM_B).alias("arm_b"),
        "n_a",
        "n_b",
        F.col("two_u"),
        F.col("tie_term"),
        rnd(u_a, 1).alias("u_a"),
        rnd(z, 6).alias("z_stat"),
    )


oracle(
    "events_mannwhitney",
    ("events",),
    f"""WITH pv AS ({_ARM_COUNTS_SQL}),
c AS (
    SELECT n_a, n_b,
           CAST(SUM(n_b) OVER (ORDER BY value) AS DOUBLE) AS cum_b
    FROM pv
),
s AS (
    SELECT
        CAST(SUM(n_a * (2 * (CAST(cum_b AS BIGINT) - n_b) + n_b)) AS BIGINT) AS two_u,
        CAST(SUM((n_a + n_b) * (n_a + n_b) * (n_a + n_b) - (n_a + n_b)) AS BIGINT) AS tie_term,
        CAST(SUM(n_a) AS BIGINT) AS n_a,
        CAST(SUM(n_b) AS BIGINT) AS n_b
    FROM c
)
SELECT
    '{RANK_ARM_A}' AS arm_a,
    '{RANK_ARM_B}' AS arm_b,
    n_a, n_b, two_u, tie_term,
    {rnd_sql('two_u / 2.0', 1)} AS u_a,
    {rnd_sql(
        '(two_u / 2.0 - CAST(n_a AS DOUBLE) * n_b / 2.0)'
        ' / SQRT((CAST(n_a AS DOUBLE) * n_b / 12.0) *'
        '   ((CAST(n_a AS DOUBLE) + n_b + 1.0)'
        '    - tie_term / ((CAST(n_a AS DOUBLE) + n_b)'
        '      * (CAST(n_a AS DOUBLE) + n_b - 1.0))))', 6)} AS z_stat
FROM s""",
)


@model("events_benford", layer="operators", materialization="view")
def events_benford(ctx):
    """First-significant-digit census of positive event values against
    Benford's law — the classic anomaly/fabrication screen for financial
    event streams. 9 rows: digit, observed count and share, the Benford
    expectation log10(1 + 1/d), and the per-digit Pearson chi-square term
    (O-E)²/E.

    Determinism: the digit is the first character of the integer *cents*
    value (floor(value*100 + 0.5), the repo's money convention) cast to a
    string — integer rendering is engine-identical, unlike float
    formatting or log10-of-double edge cases at exact powers of ten.
    Scale: one corpus aggregation to <=9 rows."""
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    e = (
        ctx.source("events")
        .withColumn("_c", cents)
        .filter(F.col("_c") >= 1)
        .select(F.substring(F.col("_c").cast("string"), 1, 1).alias("digit"))
    )
    g = e.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = g.agg(F.sum("n").cast("long").alias("n_tot"))
    dd = F.col("digit").cast("double")
    ben_p = F.log10(F.lit(1.0) + F.lit(1.0) / dd)
    obs_p = F.col("n").cast("double") / F.col("n_tot").cast("double")
    expected = F.col("n_tot").cast("double") * ben_p
    chi2 = (F.col("n").cast("double") - expected) * (
        F.col("n").cast("double") - expected
    ) / expected
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            "n_tot",
            rnd(obs_p, 9).alias("observed_p"),
            rnd(ben_p, 9).alias("benford_p"),
            rnd(chi2, 6).alias("chi2_term"),
        )
    )


oracle(
    "events_benford",
    ("events",),
    f"""WITH c AS (
    SELECT substring(CAST(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS digit
    FROM events
    WHERE CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) >= 1
),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY digit),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM g)
SELECT
    digit, n, n_tot,
    {rnd_sql('CAST(n AS DOUBLE) / n_tot', 9)} AS observed_p,
    {rnd_sql('LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE))', 9)} AS benford_p,
    {rnd_sql(
        '(CAST(n AS DOUBLE) - n_tot * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))'
        ' * (CAST(n AS DOUBLE) - n_tot * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))'
        ' / (n_tot * LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)))', 6)} AS chi2_term
FROM g CROSS JOIN tot""",
)


@model("customer_gini", layer="operators", materialization="view")
def customer_gini(ctx):
    """Exact Gini coefficient of customer revenue concentration — the
    single-number inequality complement to customer_concentration_risk's
    top-N shares. Rank formulation over ascending revenue:
    ``G = 2*Σ(i*x_i) / (n*Σx) - (n+1)/n``.

    The global rank is entity-grain (customer, SF-linear), so it runs on
    bucketed_windows (range-bucketed parallel ranks + <=32-row offset
    broadcast) — no single-partition window. ``Σ(i*x_i)`` accumulates
    rank*revenue through exact decimal (revenue is 4-dp money, rank an
    integer, so the products are exact at 4 dp)."""
    from dbt_tpch_spark.functions import money

    cust = (
        ctx.source("orders")
        .groupBy("o_custkey")
        .agg(money(dsum(F.col("o_totalprice"))).alias("revenue"))
    )
    b = bucketed_windows(
        cust,
        "revenue",
        ["o_custkey"],
        ascending=True,
        rank_out="rn",
        grand_sum=("revenue", "total_revenue"),
        count_out="n_customers",
    )
    res = b.agg(
        dsum(F.col("rn").cast("double") * F.col("revenue")).alias("s_rank_rev"),
        F.max("total_revenue").alias("total_revenue"),
        F.max("n_customers").alias("n_customers"),
    )
    n = F.col("n_customers").cast("double")
    gini = (
        F.lit(2.0) * F.col("s_rank_rev") / (n * F.col("total_revenue"))
        - (n + F.lit(1.0)) / n
    )
    # s_rank_rev itself is NOT emitted: at ~Σrank*revenue magnitude the
    # decimal->double conversion differs by 1 ulp between engines (the
    # value needs >53 bits at 4 dp), so any fixed-dp rounding of it is
    # ill-conditioned. The ratios below are insensitive to that ulp.
    return res.select(
        F.col("n_customers").cast("long").alias("n_customers"),
        rnd(F.col("total_revenue"), 4).alias("total_revenue"),
        rnd(gini, 9).alias("gini"),
    )


oracle(
    "customer_gini",
    ("orders",),
    f"""WITH cust AS (
    SELECT o_custkey,
           {money_sql(dsum_sql('o_totalprice'))} AS revenue
    FROM orders GROUP BY o_custkey
),
r AS (
    SELECT revenue,
           CAST(ROW_NUMBER() OVER (ORDER BY revenue, o_custkey) AS BIGINT) AS rn
    FROM cust
),
s AS (
    SELECT
        {dsum_sql('rn * revenue')} AS s_rank_rev,
        {dsum_sql('revenue')} AS total_revenue,
        CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM r
)
SELECT
    n_customers,
    {rnd_sql('total_revenue', 4)} AS total_revenue,
    {rnd_sql(
        '2.0 * s_rank_rev / (CAST(n_customers AS DOUBLE) * total_revenue)'
        ' - (CAST(n_customers AS DOUBLE) + 1.0) / n_customers', 9)} AS gini
FROM s""",
)


#: activity bands for the burstiness rollup (bounded output grain)
_BANDS = ((3, 4, "03-04"), (5, 9, "05-09"), (10, 19, "10-19"))
_BAND_TOP = "20+"


def _band_col(n):
    chain = None
    for lo, hi, lab in _BANDS:
        cond = (n >= lo) & (n <= hi)
        chain = F.when(cond, lab) if chain is None else chain.when(cond, lab)
    return chain.otherwise(F.lit(_BAND_TOP))


def _band_sql(col):
    cases = " ".join(
        f"WHEN {col} BETWEEN {lo} AND {hi} THEN '{lab}'" for lo, hi, lab in _BANDS
    )
    return f"CASE {cases} ELSE '{_BAND_TOP}' END"


@model("user_interarrival_burstiness", layer="operators", materialization="view")
def user_interarrival_burstiness(ctx):
    """Goh-Barabási burstiness of per-user inter-event gaps, rolled up by
    activity band — the temporal-pattern screen that separates humans
    (bursty, B > 0) from uniform bots (B ≈ -1/√n) and Poisson traffic
    (B ≈ 0); pairs with the repo's bot-score heuristics.

    Per user: gaps between consecutive events (integer epoch seconds via
    ms-div-1000 — engine-identical integer math), then n/Σg/Σg² in one
    partitioned aggregation; ``B = (σ-μ)/(σ+μ)`` with sample σ. Users
    need >= 3 events (2 gaps). Bands are bounded, so the final frame is
    <= 4 rows.

    Scale: ONE partitioned window (user grain — the sessionization shape)
    whose sort Spark reuses for the groupBy(user) that follows; band
    rollup is a bounded aggregation. No unpartitioned windows."""
    e = ctx.source("events").select(
        "user_id",
        F.expr("unix_millis(ts) div 1000").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = e.withColumn("gap", F.col("sec") - F.lag("sec").over(w)).filter(
        F.col("gap").isNotNull()
    )
    per_user = g.groupBy("user_id").agg(
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("s2"),
    ).filter(F.col("n_gaps") >= 2)
    ng = F.col("n_gaps").cast("double")
    mean = F.col("s1").cast("double") / ng
    var = (F.col("s2").cast("double") - ng * mean * mean) / (ng - F.lit(1.0))
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    burst = F.when(
        sigma + mean > F.lit(0.0), (sigma - mean) / (sigma + mean)
    ).otherwise(F.lit(0.0))
    pu = per_user.select(
        _band_col(F.col("n_events")).alias("band"),
        rnd(burst, 9).alias("b"),
        rnd(mean, 9).alias("mg"),
    )
    return (
        pu.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            rnd(dsum(F.col("b")) / F.count(F.lit(1)), 6).alias("avg_burstiness"),
            rnd(dsum(F.col("mg")) / F.count(F.lit(1)), 4).alias("avg_mean_gap_sec"),
        )
    )


oracle(
    "user_interarrival_burstiness",
    ("events",),
    f"""WITH e AS (
    SELECT user_id, epoch_ms(ts) // 1000 AS sec, event_id FROM events
),
g AS (
    SELECT user_id,
           sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
    FROM e
),
pu AS (
    SELECT user_id,
        CAST(COUNT(gap) + 1 AS BIGINT) AS n_events,
        CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        CAST(SUM(gap) AS BIGINT) AS s1,
        CAST(SUM(gap * gap) AS BIGINT) AS s2
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(gap) >= 2
),
b AS (
    SELECT
        {_band_sql('n_events')} AS band,
        {rnd_sql(
            'CASE WHEN SQRT(GREATEST((s2 - CAST(n_gaps AS DOUBLE)'
            ' * (s1 / CAST(n_gaps AS DOUBLE)) * (s1 / CAST(n_gaps AS DOUBLE)))'
            ' / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))'
            ' + s1 / CAST(n_gaps AS DOUBLE) > 0.0'
            ' THEN (SQRT(GREATEST((s2 - CAST(n_gaps AS DOUBLE)'
            ' * (s1 / CAST(n_gaps AS DOUBLE)) * (s1 / CAST(n_gaps AS DOUBLE)))'
            ' / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))'
            ' - s1 / CAST(n_gaps AS DOUBLE))'
            ' / (SQRT(GREATEST((s2 - CAST(n_gaps AS DOUBLE)'
            ' * (s1 / CAST(n_gaps AS DOUBLE)) * (s1 / CAST(n_gaps AS DOUBLE)))'
            ' / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0))'
            ' + s1 / CAST(n_gaps AS DOUBLE)) ELSE 0.0 END', 9)} AS b,
        {rnd_sql('s1 / CAST(n_gaps AS DOUBLE)', 9)} AS mg
    FROM pu
)
SELECT band,
    CAST(COUNT(*) AS BIGINT) AS n_users,
    {rnd_sql(dsum_sql('b') + ' / COUNT(*)', 6)} AS avg_burstiness,
    {rnd_sql(dsum_sql('mg') + ' / COUNT(*)', 4)} AS avg_mean_gap_sec
FROM b
GROUP BY band""",
)


#: per-tail trim percentage for the robust mean (1% each side)
TRIM_TAIL_PCT = 1


@model("order_trimmed_mean", layer="operators", materialization="view")
def order_trimmed_mean(ctx):
    """Two-sided 1%-trimmed mean of order value — the robust location
    estimate that survives fat tails and data-entry outliers where the
    plain mean drifts; reported next to the raw mean so the gap itself is
    the outlier-impact metric.

    Exact global ranks come from bucketed_windows (order-grain frame,
    SF-linear — no single-task sort); the trim boundary is integer
    arithmetic (``n·pct div 100``, engine-identical, no float-division
    boundary flakes); kept values sum through exact decimal."""
    o = ctx.source("orders").select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    b = bucketed_windows(
        o,
        "price",
        ["o_orderkey"],
        ascending=True,
        rank_out="rn",
        grand_sum=("price", "total_price"),
        count_out="n_total",
    )
    lo = F.expr(f"n_total * {TRIM_TAIL_PCT} div 100")
    kept = b.filter(
        (F.col("rn") > lo) & (F.col("rn") <= F.col("n_total") - lo)
    )
    res = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        dsum(F.col("price")).alias("s_kept"),
        F.max("n_total").alias("n_total"),
        F.max("total_price").alias("total_price"),
    )
    return res.select(
        F.col("n_total").cast("long").alias("n_total"),
        "n_kept",
        rnd(F.col("s_kept") / F.col("n_kept").cast("double"), 4).alias(
            "trimmed_mean"
        ),
        rnd(
            F.col("total_price") / F.col("n_total").cast("double"), 4
        ).alias("raw_mean"),
    )


oracle(
    "order_trimmed_mean",
    ("orders",),
    f"""WITH o AS (
    SELECT o_orderkey, o_totalprice AS price FROM orders
),
r AS (
    SELECT price,
           CAST(ROW_NUMBER() OVER (ORDER BY price, o_orderkey) AS BIGINT) AS rn,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_total,
           {wsum_sql('price', '')} AS total_price
    FROM o
),
k AS (
    SELECT price, n_total, total_price
    FROM r
    WHERE rn > n_total * {TRIM_TAIL_PCT} // 100
      AND rn <= n_total - n_total * {TRIM_TAIL_PCT} // 100
),
s AS (
    SELECT
        MAX(n_total) AS n_total,
        CAST(COUNT(*) AS BIGINT) AS n_kept,
        {dsum_sql('price')} AS s_kept,
        MAX(total_price) AS total_price
    FROM k
)
SELECT n_total, n_kept,
    {rnd_sql('s_kept / CAST(n_kept AS DOUBLE)', 4)} AS trimmed_mean,
    {rnd_sql('total_price / CAST(n_total AS DOUBLE)', 4)} AS raw_mean
FROM s""",
)
