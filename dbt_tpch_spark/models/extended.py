"""Extended relational surface: operations the reference does NOT use
(SURVEY §2.5 notes no GROUPING SETS/ROLLUP/CUBE, §2.8 no set operations)
but that Spark provides natively and a complete engine must expose.
Each is oracle-checked like everything else.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import dsum
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import dsum_sql, oracle


@model("sales_rollup_region_nation", layer="extended", materialization="view")
def sales_rollup_region_nation(ctx):
    """ROLLUP(region, nation) revenue hierarchy: per-nation rows, per-region
    subtotals, and a grand total, tagged with grouping_id.

    Spark's rollup is the same expand-based plan DuckDB generates — one
    aggregation pass over the expanded grouping sets."""
    o = ctx.ref("fct_orders")
    c = ctx.ref("dim_customer")
    return (
        o.join(
            F.broadcast(
                c.select("customer_key", "customer_region_name", "customer_nation_name")
            ),
            "customer_key",
        )
        .rollup(
            F.col("customer_region_name").alias("region_name"),
            F.col("customer_nation_name").alias("nation_name"),
        )
        .agg(
            F.grouping_id().cast("long").alias("grouping_level"),
            F.countDistinct("order_key").alias("order_count"),
            dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
        )
    )


oracle(
    "sales_rollup_region_nation",
    ("fct_orders", "dim_customer"),
    f"""SELECT
    c.customer_region_name AS region_name,
    c.customer_nation_name AS nation_name,
    CAST(GROUPING(c.customer_region_name) * 2 + GROUPING(c.customer_nation_name) AS BIGINT) AS grouping_level,
    COUNT(DISTINCT o.order_key) AS order_count,
    {dsum_sql('o.gross_item_sales_amount')} AS gross_revenue
FROM fct_orders o
JOIN dim_customer c ON o.customer_key = c.customer_key
GROUP BY ROLLUP(c.customer_region_name, c.customer_nation_name)""",
)


@model("sales_cube_status_priority", layer="extended", materialization="view")
def sales_cube_status_priority(ctx):
    """CUBE(order_status, order_priority): all 4 grouping-set combinations
    in one aggregation pass."""
    o = ctx.ref("fct_orders")
    return o.cube("order_status_code", "order_priority_code").agg(
        F.grouping_id().cast("long").alias("grouping_level"),
        F.countDistinct("order_key").alias("order_count"),
        dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
    )


oracle(
    "sales_cube_status_priority",
    ("fct_orders",),
    f"""SELECT
    order_status_code,
    order_priority_code,
    CAST(GROUPING(order_status_code) * 2 + GROUPING(order_priority_code) AS BIGINT) AS grouping_level,
    COUNT(DISTINCT order_key) AS order_count,
    {dsum_sql('gross_item_sales_amount')} AS gross_revenue
FROM fct_orders
GROUP BY CUBE(order_status_code, order_priority_code)""",
)


@model("customer_setops", layer="extended", materialization="view")
def customer_setops(ctx):
    """UNION / INTERSECT / EXCEPT over two customer populations:
    A = customers with any 1998+ order, B = customers holding an
    above-average account balance."""
    o = ctx.ref("fct_orders")
    c = ctx.ref("dim_customer")
    a = (
        o.filter(F.col("order_date") >= F.lit("1998-01-01").cast("timestamp"))
        .select("customer_key")
        .distinct()
    )
    # exact-decimal average (see functions.davg): a plain double avg is
    # accumulation-order-dependent and the threshold could flip rows
    avg_bal = c.agg(
        (dsum(F.col("customer_account_balance")) / F.count("customer_account_balance")).alias("ab")
    )
    b = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("customer_account_balance") > F.col("ab"))
        .select("customer_key")
    )
    return (
        a.union(b).distinct().withColumn("set_op", F.lit("union"))
        .unionAll(a.intersect(b).withColumn("set_op", F.lit("intersect")))
        .unionAll(a.subtract(b).withColumn("set_op", F.lit("except")))
        .select("set_op", "customer_key")
    )


oracle(
    "customer_setops",
    ("fct_orders", "dim_customer"),
    """WITH a AS (
    SELECT DISTINCT customer_key FROM fct_orders
    WHERE order_date >= TIMESTAMP '1998-01-01'
),
b AS (
    SELECT customer_key FROM dim_customer
    WHERE customer_account_balance >
        (SELECT CAST(SUM(CAST(customer_account_balance AS DECIMAL(27,6))) AS DOUBLE)
                / COUNT(customer_account_balance)
         FROM dim_customer)
)
SELECT 'union' AS set_op, customer_key FROM (SELECT customer_key FROM a UNION SELECT customer_key FROM b)
UNION ALL
SELECT 'intersect' AS set_op, customer_key FROM (SELECT customer_key FROM a INTERSECT SELECT customer_key FROM b)
UNION ALL
SELECT 'except' AS set_op, customer_key FROM (SELECT customer_key FROM a EXCEPT SELECT customer_key FROM b)""",
)


@model("order_value_dispersion", layer="extended", materialization="view")
def order_value_dispersion(ctx):
    """Dispersion stats per order status (the reference's A9 stddev shape —
    models/reports/supplier_lead_time_distribution.sql:26-27 — whose own
    model is blocked on receipt dates). Variance/stddev come from exact
    decimal moments (functions.dvar_samp) so both engines agree bit-for-bit.
    """
    from dbt_tpch_spark.functions import davg, dstddev_samp, dvar_samp, rnd

    o = ctx.ref("fct_orders")
    g = F.col("gross_item_sales_amount")
    return o.groupBy("order_status_code").agg(
        F.count(F.lit(1)).alias("n_orders"),
        davg(g).alias("mean_order_value"),
        rnd(dvar_samp(g), 4).alias("var_order_value"),
        rnd(dstddev_samp(g), 4).alias("stddev_order_value"),
        rnd(dstddev_samp(g) / davg(g), 6).alias("coeff_of_variation"),
    )


from dbt_tpch_spark.models.oracle import (  # noqa: E402
    davg_sql as _davg_sql,
    dstddev_samp_sql as _dstd_sql,
    dvar_samp_sql as _dvar_sql,
    rnd_sql as _rnd_sql,
)

oracle(
    "order_value_dispersion",
    ("fct_orders",),
    f"""SELECT
    order_status_code,
    COUNT(*) AS n_orders,
    {_davg_sql('gross_item_sales_amount')} AS mean_order_value,
    {_rnd_sql(_dvar_sql('gross_item_sales_amount'), 4)} AS var_order_value,
    {_rnd_sql(_dstd_sql('gross_item_sales_amount'), 4)} AS stddev_order_value,
    {_rnd_sql(_dstd_sql('gross_item_sales_amount') + ' / ' + _davg_sql('gross_item_sales_amount'), 6)} AS coeff_of_variation
FROM fct_orders
GROUP BY 1""",
)


@model("orders_pivot_status", layer="extended", materialization="view")
def orders_pivot_status(ctx):
    """PIVOT: monthly order counts and revenue spread across order-status
    columns (long -> wide). Spark's ``.pivot()`` with an explicit value list
    compiles to a single aggregation with conditional branches — identical
    to the manual CASE form and to DuckDB's PIVOT desugaring; the explicit
    list matters at scale (without it Spark runs an extra distinct-values
    job and the plan depends on data).

    The unpivot inverse (wide -> long, ``unpivot``/``stack``) is exercised
    in tests/test_operators.py against this model's output."""
    o = ctx.source("orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    return (
        o.groupBy(month.alias("order_month"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("rev"),
        )
        .select(
            "order_month",
            F.coalesce(F.col("F_n"), F.lit(0)).cast("long").alias("fulfilled_n"),
            F.col("F_rev").alias("fulfilled_rev"),
            F.coalesce(F.col("O_n"), F.lit(0)).cast("long").alias("open_n"),
            F.col("O_rev").alias("open_rev"),
            F.coalesce(F.col("P_n"), F.lit(0)).cast("long").alias("partial_n"),
            F.col("P_rev").alias("partial_rev"),
        )
    )


oracle(
    "orders_pivot_status",
    ("orders",),
    f"""SELECT
    date_trunc('month', o_orderdate) AS order_month,
    CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS fulfilled_n,
    {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS fulfilled_rev,
    CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_n,
    {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_rev,
    CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS partial_n,
    {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS partial_rev
FROM orders
GROUP BY 1""",
)


@model("order_revenue_share", layer="extended", materialization="view")
def order_revenue_share(ctx):
    """Fact-grain share-of-total: every order's fraction of global revenue.

    This is the query shape where a naive ``over ()`` whole-table window
    melts down at scale (single-partition WindowExec over the full fact
    table). Implemented with functions.with_global_aggs — scalar aggregate
    + 1-row broadcast — the rewrite PLANS.md note 2 documents; the plan is
    asserted window-free in tests/test_plans.py."""
    from dbt_tpch_spark.functions import dsum, rnd, with_global_aggs

    o = ctx.source("orders")
    shared = with_global_aggs(
        o,
        {
            "grand_total": dsum(F.col("o_totalprice")),
            "n_orders": F.count(F.lit(1)),
        },
    )
    return shared.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("order_total"),
        rnd(F.col("o_totalprice") / F.col("grand_total"), 9).alias("revenue_share"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


def _rnd9_sql(expr: str) -> str:
    return f"(FLOOR(({expr}) * 1000000000.0 + 0.5) / 1000000000.0)"


oracle(
    "order_revenue_share",
    ("orders",),
    f"""WITH totals AS (
    SELECT {dsum_sql('o_totalprice')} AS grand_total,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
)
SELECT
    o.o_orderkey AS order_key,
    o.o_totalprice AS order_total,
    {_rnd9_sql('o.o_totalprice / t.grand_total')} AS revenue_share,
    t.n_orders
FROM orders o CROSS JOIN totals t""",
)


@model("brand_price_quantity_fit", layer="extended", materialization="view")
def brand_price_quantity_fit(ctx):
    """Per-brand OLS fit and correlation of extended price on quantity —
    the SQL REGR_SLOPE / REGR_INTERCEPT / CORR / R2 aggregate family,
    rebuilt from exact-decimal moments so both engines produce identical
    doubles (native corr()/regr_*() accumulate floats in engine order and
    can never hash-match cross-engine).

    Scale shape: one scan, one groupBy(brand) carrying five decimal moment
    sums — map-side partial aggregation applies, no second pass."""
    from dbt_tpch_spark.functions import rnd, safe_div

    li = ctx.source("lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    p = ctx.source("part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey)
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    m = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vary = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    slope = safe_div(cov, varx)
    corr = safe_div(cov, F.sqrt(varx * vary))
    return m.select(
        "p_brand",
        "n",
        rnd(slope, 6).alias("regr_slope"),
        rnd((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "regr_intercept"
        ),
        rnd(corr, 6).alias("corr_xy"),
        rnd(corr * corr, 6).alias("r_squared"),
    )


def _fit_sql() -> str:
    cov = "(sxy - sx * sy / n)"
    varx = "(sxx - sx * sx / n)"
    vary = "(syy - sy * sy / n)"
    slope = f"({cov} / NULLIF({varx}, 0))"
    corr = f"({cov} / NULLIF(sqrt({varx} * {vary}), 0))"
    from dbt_tpch_spark.models.oracle import rnd_sql

    return f"""SELECT
    p_brand,
    n,
    {rnd_sql(slope, 6)} AS regr_slope,
    {rnd_sql(f'(sy - {slope} * sx) / n', 6)} AS regr_intercept,
    {rnd_sql(corr, 6)} AS corr_xy,
    {rnd_sql(f'{corr} * {corr}', 6)} AS r_squared
FROM moments"""


oracle(
    "brand_price_quantity_fit",
    ("lineitem", "part"),
    f"""WITH moments AS (
    SELECT
        p.p_brand,
        CAST(COUNT(*) AS BIGINT) AS n,
        {dsum_sql('l.l_quantity')} AS sx,
        {dsum_sql('l.l_extendedprice')} AS sy,
        {dsum_sql('l.l_quantity * l.l_quantity')} AS sxx,
        {dsum_sql('l.l_extendedprice * l.l_extendedprice')} AS syy,
        {dsum_sql('l.l_quantity * l.l_extendedprice')} AS sxy
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
)
{_fit_sql()}""",
)


@model("customer_balance_window_stats", layer="extended", materialization="view")
def customer_balance_window_stats(ctx):
    """The ranking-window families the reference never reaches (SURVEY §2.6
    covers rank/row_number/ntile/lag only): dense_rank, percent_rank,
    cume_dist, lead, first_value and nth_value, per nation over customer
    account balances.

    Determinism addendum (SURVEY §4.3): the window orders by
    (balance DESC, customer_key) so ties resolve identically on both
    engines; first/nth_value use an explicit ROWS frame — with a bare
    ORDER BY both engines default to RANGE, whose peer semantics differ
    from ROWS on ties.

    Scale: one shuffle on nation_key; each window is a partition-local
    sort — no whole-table window (W7 rewrite not needed here)."""
    from pyspark.sql.window import Window

    c = ctx.ref("dim_customer")
    w = Window.partitionBy("customer_nation_name").orderBy(
        F.col("customer_account_balance").desc(), F.col("customer_key")
    )
    framed = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "customer_nation_name",
        "customer_key",
        "customer_account_balance",
        F.dense_rank().over(w).cast("long").alias("balance_dense_rank"),
        F.percent_rank().over(w).alias("balance_percent_rank"),
        F.cume_dist().over(w).alias("balance_cume_dist"),
        F.lead("customer_account_balance").over(w).alias("next_balance"),
        F.first_value(F.col("customer_account_balance")).over(framed).alias(
            "nation_top_balance"
        ),
        F.nth_value(F.col("customer_account_balance"), 2).over(framed).alias(
            "nation_second_balance"
        ),
    )


oracle(
    "customer_balance_window_stats",
    ("dim_customer",),
    """SELECT
    customer_nation_name,
    customer_key,
    customer_account_balance,
    CAST(DENSE_RANK() OVER w AS BIGINT) AS balance_dense_rank,
    PERCENT_RANK() OVER w AS balance_percent_rank,
    CUME_DIST() OVER w AS balance_cume_dist,
    LEAD(customer_account_balance) OVER w AS next_balance,
    FIRST_VALUE(customer_account_balance) OVER wf AS nation_top_balance,
    NTH_VALUE(customer_account_balance, 2) OVER wf AS nation_second_balance
FROM dim_customer
WINDOW
    w AS (PARTITION BY customer_nation_name
          ORDER BY customer_account_balance DESC, customer_key),
    wf AS (PARTITION BY customer_nation_name
           ORDER BY customer_account_balance DESC, customer_key
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
)


@model("customers_semi_anti", layer="extended", materialization="view")
def customers_semi_anti(ctx):
    """Explicit LEFT SEMI / LEFT ANTI joins — the join types the reference
    only ever generates implicitly inside dbt's relationships test
    (SURVEY §5.1): customers with at least one returned line item (semi)
    and customers with no orders at all (anti), tagged and unioned.

    Scale: both probes are one shuffle join on the key; the semi/anti form
    never materializes the match side's payload columns (Catalyst plans
    LeftSemi/LeftAnti hash joins, AQE may broadcast the smaller side)."""
    c = ctx.ref("dim_customer")
    o = ctx.ref("fct_orders")
    items = ctx.ref("orders_items")
    returned_customers = items.filter(
        F.col("return_status_code") == "R"
    ).select("customer_key")
    with_returns = (
        c.join(returned_customers, "customer_key", "left_semi")
        .select("customer_key", "customer_name")
        .withColumn("probe", F.lit("has_returned_item"))
    )
    never_ordered = (
        c.join(o.select("customer_key"), "customer_key", "left_anti")
        .select("customer_key", "customer_name")
        .withColumn("probe", F.lit("never_ordered"))
    )
    return with_returns.unionAll(never_ordered).select(
        "probe", "customer_key", "customer_name"
    )


oracle(
    "customers_semi_anti",
    ("dim_customer", "fct_orders", "orders_items"),
    """SELECT 'has_returned_item' AS probe, c.customer_key, c.customer_name
FROM dim_customer c
WHERE EXISTS (
    SELECT 1 FROM orders_items i
    WHERE i.customer_key = c.customer_key AND i.return_status_code = 'R'
)
UNION ALL
SELECT 'never_ordered' AS probe, c.customer_key, c.customer_name
FROM dim_customer c
WHERE NOT EXISTS (
    SELECT 1 FROM fct_orders o WHERE o.customer_key = c.customer_key
)""",
)


@model("monthly_revenue_forecast", layer="extended", materialization="view")
def monthly_revenue_forecast(ctx):
    """Per-market-segment linear revenue forecast: OLS trend over the
    monthly order-revenue series and the next-month extrapolation — the
    simplest member of the forecasting family, built on the same
    exact-decimal moment machinery as brand_price_quantity_fit so the fit
    hash-matches cross-engine (native regr_* never can).

    Scale: one orders⋈customer join (customer broadcastable per AQE), one
    (segment, month) aggregate, then moments at segment grain (tiny); the
    corpus-start month is a 1-row scalar broadcast."""
    from dbt_tpch_spark.functions import money, rnd, safe_div

    o = ctx.source("orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = ctx.source("customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey)
    month_num = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    start = j.agg(F.min(month_num).alias("start_month"))
    monthly = (
        j.groupBy("c_mktsegment", month_num.alias("mnum"))
        .agg(dsum(money(F.col("o_totalprice"))).alias("revenue"))
        .crossJoin(F.broadcast(start))
        .select(
            "c_mktsegment",
            (F.col("mnum") - F.col("start_month")).cast("long").alias("x"),
            F.col("revenue").alias("y"),
        )
    )
    x, y = F.col("x"), F.col("y")
    m = monthly.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.max("x").cast("long").alias("last_x"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n_months")
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_months")
    vary = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n_months")
    slope = safe_div(cov, varx)
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n_months")
    corr = safe_div(cov, F.sqrt(varx * vary))
    return m.select(
        "c_mktsegment",
        "n_months",
        rnd(slope, 6).alias("trend_slope"),
        rnd(intercept, 6).alias("trend_intercept"),
        (F.col("last_x") + 1).alias("next_x"),
        rnd(intercept + slope * (F.col("last_x") + 1), 6).alias(
            "forecast_next_month"
        ),
        rnd(corr * corr, 6).alias("r_squared"),
    )


def _forecast_sql() -> str:
    from dbt_tpch_spark.models.oracle import money_sql, rnd_sql

    cov = "(sxy - sx * sy / n_months)"
    varx = "(sxx - sx * sx / n_months)"
    vary = "(syy - sy * sy / n_months)"
    slope = f"({cov} / NULLIF({varx}, 0))"
    intercept = f"((sy - {slope} * sx) / n_months)"
    corr = f"({cov} / NULLIF(sqrt({varx} * {vary}), 0))"
    return f"""WITH j AS (
    SELECT c.c_mktsegment,
           year(o.o_orderdate) * 12 + month(o.o_orderdate) AS mnum,
           {money_sql('o.o_totalprice')} AS rev
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
start AS (SELECT MIN(mnum) AS start_month FROM j),
monthly AS (
    SELECT c_mktsegment,
           CAST(mnum - start_month AS BIGINT) AS x,
           {dsum_sql('rev')} AS y
    FROM j CROSS JOIN start
    GROUP BY 1, 2
),
moments AS (
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(MAX(x) AS BIGINT) AS last_x,
           {dsum_sql('x')} AS sx,
           {dsum_sql('y')} AS sy,
           {dsum_sql('x * x')} AS sxx,
           {dsum_sql('y * y')} AS syy,
           {dsum_sql('x * y')} AS sxy
    FROM monthly GROUP BY 1
)
SELECT
    c_mktsegment,
    n_months,
    {rnd_sql(slope, 6)} AS trend_slope,
    {rnd_sql(intercept, 6)} AS trend_intercept,
    last_x + 1 AS next_x,
    {rnd_sql(f'{intercept} + {slope} * (last_x + 1)', 6)} AS forecast_next_month,
    {rnd_sql(f'{corr} * {corr}', 6)} AS r_squared
FROM moments"""


oracle("monthly_revenue_forecast", ("orders", "customer"), _forecast_sql())


#: minimum cell size below which aggregate cells are suppressed
KANON_K = 5


@model("customer_kanon_report", layer="extended", materialization="view")
def customer_kanon_report(ctx):
    """K-anonymity-style release gate: the (nation, segment) customer
    aggregate with every cell of fewer than KANON_K members suppressed —
    counts stay visible (they drive the suppression audit) but the
    statistics are withheld, the standard small-cell rule for publishing
    aggregates derived from personal data. Pairs with
    events_props_redaction as the privacy surface.

    One groupBy shuffle; the suppression is a projection-level CASE."""
    from dbt_tpch_spark.functions import davg, dsum, rnd

    c = ctx.source("customer")
    n = ctx.source("nation")
    g = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            rnd(davg(F.col("c_acctbal")), 6).alias("avg_balance_raw"),
            rnd(dsum(F.col("c_acctbal")), 6).alias("total_balance_raw"),
        )
    )
    ok = F.col("n_customers") >= KANON_K
    return g.select(
        "n_name",
        "c_mktsegment",
        "n_customers",
        F.when(ok, F.col("avg_balance_raw")).alias("avg_balance"),
        F.when(ok, F.col("total_balance_raw")).alias("total_balance"),
        (~ok).alias("suppressed"),
    )


def _kanon_oracle() -> str:
    from dbt_tpch_spark.models.oracle import davg_sql, dsum_sql, rnd_sql

    return f"""WITH g AS (
    SELECT
        n.n_name,
        c.c_mktsegment,
        CAST(COUNT(*) AS BIGINT) AS n_customers,
        {rnd_sql(davg_sql('c.c_acctbal'), 6)} AS avg_balance_raw,
        {rnd_sql(dsum_sql('c.c_acctbal'), 6)} AS total_balance_raw
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
)
SELECT
    n_name,
    c_mktsegment,
    n_customers,
    CASE WHEN n_customers >= {KANON_K} THEN avg_balance_raw END AS avg_balance,
    CASE WHEN n_customers >= {KANON_K} THEN total_balance_raw END
        AS total_balance,
    n_customers < {KANON_K} AS suppressed
FROM g"""


oracle("customer_kanon_report", ("customer", "nation"), _kanon_oracle())


# --------------------------------------------------------------------------
# ROLLUP / grouping sets (§2.8 extension: multi-grain subtotals in one pass)
# --------------------------------------------------------------------------


@model("orders_rollup_revenue", layer="extended", materialization="view")
def orders_rollup_revenue(ctx):
    """Status × year revenue with ROLLUP subtotals and a grand total in
    ONE aggregation pass — the multi-grain report shape (detail rows,
    per-status subtotals, grand total) that otherwise costs three
    scans + a UNION. Explicit grouping flags (not raw grouping_id) so the
    engines' differing bit conventions never leak into the result.

    Scale: Catalyst expands rollup grains via a single Expand + one
    hash aggregate — the input is scanned once and the shuffle carries
    (3 grains × groups), all bounded domains (status × year)."""
    o = ctx.source("orders")
    base = o.select(
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").cast("long").alias("year"),
        "o_totalprice",
    )
    return base.rollup("status", "year").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.grouping("status").cast("long").alias("is_total_status"),
        F.grouping("year").cast("long").alias("is_total_year"),
    )


oracle(
    "orders_rollup_revenue",
    ("orders",),
    f"""SELECT
    o_orderstatus AS status,
    CAST(year(o_orderdate) AS BIGINT) AS year,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    {dsum_sql('o_totalprice')} AS revenue,
    CAST(GROUPING(o_orderstatus) AS BIGINT) AS is_total_status,
    CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS is_total_year
FROM orders
GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))""",
)
