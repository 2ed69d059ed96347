"""Metrics layer (reference: models/metrics/*.sql, materialized='table',
dbt_project.yml:37-38). Corpus-runnable subset (SURVEY §2.12): the
partsupp/receipt-date-dependent metrics await fuller fixtures.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_tpch_spark.functions import davg, dsum, isum, month_of, rnd
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import (
    davg_sql,
    dsum_sql,
    isum_sql,
    month_sql,
    oracle,
    rnd_sql,
)


@model("metrics_daily_revenue", layer="metrics", materialization="table")
def metrics_daily_revenue(ctx):
    """Daily revenue series. Reference: models/metrics/metrics_daily_revenue.sql:1-12."""
    o = ctx.ref("fct_orders")
    return o.groupBy("order_date").agg(
        F.countDistinct("order_key").alias("order_count"),
        dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
        dsum(F.col("net_item_sales_amount")).alias("net_revenue"),
        dsum(F.col("item_discount_amount")).alias("total_discounts"),
        dsum(F.col("item_tax_amount")).alias("total_tax"),
    )


oracle(
    "metrics_daily_revenue",
    ("fct_orders",),
    f"""SELECT
    o.order_date,
    COUNT(DISTINCT o.order_key) AS order_count,
    {dsum_sql('o.gross_item_sales_amount')} AS gross_revenue,
    {dsum_sql('o.net_item_sales_amount')} AS net_revenue,
    {dsum_sql('o.item_discount_amount')} AS total_discounts,
    {dsum_sql('o.item_tax_amount')} AS total_tax
FROM fct_orders o
GROUP BY 1""",
)


@model("metrics_monthly_orders", layer="metrics", materialization="table")
def metrics_monthly_orders(ctx):
    """Monthly order volume/value. Reference:
    models/metrics/metrics_monthly_orders.sql:1-13."""
    o = ctx.ref("fct_orders")
    return o.groupBy(month_of(F.col("order_date")).alias("order_month")).agg(
        F.countDistinct("order_key").alias("order_count"),
        dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
        dsum(F.col("net_item_sales_amount")).alias("net_revenue"),
        davg(F.col("gross_item_sales_amount")).alias("avg_order_value"),
        dsum(F.col("item_discount_amount")).alias("total_discounts"),
        F.countDistinct("customer_key").alias("unique_customers"),
    )


oracle(
    "metrics_monthly_orders",
    ("fct_orders",),
    f"""SELECT
    {month_sql('o.order_date')} AS order_month,
    COUNT(DISTINCT o.order_key) AS order_count,
    {dsum_sql('o.gross_item_sales_amount')} AS gross_revenue,
    {dsum_sql('o.net_item_sales_amount')} AS net_revenue,
    {davg_sql('o.gross_item_sales_amount')} AS avg_order_value,
    {dsum_sql('o.item_discount_amount')} AS total_discounts,
    COUNT(DISTINCT o.customer_key) AS unique_customers
FROM fct_orders o
GROUP BY 1""",
)


@model("metrics_regional_revenue", layer="metrics", materialization="table")
def metrics_regional_revenue(ctx):
    """Revenue by region/nation/month. Reference:
    models/metrics/metrics_regional_revenue.sql:1-23."""
    o = ctx.ref("fct_orders")
    c = ctx.ref("dim_customer")
    return (
        o.join(
            F.broadcast(
                c.select("customer_key", "customer_region_name", "customer_nation_name")
            ),
            "customer_key",
        )
        .groupBy(
            month_of(F.col("order_date")).alias("order_month"),
            F.col("customer_region_name").alias("region_name"),
            F.col("customer_nation_name").alias("nation_name"),
        )
        .agg(
            F.countDistinct("order_key").alias("order_count"),
            F.countDistinct("customer_key").alias("customer_count"),
            dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
            dsum(F.col("net_item_sales_amount")).alias("net_revenue"),
        )
    )


oracle(
    "metrics_regional_revenue",
    ("fct_orders", "dim_customer"),
    f"""SELECT
    {month_sql('o.order_date')} AS order_month,
    c.customer_region_name AS region_name,
    c.customer_nation_name AS nation_name,
    COUNT(DISTINCT o.order_key) AS order_count,
    COUNT(DISTINCT o.customer_key) AS customer_count,
    {dsum_sql('o.gross_item_sales_amount')} AS gross_revenue,
    {dsum_sql('o.net_item_sales_amount')} AS net_revenue
FROM fct_orders o
JOIN dim_customer c ON o.customer_key = c.customer_key
GROUP BY 1, 2, 3""",
)


@model("metrics_customer_retention", layer="metrics", materialization="table")
def metrics_customer_retention(ctx):
    """Repeat order rate by first-order-month cohort. Reference:
    models/metrics/metrics_customer_retention.sql:1-31."""
    o = ctx.ref("fct_orders")
    first = o.groupBy("customer_key").agg(
        month_of(F.min("order_date")).alias("cohort_month")
    )
    monthly = o.groupBy(
        "customer_key", month_of(F.col("order_date")).alias("order_month")
    ).agg(F.countDistinct("order_key").alias("orders_in_month"))
    months_since = (
        (F.year("order_month") - F.year("cohort_month")) * 12
        + (F.month("order_month") - F.month("cohort_month"))
    ).cast("long")
    return (
        first.join(monthly, "customer_key")
        .groupBy("cohort_month", "order_month", months_since.alias("months_since_first"))
        .agg(
            F.countDistinct("customer_key").alias("active_customers"),
            isum(F.col("orders_in_month")).alias("total_orders"),
        )
    )


oracle(
    "metrics_customer_retention",
    ("fct_orders",),
    f"""WITH customer_first_order AS (
    SELECT customer_key, {month_sql('MIN(order_date)')} AS cohort_month
    FROM fct_orders
    GROUP BY 1
),
monthly_orders AS (
    SELECT
        o.customer_key,
        {month_sql('o.order_date')} AS order_month,
        COUNT(DISTINCT o.order_key) AS orders_in_month
    FROM fct_orders o
    GROUP BY 1, 2
)
SELECT
    cfo.cohort_month,
    mo.order_month,
    CAST((EXTRACT(year FROM mo.order_month) - EXTRACT(year FROM cfo.cohort_month)) * 12
        + (EXTRACT(month FROM mo.order_month) - EXTRACT(month FROM cfo.cohort_month)) AS BIGINT) AS months_since_first,
    COUNT(DISTINCT mo.customer_key) AS active_customers,
    {isum_sql('mo.orders_in_month')} AS total_orders
FROM customer_first_order cfo
JOIN monthly_orders mo ON cfo.customer_key = mo.customer_key
GROUP BY 1, 2, 3""",
)


@model("metrics_top_parts_trending", layer="metrics", materialization="table")
def metrics_top_parts_trending(ctx):
    """Top-50 parts per month with MoM trend. Reference:
    models/metrics/metrics_top_parts_trending.sql:1-39.

    Scale note: rank() partitions by month — the rank<=50 filter benefits
    from Spark 3.5+ WindowGroupLimit pushdown; lag() partitions by part_key.
    Both windows repartition on their own keys; no single-partition window.
    """
    i = ctx.ref("fct_orders_items")
    p = ctx.ref("dim_part")
    monthly = (
        i.join(F.broadcast(p.select("part_key", "part_name", "part_type_name")), "part_key")
        .groupBy(
            month_of(F.col("order_date")).alias("order_month"),
            "part_key",
            "part_name",
            "part_type_name",
        )
        .agg(
            dsum(F.col("quantity")).alias("total_quantity"),
            dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
            F.countDistinct("order_key").alias("order_count"),
        )
    )
    w_rank = Window.partitionBy("order_month").orderBy(F.col("total_revenue").desc())
    w_lag = Window.partitionBy("part_key").orderBy("order_month")
    ranked = monthly.withColumns(
        {
            "revenue_rank": F.rank().over(w_rank).cast("long"),
            "prev_month_revenue": F.lag("total_revenue").over(w_lag),
        }
    )
    growth = rnd(
        (F.col("total_revenue") - F.coalesce(F.col("prev_month_revenue"), F.lit(0.0)))
        / F.nullif(F.coalesce(F.col("prev_month_revenue"), F.lit(0.0)), F.lit(0.0))
        * 100,
        2,
    )
    return ranked.filter(F.col("revenue_rank") <= 50).select(
        "order_month",
        "part_key",
        "part_name",
        "part_type_name",
        "total_quantity",
        "total_revenue",
        "order_count",
        "revenue_rank",
        "prev_month_revenue",
        growth.alias("revenue_growth_pct"),
    )


oracle(
    "metrics_top_parts_trending",
    ("fct_orders_items", "dim_part"),
    f"""WITH monthly_parts AS (
    SELECT
        {month_sql('i.order_date')} AS order_month,
        i.part_key,
        p.part_name,
        p.part_type_name,
        {dsum_sql('i.quantity')} AS total_quantity,
        {dsum_sql('i.gross_item_sales_amount')} AS total_revenue,
        COUNT(DISTINCT i.order_key) AS order_count
    FROM fct_orders_items i
    JOIN dim_part p ON i.part_key = p.part_key
    GROUP BY 1, 2, 3, 4
),
ranked AS (
    SELECT
        *,
        CAST(RANK() OVER (PARTITION BY order_month ORDER BY total_revenue DESC) AS BIGINT) AS revenue_rank,
        LAG(total_revenue) OVER (PARTITION BY part_key ORDER BY order_month) AS prev_month_revenue
    FROM monthly_parts
)
SELECT
    order_month,
    part_key,
    part_name,
    part_type_name,
    total_quantity,
    total_revenue,
    order_count,
    revenue_rank,
    prev_month_revenue,
    {rnd_sql('(total_revenue - COALESCE(prev_month_revenue, 0.0)) / NULLIF(COALESCE(prev_month_revenue, 0.0), 0.0) * 100', 2)} AS revenue_growth_pct
FROM ranked
WHERE revenue_rank <= 50""",
)


@model("metrics_discount_utilization", layer="metrics", materialization="table")
def metrics_discount_utilization(ctx):
    """Discount usage by ship month. Reference:
    models/metrics/metrics_discount_utilization.sql:1-20."""
    i = ctx.ref("fct_orders_items")
    return i.groupBy(month_of(F.col("ship_date")).alias("ship_month")).agg(
        F.count(F.lit(1)).alias("total_line_items"),
        isum(F.when(F.col("discount_percentage") > 0, 1).otherwise(0)).alias(
            "discounted_items"
        ),
        isum(F.when(F.col("discount_percentage") == 0, 1).otherwise(0)).alias(
            "full_price_items"
        ),
        rnd(
            F.sum(F.when(F.col("discount_percentage") > 0, 1).otherwise(0)).cast(
                "double"
            )
            / F.nullif(F.count(F.lit(1)), F.lit(0))
            * 100,
            2,
        ).alias("discount_usage_pct"),
        davg(
            F.when(F.col("discount_percentage") > 0, F.col("discount_percentage"))
        ).alias("avg_discount_when_used"),
        dsum(F.col("gross_item_sales_amount")).alias("gross_revenue"),
        dsum(F.abs(F.col("item_discount_amount"))).alias("total_discount_given"),
        rnd(
            dsum(F.abs(F.col("item_discount_amount")))
            / F.nullif(dsum(F.col("gross_item_sales_amount")), F.lit(0.0))
            * 100,
            2,
        ).alias("discount_as_pct_of_revenue"),
    )


oracle(
    "metrics_discount_utilization",
    ("fct_orders_items",),
    f"""SELECT
    {month_sql('i.ship_date')} AS ship_month,
    COUNT(*) AS total_line_items,
    {isum_sql('CASE WHEN i.discount_percentage > 0 THEN 1 ELSE 0 END')} AS discounted_items,
    {isum_sql('CASE WHEN i.discount_percentage = 0 THEN 1 ELSE 0 END')} AS full_price_items,
    {rnd_sql('CAST(SUM(CASE WHEN i.discount_percentage > 0 THEN 1 ELSE 0 END) AS DOUBLE) / NULLIF(COUNT(*), 0) * 100', 2)} AS discount_usage_pct,
    {davg_sql('CASE WHEN i.discount_percentage > 0 THEN i.discount_percentage END')} AS avg_discount_when_used,
    {dsum_sql('i.gross_item_sales_amount')} AS gross_revenue,
    {dsum_sql('ABS(i.item_discount_amount)')} AS total_discount_given,
    {rnd_sql(f"{dsum_sql('ABS(i.item_discount_amount)')} / NULLIF({dsum_sql('i.gross_item_sales_amount')}, 0.0) * 100", 2)} AS discount_as_pct_of_revenue
FROM fct_orders_items i
GROUP BY 1""",
)
