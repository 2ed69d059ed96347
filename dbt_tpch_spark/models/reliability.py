"""Supplier lead-time / delivery-reliability reports, ADAPTED to the
available date columns.

The reference's whole reliability family keys on ``receipt_date`` /
``commit_date`` / ``ship_mode`` — columns absent from the driver corpus
(FIXTURES.md Part B), which is why SURVEY §2.12 lists these models as
blocked. This module ships the honest adapted forms: every measure the
corpus CAN support is computed exactly as the reference does
(``processing_days = ship_date - order_date`` is the reference's own
definition and needs no proxy; return rates use the real
``return_status_code``), and the one genuinely missing signal —
"late vs on-time" — is proxied as shipping more than
:data:`LATE_SHIP_LAG_DAYS` days after the order date, stated on every
model. Swap the proxy conjunct for the receipt/commit comparison when the
fixture columns land; the query shapes (grouped percentiles, monthly
reliability rates, priority segmentation) are already the reference's.

Scale notes: every model here is one fact scan -> one bounded- or
entity-grain aggregate; supplier dims broadcast; no windows over
SF-linear grains; percentiles are per-group aggregates (never a global
sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import (
    davg,
    days_between,
    dstddev_samp,
    dsum,
    rnd,
    safe_div,
)
from dbt_tpch_spark.models.oracle import (
    davg_sql,
    days_between_sql,
    dstddev_samp_sql,
    dsum_sql,
    month_sql,
    oracle,
    rnd_sql,
)
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.catalog import COST_FRACTION

#: lateness proxy: a lineitem shipped more than this many days after its
#: order date counts as "late" (stands in for receipt_date > commit_date
#: until the fixture carries those columns; ~p70 of the corpus ship-lag
#: distribution, so both classes are well-populated at every SF).
LATE_SHIP_LAG_DAYS = 90

_LAG = lambda: days_between(F.col("ship_date"), F.col("order_date"))  # noqa: E731
_LAG_SQL = days_between_sql("i.ship_date", "i.order_date")


@model(
    "supplier_lead_time_distribution_adapted",
    layer="reports",
    materialization="table",
)
def supplier_lead_time_distribution_adapted(ctx):
    """Per-supplier processing-time distribution with percentiles and
    variability. Reference: models/reports/supplier_lead_time_distribution.sql:1-31
    (adapted: of the reference's three lead components only
    ``processing_days = ship_date - order_date`` — its own line 8 — is
    computable without receipt_date; lead/transit swap in when the column
    lands).

    Scale: one items scan -> supplier-grain aggregate (percentile_cont is
    a per-group agg, no window); the supplier dim broadcasts."""
    i = ctx.ref("fct_orders_items").select(
        "supplier_key", _LAG().alias("processing_days")
    )
    s = ctx.ref("dim_supplier").select(
        "supplier_key", "supplier_name", "supplier_nation_name"
    )
    return (
        i.join(F.broadcast(s), "supplier_key")
        .groupBy("supplier_key", "supplier_name", "supplier_nation_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shipment_count"),
            rnd(davg(F.col("processing_days")), 1).alias("avg_processing_days"),
            F.min("processing_days").alias("min_processing_days"),
            F.max("processing_days").alias("max_processing_days"),
            rnd(F.percentile("processing_days", F.lit(0.5)), 6).alias(
                "p50_processing_days"
            ),
            rnd(F.percentile("processing_days", F.lit(0.9)), 6).alias(
                "p90_processing_days"
            ),
            rnd(F.percentile("processing_days", F.lit(0.95)), 6).alias(
                "p95_processing_days"
            ),
            rnd(dstddev_samp(F.col("processing_days")), 2).alias(
                "processing_days_stddev"
            ),
            rnd(
                safe_div(
                    dstddev_samp(F.col("processing_days")),
                    davg(F.col("processing_days")),
                ),
                3,
            ).alias("processing_days_cv"),
        )
    )


oracle(
    "supplier_lead_time_distribution_adapted",
    ("fct_orders_items", "dim_supplier"),
    f"""WITH shipments AS (
    SELECT i.supplier_key, {_LAG_SQL} AS processing_days
    FROM fct_orders_items i
)
SELECT
    sh.supplier_key,
    s.supplier_name,
    s.supplier_nation_name,
    CAST(COUNT(*) AS BIGINT) AS shipment_count,
    {rnd_sql(davg_sql('sh.processing_days'), 1)} AS avg_processing_days,
    MIN(sh.processing_days) AS min_processing_days,
    MAX(sh.processing_days) AS max_processing_days,
    {rnd_sql('percentile_cont(0.50) WITHIN GROUP (ORDER BY sh.processing_days)', 6)} AS p50_processing_days,
    {rnd_sql('percentile_cont(0.90) WITHIN GROUP (ORDER BY sh.processing_days)', 6)} AS p90_processing_days,
    {rnd_sql('percentile_cont(0.95) WITHIN GROUP (ORDER BY sh.processing_days)', 6)} AS p95_processing_days,
    {rnd_sql(dstddev_samp_sql('sh.processing_days'), 2)} AS processing_days_stddev,
    {rnd_sql(f"{dstddev_samp_sql('sh.processing_days')} / NULLIF({davg_sql('sh.processing_days')}, 0)", 3)} AS processing_days_cv
FROM shipments sh
JOIN dim_supplier s ON sh.supplier_key = s.supplier_key
GROUP BY 1, 2, 3""",
)


@model(
    "metrics_supplier_reliability_adapted",
    layer="metrics",
    materialization="table",
)
def metrics_supplier_reliability_adapted(ctx):
    """On-time shipment rate by supplier per ship month. Reference:
    models/metrics/metrics_supplier_reliability.sql:1-26 (adapted:
    on-time = shipped within LATE_SHIP_LAG_DAYS of the order date; the
    reference's receipt<=commit swaps in when the columns land).

    Scale: one items scan -> (month x supplier) aggregate — bounded
    months x SF-linear suppliers, the same grain the reference emits."""
    i = ctx.ref("fct_orders_items").select(
        F.date_trunc("month", F.col("ship_date")).alias("ship_month"),
        "supplier_key",
        (_LAG() <= LATE_SHIP_LAG_DAYS).alias("on_time"),
    )
    s = ctx.ref("dim_supplier").select(
        "supplier_key", "supplier_name", "supplier_nation_name"
    )
    on_time = F.sum(F.when(F.col("on_time"), 1).otherwise(0)).cast("long")
    late = F.sum(F.when(F.col("on_time"), 0).otherwise(1)).cast("long")
    return (
        i.join(F.broadcast(s), "supplier_key")
        .groupBy(
            "ship_month", "supplier_key", "supplier_name", "supplier_nation_name"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_shipments"),
            on_time.alias("on_time_count"),
            late.alias("late_count"),
            rnd(
                safe_div(
                    on_time.cast("double") * 100.0,
                    F.count(F.lit(1)).cast("double"),
                ),
                2,
            ).alias("on_time_pct"),
        )
    )


oracle(
    "metrics_supplier_reliability_adapted",
    ("fct_orders_items", "dim_supplier"),
    f"""SELECT
    {month_sql('i.ship_date')} AS ship_month,
    i.supplier_key,
    s.supplier_name,
    s.supplier_nation_name,
    CAST(COUNT(*) AS BIGINT) AS total_shipments,
    CAST(SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) AS BIGINT) AS on_time_count,
    CAST(SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 0 ELSE 1 END) AS BIGINT) AS late_count,
    {rnd_sql(f"SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0)", 2)} AS on_time_pct
FROM fct_orders_items i
JOIN dim_supplier s ON i.supplier_key = s.supplier_key
GROUP BY 1, 2, 3, 4""",
)


@model(
    "int_supplier_performance_adapted",
    layer="intermediate",
    materialization="table",
)
def int_supplier_performance_adapted(ctx):
    """Delivery and revenue metrics per supplier. Reference:
    models/intermediate/int_supplier_performance.sql:1-36 (adapted:
    on-time/late via the ship-lag proxy and avg delivery days =
    processing days; revenue, order/line counts and RETURN RATES are the
    reference's own measures on real corpus columns).

    Scale: one items scan -> supplier-grain aggregate; dim broadcast."""
    i = ctx.ref("fct_orders_items").select(
        "supplier_key",
        "order_key",
        "quantity",
        "gross_item_sales_amount",
        "net_item_sales_amount",
        "return_status_code",
        _LAG().alias("processing_days"),
    )
    s = ctx.ref("dim_supplier").select(
        "supplier_key",
        "supplier_name",
        "supplier_nation_name",
        "supplier_region_name",
    )
    on_time = F.sum(
        F.when(F.col("processing_days") <= LATE_SHIP_LAG_DAYS, 1).otherwise(0)
    ).cast("long")
    late = F.sum(
        F.when(F.col("processing_days") <= LATE_SHIP_LAG_DAYS, 0).otherwise(1)
    ).cast("long")
    returned = F.sum(
        F.when(F.col("return_status_code") == "R", 1).otherwise(0)
    ).cast("long")
    n = F.count(F.lit(1))
    return (
        i.join(F.broadcast(s), "supplier_key")
        .groupBy(
            "supplier_key",
            "supplier_name",
            "supplier_nation_name",
            "supplier_region_name",
        )
        .agg(
            n.cast("long").alias("total_line_items"),
            F.countDistinct("order_key").cast("long").alias("total_orders"),
            dsum(F.col("quantity")).alias("total_quantity"),
            dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
            dsum(F.col("net_item_sales_amount")).alias("total_net_revenue"),
            late.alias("late_deliveries"),
            on_time.alias("on_time_deliveries"),
            rnd(
                safe_div(on_time.cast("double") * 100.0, n.cast("double")), 2
            ).alias("on_time_pct"),
            rnd(davg(F.col("processing_days")), 1).alias("avg_delivery_days"),
            returned.alias("returned_items"),
            rnd(
                safe_div(returned.cast("double") * 100.0, n.cast("double")), 2
            ).alias("return_rate_pct"),
        )
    )


oracle(
    "int_supplier_performance_adapted",
    ("fct_orders_items", "dim_supplier"),
    f"""SELECT
    i.supplier_key,
    s.supplier_name,
    s.supplier_nation_name,
    s.supplier_region_name,
    CAST(COUNT(*) AS BIGINT) AS total_line_items,
    CAST(COUNT(DISTINCT i.order_key) AS BIGINT) AS total_orders,
    {dsum_sql('i.quantity')} AS total_quantity,
    {dsum_sql('i.gross_item_sales_amount')} AS total_revenue,
    {dsum_sql('i.net_item_sales_amount')} AS total_net_revenue,
    CAST(SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 0 ELSE 1 END) AS BIGINT) AS late_deliveries,
    CAST(SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) AS BIGINT) AS on_time_deliveries,
    {rnd_sql(f"SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0)", 2)} AS on_time_pct,
    {rnd_sql(davg_sql(_LAG_SQL), 1)} AS avg_delivery_days,
    CAST(SUM(CASE WHEN i.return_status_code = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
    {rnd_sql("SUM(CASE WHEN i.return_status_code = 'R' THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0)", 2)} AS return_rate_pct
FROM fct_orders_items i
JOIN dim_supplier s ON i.supplier_key = s.supplier_key
GROUP BY 1, 2, 3, 4""",
)


@model(
    "fulfillment_priority_analysis_adapted",
    layer="reports",
    materialization="table",
)
def fulfillment_priority_analysis_adapted(ctx):
    """Order urgency segmentation and delivery performance. Reference:
    models/reports/fulfillment_priority_analysis.sql:1-44 (adapted:
    ship_mode_name is absent from the corpus, so the second segmentation
    axis is return_status_code — the lineitem categorical the corpus
    does carry; fulfillment_days = ship - order is the reference's own
    definition, line 14).

    Scale: one items scan + broadcast of the per-order priority frame
    would be wrong (orders are SF-linear) — instead the priority code
    joins via the orderkey equi-join and the output grain is the bounded
    5x3 (priority x returnflag) matrix."""
    o = ctx.ref("fct_orders").select("order_key", "order_priority_code")
    i = ctx.ref("fct_orders_items").select(
        "order_key",
        "customer_key",
        "return_status_code",
        "quantity",
        "gross_item_sales_amount",
        _LAG().alias("fulfillment_days"),
    )
    n = F.count(F.lit(1))
    w7 = F.sum(
        F.when(F.col("fulfillment_days") <= 7, 1).otherwise(0)
    ).cast("long")
    w14 = F.sum(
        F.when(F.col("fulfillment_days") <= 14, 1).otherwise(0)
    ).cast("long")
    return (
        i.join(o, "order_key")
        .groupBy("order_priority_code", "return_status_code")
        .agg(
            n.cast("long").alias("line_item_count"),
            F.countDistinct("order_key").cast("long").alias("order_count"),
            F.countDistinct("customer_key").cast("long").alias("customer_count"),
            dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
            rnd(davg(F.col("fulfillment_days")), 1).alias("avg_fulfillment_days"),
            F.min("fulfillment_days").alias("min_fulfillment_days"),
            F.max("fulfillment_days").alias("max_fulfillment_days"),
            rnd(davg(F.col("quantity")), 1).alias("avg_quantity_per_line"),
            w7.alias("fulfilled_within_7d"),
            w14.alias("fulfilled_within_14d"),
            rnd(safe_div(w7.cast("double") * 100.0, n.cast("double")), 2).alias(
                "pct_within_7d"
            ),
            rnd(safe_div(w14.cast("double") * 100.0, n.cast("double")), 2).alias(
                "pct_within_14d"
            ),
        )
    )


oracle(
    "fulfillment_priority_analysis_adapted",
    ("fct_orders", "fct_orders_items"),
    f"""SELECT
    o.order_priority_code,
    i.return_status_code,
    CAST(COUNT(*) AS BIGINT) AS line_item_count,
    CAST(COUNT(DISTINCT i.order_key) AS BIGINT) AS order_count,
    CAST(COUNT(DISTINCT i.customer_key) AS BIGINT) AS customer_count,
    {dsum_sql('i.gross_item_sales_amount')} AS total_revenue,
    {rnd_sql(davg_sql(_LAG_SQL), 1)} AS avg_fulfillment_days,
    MIN({_LAG_SQL}) AS min_fulfillment_days,
    MAX({_LAG_SQL}) AS max_fulfillment_days,
    {rnd_sql(davg_sql('i.quantity'), 1)} AS avg_quantity_per_line,
    CAST(SUM(CASE WHEN {_LAG_SQL} <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_within_7d,
    CAST(SUM(CASE WHEN {_LAG_SQL} <= 14 THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_within_14d,
    {rnd_sql(f"SUM(CASE WHEN {_LAG_SQL} <= 7 THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0)", 2)} AS pct_within_7d,
    {rnd_sql(f"SUM(CASE WHEN {_LAG_SQL} <= 14 THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0)", 2)} AS pct_within_14d
FROM fct_orders_items i
JOIN fct_orders o ON i.order_key = o.order_key
GROUP BY 1, 2""",
)


@model("int_shipping_delays_adapted", layer="intermediate", materialization="view")
def int_shipping_delays_adapted(ctx):
    """Per-lineitem delivery status listing. Reference:
    models/intermediate/int_shipping_delays.sql:1-39 (adapted: of the
    reference's three day-measures only processing_days is computable
    without receipt/commit dates, and delivery_status collapses to
    late/on_time via the ship-lag proxy — no 'early' without a commit
    date; ship_mode_name absent).

    Scale: row-grain projection + one broadcast dim join — no shuffle
    beyond the inherited fact feedstock."""
    i = ctx.ref("fct_orders_items").select(
        "order_item_key",
        "order_key",
        "order_date",
        "ship_date",
        "customer_key",
        "supplier_key",
        "part_key",
        "quantity",
        "gross_item_sales_amount",
        _LAG().alias("processing_days"),
    )
    s = ctx.ref("dim_supplier").select(
        "supplier_key", "supplier_name", "supplier_nation_name"
    )
    return i.join(F.broadcast(s), "supplier_key").select(
        "order_item_key",
        "order_key",
        "order_date",
        "ship_date",
        "customer_key",
        "supplier_key",
        "supplier_name",
        "supplier_nation_name",
        "part_key",
        "quantity",
        "gross_item_sales_amount",
        "processing_days",
        F.when(
            F.col("processing_days") > LATE_SHIP_LAG_DAYS, "late"
        )
        .otherwise("on_time")
        .alias("delivery_status"),
    )


oracle(
    "int_shipping_delays_adapted",
    ("fct_orders_items", "dim_supplier"),
    f"""SELECT
    i.order_item_key,
    i.order_key,
    i.order_date,
    i.ship_date,
    i.customer_key,
    i.supplier_key,
    s.supplier_name,
    s.supplier_nation_name,
    i.part_key,
    i.quantity,
    i.gross_item_sales_amount,
    {_LAG_SQL} AS processing_days,
    CASE WHEN {_LAG_SQL} > {LATE_SHIP_LAG_DAYS} THEN 'late'
         ELSE 'on_time' END AS delivery_status
FROM fct_orders_items i
JOIN dim_supplier s ON i.supplier_key = s.supplier_key""",
)


@model(
    "metrics_shipping_efficiency_adapted",
    layer="metrics",
    materialization="table",
)
def metrics_shipping_efficiency_adapted(ctx):
    """Average delivery time per month by lineitem category. Reference:
    models/metrics/metrics_shipping_efficiency.sql:1-19 (adapted: the
    category axis is return_status_code — ship_mode_name is absent — and
    of the three day-averages only processing days is computable; late =
    the ship-lag proxy).

    Scale: fact scan -> bounded (month x 3-value flag) aggregate."""
    i = ctx.ref("fct_orders_items").select(
        F.date_trunc("month", F.col("ship_date")).alias("ship_month"),
        "return_status_code",
        _LAG().alias("processing_days"),
    )
    late = F.sum(
        F.when(F.col("processing_days") > LATE_SHIP_LAG_DAYS, 1).otherwise(0)
    ).cast("long")
    return i.groupBy("ship_month", "return_status_code").agg(
        F.count(F.lit(1)).cast("long").alias("shipment_count"),
        rnd(davg(F.col("processing_days")), 1).alias("avg_processing_days"),
        late.alias("late_count"),
        rnd(
            safe_div(
                late.cast("double") * 100.0,
                F.count(F.lit(1)).cast("double"),
            ),
            2,
        ).alias("late_pct"),
    )


oracle(
    "metrics_shipping_efficiency_adapted",
    ("fct_orders_items",),
    f"""SELECT
    {month_sql('i.ship_date')} AS ship_month,
    i.return_status_code,
    CAST(COUNT(*) AS BIGINT) AS shipment_count,
    {rnd_sql(davg_sql(_LAG_SQL), 1)} AS avg_processing_days,
    CAST(SUM(CASE WHEN {_LAG_SQL} > {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
    {rnd_sql(f"SUM(CASE WHEN {_LAG_SQL} > {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) * 100.0 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0)", 2)} AS late_pct
FROM fct_orders_items i
GROUP BY 1, 2""",
)


@model(
    "int_order_items_enriched_adapted",
    layer="intermediate",
    materialization="view",
)
def int_order_items_enriched_adapted(ctx):
    """Fully enriched order lines (customer + supplier + part + nations).
    Reference: models/intermediate/int_order_items_enriched.sql:1-68
    (adapted: commit/receipt/ship-mode columns absent; profit_amount uses
    the 0.6-retail cost proxy — models/catalog.py).

    Scale: the J5 triple LEFT JOIN enrichment — customer/supplier/part
    sides join hint-free (all SF-linear; AQE sizes them), nothing
    hard-broadcast."""
    f = ctx.ref("fct_orders_items")
    c = ctx.ref("dim_customer").select(
        "customer_key",
        "customer_name",
        "customer_nation_name",
        "customer_region_name",
        "customer_market_segment_name",
    )
    s = ctx.ref("dim_supplier").select(
        "supplier_key", "supplier_name", "supplier_nation_name", "supplier_region_name"
    )
    p = ctx.ref("dim_part").select(
        "part_key", "part_name", "part_type_name", "part_brand_name",
        "part_size", "retail_price",
    )
    return (
        f.join(c, "customer_key", "left")
        .join(s, "supplier_key", "left")
        .join(p, "part_key", "left")
        .select(
            "order_item_key",
            "order_key",
            "order_date",
            "order_status_code",
            "order_line_number",
            "order_line_status_code",
            "return_status_code",
            "ship_date",
            "customer_key",
            "customer_name",
            "customer_nation_name",
            "customer_region_name",
            "customer_market_segment_name",
            "supplier_key",
            "supplier_name",
            "supplier_nation_name",
            "supplier_region_name",
            "part_key",
            "part_name",
            "part_type_name",
            "part_brand_name",
            "part_size",
            "quantity",
            "base_price",
            "discount_percentage",
            "tax_rate",
            "gross_item_sales_amount",
            "discounted_item_sales_amount",
            "item_discount_amount",
            "item_tax_amount",
            "net_item_sales_amount",
            (
                F.col("gross_item_sales_amount")
                - F.lit(COST_FRACTION) * F.col("retail_price") * F.col("quantity")
            ).alias("profit_amount"),
        )
    )


oracle(
    "int_order_items_enriched_adapted",
    ("fct_orders_items", "dim_customer", "dim_supplier", "dim_part"),
    f"""SELECT
    f.order_item_key,
    f.order_key,
    f.order_date,
    f.order_status_code,
    f.order_line_number,
    f.order_line_status_code,
    f.return_status_code,
    f.ship_date,
    f.customer_key,
    c.customer_name,
    c.customer_nation_name,
    c.customer_region_name,
    c.customer_market_segment_name,
    f.supplier_key,
    s.supplier_name,
    s.supplier_nation_name,
    s.supplier_region_name,
    f.part_key,
    p.part_name,
    p.part_type_name,
    p.part_brand_name,
    p.part_size,
    f.quantity,
    f.base_price,
    f.discount_percentage,
    f.tax_rate,
    f.gross_item_sales_amount,
    f.discounted_item_sales_amount,
    f.item_discount_amount,
    f.item_tax_amount,
    f.net_item_sales_amount,
    (f.gross_item_sales_amount - {COST_FRACTION} * p.retail_price * f.quantity) AS profit_amount
FROM fct_orders_items f
LEFT JOIN dim_customer c ON f.customer_key = c.customer_key
LEFT JOIN dim_supplier s ON f.supplier_key = s.supplier_key
LEFT JOIN dim_part p ON f.part_key = p.part_key""",
)


@model("supplier_scorecard_adapted", layer="reports", materialization="table")
def supplier_scorecard_adapted(ctx):
    """Comprehensive supplier scorecard. Reference:
    models/reports/supplier_scorecard.sql:1-62 (adapted: on-time and
    delay measures via the ship-lag proxy — avg_delay_days becomes
    avg_processing_days; the inventory CTE reads the shipped-pairs
    catalog, so availability becomes total supplied quantity).

    Scale: three supplier-grain aggregates LEFT-joined back to the
    supplier dim (the reference's own 3-CTE shape); all joins on the
    supplier key, hint-free."""
    items = ctx.ref("fct_orders_items")
    delivery = items.groupBy("supplier_key").agg(
        F.count(F.lit(1)).cast("long").alias("total_shipments"),
        F.sum(F.when(_LAG() <= LATE_SHIP_LAG_DAYS, 1).otherwise(0))
        .cast("long")
        .alias("on_time_shipments"),
        F.sum(F.when(F.col("return_status_code") == "R", 1).otherwise(0))
        .cast("long")
        .alias("returned_items"),
        rnd(davg(_LAG()), 1).alias("avg_processing_days"),
    )
    revenue = items.groupBy("supplier_key").agg(
        dsum(F.col("gross_item_sales_amount")).alias("total_revenue"),
        dsum(F.col("net_item_sales_amount")).alias("total_net_revenue"),
        F.countDistinct("order_key").cast("long").alias("order_count"),
        F.countDistinct("customer_key").cast("long").alias("customer_reach"),
        F.countDistinct("part_key").cast("long").alias("parts_supplied"),
    )
    catalog = (
        ctx.ref("parts_suppliers_adapted")
        .groupBy("supplier_key")
        .agg(
            dsum(F.col("supplied_quantity_total")).alias("total_supplied_qty"),
            rnd(davg(F.col("supplier_cost_amount")), 2).alias("avg_supply_cost"),
        )
    )
    s = ctx.ref("dim_supplier").select(
        "supplier_key",
        "supplier_name",
        "supplier_nation_name",
        "supplier_region_name",
        "supplier_account_balance",
    )
    return (
        s.join(revenue, "supplier_key", "left")
        .join(delivery, "supplier_key", "left")
        .join(catalog, "supplier_key", "left")
        .select(
            "supplier_key",
            "supplier_name",
            "supplier_nation_name",
            "supplier_region_name",
            "supplier_account_balance",
            "total_revenue",
            "total_net_revenue",
            "order_count",
            "customer_reach",
            "parts_supplied",
            "total_shipments",
            "on_time_shipments",
            rnd(
                safe_div(
                    F.col("on_time_shipments").cast("double") * 100.0,
                    F.col("total_shipments").cast("double"),
                ),
                2,
            ).alias("on_time_pct"),
            "returned_items",
            rnd(
                safe_div(
                    F.col("returned_items").cast("double") * 100.0,
                    F.col("total_shipments").cast("double"),
                ),
                2,
            ).alias("return_rate_pct"),
            "avg_processing_days",
            F.coalesce(F.col("total_supplied_qty"), F.lit(0.0)).alias(
                "total_supplied_qty"
            ),
            "avg_supply_cost",
        )
    )


oracle(
    "supplier_scorecard_adapted",
    ("fct_orders_items", "dim_supplier", "parts_suppliers_adapted"),
    f"""WITH delivery AS (
    SELECT i.supplier_key,
           CAST(COUNT(*) AS BIGINT) AS total_shipments,
           CAST(SUM(CASE WHEN {_LAG_SQL} <= {LATE_SHIP_LAG_DAYS} THEN 1 ELSE 0 END) AS BIGINT) AS on_time_shipments,
           CAST(SUM(CASE WHEN i.return_status_code = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
           {rnd_sql(davg_sql(_LAG_SQL), 1)} AS avg_processing_days
    FROM fct_orders_items i
    GROUP BY 1
),
revenue AS (
    SELECT i.supplier_key,
           {dsum_sql('i.gross_item_sales_amount')} AS total_revenue,
           {dsum_sql('i.net_item_sales_amount')} AS total_net_revenue,
           CAST(COUNT(DISTINCT i.order_key) AS BIGINT) AS order_count,
           CAST(COUNT(DISTINCT i.customer_key) AS BIGINT) AS customer_reach,
           CAST(COUNT(DISTINCT i.part_key) AS BIGINT) AS parts_supplied
    FROM fct_orders_items i
    GROUP BY 1
),
catalog AS (
    SELECT supplier_key,
           {dsum_sql('supplied_quantity_total')} AS total_supplied_qty,
           {rnd_sql(davg_sql('supplier_cost_amount'), 2)} AS avg_supply_cost
    FROM parts_suppliers_adapted
    GROUP BY 1
)
SELECT
    s.supplier_key,
    s.supplier_name,
    s.supplier_nation_name,
    s.supplier_region_name,
    s.supplier_account_balance,
    r.total_revenue,
    r.total_net_revenue,
    r.order_count,
    r.customer_reach,
    r.parts_supplied,
    d.total_shipments,
    d.on_time_shipments,
    {rnd_sql('d.on_time_shipments * 100.0 / NULLIF(CAST(d.total_shipments AS DOUBLE), 0)', 2)} AS on_time_pct,
    d.returned_items,
    {rnd_sql('d.returned_items * 100.0 / NULLIF(CAST(d.total_shipments AS DOUBLE), 0)', 2)} AS return_rate_pct,
    d.avg_processing_days,
    COALESCE(c.total_supplied_qty, 0.0) AS total_supplied_qty,
    c.avg_supply_cost
FROM dim_supplier s
LEFT JOIN revenue r ON s.supplier_key = r.supplier_key
LEFT JOIN delivery d ON s.supplier_key = d.supplier_key
LEFT JOIN catalog c ON s.supplier_key = c.supplier_key""",
)
