"""Warehouse layer: facts, dims, and the two TPC-H report models.

Reference: models/wh/*.sql (materialized='table', dbt_project.yml:33-34).
``fct_orders_items`` is adapted: the reference enriches with
``parts_suppliers`` for ``supplier_cost_amount`` (models/wh/
fct_orders_items.sql:50-55) but the driver corpus ships no ``partsupp``
table (SURVEY §1.4), so the cost column is omitted on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_tpch_spark.functions import davg, dsum, housekeeping, isum, rnd
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import (
    davg_sql,
    dsum_sql,
    isum_sql,
    oracle,
    rnd_sql,
)


def _housekeeping_sql(ctx_vars=None) -> str:
    # constants injected engine-side (see plans.DEFAULT_VARS); dbt stamps
    # invocation_id/run_started_at the same way (macros/dbt_housekeeping.sql:1-4)
    from dbt_tpch_spark.plans import DEFAULT_VARS

    v = DEFAULT_VARS
    return (
        f"CAST('{v['batch_id']}' AS VARCHAR) AS dbt_batch_id,\n"
        f"    CAST('{v['batch_ts']}' AS TIMESTAMP) AS dbt_batch_ts"
    )


@model("fct_orders", layer="wh", materialization="table")
def fct_orders(ctx):
    """Order-grain fact: per-order rollup of line amounts joined back to
    orders. Reference: models/wh/fct_orders.sql:16-57.

    Scale note: groupBy(order_key) and the subsequent join share the same
    key, so Catalyst reuses the shuffle partitioning; map-side partial
    aggregation keeps the shuffle small.
    """
    o = ctx.ref("ods_orders")
    items = ctx.ref("orders_items")

    summary = items.groupBy("order_key").agg(
        dsum(F.col("gross_item_sales_amount")).alias("gross_item_sales_amount"),
        dsum(F.col("item_discount_amount")).alias("item_discount_amount"),
        dsum(F.col("item_tax_amount")).alias("item_tax_amount"),
        dsum(F.col("net_item_sales_amount")).alias("net_item_sales_amount"),
    )

    return o.join(summary, "order_key").select(
        "order_key",
        "order_date",
        "customer_key",
        "order_status_code",
        "order_priority_code",
        F.lit(1).alias("order_count"),
        "gross_item_sales_amount",
        "item_discount_amount",
        "item_tax_amount",
        "net_item_sales_amount",
        *housekeeping(ctx.var("batch_id"), ctx.var("batch_ts")),
    )


oracle(
    "fct_orders",
    ("ods_orders", "orders_items"),
    f"""WITH order_item_summary AS (
    SELECT
        order_key,
        {dsum_sql('gross_item_sales_amount')} AS gross_item_sales_amount,
        {dsum_sql('item_discount_amount')} AS item_discount_amount,
        {dsum_sql('item_tax_amount')} AS item_tax_amount,
        {dsum_sql('net_item_sales_amount')} AS net_item_sales_amount
    FROM orders_items
    GROUP BY order_key
)
SELECT
    o.order_key,
    o.order_date,
    o.customer_key,
    o.order_status_code,
    o.order_priority_code,
    1 AS order_count,
    s.gross_item_sales_amount,
    s.item_discount_amount,
    s.item_tax_amount,
    s.net_item_sales_amount,
    {_housekeeping_sql()}
FROM ods_orders o
JOIN order_item_summary s ON o.order_key = s.order_key""",
)


@model("fct_orders_items", layer="wh", materialization="table")
def fct_orders_items(ctx):
    """Order-line-grain fact. Reference: models/wh/fct_orders_items.sql:16-63
    (adapted: no parts_suppliers join — corpus lacks partsupp)."""
    items = ctx.ref("orders_items")
    return items.select(
        "order_item_key",
        "order_key",
        "order_date",
        "customer_key",
        "order_status_code",
        "part_key",
        "supplier_key",
        "return_status_code",
        "order_line_number",
        "order_line_status_code",
        "ship_date",
        "base_price",
        "discount_percentage",
        "discounted_price",
        "tax_rate",
        F.lit(1).alias("order_item_count"),
        "quantity",
        "gross_item_sales_amount",
        "discounted_item_sales_amount",
        "item_discount_amount",
        "item_tax_amount",
        "net_item_sales_amount",
        *housekeeping(ctx.var("batch_id"), ctx.var("batch_ts")),
    )


oracle(
    "fct_orders_items",
    ("orders_items",),
    f"""SELECT
    order_item_key,
    order_key,
    order_date,
    customer_key,
    order_status_code,
    part_key,
    supplier_key,
    return_status_code,
    order_line_number,
    order_line_status_code,
    ship_date,
    base_price,
    discount_percentage,
    discounted_price,
    tax_rate,
    1 AS order_item_count,
    quantity,
    gross_item_sales_amount,
    discounted_item_sales_amount,
    item_discount_amount,
    item_tax_amount,
    net_item_sales_amount,
    {_housekeeping_sql()}
FROM orders_items""",
)


@model("dim_customer", layer="wh", materialization="table")
def dim_customer(ctx):
    """Customer dim flattened over nation/region. Reference:
    models/wh/dim_customer.sql:26-47.

    Scale note: nation (25 rows) and region (5 rows) are explicit broadcast
    joins — no shuffle of the 150M-row (at SF100) customer side.
    """
    c = ctx.ref("customers")
    n = ctx.ref("nations")
    r = ctx.ref("regions")
    return (
        c.join(F.broadcast(n), "nation_key")
        .join(F.broadcast(r), "region_key")
        .select(
            "customer_key",
            "customer_name",
            F.col("nation_key").alias("customer_nation_key"),
            F.col("nation_name").alias("customer_nation_name"),
            F.col("region_key").alias("customer_region_key"),
            F.col("region_name").alias("customer_region_name"),
            "customer_account_balance",
            "customer_market_segment_name",
            *housekeeping(ctx.var("batch_id"), ctx.var("batch_ts")),
        )
    )


oracle(
    "dim_customer",
    ("customers", "nations", "regions"),
    f"""SELECT
    c.customer_key,
    c.customer_name,
    n.nation_key AS customer_nation_key,
    n.nation_name AS customer_nation_name,
    r.region_key AS customer_region_key,
    r.region_name AS customer_region_name,
    c.customer_account_balance,
    c.customer_market_segment_name,
    {_housekeeping_sql()}
FROM customers c
JOIN nations n ON c.nation_key = n.nation_key
JOIN regions r ON n.region_key = r.region_key""",
)


@model("dim_supplier", layer="wh", materialization="table")
def dim_supplier(ctx):
    """Supplier dim flattened over nation/region. Reference:
    models/wh/dim_supplier.sql:26-47."""
    s = ctx.ref("suppliers")
    n = ctx.ref("nations")
    r = ctx.ref("regions")
    return (
        s.join(F.broadcast(n), "nation_key")
        .join(F.broadcast(r), "region_key")
        .select(
            "supplier_key",
            "supplier_name",
            F.col("nation_key").alias("supplier_nation_key"),
            F.col("nation_name").alias("supplier_nation_name"),
            F.col("region_key").alias("supplier_region_key"),
            F.col("region_name").alias("supplier_region_name"),
            "supplier_account_balance",
            *housekeeping(ctx.var("batch_id"), ctx.var("batch_ts")),
        )
    )


oracle(
    "dim_supplier",
    ("suppliers", "nations", "regions"),
    f"""SELECT
    s.supplier_key,
    s.supplier_name,
    n.nation_key AS supplier_nation_key,
    n.nation_name AS supplier_nation_name,
    r.region_key AS supplier_region_key,
    r.region_name AS supplier_region_name,
    s.supplier_account_balance,
    {_housekeeping_sql()}
FROM suppliers s
JOIN nations n ON s.nation_key = n.nation_key
JOIN regions r ON n.region_key = r.region_key""",
)


@model("dim_part", layer="wh", materialization="table")
def dim_part(ctx):
    """Part dim. Reference: models/wh/dim_part.sql:12-31."""
    return ctx.ref("parts").select(
        "part_key",
        "part_name",
        "part_brand_name",
        "part_type_name",
        "part_size",
        "retail_price",
        *housekeeping(ctx.var("batch_id"), ctx.var("batch_ts")),
    )


oracle(
    "dim_part",
    ("parts",),
    f"""SELECT
    part_key,
    part_name,
    part_brand_name,
    part_type_name,
    part_size,
    retail_price,
    {_housekeeping_sql()}
FROM parts""",
)


@model("rpt_pricing_summary", layer="wh", materialization="table")
def rpt_pricing_summary(ctx):
    """TPC-H Q1 pricing summary. Reference:
    models/wh/rpt_pricing_summary.sql:12-31; cutoff var at
    dbt_project.yml:42-43.

    Scale note: the ship_date filter is a plain comparison on a scan column,
    so it pushes down to the parquet reader; the 2-key groupBy has tiny
    cardinality (~6 groups) with map-side partial aggregation.
    """
    f = ctx.ref("fct_orders_items")
    cutoff = F.date_sub(F.to_date(F.lit(ctx.var("max_ship_date"))), 90)
    return (
        f.filter(F.col("ship_date") <= cutoff)
        .groupBy("return_status_code", "order_line_status_code")
        .agg(
            dsum(F.col("quantity")).alias("quantity"),
            dsum(F.col("gross_item_sales_amount")).alias("gross_item_sales_amount"),
            dsum(F.col("discounted_item_sales_amount")).alias(
                "discounted_item_sales_amount"
            ),
            dsum(F.col("net_item_sales_amount")).alias("net_item_sales_amount"),
            davg(F.col("quantity")).alias("avg_quantity"),
            davg(F.col("base_price")).alias("avg_base_price"),
            davg(F.col("discount_percentage")).alias("avg_discount_percentage"),
            isum(F.col("order_item_count")).alias("order_item_count"),
        )
    )


oracle(
    "rpt_pricing_summary",
    ("fct_orders_items",),
    f"""SELECT
    f.return_status_code,
    f.order_line_status_code,
    {dsum_sql('f.quantity')} AS quantity,
    {dsum_sql('f.gross_item_sales_amount')} AS gross_item_sales_amount,
    {dsum_sql('f.discounted_item_sales_amount')} AS discounted_item_sales_amount,
    {dsum_sql('f.net_item_sales_amount')} AS net_item_sales_amount,
    {davg_sql('f.quantity')} AS avg_quantity,
    {davg_sql('f.base_price')} AS avg_base_price,
    {davg_sql('f.discount_percentage')} AS avg_discount_percentage,
    {isum_sql('f.order_item_count')} AS order_item_count
FROM fct_orders_items f
WHERE f.ship_date <= CAST('1998-12-01' AS DATE) - INTERVAL 90 DAY
GROUP BY 1, 2""",
)


@model(
    "rpt_minimum_cost_suppliers_adapted", layer="wh", materialization="table"
)
def rpt_minimum_cost_suppliers_adapted(ctx):
    """TPC-H Q2 minimum-cost-supplier shape, adapted to the available
    fixtures. Reference: models/wh/rpt_minimum_cost_suppliers.sql:28-39 —
    rank() over (region, part) by supplier cost, then row_number() over
    (region, part, cost) by account balance desc, filtered to the cheapest
    rank (the W1+W2+F4 flagship pattern).

    The reference reads ps_supplycost from dim_part_supplier_xrf (partsupp
    is not in the driver corpus — FIXTURES.md Part B); the adaptation
    derives the part-supplier catalog from lineitem (pairs that actually
    shipped) and uses the observed average unit price
    (sum(extended_price)/sum(quantity), exact-decimal sums) as the
    supplier-cost proxy. Swap the `pairs` CTE for partsupp and the proxy
    for ps_supplycost when the fixture lands — the window/filter shape is
    the query.

    Scale: one shuffle to aggregate lineitem to (part, supplier) grain,
    broadcast dim joins, one shuffle for the (region, part) windows — both
    windows share one partitioning."""
    li = ctx.ref("base_line_item")
    pairs = li.groupBy("part_key", "supplier_key").agg(
        rnd(dsum(F.col("extended_price")) / dsum(F.col("quantity")), 4).alias(
            "supplier_cost_proxy"
        )
    )
    s = ctx.ref("dim_supplier")
    p = ctx.ref("dim_part")
    enriched = pairs.join(
        F.broadcast(
            s.select(
                F.col("supplier_key"),
                "supplier_name",
                "supplier_account_balance",
                "supplier_nation_name",
                "supplier_region_key",
                "supplier_region_name",
            )
        ),
        "supplier_key",
    ).join(
        F.broadcast(
            p.select("part_key", "part_brand_name", "part_size", "part_type_name")
        ),
        "part_key",
    )
    w_cost = Window.partitionBy("supplier_region_key", "part_key").orderBy(
        "supplier_cost_proxy"
    )
    w_bal = Window.partitionBy(
        "supplier_region_key", "part_key", "supplier_cost_proxy"
    ).orderBy(F.col("supplier_account_balance").desc(), F.col("supplier_key"))
    return (
        enriched.withColumn("supplier_cost_rank", F.rank().over(w_cost).cast("long"))
        .withColumn("supplier_rank", F.row_number().over(w_bal).cast("long"))
        .filter((F.col("supplier_cost_rank") == 1) & (F.col("supplier_rank") <= 100))
        .select(
            "supplier_key",
            "supplier_name",
            "supplier_account_balance",
            "supplier_nation_name",
            "supplier_region_key",
            "supplier_region_name",
            "part_key",
            "part_brand_name",
            "part_size",
            "part_type_name",
            "supplier_cost_proxy",
            "supplier_cost_rank",
            "supplier_rank",
        )
    )


oracle(
    "rpt_minimum_cost_suppliers_adapted",
    ("base_line_item", "dim_supplier", "dim_part"),
    f"""WITH pairs AS (
    SELECT
        part_key,
        supplier_key,
        {rnd_sql(dsum_sql('extended_price') + ' / ' + dsum_sql('quantity'), 4)}
            AS supplier_cost_proxy
    FROM base_line_item
    GROUP BY 1, 2
),
enriched AS (
    SELECT
        pr.supplier_key,
        s.supplier_name,
        s.supplier_account_balance,
        s.supplier_nation_name,
        s.supplier_region_key,
        s.supplier_region_name,
        pr.part_key,
        p.part_brand_name,
        p.part_size,
        p.part_type_name,
        pr.supplier_cost_proxy,
        CAST(RANK() OVER (
            PARTITION BY s.supplier_region_key, pr.part_key
            ORDER BY pr.supplier_cost_proxy
        ) AS BIGINT) AS supplier_cost_rank,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY s.supplier_region_key, pr.part_key,
                         pr.supplier_cost_proxy
            ORDER BY s.supplier_account_balance DESC, pr.supplier_key
        ) AS BIGINT) AS supplier_rank
    FROM pairs pr
    JOIN dim_supplier s ON pr.supplier_key = s.supplier_key
    JOIN dim_part p ON pr.part_key = p.part_key
)
SELECT * FROM enriched
WHERE supplier_cost_rank = 1 AND supplier_rank <= 100""",
)
