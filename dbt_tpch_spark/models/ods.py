"""ODS layer (reference: models/ods/*.sql, materialized='table',
dbt_project.yml:31-32). Cosmetic trailing ORDER BYs (SURVEY §2.7 O1) are
dropped — the driver hash is order-insensitive and a global sort is a wasted
full shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import money, surrogate_key
from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import money_sql, oracle, surrogate_key_sql

# --- simple pass-through tables ------------------------------------------

_PASSTHROUGH = {
    # ods name -> base model  (reference files models/ods/<name>.sql).
    # NB: the reference calls the first one "orders" — renamed ods_orders
    # here because "orders" is also the raw source table name and the oracle
    # CTE namespace shares DuckDB's view namespace.
    "ods_orders": "base_orders",
    "customers": "base_customer",
    "suppliers": "base_supplier",
    "parts": "base_part",
    "nations": "base_nation",
    "regions": "base_region",
}


def _register_passthrough(name: str, base: str) -> None:
    @model(name, layer="ods", materialization="table")
    def _fn(ctx, _base=base):
        return ctx.ref(_base)

    oracle(name, (base,), f"SELECT * FROM {base}")


for _name, _base in _PASSTHROUGH.items():
    _register_passthrough(_name, _base)


# --- orders_items: the order-line grain fact feedstock --------------------


@model("orders_items", layer="ods", materialization="table")
def orders_items(ctx):
    """Orders x line-items join with derived pricing columns.

    Reference: models/ods/orders_items.sql:16-86. The surrogate key follows
    dbt_utils.generate_surrogate_key (ods/orders_items.sql:19); derived
    amounts are rounded to decimal(16,4) exactly where the reference applies
    ``money()`` (ods/orders_items.sql:43-45,71,77-82).

    Scale note: this is the J1 1:N fact join (orders x lineitem). It shuffles
    both sides on order_key — correct and unavoidable; AQE handles skew. All
    derived columns are JVM-side expressions (no UDFs).
    """
    o = ctx.ref("base_orders")
    l = ctx.ref("base_line_item")

    joined = o.join(l, "order_key").select(
        surrogate_key(F.col("order_key"), F.col("order_line_number")).alias(
            "order_item_key"
        ),
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
        "quantity",
        "discount_percentage",
        "tax_rate",
        "extended_price",
        money(F.col("extended_price") / F.nullif(F.col("quantity"), F.lit(0))).alias(
            "base_price"
        ),
        money(F.col("extended_price") * (F.lit(1) - F.col("discount_percentage"))).alias(
            "discounted_item_sales_amount"
        ),
        money(F.lit(-1) * F.col("extended_price") * F.col("discount_percentage")).alias(
            "item_discount_amount"
        ),
    )

    return joined.select(
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
        "quantity",
        "base_price",
        "discount_percentage",
        money(F.col("base_price") * (F.lit(1) - F.col("discount_percentage"))).alias(
            "discounted_price"
        ),
        F.col("extended_price").alias("gross_item_sales_amount"),
        "discounted_item_sales_amount",
        "item_discount_amount",
        "tax_rate",
        money(
            (F.col("extended_price") + F.col("item_discount_amount")) * F.col("tax_rate")
        ).alias("item_tax_amount"),
        money(
            F.col("extended_price")
            + F.col("item_discount_amount")
            + (F.col("extended_price") + F.col("item_discount_amount"))
            * F.col("tax_rate")
        ).alias("net_item_sales_amount"),
    )


oracle(
    "orders_items",
    ("base_orders", "base_line_item"),
    f"""WITH joined AS (
    SELECT
        {surrogate_key_sql('o.order_key', 'l.order_line_number')} AS order_item_key,
        o.order_key,
        o.order_date,
        o.customer_key,
        o.order_status_code,
        l.part_key,
        l.supplier_key,
        l.return_status_code,
        l.order_line_number,
        l.order_line_status_code,
        l.ship_date,
        l.quantity,
        l.discount_percentage,
        l.tax_rate,
        l.extended_price,
        {money_sql('l.extended_price / NULLIF(l.quantity, 0)')} AS base_price,
        {money_sql('l.extended_price * (1 - l.discount_percentage)')} AS discounted_item_sales_amount,
        {money_sql('-1 * l.extended_price * l.discount_percentage')} AS item_discount_amount
    FROM base_orders o
    JOIN base_line_item l ON o.order_key = l.order_key
)
SELECT
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
    quantity,
    base_price,
    discount_percentage,
    {money_sql('base_price * (1 - discount_percentage)')} AS discounted_price,
    extended_price AS gross_item_sales_amount,
    discounted_item_sales_amount,
    item_discount_amount,
    tax_rate,
    {money_sql('(extended_price + item_discount_amount) * tax_rate')} AS item_tax_amount,
    {money_sql('extended_price + item_discount_amount + ((extended_price + item_discount_amount) * tax_rate)')} AS net_item_sales_amount
FROM joined""",
)
